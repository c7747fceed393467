"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
from atmonr_tpu.data.harp2 import HARP2Dataset
from atmonr_tpu.data.synthetic import make_synthetic_granule
from atmonr_tpu.ops import compositor
from atmonr_tpu.parallel.mesh import make_mesh, make_mesh_from_spec
from atmonr_tpu.parallel.sharding import render_sample_sharded, replicate, shard_rays
from atmonr_tpu.parallel.train import (
    make_ngp_sharded_train_step,
    ngp_forward_sample_sharded,
)
from atmonr_tpu.pipelines import get_pipeline

from tests.test_pipelines import DATASET_CONFIG, NGP_CONFIG


def test_mesh_construction():
    mesh = make_mesh(data=4, sample=2)
    assert mesh.shape == {"data": 4, "sample": 2}
    mesh2 = make_mesh_from_spec("data=2,sample=4")
    assert mesh2.shape == {"data": 2, "sample": 4}
    mesh3 = make_mesh_from_spec("sample=2")
    assert mesh3.shape == {"data": 4, "sample": 2}


# 2-way (single boundary exchange) and 8-way (full ring) bound the
# blockwise-compositor cases; intermediate widths add only compile time
@pytest.mark.parametrize("ns", [2, 8])
def test_sample_sharded_render_matches_single_device(ns):
    mesh = make_mesh(data=1, sample=ns)
    rng = np.random.default_rng(0)
    b, n, c = 8, 32, 4
    z = np.sort(rng.uniform(0, 20, (b, n)).astype(np.float32), axis=-1)
    color = rng.uniform(size=(b, n, c)).astype(np.float32)
    sigma = (rng.uniform(size=(b, n, c)) * 0.3).astype(np.float32)

    ref_cm, ref_alpha, ref_w = compositor.render(
        jnp.asarray(z), jnp.asarray(color), jnp.asarray(sigma)
    )
    cm, trans, alpha, w = render_sample_sharded(
        jnp.asarray(z), jnp.asarray(color), jnp.asarray(sigma), mesh
    )
    np.testing.assert_allclose(np.asarray(cm), np.asarray(ref_cm), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(trans),
        np.asarray(jnp.prod(1.0 - ref_alpha, axis=1)),
        rtol=1e-5,
        atol=1e-7,
    )


@pytest.fixture(scope="module")
def dataset():
    granule = make_synthetic_granule(height=10, width=8, views_per_band=2)
    return HARP2Dataset(DATASET_CONFIG, granule)


@pytest.mark.slow
def test_ngp_sample_sharded_forward_matches_unsharded(dataset):
    """Deterministic (midpoint) forward: sharded == single-device bitmath."""
    mesh = make_mesh(data=2, sample=4)
    pipe = get_pipeline(NGP_CONFIG, dataset)
    pipe.compute_dtype = None  # f32 for exact comparison
    params = pipe.init_params(jax.random.PRNGKey(1))

    rays = dataset.rays()
    perm = epoch_permutation(jax.random.PRNGKey(0), dataset.num_rays, 64)
    batch = batch_at_step(rays, perm, jnp.asarray(0), 64)

    ref = pipe.forward(params, batch, key=None)

    batch_sharded = {
        k: jax.device_put(
            v, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        )
        for k, v in batch.items()
    }
    params_rep = replicate(params, mesh)
    out = ngp_forward_sample_sharded(pipe, params_rep, batch_sharded, mesh, key=None)

    for name in ["color_map_fine", "color_map_atmo", "color_map_surf"]:
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(ref[name]), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_ngp_occupancy_sharded_forward_matches_unsharded(dataset):
    """Occupancy-grid sampling: sharded == single-device (z placement runs
    outside the shard_map, so the deterministic paths match exactly)."""
    from tests.test_occupancy import occ_config

    mesh = make_mesh(data=2, sample=4)
    pipe = get_pipeline(occ_config(), dataset)
    pipe.compute_dtype = None  # f32 for exact comparison
    params = pipe.init_params(jax.random.PRNGKey(1))
    aux = pipe.init_aux()
    aux = jax.jit(pipe.update_aux)(params, aux, jax.random.PRNGKey(5))

    rays = dataset.rays()
    perm = epoch_permutation(jax.random.PRNGKey(0), dataset.num_rays, 64)
    batch = batch_at_step(rays, perm, jnp.asarray(0), 64)

    ref = pipe.forward(params, batch, key=None, aux=aux)
    assert ref["z_vals_fine"].shape == (64, 8)  # occupancy path taken

    batch_sharded = {
        k: jax.device_put(
            v, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        )
        for k, v in batch.items()
    }
    params_rep = replicate(params, mesh)
    aux_rep = replicate(aux, mesh)
    out = ngp_forward_sample_sharded(
        pipe, params_rep, batch_sharded, mesh, key=None, aux=aux_rep
    )
    for name in ["color_map_fine", "color_map_atmo", "color_map_surf"]:
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(ref[name]), rtol=1e-4, atol=1e-5
        )


def test_occupancy_sharded_train_step_runs(dataset):
    from tests.test_occupancy import occ_config

    mesh = make_mesh(data=4, sample=2)
    pipe = get_pipeline(occ_config(), dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    opt = pipe.make_optimizer(
        {"lr": 1e-2, "betas": (0.9, 0.99), "eps": 1e-15, "weight_decay": 1e-2},
        1e-2,
    )
    state = replicate(
        {"params": params, "opt_state": opt.init(params), "aux": pipe.init_aux()},
        mesh,
    )
    rays = shard_rays(dataset.rays(), mesh)
    n = rays["origin"].shape[0]
    bs = 64
    step = make_ngp_sharded_train_step(pipe, opt, mesh, bs)
    update_aux = jax.jit(pipe.update_aux)

    perm = epoch_permutation(jax.random.PRNGKey(0), n, bs)
    losses = []
    for i in range(8):
        state, loss = step(state, rays, perm, i % (n // bs), i)
        losses.append(float(loss))
        if (i + 1) % 4 == 0:
            state["aux"] = update_aux(
                state["params"], state["aux"], jax.random.PRNGKey(i)
            )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_train_step_runs_and_reduces_loss(dataset):
    mesh = make_mesh(data=4, sample=2)
    pipe = get_pipeline(NGP_CONFIG, dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    opt = pipe.make_optimizer(
        {"lr": 1e-2, "betas": (0.9, 0.99), "eps": 1e-15, "weight_decay": 1e-2},
        1e-2,
    )
    state = replicate({"params": params, "opt_state": opt.init(params)}, mesh)
    rays = shard_rays(dataset.rays(), mesh)
    n = rays["origin"].shape[0]
    bs = 64
    step = make_ngp_sharded_train_step(pipe, opt, mesh, bs)

    perm = epoch_permutation(jax.random.PRNGKey(0), n, bs)
    losses = []
    for i in range(10):
        state, loss = step(state, rays, perm, i % (n // bs), i)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_shard_rays_trims_and_places(dataset):
    mesh = make_mesh(data=8, sample=1)
    rays = shard_rays(dataset.rays(), mesh)
    n = rays["origin"].shape[0]
    assert n % 8 == 0
    assert len(rays["origin"].sharding.device_set) == 8


def test_host_sharded_ray_store_matches_in_process(dataset):
    """Single-process degenerate case of the multi-host loading path: the
    host slice is the full trimmed range and the assembled global array
    equals shard_rays' placement and values."""
    from atmonr_tpu.parallel.data import (
        host_ray_slice,
        shard_rays_from_hosts,
        trimmed_ray_count,
    )

    mesh = make_mesh(data=8, sample=1)
    host = dataset.host_rays()
    n_total = host["origin"].shape[0]
    n = trimmed_ray_count(n_total, mesh)
    sl = host_ray_slice(n_total, mesh)
    assert (sl.start, sl.stop) == (0, n)

    local = {k: v[sl] for k, v in host.items()}
    rays = shard_rays_from_hosts(local, n_total, mesh)
    ref = shard_rays(dataset.rays(), mesh)
    for k in ref:
        assert rays[k].shape == ref[k].shape
        assert rays[k].sharding.is_equivalent_to(ref[k].sharding, rays[k].ndim)
        np.testing.assert_array_equal(np.asarray(rays[k]), np.asarray(ref[k]))

    # the store feeds the jitted gather exactly like the in-process one
    perm = epoch_permutation(jax.random.PRNGKey(0), n, 64)
    b1 = batch_at_step(rays, perm, jnp.asarray(0), 64)
    b2 = batch_at_step(ref, perm, jnp.asarray(0), 64)
    np.testing.assert_array_equal(np.asarray(b1["origin"]), np.asarray(b2["origin"]))


def test_trainer_shard_runs(dataset, tmp_path):
    from atmonr_tpu.training import Trainer
    from tests.test_training import TRAINER_CONFIG

    cfg = dict(TRAINER_CONFIG, num_iters=4, batch_size=64)
    pipe = get_pipeline(NGP_CONFIG, dataset)
    trainer = Trainer(cfg, dataset, pipe, "shard_exp", data_root=tmp_path)
    trainer.shard(make_mesh(data=4, sample=2))
    trainer.train(tmp_path / "out")
    assert trainer.iter_count == 4


@pytest.mark.slow
@pytest.mark.parametrize("config_name", ["ngp", "nerf"])
def test_data_sharded_forward_loss_matches_unsharded(dataset, config_name):
    """The generic data-only shard_map path (the Trainer's multi-chip route
    for data-parallel meshes) is exact vs the single-device pipeline forward
    for BOTH pipelines when deterministic (key=None)."""
    from tests.test_pipelines import NERF_CONFIG
    from atmonr_tpu.parallel.train import forward_loss_data_sharded

    cfg = NGP_CONFIG if config_name == "ngp" else NERF_CONFIG
    mesh = make_mesh(data=8, sample=1)
    pipe = get_pipeline(cfg, dataset)
    pipe.compute_dtype = None  # f32 for exact comparison
    params = pipe.init_params(jax.random.PRNGKey(1))

    rays = dataset.rays()
    perm = epoch_permutation(jax.random.PRNGKey(0), dataset.num_rays, 64)
    batch = batch_at_step(rays, perm, jnp.asarray(0), 64)

    ref = pipe.forward(params, batch, key=None)
    ref_loss = pipe.compute_loss(batch, ref)

    batch_sharded = {
        k: jax.device_put(
            v, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        )
        for k, v in batch.items()
    }
    loss, out = forward_loss_data_sharded(
        pipe, replicate(params, mesh), batch_sharded, mesh, key=None
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for name, val in ref.items():
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(val), rtol=1e-4, atol=1e-5
        )


def test_data_sharded_grads_match_unsharded(dataset):
    """shard_map's transpose all-reduces the replicated-parameter gradient:
    data-sharded grads == single-device grads on the same batch."""
    from atmonr_tpu.parallel.train import forward_loss_data_sharded

    mesh = make_mesh(data=8, sample=1)
    pipe = get_pipeline(NGP_CONFIG, dataset)
    pipe.compute_dtype = None
    params = pipe.init_params(jax.random.PRNGKey(1))

    rays = dataset.rays()
    perm = epoch_permutation(jax.random.PRNGKey(0), dataset.num_rays, 64)
    batch = batch_at_step(rays, perm, jnp.asarray(0), 64)

    def ref_loss(p):
        return pipe.compute_loss(batch, pipe.forward(p, batch, key=None))

    # jit the reference too: eager-vs-jit fusion/FMA differences on the
    # near-cancelling hash-path grads are ~100x larger than the sharding
    # reorder we are testing for
    ref_grads = jax.jit(jax.grad(ref_loss))(params)

    batch_sharded = {
        k: jax.device_put(
            v, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        )
        for k, v in batch.items()
    }
    params_rep = replicate(params, mesh)

    def sharded_loss(p):
        loss, _ = forward_loss_data_sharded(pipe, p, batch_sharded, mesh, key=None)
        return loss

    grads = jax.jit(jax.grad(sharded_loss))(params_rep)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat = dict(jax.tree_util.tree_leaves_with_path(grads))
    for path, g_ref in flat_ref:
        # f32 accumulation order differs (per-shard partial sums + psum vs
        # one global sum), and grads accumulate many near-cancelling point
        # contributions, so elementwise comparison of tiny entries is noise-
        # dominated. A norm-relative bound is the right reorder check.
        g = np.asarray(flat[path], dtype=np.float64)
        r = np.asarray(g_ref, dtype=np.float64)
        denom = np.linalg.norm(r) or 1.0
        rel = np.linalg.norm(g - r) / denom
        assert rel < 1e-3, (path, rel)


def test_trainer_shard_data_only_runs(dataset, tmp_path):
    from atmonr_tpu.training import Trainer
    from tests.test_training import TRAINER_CONFIG

    cfg = dict(TRAINER_CONFIG, num_iters=4, batch_size=64)
    pipe = get_pipeline(NGP_CONFIG, dataset)
    trainer = Trainer(cfg, dataset, pipe, "shard_dp_exp", data_root=tmp_path)
    trainer.shard(make_mesh(data=8, sample=1))
    trainer.train(tmp_path / "out")
    assert trainer.iter_count == 4


def test_trainer_shard_nerf_data_only_runs(dataset, tmp_path):
    """NeRF multi-chip training (data axis) through the same Trainer route —
    the reference cannot train NeRF beyond one GPU at all."""
    from tests.test_pipelines import NERF_CONFIG
    from atmonr_tpu.training import Trainer
    from tests.test_training import TRAINER_CONFIG

    cfg = dict(TRAINER_CONFIG, num_iters=2, batch_size=64)
    pipe = get_pipeline(NERF_CONFIG, dataset)
    trainer = Trainer(cfg, dataset, pipe, "shard_nerf_exp", data_root=tmp_path)
    trainer.shard(make_mesh(data=8, sample=1))
    trainer.train(tmp_path / "out")
    assert trainer.iter_count == 2


def test_trainer_shard_rejects_nerf_sample_axis(dataset, tmp_path):
    from tests.test_pipelines import NERF_CONFIG
    from atmonr_tpu.training import Trainer
    from tests.test_training import TRAINER_CONFIG

    cfg = dict(TRAINER_CONFIG, num_iters=2, batch_size=64)
    pipe = get_pipeline(NERF_CONFIG, dataset)
    trainer = Trainer(cfg, dataset, pipe, "shard_bad_exp", data_root=tmp_path)
    with pytest.raises(ValueError, match="sample"):
        trainer.shard(make_mesh(data=4, sample=2))
