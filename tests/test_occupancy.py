"""Occupancy-grid sampler tests: grid math, the piecewise-constant
inverse-CDF sampler, and end-to-end Instant-NGP training with the grid.

The occupancy grid is a green-field capability (the reference's
instant_ngp.py:27 docstring notes it has "no occupancy grid" and
brute-forces 1024 uniform samples per ray)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
from atmonr_tpu.data.harp2 import HARP2Dataset
from atmonr_tpu.data.synthetic import make_synthetic_granule
from atmonr_tpu.ops import occupancy
from atmonr_tpu.ops.samplers import sample_piecewise
from atmonr_tpu.pipelines import get_pipeline

from tests.test_pipelines import DATASET_CONFIG, NGP_CONFIG
from jitutil import jit_forward, jit_grad

OCC_OPTIONS = {
    "resolution": [8, 8, 4],
    "n_probe": 16,
    "n_fine": 8,
    "update_every": 4,
    "decay": 0.8,
    "floor": 0.05,
}


@pytest.fixture(scope="module")
def dataset():
    granule = make_synthetic_granule(height=10, width=8, views_per_band=2)
    return HARP2Dataset(DATASET_CONFIG, granule)


@pytest.fixture(scope="module")
def batch(dataset):
    rays = dataset.rays()
    perm = epoch_permutation(jax.random.PRNGKey(0), dataset.num_rays, 64)
    return batch_at_step(rays, perm, jnp.asarray(0), 64)


def occ_config():
    cfg = copy.deepcopy(NGP_CONFIG)
    cfg["occupancy"] = dict(OCC_OPTIONS)
    return cfg


# -- grid math ----------------------------------------------------------------


def test_cell_points_cover_unit_cube():
    cfg = occupancy.OccupancyConfig.from_options(OCC_OPTIONS)
    centers = occupancy.cell_points(cfg, key=None)
    assert centers.shape == (cfg.num_cells, 3)
    assert float(jnp.min(centers)) > 0.0 and float(jnp.max(centers)) < 1.0
    # first cell's center
    np.testing.assert_allclose(
        np.asarray(centers[0]), [1 / 16, 1 / 16, 1 / 8], rtol=1e-6
    )
    jittered = occupancy.cell_points(cfg, key=jax.random.PRNGKey(0))
    # every jittered point stays within its own cell
    res = np.asarray(cfg.resolution, np.float32)
    np.testing.assert_array_equal(
        np.floor(np.asarray(jittered) * res), np.floor(np.asarray(centers) * res)
    )


def test_update_grid_ema_max():
    cfg = occupancy.OccupancyConfig.from_options(OCC_OPTIONS)
    occ = occupancy.init_grid(cfg)
    assert occ.shape == tuple(cfg.resolution)
    sigma = jnp.zeros((cfg.num_cells,)).at[0].set(5.0)
    new = occupancy.update_grid(occ, sigma, cfg)
    flat = np.asarray(new).ravel()
    assert flat[0] == 5.0  # new density wins over decayed old
    np.testing.assert_allclose(flat[1:], 0.8)  # decay of the all-ones init


def test_probe_matches_numpy_indexing():
    cfg = occupancy.OccupancyConfig.from_options(OCC_OPTIONS)
    rng = np.random.default_rng(0)
    occ = jnp.asarray(rng.standard_normal(cfg.resolution), jnp.float32)
    u = jnp.asarray(rng.uniform(-0.1, 1.1, (50, 3)), jnp.float32)  # incl. OOB
    got = np.asarray(occupancy.probe(occ, u))
    idx = np.clip(
        np.floor(np.asarray(u) * np.asarray(cfg.resolution, np.float32)),
        0,
        np.asarray(cfg.resolution) - 1,
    ).astype(int)
    want = np.asarray(occ)[idx[:, 0], idx[:, 1], idx[:, 2]]
    np.testing.assert_array_equal(got, want)


# -- piecewise-constant inverse-CDF sampler ------------------------------------


def _ray_batch(b=16):
    key = jax.random.PRNGKey(7)
    d = jax.random.normal(key, (b, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "origin": jnp.zeros((b, 3)),
        "dir": d,
        "len": jnp.full((b,), 2.0),
    }


def test_sample_piecewise_ranges_and_order():
    rb = _ray_batch()
    w = jnp.ones((16, 8))
    pts, z = sample_piecewise(rb, w, 12, key=jax.random.PRNGKey(1))
    assert pts.shape == (16, 12, 3) and z.shape == (16, 12)
    assert float(jnp.min(z)) >= 0.0 and float(jnp.max(z)) <= 2.0
    assert bool(jnp.all(jnp.diff(z, axis=-1) >= 0))
    # uniform weights + deterministic quantiles == uniform midpoints
    _, z_det = sample_piecewise(rb, w, 12, key=None)
    np.testing.assert_allclose(
        np.asarray(z_det[0]), (np.arange(12) + 0.5) / 12 * 2.0, rtol=1e-5
    )


def test_sample_piecewise_concentrates_in_heavy_bin():
    rb = _ray_batch()
    w = jnp.zeros((16, 8)).at[:, 3].set(1.0) + 1e-6
    _, z = sample_piecewise(rb, w, 32, key=jax.random.PRNGKey(2))
    # bin 3 of 8 spans [0.75, 1.0) of the length-2 ray
    frac_in_bin = float(jnp.mean((z >= 0.75) & (z <= 1.0)))
    assert frac_in_bin > 0.99


# -- pipeline integration -------------------------------------------------------


def test_aux_init_and_update(dataset):
    pipe = get_pipeline(occ_config(), dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    aux = pipe.init_aux()
    assert aux["occ"].shape == (8, 8, 4)
    np.testing.assert_allclose(np.asarray(aux["occ"]), 1.0)
    aux2 = jax.jit(pipe.update_aux)(params, aux, jax.random.PRNGKey(2))
    assert aux2["occ"].shape == (8, 8, 4)
    # fresh random params give near-zero densities -> grid decays
    assert float(jnp.max(aux2["occ"])) <= 1.0
    assert not np.array_equal(np.asarray(aux2["occ"]), np.asarray(aux["occ"]))


def test_forward_with_occupancy_shapes(dataset, batch):
    pipe = get_pipeline(occ_config(), dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    aux = pipe.init_aux()
    results = jit_forward(pipe, params, batch, key=jax.random.PRNGKey(2), aux=aux)
    b, n = 64, OCC_OPTIONS["n_fine"]
    assert results["color_map_fine"].shape == (b, 4)
    assert results["sigma_fine"].shape == (b, n - 1, 1)
    assert results["z_vals_fine"].shape == (b, n)
    assert np.isfinite(float(pipe.compute_loss(batch, results)))
    # aux-free eval falls back to the uniform path
    r_eval = jit_forward(pipe, params, batch, key=None)
    assert r_eval["z_vals_fine"].shape == (b, NGP_CONFIG["num_samples_per_ray"])


def test_occupancy_training_reduces_loss(dataset, batch):
    pipe = get_pipeline(occ_config(), dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    opt = pipe.make_optimizer(
        {"lr": 1e-2, "betas": (0.9, 0.99), "eps": 1e-15, "weight_decay": 1e-2},
        1e-2,
    )
    opt_state = opt.init(params)
    aux = pipe.init_aux()
    update_aux = jax.jit(pipe.update_aux)

    @jax.jit
    def step(params, opt_state, aux, key):
        def loss_fn(p):
            return pipe.loss_and_results(p, batch, key, aux=aux)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(40):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, aux, sub)
        losses.append(float(loss))
        if (i + 1) % OCC_OPTIONS["update_every"] == 0:
            aux = update_aux(params, aux, sub)
    assert losses[-1] < losses[0] * 0.9
    # after training, the grid reflects the learned field, not the init
    assert float(jnp.max(aux["occ"])) != 1.0
