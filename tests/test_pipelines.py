"""End-to-end pipeline tests on a tiny synthetic granule (CPU-sized configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
from atmonr_tpu.data.harp2 import HARP2Dataset
from atmonr_tpu.data.synthetic import make_synthetic_granule
from atmonr_tpu.pipelines import get_pipeline
from jitutil import jit_forward, jit_grad

DATASET_CONFIG = {
    "type": "HARP2",
    "max_abs_view_angle": 45.0,
    "ray_origin_height": 20000,
    "bands_to_keep": [0, 1, 2, 3],
    "rgb_mode": "nadir",
}

NERF_CONFIG = {
    "type": "NeRF",
    "include_height": False,
    "point_preprocessor": "horizontal",
    "num_bands": 4,
    "ray_origin_height": 20000,
    "sampler": {"N_c": 8, "N_f": 16},
    "encoder": {"L_x": [5, 5, 4], "L_d": 2},
    "mlp_hidden_dim": 32,
}

NGP_CONFIG = {
    "type": "InstantNGP",
    "include_height": False,
    "point_preprocessor": "horizontal",
    "num_bands": 4,
    "multi_band_extinction": False,
    "num_samples_per_ray": 32,
    "alt_compress_factor": 8,
    "loss": "mse_plus_hdr",
    "instant_ngp": {
        "ema_decay": None,
        "encoding": {
            "otype": "HashGrid",
            "n_levels": 4,
            "n_features_per_level": 2,
            "log2_hashmap_size": 10,
            "base_resolution": 4,
            "per_level_scale": 1.5,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 16, "n_hidden_layers": 1},
        "dir_encoding": {
            "otype": "Composite",
            "nested": [
                {"n_dims_to_encode": 3, "otype": "SphericalHarmonics", "degree": 2},
                {"otype": "Identity"},
            ],
        },
        "rgb_network": {"otype": "FullyFusedMLP", "n_neurons": 16, "n_hidden_layers": 2},
        "surface_encoding": {
            "otype": "Composite",
            "nested": [
                {
                    "n_dims_to_encode": 2,
                    "otype": "HashGrid",
                    "n_levels": 4,
                    "n_features_per_level": 2,
                    "log2_hashmap_size": 9,
                    "base_resolution": 4,
                    "per_level_scale": 1.5,
                },
                {"n_dims_to_encode": 3, "otype": "SphericalHarmonics", "degree": 2},
            ],
        },
        "surface_network": {
            "otype": "FullyFusedMLP",
            "n_neurons": 16,
            "n_hidden_layers": 2,
        },
    },
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


def test_nerf_forward_shapes(dataset, batch):
    pipe = get_pipeline(NERF_CONFIG, dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    results = jit_forward(pipe, params, batch, key=jax.random.PRNGKey(2))
    b, nc, nf = 64, 8, 8 + 16
    assert results["color_map_coarse"].shape == (b, 4)
    assert results["color_map_fine"].shape == (b, 4)
    assert results["sigma_coarse"].shape == (b, nc, 1)
    assert results["sigma_fine"].shape == (b, nf, 4)
    assert results["weights_coarse"].shape == (b, nc, 1)
    loss = pipe.compute_loss(batch, results)
    assert np.isfinite(float(loss))


def test_nerf_deterministic_eval(dataset, batch):
    pipe = get_pipeline(NERF_CONFIG, dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    r1 = jit_forward(pipe, params, batch, key=None)
    r2 = jit_forward(pipe, params, batch, key=None)
    np.testing.assert_array_equal(
        np.asarray(r1["color_map_fine"]), np.asarray(r2["color_map_fine"])
    )


def test_nerf_train_step_reduces_loss(dataset, batch):
    pipe = get_pipeline(NERF_CONFIG, dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    opt = pipe.make_optimizer({"lr": 1e-3}, 1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            return pipe.loss_and_results(p, batch, key)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_nerf_extract(dataset):
    pipe = get_pipeline(NERF_CONFIG, dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    pts = jax.random.uniform(jax.random.PRNGKey(4), (100, 3), minval=-1, maxval=1)
    sigma = pipe.extract(params, pts)
    assert sigma.shape == (100, 4)
    assert float(jnp.min(sigma)) >= 0


def test_ngp_forward_shapes(dataset, batch):
    pipe = get_pipeline(NGP_CONFIG, dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    results = jit_forward(pipe, params, batch, key=jax.random.PRNGKey(2))
    b, n = 64, 32
    assert results["color_map_fine"].shape == (b, 4)
    assert results["color_map_surf"].shape == (b, 4)
    assert results["color_map_atmo"].shape == (b, 4)
    assert results["sigma_fine"].shape == (b, n - 1, 1)
    assert results["color_surf"].shape == (b, 4)
    # compositing identity: total = atmo + surf
    np.testing.assert_allclose(
        np.asarray(results["color_map_fine"]),
        np.asarray(results["color_map_atmo"] + results["color_map_surf"]),
        rtol=1e-5,
    )
    loss = pipe.compute_loss(batch, results)
    assert np.isfinite(float(loss))


def test_ngp_train_step_reduces_loss(dataset, batch):
    pipe = get_pipeline(NGP_CONFIG, dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    opt = pipe.make_optimizer(
        {"lr": 1e-2, "betas": (0.9, 0.99), "eps": 1e-15, "weight_decay": 1e-2},
        1e-2,
    )
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            return pipe.loss_and_results(p, batch, key)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(40):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9


def test_ngp_hash_table_gets_gradients(dataset, batch):
    pipe = get_pipeline(NGP_CONFIG, dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))

    def loss_fn(p):
        return pipe.loss_and_results(p, batch, jax.random.PRNGKey(0))[0]

    grads = jit_grad(loss_fn, params)
    assert float(jnp.linalg.norm(grads["pos_table"])) > 0
    assert float(jnp.linalg.norm(grads["surf_enc"][0]["hash_table"])) > 0
    assert float(jnp.linalg.norm(grads["pos_mlp"]["layers"][0]["w"])) > 0


def test_ngp_extract(dataset):
    pipe = get_pipeline(NGP_CONFIG, dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    pts = jax.random.uniform(jax.random.PRNGKey(4), (50, 3), minval=-1, maxval=1)
    sigma = pipe.extract(params, pts)
    assert sigma.shape == (50, 1)
    assert float(jnp.min(sigma)) >= 0


def test_reference_config_files_load(dataset):
    """The repo configs (same schema as the reference JSON) build pipelines."""
    from atmonr_tpu.utils import load_config

    for name in ["configs/nerf.json", "configs/instant_ngp.json"]:
        cfg = load_config(name)
        pipe = get_pipeline(cfg["pipeline"], dataset)
        assert pipe is not None


def test_ngp_importance_sampler(dataset, batch):
    """Hierarchical importance sampling: n_coarse+n_fine merged samples,
    sorted z, gradient flow to the hash table, and density-concentrated
    placement (more fine samples where the coarse pass sees density)."""
    cfg = {**NGP_CONFIG, "importance_sampler": {"n_coarse": 8, "n_fine": 8}}
    pipe = get_pipeline(cfg, dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    results = jit_forward(pipe, params, batch, key=jax.random.PRNGKey(2))
    b, n = 64, 16
    assert results["z_vals_fine"].shape == (b, n)
    z = np.asarray(results["z_vals_fine"])
    assert (np.diff(z, axis=1) >= 0).all(), "merged z-vals must be sorted"
    assert results["color_map_fine"].shape == (b, 4)
    assert results["sigma_fine"].shape == (b, n - 1, 1)

    def loss_fn(p):
        return pipe.loss_and_results(p, batch, jax.random.PRNGKey(0))[0]

    grads = jit_grad(loss_fn, params)
    assert float(jnp.linalg.norm(grads["pos_table"])) > 0

    # deterministic eval mode works too (key=None -> quantile midpoints)
    det = jit_forward(pipe, params, batch, key=None)
    det2 = jit_forward(pipe, params, batch, key=None)
    np.testing.assert_array_equal(
        np.asarray(det["color_map_fine"]), np.asarray(det2["color_map_fine"])
    )


def test_ngp_importance_fast_config_loads(dataset):
    from atmonr_tpu.utils import load_config

    cfg = load_config("configs/instant_ngp_tpu_fast.json")
    pipe = get_pipeline(cfg["pipeline"], dataset)
    params = pipe.init_params(jax.random.PRNGKey(1))
    rays = dataset.rays()
    batch = batch_at_step(
        rays, epoch_permutation(jax.random.PRNGKey(0), dataset.num_rays, 32),
        jnp.asarray(0), 32,
    )
    out = jit_forward(pipe, params, batch, key=jax.random.PRNGKey(2))
    assert out["z_vals_fine"].shape == (32, 64)  # 32 coarse + 32 fine
