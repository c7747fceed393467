"""Golden-parity tests for the AtmoNeRF MLP against recorded torch weights."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from atmonr_tpu.models import mlp

GOLDEN = Path(__file__).parent / "golden"
g = np.load(GOLDEN / "nerf_mlp.npz")


def _params_from_golden():
    params = {}
    for i in range(1, 12):
        params[f"fc{i}"] = {
            "w": jnp.asarray(g[f"w_fc{i}_weight"]),
            "b": jnp.asarray(g[f"w_fc{i}_bias"]),
        }
    return params


def test_atmonerf_forward_golden_parity():
    params = _params_from_golden()
    x = jnp.asarray(g["x"])
    color, sigma = mlp.atmonerf_apply(params, x, noise_key=None)
    np.testing.assert_allclose(np.asarray(color), g["color"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sigma), g["sigma"], rtol=1e-4, atol=1e-6)


def test_atmonerf_pos_only_golden_parity():
    params = _params_from_golden()
    x = jnp.asarray(g["x"])[:, : int(g["pos_channels"])]
    _, sigma = mlp.atmonerf_forward_pos_only(params, x, noise_key=None)
    np.testing.assert_allclose(np.asarray(sigma), g["sigma_pos"], rtol=1e-4, atol=1e-6)


def test_atmonerf_init_shapes_match_reference_dims():
    key = jax.random.PRNGKey(0)
    nerf_c, nerf_f = mlp.get_nerf_models(
        key, hidden_dim=64, N_lambda=4, L_x=[5, 5, 4], L_d=2, include_height=False
    )
    # channel math parity: sum(L_x)*2 = 28 pos, L_d*6 = 12 dir
    assert nerf_c["fc1"]["w"].shape == (64, 28)
    assert nerf_c["fc9"]["w"].shape == (64 + 1, 64)
    assert nerf_f["fc9"]["w"].shape == (64 + 4, 64)
    assert nerf_f["fc10"]["w"].shape == (32, 64 + 12)
    assert nerf_f["fc11"]["w"].shape == (4, 32)


def test_atmonerf_noise_only_in_training():
    params = _params_from_golden()
    x = jnp.asarray(g["x"])
    _, s_eval = mlp.atmonerf_apply(params, x, noise_key=None)
    _, s_train = mlp.atmonerf_apply(params, x, noise_key=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(s_eval), np.asarray(s_train))


def test_small_mlp_shapes_and_grad():
    key = jax.random.PRNGKey(1)
    params = mlp.small_mlp_init(key, in_dim=32, out_dim=16, n_neurons=32, n_hidden_layers=1)
    assert len(params["layers"]) == 3  # in->32, 32->32, 32->16
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 32))
    y = mlp.small_mlp_apply(params, x)
    assert y.shape == (64, 16)

    def loss(p):
        return jnp.sum(mlp.small_mlp_apply(p, x) ** 2)

    grads = jax.grad(loss)(params)
    assert jnp.linalg.norm(grads["layers"][0]["w"]) > 0

    y_bf16 = mlp.small_mlp_apply(params, x, compute_dtype=jnp.bfloat16)
    assert y_bf16.dtype == x.dtype
    assert float(jnp.max(jnp.abs(y_bf16 - y))) / (
        float(jnp.max(jnp.abs(y))) + 1e-9
    ) < 0.1
