"""Full-pipeline golden parity: hierarchical NeRF forward, loss, and
parameter GRADIENTS vs the recorded reference (torch) outputs.

This is the BASELINE correctness gate (BASELINE.md): rendered radiances and
pixel gradients allclose against the CUDA/torch reference in deterministic
mode (midpoint stratified sampling, quantile-midpoint importance sampling,
no density noise). The Instant-NGP reference path cannot be recorded without
CUDA (tiny-cuda-nn); its components are covered by the hash-grid spec tests
and the shared compositor/loss goldens.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atmonr_tpu.pipelines.nerf import NeRFPipeline
from jitutil import jit_forward, jit_grad

GOLDEN = Path(__file__).parent / "golden"
g = np.load(GOLDEN / "nerf_pipeline.npz")

CONFIG = {
    "type": "NeRF",
    "include_height": False,
    "point_preprocessor": None,
    "num_bands": 4,
    "ray_origin_height": 20000,
    "sampler": {"N_c": 8, "N_f": 16},
    "encoder": {"L_x": [5, 5, 4], "L_d": 2},
    "mlp_hidden_dim": 32,
}


class MockDataset:
    scale = float(g["scale"])
    offset = np.zeros(3)
    config = {"ray_origin_height": 20000}

    def get_point_preprocessor(self, kind):
        raise NotImplementedError


def _params():
    out = {}
    for mode in ["coarse", "fine"]:
        out[mode] = {
            f"fc{i}": {
                "w": jnp.asarray(g[f"w_{mode}_fc{i}_weight"]),
                "b": jnp.asarray(g[f"w_{mode}_fc{i}_bias"]),
            }
            for i in range(1, 12)
        }
    return out


def _batch():
    return {
        "origin": jnp.asarray(g["origin"]),
        "dir": jnp.asarray(g["direction"]),
        "len": jnp.asarray(g["length"]),
        "rad": jnp.asarray(g["rad"]),
        "irgb_idx": jnp.asarray(g["irgb_idx"], jnp.int32),
    }


@pytest.fixture(scope="module")
def pipe():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return NeRFPipeline(CONFIG, MockDataset())


def test_forward_radiance_parity(pipe):
    results = jit_forward(pipe, _params(), _batch(), key=None)
    np.testing.assert_allclose(
        np.asarray(results["z_vals_coarse"]), g["z_vals_coarse"], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(results["z_vals_fine"]), g["z_vals_fine"], rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(results["color_map_coarse"]),
        g["color_map_coarse"],
        rtol=5e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(results["color_map_fine"]),
        g["color_map_fine"],
        rtol=5e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(results["weights_coarse"]),
        g["weights_coarse"],
        rtol=1e-3,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(results["sigma_fine"]), g["sigma_fine"], rtol=1e-3, atol=1e-5
    )


def test_loss_parity(pipe):
    batch = _batch()
    results = jit_forward(pipe, _params(), batch, key=None)
    loss = pipe.compute_loss(batch, results)
    np.testing.assert_allclose(float(loss), float(g["loss"]), rtol=1e-4)


def test_gradient_parity(pipe):
    """Pixel-gradient parity: d(loss)/d(params) allclose vs torch autograd."""
    batch = _batch()

    def loss_fn(params):
        return pipe.compute_loss(batch, pipe.forward(params, batch, key=None))

    grads = jit_grad(loss_fn, _params())
    checked = 0
    for mode in ["coarse", "fine"]:
        for i in range(1, 12):
            for ours_key, ref_suffix in [("w", "weight"), ("b", "bias")]:
                ours = np.asarray(grads[mode][f"fc{i}"][ours_key])
                ref = g[f"g_{mode}_fc{i}_{ref_suffix}"]
                scale = np.abs(ref).max() + 1e-12
                np.testing.assert_allclose(
                    ours / scale,
                    ref / scale,
                    rtol=2e-3,
                    atol=2e-4,
                    err_msg=f"{mode}.fc{i}.{ref_suffix}",
                )
                checked += 1
    assert checked == 44
