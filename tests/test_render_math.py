"""Golden-parity + property tests for compositor, samplers, losses, encoders."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atmonr_tpu.models.encoders import positional_encoding, spherical_harmonics
from atmonr_tpu.ops import compositor, losses, samplers

GOLDEN = Path(__file__).parent / "golden"
g = np.load(GOLDEN / "render_math.npz")


def test_render_golden_parity():
    cm, alpha, w = compositor.render(
        jnp.asarray(g["z_vals"]), jnp.asarray(g["color"]), jnp.asarray(g["sigma"])
    )
    np.testing.assert_allclose(np.asarray(cm), g["color_map"], rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(alpha), g["alpha"], rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(w), g["weights"], rtol=2e-5, atol=1e-7)


def test_render_single_channel_sigma_broadcast():
    cm, _, w = compositor.render(
        jnp.asarray(g["z_vals"]), jnp.asarray(g["color"]), jnp.asarray(g["sigma1"])
    )
    np.testing.assert_allclose(np.asarray(cm), g["color_map_s1"], rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(w), g["weights_s1"], rtol=2e-5, atol=1e-7)


def test_render_with_surface_golden_parity():
    cm, _, _, cma, cms = compositor.render_with_surface(
        jnp.asarray(g["z_vals"]),
        jnp.asarray(g["color"]),
        jnp.asarray(g["sigma"]),
        jnp.asarray(g["color_surf"]),
    )
    np.testing.assert_allclose(np.asarray(cm), g["cm_total"], rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(cma), g["cm_atmo"], rtol=2e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(cms), g["cm_surf"], rtol=2e-6, atol=1e-7)


def test_render_weights_sum_bounded():
    _, _, w = compositor.render(
        jnp.asarray(g["z_vals"]), jnp.asarray(g["color"]), jnp.asarray(g["sigma"])
    )
    total = np.asarray(jnp.sum(w, axis=1))
    assert (total <= 1.0 + 1e-5).all() and (total >= 0).all()


def _batch():
    return {
        "origin": jnp.asarray(g["origin"]),
        "dir": jnp.asarray(g["direction"]),
        "len": jnp.asarray(g["length"]),
    }


def test_sample_uniform_bins_midpoint_golden_parity():
    pts, z = samplers.sample_uniform_bins(_batch(), n_bins=24, key=None)
    np.testing.assert_allclose(np.asarray(pts), g["pts_mid"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(z), g["z_mid"], rtol=1e-6, atol=1e-7)


def test_sample_uniform_bins_random_in_bins():
    key = jax.random.PRNGKey(0)
    batch = _batch()
    pts, z = samplers.sample_uniform_bins(batch, n_bins=16, key=key)
    lens = np.asarray(batch["len"])
    zn = np.asarray(z)
    assert (zn >= 0).all() and (zn <= lens[:, None] + 1e-6).all()
    # stratification: sample i falls inside bin i
    edges = np.linspace(0, 1, 17)
    frac = zn / lens[:, None]
    assert (frac >= edges[:-1][None] - 1e-6).all()
    assert (frac <= edges[1:][None] + 1e-6).all()


def test_sample_pdf_concentrates_on_peak():
    b, nc = 8, 32
    key = jax.random.PRNGKey(1)
    batch = {
        "origin": jnp.zeros((b, 3)),
        "dir": jnp.ones((b, 3)) / np.sqrt(3.0),
        "len": jnp.ones((b,)),
    }
    z_c = jnp.broadcast_to(jnp.linspace(0, 1.0, nc), (b, nc))
    weights = jnp.zeros((b, nc, 1)).at[:, 12:16].set(1.0)
    pts, z = samplers.sample_pdf(batch, weights, z_c, n_samples=64, key=key)
    assert z.shape == (b, nc + 64)
    zn = np.asarray(z)
    assert (np.diff(zn, axis=-1) >= 0).all()  # sorted
    # most of the new mass should be near the peak bins [12/31, 16/31]
    in_peak = ((zn > 10 / 31) & (zn < 17 / 31)).mean()
    assert in_peak > 0.5


def test_sample_biased_bins_monotone_and_bounded():
    batch = _batch()
    pts, z = samplers.sample_biased_bins(batch, 16, 20000.0, alpha=0.3, key=None)
    zn = np.asarray(z) / np.asarray(batch["len"])[:, None]
    assert (zn >= 0).all() and (zn <= 1.0 + 1e-6).all()
    assert (np.diff(zn, axis=-1) >= -1e-6).all()


def test_losses_golden_parity():
    pred, gt = jnp.asarray(g["pred"]), jnp.asarray(g["gt"])
    max_i = float(g["max_i"])
    for name in ["dark", "hdr", "l1", "l1_plus_hdr", "mse", "mse_plus_hdr"]:
        ours = float(losses.get_loss(name)(pred, gt, max_i))
        np.testing.assert_allclose(ours, float(g[f"loss_{name}"]), rtol=1e-5)


def test_positional_encoding_scalar_golden_parity():
    pts = jnp.asarray(g["enc_pts"]).reshape(-1, 3)
    enc = positional_encoding(pts, 4)
    np.testing.assert_allclose(
        np.asarray(enc), g["enc_scalar"], rtol=1e-5, atol=1e-6
    )


def test_positional_encoding_list_golden_parity():
    pts = jnp.asarray(g["enc_pts"])
    enc = positional_encoding(pts, [5, 4, 3])
    np.testing.assert_allclose(np.asarray(enc), g["enc_list"], rtol=1e-5, atol=1e-6)


def test_spherical_harmonics_shapes_and_constant():
    v = jax.random.uniform(jax.random.PRNGKey(2), (10, 3))
    for deg in [1, 2, 3, 4]:
        sh = spherical_harmonics(v, deg)
        assert sh.shape == (10, deg**2)
    np.testing.assert_allclose(
        np.asarray(spherical_harmonics(v, 1)), 0.28209479177387814, rtol=1e-6
    )
