"""Radiance reconstruction losses.

Functional parity with reference ``losses.py:5-33``. All take the scene
max-intensity normalizer ``max_i``; ``pred``/``gt`` are per-ray scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dark_loss(pred, gt, max_i: float):
    """NeRF-in-the-dark relative MSE."""
    return jnp.mean(
        ((pred - gt) / (jax.lax.stop_gradient(pred) + 1e-3 * max_i)) ** 2
    )


def hdr_loss(pred, gt, max_i: float):
    """Log-space MSE."""
    return jnp.mean(
        (jnp.log(gt + 1e-3 * max_i) - jnp.log(pred + 1e-3 * max_i)) ** 2
    )


def l1_loss(pred, gt, max_i: float):
    return jnp.mean(jnp.abs(pred / max_i - gt / max_i))


def l1_plus_hdr_loss(pred, gt, max_i: float):
    return l1_loss(pred, gt, max_i) + 0.2 * hdr_loss(pred, gt, max_i)


def mse_loss(pred, gt, max_i: float):
    return jnp.mean((pred / max_i - gt / max_i) ** 2)


def mse_plus_hdr_loss(pred, gt, max_i: float):
    return mse_loss(pred, gt, max_i) + 0.2 * hdr_loss(pred, gt, max_i)


LOSSES = {
    "dark": dark_loss,
    "hdr": hdr_loss,
    "l1": l1_loss,
    "l1_plus_hdr": l1_plus_hdr_loss,
    "mse": mse_loss,
    "mse_plus_hdr": mse_plus_hdr_loss,
}


def get_loss(name: str):
    """Loss registry lookup (reference instant_ngp.py:90-97)."""
    return LOSSES[name.lower()]
