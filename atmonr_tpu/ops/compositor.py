"""Beer-Lambert volume compositing along viewing rays.

Functional parity with reference ``graphics_utils.py:6-77``. The compositor
is the per-ray reduction at the end of every forward pass; under ``jit`` XLA
fuses the exp/cumprod/weighted-sum chain with the surrounding elementwise ops,
and the cumulative product lowers to an associative scan (O(log N) depth) that
maps well onto the VPU.

The transmittance factorizes multiplicatively across contiguous sample-axis
shards (log-space addition), which is what
``atmonr_tpu.parallel.sharding`` exploits for the sample-parallel (sequence-
parallel analog) compositor.
"""

from __future__ import annotations

import jax.numpy as jnp


def render(z_vals, color, sigma):
    """Composite sampled colors and densities along rays (Beer-Lambert law).

    Args:
        z_vals: (B, N) distances of samples along each ray, in km.
        color:  (B, N, C) colors at sampled locations.
        sigma:  (B, N, 1 or C) extinction densities at sampled locations.

    Returns:
        color_map: (B, C) composited color per ray.
        alpha:     (B, N, C) per-sample attenuation.
        weights:   (B, N, 1 or C) compositing weights (the coarse-to-fine pdf).

    Parity: reference graphics_utils.py:6-49 — Voronoi (midpoint) deltas with
    a zero prepended and the final z appended, ``alpha = 1 - exp(-sigma *
    delta)``, transmittance via cumprod with a 1e-10 guard.
    """
    assert z_vals.ndim == 2 and color.ndim == 3 and sigma.ndim == 3
    z_vals = z_vals.astype(color.dtype)

    z_mid = (z_vals[..., :-1] + z_vals[..., 1:]) * 0.5
    z_mid = jnp.concatenate(
        [z_vals[..., :1] * 0, z_mid, z_vals[..., -1:]], axis=-1
    )
    delta = jnp.diff(z_mid, axis=-1)[..., None]

    alpha = 1.0 - jnp.exp(-sigma * delta)
    ones = jnp.ones(
        (alpha.shape[0], 1, alpha.shape[2]), dtype=alpha.dtype
    )
    trans = jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=1), axis=1
    )[:, :-1]
    weights = alpha * trans
    color_map = jnp.sum(color * weights, axis=1)
    return color_map, alpha, weights


def render_with_surface(z_vals, color, sigma, color_surf):
    """Composite with an opaque surface term behind the volume.

    The surface contributes ``prod(1 - alpha) * color_surf`` (total volume
    transmittance times surface color). Parity: reference
    graphics_utils.py:52-77.

    Returns:
        (color_map, alpha, weights, color_map_atmo, color_map_surf)
    """
    color_map_atmo, alpha, weights = render(z_vals, color, sigma)
    color_map_surf = jnp.prod(1.0 - alpha, axis=1) * color_surf
    color_map = color_map_atmo + color_map_surf
    return color_map, alpha, weights, color_map_atmo, color_map_surf
