"""Spherical-Earth helpers for global-scale visualization grids.

Functional parity with reference ``geospatial/spherical.py:15-36``; written
against an array namespace ``xp`` (numpy or jax.numpy) like the rest of
``atmonr_tpu.geo``.
"""

from __future__ import annotations

import jax.numpy as jnp

from atmonr_tpu.geo.wgs84 import WGS_84_A, WGS_84_B

EARTH_RADIUS = 6.378e6  # meters


def wgs_84_to_spherical(xyz, *, xp=jnp):
    """Rescale WGS-84 ECEF points onto a sphere of EARTH_RADIUS."""
    z = xyz[..., 2] * (WGS_84_A / WGS_84_B)
    xyz_s = xp.concatenate([xyz[..., :2], z[..., None]], axis=-1)
    return xyz_s * (EARTH_RADIUS / WGS_84_A)


def spherical_to_wgs84(xyz, *, xp=jnp):
    """Inverse of :func:`wgs_84_to_spherical`."""
    xyz_w = xyz * (WGS_84_A / EARTH_RADIUS)
    z = xyz_w[..., 2] * (WGS_84_B / WGS_84_A)
    return xp.concatenate([xyz_w[..., :2], z[..., None]], axis=-1)


def stretch_above_sea_level(xyz, stretch: float, *, xp=jnp):
    """Radially stretch above-sea-level points by ``stretch`` (atmosphere
    exaggeration for global viz)."""
    radii = xp.sqrt(xp.sum(xyz**2, axis=-1))
    above = radii > EARTH_RADIUS
    rad_stretch = xp.where(above, (radii - EARTH_RADIUS) * stretch + EARTH_RADIUS, radii)
    factor = xp.where(above, rad_stretch / radii, xp.ones_like(radii))
    return xyz * factor[..., None]
