"""WGS-84 geospatial math for multi-angle satellite ray construction.

Reference frames (same conventions as the reference implementation,
``/root/reference/src/atmonr/geospatial/wgs_84.py``):

1. WGS-84 ellipsoid, horizontal coordinates (lat/lon/alt), EPSG:4326.
2. WGS-84 ellipsoid, Cartesian coordinates (ECEF), EPSG:4978.
3. Normalized Cartesian scene coordinates: +X=East, +Y=North, +Z=up at the
   scene-center pixel, max-min normalized to [-1, 1].

TPU-first design: every function is written once against an array namespace
``xp`` (numpy or ``jax.numpy``), so the *same* math runs

- on the host in float64 numpy for one-time dataset construction (ray
  building needs meter-level accuracy; f64 on TPU is emulated and slow,
  so it has no business in the training loop), and
- under ``jax.jit`` in float32 for the per-step point preprocessor, where a
  ~1 m error floor (inherent to f32 ECEF magnitudes, see
  ``cartesian_to_horizontal``) is far below the 250 m extraction resolution.

Iterative solves (``get_rays`` origin solve, Vincenty) run as genuine
``while`` loops on numpy (bit-faithful to the reference semantics) and as
statically-unrolled masked updates when traced by JAX — these run at dataset
build / grid construction time, never in the training hot loop.

Functional parity with reference ``geospatial/wgs_84.py:24-575``.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import numpy as np

# WGS-84 constants (reference wgs_84.py:17-21)
WGS_84_A = 6378137.0  # semimajor axis [m]
WGS_84_B = 6356752.314245  # semiminor axis [m]
WGS_84_E = (WGS_84_A**2 - WGS_84_B**2) / (WGS_84_A**2)  # first eccentricity squared
WGS_84_E2 = (WGS_84_A**2 - WGS_84_B**2) / (WGS_84_B**2)  # second eccentricity squared
WGS_84_F = (WGS_84_A - WGS_84_B) / WGS_84_A  # flattening


def _is_numpy(xp: Any) -> bool:
    return xp is np


def horizontal_to_cartesian(lat, lon, alt, *, xp=jnp):
    """Convert WGS-84 geographic (lat, lon, alt[m]) to ECEF Cartesian (x, y, z).

    EPSG:4326 -> EPSG:4978. float32 carries meter-level error at ECEF
    magnitudes (~6.4e6 m, ulp ~0.5 m); pass float64 arrays with ``xp=numpy``
    when more accuracy is needed. Parity: reference wgs_84.py:24-53.
    """
    lat = lat * (math.pi / 180.0)
    lon = lon * (math.pi / 180.0)
    sin_lat = xp.sin(lat)
    n = WGS_84_A / xp.sqrt(1.0 - (WGS_84_E * sin_lat**2))
    cos_lat = xp.cos(lat)
    x = (n + alt) * cos_lat * xp.cos(lon)
    y = (n + alt) * cos_lat * xp.sin(lon)
    z = (n * (1.0 - WGS_84_E) + alt) * sin_lat
    return x, y, z


def cartesian_to_horizontal(x, y, z, *, xp=jnp):
    """Convert ECEF Cartesian (x, y, z) to WGS-84 geographic (lat, lon, alt[m]).

    EPSG:4978 -> EPSG:4326 using Bowring's (1976) first-order approximation,
    matching the reference's formulation (wgs_84.py:56-97) including its
    altitude solve ``alt = x / (cos(lat) cos(lon)) - N``.

    Accuracy: f64 is exact to ~mm; f32 has an irreducible ~1-6 m error in
    ``alt`` from the catastrophic cancellation of two ~6.4e6 m quantities
    (each with ulp ~0.5 m). The training-loop point preprocessor tolerates
    this (it feeds a 20 km-normalized coordinate); dataset construction and
    extraction grids use the f64 numpy path.
    """
    lon = xp.arctan2(y, x)
    d = xp.sqrt(x**2 + y**2)  # horizontal component
    # parametric latitude (first Bowring iteration)
    u = xp.arctan2(z / d, xp.zeros_like(x) + (WGS_84_A / WGS_84_B))
    sin_u = xp.sin(u)
    cos_u = xp.cos(u)
    lat = xp.arctan2(
        z + (WGS_84_E2 * WGS_84_B) * sin_u**3,
        d - (WGS_84_E * WGS_84_A) * cos_u**3,
    )
    n = WGS_84_A / xp.sqrt(1.0 - (WGS_84_E * xp.sin(lat) ** 2))
    alt = x / (xp.cos(lat) * xp.cos(lon)) - n
    return lat * (180.0 / math.pi), lon * (180.0 / math.pi), alt


def horizontal_coords_to_rot_mtx(theta, phi, *, xp=jnp):
    """Rotation matrices from horizontal coordinates (zenith, azimuth), degrees.

    Returns an array of shape (..., 3, 3). Parity: reference wgs_84.py:100-132
    (sign of rotation flipped to match the 3-D rotation convention).
    """
    theta = -theta * (math.pi / 180.0)
    phi = -phi * (math.pi / 180.0)
    sin_t, cos_t = xp.sin(theta), xp.cos(theta)
    sin_p, cos_p = xp.sin(phi), xp.cos(phi)
    zeros = xp.zeros_like(theta)
    row0 = xp.stack([cos_p, -sin_p * cos_t, sin_p * sin_t], axis=-1)
    row1 = xp.stack([sin_p, cos_p * cos_t, -cos_p * sin_t], axis=-1)
    row2 = xp.stack([zeros, sin_t, cos_t], axis=-1)
    return xp.stack([row0, row1, row2], axis=-2)


def horizontal_coords_to_dirvecs(theta, phi, *, xp=jnp):
    """Direction vectors (+z = up frame) from (zenith, azimuth) in degrees.

    The result is the rotation matrix applied to the unit +z vector, i.e. its
    third column. Parity: reference wgs_84.py:135-160.
    """
    shp = theta.shape
    rot = horizontal_coords_to_rot_mtx(
        xp.reshape(theta, (-1,)), xp.reshape(phi, (-1,)), xp=xp
    )
    dirs = rot[..., :, 2]
    return xp.reshape(dirs, tuple(shp) + (3,))


def dirvecs_to_horizontal_coords(dirs, *, xp=jnp):
    """Direction vectors -> (zenith [0,360), azimuth [-180,180)) in degrees.

    Parity: reference wgs_84.py:163-186 (including its use of the norm of the
    full first-two-component sub-array).
    """
    dirs = xp.reshape(dirs, (-1, 3))
    # NOTE: the reference computes a single scalar norm over dirs[..., :2]
    # (torch.linalg.norm flattens); we preserve that quirk for parity.
    horiz_norm = xp.sqrt(xp.sum(dirs[..., :2] ** 2))
    theta = xp.arctan2(horiz_norm, dirs[..., 2])
    phi = -xp.arctan2(dirs[..., 0], -dirs[..., 1])
    theta = (theta * (180.0 / math.pi)) % 360.0
    phi = (phi * (180.0 / math.pi)) % 360.0 - 180.0
    return theta, phi


def compose_dirs_and_surface_normals(dirs, lat, lon, *, xp=jnp):
    """Rotate +z=up-frame direction vectors into the WGS-84 Cartesian frame.

    Applies R(90-lat, 90-lon) after a 180-degree z-rotation (the WGS frame has
    +X through the prime meridian / +Y east / +Z north-pole, while the scene
    frame is +X east / +Y north / +Z up). Parity: reference wgs_84.py:189-220.
    """
    rot = horizontal_coords_to_rot_mtx(90.0 - lat, 90.0 - lon, xp=xp)
    d = xp.stack([-dirs[..., 0], -dirs[..., 1], dirs[..., 2]], axis=-1)
    return xp.einsum("...ij,...j->...i", rot, d)


def get_rays(
    lat,
    lon,
    alt,
    thetav,
    phiv,
    ray_origin_height: float,
    tol: float = 10.0,
    max_iters: int = 20,
    *,
    xp=np,
):
    """Build rays (origin, direction, length) from satellite viewing geometry.

    P pixels x A angles -> flattened (P*A, 3) origins at ``ray_origin_height``
    above the ellipsoid, unit directions pointing from top-of-atmosphere toward
    the surface, and segment lengths. The origin height is found by a
    fixed-point iteration on the ray length (scale the length by the ratio of
    the target height to the achieved height), matching reference
    wgs_84.py:223-290 including its float32 round-trip of the surface points.

    On numpy the solve is a genuine ``while any(err > tol)`` loop (reference
    semantics); under JAX tracing it is ``max_iters`` unrolled masked updates
    (the iteration is contractive, so extra iterations only tighten the fix
    point). Dataset construction calls this on host numpy in float64.
    """
    f64 = xp.float64
    f32 = xp.float32

    x, y, z = horizontal_to_cartesian(
        lat.astype(f64), lon.astype(f64), alt.astype(f64), xp=xp
    )
    # reference quantizes the surface points to f32 (wgs_84.py:257)
    xyz = xp.stack([x, y, z], axis=-1).astype(f32).astype(f64)

    dirs = horizontal_coords_to_dirvecs(
        thetav.astype(f64), phiv.astype(f64), xp=xp
    )
    comp_dirs = compose_dirs_and_surface_normals(
        xp.reshape(dirs, (-1, 3)),
        xp.reshape(lat, (-1,)).astype(f64),
        xp.reshape(lon, (-1,)).astype(f64),
        xp=xp,
    )
    # flip so the top of the atmosphere is the origin
    comp_dirs = -xp.reshape(comp_dirs, dirs.shape)

    # initial guess: straight-line length via the view zenith
    lens = (
        (ray_origin_height - alt) / xp.cos(thetav * (math.pi / 180.0))
    ).astype(f64)
    lens = xp.reshape(lens, comp_dirs.shape[:-1])

    def _alt_at(lens_):
        xyz2 = xyz - lens_[..., None] * comp_dirs
        _, _, alt_check = cartesian_to_horizontal(
            xyz2[..., 0], xyz2[..., 1], xyz2[..., 2], xp=xp
        )
        return alt_check

    alt_check = _alt_at(lens)
    if _is_numpy(xp):
        err = np.abs(ray_origin_height - alt_check)
        iters = 0
        while iters < max_iters and np.any(err > tol):
            lens = lens * ray_origin_height / alt_check
            alt_check = _alt_at(lens)
            err = np.abs(ray_origin_height - alt_check)
            iters += 1
    else:
        for _ in range(max_iters):
            converged = xp.all(xp.abs(ray_origin_height - alt_check) <= tol)
            new_lens = lens * ray_origin_height / alt_check
            lens = xp.where(converged, lens, new_lens)
            alt_check = xp.where(converged, alt_check, _alt_at(lens))

    lens = lens.astype(f32).astype(f64)
    origins = xp.reshape(xyz - comp_dirs * lens[..., None], (-1, 3))
    comp_dirs = xp.reshape(comp_dirs, (-1, 3))
    return (
        origins.astype(f32),
        comp_dirs.astype(f32),
        xp.reshape(lens, (-1,)).astype(f32),
    )


def filter_rays(ray_origin, ray_dir, ray_rad, *, xp=jnp):
    """Mask of rays with valid origin, direction, and radiance.

    Parity: reference wgs_84.py:293-313.
    """
    pos_nan = xp.any(xp.isnan(ray_origin), axis=1)
    dir_nan = xp.any(xp.isnan(ray_dir), axis=1)
    rad_nan = xp.isnan(ray_rad)
    return (~pos_nan) & (~dir_nan) & (~rad_nan)


def normalize_rays(ray_origin, ray_dir, ray_len, *, xp=jnp):
    """Normalize ray origins into [-1, 1]^3; return (origins_norm, scale, offset).

    scale is the half-extent of the largest axis (python float); offset is the
    (3,) float64 box center. Parity: reference wgs_84.py:316-339.
    """
    xyz = xp.concatenate(
        [ray_origin, ray_origin + ray_dir * ray_len[:, None]], axis=0
    )
    xyz_max = xp.max(xyz, axis=0).astype(xp.float64)
    xyz_min = xp.min(xyz, axis=0).astype(xp.float64)
    scale = float(xp.max(xyz_max - xyz_min) / 2.0)
    offset = (xyz_max + xyz_min) / 2.0
    origin_norm = xp.clip((ray_origin - offset) / scale, -1.0, 1.0).astype(
        xp.float32
    )
    return origin_norm, scale, offset


def vincenty_distance(latlon1, latlon2, tol: float = 1e-12, max_iters: int = 10, *, xp=np):
    """Geodesic distance on the WGS-84 ellipsoid (Vincenty inverse problem).

    Args mirror the reference (wgs_84.py:342-449): ``latlon*`` are (lat, lon)
    tuples or (2, ...) arrays, in degrees. Returns (distance [m], forward
    azimuth at start [deg], forward azimuth at destination [deg]).

    numpy: genuine while loop raising after ``max_iters`` non-converged
    iterations (reference behavior). JAX tracing: ``max_iters`` unrolled
    masked iterations, no convergence check (grid construction only).
    """
    lat1, lat2 = latlon1[0] * (math.pi / 180.0), latlon2[0] * (math.pi / 180.0)
    lon1, lon2 = latlon1[1] * (math.pi / 180.0), latlon2[1] * (math.pi / 180.0)
    u1 = xp.arctan((1.0 - WGS_84_F) * xp.tan(lat1))
    u2 = xp.arctan((1.0 - WGS_84_F) * xp.tan(lat2))
    big_l = lon2 - lon1

    sin_u1, cos_u1 = xp.sin(u1), xp.cos(u1)
    sin_u2, cos_u2 = xp.sin(u2), xp.cos(u2)

    lambd = big_l

    def _iterate(lambd):
        sin_l, cos_l = xp.sin(lambd), xp.cos(lambd)
        sin_sigma = xp.sqrt(
            (cos_u2 * sin_l) ** 2 + (cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_l) ** 2
        )
        cos_sigma = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cos_l
        sigma = xp.arctan2(sin_sigma, cos_sigma)
        sin_alpha = cos_u1 * cos_u2 * sin_l / sin_sigma
        cos2_alpha = 1.0 - sin_alpha**2
        cos_2sigmam = cos_sigma - (2.0 * sin_u1 * sin_u2) / cos2_alpha
        c = (WGS_84_F / 16.0) * cos2_alpha * (4.0 + WGS_84_F * (4.0 - 3.0 * cos2_alpha))
        lambd_new = big_l + (1.0 - c) * WGS_84_F * sin_alpha * (
            sigma
            + c
            * sin_sigma
            * (cos_2sigmam + c * cos_sigma * (-1.0 + 2.0 * cos_2sigmam**2))
        )
        return lambd_new, (sin_sigma, cos_sigma, sigma, cos2_alpha, cos_2sigmam)

    if _is_numpy(xp):
        num_iters = 0
        state = None
        while True:
            lambd_new, state = _iterate(lambd)
            diff = np.abs(lambd_new - lambd)
            lambd = lambd_new
            num_iters += 1
            if not np.any(diff > tol):
                break
            if num_iters > max_iters:
                raise Warning(
                    f"Exceeded {max_iters} iterations without lambda changing by "
                    f"less than {tol:.1e}"
                )
    else:
        state = None
        for _ in range(max_iters):
            lambd, state = _iterate(lambd)
    assert state is not None
    sin_sigma, cos_sigma, sigma, cos2_alpha, cos_2sigmam = state

    u_sq = cos2_alpha * (WGS_84_A**2 - WGS_84_B**2) / WGS_84_B**2
    big_a = 1.0 + (u_sq / 16384.0) * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq))
    )
    big_b = (u_sq / 1024.0) * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    delta_sigma = (
        big_b
        * sin_sigma
        * (
            cos_2sigmam
            + 0.25
            * big_b
            * (
                cos_sigma * (-1.0 + 2.0 * cos_2sigmam**2)
                - (big_b / 6.0)
                * cos_2sigmam
                * (-3.0 + 4.0 * sin_sigma**2)
                * (-3.0 + 4.0 * cos_2sigmam**2)
            )
        )
    )
    s = WGS_84_B * big_a * (sigma - delta_sigma)
    sin_l, cos_l = xp.sin(lambd), xp.cos(lambd)
    alpha1 = xp.arctan2(cos_u2 * sin_l, cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_l)
    alpha2 = xp.arctan2(cos_u1 * sin_l, -sin_u1 * cos_u2 + cos_u1 * sin_u2 * cos_l)
    return s, alpha1 * (180.0 / math.pi), alpha2 * (180.0 / math.pi)


def vincenty_point_along_geodesic(
    latlon1, alpha1, s, tol: float = 1e-6, max_iters: int = 10, *, xp=np
):
    """Destination along a geodesic (Vincenty direct problem).

    Args mirror the reference (wgs_84.py:452-575): start (lat, lon) in
    degrees, forward azimuth in degrees, distance in meters. Returns
    ((lat2, lon2) matching the container kind of ``latlon1``, alpha2).
    """
    is_tuple = isinstance(latlon1, tuple)
    lat1 = latlon1[0] * (math.pi / 180.0)
    lon1 = latlon1[1] * (math.pi / 180.0)
    alpha1 = alpha1 * (math.pi / 180.0)

    u1 = xp.arctan((1.0 - WGS_84_F) * xp.tan(lat1))
    sin_u1, cos_u1 = xp.sin(u1), xp.cos(u1)
    cos_a1 = xp.cos(alpha1)
    sigma1 = xp.arctan2(xp.tan(u1), cos_a1)
    sin_alpha = cos_u1 * xp.sin(alpha1)
    u_sq = (1.0 - sin_alpha**2) * (WGS_84_A**2 - WGS_84_B**2) / WGS_84_B**2
    big_a = 1.0 + (u_sq / 16384.0) * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq))
    )
    big_b = (u_sq / 1024.0) * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))

    sigma = s / (WGS_84_B * big_a)

    def _iterate(sigma):
        cos_2sigmam = xp.cos(2.0 * sigma1 + sigma)
        delta_sigma = (
            big_b
            * xp.sin(sigma)
            * (
                cos_2sigmam
                + 0.25
                * big_b
                * (
                    xp.cos(sigma) * (-1.0 + 2.0 * cos_2sigmam**2)
                    - (big_b / 6.0)
                    * cos_2sigmam
                    * (-3.0 + 4.0 * xp.sin(sigma) ** 2)
                    * (-3.0 + 4.0 * cos_2sigmam**2)
                )
            )
        )
        return s / (WGS_84_B * big_a) + delta_sigma, cos_2sigmam

    cos_2sigmam = xp.zeros_like(sigma)
    if _is_numpy(xp):
        num_iters = 0
        while True:
            sigma_new, cos_2sigmam = _iterate(sigma)
            diff = np.abs(sigma_new - sigma)
            sigma = sigma_new
            num_iters += 1
            if not np.any(diff > tol):
                break
            if num_iters > max_iters:
                raise Warning(
                    f"Exceeded {max_iters} iterations without sigma changing by "
                    f"less than {tol:.1e}"
                )
    else:
        for _ in range(max_iters):
            sigma, cos_2sigmam = _iterate(sigma)

    sin_sigma, cos_sigma = xp.sin(sigma), xp.cos(sigma)
    lat2 = xp.arctan2(
        sin_u1 * cos_sigma + cos_u1 * sin_sigma * cos_a1,
        (1.0 - WGS_84_F)
        * xp.sqrt(
            sin_alpha**2 + (sin_u1 * sin_sigma - cos_u1 * cos_sigma * cos_a1) ** 2
        ),
    )
    lambd = xp.arctan2(
        sin_sigma * xp.sin(alpha1), cos_u1 * cos_sigma - sin_u1 * sin_sigma * cos_a1
    )
    c = (
        (WGS_84_F / 16.0)
        * (1.0 - sin_alpha**2)
        * (4.0 + WGS_84_F * (4.0 - 3.0 * (1.0 - sin_alpha**2)))
    )
    big_l = lambd - (1.0 - c) * WGS_84_F * sin_alpha * (
        sigma
        + c * sin_sigma * (cos_2sigmam + c * cos_sigma * (-1.0 + 2.0 * cos_2sigmam**2))
    )
    lon2 = big_l + lon1
    alpha2 = xp.arctan2(
        sin_alpha, -sin_u1 * sin_sigma + cos_u1 * cos_sigma * cos_a1
    )
    lat2 = lat2 * (180.0 / math.pi)
    lon2 = lon2 * (180.0 / math.pi)
    if is_tuple:
        return (lat2, lon2), alpha2
    return xp.stack([lat2, lon2]), alpha2
