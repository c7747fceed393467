"""Unit + golden-parity tests for atmonr_tpu.geo."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atmonr_tpu.geo import spherical, wgs84

GOLDEN = Path(__file__).parent / "golden"


def _grid_latlonalt(n=7):
    rng = np.random.default_rng(0)
    lat = rng.uniform(-80, 80, size=(n, n))
    lon = rng.uniform(-179, 179, size=(n, n))
    alt = rng.uniform(0, 9000, size=(n, n))
    return lat, lon, alt


def test_horizontal_cartesian_roundtrip_f64():
    lat, lon, alt = _grid_latlonalt()
    x, y, z = wgs84.horizontal_to_cartesian(lat, lon, alt, xp=np)
    lat2, lon2, alt2 = wgs84.cartesian_to_horizontal(x, y, z, xp=np)
    # Bowring first-order approximation: ~1e-7 deg in lat, sub-meter in alt
    np.testing.assert_allclose(lat2, lat, atol=1e-6)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(alt2, alt, atol=1.0)


def test_cartesian_to_horizontal_f32_meter_accuracy():
    lat, lon, alt = _grid_latlonalt()
    x, y, z = wgs84.horizontal_to_cartesian(lat, lon, alt, xp=np)
    lat2, lon2, alt2 = wgs84.cartesian_to_horizontal(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(z, jnp.float32),
        xp=jnp,
    )
    # f32 ECEF magnitudes carry ~0.5 m ulp; the alt cancellation amplifies it
    assert float(jnp.max(jnp.abs(alt2 - alt))) < 40.0
    assert float(jnp.max(jnp.abs(lat2 - lat))) < 1e-4
    assert float(jnp.max(jnp.abs(lon2 - lon))) < 1e-4


def test_dirvecs_unit_norm_and_nadir():
    theta = np.array([0.0, 30.0, 60.0])
    phi = np.array([0.0, 90.0, -45.0])
    dirs = wgs84.horizontal_coords_to_dirvecs(theta, phi, xp=np)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-12)
    # zenith 0 == straight up (+z)
    np.testing.assert_allclose(dirs[0], [0.0, 0.0, 1.0], atol=1e-12)


def test_get_rays_origin_height_and_direction():
    lat, lon, alt = _grid_latlonalt(5)
    rng = np.random.default_rng(1)
    thetav = rng.uniform(-40, 40, size=lat.shape)
    phiv = rng.uniform(-180, 180, size=lat.shape)
    h = 20000.0
    origins, dirs, lens = wgs84.get_rays(
        lat, lon, np.abs(thetav) * 0 + 100.0, np.abs(thetav), phiv, h, xp=np
    )
    # origins should sit at the requested ellipsoidal height within tol
    _, _, alt_o = wgs84.cartesian_to_horizontal(
        origins[:, 0].astype(np.float64),
        origins[:, 1].astype(np.float64),
        origins[:, 2].astype(np.float64),
        xp=np,
    )
    assert np.max(np.abs(alt_o - h)) < 15.0
    # directions unit-norm, and origin + len*dir lands on the surface points
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
    dest = origins + dirs * lens[:, None]
    _, _, alt_d = wgs84.cartesian_to_horizontal(
        dest[:, 0].astype(np.float64),
        dest[:, 1].astype(np.float64),
        dest[:, 2].astype(np.float64),
        xp=np,
    )
    assert np.max(np.abs(alt_d - 100.0)) < 15.0


def test_get_rays_jax_matches_numpy():
    lat, lon, alt = _grid_latlonalt(4)
    rng = np.random.default_rng(2)
    thetav = np.abs(rng.uniform(-40, 40, size=lat.shape))
    phiv = rng.uniform(-180, 180, size=lat.shape)

    o_np, d_np, l_np = wgs84.get_rays(lat, lon, alt, thetav, phiv, 20000.0, xp=np)

    with jax.enable_x64(True):
        o_j, d_j, l_j = wgs84.get_rays(
            jnp.asarray(lat),
            jnp.asarray(lon),
            jnp.asarray(alt),
            jnp.asarray(thetav),
            jnp.asarray(phiv),
            20000.0,
            xp=jnp,
        )
    np.testing.assert_allclose(np.asarray(o_j), o_np, rtol=0, atol=1.0)
    np.testing.assert_allclose(np.asarray(d_j), d_np, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l_j), l_np, rtol=0, atol=1.0)


def test_filter_and_normalize_rays():
    rng = np.random.default_rng(3)
    origin = rng.normal(size=(100, 3)).astype(np.float32) * 1e6
    direction = rng.normal(size=(100, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)
    rad = rng.uniform(size=100).astype(np.float32)
    origin[3, 0] = np.nan
    direction[5, 1] = np.nan
    rad[7] = np.nan
    mask = wgs84.filter_rays(origin, direction, rad, xp=np)
    assert mask.sum() == 97
    assert not mask[3] and not mask[5] and not mask[7]

    lens = rng.uniform(1e4, 1e5, size=97).astype(np.float32)
    norm, scale, offset = wgs84.normalize_rays(
        origin[mask], direction[mask], lens, xp=np
    )
    assert norm.min() >= -1.0 and norm.max() <= 1.0
    assert scale > 0
    assert offset.shape == (3,)


def test_vincenty_known_distance():
    # classic geodetic test line: Flinders Peak -> Buninyong (GDA technical
    # manual): s = 54972.271 m
    s, a1, a2 = wgs84.vincenty_distance(
        (np.array([-37.95103342]), np.array([144.42486789])),
        (np.array([-37.65282114]), np.array([143.92649553])),
        xp=np,
    )
    np.testing.assert_allclose(s, 54972.271, atol=0.01)


def test_vincenty_direct_inverse_consistency():
    latlon1 = (np.array([37.0, -12.0]), np.array([-122.0, 45.0]))
    latlon2 = (np.array([34.0, -10.0]), np.array([-118.0, 47.0]))
    s, a1, _ = wgs84.vincenty_distance(latlon1, latlon2, xp=np)
    (lat2, lon2), _ = wgs84.vincenty_point_along_geodesic(latlon1, a1, s, xp=np)
    np.testing.assert_allclose(lat2, latlon2[0], atol=1e-8)
    np.testing.assert_allclose(lon2, latlon2[1], atol=1e-8)


def test_spherical_roundtrip_and_stretch():
    rng = np.random.default_rng(4)
    xyz = rng.normal(size=(50, 3)) * 1e6 + np.array([5e6, 0, 3e6])
    s = spherical.wgs_84_to_spherical(xyz, xp=np)
    back = spherical.spherical_to_wgs84(s, xp=np)
    np.testing.assert_allclose(back, xyz, rtol=1e-12)

    stretched = spherical.stretch_above_sea_level(s, 2.0, xp=np)
    unstretched = spherical.stretch_above_sea_level(stretched, 0.5, xp=np)
    np.testing.assert_allclose(unstretched, s, rtol=1e-9)


@pytest.mark.skipif(
    not (GOLDEN / "geo_wgs84.npz").exists(), reason="golden file not generated"
)
def test_golden_parity_wgs84():
    """Bit-level parity vs recorded reference (torch) outputs."""
    g = np.load(GOLDEN / "geo_wgs84.npz")
    x, y, z = wgs84.horizontal_to_cartesian(
        g["lat"], g["lon"], g["alt"], xp=np
    )
    np.testing.assert_allclose(x, g["x"], rtol=1e-14)
    np.testing.assert_allclose(y, g["y"], rtol=1e-14)
    np.testing.assert_allclose(z, g["z"], rtol=1e-14)

    lat2, lon2, alt2 = wgs84.cartesian_to_horizontal(x, y, z, xp=np)
    np.testing.assert_allclose(lat2, g["lat_rt"], rtol=1e-14)
    np.testing.assert_allclose(lon2, g["lon_rt"], rtol=1e-14)
    np.testing.assert_allclose(alt2, g["alt_rt"], rtol=1e-9, atol=1e-6)

    origins, dirs, lens = wgas_rays = wgs84.get_rays(
        g["r_lat"], g["r_lon"], g["r_alt"], g["r_thetav"], g["r_phiv"], 20000.0, xp=np
    )
    np.testing.assert_allclose(origins, g["ray_origins"], rtol=0, atol=1e-2)
    np.testing.assert_allclose(dirs, g["ray_dirs"], rtol=0, atol=1e-6)
    np.testing.assert_allclose(lens, g["ray_lens"], rtol=0, atol=1e-2)

    s, a1, a2 = wgs84.vincenty_distance(
        (g["v_lat1"], g["v_lon1"]), (g["v_lat2"], g["v_lon2"]), xp=np
    )
    np.testing.assert_allclose(s, g["v_s"], rtol=1e-12)
    np.testing.assert_allclose(a1, g["v_a1"], rtol=1e-10)
    np.testing.assert_allclose(a2, g["v_a2"], rtol=1e-10)
