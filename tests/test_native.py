"""Tests for the native (C++/OpenMP) host runtime vs the numpy reference."""

import numpy as np
import pytest

from atmonr_tpu import native
from atmonr_tpu.geo import wgs84

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _inputs(n=200):
    rng = np.random.default_rng(0)
    lat = rng.uniform(-60, 60, (n, 4))
    lon = rng.uniform(-170, 170, (n, 4))
    alt = rng.uniform(0, 3000, (n, 4))
    thetav = np.abs(rng.uniform(-45, 45, (n, 4)))
    phiv = rng.uniform(-180, 180, (n, 4))
    return lat, lon, alt, thetav, phiv


def test_build_rays_matches_numpy_within_solver_tol():
    lat, lon, alt, thetav, phiv = _inputs()
    o_n, d_n, l_n = native.build_rays(lat, lon, alt, thetav, phiv, 20000.0)
    o_p, d_p, l_p = wgs84.get_rays(lat, lon, alt, thetav, phiv, 20000.0, xp=np)
    # per-element vs any-element iteration stop: both land within the 10 m
    # solver tolerance of the fixed point
    assert np.abs(o_n - o_p).max() <= 25.0
    assert np.abs(d_n - d_p).max() < 1e-5
    assert np.abs(l_n - l_p.reshape(-1)).max() <= 25.0


def test_build_rays_origin_height():
    lat, lon, alt, thetav, phiv = _inputs()
    o, d, ln = native.build_rays(lat, lon, alt, thetav, phiv, 20000.0)
    _, _, alt_o = wgs84.cartesian_to_horizontal(
        o[:, 0].astype(np.float64),
        o[:, 1].astype(np.float64),
        o[:, 2].astype(np.float64),
        xp=np,
    )
    assert np.abs(alt_o - 20000.0).max() < 15.0


def test_build_rays_propagates_nan():
    lat, lon, alt, thetav, phiv = _inputs(10)
    lat[3, 2] = np.nan
    o, d, ln = native.build_rays(lat, lon, alt, thetav, phiv, 20000.0)
    assert np.isnan(o.reshape(10, 4, 3)[3, 2]).all()
    assert not np.isnan(o.reshape(10, 4, 3)[0, 0]).any()


def test_bulk_conversions_match_numpy():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-80, 80, 500)
    lon = rng.uniform(-179, 179, 500)
    alt = rng.uniform(0, 10000, 500)
    x1, y1, z1 = native.horizontal_to_cartesian(lat, lon, alt)
    x2, y2, z2 = wgs84.horizontal_to_cartesian(lat, lon, alt, xp=np)
    np.testing.assert_allclose(x1, x2, atol=1e-6)
    np.testing.assert_allclose(y1, y2, atol=1e-6)
    np.testing.assert_allclose(z1, z2, atol=1e-6)
    la1, lo1, al1 = native.cartesian_to_horizontal(x1, y1, z1)
    la2, lo2, al2 = wgs84.cartesian_to_horizontal(x1, y1, z1, xp=np)
    np.testing.assert_allclose(la1, la2, atol=1e-12)
    np.testing.assert_allclose(al1, al2, atol=1e-6)
