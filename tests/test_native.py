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


def test_native_voxel_traversal_matches_numpy():
    """The C++ Amanatides-Woo walk visits exactly the numpy path's voxel
    set, for random segments including axis-aligned and zero-length."""
    from atmonr_tpu.extract import voxel_traversal as vt

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)
    u = rng.uniform(-10, 10, (200, 3))
    end = u + rng.uniform(-20, 20, (200, 3))
    end[0] = u[0]  # zero-length segment
    end[1, 1:] = u[1, 1:]  # axis-aligned
    got, counts = native.voxel_traversal(u, end)
    assert counts.shape == (200,) and (counts >= 1).all()

    # numpy reference path (bypass the native dispatch)
    ref_rows = []
    for i in range(200):
        kwargs = dict(unique_only=True)
        # call the pure-numpy body by slicing one segment at a time through
        # a 2-D view (the dispatch only triggers for the same result anyway)
        ref_rows.append(
            _numpy_traversal(u[i : i + 1], end[i : i + 1])
        )
    ref = np.unique(np.concatenate(ref_rows, axis=0), axis=0)
    got_u = np.unique(got, axis=0)
    np.testing.assert_array_equal(got_u, ref)


def _numpy_traversal(u, end):
    """The pre-native numpy Amanatides-Woo body (kept for the parity test)."""
    import numpy as np

    u = np.asarray(u, np.float64)
    end = np.asarray(end, np.float64)
    dists = np.linalg.norm(end - u, axis=-1)[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        v = (end - u) / dists
    vox_idx = np.floor(u).astype(np.int32)
    vox_idx_end = np.floor(end).astype(np.int32)
    sign_v = np.sign(v)
    sign_v[np.isnan(sign_v)] = 0
    sign_v = sign_v.astype(np.int32)
    sign_v_u = sign_v * u
    with np.errstate(divide="ignore", invalid="ignore"):
        tmax = np.abs((np.ceil(sign_v_u) - sign_v_u) / v)
        tdelta = np.abs(1.0 / v)
    tmax[np.isnan(tmax)] = np.inf
    tmax[vox_idx == vox_idx_end] = np.inf
    registry = [np.unique(vox_idx, axis=0)]
    diff = (vox_idx - vox_idx_end) * sign_v
    done = (diff == 0).all(axis=-1) | (diff > 0).any(axis=-1)
    active = ~done
    while active.any():
        rows = np.where(active)[0]
        next_axis = np.argmin(tmax[rows], axis=-1)
        tmax[rows, next_axis] += tdelta[rows, next_axis]
        vox_idx[rows, next_axis] += sign_v[rows, next_axis]
        registry.append(vox_idx[rows].copy())
        diff = (vox_idx[rows] - vox_idx_end[rows]) * sign_v[rows]
        diff_nonneg = diff >= 0
        overshot = (diff > 0).any(axis=-1)
        tmax[rows] = np.where(diff_nonneg, np.inf, tmax[rows])
        newly_done = diff_nonneg.all(axis=-1) | overshot
        active[rows[newly_done]] = False
    return np.unique(np.concatenate(registry, axis=0), axis=0)
