"""ctypes bindings for the native (C++/OpenMP) host runtime.

Builds lazily with ``make -C native`` on first use if the shared library is
missing; every entry point has a numpy fallback so the framework runs
without a toolchain. See ``native/atmonr_native.cpp``.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parent.parent.parent
_NATIVE_DIR = _REPO / "native"
_LIB_PATH = _NATIVE_DIR / "libatmonr_native.so"

_lib = None
_lib_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    f64p = ctypes.POINTER(ctypes.c_double)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.atmonr_build_rays.argtypes = [
        f32p, f32p, f32p, f32p, f32p,
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        f32p, f32p, f32p,
    ]
    lib.atmonr_h2c.argtypes = [f64p, f64p, f64p, ctypes.c_int64, f64p, f64p, f64p]
    lib.atmonr_c2h.argtypes = [f64p, f64p, f64p, ctypes.c_int64, f64p, f64p, f64p]
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.atmonr_voxel_traversal.argtypes = [
        f64p, f64p, ctypes.c_int64, i64p, i32p, i32p,
    ]
    lib.atmonr_num_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _f64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def build_rays(
    lat: np.ndarray,
    lon: np.ndarray,
    alt: np.ndarray,
    thetav: np.ndarray,
    phiv: np.ndarray,
    ray_origin_height: float,
    tol: float = 10.0,
    max_iters: int = 20,
):
    """Multithreaded ray construction; numpy fallback when the library is
    unavailable. Same contract as ``geo.wgs84.get_rays``.
    """
    lib = _load()
    if lib is None:
        from atmonr_tpu.geo import wgs84

        return wgs84.get_rays(
            lat, lon, alt, thetav, phiv, ray_origin_height, tol, max_iters,
            xp=np,
        )
    shape = lat.shape
    n = int(np.prod(shape))
    conv = lambda a: np.ascontiguousarray(a, np.float32).reshape(-1)  # noqa: E731
    lat32, lon32, alt32 = conv(lat), conv(lon), conv(alt)
    th32, ph32 = conv(thetav), conv(phiv)
    origins = np.empty((n, 3), np.float32)
    dirs = np.empty((n, 3), np.float32)
    lens = np.empty((n,), np.float32)
    lib.atmonr_build_rays(
        _f32p(lat32), _f32p(lon32), _f32p(alt32), _f32p(th32), _f32p(ph32),
        n, float(ray_origin_height), float(tol), int(max_iters),
        _f32p(origins), _f32p(dirs), _f32p(lens),
    )
    return origins, dirs, lens


def cartesian_to_horizontal(x, y, z):
    """Bulk f64 ECEF -> geodetic via the native library (numpy fallback)."""
    lib = _load()
    if lib is None:
        from atmonr_tpu.geo import wgs84

        return wgs84.cartesian_to_horizontal(x, y, z, xp=np)
    shape = np.shape(x)
    conv = lambda a: np.ascontiguousarray(a, np.float64).reshape(-1)  # noqa: E731
    xf, yf, zf = conv(x), conv(y), conv(z)
    n = xf.shape[0]
    lat = np.empty(n)
    lon = np.empty(n)
    alt = np.empty(n)
    lib.atmonr_c2h(_f64p(xf), _f64p(yf), _f64p(zf), n, _f64p(lat), _f64p(lon), _f64p(alt))
    return lat.reshape(shape), lon.reshape(shape), alt.reshape(shape)


def voxel_traversal(u: np.ndarray, end: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """Multithreaded Amanatides-Woo traversal: all voxels crossed by the
    segments u -> end (continuous voxel coordinates). Two C calls: a
    count-only pass (out_vox = NULL), then a write pass at the exact
    prefix-sum offsets — the walk is cheap enough (~100 ms for 50k long
    segments) that running it twice beats any Python-side compaction.
    Returns (voxels (total, 3) int32 laid out per-ray, counts (N,) int32),
    or None when the library is unavailable (callers fall back to the
    numpy implementation)."""
    lib = _load()
    if lib is None:
        return None
    u = np.ascontiguousarray(u, np.float64)
    end = np.ascontiguousarray(end, np.float64)
    n = u.shape[0]
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    counts = np.zeros(n, np.int32)
    lib.atmonr_voxel_traversal(
        _f64p(u), _f64p(end), n, None, None,
        counts.ctypes.data_as(i32p),
    )
    offsets = np.zeros(n, np.int64)
    np.cumsum(counts[:-1], dtype=np.int64, out=offsets[1:])
    out_vox = np.empty((int(counts.sum(dtype=np.int64)), 3), np.int32)
    lib.atmonr_voxel_traversal(
        _f64p(u), _f64p(end), n,
        offsets.ctypes.data_as(i64p),
        out_vox.ctypes.data_as(i32p),
        counts.ctypes.data_as(i32p),
    )
    return out_vox, counts


def horizontal_to_cartesian(lat, lon, alt):
    """Bulk f64 geodetic -> ECEF via the native library (numpy fallback)."""
    lib = _load()
    if lib is None:
        from atmonr_tpu.geo import wgs84

        return wgs84.horizontal_to_cartesian(lat, lon, alt, xp=np)
    shape = np.shape(lat)
    conv = lambda a: np.ascontiguousarray(a, np.float64).reshape(-1)  # noqa: E731
    la, lo, al = conv(lat), conv(lon), conv(alt)
    n = la.shape[0]
    x = np.empty(n)
    y = np.empty(n)
    z = np.empty(n)
    lib.atmonr_h2c(_f64p(la), _f64p(lo), _f64p(al), n, _f64p(x), _f64p(y), _f64p(z))
    return x.reshape(shape), y.reshape(shape), z.reshape(shape)
