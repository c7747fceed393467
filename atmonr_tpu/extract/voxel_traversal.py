"""Batched Amanatides-Woo voxel traversal (host-side numpy).

Parity with reference ``graphics_utils.py:80-147``. The algorithm's
data-dependent while loop makes it a poor fit for XLA's static control flow;
it runs once per extraction as grid preprocessing, never in a training hot
path, so the TPU-native design keeps it on host (SURVEY §7 hard-part 5). A
multithreaded C++ implementation is available via
``atmonr_tpu.native`` when the native library is built.
"""

from __future__ import annotations

import numpy as np


def voxel_traversal(
    u: np.ndarray, end: np.ndarray, unique_only: bool = True
) -> np.ndarray:
    """All voxels crossed by segments from ``u`` to ``end`` (unit voxels).

    Args:
        u: (N, D) float start points in continuous voxel coordinates.
        end: (N, D) float end points.
        unique_only: de-duplicate the returned voxel list.

    Returns:
        (K, D) int array of traversed voxel indices.

    Amanatides & Woo (1987), "A Fast Voxel Traversal Algorithm for Ray
    Tracing".
    """
    assert u.shape == end.shape and u.ndim == 2
    u = np.asarray(u, np.float64)
    end = np.asarray(end, np.float64)

    if u.shape[1] == 3:
        from atmonr_tpu import native

        nat = native.voxel_traversal(u, end)
        if nat is not None:
            out, _ = nat
            # the numpy path unique-ing of start voxels is subsumed by the
            # caller-level unique; match its unique_only contract
            return np.unique(out, axis=0) if unique_only else out

    dists = np.linalg.norm(end - u, axis=-1)[:, None]
    v = (end - u) / dists

    vox_idx = np.floor(u).astype(np.int32)
    vox_idx_end = np.floor(end).astype(np.int32)
    sign_v = np.sign(v).astype(np.int32)
    sign_v_u = sign_v * u

    with np.errstate(divide="ignore", invalid="ignore"):
        tmax = np.abs((np.ceil(sign_v_u) - sign_v_u) / v)
        tdelta = np.abs(1.0 / v)
    tmax[np.isnan(tmax)] = np.inf
    tmax[vox_idx == vox_idx_end] = np.inf  # axes already at destination

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
        # freeze axes that have reached their destination coordinate
        tmax[rows] = np.where(diff_nonneg, np.inf, tmax[rows])
        newly_done = diff_nonneg.all(axis=-1) | overshot
        active[rows[newly_done]] = False

    out = np.concatenate(registry, axis=0)
    if unique_only:
        out = np.unique(out, axis=0)
    return out
