"""Multi-host data loading: host-local ray shards assembled into one
globally-sharded ray store.

The reference is single-process/single-GPU and moves the whole granule to
one device (reference datasets/harp2.py:119-124). At pod scale the granule's
ray set shards over the mesh "data" axis, and each *host* should only pay
for (a) reading its netCDF slice and (b) the f64 geospatial ray build of its
own rows — both scale with 1/num_hosts. The glue is
``jax.make_array_from_process_local_data``: every process hands over just
the rows its addressable devices own, and the result is one global
jax.Array sharded like ``NamedSharding(mesh, P(axis))``, usable directly by
the jitted train step (SURVEY §2b.1, §5 "Distributed communication
backend").

Single-process (tests, one host) degenerates exactly to
``parallel.sharding.shard_rays``: the host slice is the whole (trimmed)
range.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def trimmed_ray_count(n_total: int, mesh: Mesh, axis: str = "data") -> int:
    """Global ray count trimmed to a multiple of the data-axis size (same
    policy as ``sharding.shard_rays``: the remainder is < n_shards rays)."""
    n_shards = mesh.shape[axis]
    return (n_total // n_shards) * n_shards


def host_ray_slice(n_total: int, mesh: Mesh, axis: str = "data") -> slice:
    """The contiguous global row range this process must materialize.

    Derived from the sharding's device->index map restricted to addressable
    devices, so it is correct for any process->device assignment that keeps
    each process's rows contiguous (true for standard mesh construction,
    where ``jax.devices()`` orders by process).
    """
    n = trimmed_ray_count(n_total, mesh, axis)
    sharding = NamedSharding(mesh, P(axis))
    index_map = sharding.devices_indices_map((n,))
    # dedupe: devices along the OTHER mesh axes hold replicas of the same
    # row range (e.g. the "sample" axis), so identical slices appear once
    spans = set()
    for dev, idx in index_map.items():
        if dev.process_index != jax.process_index():
            continue
        s = idx[0]
        spans.add((0 if s.start is None else s.start, n if s.stop is None else s.stop))
    if not spans:  # this process owns no devices on the mesh
        return slice(0, 0)
    lo = min(a for a, _ in spans)
    hi = max(b for _, b in spans)
    # sanity: the process's distinct row spans must tile [lo, hi) exactly
    owned = sum(b - a for a, b in spans)
    assert owned == hi - lo, (
        f"process-local shards are not contiguous: cover {owned} of "
        f"[{lo}, {hi})"
    )
    return slice(lo, hi)


def shard_rays_from_hosts(
    local_rays: dict[str, np.ndarray],
    n_total: int,
    mesh: Mesh,
    axis: str = "data",
) -> dict[str, jax.Array]:
    """Assemble per-host ray slices into one globally-sharded ray pytree.

    Args:
        local_rays: this process's rows — exactly
            ``host_rays[k][host_ray_slice(n_total, mesh)]`` for each array.
        n_total: the UNtrimmed global ray count (all hosts pass the same
            value; trimming is applied here, consistently with
            ``host_ray_slice``).

    Returns the global ray store, each array sharded
    ``NamedSharding(mesh, P(axis))`` — the same placement
    ``sharding.shard_rays`` produces in-process.
    """
    n = trimmed_ray_count(n_total, mesh, axis)
    local_n = host_ray_slice(n_total, mesh, axis)
    expect = local_n.stop - local_n.start
    sharding = NamedSharding(mesh, P(axis))
    out = {}
    for k, v in local_rays.items():
        assert v.shape[0] == expect, (k, v.shape, expect)
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.asarray(v), (n,) + v.shape[1:]
        )
    return out
