"""Batched extinction-field query of a trained pipeline.

Counterpart of the reference extract loop (scripts/extract.py:203-209): the
grid's sample points stream through a single jitted normalize->extract
program in fixed-size batches (padded tail), and the returned densities are
rescaled to m^-1 by ``1/scale``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def run_extraction(
    pipeline,
    params,
    extract_dataset,
    batch_size: int = 32768,
    verbose: bool = False,
    mesh=None,
) -> np.ndarray:
    """Query ``pipeline.extract`` over all grid points.

    Returns sigma (num_points, num_density_outputs) in m^-1 units.

    ``mesh`` shards each point batch over every mesh axis jointly (grid
    points are i.i.d., so extraction is embarrassingly parallel): the
    per-chip ``pipeline.extract`` runs inside a ``shard_map`` so the Pallas
    hash kernels see shard-local shapes and scale instead of being
    replicated (same rationale as ``parallel.train``). Values match the
    single-device query exactly — extraction is deterministic.
    """
    scale = pipeline.scale
    offset = np.asarray(pipeline.offset, np.float64)

    n_shards = 1
    if mesh is not None and mesh.devices.size > 1:
        n_shards = int(mesh.devices.size)
        batch_size = max(batch_size - batch_size % n_shards, n_shards)

    xyz = extract_dataset.xyz
    n = xyz.shape[0]
    nb = -(-n // batch_size)
    pts_all = ((xyz - offset[None]) / scale).astype(np.float32)
    pad = nb * batch_size - n
    if pad:
        pts_all = np.concatenate([pts_all, np.zeros((pad, 3), np.float32)])

    if n_shards > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = tuple(mesh.axis_names)
        # checkpoint-restored params are COMMITTED to one device; replicate
        # them over the mesh or the jitted shard_map rejects the placement
        params = jax.device_put(params, NamedSharding(mesh, P()))

        @jax.jit
        def extract_batch(params, pts):
            return jax.shard_map(
                lambda p, x: pipeline.extract(p, x) / scale,
                mesh=mesh,
                in_specs=(P(), P(axes)),
                out_specs=P(axes),
                check_vma=False,
            )(params, pts)

    else:

        @jax.jit
        def extract_batch(params, pts):
            return pipeline.extract(params, pts) / scale

    out = []
    for i in range(nb):
        batch = jnp.asarray(pts_all[i * batch_size : (i + 1) * batch_size])
        out.append(np.asarray(extract_batch(params, batch)))
        if verbose:
            print(f"extract batch {i + 1}/{nb}", end="\r")
    if verbose:
        print()
    sigma = np.concatenate(out, axis=0)[:n]
    return sigma
