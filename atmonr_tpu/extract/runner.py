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
) -> np.ndarray:
    """Query ``pipeline.extract`` over all grid points.

    Returns sigma (num_points, num_density_outputs) in m^-1 units.
    """
    scale = pipeline.scale
    offset = np.asarray(pipeline.offset, np.float64)

    xyz = extract_dataset.xyz
    n = xyz.shape[0]
    nb = -(-n // batch_size)
    pts_all = ((xyz - offset[None]) / scale).astype(np.float32)
    pad = nb * batch_size - n
    if pad:
        pts_all = np.concatenate([pts_all, np.zeros((pad, 3), np.float32)])

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
