"""Device-side batching over HBM-resident ray arrays.

The reference replaces torch DataLoader worker processes with an on-GPU
index shuffle + gather (``batch_loader.py:9-52``). The TPU-native equivalent
is even thinner: a per-epoch ``jax.random.permutation`` on device, and a
jitted ``dynamic_slice`` + gather per step — zero host<->device traffic in
the steady state, and the gather fuses into the training step's XLA program.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp


def num_batches(n_rays: int, batch_size: int, drop_last: bool = False) -> int:
    if drop_last:
        return n_rays // batch_size
    return -(-n_rays // batch_size)


def epoch_permutation(key: jax.Array, n_rays: int, batch_size: int) -> jax.Array:
    """(num_full_batches * batch_size,) shuffled ray indices, on device.

    The trailing partial batch is dropped (a full epoch at default configs is
    thousands of batches; keeping shapes static lets one compiled train step
    serve every step of the run).
    """
    nb = n_rays // batch_size
    perm = jax.random.permutation(key, n_rays)
    return perm[: nb * batch_size].astype(jnp.int32)


def sequential_indices(n_rays: int, batch_size: int) -> jax.Array:
    """Unshuffled padded index array for evaluation/extraction sweeps.

    Pads with the last index so shapes stay static; callers drop padded
    outputs via :func:`valid_mask`.
    """
    nb = num_batches(n_rays, batch_size)
    idx = jnp.arange(nb * batch_size, dtype=jnp.int32)
    return jnp.minimum(idx, n_rays - 1)


def valid_mask(n_rays: int, batch_size: int) -> jax.Array:
    nb = num_batches(n_rays, batch_size)
    return jnp.arange(nb * batch_size) < n_rays


def gather_batch(
    rays: Mapping[str, jax.Array], idx: jax.Array
) -> dict[str, jax.Array]:
    """Gather a ray batch by index; adds the reference's "idx" field."""
    batch = {k: v[idx] for k, v in rays.items()}
    batch["idx"] = idx
    return batch


def batch_at_step(
    rays: Mapping[str, jax.Array],
    perm: jax.Array,
    step_in_epoch: jax.Array,
    batch_size: int,
) -> dict[str, jax.Array]:
    """Jit-friendly: slice the step's indices out of the epoch permutation and
    gather the batch (all device-side)."""
    idx = jax.lax.dynamic_slice(
        perm, (step_in_epoch * batch_size,), (batch_size,)
    )
    return gather_batch(rays, idx)
