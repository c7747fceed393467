"""Multiresolution hash-grid encoding (Instant-NGP) in pure JAX.

This is the TPU-native replacement for tiny-cuda-nn's CUDA ``HashGrid``
encoding (reference instant_ngp.py:60-63, 78-80), implemented from the
Instant-NGP paper's specification (Mueller et al. 2022, §3):

- L levels of feature grids with geometrically growing resolution
  ``scale_l = base * growth**l - 1``, ``res_l = ceil(scale_l) + 1``;
- levels whose dense vertex count fits in the 2**log2_hashmap_size table are
  indexed densely, larger levels via the spatial hash
  ``(x*1) xor (y*2654435761) xor (z*805459861) mod T`` (uint32 wraparound);
- D-linear interpolation of the 2**D corner feature vectors;
- features initialized U(-1e-4, 1e-4).

All levels live in one flat (total_params, F) table so the optimizer treats
the encoding as a single pytree leaf. The forward is a per-level gather +
interpolation; the backward (via JAX autodiff) is the gather transpose — a
scatter-add, which XLA:TPU lowers without atomics (the sort/segment-sum
design the CUDA original needs atomicAdd for). ``atmonr_tpu.ops.hash_mlp``
provides the fused Pallas path for the training hot loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

# spatial-hash primes, per the Instant-NGP paper (first dim intentionally 1)
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


def _align(n: int, m: int = 8) -> int:
    return ((n + m - 1) // m) * m


@dataclass(frozen=True)
class HashGridConfig:
    """Static configuration of a multiresolution hash grid."""

    n_dims: int
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 2.0

    @staticmethod
    def from_options(options: dict, n_dims: int) -> "HashGridConfig":
        """Build from a tcnn-style config dict (reference configs JSON)."""
        return HashGridConfig(
            n_dims=n_dims,
            n_levels=int(options["n_levels"]),
            n_features_per_level=int(options["n_features_per_level"]),
            log2_hashmap_size=int(options["log2_hashmap_size"]),
            base_resolution=int(options["base_resolution"]),
            per_level_scale=float(options["per_level_scale"]),
        )

    @cached_property
    def hashmap_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @cached_property
    def level_scales(self) -> tuple[float, ...]:
        return tuple(
            float(
                np.exp2(level * np.log2(self.per_level_scale))
                * self.base_resolution
                - 1.0
            )
            for level in range(self.n_levels)
        )

    @cached_property
    def level_resolutions(self) -> tuple[int, ...]:
        return tuple(int(np.ceil(s)) + 1 for s in self.level_scales)

    @cached_property
    def level_sizes(self) -> tuple[int, ...]:
        """Table entries per level (dense when it fits, else the hashmap)."""
        sizes = []
        for res in self.level_resolutions:
            dense = res**self.n_dims
            sizes.append(_align(min(dense, self.hashmap_size)))
        return tuple(sizes)

    @cached_property
    def level_offsets(self) -> tuple[int, ...]:
        offs, total = [], 0
        for s in self.level_sizes:
            offs.append(total)
            total += s
        return tuple(offs)

    @cached_property
    def total_params(self) -> int:
        return sum(self.level_sizes)

    @cached_property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_is_dense(self, level: int) -> bool:
        res = self.level_resolutions[level]
        return res**self.n_dims <= self.level_sizes[level]


def init_hash_table(key: jax.Array, cfg: HashGridConfig) -> jax.Array:
    """U(-1e-4, 1e-4) feature table of shape (total_params, F) (tcnn init)."""
    return jax.random.uniform(
        key,
        (cfg.total_params, cfg.n_features_per_level),
        minval=-1e-4,
        maxval=1e-4,
        dtype=jnp.float32,
    )


def _corner_offsets(n_dims: int) -> np.ndarray:
    """(2**D, D) binary corner offsets, x-dim fastest."""
    corners = np.stack(
        np.meshgrid(*([np.arange(2)] * n_dims), indexing="ij"), axis=-1
    ).reshape(-1, n_dims)
    return corners[:, ::-1].copy()  # x fastest-varying


def level_indices(
    x: jax.Array, cfg: HashGridConfig, level: int
) -> tuple[jax.Array, jax.Array]:
    """Corner table indices and interpolation weights for one level.

    Args:
        x: (M, D) positions, nominally in [0, 1]^D (out-of-range positions
            clamp to the grid for dense levels and wrap through the hash for
            hashed levels).

    Returns:
        idx: (M, 2**D) int32 indices into the level's table slice.
        w:   (M, 2**D) interpolation weights.
    """
    scale = cfg.level_scales[level]
    res = cfg.level_resolutions[level]
    pos = x.astype(jnp.float32) * scale + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    base = jnp.clip(pos_grid.astype(jnp.int32), 0, res - 2)

    corners = jnp.asarray(_corner_offsets(cfg.n_dims), dtype=jnp.int32)
    g = base[:, None, :] + corners[None, :, :]  # (M, 2^D, D)

    if cfg.level_is_dense(level):
        strides = np.ones(cfg.n_dims, dtype=np.int64)
        for d in range(1, cfg.n_dims):
            strides[d] = strides[d - 1] * res
        idx = jnp.sum(g * jnp.asarray(strides, dtype=jnp.int32), axis=-1)
    else:
        gu = g.astype(jnp.uint32)
        acc = gu[..., 0] * jnp.uint32(_PRIMES[0])
        for d in range(1, cfg.n_dims):
            acc = acc ^ (gu[..., d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
        idx = (acc & jnp.uint32(cfg.hashmap_size - 1)).astype(jnp.int32)

    # d-linear weights: prod over dims of frac (corner=1) or 1-frac (corner=0)
    cw = jnp.where(corners[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :])
    w = jnp.prod(cw, axis=-1)
    return idx, w


def hash_encode(table: jax.Array, x: jax.Array, cfg: HashGridConfig) -> jax.Array:
    """Multiresolution hash encoding of (M, D) positions -> (M, L*F) features.

    Pure-XLA path: per-level gather + D-linear interpolation; the 16-level
    Python loop unrolls into one fused XLA program under jit. Differentiable
    w.r.t. ``table`` (backward = scatter-add via the gather transpose).
    """
    outs = []
    for level in range(cfg.n_levels):
        idx, w = level_indices(x, cfg, level)
        feats = table[cfg.level_offsets[level] + idx]  # (M, 2^D, F)
        outs.append(jnp.sum(feats * w[..., None].astype(feats.dtype), axis=1))
    return jnp.concatenate(outs, axis=-1)
