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
design the CUDA original needs atomicAdd for). On TPU the forward gather
dispatches to the Pallas chunked-VMEM kernel
(``atmonr_tpu.ops.hash_gather_pallas``) when the table fits the gate.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, partial

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
    # Forward gather implementation: "auto" picks the Pallas chunked-VMEM
    # kernel (bf16 features, like tcnn's fp16 tables) on TPU when the table
    # is small enough, else the XLA gather. "xla" forces the exact XLA path
    # (golden-parity tests); "bf16"/"f32" force the Pallas kernel.
    fwd_mode: str = "auto"
    # Table-gradient implementation: "auto" picks the Pallas one-hot-matmul
    # kernel (ops/hash_bwd_pallas.py, bf16 operands / f32 accumulate) on
    # TPU when the packed gradient fits VMEM, else the sorted segment-sum.
    # "sort" forces the sorted path; "bf16"/"f32" force the Pallas kernel.
    bwd_mode: str = "auto"
    # bf16 packing of the sorted-segment-sum payload (2/3 the sort traffic,
    # bf16 contribution mantissas, f32 accumulation): "auto" engages above
    # a contribution-count threshold, "on"/"off" pin it — an explicit knob
    # so quality A/Bs straddling the size threshold don't silently change
    # numerics (ADVICE r2).
    bwd_sort_pack: str = "auto"

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
            fwd_mode=str(options.get("fwd_mode", "auto")),
            bwd_mode=str(options.get("bwd_mode", "auto")),
            bwd_sort_pack=str(options.get("bwd_sort_pack", "auto")),
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


def _hash_encode_impl(table: jax.Array, x: jax.Array, cfg: HashGridConfig):
    outs = []
    for level in range(cfg.n_levels):
        idx, w = level_indices(x, cfg, level)
        feats = table[cfg.level_offsets[level] + idx]  # (M, 2^D, F)
        outs.append(jnp.sum(feats * w[..., None].astype(feats.dtype), axis=1))
    return jnp.concatenate(outs, axis=-1)


def _fwd_dispatch(
    table: jax.Array,
    x: jax.Array,
    cfg: HashGridConfig,
    sr_noise: jax.Array | None = None,
):
    """Pick the forward gather implementation per ``cfg.fwd_mode``.

    The Pallas chunked-VMEM kernel (ops/hash_gather_pallas.py) beats XLA's
    row gather for <=2^15-entry tables on TPU (2-D surface grids and 3-D
    volume grids alike); everywhere else (CPU tests, big reference tables)
    the XLA gather applies. The dispatch is trace-time static (backend +
    static config)."""
    if cfg.fwd_mode != "xla" and jax.default_backend() == "tpu":
        from atmonr_tpu.ops import hash_gather_pallas as hgp

        mode = "bf16" if cfg.fwd_mode == "auto" else cfg.fwd_mode
        if hgp.supported(cfg, mode):
            return hgp.hash_encode_pallas_fwd(
                table, x, cfg, mode, sr_noise if mode == "q8" else None
            )
    return _hash_encode_impl(table, x, cfg)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _hash_encode_core(table, x, sr_noise, cfg, compute_dx):
    return _fwd_dispatch(table, x, cfg, sr_noise)


def hash_encode(
    table: jax.Array,
    x: jax.Array,
    cfg: HashGridConfig,
    compute_dx: bool = False,
    sr_noise: jax.Array | None = None,
) -> jax.Array:
    """Multiresolution hash encoding of (M, D) positions -> (M, L*F) features.

    Forward: per-level gather + D-linear interpolation; the 16-level Python
    loop unrolls into one fused XLA program under jit (~1.5 G pts/s on one
    v5e chip). Backward: custom VJP below — XLA's autodiff-generated
    batched-scatter for the gather transpose is ~4 orders of magnitude
    slower on TPU than a flat 1-D scatter-add, so the VJP recomputes the
    corner indices (cheap) and emits ONE flat ``at[].add`` over all levels'
    contributions. This replaces tiny-cuda-nn's atomicAdd hash-table
    gradient (TPUs have no atomics; XLA lowers the 1-D scatter itself).

    ``compute_dx`` (static): position gradients cost a second gather pass and
    are unused when sample positions carry no learnable dependence (the
    Instant-NGP pipeline); leave False to skip them.

    ``sr_noise``: optional table-shaped U[0,1) array enabling stochastic
    rounding of the ``q8`` Pallas forward's int8 quantization (unbiased
    per-step error; see ops/hash_gather_pallas.quantize_level_q8). Ignored
    by every other mode; carries no gradient (the table gradient is exact
    f32 regardless of the forward's quantization).
    """
    return _hash_encode_core(table, x, sr_noise, cfg, compute_dx)


def _hash_encode_fwd(table, x, sr_noise, cfg, compute_dx):
    return _fwd_dispatch(table, x, cfg, sr_noise), (table, x, sr_noise)


def _hash_encode_bwd(cfg: HashGridConfig, compute_dx: bool, res, g):
    table, x, sr_noise = res
    f = cfg.n_features_per_level
    corners = jnp.asarray(_corner_offsets(cfg.n_dims), dtype=x.dtype)

    dtable = None
    if cfg.bwd_mode != "sort" and jax.default_backend() == "tpu":
        from atmonr_tpu.ops import hash_bwd_pallas as hbp

        mode = "bf16" if cfg.bwd_mode == "auto" else cfg.bwd_mode
        if hbp.supported(cfg, mode):
            dtable = hbp.hash_encode_pallas_bwd(x, g, cfg, mode).astype(
                table.dtype
            )

    all_idx, all_vals = [], []
    dx = jnp.zeros_like(x)
    for level in range(cfg.n_levels):
        if dtable is None:
            idx, w = level_indices(x, cfg, level)
            g_l = g[:, level * f : (level + 1) * f]  # (M, F)
            # table cotangent: w_c * g per corner, flattened to 1-D scatter
            vals = w[..., None] * g_l[:, None, :]  # (M, 2^D, F)
            all_idx.append((cfg.level_offsets[level] + idx).reshape(-1))
            all_vals.append(vals.reshape(-1, f))
        if not compute_dx:
            continue
        if dtable is not None:
            idx, w = level_indices(x, cfg, level)
            g_l = g[:, level * f : (level + 1) * f]
        # position cotangent: d(w_c)/d(frac_d) = sign * prod_{e != d} w-factor
        scale = cfg.level_scales[level]
        pos = x.astype(jnp.float32) * scale + 0.5
        frac = pos - jnp.floor(pos)
        feats = table[cfg.level_offsets[level] + idx]  # (M, 2^D, F)
        fg = jnp.sum(feats * g_l[:, None, :], axis=-1)  # (M, 2^D)
        cw = jnp.where(
            corners[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :]
        )  # (M, 2^D, D)
        for d in range(cfg.n_dims):
            others = jnp.prod(
                jnp.concatenate([cw[..., :d], cw[..., d + 1 :]], axis=-1), axis=-1
            )  # (M, 2^D)
            sign = jnp.where(corners[None, :, d] == 1, 1.0, -1.0)
            dx = dx.at[:, d].add(
                scale * jnp.sum(sign * others * fg, axis=1).astype(x.dtype)
            )

    if dtable is None:
        idx_flat = jnp.concatenate(all_idx)
        vals_flat = jnp.concatenate(all_vals).astype(table.dtype)
        if jax.default_backend() == "tpu":
            dtable = _segment_sum_sorted(
                idx_flat, vals_flat, cfg.total_params, cfg.bwd_sort_pack
            )
        else:
            dtable = jnp.zeros_like(table).at[idx_flat].add(vals_flat)
    d_noise = None if sr_noise is None else jnp.zeros_like(sr_noise)
    return dtable, dx, d_noise


# Above this many contributions the sort payload is packed to bf16 pairs:
# one u32 payload instead of two f32 — 2/3 the sort traffic. Contribution
# values get bf16 mantissas while the accumulation stays f32 (the same
# half-precision-contribution / full-precision-accumulate trade as tcnn's
# fp16 atomicAdd backward, and as this repo's Pallas bf16 backward mode).
# The flagship configs never reach this (they use the Pallas backward);
# it engages for reference-capacity tables (2^21: ~1e9 contributions).
_PACK_BF16_SORT_THRESHOLD = 1 << 25


def _segment_sum_sorted(
    idx: jax.Array, vals: jax.Array, num_segments: int, pack_mode: str = "auto"
):
    """Scatter-free segment sum: sort + cumsum + searchsorted + gather + diff.

    XLA:TPU lowers scatter-add serially (~13 M updates/s measured on v5e),
    which would dominate the whole training step; sort (224 M/s), cumsum, and
    gather are all vectorized, so the transpose is built from those:

        dW[t] = csum[last index with key <= t] - csum[last index with key < t]

    Cost is one variadic sort of the contributions — the remaining target of
    the Pallas backward kernel — but ~2 orders of magnitude faster than the
    XLA scatter it replaces.
    """
    f = vals.shape[1]
    pack = f == 2 and (
        pack_mode == "on"
        or (pack_mode == "auto" and idx.size >= _PACK_BF16_SORT_THRESHOLD)
    )
    if pack:
        packed = jax.lax.bitcast_convert_type(
            vals.astype(jnp.bfloat16), jnp.uint32
        )  # (M,)
        keys, payload = jax.lax.sort((idx, packed), num_keys=1)
        pair = jax.lax.bitcast_convert_type(payload, jnp.bfloat16)  # (M, 2)
        sorted_vals = pair.astype(jnp.float32)
    else:
        sorted_ops = jax.lax.sort(
            (idx,) + tuple(vals[:, j] for j in range(f)), num_keys=1
        )
        keys = sorted_ops[0]
        sorted_vals = jnp.stack(sorted_ops[1:], axis=1)
    csum = jnp.cumsum(sorted_vals, axis=0)  # (M, F)
    r = jnp.searchsorted(keys, jnp.arange(num_segments, dtype=keys.dtype),
                         side="right")  # (T,)
    s = jnp.where((r > 0)[:, None], csum[jnp.maximum(r - 1, 0)], 0.0)
    return s - jnp.concatenate([jnp.zeros_like(s[:1]), s[:-1]], axis=0)


_hash_encode_core.defvjp(_hash_encode_fwd, _hash_encode_bwd)
