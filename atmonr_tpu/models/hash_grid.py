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
    # Dense-level overlapped-tile fetch on the XLA gather path: the random
    # row-gather rate is invariant to row WIDTH up to >=256 B
    # (tools/bench_dma_gather.py), so 3-D dense levels derive a
    # (4,4,4)-entry overlapped-window view (stride 3: every 2x2x2 corner
    # cube lies inside ONE tile) from the master table by cheap strided
    # slicing each step, and the 8 corner fetches collapse to 1 wide-row
    # fetch + a lane select. Same math up to f32 summation order (the
    # separable einsum contraction reorders the corner sum) — allclose
    # to rtol 1e-5, not bit-equal
    # (tests/test_hash_grid.py::test_dense_tiled_encode_matches_per_corner);
    # "off" restores the per-corner gather. "auto" never engages under
    # fwd_mode="xla" (the exact golden-parity path).
    dense_tile: str = "auto"
    # Overlapped-window storage for HASHED levels ("pair-bucket" hash,
    # r4 VERDICT item 3): instead of hashing each grid CELL to its own
    # (F,)-row, hash each (4,4,4)-entry overlapped WINDOW (stride 3 — the
    # dense-tile geometry, so every 2x2x2 corner cube lies inside exactly
    # one window) to a (64*F)-wide bucket row, collapsing the 2^D corner
    # fetches to ONE row fetch per point per level against the ~210 M
    # fetch/s issue ceiling. This CHANGES THE COLLISION STRUCTURE: a cell
    # is replicated in up to (4/3)^D ~ 2.4 windows whose copies train
    # independently (the field becomes piecewise-window, discontinuous at
    # window seams), an effective capacity loss of ~1.25 log2 bits —
    # "on" is therefore a different model, config-gated and only
    # defensible with quality A/B evidence (docs/performance.md). The
    # parameter count and checkpoint layout are unchanged (the level
    # slice is reinterpreted as (T/64, 64*F) bucket rows).
    hashed_tile: str = "off"

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
            dense_tile=str(options.get("dense_tile", "auto")),
            hashed_tile=str(options.get("hashed_tile", "off")),
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


def _spatial_hash(g: jax.Array, n_dims: int, mod: int) -> jax.Array:
    """Instant-NGP spatial hash of integer coords (..., D) -> int32 mod
    ``mod`` (a power of two)."""
    gu = g.astype(jnp.uint32)
    acc = gu[..., 0] * jnp.uint32(_PRIMES[0])
    for d in range(1, n_dims):
        acc = acc ^ (gu[..., d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
    return (acc & jnp.uint32(mod - 1)).astype(jnp.int32)


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
    res = cfg.level_resolutions[level]
    base, frac = _base_and_frac(x, cfg, level)

    corners = jnp.asarray(_corner_offsets(cfg.n_dims), dtype=jnp.int32)
    g = base[:, None, :] + corners[None, :, :]  # (M, 2^D, D)

    if cfg.level_is_dense(level):
        strides = np.ones(cfg.n_dims, dtype=np.int64)
        for d in range(1, cfg.n_dims):
            strides[d] = strides[d - 1] * res
        idx = jnp.sum(g * jnp.asarray(strides, dtype=jnp.int32), axis=-1)
    elif _use_hashed_tiles(cfg, level):
        # overlapped-window storage: every corner of the 2x2x2 cube lies in
        # the SAME window t = base // S, at in-window coords l + corner; the
        # entry's flat index is 64*bucket(t) + slot, slot-major (z, y, x) —
        # matching the (n_buckets, 64*F) row reinterpretation the forward
        # fetches
        t = base // _TILE_S  # (M, D)
        win = g - (_TILE_S * t)[:, None, :]  # (M, 2^D, D) in 0..3
        bucket = _spatial_hash(t, cfg.n_dims, cfg.level_sizes[level] // (_TILE_W**cfg.n_dims))
        slot = jnp.zeros(win.shape[:-1], jnp.int32)
        for d in range(cfg.n_dims):  # z slowest ... x fastest
            slot = slot * _TILE_W + win[..., cfg.n_dims - 1 - d]
        idx = bucket[:, None] * (_TILE_W**cfg.n_dims) + slot
    else:
        idx = _spatial_hash(g, cfg.n_dims, cfg.hashmap_size)

    # d-linear weights: prod over dims of frac (corner=1) or 1-frac (corner=0)
    cw = jnp.where(corners[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :])
    w = jnp.prod(cw, axis=-1)
    return idx, w


def _base_and_frac(x, cfg: HashGridConfig, level: int):
    scale = cfg.level_scales[level]
    res = cfg.level_resolutions[level]
    pos = x.astype(jnp.float32) * scale + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    base = jnp.clip(pos_grid.astype(jnp.int32), 0, res - 2)
    return base, frac


# Overlapped-tile geometry for the dense-level wide-row fetch: windows of
# _TILE_W entries per dim at stride _TILE_S overlap by one, so any 2-entry
# run (a corner pair) — and hence any 2^D corner cube — lies inside one tile
_TILE_W, _TILE_S = 4, 3


def _n_tiles(res: int) -> int:
    """Tiles per dim: every base coord in [0, res-2] maps to tile b // S."""
    return max(1, (res - 2) // _TILE_S + 1)


def build_dense_tiles(
    level_slice: jax.Array, res: int, n_dims: int
) -> jax.Array:
    """(res^D, F) dense level slice -> (n_tiles^D, W^D * F) overlapped-tile
    rows: row (t_z..t_x) holds entries [S*t_d, S*t_d + W) per dim, flattened
    slot-major (l_z, l_y, l_x, feature). Pure strided slicing + transpose:
    streams ~(W/S)^D x the level bytes, no random access; recomputed inside
    the jitted step each call (differentiable, but the encode's custom VJP
    never differentiates through it)."""
    f = level_slice.shape[-1]
    nt = _n_tiles(res)
    p = _TILE_S * (nt - 1) + _TILE_W  # padded extent: last window in bounds
    arr = level_slice.reshape((res,) * n_dims + (f,))
    if p > res:
        arr = jnp.pad(arr, [(0, p - res)] * n_dims + [(0, 0)])
    # one static strided slice per slot combination: slot (l_z..l_x) of
    # every tile at once is arr[l_0::S, l_1::S, ...] trimmed to nt — W^D
    # cheap strided slices + a stack, NO high-rank transpose (a
    # (nt,W,...,W,f) transpose of the 2^21-config levels never finished
    # the server-side TPU compile)
    slots = []
    for flat in range(_TILE_W**n_dims):
        ls = [(flat >> (2 * (n_dims - 1 - d))) & 3 for d in range(n_dims)]
        view = arr[
            tuple(
                slice(ls[d], ls[d] + _TILE_S * (nt - 1) + 1, _TILE_S)
                for d in range(n_dims)
            )
        ]  # (nt,)*D + (f,), slot (l_0..l_{D-1}) of every tile
        slots.append(view.reshape(nt**n_dims, f))
    # rows flatten slot-major (l_0=z slowest ... l_{D-1}=x, then feature)
    return jnp.stack(slots, axis=1).reshape(nt**n_dims, (_TILE_W**n_dims) * f)


def _use_dense_tiles(cfg: HashGridConfig, level: int) -> bool:
    # "auto" engages only beyond the Pallas gate (big-table XLA-fallback
    # configs, where the random gather is the wall); small/parity configs
    # keep the op-exact per-corner path. "on" forces it everywhere.
    if cfg.dense_tile == "off" or cfg.n_dims != 3:
        return False
    if cfg.dense_tile == "auto" and (
        cfg.hashmap_size <= (1 << 16) or cfg.fwd_mode == "xla"
    ):
        # fwd_mode="xla" is the documented op-exact golden-parity mode
        # (ADVICE r4): "auto" tiles would silently shift dense-level
        # numerics (allclose, not bit-equal) under it
        return False
    return cfg.level_is_dense(level)


def _use_hashed_tiles(cfg: HashGridConfig, level: int) -> bool:
    # a different MODEL (collision structure changes — see the config
    # comment), so only an explicit "on" engages it, and only for hashed
    # 3-D levels; it needs >= 64 entries per level for whole bucket rows
    if cfg.hashed_tile != "on" or cfg.n_dims != 3:
        return False
    if cfg.level_is_dense(level):
        return False
    assert cfg.log2_hashmap_size >= 6, (
        "hashed_tile needs 64-entry bucket rows (log2_hashmap_size >= 6)"
    )
    return True


def _tiled_interp(
    rows: jax.Array, frac: jax.Array, l: jax.Array, f: int
) -> jax.Array:
    """Trilinear interpolation over fetched (M, W^D * F) tile rows,
    evaluated as three separable per-dim contractions — no per-corner lane
    select (``take_along_axis`` along rows is row-serial on TPU and cost
    more than the gathers it saved). ``l`` is the (M, D) in-tile slot of
    the floor corner. Same math as the per-corner path (sum over corners
    of the product weights) up to f32 summation order — allclose, not
    bit-equal."""
    m = frac.shape[0]
    rows5 = rows.astype(frac.dtype).reshape(
        m, _TILE_W, _TILE_W, _TILE_W, f
    )  # (m, z, y, x, f)
    k = jnp.arange(_TILE_W)[None]

    def dim_weights(d):
        ld, fr = l[:, d, None], frac[:, d, None]
        return jnp.where(k == ld, 1.0 - fr, 0.0) + jnp.where(
            k == ld + 1, fr, 0.0
        )

    a = jnp.einsum("mzyxf,mx->mzyf", rows5, dim_weights(0))
    a = jnp.einsum("mzyf,my->mzf", a, dim_weights(1))
    return jnp.einsum("mzf,mz->mf", a, dim_weights(2))


def _dense_tiled_level(
    table: jax.Array,
    x: jax.Array,
    cfg: HashGridConfig,
    level: int,
    tiles: jax.Array | None = None,
) -> jax.Array:
    """One dense level via the overlapped-tile fetch: 1 wide-row gather per
    point (vs 2^D row gathers). The tile rows are derived from the master
    table by cheap strided slicing each step (``build_dense_tiles``) —
    or passed in prebuilt (``tiles``) when the caller hoists the
    derivation out of a ``lax.map`` body (the r4 compile stall:
    tools/repro_maptile_stall.py)."""
    f = cfg.n_features_per_level
    res = cfg.level_resolutions[level]
    nt = _n_tiles(res)
    off = cfg.level_offsets[level]
    if tiles is None:
        tiles = build_dense_tiles(
            table[off : off + res**cfg.n_dims], res, cfg.n_dims
        )

    base, frac = _base_and_frac(x, cfg, level)  # (M, D) x,y,z
    t = base // _TILE_S
    tid = (t[:, 2] * nt + t[:, 1]) * nt + t[:, 0]
    rows = tiles[tid]  # (M, W^D * F) — THE one gather
    return _tiled_interp(rows, frac, base - _TILE_S * t, f)


def _hashed_tiled_level(
    table: jax.Array, x: jax.Array, cfg: HashGridConfig, level: int
) -> jax.Array:
    """One hashed level under overlapped-window ("pair-bucket") storage:
    the level's flat (T, F) slice is reinterpreted zero-copy as
    (T/64, 64*F) bucket rows, the WINDOW coordinate ``base // 3`` is
    spatial-hashed to a bucket, and the single fetched row carries the
    whole (4,4,4) window — every 2x2x2 corner cube lies inside exactly
    one window, so the 2^D corner fetches collapse to 1. Unlike the
    dense-tile path there is no derivation step: the bucket row IS the
    storage (the collision structure changes; see HashGridConfig)."""
    f = cfg.n_features_per_level
    row_w = _TILE_W**cfg.n_dims  # 64 entries per bucket row
    size = cfg.level_sizes[level]
    off = cfg.level_offsets[level]
    buckets = table[off : off + size].reshape(size // row_w, row_w * f)

    base, frac = _base_and_frac(x, cfg, level)
    t = base // _TILE_S
    bucket = _spatial_hash(t, cfg.n_dims, size // row_w)
    rows = buckets[bucket]  # (M, 64*F) — THE one gather
    return _tiled_interp(rows, frac, base - _TILE_S * t, f)


def _hash_encode_impl(
    table: jax.Array, x: jax.Array, cfg: HashGridConfig, tiles=None
):
    outs = []
    for level in range(cfg.n_levels):
        if _use_dense_tiles(cfg, level):
            outs.append(
                _dense_tiled_level(
                    table, x, cfg, level,
                    None if tiles is None else tiles[level],
                )
            )
            continue
        if _use_hashed_tiles(cfg, level):
            outs.append(_hashed_tiled_level(table, x, cfg, level))
            continue
        idx, w = level_indices(x, cfg, level)
        feats = table[cfg.level_offsets[level] + idx]  # (M, 2^D, F)
        # accumulate in the weights' dtype (f32) — a no-op for f32 tables,
        # an upcast for the bf16-gather fallback
        outs.append(jnp.sum(feats.astype(w.dtype) * w[..., None], axis=1))
    return jnp.concatenate(outs, axis=-1)


def _fwd_dispatch(
    table: jax.Array,
    x: jax.Array,
    cfg: HashGridConfig,
    sr_noise: jax.Array | None = None,
    tiles=None,
):
    """Pick the forward gather implementation per ``cfg.fwd_mode``.

    The Pallas chunked-VMEM kernel (ops/hash_gather_pallas.py) beats XLA's
    row gather for <=2^15-entry tables on TPU (2-D surface grids and 3-D
    volume grids alike); everywhere else (CPU tests, big reference tables)
    the XLA gather applies. The dispatch is trace-time static (backend +
    static config)."""
    if cfg.fwd_mode != "xla" and jax.default_backend() == "tpu":
        mode = "bf16" if cfg.fwd_mode == "auto" else cfg.fwd_mode
        if cfg.hashed_tile != "on":
            # Pallas computes per-CELL indexing; under bucket-row storage
            # that would silently be a different model, so hashed_tile
            # configs always take the XLA path below
            from atmonr_tpu.ops import hash_gather_pallas as hgp

            if hgp.supported(cfg, mode):
                return hgp.hash_encode_pallas_fwd(
                    table, x, cfg, mode, sr_noise if mode == "q8" else None
                )
        if mode == "bf16":
            # XLA-gather fallback at reference-capacity tables: bf16 rows
            # gather 1.3x faster than f32 (161 vs 122 M rows/s, v5e) and
            # match the Pallas kernel's (and tcnn's) half-precision table
            # convention; interpolation still accumulates in f32 (and the
            # hashed-tile 64*F bucket rows stay at 256 B, inside the
            # measured free-width range)
            return _hash_encode_impl(
                table.astype(jnp.bfloat16), x, cfg, tiles
            )
    return _hash_encode_impl(table, x, cfg, tiles)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _hash_encode_core(table, x, sr_noise, tiles, cfg, compute_dx):
    return _fwd_dispatch(table, x, cfg, sr_noise, tiles)


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

    Above ``_POINT_CHUNK`` points the encode runs as a ``lax.map`` over
    point chunks: at the 2^21 reference capacity the per-point
    intermediates ((M, 2^D) weights, (M, 2^D, D) corner coords) otherwise
    lane-pad to ~16x their logical size and 8.4 M points OOM a 16 GB chip.
    The table stays a closure constant of the mapped body, so neither the
    scan residuals nor the gradient accumulation replicate it per chunk.
    """
    m = x.shape[0]
    if m > _POINT_CHUNK and not compute_dx:
        # r4 observed the dense-tile fetch inside a lax.map body stalling
        # the server-side TPU compile and auto-gated the tiles off here;
        # r5's minimal repro (tools/repro_maptile_stall.py) could NOT
        # reproduce the stall at the full 2^21 geometry (tiles in the
        # mapped body compile in ~23 s and run 1.44x faster than the
        # per-corner path on 4.2 M points), so the gate is removed. If the
        # stall ever returns, `dense_tile: "off"` in the encoding config
        # restores the old behavior.
        n_chunks = -(-m // _POINT_CHUNK)
        pad = n_chunks * _POINT_CHUNK - m
        x_p = jnp.concatenate([x, x[:pad]]) if pad else x
        out = jax.lax.map(
            lambda xc: _hash_encode_core(
                table, xc, sr_noise, None, cfg, False
            ),
            x_p.reshape(n_chunks, _POINT_CHUNK, x.shape[1]),
        )
        return out.reshape(n_chunks * _POINT_CHUNK, -1)[:m]
    return _hash_encode_core(table, x, sr_noise, None, cfg, compute_dx)


# chunk size for the lax.map path: 2^20 points keeps each chunk's padded
# intermediates a few hundred MB while the per-level sorts stay efficient
_POINT_CHUNK = 1 << 20


def _hash_encode_fwd(table, x, sr_noise, tiles, cfg, compute_dx):
    # the table is omitted from the residuals unless dx needs its features:
    # under the chunked lax.map the residuals are stacked per chunk, and a
    # stacked 2^21-config table would be 8 x 170 MB of dead weight. The
    # tiles likewise: only their shape/dtype specs are carried (the bwd
    # never reads tile values, it just owes them a zero cotangent).
    tile_specs = (
        None
        if tiles is None
        else tuple(
            None if t is None else (t.shape, t.dtype) for t in tiles
        )
    )
    res = (
        (table, x, sr_noise, tile_specs)
        if compute_dx
        else (None, x, sr_noise, tile_specs)
    )
    return _fwd_dispatch(table, x, cfg, sr_noise, tiles), res


def _hash_encode_bwd(cfg: HashGridConfig, compute_dx: bool, res, g):
    table, x, sr_noise, tile_specs = res
    f = cfg.n_features_per_level
    corners = jnp.asarray(_corner_offsets(cfg.n_dims), dtype=x.dtype)

    dtable = None
    if (
        cfg.bwd_mode != "sort"
        and cfg.hashed_tile != "on"  # Pallas scatters per-CELL indices;
        # bucket-row storage needs the level_indices-aware sorted path
        and jax.default_backend() == "tpu"
    ):
        from atmonr_tpu.ops import hash_bwd_pallas as hbp

        mode = "bf16" if cfg.bwd_mode == "auto" else cfg.bwd_mode
        if hbp.supported(cfg, mode):
            dtable = hbp.hash_encode_pallas_bwd(x, g, cfg, mode).astype(
                jnp.float32
            )

    all_idx, all_vals, level_dws = [], [], []
    on_tpu = jax.default_backend() == "tpu"
    dx = jnp.zeros_like(x)
    for level in range(cfg.n_levels):
        if dtable is None:
            idx, w = level_indices(x, cfg, level)
            g_l = g[:, level * f : (level + 1) * f]  # (M, F)
            # table cotangent: w_c * g per corner, flattened to 1-D scatter
            vals = w[..., None] * g_l[:, None, :]  # (M, 2^D, F)
            if on_tpu:
                # per-level two-phase binning: each level's contributions
                # are sorted and densified into its own table slice, so
                # peak memory is one level's payload (~0.8 GB at the 2^21
                # reference capacity, where one global sort of all 16
                # levels' 1e9 contributions would not fit HBM)
                level_dws.append(
                    _segment_sum_sorted(
                        idx.reshape(-1),
                        vals.reshape(-1, f).astype(jnp.float32),
                        cfg.level_sizes[level],
                        cfg.bwd_sort_pack,
                    )
                )
            else:
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
        if on_tpu:
            dtable = jnp.concatenate(level_dws, axis=0)
        else:
            idx_flat = jnp.concatenate(all_idx)
            vals_flat = jnp.concatenate(all_vals).astype(jnp.float32)
            dtable = jnp.zeros(
                (cfg.total_params, f), jnp.float32
            ).at[idx_flat].add(vals_flat)
    d_noise = None if sr_noise is None else jnp.zeros_like(sr_noise)
    d_tiles = (
        None
        if tile_specs is None
        else tuple(
            None if s is None else jnp.zeros(s[0], s[1]) for s in tile_specs
        )
    )
    return dtable, dx, d_noise, d_tiles


# Above this many contributions the sort payload is packed to bf16 pairs:
# one u32 payload instead of two f32 — 2/3 the sort traffic. Contribution
# values get bf16 mantissas while the accumulation stays f32 (the same
# half-precision-contribution / full-precision-accumulate trade as tcnn's
# fp16 atomicAdd backward, and as this repo's Pallas bf16 backward mode).
# The flagship configs never reach this (they use the Pallas backward);
# it engages for reference-capacity tables (2^21: ~1e9 contributions).
_PACK_BF16_SORT_THRESHOLD = 1 << 25


# Static per-call cost model choosing the densify strategy (shapes are
# trace-time constants). Measured v5e rates: searchsorted ~0.66 ms per 1k
# queries (SERIAL on TPU — 14 s at a 2^21-config's 21 M segments); the
# run-compaction path pays a second M-element sort (~224 M elts/s) plus
# two sorted-unique 1-D scatter-sets (~139 M rows/s).
_SEARCHSORTED_S_PER_QUERY = 0.66e-6
_SORT_S_PER_ELT = 1.0 / 224e6
_SCATTER_S_PER_ROW = 1.0 / 139e6


def _use_runs_densify(m: int, num_segments: int) -> bool:
    search_cost = num_segments * _SEARCHSORTED_S_PER_QUERY
    runs_cost = m * _SORT_S_PER_ELT + 2 * min(m, num_segments) * _SCATTER_S_PER_ROW
    return runs_cost < search_cost


def _segment_sum_sorted(
    idx: jax.Array,
    vals: jax.Array,
    num_segments: int,
    pack_mode: str = "auto",
    densify_mode: str = "auto",
):
    """Scatter-free segment sum built from sorts: TPU's scatter-add is
    serial (~13 M updates/s measured on v5e) while sort runs at 224 M
    elts/s, so the gather transpose is computed as

        dW[t] = csum[last index with key <= t] - csum[last index with key < t]

    over key-sorted contributions. Two densify strategies turn that into a
    dense (T, F) table:

    - ``search`` (small T): ``searchsorted(keys, arange(T))`` — T serial
      queries on TPU, fine up to ~1e5 segments.
    - ``runs`` (big T, the 2^21 reference capacity): per-column 1-D cumsums
      (the (M, F) cumsum pays a 64x lane-padded relayout on TPU), a second
      sort that compacts each key's run-end cumsum into key order, adjacent
      diffs for the run sums, and one sorted-unique 1-D scatter-set per
      feature column (139 M rows/s measured on v5e). Measured on v5e at the
      reference capacity (134 M contributions, 21 M segments): 12.2 s
      (search) -> ~2 s (runs).
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
    if densify_mode == "runs" or (
        densify_mode == "auto" and _use_runs_densify(idx.size, num_segments)
    ):
        return _densify_runs(keys, sorted_vals, num_segments)
    csum = jnp.cumsum(sorted_vals, axis=0)  # (M, F)
    r = jnp.searchsorted(keys, jnp.arange(num_segments, dtype=keys.dtype),
                         side="right")  # (T,)
    s = jnp.where((r > 0)[:, None], csum[jnp.maximum(r - 1, 0)], 0.0)
    return s - jnp.concatenate([jnp.zeros_like(s[:1]), s[:-1]], axis=0)


def _densify_runs(keys: jax.Array, sorted_vals: jax.Array, num_segments: int):
    """Dense (T, F) segment sums from key-sorted contributions, with no
    T-proportional serial work (see ``_segment_sum_sorted``).

    Precision note (r3 ADVICE): both densify strategies form each run's sum
    as a difference of a single f32 running cumsum over all M contributions,
    so a late run's absolute error is ~M * eps_f32 * mean|grad| in the worst
    case (M ~ 8.4e6 at the reference working point after micro-batching:
    relative error ~1e-3 of the PREFIX magnitude, i.e. noise comparable to
    the bf16 gather-row quantization also active on that path, and far
    below Adam's 1/sqrt(v) normalization scale). Random gradient signs make
    the prefix a random walk (error ~ sqrt(M)), not a linear accumulation.
    If table-gradient noise at capacity ever becomes visible, segment the
    cumsum per chunk or use Kahan-pair accumulation here."""
    m = keys.shape[0]
    f = sorted_vals.shape[1]
    u = min(m, num_segments)  # static bound on the number of distinct keys
    # the last contribution of each key's run
    is_end = jnp.concatenate(
        [keys[1:] != keys[:-1], jnp.ones((1,), bool)]
    )
    # sentinel T sorts after every real key; everything it carries is
    # discarded below
    end_key = jnp.where(is_end, keys, jnp.asarray(num_segments, keys.dtype))
    csums = tuple(jnp.cumsum(sorted_vals[:, j]) for j in range(f))
    compact = jax.lax.sort((end_key,) + csums, num_keys=1)
    k_u = compact[0][:u]
    # when there are fewer than u distinct keys, sentinels reach the [:u]
    # slice — give each its own out-of-range row so the scatter's indices
    # stay sorted AND unique, then slice the pad rows off
    dest = jnp.where(
        k_u < num_segments,
        k_u,
        jnp.asarray(num_segments, k_u.dtype) + jnp.arange(u, dtype=k_u.dtype),
    )
    cols = []
    for j in range(f):
        ends = compact[1 + j][:u]
        # consecutive keys' runs are adjacent in the first sort's order, so
        # each run's sum is the diff of consecutive run-end cumsums
        run_sums = ends - jnp.concatenate(
            [jnp.zeros((1,), ends.dtype), ends[:-1]]
        )
        cols.append(
            jnp.zeros((num_segments + u,), ends.dtype)
            .at[dest]
            .set(run_sums, indices_are_sorted=True, unique_indices=True)[
                :num_segments
            ]
        )
    return jnp.stack(cols, axis=1)


_hash_encode_core.defvjp(_hash_encode_fwd, _hash_encode_bwd)
