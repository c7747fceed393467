"""Pallas TPU kernel: fused multiresolution hash-encode forward.

TPU-native replacement for tiny-cuda-nn's CUDA ``HashGrid`` forward
(reference pipelines/instant_ngp.py:60-63): ONE kernel takes raw positions
and the packed feature tables and produces the full (M, L*F) encoding.
Everything — per-level grid scaling, corner/hash index math, trilinear
weights, the table lookups, and the corner accumulation — happens in VMEM,
so no per-level index/weight intermediates ever touch HBM (a per-level
``pallas_call`` variant OOM'd the 16 GB chip: XLA must materialize every
opaque kernel input, ~1 GB of (M, 8) arrays per step plus remat copies).

The lookup itself is a chunked-VMEM scan. XLA's row gather sustains only
~190 M rows/s on v5e (docs/performance.md), while Mosaic's lane-axis
``tpu.dynamic_gather`` (via ``take_along_axis``) resolves 128 lookups/op
against a 128-entry chunk:

    cid, local = idx >> 7, idx & 127
    for chunk c in level:  acc = where(cid == c, lane_gather(chunk[c], local), acc)

~3 VPU ops per chunk per lookup-vreg, manually unrolled x8 (Mosaic's
``fori_loop`` carries real per-iteration scalar overhead). In ``bf16`` mode
both features of an entry are packed into one u32 word so the scan runs
once per entry (tcnn stores fp16 tables; same half-precision trade);
``f32`` mode scans one u32 word per feature for exact f32 numerics;
``q8`` mode packs TWO entries per word (2 x int8 features each, per-level
symmetric scales computed from the live table every step) so each
128-word chunk covers 256 entries and the scan runs half of bf16's chunk
steps — measured 1.85x bf16 at flagship scale (4.3 vs 8.0 ms), with f32
master weights and the exact table gradient unchanged (the backward
depends only on positions and cotangents). Cost is O(table_size x
lookups) VPU work, so :func:`supported` caps levels at 2^15 entries
(2^16 for q8) — the TPU flagship config's choice. Measured (v5e,
flagship work rate): 3.5x the XLA gather path (bf16), 6.5x (q8).

Index math mirrors ``models.hash_grid.level_indices`` op-for-op (same IEEE
ops, same order), so ``f32`` mode is bit-exact against the XLA path and
``bf16`` mode is bit-exact against it on a bf16-rounded table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_UNROLL = 32  # swept 8/16/32 x block 4096/8192/16384 on v5e: 32/4096 best (~7%)
_BLOCK_POINTS = 4096  # points per grid step; 32 (8,128) vregs per corner


def _scan_chunks(
    table_ref,
    word: int,
    cids,
    locals_,
    c_begin: int,
    c_end: int,
    local_mask: int = 0,
):
    """Masked chunk scan over one level's global chunk range, serving ALL
    corners' lookups in one pass so the per-chunk table-row broadcast is
    shared (8 corners: 17 VPU ops/chunk instead of 24). ``cids`` holds the
    global chunk id per corner (level chunk offset already added); returns
    one packed u32 feature word per corner per lookup.

    ``local_mask`` masks high bits of ``locals_`` at gather time (q8 mode
    keeps the entry-half bit packed in ``locals_`` bit 7 rather than as 8
    more live (PV, 128) arrays across the scan)."""

    def step(c, accs):
        vals = table_ref[word, c, :]  # (128,) u32
        vals_b = jnp.broadcast_to(vals[None, :], cids[0].shape)
        return tuple(
            jnp.where(
                cids[k] == c,
                jnp.take_along_axis(
                    vals_b,
                    jax.lax.bitwise_and(locals_[k], local_mask)
                    if local_mask
                    else locals_[k],
                    axis=1,
                ),
                accs[k],
            )
            for k in range(len(cids))
        )

    def group_body(i, accs):
        c0 = c_begin + i * _UNROLL
        for u in range(_UNROLL):
            accs = step(c0 + u, accs)
        return accs

    accs = tuple(jnp.zeros(cids[0].shape, jnp.uint32) for _ in cids)
    n = c_end - c_begin
    groups = n // _UNROLL
    if groups:
        accs = jax.lax.fori_loop(0, groups, group_body, accs)
    for c in range(c_begin + groups * _UNROLL, c_end):  # static remainder
        accs = step(c, accs)
    return accs


def _unpack_bf16_pair(packed):
    """u32 word -> (f32, f32): a bf16's f32 bits are its own bits << 16."""
    f0 = jax.lax.bitcast_convert_type(packed & jnp.uint32(0xFFFF0000), jnp.float32)
    f1 = jax.lax.bitcast_convert_type(packed << 16, jnp.float32)
    return f0, f1


def _unpack_q8_pair(packed, half_sel):
    """u32 word [b3 b2 b1 b0] -> the selected entry's two int8 features
    as f32 (un-scaled): half 0 = (b0, b1), half 1 = (b2, b3)."""
    half = jnp.where(half_sel == 1, packed >> 16, packed)
    hi = jax.lax.bitcast_convert_type(half, jnp.int32)
    f0 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(hi, 24), 24)
    f1 = jax.lax.shift_right_arithmetic(jax.lax.shift_left(hi, 16), 24)
    return f0.astype(jnp.float32), f1.astype(jnp.float32)


def _decode_e4m3(byte):
    """u32 whose low 8 bits hold a float8_e4m3fn code -> f32 value.
    Exact: normals via direct exponent rebias into f32 bits, denormals
    (E=0) are M * 2^-9; the encoder never emits the NaN code (0x7f)."""
    sgn = byte >> 7
    mag = jax.lax.bitwise_and(byte, jnp.uint32(127))
    normal = jax.lax.bitcast_convert_type(
        (mag << 20) + jnp.uint32(120 << 23), jnp.float32
    )
    # Mosaic lacks u32 -> f32 casts; route through i32 (values are 0..7)
    denorm = jax.lax.bitcast_convert_type(
        jax.lax.bitwise_and(mag, jnp.uint32(7)), jnp.int32
    ).astype(jnp.float32) * (2.0**-9)
    v = jnp.where(mag >= 8, normal, denorm)
    return jnp.where(sgn == 1, -v, v)


def _unpack_f8_pair(packed, half_sel):
    """u32 word [b3 b2 b1 b0] -> the selected entry's two e4m3 features
    as f32 (un-scaled): half 0 = (b0, b1), half 1 = (b2, b3)."""
    half = jnp.where(half_sel == 1, packed >> 16, packed)
    f0 = _decode_e4m3(jax.lax.bitwise_and(half, jnp.uint32(255)))
    f1 = _decode_e4m3(jax.lax.bitwise_and(half >> 8, jnp.uint32(255)))
    return f0, f1


def _fused_kernel(
    table_ref,
    x_ref,
    out_ref,
    *,
    cfg,
    mode: str,
    chunk_offs: tuple[int, ...],
    chunk_counts: tuple[int, ...],
):
    from atmonr_tpu.models.hash_grid import _PRIMES

    f = cfg.n_features_per_level
    nd = cfg.n_dims
    n_corners = 1 << nd
    x = [x_ref[d] for d in range(nd)]  # (PV, 128) f32 each
    for level in range(cfg.n_levels):
        scale = float(cfg.level_scales[level])
        res = int(cfg.level_resolutions[level])
        dense = cfg.level_is_dense(level)
        # mirrors level_indices: pos = x*scale + 0.5; clip(floor, 0, res-2)
        pos = [xd * scale + 0.5 for xd in x]
        pg = [jnp.floor(p) for p in pos]
        frac = [p - g for p, g in zip(pos, pg)]
        base = [jnp.clip(g.astype(jnp.int32), 0, res - 2) for g in pg]

        acc = [jnp.zeros_like(x[0]) for _ in range(f)]
        c_begin = chunk_offs[level]
        c_end = c_begin + chunk_counts[level]
        cids, locals_, ws = [], [], []
        for corner in range(n_corners):
            cbits = [(corner >> d) & 1 for d in range(nd)]
            g = [b + cb for b, cb in zip(base, cbits)]
            if dense:
                idx = g[0]
                stride = 1
                for d in range(1, nd):
                    stride *= res
                    idx = idx + g[d] * stride
            else:
                h = g[0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
                for d in range(1, nd):
                    h = h ^ (g[d].astype(jnp.uint32) * jnp.uint32(_PRIMES[d]))
                idx = (h & jnp.uint32(cfg.hashmap_size - 1)).astype(jnp.int32)
            w = jnp.ones_like(x[0])
            for d in range(nd):
                w = w * (frac[d] if cbits[d] else 1.0 - frac[d])
            if mode in ("q8", "f8"):
                # one u32 word packs TWO entries (2 x 8-bit features each):
                # a 128-word chunk covers 256 entries — half the scan.
                # Entry e of a chunk sits at lane e & 127, 16-bit half
                # e >> 7 (the layout keeps packing a contiguous reshape);
                # locals_ carries lane AND half (bit 7) in one live array,
                # masked at gather time
                cids.append(jax.lax.shift_right_logical(idx, 8) + c_begin)
                locals_.append(jax.lax.bitwise_and(idx, 2 * LANES - 1))
            else:
                cids.append(jax.lax.shift_right_logical(idx, 7) + c_begin)
                locals_.append(jax.lax.bitwise_and(idx, LANES - 1))
            ws.append(w)
        if mode in ("q8", "f8"):
            unpack = _unpack_q8_pair if mode == "q8" else _unpack_f8_pair
            packed = _scan_chunks(
                table_ref, 0, cids, locals_, c_begin, c_end,
                local_mask=LANES - 1,
            )
            for corner in range(n_corners):
                half = jax.lax.shift_right_logical(locals_[corner], 7)
                f0, f1 = unpack(packed[corner], half)
                acc[0] = acc[0] + ws[corner] * f0
                acc[1] = acc[1] + ws[corner] * f1
        elif mode == "bf16":
            packed = _scan_chunks(table_ref, 0, cids, locals_, c_begin, c_end)
            for corner in range(n_corners):
                f0, f1 = _unpack_bf16_pair(packed[corner])
                acc[0] = acc[0] + ws[corner] * f0
                acc[1] = acc[1] + ws[corner] * f1
        else:
            for word in range(f):
                bits = _scan_chunks(
                    table_ref, word, cids, locals_, c_begin, c_end
                )
                for corner in range(n_corners):
                    fv = jax.lax.bitcast_convert_type(
                        bits[corner], jnp.float32
                    )
                    acc[word] = acc[word] + ws[corner] * fv
        for word in range(f):
            out_ref[level * f + word] = acc[word]


def _u16_bits(x16) -> jax.Array:
    return jax.lax.bitcast_convert_type(x16, jnp.uint16).astype(jnp.uint32)


def pack_level_table(
    table: jax.Array, level_offset: int, level_size: int, mode: str
) -> jax.Array:
    """Slice one level out of the flat (total, F) f32 table and pack it
    (W, ceil(T/128), 128) u32 for the kernel (zero-padded to a 128
    multiple — valid indices never reach the padding).

    ``bf16``: W=1, both features' bf16 bits packed per word (F must be 2).
    ``f32``:  W=F, each word a feature's f32 bits (exact).
    """
    t = table[level_offset : level_offset + level_size]  # (T, F)
    n_feats = t.shape[1]
    padded = -(-level_size // LANES) * LANES
    if padded != level_size:
        t = jnp.concatenate(
            [t, jnp.zeros((padded - level_size, n_feats), t.dtype)], axis=0
        )
    if mode == "bf16":
        assert n_feats == 2, n_feats
        bits = _u16_bits(t.astype(jnp.bfloat16))  # (T, 2) u32 of bf16 bits
        words = (bits[:, 0] << 16) | bits[:, 1]
        return words.reshape(1, padded // LANES, LANES)
    words = jax.lax.bitcast_convert_type(t, jnp.uint32)  # (T, F)
    return words.T.reshape(n_feats, padded // LANES, LANES)


def quantize_level_q8(
    table: jax.Array,
    level_offset: int,
    level_size: int,
    noise: jax.Array | None = None,
):
    """Per-level symmetric int8 quantization: (T, 2) f32 slice ->
    (clipped round(t/s) int32 in [-127, 127], scale s = max|t|/127).

    ``noise`` (same shape as ``table``, U[0,1)) switches to stochastic
    rounding ``floor(t/s + u)``: E[q*s] = t, so the per-step quantization
    error is unbiased — deterministic round-to-nearest feeds the training
    loop a *biased* noise (entries below s/2 are pinned to zero every
    step), which is the suspected cause of q8's PSNR floor
    (docs/performance.md)."""
    t = table[level_offset : level_offset + level_size]
    s = jnp.maximum(jnp.max(jnp.abs(t)), 1e-30) / 127.0
    if noise is None:
        q = jnp.round(t / s)
    else:
        u = noise[level_offset : level_offset + level_size]
        q = jnp.floor(t / s + u)
    return jnp.clip(q, -127, 127).astype(jnp.int32), s


def pack_level_table_q8(
    table: jax.Array,
    level_offset: int,
    level_size: int,
    noise: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One level packed for the q8 scan: TWO entries (2 x int8 features
    each) per u32 word, (1, ceil(T/256), 128) u32 — chunks cover 256
    entries, halving the scan vs bf16 mode. Entry e of a chunk occupies
    lane e & 127, 16-bit half e >> 7, so packing is lane slices + one
    contiguous reshape (a first stride-2 layout cost 3.5 ms/step vs this
    one's ~1 ms). Returns (packed, scale)."""
    q, s = quantize_level_q8(table, level_offset, level_size, noise)
    padded = -(-level_size // (2 * LANES)) * (2 * LANES)
    if padded != level_size:
        q = jnp.concatenate(
            [q, jnp.zeros((padded - level_size, q.shape[1]), q.dtype)], axis=0
        )
    b = jax.lax.bitwise_and(q, 255).astype(jnp.uint32)  # (Tp, 2) bytes
    return _pack_bytes(b, padded), s


def _pack_bytes(b: jax.Array, padded: int) -> jax.Array:
    """(Tp, 2) u32 byte values -> (1, Tp/256, 128) packed words."""
    halves = b[:, 0] | (b[:, 1] << 8)  # (Tp,) u16 bits per entry
    hr = halves.reshape(padded // (2 * LANES), 2, LANES)  # [c, half, lane]
    words = hr[:, 0, :] | (hr[:, 1, :] << 16)  # (C, 128)
    return words[None]


def quantize_level_f8(table: jax.Array, level_offset: int, level_size: int):
    """Per-level power-of-2-scaled float8_e4m3fn quantization: (T, 2) f32
    slice -> (e4m3 codes, scale s) with max|t|/s <= 448 (e4m3's max)."""
    t = table[level_offset : level_offset + level_size]
    m = jnp.maximum(jnp.max(jnp.abs(t)), 1e-30)
    s = jnp.exp2(jnp.ceil(jnp.log2(m / 448.0)))
    return (t / s).astype(jnp.float8_e4m3fn), s


def pack_level_table_f8(
    table: jax.Array, level_offset: int, level_size: int
) -> tuple[jax.Array, jax.Array]:
    """One level packed for the f8 scan: TWO entries (2 x e4m3 features
    each) per u32 word — same layout and scan cost as q8, but float8
    keeps ~6% RELATIVE precision across magnitudes where int8's absolute
    step drowns small features. Returns (packed, scale)."""
    f8, s = quantize_level_f8(table, level_offset, level_size)
    padded = -(-level_size // (2 * LANES)) * (2 * LANES)
    if padded != level_size:
        f8 = jnp.concatenate(
            [f8, jnp.zeros((padded - level_size, f8.shape[1]), f8.dtype)],
            axis=0,
        )
    b = jax.lax.bitcast_convert_type(f8, jnp.uint8).astype(jnp.uint32)
    return _pack_bytes(b, padded), s


def pack_tables(table: jax.Array, cfg, mode: str, noise: jax.Array | None = None):
    """All levels packed + concatenated along the chunk axis.

    Returns (packed (W, total_chunks, 128) u32, chunk_offs, chunk_counts,
    scales) — ``scales`` is a per-level (n_levels,) f32 dequantization
    factor for ``q8`` mode, None otherwise. ``noise`` (table-shaped U[0,1))
    selects stochastic rounding for ``q8``.
    """
    parts, offs, counts, scales = [], [], [], []
    total = 0
    for level in range(cfg.n_levels):
        if mode in ("q8", "f8"):
            if mode == "q8":
                p, s = pack_level_table_q8(
                    table, cfg.level_offsets[level], cfg.level_sizes[level],
                    noise,
                )
            else:
                p, s = pack_level_table_f8(
                    table, cfg.level_offsets[level], cfg.level_sizes[level]
                )
            scales.append(s)
        else:
            p = pack_level_table(
                table, cfg.level_offsets[level], cfg.level_sizes[level], mode
            )
        parts.append(p)
        offs.append(total)
        counts.append(p.shape[1])
        total += p.shape[1]
    return (
        jnp.concatenate(parts, axis=1),
        tuple(offs),
        tuple(counts),
        jnp.stack(scales) if mode in ("q8", "f8") else None,
    )


def supported(cfg, mode: str = "bf16", max_table_entries: int = 1 << 15) -> bool:
    """Whether the Pallas path applies: 2-D/3-D grids with every level's
    table small enough that the chunk scan beats the XLA gather (the scan
    is O(table_size x lookups); q8 packs 2 entries/word so its scan costs
    half of bf16's at equal table size)."""
    if mode in ("bf16", "q8", "f8") and cfg.n_features_per_level != 2:
        return False
    if mode in ("q8", "f8"):
        max_table_entries *= 2
    return cfg.n_dims in (2, 3) and max(cfg.level_sizes) <= max_table_entries


def hash_encode_pallas_fwd(
    table: jax.Array,
    x: jax.Array,
    cfg,
    mode: str = "bf16",
    noise: jax.Array | None = None,
) -> jax.Array:
    """Fused forward-equivalent of ``hash_grid._hash_encode_impl``:
    (M, D) positions -> (M, L*F) features, one pallas_call."""
    assert cfg.n_dims in (2, 3), cfg.n_dims
    nd = cfg.n_dims
    f = cfg.n_features_per_level
    m = x.shape[0]
    m_pad = -(-m // _BLOCK_POINTS) * _BLOCK_POINTS
    if m_pad != m:
        x = jnp.concatenate(
            [x, jnp.zeros((m_pad - m, x.shape[1]), x.dtype)], axis=0
        )
    # (M, D) -> (D, M/128, 128): coordinate-major, naturally lane-tiled
    x3 = x.astype(jnp.float32).T.reshape(nd, m_pad // LANES, LANES)
    packed, chunk_offs, chunk_counts, scales = pack_tables(table, cfg, mode, noise)
    n_words = packed.shape[0]
    total_chunks = packed.shape[1]
    pv_blk = _BLOCK_POINTS // LANES

    kernel = functools.partial(
        _fused_kernel,
        cfg=cfg,
        mode=mode,
        chunk_offs=chunk_offs,
        chunk_counts=chunk_counts,
    )
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // _BLOCK_POINTS,),
        in_specs=[
            pl.BlockSpec(
                (n_words, total_chunks, LANES),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nd, pv_blk, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (cfg.n_levels * f, pv_blk, LANES),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (cfg.n_levels * f, m_pad // LANES, LANES), jnp.float32
        ),
        interpret=jax.default_backend() != "tpu",
    )(packed, x3)
    if mode in ("q8", "f8"):
        # dequantize outside the kernel: the scan accumulated integer-
        # valued features x trilerp weights; scale is per level (2 rows)
        out = out * jnp.repeat(scales, f)[:, None, None]
    # (L*F, M/128, 128) -> (M, L*F)
    return out.reshape(cfg.n_levels * f, m_pad).T[:m]
