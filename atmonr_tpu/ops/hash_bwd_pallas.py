"""Pallas TPU kernel: fused multiresolution hash-table gradient (backward).

TPU-native replacement for tiny-cuda-nn's atomicAdd hash-grid backward
(reference pipelines/instant_ngp.py:60-63 trains the tables via CUDA
scatter-adds). TPUs have no scatter atomics and XLA:TPU lowers scatter
serially (~13 M updates/s, docs/performance.md), so the previous design
sorted all B*N*levels*corners contributions and segment-summed — one
``jax.lax.sort`` + cumsum over 134 M elements per step, ~1.2 s of the
1.4 s flagship train step.

This kernel removes the sort entirely by turning the scatter into MXU
matmuls against one-hot matrices, accumulated in VMEM:

    dW[t, f] = sum_p onehot(idx_p == t) * w_p * g_p[f]

factoring the table index as (chunk c = t >> 7, lane l = t & 127) so the
level's gradient, laid out as a (2*C, 128) block (rows j = 2c+f), is

    dW[j, l] = sum_e Bv[j, e] * A~[l, e]
    Bv[j, e] = (j >> 1 == cid_e) * g_e[j & 1]     (chunk one-hot x cotangent)
    A~[l, e] = (l == local_e) * w_e               (lane one-hot x trilerp w)

— one ``dot_general`` (contracting e = 128 contributions of one sublane
row x corner) per (level, corner, sublane-row). The one-hot operands are
built by VPU compares directly in the natural lane layout (no transposes),
the corner/hash index math is recomputed in-kernel exactly as the forward
kernel does (hash_gather_pallas.py), and the full packed gradient table
(~3.7 MB for the flagship config) lives in VMEM across the whole grid, so
no per-contribution intermediate ever touches HBM.

``bf16`` mode builds the one-hot operands in bfloat16 (f32 MXU
accumulation) — the same half-precision contribution / full-precision
accumulate trade as tcnn's fp16 atomics, and strictly better than tcnn's
fp16 *accumulation*. ``f32`` mode runs the matmuls in float32 for tighter
parity with the XLA scatter path (same products, different summation
order).

Cost is O(level_table_size) MXU FLOPs per contribution (4*T per point per
level), so like the forward kernel it applies to configs whose levels are
capped around 2^15 entries (the TPU flagship config); larger tables fall
back to the sorted segment-sum path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_BLOCK_POINTS = 4096  # points per grid step; PV = 32 sublane rows


def _align(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def bwd_row_layout(cfg) -> tuple[tuple[int, ...], tuple[int, ...], int]:
    """Per-level (row_offset, row_count) of the packed (R, 128) gradient.

    A level with C = ceil(size/128) chunks gets 2*align(C, 8) rows (rows
    j = 2c+f interleave the two features; the alignment keeps every
    level's block sublane-tiled for bf16 operands).
    """
    offs, counts = [], []
    total = 0
    for level in range(cfg.n_levels):
        c_pad = _align(-(-cfg.level_sizes[level] // LANES), 8)
        offs.append(total)
        counts.append(2 * c_pad)
        total += 2 * c_pad
    return tuple(offs), tuple(counts), total


def supported(cfg, mode: str = "bf16", max_rows: int = 1 << 13) -> bool:
    """Gate: 2-D/3-D grids, 2 features (the row interleave), and a packed
    gradient small enough to keep resident in VMEM (~4 MB at 8192 rows).
    The reference's 2^21-entry tables fail the gate and use the sorted
    segment-sum fallback."""
    if cfg.n_dims not in (2, 3) or cfg.n_features_per_level != 2:
        return False
    return bwd_row_layout(cfg)[2] <= max_rows


def _bwd_kernel(
    x_ref,
    g_ref,
    out_ref,
    *,
    cfg,
    mode: str,
    row_offs: tuple[int, ...],
    row_counts: tuple[int, ...],
    pv: int,
):
    from atmonr_tpu.models.hash_grid import _PRIMES

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dt = jnp.bfloat16 if mode == "bf16" else jnp.float32
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    nd = cfg.n_dims
    n_corners = 1 << nd

    for level in range(cfg.n_levels):
        scale = float(cfg.level_scales[level])
        res = int(cfg.level_resolutions[level])
        dense = cfg.level_is_dense(level)
        j_rows = row_counts[level]
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (j_rows, LANES), 0)

        def s_body(s, acc, *, j_rows=j_rows, iota_j=iota_j, scale=scale,
                   res=res, dense=dense, level=level):
            xr = [x_ref[d, pl.ds(s, 1), :] for d in range(nd)]  # (1, 128)
            pos = [xd * scale + 0.5 for xd in xr]
            pg = [jnp.floor(p) for p in pos]
            frac = [p - g for p, g in zip(pos, pg)]
            base = [jnp.clip(g.astype(jnp.int32), 0, res - 2) for g in pg]
            g0 = g_ref[2 * level, pl.ds(s, 1), :]  # (1, 128)
            g1 = g_ref[2 * level + 1, pl.ds(s, 1), :]
            # Bv rows alternate features: row j carries g[j & 1]
            g_sel = jnp.where((iota_j & 1) == 0, g0, g1).astype(dt)
            for corner in range(n_corners):
                cbits = [(corner >> d) & 1 for d in range(nd)]
                g3 = [b + cb for b, cb in zip(base, cbits)]
                if dense:
                    idx = g3[0]
                    stride = 1
                    for d in range(1, nd):
                        stride *= res
                        idx = idx + g3[d] * stride
                else:
                    h = g3[0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
                    for d in range(1, nd):
                        h = h ^ (
                            g3[d].astype(jnp.uint32) * jnp.uint32(_PRIMES[d])
                        )
                    idx = (h & jnp.uint32(cfg.hashmap_size - 1)).astype(
                        jnp.int32
                    )
                w = jnp.ones_like(xr[0])
                for d in range(nd):
                    w = w * (frac[d] if cbits[d] else 1.0 - frac[d])
                cid = jax.lax.shift_right_logical(idx, 7)  # (1, 128)
                local = jax.lax.bitwise_and(idx, LANES - 1)
                a_t = jnp.where(iota_l == local, w, 0.0).astype(dt)
                bv = jnp.where((iota_j >> 1) == cid, g_sel, 0.0)
                acc = acc + jax.lax.dot_general(
                    bv,
                    a_t,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return acc

        acc = jax.lax.fori_loop(
            0, pv, s_body, jnp.zeros((j_rows, LANES), jnp.float32)
        )
        r0 = row_offs[level]
        out_ref[r0 : r0 + j_rows, :] += acc


def unpack_grad_rows(packed: jax.Array, cfg) -> jax.Array:
    """(R, 128) packed per-level row blocks -> flat (total_params, F)."""
    row_offs, row_counts, _ = bwd_row_layout(cfg)
    parts = []
    for level in range(cfg.n_levels):
        j_rows = row_counts[level]
        blk = packed[row_offs[level] : row_offs[level] + j_rows]
        # rows j = 2c+f, lanes l -> entry c*128+l, feature f
        blk = blk.reshape(j_rows // 2, 2, LANES).transpose(0, 2, 1)
        parts.append(
            blk.reshape(-1, 2)[: cfg.level_sizes[level]]
        )
    return jnp.concatenate(parts, axis=0)


def hash_encode_pallas_bwd(
    x: jax.Array, g: jax.Array, cfg, mode: str = "bf16"
) -> jax.Array:
    """Hash-table cotangent: (M, D) positions + (M, L*F) output cotangent
    -> (total_params, F) table gradient, one pallas_call (no sort, no
    scatter)."""
    assert cfg.n_dims in (2, 3) and cfg.n_features_per_level == 2
    nd = cfg.n_dims
    m = x.shape[0]
    m_pad = -(-m // _BLOCK_POINTS) * _BLOCK_POINTS
    if m_pad != m:
        # zero cotangent padding contributes nothing; x pads in-range
        x = jnp.concatenate([x, jnp.zeros((m_pad - m, nd), x.dtype)], axis=0)
        g = jnp.concatenate(
            [g, jnp.zeros((m_pad - m, g.shape[1]), g.dtype)], axis=0
        )
    lf = cfg.n_levels * cfg.n_features_per_level
    x3 = x.astype(jnp.float32).T.reshape(nd, m_pad // LANES, LANES)
    gt = g.astype(jnp.float32).T.reshape(lf, m_pad // LANES, LANES)
    row_offs, row_counts, r_total = bwd_row_layout(cfg)
    pv = _BLOCK_POINTS // LANES

    kernel = functools.partial(
        _bwd_kernel,
        cfg=cfg,
        mode=mode,
        row_offs=row_offs,
        row_counts=row_counts,
        pv=pv,
    )
    packed = pl.pallas_call(
        kernel,
        grid=(m_pad // _BLOCK_POINTS,),
        in_specs=[
            pl.BlockSpec(
                (nd, pv, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (lf, pv, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (r_total, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r_total, LANES), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x3, gt)
    return unpack_grad_rows(packed, cfg)
