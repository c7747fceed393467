"""Pallas TPU kernel: chunked-VMEM hash-table gather + trilinear reduce.

The hash-encode forward is a random gather of 2-float feature rows — XLA's
row gather sustains only ~150 M rows/s on v5e, which makes it the forward
wall (docs/performance.md). Mosaic exposes ``tpu.dynamic_gather`` along the
lane axis with a single-vreg (128-entry) source, so this kernel streams a
VMEM-resident level table in 128-entry chunks and resolves each lookup with
a masked lane-gather:

    for chunk c:  acc = where(idx in chunk, lane_gather(chunk_vals, idx - c*128), acc)

Cost is ~5 VPU ops per chunk per lookup — for tables up to ~2^15 entries
this beats the XLA gather by an order of magnitude and keeps everything in
VMEM. The corner-weighted reduction to per-point features is an MXU matmul
against a static 8-corner group-sum matrix, so no vector relayouts are
needed: lookups stay in a (rows, 128) layout end to end.

Layouts (F = features/level, fixed 128-lane tiling):
    table_packed: (F, T // 128, 128)   level table, feature-major chunks
    idx2, w2:     (R, 128)             R = M * 8 / 128 corner lookups
    output:       (F, R, 16)           16 points per row (8 corners summed)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_CORNERS = 8  # 3-D trilinear
_POINTS_PER_ROW = LANES // _CORNERS  # 16

def _group_sum_matrix():
    """(128, 16) matrix summing groups of 8 adjacent lanes on the MXU,
    built from iota inside the kernel (pallas kernels can't close over
    host constants)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (LANES, _POINTS_PER_ROW), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (LANES, _POINTS_PER_ROW), 1)
    return jnp.where(row // _CORNERS == col, 1.0, 0.0).astype(jnp.float32)


def _kernel(table_ref, idx_ref, w_ref, out_ref, *, num_chunks: int, n_feats: int):
    idx = idx_ref[:]  # (R_blk, 128)
    w = w_ref[:]
    group = _group_sum_matrix()
    for f in range(n_feats):
        def chunk_body(c, acc):
            vals = table_ref[f, c, :]  # (128,)
            vals_b = jnp.broadcast_to(vals[None, :], idx.shape)
            local = idx - c * LANES
            inb = (local >= 0) & (local < LANES)
            safe = jnp.clip(local, 0, LANES - 1)
            g = jnp.take_along_axis(vals_b, safe, axis=1)
            return jnp.where(inb, g, acc)

        feats = jax.lax.fori_loop(
            0, num_chunks, chunk_body, jnp.zeros(idx.shape, jnp.float32)
        )
        out_ref[f] = jnp.dot(
            feats * w, group, preferred_element_type=jnp.float32
        )


def gather_interp_level(
    table_packed: jax.Array, idx2: jax.Array, w2: jax.Array, block_rows: int = 256
) -> jax.Array:
    """(F, T/128, 128) table, (R, 128) corner lookups -> (F, R, 16) features.

    ``R`` must be a multiple of ``block_rows`` (callers pad points so
    M*8 % (block_rows*128) == 0).
    """
    n_feats, num_chunks, _ = table_packed.shape
    r = idx2.shape[0]
    assert r % block_rows == 0, (r, block_rows)
    grid = (r // block_rows,)
    kernel = functools.partial(
        _kernel, num_chunks=num_chunks, n_feats=n_feats
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n_feats, num_chunks, LANES),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_feats, block_rows, _POINTS_PER_ROW),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_feats, r, _POINTS_PER_ROW), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(table_packed, idx2, w2)


def pack_level_table(table: jax.Array, level_offset: int, level_size: int):
    """Slice one level out of the flat (total, F) table and pack it
    (F, ceil(T/128), 128) for the kernel (zero-padded to a 128 multiple —
    valid indices never reach the padding)."""
    t = table[level_offset : level_offset + level_size]  # (T, F)
    n_feats = t.shape[1]
    padded = -(-level_size // LANES) * LANES
    if padded != level_size:
        t = jnp.concatenate(
            [t, jnp.zeros((padded - level_size, n_feats), t.dtype)], axis=0
        )
    return t.T.reshape(n_feats, padded // LANES, LANES)


def supported(cfg, max_table_entries: int = 1 << 15) -> bool:
    """Whether the Pallas path applies: 3-D grids with every level's table
    small enough that the chunk loop beats the XLA gather."""
    return cfg.n_dims == 3 and max(cfg.level_sizes) <= max_table_entries


def hash_encode_pallas_fwd(table: jax.Array, x: jax.Array, cfg) -> jax.Array:
    """Forward-equivalent of ``hash_grid._hash_encode_impl`` using the
    chunked-VMEM gather kernel per level. (M, 3) -> (M, L*F)."""
    from atmonr_tpu.models.hash_grid import level_indices

    m = x.shape[0]
    block_pts = 256 * _POINTS_PER_ROW  # points per kernel block
    m_pad = -(-m // block_pts) * block_pts
    if m_pad != m:
        x = jnp.concatenate(
            [x, jnp.zeros((m_pad - m, x.shape[1]), x.dtype)], axis=0
        )
    outs = []
    for level in range(cfg.n_levels):
        idx, w = level_indices(x, cfg, level)  # (M_pad, 8) each
        idx2 = idx.reshape(m_pad // _POINTS_PER_ROW, LANES)
        w2 = w.astype(jnp.float32).reshape(m_pad // _POINTS_PER_ROW, LANES)
        packed = pack_level_table(
            table, cfg.level_offsets[level], cfg.level_sizes[level]
        )
        feats = gather_interp_level(packed, idx2, w2)  # (F, R, 16)
        outs.append(feats.reshape(feats.shape[0], m_pad).T)  # (M_pad, F)
    return jnp.concatenate(outs, axis=-1)[:m]
