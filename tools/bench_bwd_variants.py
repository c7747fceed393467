"""Microbench: hash-table backward kernel operand-construction variants.

The one-hot-matmul backward (ops/hash_bwd_pallas.py) is VPU-bound on
building its one-hot operands in f32 and on the 8 per-corner accumulate
passes, not on the MXU matmuls. Variants measured here at flagship scale:

- v0: current kernel (f32 compares/selects, astype to bf16, 8 dots/row).
- v2: operands built natively in bf16 — lane ids (<128) and chunk ids
  (<64) are exactly representable, so compares/selects run on packed
  16-bit vregs (half the passes).
- v3: v2 + corners batched along the contraction axis in a VMEM scratch:
  ONE (R,1024)x(128,1024)^T dot per sublane row instead of 8 dots + 8
  accumulate passes.

Numerics: each variant is checked against v0 (same bf16-contribution /
f32-accumulate class) before timing.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atmonr_tpu.models.hash_grid import _PRIMES, HashGridConfig, init_hash_table
from atmonr_tpu.ops.hash_bwd_pallas import (
    LANES,
    _BLOCK_POINTS,
    bwd_row_layout,
    hash_encode_pallas_bwd,
    unpack_grad_rows,
)


def _level_geometry(cfg, level, x_parts):
    scale = float(cfg.level_scales[level])
    res = int(cfg.level_resolutions[level])
    pos = [xd * scale + 0.5 for xd in x_parts]
    pg = [jnp.floor(p) for p in pos]
    frac = [p - g for p, g in zip(pos, pg)]
    base = [jnp.clip(g.astype(jnp.int32), 0, res - 2) for g in pg]
    return res, cfg.level_is_dense(level), frac, base


def _corner_index_weight(cfg, corner, res, dense, frac, base):
    nd = cfg.n_dims
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
            h = h ^ (g3[d].astype(jnp.uint32) * jnp.uint32(_PRIMES[d]))
        idx = (h & jnp.uint32(cfg.hashmap_size - 1)).astype(jnp.int32)
    w = jnp.ones_like(frac[0])
    for d in range(nd):
        w = w * (frac[d] if cbits[d] else 1.0 - frac[d])
    return idx, w


def _onehot_relu(iota_b, val_b, amp_b):
    """one_hot(iota == val) * amp for integer-valued bf16 operands:
    relu(1 - |iota - val|) * amp — pure bf16 arithmetic, no i1 masks."""
    d = jnp.abs(iota_b - val_b)
    oh = jnp.maximum(jnp.bfloat16(1) - d, jnp.bfloat16(0))
    return oh * amp_b


def _bwd_kernel_v2(
    x_ref, g_ref, out_ref, *, cfg, row_offs, row_counts, pv
):
    """bf16 arithmetic one-hots (relu(1-|iota-val|)), 8 dots per row."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dt = jnp.bfloat16
    nd = cfg.n_dims
    n_corners = 1 << nd
    iota_lb = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0).astype(dt)

    for level in range(cfg.n_levels):
        j_rows = row_counts[level]
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (j_rows, LANES), 0)
        iota_cb = (iota_j >> 1).astype(dt)
        feat_mask = (iota_j & 1) == 0

        def s_body(s, acc, *, level=level, j_rows=j_rows, iota_cb=iota_cb,
                   feat_mask=feat_mask):
            xr = [x_ref[d, pl.ds(s, 1), :] for d in range(nd)]
            res, dense, frac, base = _level_geometry(cfg, level, xr)
            g0 = g_ref[2 * level, pl.ds(s, 1), :]
            g1 = g_ref[2 * level + 1, pl.ds(s, 1), :]
            g_sel = jnp.where(feat_mask, g0, g1).astype(dt)
            for corner in range(n_corners):
                idx, w = _corner_index_weight(cfg, corner, res, dense, frac, base)
                cid = jax.lax.shift_right_logical(idx, 7).astype(dt)
                local = jax.lax.bitwise_and(idx, LANES - 1).astype(dt)
                a_t = _onehot_relu(iota_lb, local, w.astype(dt))
                bv = _onehot_relu(iota_cb, cid, g_sel)
                acc = acc + jax.lax.dot_general(
                    bv, a_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return acc

        acc = jax.lax.fori_loop(
            0, pv, s_body, jnp.zeros((j_rows, LANES), jnp.float32)
        )
        r0 = row_offs[level]
        out_ref[r0 : r0 + j_rows, :] += acc


def _bwd_kernel_v3(
    x_ref, g_ref, out_ref, a_scr, b_scr, *, cfg, row_offs, row_counts, pv
):
    """v2's bf16 arithmetic one-hots + corners batched along the
    contraction axis in VMEM scratch: ONE deep dot per sublane row."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dt = jnp.bfloat16
    nd = cfg.n_dims
    n_corners = 1 << nd
    iota_lb = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0).astype(dt)

    for level in range(cfg.n_levels):
        j_rows = row_counts[level]
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (j_rows, LANES), 0)
        iota_cb = (iota_j >> 1).astype(dt)
        feat_mask = (iota_j & 1) == 0

        def s_body(s, acc, *, level=level, j_rows=j_rows, iota_cb=iota_cb,
                   feat_mask=feat_mask):
            xr = [x_ref[d, pl.ds(s, 1), :] for d in range(nd)]
            res, dense, frac, base = _level_geometry(cfg, level, xr)
            g0 = g_ref[2 * level, pl.ds(s, 1), :]
            g1 = g_ref[2 * level + 1, pl.ds(s, 1), :]
            g_sel = jnp.where(feat_mask, g0, g1).astype(dt)
            for corner in range(n_corners):
                idx, w = _corner_index_weight(cfg, corner, res, dense, frac, base)
                cid = jax.lax.shift_right_logical(idx, 7).astype(dt)
                local = jax.lax.bitwise_and(idx, LANES - 1).astype(dt)
                a_scr[:, pl.ds(corner * LANES, LANES)] = _onehot_relu(
                    iota_lb, local, w.astype(dt)
                )
                b_scr[0:j_rows, pl.ds(corner * LANES, LANES)] = _onehot_relu(
                    iota_cb, cid, g_sel
                )
            return acc + jax.lax.dot_general(
                b_scr[0:j_rows, :], a_scr[:, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            0, pv, s_body, jnp.zeros((j_rows, LANES), jnp.float32)
        )
        r0 = row_offs[level]
        out_ref[r0 : r0 + j_rows, :] += acc


def run_variant(kernel_fn, x, g, cfg, *, scratch=False):
    nd = cfg.n_dims
    m = x.shape[0]
    m_pad = -(-m // _BLOCK_POINTS) * _BLOCK_POINTS
    assert m_pad == m
    lf = cfg.n_levels * cfg.n_features_per_level
    x3 = x.astype(jnp.float32).T.reshape(nd, m_pad // LANES, LANES)
    gt = g.astype(jnp.float32).T.reshape(lf, m_pad // LANES, LANES)
    row_offs, row_counts, r_total = bwd_row_layout(cfg)
    pv = _BLOCK_POINTS // LANES
    kernel = functools.partial(
        kernel_fn, cfg=cfg, row_offs=row_offs, row_counts=row_counts, pv=pv
    )
    max_rows = max(row_counts)
    scratch_shapes = (
        [
            pltpu.VMEM((LANES, (1 << nd) * LANES), jnp.bfloat16),
            pltpu.VMEM((max_rows, (1 << nd) * LANES), jnp.bfloat16),
        ]
        if scratch
        else []
    )
    packed = pl.pallas_call(
        kernel,
        grid=(m_pad // _BLOCK_POINTS,),
        in_specs=[
            pl.BlockSpec((nd, pv, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lf, pv, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r_total, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r_total, LANES), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=jax.default_backend() != "tpu",
    )(x3, gt)
    return unpack_grad_rows(packed, cfg)


def timed(fn, *args, iters=20, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out).ravel()[0]
    print(f"  [{label}] compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    # transport warm-up (docs/performance.md)
    for _ in range(60):
        out = fn(*args)
    np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    cfg = HashGridConfig(
        n_dims=3,
        n_levels=16,
        n_features_per_level=2,
        log2_hashmap_size=13,
        base_resolution=16,
        per_level_scale=1.3819,
    )
    m = 8192 * 24  # flagship: 8192 rays x 24 fine samples
    m_pad = -(-m // _BLOCK_POINTS) * _BLOCK_POINTS
    x = jax.random.uniform(jax.random.PRNGKey(1), (m_pad, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (m_pad, cfg.n_output_dims))

    v0 = jax.jit(lambda x, g: hash_encode_pallas_bwd(x, g, cfg, "bf16"))
    v2 = jax.jit(lambda x, g: run_variant(_bwd_kernel_v2, x, g, cfg))
    v3 = jax.jit(
        lambda x, g: run_variant(_bwd_kernel_v3, x, g, cfg, scratch=True)
    )

    ref = np.asarray(v0(x, g))
    scale = np.abs(ref).max()
    results = {}
    for name, fn in [("v0_current", v0), ("v2_bf16_ops", v2), ("v3_batched_dot", v3)]:
        try:
            out = np.asarray(fn(x, g))
            err = np.abs(out - ref).max() / scale
            dt = timed(fn, x, g, label=name)
            results[name] = (dt, err)
            print(f"{name:16s} {dt * 1e3:8.3f} ms   rel_err_vs_v0 {err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}", flush=True)

    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    del table


if __name__ == "__main__":
    main()
