"""Diagnostic: where the hash-encode forward wrapper time goes.

Splits hash_encode_pallas_fwd into (pack_tables | x relayout | kernel |
output relayout) and times each piece on the TPU at flagship scale.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atmonr_tpu.models.hash_grid import HashGridConfig, init_hash_table
from atmonr_tpu.ops import hash_gather_pallas as hgp


def timed(fn, *args, iters=50, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][:1])
    for _ in range(80):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:24s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def kernel_only(packed, x3, cfg, mode, chunk_offs, chunk_counts):
    nd = cfg.n_dims
    f = cfg.n_features_per_level
    n_words = packed.shape[0]
    total_chunks = packed.shape[1]
    pv_blk = hgp._BLOCK_POINTS // hgp.LANES
    m_pad = x3.shape[1] * hgp.LANES
    kernel = functools.partial(
        hgp._fused_kernel,
        cfg=cfg,
        mode=mode,
        chunk_offs=chunk_offs,
        chunk_counts=chunk_counts,
    )
    return pl.pallas_call(
        kernel,
        grid=(m_pad // hgp._BLOCK_POINTS,),
        in_specs=[
            pl.BlockSpec(
                (n_words, total_chunks, hgp.LANES),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nd, pv_blk, hgp.LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (cfg.n_levels * f, pv_blk, hgp.LANES),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (cfg.n_levels * f, m_pad // hgp.LANES, hgp.LANES), jnp.float32
        ),
    )(packed, x3)


def main():
    cfg = HashGridConfig(
        n_dims=3,
        n_levels=16,
        n_features_per_level=2,
        log2_hashmap_size=13,
        base_resolution=16,
        per_level_scale=1.3819,
    )
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    m = 8192 * 24
    m_pad = -(-m // 4096) * 4096
    x = jax.random.uniform(jax.random.PRNGKey(1), (m_pad, 3))

    for mode in ("bf16", "q8"):
        print(f"--- mode={mode}")
        packed, offs, counts, scales = hgp.pack_tables(table, cfg, mode)
        x3 = jnp.asarray(
            np.ascontiguousarray(
                np.asarray(x).T.reshape(3, m_pad // 128, 128)
            )
        )
        timed(
            jax.jit(lambda t: hgp.pack_tables(t, cfg, mode)),
            table,
            label="pack_tables",
        )
        timed(
            jax.jit(
                lambda p, xx: kernel_only(p, xx, cfg, mode, offs, counts)
            ),
            packed,
            x3,
            label="kernel only",
        )
        timed(
            jax.jit(lambda t, p: hgp.hash_encode_pallas_fwd(t, p, cfg, mode)),
            table,
            x,
            label="full wrapper",
        )
        timed(
            jax.jit(
                lambda t, p: hgp.hash_encode_pallas_fwd(t, p, cfg, mode).sum()
            ),
            table,
            x,
            label="wrapper + sum (no out.T)",
        )


if __name__ == "__main__":
    main()
