"""Microbenchmark: the 2^21 random-row gather wall (VERDICT r3 item 2).

At the reference table capacity (``configs/instant_ngp.json``: 2^21-entry
hash levels), the encode forward is a random-row gather of ~1.07e9 table
rows per step, and XLA's gather sustains only ~120-160 M rows/s on v5e —
~1% of HBM bandwidth (docs/performance.md "Reference capacity"). Is that an
XLA-lowering artifact or the chip's physics? This tool measures:

1. **XLA gather** (``jnp.take``), f32 and bf16 rows, random and sorted —
   the incumbent, re-measured with the repo's standard warm-until-steady /
   fence-once-per-window protocol.
2. **Pallas DMA block-fetch curve.** A hard Mosaic/hardware fact shapes any
   DMA design: HBM refs are lane-tiled, and a DMA slice must be 128-lane
   aligned — the minimum HBM->VMEM copy is one 512 B tile row (= 64
   f32x2-feature table entries). So a "DMA gather" can only fetch random
   *64-entry blocks*, never single rows. The kernel scalar-prefetches
   random tile-row indices and issues ``block`` independent DMA
   descriptors per grid step (each ``rows_per_desc`` consecutive tile
   rows, landing straight in the output; one shared semaphore drained
   after issue), giving the descriptor-rate vs granule-size curve that
   locates the speed-of-light for ANY DMA-based gather.

Run on the real chip: ``python -m tools.bench_dma_gather``.
"""

from __future__ import annotations

import functools
import json
import sys
import time

LANES = 128


def make_dma_block_fetch(n_tile_rows: int, n_desc: int, block: int,
                         rows_per_desc: int = 1, unroll: int = 8):
    """Jitted Pallas block fetch: table (n_tile_rows, 128) f32 in HBM,
    idx (n_desc,) int32 tile-row indices -> (n_desc * rows_per_desc, 128)
    fetched tile rows."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_desc % block == 0, (n_desc, block)
    assert block % unroll == 0, (block, unroll)
    out_rows = block * rows_per_desc

    def kernel(idx_ref, table_ref, out_ref, sem):
        base = pl.program_id(0) * block

        def issue(j):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[base + j], rows_per_desc)],
                out_ref.at[pl.ds(j * rows_per_desc, rows_per_desc)],
                sem,
            ).start()

        def issue_group(g, _):
            j0 = g * unroll
            for u in range(unroll):  # unrolled: fori_loop carries real
                issue(j0 + u)        # per-iteration scalar overhead
            return 0

        jax.lax.fori_loop(0, block // unroll, issue_group, 0)

        def drain(j, _):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[base + j], rows_per_desc)],
                out_ref.at[pl.ds(j * rows_per_desc, rows_per_desc)],
                sem,
            ).wait()
            return 0

        jax.lax.fori_loop(0, block, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_desc // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table stays HBM
        out_specs=pl.BlockSpec(
            (out_rows, LANES), lambda i, *_: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    import jax.numpy as jnp

    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_desc * rows_per_desc, LANES), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(fn)


def _rate(fn, args, per_call: float, warm: int = 60, iters: int = 50):
    """(units/s, ms/call) with the repo's protocol: warm ``warm`` calls
    (transport ramp), then time ``iters`` calls with ONE value fetch."""
    import numpy as np

    out = None
    for _ in range(warm):
        out = fn(*args)
    np.asarray(out[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[:1])
    sec = (time.perf_counter() - t0) / iters
    return per_call / sec, sec * 1e3


def main() -> None:
    from atmonr_tpu.utils.compile_cache import enable

    enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

    T = 1 << 21  # table entries, 2 f32 features each
    F = 2
    N = 1 << 20  # row lookups per call (XLA variants)
    table = jax.random.normal(jax.random.PRNGKey(0), (T, F), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)
    results = []

    def record(name, rate, ms, unit="rows"):
        results.append({"name": name, f"{unit}_per_s": round(rate, 1),
                        "ms": round(ms, 3)})
        print(f"{name:34s} {rate / 1e6:9.2f} M {unit}/s  ({ms:.2f} ms)",
              flush=True)

    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    record("xla_take_f32", *_rate(take, (table, idx), N))
    record("xla_take_bf16", *_rate(take, (table.astype(jnp.bfloat16), idx), N))
    record("xla_take_f32_sorted", *_rate(take, (table, jnp.sort(idx)), N))

    # rows/s vs ROW WIDTH: same total bytes, wider rows, fewer of them. If
    # the rate is width-invariant, packing G adjacent entries per row cuts
    # the encode's fetch count (dense levels: corners (x, x+1) share a row)
    for g in (2, 8, 32, 64):  # g=64: the dense-tile row (512 B f32 / 256 B bf16)
        tg = table.reshape(T // g, g * F)
        ig = jax.random.randint(
            jax.random.PRNGKey(3), (N,), 0, T // g, jnp.int32
        )
        record(f"xla_take_f32_row{g * F * 4}B", *_rate(take, (tg, ig), N))
        record(
            f"xla_take_bf16_row{g * F * 2}B",
            *_rate(take, (tg.astype(jnp.bfloat16), ig), N),
        )

    # Pallas DMA block-fetch curve. Table viewed as 512 B tile rows (the
    # minimum legal HBM DMA slice): (T*F/128, 128) f32 = 64 entries/row.
    tile_rows = T * F // LANES
    table_tiles = table.reshape(tile_rows, LANES)
    total_tile_rows = 1 << 17  # 64 MB moved per call
    for rpd in (1, 4, 32):
        n_desc = total_tile_rows // rpd
        idx_t = jax.random.randint(
            jax.random.PRNGKey(2), (n_desc,), 0, tile_rows - rpd, jnp.int32
        )
        try:
            fn = make_dma_block_fetch(tile_rows, n_desc, 256, rows_per_desc=rpd)
            # correctness: every fetched tile row matches an XLA gather
            got = np.asarray(fn(idx_t, table_tiles))
            want = np.asarray(
                jnp.take(
                    table_tiles,
                    (np.asarray(idx_t)[:, None] + np.arange(rpd)).reshape(-1),
                    axis=0,
                )
            )
            ok = np.array_equal(got, want)
            rate, ms = _rate(fn, (idx_t, table_tiles), n_desc, warm=30,
                             iters=30)
            record(
                f"pallas_dma_{rpd}tile{'' if ok else '_WRONG'}",
                rate, ms, unit="desc",
            )
        except Exception as e:
            print(f"pallas_dma_{rpd}tile: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            print(f"pallas_dma_{rpd}tile: FAILED {type(e).__name__}",
                  flush=True)

    print(json.dumps({"table_rows": T, "n_lookups": N,
                      "tile_row_bytes": LANES * 4, "results": results}),
          flush=True)


if __name__ == "__main__":
    main()
