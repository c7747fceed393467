"""Minimal repro of the r4 lax.map + dense-tile compile stall.

r4 observed that the dense-tile fetch inside a ``lax.map`` body stalls the
server-side TPU compile indefinitely (occ21 real-scale eval: a 4.2 M-point
aux-less forward chunks the encode through ``lax.map``, and with
``dense_tile`` active the mapped program never finished compiling), so
``hash_encode`` auto-gates the tiles off inside the chunked path
(models/hash_grid.py). This tool isolates the stall to its smallest form
and tests the fix hypothesis: the tile DERIVATION (64 strided slices +
stack per dense level, ``build_dense_tiles``) living inside the mapped
body is what XLA chokes on — hoisting the derived tiles out of the body
(they depend only on the table, a map constant) should compile fine.

Three cases, each compile-bounded by ``timeout_s`` in a subprocess-free
way (signal alarm around the first call):

  A. per-corner gather inside lax.map        (the shipped path — control)
  B. build_dense_tiles INSIDE the map body   (the r4 stall — expected hang)
  C. tiles built OUTSIDE, body only gathers  (the fix hypothesis)

Usage: python -m tools.repro_maptile_stall [timeout=240] [chunk=262144]
       [chunks=4] [levels=8] [skip=B]
"""

from __future__ import annotations

import signal
import sys
import time


class _CompileTimeout(Exception):
    pass


def _alarm(sig, frame):
    raise _CompileTimeout()


def main() -> None:
    from atmonr_tpu.utils.compile_cache import enable

    enable("/tmp/maptile_cache")

    import jax
    import jax.numpy as jnp

    from atmonr_tpu.models import hash_grid as hg

    timeout_s = 240
    chunk = 1 << 18
    n_chunks = 4
    n_levels = 8
    skip = set()
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        if k == "timeout":
            timeout_s = int(v)
        elif k == "chunk":
            chunk = int(v)
        elif k == "chunks":
            n_chunks = int(v)
        elif k == "levels":
            n_levels = int(v)
        elif k == "skip":
            skip = set(v.split(","))

    # the 2^21-config geometry trimmed to its first n_levels (7 dense at
    # the full config; growth 1.3819 from base 16)
    cfg = hg.HashGridConfig(
        n_dims=3,
        n_levels=n_levels,
        n_features_per_level=2,
        log2_hashmap_size=21,
        base_resolution=16,
        per_level_scale=1.3819,
        dense_tile="on",
    )
    cfg_off = hg.HashGridConfig(
        **{**cfg.__dict__, "dense_tile": "off"}
    )
    n_dense = sum(cfg.level_is_dense(l) for l in range(n_levels))
    print(
        f"levels={n_levels} ({n_dense} dense) chunk={chunk} x {n_chunks} "
        f"timeout={timeout_s}s",
        flush=True,
    )

    table = hg.init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (n_chunks, chunk, 3), dtype=jnp.float32
    )

    def mapped(body, xs):
        return jax.lax.map(body, xs).reshape(n_chunks * chunk, -1)

    def case_a(t, xs):  # control: per-corner gather in the body
        return mapped(lambda xc: hg._hash_encode_impl(t, xc, cfg_off), xs)

    def case_b(t, xs):  # r4 stall: tile build inside the body
        return mapped(lambda xc: hg._hash_encode_impl(t, xc, cfg), xs)

    def case_c(t, xs):  # fix hypothesis: tiles hoisted out of the body
        tiles = tuple(
            hg.build_dense_tiles(
                t[
                    cfg.level_offsets[l] : cfg.level_offsets[l]
                    + cfg.level_resolutions[l] ** 3
                ],
                cfg.level_resolutions[l],
                3,
            )
            if cfg.level_is_dense(l)
            else None
            for l in range(n_levels)
        )
        return mapped(
            lambda xc: hg._hash_encode_impl(t, xc, cfg, tiles=tiles), xs
        )

    signal.signal(signal.SIGALRM, _alarm)
    results = {}
    for name, fn in [("A", case_a), ("B", case_b), ("C", case_c)]:
        if name in skip:
            results[name] = "skipped"
            print(f"case {name}: skipped", flush=True)
            continue
        jitted = jax.jit(fn)
        t0 = time.perf_counter()
        try:
            signal.alarm(timeout_s)
            out = jitted(table, x)
            import numpy as np

            np.asarray(out[:1])  # force execution (transport fence)
            signal.alarm(0)
            dt = time.perf_counter() - t0
            results[name] = f"compiled+ran in {dt:.1f}s"
        except _CompileTimeout:
            results[name] = f"STALLED (> {timeout_s}s)"
        except Exception as e:  # noqa: BLE001
            signal.alarm(0)
            results[name] = f"ERROR {type(e).__name__}: {e}"
        print(f"case {name}: {results[name]}", flush=True)

    print(results)


if __name__ == "__main__":
    main()
