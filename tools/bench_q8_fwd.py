"""Microbench: q8 (2-entries-per-word) vs bf16 hash-encode forward.

Flagship scale: 2^13-entry levels, M = 8192 rays x 24 samples. The q8
scan covers 256 entries per 128-word chunk, so it runs half the chunk
steps of bf16 mode at the cost of a short per-corner unpack.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from atmonr_tpu.models.hash_grid import (
    HashGridConfig,
    _hash_encode_impl,
    init_hash_table,
)
from atmonr_tpu.ops.hash_gather_pallas import hash_encode_pallas_fwd, supported


def timed(fn, *args, iters=30, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out[0])  # row fetch: forces execution, tiny transfer
    print(f"  [{label}] compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(80):  # transport warm-up (docs/performance.md)
        out = fn(*args)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[0])
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
    assert supported(cfg, "q8")
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    # realistic trained-feature magnitudes, not the tiny init
    table = table + 0.05 * jax.random.normal(
        jax.random.PRNGKey(4), table.shape
    )
    m = 8192 * 24
    m_pad = -(-m // 4096) * 4096
    x = jax.random.uniform(jax.random.PRNGKey(1), (m_pad, 3))
    lookups = m_pad * cfg.n_levels * 8

    fns = {
        "bf16": jax.jit(lambda t, p: hash_encode_pallas_fwd(t, p, cfg, "bf16")),
        "q8": jax.jit(lambda t, p: hash_encode_pallas_fwd(t, p, cfg, "q8")),
    }
    exact = np.asarray(jax.jit(lambda t, p: _hash_encode_impl(t, p, cfg))(table, x))
    scale = np.abs(exact).max()
    for name, fn in fns.items():
        out = np.asarray(fn(table, x))
        err = np.abs(out - exact).max() / scale
        dt = timed(fn, table, x, label=name)
        print(
            f"{name:5s} {dt * 1e3:8.3f} ms  "
            f"({lookups / dt / 1e6:8.1f} M lookups/s)  rel_err {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
