"""Microbench: hash-encode forward vs forward+backward at flagship scale.

Isolates the sorted segment-sum gradient cost (docs/performance.md) —
the target of the next backward kernel. Timings force a value fetch.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from atmonr_tpu.models.hash_grid import (
    HashGridConfig,
    hash_encode,
    init_hash_table,
)


def timed(fn, *args, iters=10, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    cfg = HashGridConfig(
        n_dims=3,
        n_levels=16,
        n_features_per_level=2,
        log2_hashmap_size=15,
        base_resolution=16,
        per_level_scale=1.3819,
    )
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    m = 8192 * 128
    x = jax.random.uniform(jax.random.PRNGKey(1), (m, 3))

    fwd = jax.jit(lambda t, p: hash_encode(t, p, cfg).sum())
    t_f = timed(fwd, table, x, label="fwd")
    print(f"fwd only:    {t_f*1e3:8.2f} ms")

    both = jax.jit(jax.grad(lambda t, p: hash_encode(t, p, cfg).sum()))
    t_b = timed(both, table, x, label="fwd+bwd")
    print(f"fwd+bwd:     {t_b*1e3:8.2f} ms   (bwd ~ {(t_b-t_f)*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
