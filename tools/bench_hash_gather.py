"""Microbench: Pallas chunked-VMEM hash gather vs XLA row gather on TPU.

Timings force a value fetch (np.asarray) — on the axon transport
block_until_ready can return early (docs/performance.md).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from atmonr_tpu.models.hash_grid import (
    HashGridConfig,
    _hash_encode_impl,
    hash_encode,
    init_hash_table,
)
from atmonr_tpu.ops.hash_gather_pallas import hash_encode_pallas_fwd, supported


def timed(fn, *args, iters=10, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0])  # compile + fetch
    print(f"  [{label}] compile+first run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0])
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
    assert supported(cfg)
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    m = 8192 * 128  # flagship work rate: B x N points
    x = jax.random.uniform(jax.random.PRNGKey(1), (m, 3))

    lookups = m * cfg.n_levels * 8

    xla = jax.jit(lambda t, p: _hash_encode_impl(t, p, cfg))
    t_xla = timed(xla, table, x, label="xla")
    print(f"XLA gather fwd:    {t_xla*1e3:8.2f} ms  "
          f"({lookups/t_xla/1e6:8.1f} M lookups/s)")

    pal = jax.jit(lambda t, p: hash_encode_pallas_fwd(t, p, cfg, mode="f32"))
    t_f32 = timed(pal, table, x, label="pallas-f32")
    print(f"Pallas f32 fwd:    {t_f32*1e3:8.2f} ms  "
          f"({lookups/t_f32/1e6:8.1f} M lookups/s)  {t_xla/t_f32:.1f}x")

    pal = jax.jit(lambda t, p: hash_encode_pallas_fwd(t, p, cfg, mode="bf16"))
    t_pal = timed(pal, table, x, label="pallas")
    print(f"Pallas gather fwd: {t_pal*1e3:8.2f} ms  "
          f"({lookups/t_pal/1e6:8.1f} M lookups/s)  {t_xla/t_pal:.1f}x")

    # correctness on-device
    a, b = np.asarray(xla(table, x)), np.asarray(pal(table, x))
    err = np.abs(a - b).max()
    print(f"max |diff| = {err:.3e}")


if __name__ == "__main__":
    main()
