"""Diagnostic: forward kernel time vs table size and level count.

Separates per-chunk scan cost (scales with table size) from per-corner
fixed cost (scales with n_levels only).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from atmonr_tpu.models.hash_grid import HashGridConfig, init_hash_table
from atmonr_tpu.ops import hash_gather_pallas as hgp


def timed(fn, *args, iters=50):
    out = fn(*args)
    np.asarray(out[0])
    for _ in range(80):
        out = fn(*args)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[0])
    return (time.perf_counter() - t0) / iters


def main():
    m_pad = 8192 * 24
    x = jax.random.uniform(jax.random.PRNGKey(1), (m_pad, 3))

    for log2 in (10, 11, 12, 13, 14, 15):
        cfg = HashGridConfig(
            n_dims=3,
            n_levels=16,
            n_features_per_level=2,
            log2_hashmap_size=log2,
            base_resolution=16,
            per_level_scale=1.3819,
        )
        table = init_hash_table(jax.random.PRNGKey(0), cfg)
        dt = timed(
            jax.jit(lambda t, p, c=cfg: hgp.hash_encode_pallas_fwd(t, p, c, "bf16")),
            table,
            x,
        )
        print(f"bf16 log2={log2}: {dt * 1e3:8.3f} ms", flush=True)

    for n_levels in (4, 8, 16):
        cfg = HashGridConfig(
            n_dims=3,
            n_levels=n_levels,
            n_features_per_level=2,
            log2_hashmap_size=13,
            base_resolution=16,
            per_level_scale=1.3819,
        )
        table = init_hash_table(jax.random.PRNGKey(0), cfg)
        dt = timed(
            jax.jit(lambda t, p, c=cfg: hgp.hash_encode_pallas_fwd(t, p, c, "bf16")),
            table,
            x,
        )
        print(f"bf16 levels={n_levels}: {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
