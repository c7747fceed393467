"""Diagnostic: forward kernel block-size sweep (live-state pressure).

Monkeypatches hash_gather_pallas._BLOCK_POINTS / _UNROLL and times the
full forward at flagship scale for bf16 and q8 modes.
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
    cfg = HashGridConfig(
        n_dims=3,
        n_levels=16,
        n_features_per_level=2,
        log2_hashmap_size=13,
        base_resolution=16,
        per_level_scale=1.3819,
    )
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    m_pad = 8192 * 24
    x = jax.random.uniform(jax.random.PRNGKey(1), (m_pad, 3))

    for mode in ("bf16", "q8"):
        for block in (512, 1024, 2048, 4096):
            for unroll in (8, 32):
                hgp._BLOCK_POINTS = block
                hgp._UNROLL = unroll
                fn = jax.jit(
                    lambda t, p, mode=mode: hgp.hash_encode_pallas_fwd(
                        t, p, cfg, mode
                    )
                )
                try:
                    dt = timed(fn, table, x)
                    print(
                        f"{mode:5s} block={block:5d} unroll={unroll:2d}: "
                        f"{dt * 1e3:8.3f} ms",
                        flush=True,
                    )
                except Exception as e:  # noqa: BLE001
                    print(f"{mode:5s} block={block:5d} unroll={unroll:2d}: "
                          f"FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
