"""Benchmark timing helpers shared by bench.py and tools/bench_*.

Two measurement traps on this PJRT transport (docs/performance.md):

- ``block_until_ready`` can return before execution completes, so a timing
  window must force a value fetch at its boundary;
- beyond first-compile, the first few hundred *dispatches of a process* run
  1.2-3x slow regardless of jit caching (tools/bench_variants.py measured
  the first timed run of a step at 61 ms/iter and every later run of the
  same jitted fn at 18 ms/iter).

``warm_until_steady`` addresses the second: it runs fixed-size blocks of
iterations until two consecutive blocks' wall times agree within ``tol``.
"""

from __future__ import annotations

import sys
import time
from typing import Callable


def warm_until_steady(
    one_iter: Callable[[int], object],
    fetch: Callable[[object], object],
    *,
    start_step: int = 0,
    block: int = 50,
    tol: float = 0.05,
    max_iters: int = 1200,
    on_block: Callable[[int, float], None] | None = None,
) -> int:
    """Run ``one_iter(step)`` in ``block``-sized chunks until the wall time
    of two consecutive chunks agrees within ``tol`` (or ``max_iters`` is
    reached). ``fetch`` must force the returned value (e.g. ``float`` on a
    loss) so the block boundary is a real sync point. ``on_block(n_iters,
    seconds)`` fires after every chunk — bench.py uses it to keep an
    improving provisional result on stdout in case the driver's window
    expires mid-warmup. Returns the next step index."""
    step = start_step
    prev = None
    out = None
    while step - start_step < max_iters:
        t0 = time.perf_counter()
        for _ in range(block):
            out = one_iter(step)
            step += 1
        fetch(out)
        dt = time.perf_counter() - t0
        print(
            f"[warmup] block ending at step {step}: {dt:.2f}s"
            f" ({dt / block * 1e3:.1f} ms/iter)",
            file=sys.stderr,
            flush=True,
        )
        if on_block is not None:
            on_block(block, dt)
        if prev is not None and abs(dt - prev) < tol * prev:
            break
        prev = dt
    return step


def timed_window(
    one_iter: Callable[[int], object],
    fetch: Callable[[object], object],
    *,
    start_step: int,
    iters: int,
) -> float:
    """Time ``iters`` iterations (one fetch at the end); returns seconds."""
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = one_iter(start_step)
        start_step += 1
    fetch(out)
    return time.perf_counter() - t0
