"""Persistent XLA compilation cache, shared by bench.py and the CLIs.

First-compile of the full Instant-NGP train step costs minutes of wall
time on the TPU backend; the driver's bench window cannot afford it
(round 1's official bench record timed out inside compile). JAX's
persistent compilation cache removes that cost across processes: the
first run populates ``<repo>/.jax_cache`` and every later run of the
same jitted program deserializes the compiled executable in under a
second (measured on this axon PJRT backend: 3.2 s compile -> 0.44 s
cache hit for a 20-matmul probe).

The cache directory lives inside the repo and is committed, so a fresh
checkout on the same machine/backend starts warm. Entries are keyed on
the HLO + compile options + backend version, so a stale entry is a miss,
never a wrong result.
"""

from __future__ import annotations

import pathlib

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]


def enable(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent).

    Returns the cache directory used. Safe to call before or after
    backend initialization; must be called before the first jit
    compilation to benefit it.
    """
    import jax

    path = cache_dir or str(_REPO_ROOT / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that takes noticeable compile time; the repo-local
    # dir is small and git keeps it bounded by review.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
