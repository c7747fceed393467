"""Test configuration: force an 8-virtual-device CPU platform.

Tests exercise multi-chip sharding logic on a virtual CPU mesh (the driver
separately dry-runs the multi-chip path) and keep the real TPU free for
benchmarks. NOTE: this container's ``sitecustomize`` registers the axon TPU
PJRT plugin at interpreter startup and overwrites ``jax_platforms``, so
setting the env var is not enough — we must update the jax config after
import, before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA:CPU compilation cache: the suite is compile-dominated
# (dozens of jitted programs; shard_map parity tests cost 30-90 s each
# cold), and cache keys include source line numbers, so entries invalidate
# precisely when the traced code changes. A committed warm cache makes an
# unchanged checkout's suite minutes faster; after edits the affected
# programs just recompile.
from atmonr_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache(cache_dir=str(__import__("pathlib").Path(__file__).parent.parent / ".jax_cache_cpu"))
