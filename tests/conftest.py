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
