"""Real multi-process (simulated multi-host) training smoke.

The other parallel tests shard over an in-process virtual mesh; this one
spawns REAL separate controllers (jax.distributed + Gloo CPU collectives)
via tools/multihost_smoke and checks the full stack across the process
boundary: host-local ray loading, the shard_map'd train step, collective
Orbax checkpointing, and process-0-gated logging. SURVEY §2b/§5 — the
distributed backend is green-field vs the single-GPU reference.
"""

import subprocess

import pytest
import sys


@pytest.mark.slow
def test_multihost_two_processes():
    # The coordination-service barrier can time out when the machine is
    # heavily loaded (e.g. the full suite + a TPU bench in parallel); that is
    # environment flake, not a product failure — retry once before failing.
    for attempt in range(2):
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "tools.multihost_smoke",
                "--num-processes",
                "2",
                "--devices-per-process",
                "2",
                "--timeout",
                "600",
            ],
            capture_output=True,
            text=True,
            timeout=700,
        )
        if proc.returncode == 0 or (
            attempt == 0 and "CoordinationService" in proc.stdout + proc.stderr
        ):
            if proc.returncode == 0:
                break
            continue
        break
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "multihost_smoke OK" in proc.stdout, proc.stdout
