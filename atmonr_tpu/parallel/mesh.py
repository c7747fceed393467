"""Device meshes for pod-scale training.

The workload has two natural parallel axes (SURVEY §2b):

- ``data``: rays are i.i.d. — shard the granule's ray arrays across
  chips/hosts (the DP axis; parameter grads all-reduce over ICI);
- ``sample``: the 1024-samples-per-ray inner dimension is this workload's
  "sequence" — shard it and combine per-shard compositing partials
  (the SP/CP analog; see ``atmonr_tpu.parallel.sharding``).

The reference has no distributed code at all (scripts/train.py:94); this
module is green-field TPU design, not a port.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int | None = None, sample: int = 1, devices=None) -> Mesh:
    """Build a (data, sample) mesh over the available devices.

    ``data=None`` uses all remaining devices on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % sample == 0, (n, sample)
        data = n // sample
    assert data * sample <= n, f"mesh {data}x{sample} needs > {n} devices"
    dev_array = np.asarray(devices[: data * sample]).reshape(data, sample)
    return Mesh(dev_array, ("data", "sample"))


def make_mesh_from_spec(spec: str, devices=None) -> Mesh:
    """Parse 'data=N' / 'data=N,sample=M' into a Mesh."""
    axes = {"data": None, "sample": 1}
    for part in spec.split(","):
        k, v = part.split("=")
        k = k.strip()
        if k not in axes:
            raise ValueError(f"unknown mesh axis {k!r} (use data/sample)")
        axes[k] = int(v)
    return make_mesh(data=axes["data"], sample=axes["sample"], devices=devices)


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` (ICI within a
    slice, DCN across slices). No-op if already initialized."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized
