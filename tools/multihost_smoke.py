"""Multi-host training smoke: N real processes, one global device mesh.

The reference is strictly single-process/single-GPU (reference
scripts/train.py:94); this framework's pod path is `jax.distributed` +
host-local ray loading (`parallel/data.py`) + shard_map'd train steps. The
unit tests exercise the sharding math on a virtual in-process mesh, but the
process boundary itself — Gloo/ICI collectives between controllers, every
host materializing only its ray rows, collective Orbax checkpointing,
process-0-gated logging — only exists with real multiple processes. This
tool spawns N local CPU controllers and runs the REAL stack end-to-end:

  per process: jax.distributed.initialize -> HARP2Dataset(synthetic granule)
    -> Instant-NGP pipeline (occupancy grid on) -> Trainer.shard(mesh over
    all global devices, data x sample) -> train (collective checkpoint at
    each epoch) -> print a params digest -> fresh Trainer.load -> resume
    digest

and verifies every process computed the bitwise-identical replicated
parameters (the gradient all-reduce and optimizer step are deterministic),
wrote exactly one metrics.jsonl, and restored the same state.

Usage:
    python -m tools.multihost_smoke                 # 2 processes x 4 devices
    python -m tools.multihost_smoke --num-processes 4 --devices-per-process 2
"""

from __future__ import annotations

import argparse
import hashlib
import os
import socket
import subprocess
import sys
import tempfile


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def worker(args: argparse.Namespace) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import numpy as np

    from __graft_entry__ import DATASET_CONFIG, _tiny_ngp_config
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.parallel.mesh import make_mesh
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.training import Trainer

    n_dev = jax.device_count()
    assert n_dev == args.num_processes * args.devices_per_process, (
        n_dev,
        jax.local_device_count(),
        os.environ.get("JAX_PLATFORMS"),
        os.environ.get("XLA_FLAGS"),
        jax.devices(),
    )
    sample = 2 if n_dev % 2 == 0 else 1
    mesh = make_mesh(data=n_dev // sample, sample=sample)

    granule = make_synthetic_granule(height=16, width=8, views_per_band=2)
    dataset = HARP2Dataset(DATASET_CONFIG, granule)
    pipe = get_pipeline(_tiny_ngp_config(num_samples=16, occupancy=True), dataset)
    trainer_cfg = {
        "batch_size": 16 * mesh.shape["data"],
        "num_iters": 6,
        "print_frequency": 2,
        "optimizer": {
            "type": "AdamW",
            "lr": 1e-2,
            "betas": [0.9, 0.99],
            "eps": 1e-15,
            "weight_decay": 1e-2,
        },
        "scheduler": {
            "type": "fixed",
            "gamma": 0.33,
            "decay_start": 4,
            "decay_interval": 2,
        },
    }
    trainer = Trainer(
        trainer_cfg, dataset, pipe, "mh_smoke", data_root=args.workdir
    )
    trainer.shard(mesh)
    out = os.path.join(args.workdir, "output", "mh_smoke")
    trainer.train(out)

    def digest(state) -> str:
        leaves = jax.tree_util.tree_leaves_with_path(state["params"])
        h = hashlib.sha256()
        for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
            h.update(str(path).encode())
            h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
        return h.hexdigest()

    print(f"DIGEST {digest(trainer.state)}", flush=True)

    # collective restore into a fresh Trainer (the --resume path)
    trainer2 = Trainer(
        trainer_cfg, dataset, pipe, "mh_smoke_resume", data_root=args.workdir
    )
    trainer2.shard(mesh)
    trainer2.load(out)
    assert trainer2.iter_count == trainer.iter_count, (
        trainer2.iter_count,
        trainer.iter_count,
    )
    print(f"RESUME_DIGEST {digest(trainer2.state)}", flush=True)


def parent(args: argparse.Namespace) -> None:
    port = _free_port()
    workdir = tempfile.mkdtemp(prefix="mh_smoke_")
    procs = []
    for pid in range(args.num_processes):
        env = dict(os.environ)
        # do NOT set JAX_PLATFORMS=cpu here: this container's sitecustomize
        # registers the axon TPU plugin at startup and the env var makes it
        # drop the forced CPU device count; the worker selects the CPU
        # platform via jax.config.update after import (same pattern as
        # tests/conftest.py)
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices_per_process}"
        ).strip()
        env["PYTHONPATH"] = os.getcwd()
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "tools.multihost_smoke",
                    "--process-id",
                    str(pid),
                    "--port",
                    str(port),
                    "--workdir",
                    workdir,
                    "--num-processes",
                    str(args.num_processes),
                    "--devices-per-process",
                    str(args.devices_per_process),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
        )
    outputs = []
    ok = True
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
            print(f"process {pid}: TIMEOUT after {args.timeout}s")
        outputs.append(out)
        if p.returncode != 0:
            ok = False
            print(f"process {pid}: exit {p.returncode}")
    if not ok:
        for pid, out in enumerate(outputs):
            print(f"--- process {pid} ---\n{out}")
        sys.exit(1)

    def grab(tag: str, out: str) -> str:
        lines = [l for l in out.splitlines() if l.startswith(tag + " ")]
        assert len(lines) == 1, (tag, out)
        return lines[0].split()[1]

    digests = [grab("DIGEST", o) for o in outputs]
    resumed = [grab("RESUME_DIGEST", o) for o in outputs]
    assert len(set(digests)) == 1, f"params diverged across processes: {digests}"
    assert len(set(resumed)) == 1, f"restore diverged across processes: {resumed}"
    # epoch metrics lines appear exactly once (process-0-gated logging)
    narr = sum(o.count("PSNR_mean") for o in outputs)
    epochs = outputs[0].count("PSNR_mean")
    assert narr == epochs and epochs > 0, (narr, epochs)
    import glob

    jsonls = glob.glob(os.path.join(workdir, "tensorboard", "*", "metrics.jsonl"))
    assert len(jsonls) == 2, jsonls  # one per Trainer ctor, process 0 only
    print(
        f"multihost_smoke OK: {args.num_processes} processes x "
        f"{args.devices_per_process} devices, params bitwise-identical, "
        f"collective checkpoint restored, digest {digests[0][:16]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    if args.process_id is None:
        parent(args)
    else:
        worker(args)


if __name__ == "__main__":
    main()
