"""Train-step throughput at the REFERENCE working point, through the real
Trainer step (gradient micro-batching included).

``configs/instant_ngp.json`` is the reference's own working point — 2^21
hash tables, 1024 uniform samples/ray, batch 8192 (8.4 M point evals and
1.07e9 table contributions per step; reference
``pipelines/instant_ngp.py:60-63``, ``configs/instant_ngp.json``). The
full 8192-ray jitted program lane-pads past 16 GB HBM on one chip, so the
Trainer scans ``micro_batch_size`` micro-batches inside the step (exactly
the full-batch gradient; tests/test_training.py) — this tool times that
step as the user would run it.

Usage: python -m tools.bench_ref_capacity [config=...] [iters=3] [warmup=2]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    from atmonr_tpu.utils.compile_cache import enable

    enable()

    import jax

    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.training import Trainer
    from atmonr_tpu.utils import load_config

    config_path = "configs/instant_ngp.json"
    iters, warmup = 3, 2
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        if k == "config":
            config_path = v
        elif k == "iters":
            iters = int(v)
        elif k == "warmup":
            warmup = int(v)

    cfg = load_config(config_path)
    granule = make_synthetic_granule(height=96, width=48, views_per_band=2)
    dataset = HARP2Dataset(cfg["dataset"], granule)
    pipe = get_pipeline(cfg["pipeline"], dataset)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(cfg["trainer"], dataset, pipe, "refcap", data_root=tmp)
        b = trainer.batch_size
        print(
            f"config={config_path} batch={b} micro={trainer.micro_batch} "
            f"samples={cfg['pipeline'].get('num_samples_per_ray')} "
            f"occ={'occupancy' in cfg['pipeline']}",
            flush=True,
        )
        from atmonr_tpu.data import batching

        perm = batching.epoch_permutation(
            jax.random.PRNGKey(0), trainer.num_rays, b
        )
        t0 = time.perf_counter()
        state, loss = trainer._train_step(trainer.state, trainer.rays, perm, 0, 0)
        print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
              f"loss={float(loss):.5f}", flush=True)
        for i in range(1, warmup):
            state, loss = trainer._train_step(state, trainer.rays, perm,
                                              i % trainer.steps_per_epoch, i)
        float(loss)
        t0 = time.perf_counter()
        for j in range(iters):
            i = (warmup + j) % trainer.steps_per_epoch
            state, loss = trainer._train_step(state, trainer.rays, perm, i,
                                              warmup + j)
        loss = float(loss)  # scalar fetch fences completion on this transport
        dt = (time.perf_counter() - t0) / iters
        print(
            f"steady step: {dt * 1e3:.0f} ms  {b / dt:.0f} rays/s  "
            f"loss={loss:.5f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
