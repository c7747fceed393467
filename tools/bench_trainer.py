"""Benchmark the PRODUCTION Trainer path against the bare-step headline.

bench.py times a hand-rolled jitted step; the Trainer's step additionally
carries the pred-pixel progress scatter, the per-band prediction gathers,
the generator yield, running-loss bookkeeping, and (per epoch) the
device->host metrics sync (PSNR/SSIM + 4-panel image). This tool drives
``Trainer.iterate`` on the flagship config at steady state and reports:

- ``in_epoch_rays_per_s``   — steps strictly inside an epoch (the number
  comparable to bench.py's bare step),
- ``overall_rays_per_s``    — including the epoch-boundary sync at THIS
  granule's steps/epoch,
- ``epoch_sync_s``          — the measured per-epoch boundary cost,
- ``real_scale_rays_per_s`` — overall rate projected to the real-granule
  epoch length (14.6 M rays / 8192 = 1787 steps/epoch), where the sync
  amortizes away.

Usage: python -m tools.bench_trainer [height=384] [width=96] [epochs=8]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path


def main() -> None:
    from atmonr_tpu.utils.compile_cache import enable

    enable()

    import numpy as np

    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.training import Trainer
    from atmonr_tpu.utils import load_config

    height, width, epochs = 384, 96, 8
    config_path = "configs/instant_ngp_tpu_occ13.json"
    pf = None  # print_frequency override (isolates logging-sync cost)
    progress = None  # progress=0 drops the per-band gathers + pred scatters
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        if k == "height":
            height = int(v)
        elif k == "width":
            width = int(v)
        elif k == "epochs":
            epochs = int(v)
        elif k == "config":
            config_path = v
        elif k == "pf":
            pf = int(v)
        elif k == "progress":
            progress = bool(int(v))

    t0 = time.perf_counter()
    cfg = load_config(config_path)
    granule = make_synthetic_granule(
        height=height, width=width, views_per_band=2
    )
    ds = HARP2Dataset(cfg["dataset"], granule)
    pipe = get_pipeline(cfg["pipeline"], ds)
    tmp = Path(tempfile.mkdtemp(prefix="bench_trainer_"))
    tcfg = dict(cfg["trainer"], num_iters=10**9)
    if pf is not None:
        tcfg["print_frequency"] = pf
    if progress is not None:
        tcfg["progress"] = progress
    trainer = Trainer(tcfg, ds, pipe, "bench_trainer", data_root=tmp)
    b = trainer.batch_size
    spe = trainer.steps_per_epoch
    print(
        f"[setup +{time.perf_counter() - t0:.1f}s] {ds.num_rays} rays, "
        f"batch {b}, {spe} steps/epoch",
        file=sys.stderr,
        flush=True,
    )

    def fence() -> None:
        # value fetch, not block_until_ready: on this transport the latter
        # can return before execution completes (verify skill). The pred
        # buffers are outputs of the same donated step executable.
        np.asarray(trainer.state["pred_pixels"][:1])

    gen = trainer.iterate(tmp / "out")
    # warm-up: compile + transport ramp (bench.py warms in blocks until two
    # agree; 3 full epochs is comfortably past that at spe >= 30)
    t0 = time.perf_counter()
    warm = 3 * spe
    for _ in range(warm):
        next(gen)
    fence()
    print(
        f"[warmup +{time.perf_counter() - t0:.1f}s] {warm} steps done",
        file=sys.stderr,
        flush=True,
    )

    in_epoch_s = 0.0
    in_epoch_iters = 0
    t_all = time.perf_counter()
    for _ in range(epochs):
        # we are at an epoch boundary (multiple of spe since warm % spe == 0)
        next(gen)  # first step of the epoch (absorbs any boundary slack)
        fence()
        t1 = time.perf_counter()
        for _ in range(spe - 2):
            next(gen)
        fence()
        in_epoch_s += time.perf_counter() - t1
        in_epoch_iters += spe - 2
        next(gen)  # last step of the epoch; its yield precedes the sync
    fence()
    overall_s = time.perf_counter() - t_all

    in_epoch = b * in_epoch_iters / in_epoch_s
    overall = b * epochs * spe / overall_s
    # per-epoch boundary cost: everything the in-epoch windows didn't cover
    # beyond their own steps' share
    step_s = in_epoch_s / in_epoch_iters
    epoch_sync_s = max(0.0, overall_s / epochs - spe * step_s)
    real_spe = 14_600_000 // b
    real_scale = b / (step_s + epoch_sync_s / real_spe)

    report = {
        "config": config_path,
        "progress": bool(trainer.progress),
        "num_rays": int(ds.num_rays),
        "batch_size": int(b),
        "steps_per_epoch": int(spe),
        "epochs_timed": epochs,
        "in_epoch_rays_per_s": round(in_epoch, 1),
        "overall_rays_per_s": round(overall, 1),
        "epoch_sync_s": round(epoch_sync_s, 3),
        "real_scale_steps_per_epoch": int(real_spe),
        "real_scale_rays_per_s": round(real_scale, 1),
    }
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
