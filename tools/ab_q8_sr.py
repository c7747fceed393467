"""Seed-swept A/B: does stochastic rounding fix q8's quality floor?

docs/performance.md records two facts this tool is built around:
(1) q8 training costs PSNR (smooth scene 47.9 -> 42.6, hard 50.1 -> 48.7)
    and the loss is in the trained weights, not eval noise;
(2) single-run PSNR at 3000 iters is RNG-noise-dominated (+-3-5 dB across
    PRNG stream layouts), so any q8 follow-up needs >=3-seed means per cell.

Cells: bf16 flagship (instant_ngp_tpu_occ13), q8 deterministic rounding
(.._q8), q8 stochastic rounding (.._q8sr) — all sharing the
tools/ab_importance.py harness so the streams are identical within a seed.

Usage: python tools/ab_q8_sr.py [hard] [seeds=0,1,2] [iters=3000]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ab_importance import run  # noqa: E402

VARIANTS = {
    "bf16": "configs/instant_ngp_tpu_occ13.json",
    "q8det": "configs/instant_ngp_tpu_occ13_q8.json",
    "q8sr": "configs/instant_ngp_tpu_occ13_q8sr.json",
}


def main() -> None:
    argv = sys.argv[1:]
    n_blobs = 1
    if "hard" in argv:
        argv.remove("hard")
        n_blobs = 40
    seeds = [0, 1, 2]
    iters = 3000
    for a in list(argv):
        if a.startswith("seeds="):
            seeds = [int(s) for s in a.split("=", 1)[1].split(",")]
            argv.remove(a)
        elif a.startswith("iters="):
            iters = int(a.split("=", 1)[1])
            argv.remove(a)
    names = argv or list(VARIANTS)

    table: dict[str, list[float]] = {}
    for seed in seeds:  # seed-major: an interrupted sweep still covers cells
        for name in names:
            psnr = run(name, VARIANTS[name], iters, n_blobs=n_blobs, seed=seed)["psnr"]
            table.setdefault(name, []).append(psnr)
    scene = "hard" if n_blobs > 1 else "smooth"
    print(f"== {scene} scene, {iters} iters, seeds {seeds} ==", flush=True)
    for name, vals in table.items():
        print(
            f"{name}: mean PSNR {np.mean(vals):.2f} +- {np.std(vals):.2f} "
            f"({', '.join(f'{v:.2f}' for v in vals)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
