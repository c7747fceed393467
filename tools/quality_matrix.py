"""Seed-swept quality matrix at MATCHED WALL-CLOCK (VERDICT r1 item 2).

Every flagship-defining adoption decision re-examined on equal chip time:
seeds x variants x scenes, each cell trained for the same wall-clock budget
(compile excluded), deterministic PSNR/SSIM eval. Results stream to a JSONL
(resumable: completed cells are skipped on rerun) and the final mean +- std
table prints at the end for docs/performance.md.

Usage:
    python -m tools.quality_matrix [budget=60] [seeds=0,1,2] [out=...]
        [variants=a,b,...]   # subset of VARIANTS
        [scenes=smooth,hard] # subset of SCENES (long-budget runs use hard)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from ab_importance import run  # noqa: E402

VARIANTS = {
    "uniform128": "configs/instant_ngp_tpu.json",
    "occ15_64p32f": "configs/instant_ngp_tpu_occ.json",
    # the living flagship config: r4 made it the guarded occ13, r5 adopted
    # q8sr tables into it. Historical row reproducibility: pre-guard rows
    # via occ13_noclip, pre-q8sr (bf16-table) rows via occ13_bf16
    "occ13_32p24f": "configs/instant_ngp_tpu_occ13.json",
    "occ13_bf16": "configs/instant_ngp_tpu_occ13_bf16.json",
    # flagship + softplus density activation (seed-4 collapse guard A/B)
    "occ13_sp": "configs/instant_ngp_tpu_occ13_sp.json",
    # flagship + quiet surface-head init (seed-4 collapse guard A/B)
    "occ13_qh": "configs/instant_ngp_tpu_occ13_qh.json",
    # flagship + restart-on-plateau (the adoptable collapse guard:
    # detect the constant-image loss floor at iter 150, re-draw the init)
    "occ13_rs": "configs/instant_ngp_tpu_occ13_rs.json",
    # ADVICE r4: configs/instant_ngp_tpu_occ13_clip.json is now byte-
    # identical to the flagship (the guard was adopted), so the old
    # "occ13_clip" variant is an alias of occ13_32p24f and was dropped;
    # the unguarded arm of the guard A/B is occ13_noclip
    "occ13_noclip": "configs/instant_ngp_tpu_occ13_noclip.json",
    "occ13_q8": "configs/instant_ngp_tpu_occ13_q8.json",
    "occ13_q8sr": "configs/instant_ngp_tpu_occ13_q8sr.json",
    # reference table capacity (2^21) with the TPU occupancy sampler — at
    # matched wall-clock the reference's own uniform-1024 config manages
    # only ~4 iterations/minute (498 rays/s), so occ21 is the only
    # trainable configuration at this capacity on one chip
    "occ21": "configs/instant_ngp_occ21.json",
    # occ21 + pair-bucket hashed-level storage (models/hash_grid.py
    # hashed_tile): 8 corner fetches -> 1 per hashed level, but a changed
    # collision structure — the quality A/B here is the adoption evidence
    "occ21_pb": "configs/instant_ngp_occ21_pb.json",
}
SCENES = {"smooth": 1, "hard": 40}
MAX_ITERS = 200_000  # the wall-clock budget is the real stop


def main() -> None:
    from atmonr_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache("/tmp/qmatrix_cache")  # cells re-jit per run(); hit here

    budget = 60.0
    seeds = [0, 1, 2]
    out_path = Path("docs/quality_matrix.jsonl")
    names = list(VARIANTS)
    scenes = dict(SCENES)
    for a in list(sys.argv[1:]):
        k, _, v = a.partition("=")
        if k == "budget":
            budget = float(v)
        elif k == "seeds":
            seeds = [int(s) for s in v.split(",")]
        elif k == "out":
            out_path = Path(v)
        elif k == "variants":
            names = v.split(",")
        elif k == "scenes":
            scenes = {s: SCENES[s] for s in v.split(",")}

    done = set()
    if out_path.exists():
        for line in out_path.read_text().splitlines():
            r = json.loads(line)
            # budget is part of the cell identity: one jsonl may carry
            # several matched-wall-clock tiers (e.g. 60 s and 300 s)
            done.add((r["name"], r["scene"], r["seed"], r.get("budget_s")))
    out_path.parent.mkdir(parents=True, exist_ok=True)

    # variant-major: all cells of one config run back-to-back so its 3-7 min
    # server-side compile is paid once per (variant, scene-shape) pair
    with open(out_path, "a") as f:
        for name in names:
            for scene, n_blobs in scenes.items():
                for seed in seeds:
                    if (name, scene, seed, budget) in done:
                        continue
                    r = run(
                        name,
                        VARIANTS[name],
                        MAX_ITERS,
                        n_blobs=n_blobs,
                        seed=seed,
                        seconds=budget,
                    )
                    r["scene"] = scene
                    r["budget_s"] = budget
                    f.write(json.dumps(r) + "\n")
                    f.flush()

    rows = [json.loads(ln) for ln in out_path.read_text().splitlines()]
    print(f"\n== matched wall-clock {budget:.0f}s/cell, seeds {seeds} ==")
    for scene in scenes:
        print(f"-- {scene} scene --")
        for name in names:
            cells = [
                r
                for r in rows
                if r["name"] == name
                and r["scene"] == scene
                and r.get("budget_s") == budget
            ]
            if not cells:
                continue
            p = [r["psnr"] for r in cells]
            s = [r["ssim"] for r in cells]
            it = [r["iters"] for r in cells]
            print(
                f"{name:14s} PSNR {np.mean(p):6.2f} +- {np.std(p):4.2f}  "
                f"SSIM {np.mean(s):.4f} +- {np.std(s):.4f}  "
                f"(~{np.mean(it):.0f} iters/cell, n={len(p)})",
                flush=True,
            )


if __name__ == "__main__":
    main()
