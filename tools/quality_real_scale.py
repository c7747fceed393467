"""Quality A/B at REAL-GRANULE scale (VERDICT r3 item 1).

The r3 quality matrix proved the flagship's matched-wall-clock dominance on
48x96-pixel synthetic granules only; the reference's whole purpose is
full-granule reconstruction (457x457 pixels x 90 views, all rays resident —
reference datasets/harp2.py:119-124, README 32 GB envelope). This harness
runs the same matched-wall-clock protocol on a real-schema granule at that
scale: one 14.6 M-ray dataset built through the production reader + C++ ray
builder, shared across every cell; each cell trains a variant for the same
chip-seconds and scores deterministic PSNR/SSIM over ALL rays.

Variants: the flagship (occ13), the reference's sampling strategy
(uniform128), and the reference-capacity occ21. Scene: the multi-scale
broken-cloud field (blob count scaled to the swath area so texture density
matches the 48x96 "hard" scene).

Results stream to a JSONL (resumable); summary prints at the end.

Usage: python -m tools.quality_real_scale [budget=300] [seeds=0,1,2]
           [height=457] [width=457] [blobs=1800] [variants=...] [out=...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from ab_importance import run  # noqa: E402

VARIANTS = {
    "uniform128": "configs/instant_ngp_tpu.json",
    "occ13_32p24f": "configs/instant_ngp_tpu_occ13.json",
    "occ13_q8": "configs/instant_ngp_tpu_occ13_q8.json",
    "occ13_q8sr": "configs/instant_ngp_tpu_occ13_q8sr.json",
    "occ21": "configs/instant_ngp_occ21.json",
    "occ21_pb": "configs/instant_ngp_occ21_pb.json",
}
MAX_ITERS = 500_000  # the wall-clock budget is the real stop


def main() -> None:
    from atmonr_tpu.utils.compile_cache import enable

    enable()

    from atmonr_tpu.data.factory import get_dataset
    from atmonr_tpu.data.synthetic import write_granule_l1b_real_schema
    from atmonr_tpu.utils import load_config

    budget = 300.0
    seeds = [0, 1, 2]
    height = width = 457
    # hard-scene defaults: the first r4 run (1800 blobs to 0.5 width,
    # noise 0.01) saturated at the 43.5 dB noise ceiling — uniform128 and
    # the flagship tied at 12.5x different iteration counts. Structure
    # must limit the score: smaller cells, more of them, 5x less noise
    # (ceiling ~57 dB).
    blobs = 4000
    blob_max = 0.15  # ~34 px max cell width at 457
    noise = 0.002
    out_path = Path("docs/quality_real_scale.jsonl")
    names = list(VARIANTS)
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        if k == "budget":
            budget = float(v)
        elif k == "seeds":
            seeds = [int(s) for s in v.split(",")]
        elif k == "height":
            height = int(v)
        elif k == "width":
            width = int(v)
        elif k == "blobs":
            blobs = int(v)
        elif k == "blob_max":
            blob_max = float(v)
        elif k == "noise":
            noise = float(v)
        elif k == "out":
            out_path = Path(v)
        elif k == "variants":
            names = v.split(",")

    scene_tag = (
        f"real_scale_{height}x{width}_b{blobs}_w{blob_max:g}_n{noise:g}"
    )
    done = set()
    if out_path.exists():
        for line in out_path.read_text().splitlines():
            r = json.loads(line)
            done.add((r["name"], r["seed"], r["scene"]))
    out_path.parent.mkdir(parents=True, exist_ok=True)

    # one real-scale granule + dataset, shared by every cell (the dataset
    # section is identical across the three configs; asserted below)
    cache = Path(f"/tmp/qrs_granule_{scene_tag}")
    name_nc = "PACE_HARP2.20240101T000000.L1B.V3.SYNTHETIC.nc"
    granule_path = cache / "HARP2" / name_nc
    if not granule_path.exists():
        granule_path.parent.mkdir(parents=True, exist_ok=True)
        t0 = time.perf_counter()
        write_granule_l1b_real_schema(
            granule_path, height=height, width=width, n_blobs=blobs,
            blob_max=blob_max, noise=noise,
        )
        print(f"[granule written in {time.perf_counter() - t0:.1f}s]",
              flush=True)
    cfgs = {n: load_config(VARIANTS[n]) for n in names}
    ds_cfgs = [json.dumps(c["dataset"], sort_keys=True) for c in cfgs.values()]
    assert len(set(ds_cfgs)) == 1, "variants disagree on the dataset config"
    t0 = time.perf_counter()
    ds = get_dataset(next(iter(cfgs.values()))["dataset"], name_nc,
                     data_root=cache)
    print(f"[dataset: {ds.num_rays / 1e6:.1f} M rays built in "
          f"{time.perf_counter() - t0:.1f}s]", flush=True)

    with open(out_path, "a") as f:
        for name in names:
            for seed in seeds:
                if (name, seed, scene_tag) in done:
                    continue
                r = run(
                    name,
                    VARIANTS[name],
                    MAX_ITERS,
                    seed=seed,
                    seconds=budget,
                    dataset=ds,
                )
                r["scene"] = scene_tag
                r["budget_s"] = budget
                r["num_rays"] = int(ds.num_rays)
                f.write(json.dumps(r) + "\n")
                f.flush()

    rows = [
        json.loads(ln)
        for ln in out_path.read_text().splitlines()
        if json.loads(ln)["scene"] == scene_tag
    ]
    print(f"\n== real-granule scale, {budget:.0f}s/cell, seeds {seeds} ==")
    for name in names:
        cells = [r for r in rows if r["name"] == name]
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
