"""Extract a voxel grid from a trained neural rendering model (TPU).

CLI-compatible with the reference ``scripts/extract.py``: loads the trained
experiment's args/config, rebuilds the dataset, constructs the requested
extraction grid (l1c / voxelgrid / globalgrid / earthcare), batch-queries the
extinction field on device, and dumps to netCDF / OpenVDB.
"""

import argparse
import json
import warnings
from pathlib import Path
from types import SimpleNamespace

from atmonr_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

EARTH_RADIUS = 6.378e6


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp-name", type=str, required=True)
    parser.add_argument(
        "--coord-mode",
        type=str,
        required=True,
        help="'l1c', 'voxelgrid', 'globalgrid', or 'earthcare'.",
    )
    parser.add_argument("--extract-filename", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=32768)
    parser.add_argument("--min-alt", type=float)
    parser.add_argument("--max-alt", type=float)
    parser.add_argument("--alt-step", type=float, default=250.0)
    parser.add_argument("--horizontal-step", type=float, default=3000.0)
    parser.add_argument("--scale", type=float, default=100 / EARTH_RADIUS)
    parser.add_argument("--grid-res", type=float, default=0.025)
    parser.add_argument("--vstretch", type=float, default=12)
    parser.add_argument("--lon-crop", type=float, default=0.05)
    parser.add_argument("--earthcare-filename", type=str)
    parser.add_argument(
        "--earthcare-range",
        type=lambda s: [int(v) for v in s.split(",")],
    )
    parser.add_argument("--data-root", type=str, default="data")
    parser.add_argument(
        "--mesh",
        type=str,
        default=None,
        help="Device mesh spec 'data=N' or 'data=N,sample=M': shard the "
        "extraction query batches over all mesh devices (large globalgrid/"
        "fine-voxelgrid extractions are embarrassingly parallel).",
    )
    args = parser.parse_args()
    args.coord_mode = args.coord_mode.lower()
    assert args.alt_step > 0 and args.horizontal_step > 0
    assert args.scale > 0 and args.grid_res > 0 and args.vstretch >= 1
    if args.alt_step <= 50:
        warnings.warn(
            f"--alt-step {args.alt_step} is very low; extraction may be slow."
        )
    if args.horizontal_step <= 500:
        warnings.warn(
            f"--horizontal-step {args.horizontal_step} is very low; "
            "extraction may be slow."
        )
    return args


def main() -> None:
    args = parse_args()

    from atmonr_tpu.data.factory import BANDS, get_dataset
    from atmonr_tpu.extract import get_extract_dataset, run_extraction
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.training.checkpoint import restore_params

    output_path = Path(f"{args.data_root}/output/{args.exp_name}")
    train_args = SimpleNamespace(
        **json.load(open(output_path / "args.json"))
    )
    config = json.load(open(output_path / "config.json"))

    dataset = get_dataset(
        config["dataset"], train_args.scene_filename, args.data_root
    )
    extract_dataset = get_extract_dataset(
        args.coord_mode,
        dataset,
        alt_step=args.alt_step,
        min_alt=args.min_alt,
        max_alt=args.max_alt,
        horizontal_step=args.horizontal_step,
        scale=args.scale,
        grid_res=args.grid_res,
        vstretch=args.vstretch,
        lon_crop=args.lon_crop,
        earthcare_filename=args.earthcare_filename,
        earthcare_range=args.earthcare_range,
        data_root=args.data_root,
    )

    pipeline = get_pipeline(config["pipeline"], dataset)

    import jax

    params0 = pipeline.init_params(jax.random.PRNGKey(0))
    params = restore_params(output_path, params0)

    mesh = None
    if args.mesh:
        from atmonr_tpu.parallel.mesh import make_mesh_from_spec

        mesh = make_mesh_from_spec(args.mesh)

    sigma = run_extraction(
        pipeline, params, extract_dataset, args.batch_size, verbose=True,
        mesh=mesh,
    )
    extract_dataset.dump(output_path / args.extract_filename, sigma)
    print(f"wrote {output_path / args.extract_filename}")


if __name__ == "__main__":
    main()
