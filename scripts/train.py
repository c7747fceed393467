"""Train a neural rendering model to fit multi-angle satellite data (TPU).

CLI-compatible with the reference ``scripts/train.py`` (--exp-name,
--config-path, --scene-filename, --profile, --overwrite, --resume), with
additional TPU-scale flags: --mesh for multi-chip ray sharding and
--seed for reproducibility. ``--scene-filename synthetic[:HxWxV]`` runs
fully offline on a generated granule.
"""

import argparse
import json
import os
from pathlib import Path


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp-name", type=str, required=True)
    parser.add_argument("--config-path", type=str, required=True)
    parser.add_argument("--scene-filename", type=str, required=True)
    parser.add_argument(
        "--profile",
        action="store_true",
        help="Capture a jax.profiler trace of the first epoch (XProf).",
    )
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--mesh",
        type=str,
        default=None,
        help="Device mesh spec 'data=N' or 'data=N,sample=M' for multi-chip "
        "training (default: single device).",
    )
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="Multi-host: call jax.distributed.initialize() before backend "
        "init (coordinator/process env via standard JAX env vars); each "
        "host then feeds only its slice of the ray store.",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data-root", type=str, default="data")
    parser.add_argument(
        "--num-iters", type=float, default=None, help="Override trainer.num_iters."
    )
    return parser.parse_args()


def setup_dir(args: argparse.Namespace, config: dict) -> Path:
    output_path = Path(f"{args.data_root}/output/{args.exp_name}")
    if args.resume:
        assert output_path.exists()
    else:
        assert args.overwrite or not output_path.exists()
    os.makedirs(output_path, exist_ok=True)
    json.dump(vars(args), open(f"{output_path}/args.json", "w"), indent=4)
    json.dump(config, open(f"{output_path}/config.json", "w"), indent=4)
    return output_path


def main() -> None:
    args = parse_args()

    if args.distributed:
        from atmonr_tpu.parallel.mesh import initialize_distributed

        initialize_distributed()

    from atmonr_tpu.data.factory import get_dataset
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.training import Trainer
    from atmonr_tpu.utils import load_config

    config = load_config(args.config_path)
    if args.num_iters is not None:
        config["trainer"]["num_iters"] = args.num_iters
    output_path = setup_dir(args, config)

    dataset = get_dataset(config["dataset"], args.scene_filename, args.data_root)
    pipeline = get_pipeline(config["pipeline"], dataset)
    trainer = Trainer(
        config["trainer"],
        dataset,
        pipeline,
        args.exp_name,
        data_root=args.data_root,
        seed=args.seed,
    )

    if args.mesh:
        from atmonr_tpu.parallel.mesh import make_mesh_from_spec

        trainer.shard(make_mesh_from_spec(args.mesh))

    if args.resume:
        trainer.load(output_path)

    trainer.install_preemption_handler()
    trainer.train(output_path, profile=args.profile)


if __name__ == "__main__":
    main()
