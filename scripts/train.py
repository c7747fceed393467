"""Train a neural rendering model to fit multi-angle satellite data (TPU).

CLI-compatible with the reference ``scripts/train.py`` (--exp-name,
--config-path, --scene-filename, --profile, --overwrite, --resume), with
additional TPU-scale flags: --mesh for multi-chip ray sharding,
--check-numerics for checkify NaN/inf trapping, and --seed for
reproducibility. ``--scene-filename synthetic[:HxWxV]`` runs fully offline
on a generated granule. A comma-separated --scene-filename trains one model
per granule concurrently, each on its own device group (multi-granule
pod-scale training, ``training/multi.py``); checkpoints land in
``<exp>/granule_<g>/`` and extract.py targets them individually.
"""

import argparse
import json
import os
from pathlib import Path

from atmonr_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()


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
    parser.add_argument(
        "--check-numerics",
        action="store_true",
        help="Debug mode: run the train step under checkify float checks — "
        "the first NaN/inf/0-div raises with the producing op's source line "
        "(costs a host sync per iteration).",
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
    if args.check_numerics:
        config["trainer"]["check_numerics"] = True
    scenes = [s for s in args.scene_filename.split(",") if s]
    args.scene_filename = ",".join(scenes)  # normalized form into args.json
    output_path = setup_dir(args, config)
    if len(scenes) > 1:
        # multi-granule pod training: one model per granule, each compiled
        # over its own device group and driven concurrently (training/multi)
        from atmonr_tpu.parallel.mesh import make_mesh_from_spec
        from atmonr_tpu.training.multi import partition_devices, train_granules

        groups = partition_devices(len(scenes))
        trainers, out_paths = [], []
        for g, (scene, group) in enumerate(zip(scenes, groups)):
            dataset = get_dataset(config["dataset"], scene, args.data_root)
            pipeline = get_pipeline(config["pipeline"], dataset)
            trainer = Trainer(
                config["trainer"],
                dataset,
                pipeline,
                f"{args.exp_name}_granule{g}",
                data_root=args.data_root,
                seed=args.seed + g,
            )
            if args.mesh:
                trainer.shard(make_mesh_from_spec(args.mesh, devices=group))
            elif trainer.check_numerics and len(group) == 1:
                # checkify can't wrap the shard_map step; a one-device group
                # only needs placement, not a mesh
                trainer.place(group[0])
            else:
                # always shard onto the group — even a one-device group needs
                # its state/rays placed there, or every granule silently
                # computes on the default device and the groups never overlap
                from atmonr_tpu.parallel.mesh import make_mesh

                trainer.shard(make_mesh(devices=group))
            out = output_path / f"granule_{g}"
            out.mkdir(parents=True, exist_ok=True)
            # per-granule args/config so extract.py targets <exp>/granule_<g>
            sub_args = dict(vars(args), scene_filename=scene)
            json.dump(sub_args, open(out / "args.json", "w"), indent=4)
            json.dump(config, open(out / "config.json", "w"), indent=4)
            if args.resume:
                trainer.load(out)
            trainers.append(trainer)
            out_paths.append(out)
        train_granules(trainers, out_paths, profile=args.profile)
        return

    # scenes[0], not the raw flag: a stray trailing comma ("a.nc,") must not
    # reach the dataset reader as part of the filename
    dataset = get_dataset(config["dataset"], scenes[0], args.data_root)
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
