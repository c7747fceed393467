"""Scaling benchmark: rays/s of the sharded Instant-NGP train step vs mesh size.

The BASELINE north-star asks for measured scaling at 1 chip / 1 host /
N hosts. This harness measures whatever devices the runtime exposes:

- on a TPU pod slice it reports real rays/s per mesh shape (the number to
  quote), with the batch scaled proportionally to the data axis so per-chip
  work stays constant (weak scaling, the all-HBM-residency regime);
- on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8 it
  validates the harness end-to-end (CPU timings say nothing about ICI).

Usage:
    python -m tools.bench_scaling [data=4,sample=2 ...]
    # default sweep: data=1 / data=2 / data=4 / data=8 (whatever fits)
"""

from __future__ import annotations

import sys

from atmonr_tpu.utils.benchmark import timed_window, warm_until_steady


def run(spec: str, base_batch: int, iters: int = 50) -> None:
    import jax

    from atmonr_tpu.data.batching import epoch_permutation
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.parallel.mesh import make_mesh_from_spec
    from atmonr_tpu.parallel.sharding import replicate, shard_rays
    from atmonr_tpu.parallel.train import make_ngp_sharded_train_step
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.utils import load_config

    mesh = make_mesh_from_spec(spec)
    n_data = mesh.shape["data"]
    batch = base_batch * n_data  # weak scaling: constant per-chip rays

    config = load_config("configs/instant_ngp_tpu_occ13.json")
    granule = make_synthetic_granule(height=96, width=48, views_per_band=2)
    ds = HARP2Dataset(config["dataset"], granule)
    pipe = get_pipeline(config["pipeline"], ds)
    opt = pipe.make_optimizer(config["trainer"]["optimizer"], 1e-2)
    params = pipe.init_params(jax.random.PRNGKey(0))
    state = replicate(
        {"params": params, "opt_state": opt.init(params), "aux": pipe.init_aux()},
        mesh,
    )
    rays = shard_rays(ds.rays(), mesh)
    n = rays["origin"].shape[0]
    batch = min(batch, n)
    step = make_ngp_sharded_train_step(pipe, opt, mesh, batch)
    update_aux = jax.jit(pipe.update_aux)
    aux_every = pipe.occ_cfg.update_every if pipe.occ_cfg else 0

    perm = epoch_permutation(jax.random.PRNGKey(1), n, batch)
    spe = max(1, n // batch)
    if aux_every:  # compile the refresh outside any timed window
        state["aux"] = update_aux(state["params"], state["aux"], jax.random.PRNGKey(2))

    box = {"state": state}

    def one_iter(s):
        box["state"], loss = step(box["state"], rays, perm, s % spe, s)
        if aux_every and (s + 1) % aux_every == 0:
            box["state"]["aux"] = update_aux(
                box["state"]["params"],
                box["state"]["aux"],
                jax.random.fold_in(jax.random.PRNGKey(3), s),
            )
        return loss

    # transport warm-up: the first few hundred dispatches of a process run
    # 1.2-3x slow (atmonr_tpu/utils/benchmark.py); on CPU meshes a plain
    # compile warmup is enough and the blocks converge immediately
    s0 = warm_until_steady(
        one_iter,
        float,
        block=25 if jax.default_backend() == "tpu" else 3,
        max_iters=1200 if jax.default_backend() == "tpu" else 6,
    )
    dt = timed_window(one_iter, float, start_step=s0, iters=iters)
    rps = batch * iters / dt
    print(
        f"[mesh {spec}] batch={batch} {iters} iters in {dt:.2f}s: "
        f"{rps:,.0f} rays/s total, {rps / n_data:,.0f} rays/s per data shard",
        flush=True,
    )


def main() -> None:
    import jax

    n_dev = len(jax.devices())
    specs = sys.argv[1:]
    if not specs:
        specs = [f"data={d},sample=1" for d in (1, 2, 4, 8) if d <= n_dev]
    print(f"devices: {n_dev} x {jax.devices()[0].device_kind}", flush=True)
    for spec in specs:
        run(spec, base_batch=8192 if jax.default_backend() == "tpu" else 512)


if __name__ == "__main__":
    main()
