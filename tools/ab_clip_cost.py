"""Interleaved A/B of the clip_global_norm guard's throughput cost.

r4 left two numbers in circulation: docs claimed the guard costs 2.3%
(450.5k -> 439.9k) while the r4 driver bench measured 449.6k on the
guarded config — within run-to-run variance. This tool settles it the way
tools/bench_variants.py settled the plumbing question: the SAME process
times guarded and unguarded steps interleaved (noclip / clip / noclip /
clip), so transport warm-up and drift cannot masquerade as a guard cost.

Run from the repo root: ``python -m tools.ab_clip_cost [iters=250]``.
"""

from __future__ import annotations

import sys
import time

BATCH_SIZE = 8192
WARMUP = 30


def main() -> None:
    from atmonr_tpu.utils.compile_cache import enable

    enable()

    import jax
    import jax.numpy as jnp  # noqa: F401
    import optax

    from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.utils import load_config

    iters = 250
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        if k == "iters":
            iters = int(v)

    config = load_config("configs/instant_ngp_tpu_occ13.json")
    noclip_opt_cfg = dict(config["trainer"]["optimizer"])
    noclip_opt_cfg.pop("clip_global_norm", None)
    granule = make_synthetic_granule(height=48, width=24, views_per_band=2)
    dataset = HARP2Dataset(config["dataset"], granule)
    pipe = get_pipeline(config["pipeline"], dataset)
    aux_every = pipe.occ_cfg.update_every if pipe.occ_cfg else 0

    rays = dataset.rays()
    n = len(dataset)
    perm = epoch_permutation(jax.random.PRNGKey(1), n, BATCH_SIZE)
    steps_per_epoch = n // BATCH_SIZE
    update_aux = jax.jit(pipe.update_aux)

    def make_step(opt):
        def step(state, perm, i, step_idx):
            batch = batch_at_step(rays, perm, i, BATCH_SIZE)
            key = jax.random.fold_in(jax.random.PRNGKey(2), step_idx)

            def loss_fn(p):
                out = pipe.forward(p, batch, key, aux=state["aux"] or None)
                return pipe.compute_loss(batch, out)

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, opt_state = opt.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            return {
                "params": params,
                "opt_state": opt_state,
                "aux": state["aux"],
            }, loss

        return jax.jit(step, donate_argnums=(0,))

    arms = {}
    for name, opt_cfg in [
        ("clip", config["trainer"]["optimizer"]),
        ("noclip", noclip_opt_cfg),
    ]:
        opt = pipe.make_optimizer(opt_cfg, float(opt_cfg["lr"]))
        params = pipe.init_params(jax.random.PRNGKey(0))
        arms[name] = {
            "step": make_step(opt),
            "state": {
                "params": params,
                "opt_state": opt.init(params),
                "aux": pipe.init_aux(),
            },
            "times": [],
        }

    def run(name) -> None:
        arm = arms[name]
        state = arm["state"]
        t0 = time.perf_counter()
        for i in range(iters):
            state, loss = arm["step"](state, perm, i % steps_per_epoch, i)
            if aux_every and (i + 1) % aux_every == 0:
                state["aux"] = update_aux(
                    state["params"], state["aux"],
                    jax.random.fold_in(jax.random.PRNGKey(3), i),
                )
        _ = float(loss)  # fence (value fetch; verify skill)
        arm["state"] = state
        arm["times"].append(time.perf_counter() - t0)
        print(
            f"{name:7s} {arm['times'][-1] / iters * 1e3:7.2f} ms/iter "
            f"{BATCH_SIZE * iters / arm['times'][-1] / 1e3:8.1f}k rays/s",
            flush=True,
        )

    # warm both compiled programs + transport before any timed window
    for name in arms:
        arm = arms[name]
        for i in range(WARMUP):
            arm["state"], loss = arm["step"](
                arm["state"], perm, i % steps_per_epoch, i
            )
        _ = float(loss)

    for name in ("noclip", "clip", "noclip", "clip", "noclip", "clip"):
        run(name)

    import numpy as np

    r = {
        n: BATCH_SIZE * iters / np.asarray(arms[n]["times"])
        for n in ("clip", "noclip")
    }
    cost = 1.0 - np.mean(r["clip"]) / np.mean(r["noclip"])
    print(
        f"\nclip   {np.mean(r['clip']) / 1e3:8.1f}k ± {np.std(r['clip']) / 1e3:5.1f}k rays/s"
        f"\nnoclip {np.mean(r['noclip']) / 1e3:8.1f}k ± {np.std(r['noclip']) / 1e3:5.1f}k rays/s"
        f"\nguard cost: {cost * 100:+.2f}% (negative = clip faster; n=3 interleaved)",
        flush=True,
    )


if __name__ == "__main__":
    main()
