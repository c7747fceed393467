"""A/B the headline-bench step plumbing on the real chip.

Variants of the flagship train loop (configs/instant_ngp_tpu_occ13.json,
synthetic granule, B=8192), timed over the same window as bench.py:

  base     — bench.py as-is: undonated jitted step + a separately jitted
             occupancy refresh dispatched from the host every 16 steps
  donate   — same, but the train state is donated to the step
  fused    — donated step with the occupancy refresh folded INTO the jitted
             step behind a ``lax.cond`` on the global step (single dispatch
             per iteration, no second program)

Run from the repo root (no PYTHONPATH): ``python -m tools.bench_variants``.
"""

from __future__ import annotations

import time
from functools import partial

BATCH_SIZE = 8192
WARMUP = 5
ITERS = 250


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.utils import load_config

    config = load_config("configs/instant_ngp_tpu_occ13.json")
    granule = make_synthetic_granule(height=48, width=24, views_per_band=2)
    dataset = HARP2Dataset(config["dataset"], granule)
    pipe = get_pipeline(config["pipeline"], dataset)
    opt = pipe.make_optimizer(config["trainer"]["optimizer"], 1e-2)
    aux_every = pipe.occ_cfg.update_every if pipe.occ_cfg else 0

    rays = dataset.rays()
    n = len(dataset)
    perm = epoch_permutation(jax.random.PRNGKey(1), n, BATCH_SIZE)
    steps_per_epoch = n // BATCH_SIZE

    def fresh_state():
        params = pipe.init_params(jax.random.PRNGKey(0))
        return {
            "params": params,
            "opt_state": opt.init(params),
            "aux": pipe.init_aux(),
        }

    def loss_grads(state, batch, key):
        def loss_fn(p):
            results = pipe.forward(p, batch, key, aux=state["aux"] or None)
            return pipe.compute_loss(batch, results)

        return jax.value_and_grad(loss_fn)(state["params"])

    def apply(state, grads):
        updates, opt_state = opt.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        return params, opt_state

    def step_plain(state, perm, i, step):
        batch = batch_at_step(rays, perm, i, BATCH_SIZE)
        key = jax.random.fold_in(jax.random.PRNGKey(2), step)
        loss, grads = loss_grads(state, batch, key)
        params, opt_state = apply(state, grads)
        return {"params": params, "opt_state": opt_state, "aux": state["aux"]}, loss

    def step_fused(state, perm, i, step):
        batch = batch_at_step(rays, perm, i, BATCH_SIZE)
        key = jax.random.fold_in(jax.random.PRNGKey(2), step)
        loss, grads = loss_grads(state, batch, key)
        params, opt_state = apply(state, grads)
        aux = state["aux"]
        if aux_every:
            aux = jax.lax.cond(
                (step + 1) % aux_every == 0,
                lambda: jax.jit(pipe.update_aux)(
                    params, state["aux"],
                    jax.random.fold_in(jax.random.PRNGKey(3), step),
                ),
                lambda: state["aux"],
            )
        return {"params": params, "opt_state": opt_state, "aux": aux}, loss

    update_aux = jax.jit(pipe.update_aux)

    def run(name, step_fn, refresh_on_host):
        state = fresh_state()
        for i in range(WARMUP):
            state, loss = step_fn(state, perm, i % steps_per_epoch, i)
        if refresh_on_host and aux_every:
            state["aux"] = update_aux(
                state["params"], state["aux"], jax.random.PRNGKey(3)
            )
        _ = float(loss)
        t0 = time.perf_counter()
        for i in range(ITERS):
            step = WARMUP + i
            state, loss = step_fn(state, perm, step % steps_per_epoch, step)
            if refresh_on_host and aux_every and (step + 1) % aux_every == 0:
                state["aux"] = update_aux(
                    state["params"], state["aux"],
                    jax.random.fold_in(jax.random.PRNGKey(3), step),
                )
        _ = float(loss)
        dt = time.perf_counter() - t0
        print(
            f"{name:8s} {dt / ITERS * 1e3:7.2f} ms/iter "
            f"{BATCH_SIZE * ITERS / dt / 1e3:8.1f}k rays/s  (loss {float(loss):.5f})"
        )

    base = jax.jit(step_plain)
    donate = jax.jit(step_plain, donate_argnums=(0,))
    fused = jax.jit(step_fused, donate_argnums=(0,))
    # interleave repeats: the first timed run in a process can be penalized
    # by transport warm-up, which would masquerade as a variant difference
    run("base", base, refresh_on_host=True)
    run("donate", donate, refresh_on_host=True)
    run("base2", base, refresh_on_host=True)
    run("donate2", donate, refresh_on_host=True)
    run("fused", fused, refresh_on_host=False)


if __name__ == "__main__":
    main()
