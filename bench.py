"""Headline benchmark: Instant-NGP training throughput (rays/s/chip).

Measures the full jitted train step — batch gather from the HBM-resident ray
set, occupancy-grid probing + piecewise-CDF sample placement, hash-encode +
MLP forward over batch x samples points, Beer-Lambert compositing with the
opaque surface term, loss, backward (including the Pallas one-hot-matmul
hash-table gradient), the AdamW update, AND the periodic dense occupancy
refresh (its cadence falls inside the timed window) — at the TPU flagship
work rate: 8192 rays/iter, 32 grid probes placing 24 fine samples/ray,
2^13-entry hash levels stored int8 with per-step stochastic rounding
(q8sr), clip + restart-on-plateau guards
(configs/instant_ngp_tpu_occ13.json), on one TPU chip, on a synthetic
HARP2 granule. Quality evidence is seed-swept at MATCHED WALL-CLOCK
(tools/quality_matrix.py, tools/quality_real_scale.py, smooth AND
multi-scale "hard" scenes, 60 s/300 s tiers plus a 14.6 M-ray
real-granule tier): equal-or-better PSNR/SSIM vs brute-force uniform-128
(the reference's strategy, configs/instant_ngp_tpu.json) at ~15x its
rays/s, and vs the bf16-table flagship it replaced
(instant_ngp_tpu_occ13_bf16.json) on every scene x budget panel;
2^12 tables degrade PSNR and are not used. The reference's 2^21/1024-sample
config remains supported (configs/instant_ngp.json) on the same code path.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
1e5 rays/s denominator is pinned by an A100 HBM roofline (<= ~1.24e5
rays/s for 1.07e9 random table reads + atomicAdds per step) and a
measured torch-CPU anchor (71.5 rays/s, tools/baseline_denominator.py) —
full derivation in BASELINE.md "The vs_baseline denominator".
"""

from __future__ import annotations

import json

REFERENCE_RAYS_PER_S_ESTIMATE = 1.0e5

BATCH_SIZE = 8192
# transport warm-up: beyond first-compile, the first few hundred dispatches
# in a process run 1.2-3x slow on this PJRT transport
# (tools/bench_variants.py: an interleaved A/B showed the FIRST timed run at
# 61 ms/iter and every later run of the same jitted fn at 18 ms/iter) — so
# warm in 50-iter blocks until two consecutive blocks agree within 5%.
# Budget note: round 1's official bench timed out inside first-compile
# (BENCH_r01.json rc=124), so the warmup cap is trimmed (steady-state is
# normally reached in 2-4 blocks) and compile itself is served from the
# committed persistent cache (atmonr_tpu/utils/compile_cache.py).
WARMUP_BLOCK = 10
MAX_WARMUP_ITERS = 400
# wide window: at ~20 ms/step, 20 iters was dominated by transport jitter
# and the tail sync (measured 2x slower than a 3000-iter loop of the same
# jitted step); 250 iters covers ~15 occupancy refreshes and ~5 s of steady
# state
TIMED_ITERS = 250
# a short pre-window so a provisional result is on stdout early: if the
# driver's window expires mid-run, the last flushed JSON line still records
# a real (slightly conservative) throughput instead of nothing
PROVISIONAL_ITERS = 50


import os
import sys
import time

_T0 = time.perf_counter()

# Result of the last completed run on this machine, committed to the repo.
# The axon backend pays 3-7 min of per-process server-side compile /
# executable transfer before the first step executes (measured: the same
# program compiles in 4.4 s on XLA:CPU), and no fresh measurement can exist
# before that — so the very first thing on stdout is the last completed
# run's real number, clearly labeled, followed by improving fresh
# provisionals and finally the fresh measurement.
_LAST_RESULT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_last.json")


def _phase(name: str) -> None:
    """Wall-clock phase marker on stderr (stdout carries only the JSON)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {name}", file=sys.stderr, flush=True)


def _emit(
    rays_per_s: float,
    provisional: bool = False,
    source: str | None = None,
    stream=None,
) -> None:
    line = {
        "metric": "instant_ngp_train_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REFERENCE_RAYS_PER_S_ESTIMATE, 3),
    }
    if provisional:
        line["provisional"] = True
    if source:
        line["source"] = source
    print(json.dumps(line), file=stream or sys.stdout, flush=True)


def _emit_last_completed() -> None:
    # stderr ONLY: stdout must carry nothing but numbers measured by the
    # current process, so a run that dies mid-compile yields no parseable
    # stale line (ADVICE r2 medium; VERDICT r2 weak #7)
    try:
        with open(_LAST_RESULT) as f:
            last = json.load(f)
        _emit(
            float(last["value"]),
            provisional=True,
            source=f"last completed run {last.get('recorded_at', '?')} (stale, fyi only)",
            stream=sys.stderr,
        )
    except Exception:
        pass


def _persist(rays_per_s: float) -> None:
    from datetime import datetime, timezone

    with open(_LAST_RESULT, "w") as f:
        json.dump(
            {
                "value": round(rays_per_s, 1),
                "recorded_at": datetime.now(timezone.utc).strftime(
                    "%Y-%m-%dT%H:%M:%SZ"
                ),
            },
            f,
        )
        f.write("\n")


def main() -> None:
    _emit_last_completed()

    from atmonr_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from atmonr_tpu.data.batching import epoch_permutation
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.utils import load_config

    config = load_config("configs/instant_ngp_tpu_occ13.json")

    _phase("imports done")
    granule = make_synthetic_granule(height=48, width=24, views_per_band=2)
    dataset = HARP2Dataset(config["dataset"], granule)
    _phase("dataset ready")
    pipe = get_pipeline(config["pipeline"], dataset)
    params = pipe.init_params(jax.random.PRNGKey(0))
    opt = pipe.make_optimizer(config["trainer"]["optimizer"], 1e-2)
    state = {
        "params": params,
        "opt_state": opt.init(params),
        "aux": pipe.init_aux(),
    }
    aux_every = pipe.occ_cfg.update_every if pipe.occ_cfg else 0
    update_aux = jax.jit(pipe.update_aux)

    rays = dataset.rays()
    n = len(dataset)
    perm = epoch_permutation(jax.random.PRNGKey(1), n, BATCH_SIZE)
    steps_per_epoch = n // BATCH_SIZE

    from atmonr_tpu.data.batching import batch_at_step

    import functools

    # donating the train state is worth ~15% end-to-end on this transport
    # (tools/bench_variants.py: 392.6k -> 450.7k rays/s); folding the
    # occupancy refresh into the step behind a lax.cond measured no further
    # gain, so the host-cadence refresh stays
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, perm, i, step):
        batch = batch_at_step(rays, perm, i, BATCH_SIZE)
        key = jax.random.fold_in(jax.random.PRNGKey(2), step)

        def loss_fn(p):
            results = pipe.forward(p, batch, key, aux=state["aux"] or None)
            return pipe.compute_loss(batch, results)

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

    def maybe_refresh_occ(state, step):
        if aux_every and (step + 1) % aux_every == 0:
            state["aux"] = update_aux(
                state["params"],
                state["aux"],
                jax.random.fold_in(jax.random.PRNGKey(3), step),
            )
        return state

    from atmonr_tpu.utils.benchmark import timed_window, warm_until_steady

    _phase("pipeline + params ready")
    if aux_every:  # compile the refresh outside the timed window
        state["aux"] = update_aux(
            state["params"], state["aux"], jax.random.PRNGKey(3)
        )

    box = {"state": state}

    def one_iter(step):
        box["state"], loss = train_step(
            box["state"], perm, step % steps_per_epoch, step
        )
        box["state"] = maybe_refresh_occ(box["state"], step)
        return loss

    _phase("occ refresh compiled")
    step = warm_until_steady(
        one_iter,
        float,
        block=WARMUP_BLOCK,
        max_iters=MAX_WARMUP_ITERS,
        # improving fresh provisionals: each warmup block's own rate lands
        # on stdout, so whenever the driver's window expires, the last line
        # is the best fresh measurement so far
        on_block=lambda n, dt: _emit(
            BATCH_SIZE * n / dt, provisional=True, source="warmup block"
        ),
    )

    _phase(f"warmup steady at step {step}")
    dt = timed_window(
        one_iter, float, start_step=step, iters=PROVISIONAL_ITERS
    )
    step += PROVISIONAL_ITERS
    _emit(BATCH_SIZE * PROVISIONAL_ITERS / dt, provisional=True)

    dt = timed_window(one_iter, float, start_step=step, iters=TIMED_ITERS)
    _phase("timed window done")
    rays_per_s = BATCH_SIZE * TIMED_ITERS / dt
    _persist(rays_per_s)
    _emit(rays_per_s)


if __name__ == "__main__":
    main()
