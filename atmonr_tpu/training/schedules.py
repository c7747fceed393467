"""Learning-rate schedules matching the reference trainer's two scheduler
types (reference ``trainer.py:55-67``, ``:114-120``, ``:181-182``), expressed
as optax step-indexed schedules so the LR lives inside the jitted update.

- ``target_lr``: per-epoch exponential decay with gamma chosen to land on
  ``final_lr`` after ``num_epochs`` (stepped at epoch boundaries).
- ``fixed``: multiply by ``gamma`` every ``decay_interval`` iterations once
  past ``decay_start``.

Warmup (optimizer ``warmup_iters``) is applied where the optimizer is
built (``pipelines.*.make_optimizer`` via ``apply_warmup`` below), not
here: the quality/bench harnesses construct optimizers with a plain float
LR and must get the same guard as the Trainer's scheduled path.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_warmup(lr_or_schedule, optimizer_config: dict):
    """Wrap a float LR or step-schedule with a linear warmup ramp
    (``warmup_iters`` in the optimizer config; 0/absent = no-op).

    Why: with the tcnn-style ``eps=1e-15`` the first AdamW updates are
    near sign-magnitude while second moments are tiny, which on unlucky
    seeds drives the density MLP into a dead-ReLU collapse that the
    ``clip_global_norm`` guard alone does not always prevent (r5: seed 4
    collapsed on every occ13 variant WITH the clip guard —
    docs/performance.md "the seed-4 collapse"). Ramping LR 0 -> lr over
    the first N steps lets the second moments calibrate before
    full-size steps."""
    warmup = int(optimizer_config.get("warmup_iters", 0))
    if not warmup:
        return lr_or_schedule
    base = (
        lr_or_schedule
        if callable(lr_or_schedule)
        else (lambda step: lr_or_schedule)
    )

    def warmed(step):
        return base(step) * jnp.minimum(1.0, (step + 1) / warmup)

    return warmed


def make_lr_schedule(
    scheduler_config: dict,
    optimizer_config: dict,
    num_iters: int,
    steps_per_epoch: int,
):
    lr0 = float(optimizer_config["lr"])
    kind = scheduler_config["type"]
    if kind == "target_lr":
        num_epochs = -(-int(num_iters) // steps_per_epoch)
        gamma = (float(scheduler_config["final_lr"]) / lr0) ** (1.0 / num_epochs)

        def schedule(step):
            epoch = step // steps_per_epoch
            return lr0 * jnp.power(gamma, epoch)

        return schedule
    if kind == "fixed":
        gamma = float(scheduler_config["gamma"])
        interval = int(scheduler_config["decay_interval"])
        start = int(scheduler_config["decay_start"])

        def schedule(step):
            decays = jnp.maximum(0, step // interval - start // interval)
            return lr0 * jnp.power(gamma, decays)

        return schedule
    raise NotImplementedError(f"Unknown scheduler type {kind}")
