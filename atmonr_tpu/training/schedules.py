"""Learning-rate schedules matching the reference trainer's two scheduler
types (reference ``trainer.py:55-67``, ``:114-120``, ``:181-182``), expressed
as optax step-indexed schedules so the LR lives inside the jitted update.

- ``target_lr``: per-epoch exponential decay with gamma chosen to land on
  ``final_lr`` after ``num_epochs`` (stepped at epoch boundaries).
- ``fixed``: multiply by ``gamma`` every ``decay_interval`` iterations once
  past ``decay_start``.
"""

from __future__ import annotations

import jax.numpy as jnp


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
