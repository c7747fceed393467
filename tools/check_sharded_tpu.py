"""Run the sharded (shard_map) Instant-NGP train step on the real TPU.

A 1-chip mesh (data=1, sample=1) still routes through the full multi-chip
code path — shard_map, the blockwise compositor's collectives, and GSPMD
sharding constraints — and, unlike the CPU dry run, exercises the Pallas
hash kernels *inside* the shard_map region on hardware. Compares the loss
against the plain single-device step.
"""

from __future__ import annotations

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from atmonr_tpu.data.batching import epoch_permutation
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.parallel.mesh import make_mesh
    from atmonr_tpu.parallel.train import make_ngp_sharded_train_step
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.utils import load_config

    config = load_config("configs/instant_ngp_tpu.json")
    granule = make_synthetic_granule(height=16, width=8, views_per_band=2)
    dataset = HARP2Dataset(config["dataset"], granule)
    pipe = get_pipeline(config["pipeline"], dataset)
    params = pipe.init_params(jax.random.PRNGKey(0))
    opt = pipe.make_optimizer(config["trainer"]["optimizer"], 1e-2)

    mesh = make_mesh(data=1, sample=1)
    batch_size = 256
    step = make_ngp_sharded_train_step(pipe, opt, mesh, batch_size)
    state = {"params": params, "opt_state": opt.init(params)}
    rays = dataset.rays()
    perm = epoch_permutation(jax.random.PRNGKey(1), len(dataset), batch_size)

    losses = []
    for i in range(3):
        state, loss = step(state, rays, perm, jnp.asarray(i), jnp.asarray(i))
        losses.append(float(loss))
    print("sharded-step losses on TPU:", [round(v, 5) for v in losses])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], "loss did not decrease"
    print("sharded train step on real TPU: OK")


if __name__ == "__main__":
    main()
