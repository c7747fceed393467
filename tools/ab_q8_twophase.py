"""A/B: two-phase Instant-NGP training — q8 (int8-table) forward for the
first fraction of iterations, then full-precision (bf16) refinement.

If 8-bit training noise only perturbs the END of convergence, a short
full-precision tail should recover the bf16 PSNR at ~q8 average speed.
Usage: python -m tools.ab_q8_twophase [hard] [switch_frac]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def run(num_iters: int, switch_frac: float, n_blobs: int, seed: int = 0) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.training.metrics import image_metrics
    from atmonr_tpu.utils import load_config

    cfg_q8 = load_config("configs/instant_ngp_tpu_occ13_q8.json")
    cfg_fp = load_config("configs/instant_ngp_tpu_occ13.json")
    granule = make_synthetic_granule(
        height=96, width=48, views_per_band=2, n_blobs=n_blobs
    )
    ds = HARP2Dataset(cfg_q8["dataset"], granule)
    pipe_q8 = get_pipeline(cfg_q8["pipeline"], ds)
    pipe_fp = get_pipeline(cfg_fp["pipeline"], ds)
    params = pipe_q8.init_params(jax.random.PRNGKey(1000 * seed))
    opt = pipe_q8.make_optimizer(
        cfg_q8["trainer"]["optimizer"],
        float(cfg_q8["trainer"]["optimizer"]["lr"]),
    )
    opt_state = opt.init(params)
    rays = ds.rays()
    b = min(8192, ds.num_rays)
    steps_per_epoch = max(1, ds.num_rays // b)
    aux = pipe_q8.init_aux()
    aux_every = pipe_q8.occ_cfg.update_every if pipe_q8.occ_cfg else 0

    def make_step(pipe):
        @jax.jit
        def step(params, opt_state, aux, perm, i, key):
            batch = batch_at_step(rays, perm, i % steps_per_epoch, b)

            def loss_fn(p):
                out = pipe.forward(p, batch, key, aux=aux or None)
                return pipe.compute_loss(batch, out)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    steps = {"q8": make_step(pipe_q8), "fp": make_step(pipe_fp)}
    aux_update = jax.jit(pipe_q8.update_aux)
    switch_at = int(num_iters * switch_frac)

    # op-for-op the same schedule as tools/ab_importance.py: first step with
    # `key` itself outside the timed loop, then i = 1..num_iters-1
    key = jax.random.PRNGKey(1000 * seed + 1)
    perm = epoch_permutation(jax.random.PRNGKey(1000 * seed + 2), ds.num_rays, b)
    first = steps["q8"] if switch_at > 0 else steps["fp"]
    params, opt_state, loss = first(
        params, opt_state, aux, perm, jnp.asarray(0), key
    )
    if aux_every:
        aux = aux_update(params, aux, key)
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(1, num_iters):
        if i % steps_per_epoch == 0:
            perm = epoch_permutation(jax.random.fold_in(key, i), ds.num_rays, b)
        step = steps["q8"] if i < switch_at else steps["fp"]
        params, opt_state, loss = step(
            params, opt_state, aux, perm, jnp.asarray(i), jax.random.fold_in(key, i)
        )
        if aux_every and i % aux_every == 0:
            aux = aux_update(params, aux, jax.random.fold_in(key, num_iters + i))
    _ = float(loss)
    dt = time.perf_counter() - t0

    preds = []
    for s in range(0, ds.num_rays, b):
        sl = {k: v[s : s + b] for k, v in rays.items()}
        out = pipe_fp.forward(params, sl, key=None)
        pred = jnp.take_along_axis(
            out["color_map_fine"], sl["irgb_idx"][:, None], axis=1
        )[:, 0]
        preds.append(np.asarray(pred))
    pred_img = ds.scatter_image(np.concatenate(preds))
    m = image_metrics(pred_img, ds.target_image(), ds.max_i)
    print(
        f"[two-phase switch@{switch_frac:.0%} seed={seed}] {num_iters} iters in {dt:.1f}s "
        f"({num_iters * b / dt:.0f} rays/s) PSNR={m['PSNR_mean']:.3f} "
        f"SSIM={m['SSIM_mean']:.4f}",
        flush=True,
    )


def main() -> None:
    argv = sys.argv[1:]
    n_blobs = 40 if "hard" in argv else 1
    if "hard" in argv:
        argv.remove("hard")
    switch_frac = float(argv[0]) if argv else 0.8
    seed = int(argv[1]) if len(argv) > 1 else 0
    run(num_iters=3000, switch_frac=switch_frac, n_blobs=n_blobs, seed=seed)


if __name__ == "__main__":
    main()
