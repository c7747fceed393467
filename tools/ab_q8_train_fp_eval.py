"""A/B: train Instant-NGP with the q8 (int8-table) forward, then score
PSNR/SSIM with the full-precision (bf16-table) forward on the SAME
trained f32 master weights — the deployment recipe where extraction and
eval run full precision and only the training hot loop is quantized.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def run(train_path: str, eval_path: str, num_iters: int, n_blobs: int) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.training.metrics import image_metrics
    from atmonr_tpu.utils import load_config

    cfg = load_config(train_path)
    granule = make_synthetic_granule(
        height=96, width=48, views_per_band=2, n_blobs=n_blobs
    )
    ds = HARP2Dataset(cfg["dataset"], granule)
    pipe = get_pipeline(cfg["pipeline"], ds)
    params = pipe.init_params(jax.random.PRNGKey(0))
    opt = pipe.make_optimizer(
        cfg["trainer"]["optimizer"], float(cfg["trainer"]["optimizer"]["lr"])
    )
    opt_state = opt.init(params)
    rays = ds.rays()
    b = min(8192, ds.num_rays)
    steps_per_epoch = max(1, ds.num_rays // b)

    aux = pipe.init_aux()
    aux_every = pipe.occ_cfg.update_every if getattr(pipe, "occ_cfg", None) else 0
    aux_update = jax.jit(pipe.update_aux)

    @jax.jit
    def step(params, opt_state, aux, perm, i, key):
        batch = batch_at_step(rays, perm, i % steps_per_epoch, b)

        def loss_fn(p):
            out = pipe.forward(p, batch, key, aux=aux or None)
            return pipe.compute_loss(batch, out)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    perm = epoch_permutation(jax.random.PRNGKey(2), ds.num_rays, b)
    params, opt_state, loss = step(
        params, opt_state, aux, perm, jnp.asarray(0), key
    )
    if aux_every:
        aux = aux_update(params, aux, key)
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(1, num_iters):
        if i % steps_per_epoch == 0:
            perm = epoch_permutation(jax.random.fold_in(key, i), ds.num_rays, b)
        params, opt_state, loss = step(
            params, opt_state, aux, perm, jnp.asarray(i), jax.random.fold_in(key, i)
        )
        if aux_every and i % aux_every == 0:
            aux = aux_update(params, aux, jax.random.fold_in(key, num_iters + i))
    _ = float(loss)  # force the async dispatch queue before timing
    dt = time.perf_counter() - t0

    # eval with the full-precision pipeline on the SAME trained params
    eval_cfg = load_config(eval_path)
    eval_pipe = get_pipeline(eval_cfg["pipeline"], ds)
    preds = []
    for s in range(0, ds.num_rays, b):
        sl = {k: v[s : s + b] for k, v in rays.items()}
        out = eval_pipe.forward(params, sl, key=None)
        pred = jnp.take_along_axis(
            out["color_map_fine"], sl["irgb_idx"][:, None], axis=1
        )[:, 0]
        preds.append(np.asarray(pred))
    pred_img = ds.scatter_image(np.concatenate(preds))
    m = image_metrics(pred_img, ds.target_image(), ds.max_i)
    print(
        f"[train={train_path.split('/')[-1]} eval={eval_path.split('/')[-1]}] "
        f"{num_iters} iters in {dt:.1f}s ({num_iters * b / dt:.0f} rays/s) "
        f"PSNR={m['PSNR_mean']:.3f} SSIM={m['SSIM_mean']:.4f}",
        flush=True,
    )


def main() -> None:
    argv = sys.argv[1:]
    n_blobs = 40 if "hard" in argv else 1
    if "hard" in argv:
        argv.remove("hard")
    train_path = argv[0] if argv else "configs/instant_ngp_tpu_occ13_q8.json"
    eval_path = argv[1] if len(argv) > 1 else "configs/instant_ngp_tpu_occ13.json"
    run(train_path, eval_path, num_iters=3000, n_blobs=n_blobs)


if __name__ == "__main__":
    main()
