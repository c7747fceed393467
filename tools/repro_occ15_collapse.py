"""Reproduce + diagnose the occ15 smooth/seed-2 training collapse
(docs/quality_matrix.jsonl line 9: final loss 1.686, SSIM 0.746 at 60 s).

Runs the exact failing cell (configs/instant_ngp_tpu_occ.json, 1-blob
smooth scene, seed 2) with a loss/grad-norm trace to locate the divergence
step, then optional mitigations to isolate the mechanism:

    python -m tools.repro_occ15_collapse [mode=baseline|clip|eps|lr] \
        [iters=925] [seed=2] [config=configs/instant_ngp_tpu_occ.json]

    baseline  the failing cell as-is
    clip      + optax.clip_by_global_norm(1.0) before AdamW
    eps       AdamW eps 1e-15 -> 1e-8 (the tcnn-style tiny eps makes the
              effective step ~g/sqrt(v) explode on near-zero 2nd moments)
    lr        lr 1e-2 -> 3e-3
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    from atmonr_tpu.utils.compile_cache import enable

    enable("/tmp/qmatrix_cache")

    import jax
    import jax.numpy as jnp
    import optax

    from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.training.metrics import image_metrics
    from atmonr_tpu.utils import load_config

    mode, num_iters, seed = "baseline", 925, 2
    path = "configs/instant_ngp_tpu_occ.json"
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        if k == "mode":
            mode = v
        elif k == "iters":
            num_iters = int(v)
        elif k == "seed":
            seed = int(v)
        elif k == "config":
            path = v

    cfg = load_config(path)
    opt_cfg = dict(cfg["trainer"]["optimizer"])
    if mode == "eps":
        opt_cfg["eps"] = 1e-8
    elif mode == "lr":
        opt_cfg["lr"] = 3e-3

    granule = make_synthetic_granule(height=96, width=48, views_per_band=2,
                                     n_blobs=1)
    ds = HARP2Dataset(cfg["dataset"], granule)
    pipe = get_pipeline(cfg["pipeline"], ds)
    params = pipe.init_params(jax.random.PRNGKey(1000 * seed))
    opt = pipe.make_optimizer(opt_cfg, float(opt_cfg["lr"]))
    if mode == "clip":
        opt = optax.chain(optax.clip_by_global_norm(1.0), opt)
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
        gnorm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        pmax = jnp.maximum(
            jnp.max(jnp.abs(params["pos_table"])),
            jnp.max(jnp.abs(params["pos_mlp"]["layers"][0]["w"])),
        )
        return params, opt_state, loss, gnorm, pmax

    key = jax.random.PRNGKey(1000 * seed + 1)
    perm = epoch_permutation(jax.random.PRNGKey(1000 * seed + 2), ds.num_rays, b)
    t0 = time.perf_counter()
    lo = float("inf")
    for i in range(num_iters):
        params, opt_state, loss, gnorm, pmax = step(
            params, opt_state, aux, perm, jnp.asarray(i),
            jax.random.fold_in(key, i),
        )
        if aux_every and i and i % aux_every == 0:
            aux = aux_update(params, aux, jax.random.fold_in(key, num_iters + i))
        if (i + 1) % steps_per_epoch == 0:
            perm = epoch_permutation(jax.random.fold_in(key, i + 1),
                                     ds.num_rays, b)
        if i % 25 == 0 or i == num_iters - 1:
            l, g, p = float(loss), float(gnorm), float(pmax)
            lo = min(lo, l)
            flag = "  <-- SPIKE" if l > 10 * lo and l > 1e-3 else ""
            print(f"iter {i:5d} loss {l:10.5f} gnorm {g:10.3f} "
                  f"pmax {p:8.3f}{flag}", flush=True)

    # deterministic eval
    @jax.jit
    def eval_slice(p, sl):
        out = pipe.forward(p, sl, key=None)
        return jnp.take_along_axis(
            out["color_map_fine"], sl["irgb_idx"][:, None], axis=1
        )[:, 0]

    preds = []
    for s in range(0, ds.num_rays, b):
        sl = {k: v[s : s + b] for k, v in rays.items()}
        tail = sl["origin"].shape[0]
        if tail < b:
            pad = b - tail
            sl = {k: jnp.concatenate([v, jnp.repeat(v[-1:], pad, axis=0)])
                  for k, v in sl.items()}
            preds.append(np.asarray(eval_slice(params, sl))[:tail])
        else:
            preds.append(np.asarray(eval_slice(params, sl)))
    pred_img = ds.scatter_image(np.concatenate(preds))
    m = image_metrics(pred_img, ds.target_image(), ds.max_i)
    print(f"[{mode} seed={seed}] {num_iters} iters "
          f"({time.perf_counter() - t0:.0f}s) final loss={float(loss):.5f} "
          f"PSNR={m['PSNR_mean']:.2f} SSIM={m['SSIM_mean']:.4f}", flush=True)


if __name__ == "__main__":
    main()
