"""A/B on real TPU: uniform-128 vs importance-32+32 vs occupancy-grid
Instant-NGP sampling.

Trains each variant on the same synthetic granule for the same number of
iterations with a bare jitted step (no per-epoch metric sync), then scores
final PSNR/SSIM once with deterministic eval — the evidence behind
configs/instant_ngp_tpu_fast.json and configs/instant_ngp_tpu_occ.json.
"""

from __future__ import annotations

import time

import numpy as np


def run(
    name: str,
    path: str,
    num_iters: int,
    n_blobs: int = 1,
    seed: int = 0,
    seconds: float | None = None,
    dataset=None,
) -> dict:
    """Train one variant and score deterministic PSNR/SSIM.

    ``seconds`` switches from matched-iterations to MATCHED WALL-CLOCK:
    training stops at the first block boundary past the budget (compile
    excluded), so variants with different step costs are compared on equal
    chip time — the fair basis for adopting a faster sampler (a variant
    that does 4x the iterations in the same seconds should win on merit,
    not bookkeeping). ``num_iters`` becomes an upper bound.

    ``dataset`` injects a prebuilt HARP2Dataset (the real-granule-scale
    harness builds one 14.6 M-ray dataset and shares it across every cell);
    default builds the small 96x48 synthetic scene.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.training.metrics import image_metrics
    from atmonr_tpu.utils import load_config

    cfg = load_config(path)
    if dataset is None:
        granule = make_synthetic_granule(
            height=96, width=48, views_per_band=2, n_blobs=n_blobs
        )
        ds = HARP2Dataset(cfg["dataset"], granule)
    else:
        ds = dataset
    pipe = get_pipeline(cfg["pipeline"], ds)
    # seed=0 reproduces the historical fixed-key harness exactly; other
    # seeds shift all three streams together (docs/performance.md: PSNR at
    # 3000 iters is stream-layout sensitive, so comparisons must sweep seeds)
    params = pipe.init_params(jax.random.PRNGKey(1000 * seed))
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

    # rays as an ARGUMENT, not a closure constant: a closed-over 14.6 M-ray
    # store bakes into the HLO and the axon relay rejects the compile
    # request (HTTP 413; verify skill)
    @jax.jit
    def step(params, opt_state, aux, rays, perm, i, key):
        batch = batch_at_step(rays, perm, i % steps_per_epoch, b)

        def loss_fn(p):
            out = pipe.forward(p, batch, key, aux=aux or None)
            return pipe.compute_loss(batch, out)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1000 * seed + 1)
    perm = epoch_permutation(jax.random.PRNGKey(1000 * seed + 2), ds.num_rays, b)
    # restart-on-plateau collapse guard (same semantics as the Trainer's
    # config key; see training/trainer.py) — measured inside the cell so
    # matched-wall-clock A/Bs price the restart honestly
    rop = cfg["trainer"].get("restart_on_plateau") or None
    if rop:
        rop = {
            "check_iter": int(rop.get("check_iter", 150)),
            "loss_threshold": float(rop.get("loss_threshold", 1.0)),
            "max_restarts": int(rop.get("max_restarts", 3)),
        }
    restarts, restart_base = 0, 0
    # compile outside the timed region
    params, opt_state, loss = step(
        params, opt_state, aux, rays, perm, jnp.asarray(0), key
    )
    if aux_every:
        aux = aux_update(params, aux, key)
    _ = float(loss)
    SYNC_BLOCK = 25  # wall-clock checks only at block edges (async dispatch)
    t0 = time.perf_counter()
    i = 1
    while i < num_iters:
        params, opt_state, loss = step(
            params,
            opt_state,
            aux,
            rays,
            perm,
            jnp.asarray(i),
            jax.random.fold_in(key, i),
        )
        if aux_every and i % aux_every == 0:
            aux = aux_update(
                params, aux, jax.random.fold_in(key, num_iters + i)
            )
        i += 1
        if (
            rop
            and restarts < rop["max_restarts"]
            and i - restart_base == rop["check_iter"]
        ):
            if float(loss) > rop["loss_threshold"]:
                restarts += 1
                restart_base = i
                print(f"  [restart {restarts} at iter {i}]", flush=True)
                params = pipe.init_params(
                    jax.random.fold_in(
                        jax.random.PRNGKey(1000 * seed), 7919 * restarts
                    )
                )
                opt_state = opt.init(params)
                aux = pipe.init_aux()
            else:
                restarts = rop["max_restarts"]  # healthy; stop checking
        if i % steps_per_epoch == 0:
            perm = epoch_permutation(jax.random.fold_in(key, i), ds.num_rays, b)
        if seconds is not None and i % SYNC_BLOCK == 0:
            _ = float(loss)  # force the queue so the clock is honest
            if time.perf_counter() - t0 >= seconds:
                break
    final_loss = float(loss)
    dt = time.perf_counter() - t0
    num_iters = i

    # deterministic full-dataset eval (jitted: the eager per-op dispatch
    # path costs minutes per eval on this transport). The AdamW moments are
    # dead weight here (340 MB at the 2^21 capacity) and the uniform-128
    # eval forward peaks well above the occupancy training step, so free
    # them and evaluate in smaller slices — the occ21 real-scale cell
    # OOM'd 16 GB with full-batch eval slices.
    opt_state = None
    b_eval = min(b, 4096)

    @jax.jit
    def eval_slice(p, sl):  # params as an ARG: closures would bake them in
        out = pipe.forward(p, sl, key=None)
        return jnp.take_along_axis(
            out["color_map_fine"], sl["irgb_idx"][:, None], axis=1
        )[:, 0]

    # lagged fetch: dispatch slice k+1 before fetching slice k so the
    # device computes while the host transfers (the synchronous per-slice
    # np.asarray serialized compute behind one transport RTT per slice —
    # material at the occ21 real-scale eval's thousands of slices)
    preds = []
    pending: tuple | None = None  # (device_array, tail_rows)
    for s in range(0, ds.num_rays, b_eval):
        sl = {k: v[s : s + b_eval] for k, v in rays.items()}
        tail = sl["origin"].shape[0]
        if tail < b_eval:  # pad the tail to the jitted shape
            # repeat the last row: padding with a slice of the tail itself
            # under-fills whenever tail < pad and forces a recompile
            sl = {
                k: jnp.concatenate(
                    [v, jnp.repeat(v[-1:], b_eval - tail, axis=0)], axis=0
                )
                for k, v in sl.items()
            }
        out = eval_slice(params, sl)  # dispatch only
        if pending is not None:
            preds.append(np.asarray(pending[0])[: pending[1]])
        pending = (out, tail)
    preds.append(np.asarray(pending[0])[: pending[1]])
    pred_img = ds.scatter_image(np.concatenate(preds))
    m = image_metrics(pred_img, ds.target_image(), ds.max_i)
    print(
        f"[{name} seed={seed}] {num_iters} iters in {dt:.1f}s "
        f"({num_iters * b / dt:.0f} rays/s) loss={final_loss:.4f} "
        f"PSNR={m['PSNR_mean']:.3f} SSIM={m['SSIM_mean']:.4f}",
        flush=True,
    )
    return {
        "name": name,
        "seed": seed,
        "iters": int(num_iters),
        "seconds": round(dt, 2),
        "rays_per_s": round(num_iters * b / dt, 1),
        "loss": final_loss,
        "psnr": float(m["PSNR_mean"]),
        "ssim": float(m["SSIM_mean"]),
    }


def main() -> None:
    import sys

    variants = {
        "uniform128": "configs/instant_ngp_tpu.json",
        "importance32+32": "configs/instant_ngp_tpu_fast.json",
        "occ64p+32": "configs/instant_ngp_tpu_occ.json",
    }
    argv = sys.argv[1:]
    n_blobs = 1
    if "hard" in argv:  # multi-scale broken-cloud scene (capacity matters)
        argv.remove("hard")
        n_blobs = 40
    names = argv or list(variants)
    for name in names:
        # accept ad-hoc "name=configs/foo.json" variants alongside the named ones
        if "=" in name:
            name, path = name.split("=", 1)
        else:
            path = variants[name]
        run(name, path, num_iters=3000, n_blobs=n_blobs)


if __name__ == "__main__":
    main()
