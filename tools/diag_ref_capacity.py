"""Step-time breakdown at the REFERENCE capacity (2^21 tables, 1024
samples/ray, configs/instant_ngp.json) on one TPU chip.

Times each stage of the train step in isolation so the 2^21 optimization
effort lands where the milliseconds are:

    encode_fwd      hash-encode forward alone (XLA gather fallback)
    pipeline_fwd    full forward + loss
    encode_bwd      hash-table gradient alone (sorted segment-sum)
    full_grad       value_and_grad of the loss
    train_step      grad + AdamW update

Usage: python -m tools.diag_ref_capacity [batch=8192] [iters=5]
"""

from __future__ import annotations

import sys
import time


def _fetch_scalar(out):
    """Force completion with a scalar download — on this transport
    ``block_until_ready`` can return before execution completes
    (docs/performance.md), and bulk device->host is ~10 KB/s."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


def timeit(name: str, fn, iters: int) -> float:
    _fetch_scalar(fn())  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _fetch_scalar(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:14s} {dt * 1e3:9.1f} ms/iter", flush=True)
    return dt


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.models import hash_grid as hg
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.utils import load_config

    batch_size, iters = 8192, 5
    config_path = "configs/instant_ngp.json"
    stages = "all"
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        if k == "batch":
            batch_size = int(v)
        elif k == "iters":
            iters = int(v)
        elif k == "config":
            config_path = v
        elif k == "stage":
            # "step" compiles/times only the full train step — the other
            # stages each pay their own multi-minute server compile at
            # batch=8192, which blows any sane timeout
            stages = v

    cfg = load_config(config_path)
    granule = make_synthetic_granule(height=96, width=48, views_per_band=2)
    ds = HARP2Dataset(cfg["dataset"], granule)
    pipe = get_pipeline(cfg["pipeline"], ds)
    params = pipe.init_params(jax.random.PRNGKey(0))
    rays = ds.rays()
    perm = epoch_permutation(jax.random.PRNGKey(1), ds.num_rays, batch_size)
    batch = jax.jit(
        lambda: batch_at_step(rays, perm, 0, batch_size)
    )()
    occ = cfg["pipeline"].get("occupancy")
    n_samples = int(occ["n_fine"] if occ else cfg["pipeline"]["num_samples_per_ray"])
    m = batch_size * n_samples
    print(
        f"reference capacity: batch={batch_size}, samples={n_samples}, "
        f"levels={pipe.pos_cfg.n_levels}, table=2^"
        f"{cfg['pipeline']['instant_ngp']['encoding']['log2_hashmap_size']}, "
        f"points/iter={m / 1e6:.1f}M",
        flush=True,
    )

    pts = jax.random.uniform(jax.random.PRNGKey(2), (m, 3))
    key = jax.random.PRNGKey(3)
    rows = m * pipe.pos_cfg.n_levels * 8

    aux = pipe.init_aux() or None
    fwd = jax.jit(
        lambda p: pipe.compute_loss(
            batch, pipe.forward(p, batch, key=key, aux=aux)
        )
    )
    if stages == "all":
        # (a) encode fwd alone
        enc = jax.jit(
            lambda p, x: hg.hash_encode(p["pos_table"], x, pipe.pos_cfg)
        )
        t_fwd = timeit("encode_fwd", lambda: enc(params, pts), iters)
        print(
            f"  -> {rows / t_fwd / 1e6:.0f} M corner-gathers/s", flush=True
        )

        # (b) full pipeline forward + loss
        timeit("pipeline_fwd", lambda: fwd(params), iters)

        # (c) encode bwd alone (cotangent of ones)
        g = jnp.ones((m, pipe.pos_cfg.n_output_dims), jnp.float32)
        enc_bwd = jax.jit(
            lambda p, x: jax.vjp(
                lambda t: hg.hash_encode(t, x, pipe.pos_cfg), p["pos_table"]
            )[1](g)[0]
        )
        t_bwd = timeit("encode_bwd", lambda: enc_bwd(params, pts), iters)
        print(
            f"  -> {rows / t_bwd / 1e6:.0f} M contributions/s", flush=True
        )

        # (d) full grad
        grad = jax.jit(lambda p: jax.grad(fwd)(p))
        timeit("full_grad", lambda: grad(params), iters)

    # (e) full train step
    opt = pipe.make_optimizer(cfg["trainer"]["optimizer"], 1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(fwd)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    t_step = timeit("train_step", lambda: step(params, opt_state)[2], iters)
    print(f"  -> {batch_size / t_step:.0f} rays/s", flush=True)


if __name__ == "__main__":
    main()
