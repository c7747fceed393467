"""Break the flagship Instant-NGP train step into timed pieces (one chip).

Times, with a value-fetch fence each (block_until_ready can return early on
this transport): hash-encode forward alone, full pipeline forward, loss+grad
(forward+backward), and the full train step — so the backward and
"everything else" costs fall out by subtraction.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def fence(x):
    jax.tree_util.tree_leaves(x)[0].addressable_shards[0].data.block_until_ready()
    _ = jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    import sys

    import optax

    from atmonr_tpu.data.harp2 import HARP2Dataset
    from atmonr_tpu.data.synthetic import make_synthetic_granule
    from atmonr_tpu.models.hash_grid import hash_encode
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.utils import load_config

    cfg_path = sys.argv[1] if len(sys.argv) > 1 else "configs/instant_ngp_tpu.json"
    config = load_config(cfg_path)
    print(f"config: {cfg_path}")
    granule = make_synthetic_granule(height=48, width=24, views_per_band=2)
    dataset = HARP2Dataset(config["dataset"], granule)
    pipe = get_pipeline(config["pipeline"], dataset)
    params = pipe.init_params(jax.random.PRNGKey(0))
    opt = pipe.make_optimizer(config["trainer"]["optimizer"], 1e-2)
    opt_state = opt.init(params)

    b = 8192
    rays = dataset.rays()
    batch = jax.tree_util.tree_map(lambda a: a[:b], rays)
    key = jax.random.PRNGKey(2)

    occ = getattr(pipe, "occ_cfg", None)
    aux = pipe.init_aux() if occ is not None else None
    n_samples = occ.n_fine if occ else config["pipeline"]["num_samples_per_ray"]
    m = b * n_samples
    cfg3 = pipe.pos_cfg

    # 1. hash-encode forward alone (flagship M points)
    x = jax.random.uniform(jax.random.PRNGKey(3), (m, 3))
    tbl = params["pos_table"]
    enc_fwd = jax.jit(lambda t, xx: hash_encode(t, xx, cfg3, False))
    t = timeit(enc_fwd, tbl, x)
    print(f"hash-encode fwd ({m} pts):      {t*1e3:8.1f} ms")

    # 2. hash-encode fwd+bwd alone
    def enc_loss(t_, xx):
        return jnp.sum(hash_encode(t_, xx, cfg3, False) ** 2)

    enc_grad = jax.jit(jax.grad(enc_loss))
    t = timeit(enc_grad, tbl, x)
    print(f"hash-encode fwd+bwd:            {t*1e3:8.1f} ms")

    # 3. full pipeline forward
    fwd = jax.jit(lambda p, bt, k: pipe.forward(p, bt, k, aux=aux))
    t = timeit(fwd, params, batch, key)
    print(f"pipeline forward:               {t*1e3:8.1f} ms")

    # 4. loss + grad
    def loss_fn(p, bt, k):
        out = pipe.forward(p, bt, k, aux=aux)
        return pipe.compute_loss(bt, out)

    grad_fn = jax.jit(jax.grad(loss_fn))
    t = timeit(grad_fn, params, batch, key)
    print(f"pipeline fwd+bwd (grad):        {t*1e3:8.1f} ms")

    # 5. full train step (grad + optimizer update)
    @jax.jit
    def step(p, os_, bt, k):
        g = jax.grad(loss_fn)(p, bt, k)
        updates, os2 = opt.update(g, os_, p)
        return optax.apply_updates(p, updates), os2

    t = timeit(step, params, opt_state, batch, key)
    print(f"full train step:                {t*1e3:8.1f} ms")
    print(f"rays/s at B={b}:                {b/t:8.0f}")


if __name__ == "__main__":
    main()
