"""Real-granule-scale demonstration on one chip (VERDICT r2 item 4).

A real HARP2 granule is ~457x457 pixels x 90 views (10-60 per band), of
which the view-angle filter keeps tens of views -> tens of millions of
rays; the reference's answer is "fit it all on a 32 GB GPU"
(reference README "Getting Started"; datasets/harp2.py:119-124). This tool
demonstrates the same working set on a 16 GB v5e chip end-to-end:

1. writes a REAL-SCHEMA synthetic L1B granule at full size
   (``data/synthetic.write_granule_l1b_real_schema``, OB.DAAC layout, 90
   views, fill coding, striped red views),
2. reads it through the production reader + multithreaded C++ ray builder
   and reports ray count + build time,
3. trains the flagship occupancy config at steady state and reports
   rays/s + peak HBM,
4. runs a coarse voxelgrid extraction through the batched device query.

Usage: python -m tools.real_scale_demo [height=457] [width=457] [steps=200]
       [config=configs/instant_ngp_tpu_occ13.json]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path


def _hbm_stats():
    import jax

    try:
        s = jax.local_devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": int(s.get("bytes_in_use", 0)),
            "peak_bytes_in_use": int(s.get("peak_bytes_in_use", 0)),
            "bytes_limit": int(s.get("bytes_limit", 0)),
        }
    except Exception as e:  # the axon relay may not expose memory stats
        return {"unavailable": str(e)}


def main() -> None:
    from atmonr_tpu.utils.compile_cache import enable

    enable()

    import jax
    import jax.numpy as jnp
    import optax

    from atmonr_tpu.data.batching import batch_at_step, epoch_permutation
    from atmonr_tpu.data.factory import get_dataset
    from atmonr_tpu.data.synthetic import write_granule_l1b_real_schema
    from atmonr_tpu.pipelines import get_pipeline
    from atmonr_tpu.utils import load_config

    height, width, steps = 457, 457, 200
    config_path = "configs/instant_ngp_tpu_occ13.json"
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        if k == "height":
            height = int(v)
        elif k == "width":
            width = int(v)
        elif k == "steps":
            steps = int(v)
        elif k == "config":
            config_path = v

    cfg = load_config(config_path)
    report: dict = {"height": height, "width": width, "config": config_path}

    tmp = Path(tempfile.mkdtemp(prefix="real_scale_"))
    name = "PACE_HARP2.20240101T000000.L1B.V3.SYNTHETIC.nc"
    granule_path = tmp / "HARP2" / name
    granule_path.parent.mkdir(parents=True)
    t0 = time.perf_counter()
    write_granule_l1b_real_schema(granule_path, height=height, width=width)
    report["write_s"] = round(time.perf_counter() - t0, 1)
    report["file_mb"] = round(granule_path.stat().st_size / 1e6, 1)
    print(f"[1] granule written: {report['file_mb']} MB "
          f"in {report['write_s']}s", flush=True)

    t0 = time.perf_counter()
    ds = get_dataset(cfg["dataset"], name, data_root=tmp)
    report["dataset_build_s"] = round(time.perf_counter() - t0, 1)
    report["num_rays"] = int(ds.num_rays)
    host = ds.host_rays()
    report["ray_store_mb"] = round(
        sum(v.nbytes for v in host.values()) / 1e6, 1
    )
    print(f"[2] dataset: {report['num_rays'] / 1e6:.1f} M rays "
          f"({report['ray_store_mb']} MB) built in "
          f"{report['dataset_build_s']}s", flush=True)

    pipe = get_pipeline(cfg["pipeline"], ds)
    params = pipe.init_params(jax.random.PRNGKey(0))
    opt = pipe.make_optimizer(
        cfg["trainer"]["optimizer"], float(cfg["trainer"]["optimizer"]["lr"])
    )
    opt_state = opt.init(params)
    rays = ds.rays()
    b = 8192
    steps_per_epoch = ds.num_rays // b
    aux = pipe.init_aux()
    aux_every = pipe.occ_cfg.update_every if getattr(pipe, "occ_cfg", None) else 0
    aux_update = jax.jit(pipe.update_aux)

    # rays MUST be an argument, not a closure constant: closed-over arrays
    # bake into the HLO as literals, and this relay rejects the resulting
    # ~600 MB compile request (HTTP 413)
    @jax.jit
    def step(params, opt_state, aux, rays, perm, i, key):
        batch = batch_at_step(rays, perm, i % steps_per_epoch, b)

        def loss_fn(p):
            out = pipe.forward(p, batch, key, aux=aux or None)
            return pipe.compute_loss(batch, out)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    perm = epoch_permutation(jax.random.PRNGKey(2), ds.num_rays, b)
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, aux, rays, perm,
                                   jnp.asarray(0), key)
    if aux_every:
        aux = aux_update(params, aux, key)
    float(loss)
    report["compile_s"] = round(time.perf_counter() - t0, 1)
    # warm the transport before timing (docs/performance.md)
    for i in range(1, 60):
        params, opt_state, loss = step(params, opt_state, aux, rays, perm,
                                       jnp.asarray(i), jax.random.fold_in(key, i))
        if aux_every and i % aux_every == 0:
            aux = aux_update(params, aux, jax.random.fold_in(key, 9999 + i))
    float(loss)
    t0 = time.perf_counter()
    for i in range(60, 60 + steps):
        params, opt_state, loss = step(params, opt_state, aux, rays, perm,
                                       jnp.asarray(i), jax.random.fold_in(key, i))
        if aux_every and i % aux_every == 0:
            aux = aux_update(params, aux, jax.random.fold_in(key, 9999 + i))
    report["final_loss"] = float(loss)  # fences the queue
    dt = (time.perf_counter() - t0) / steps
    report["steady_rays_per_s"] = round(b / dt, 1)
    report["hbm"] = _hbm_stats()
    print(f"[3] training steady state: {report['steady_rays_per_s']:.0f} "
          f"rays/s over {steps} steps (loss {report['final_loss']:.4f}); "
          f"HBM {report['hbm']}", flush=True)

    from atmonr_tpu.extract.factory import get_extract_dataset
    from atmonr_tpu.extract.runner import run_extraction

    t0 = time.perf_counter()
    ex = get_extract_dataset(
        "voxelgrid", ds, horizontal_step=20000.0, alt_step=2000.0
    )
    sigma = run_extraction(pipe, params, ex, batch_size=b)
    out_nc = tmp / "real_scale_voxelgrid.nc"
    ex.dump(out_nc, sigma)
    report["extract_s"] = round(time.perf_counter() - t0, 1)
    report["extract_points"] = int(len(ex))
    report["extract_file_mb"] = round(out_nc.stat().st_size / 1e6, 2)
    print(f"[4] voxelgrid extract: {report['extract_points']} points in "
          f"{report['extract_s']}s -> {out_nc.name} "
          f"({report['extract_file_mb']} MB)", flush=True)

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
