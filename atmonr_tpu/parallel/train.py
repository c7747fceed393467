"""Multi-chip training step: rays data-parallel, samples sample-parallel.

Green-field TPU design (the reference is single-GPU only, scripts/train.py:94):

- the ray batch and the HBM-resident ray store shard over the mesh "data"
  axis; parameters are replicated, and their gradient all-reduce over ICI is
  inserted by GSPMD when the jitted step differentiates a data-sharded loss;
- the per-ray sample dimension shards over the "sample" axis inside a
  ``shard_map``: each shard marches its contiguous slice of every ray, and
  the Beer-Lambert partials combine exactly with three small collectives
  (``ppermute`` boundary z exchange, ``all_gather`` of shard transmittance
  totals, ``psum`` of weighted colors) — see
  ``atmonr_tpu.parallel.sharding.render_partial``;
- the surface branch (per-ray, no sample dim) and the loss/optimizer run in
  the ordinary GSPMD region around the shard_map.

XLA's latency-hiding scheduler overlaps the gradient all-reduce with the
remaining backward computation.
"""

from __future__ import annotations

from functools import partial
from typing import Mapping

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atmonr_tpu.data import batching
from atmonr_tpu.models.encoders import apply_composite
from atmonr_tpu.models.mlp import small_mlp_apply
from atmonr_tpu.ops import occupancy
from atmonr_tpu.ops.samplers import sample_piecewise, sample_uniform_bins
from atmonr_tpu.parallel.sharding import render_partial


def ngp_forward_sample_sharded(
    pipe,
    params: dict,
    ray_batch: Mapping[str, jax.Array],
    mesh: Mesh,
    key: jax.Array | None = None,
    aux: dict | None = None,
) -> dict[str, jax.Array]:
    """Instant-NGP forward with the sample axis sharded over ``mesh["sample"]``.

    Sample placement (uniform stratified, or occupancy-grid piecewise-CDF
    when the pipeline has an occupancy config and ``aux`` carries the grid)
    runs per-ray in the ordinary GSPMD region — identical math to
    ``InstantNGPPipeline._sample``, so results match the single-device
    forward bitwise given the same key. Each sample shard then marches its
    contiguous slice of the sorted z-vals inside the ``shard_map``. Batch
    arrays may simultaneously be sharded over "data".
    """
    ns = mesh.shape["sample"]
    num_bands = pipe.config["num_bands"]
    nd = pipe.num_density_outputs
    scale_km = pipe.scale / 1000.0

    if pipe.occ_cfg is not None and aux:
        oc = pipe.occ_cfg
        kp, kf = (None, None) if key is None else jax.random.split(key)
        pts_p, _ = sample_uniform_bins(ray_batch, oc.n_probe, key=kp)
        w = occupancy.probe_weights(
            jax.lax.stop_gradient(aux["occ"]), pipe._unit_coords(pts_p), oc
        )
        _, z_vals = sample_piecewise(ray_batch, w, oc.n_fine, key=kf)
        n = oc.n_fine
    else:
        n = pipe.config["num_samples_per_ray"]
        _, z_vals = sample_uniform_bins(ray_batch, n, key=key)
    assert n % ns == 0, (n, ns)
    n_loc = n // ns

    vol_params = {"pos_table": params["pos_table"], "pos_mlp": params["pos_mlp"],
                  "dir_mlp": params["dir_mlp"]}

    def vol(vp, origin, direction, z):
        b = origin.shape[0]
        pts = origin[:, None] + direction[:, None] * z[..., None]

        if pipe.point_preprocessor:
            pts = pipe.point_preprocessor(pts)
        pts = (pts + 1.0) / 2.0
        alt_c = pts[..., 2] / pipe.config["alt_compress_factor"]
        pts = jnp.concatenate([pts[..., :2], alt_c[..., None]], axis=-1)

        pos_out = pipe._pos_branch(vp, jnp.reshape(pts, (b * n_loc, -1)))
        dirs = jnp.broadcast_to(direction[:, None], (b, n_loc, 3))
        dir_in = jnp.concatenate(
            [jnp.reshape(dirs, (b * n_loc, 3)), pos_out[:, nd:]], axis=1
        )
        dir_enc = apply_composite(
            [{}] * len(pipe.dir_specs), pipe.dir_specs, dir_in
        )
        color = small_mlp_apply(
            vp["dir_mlp"], dir_enc, compute_dtype=pipe.compute_dtype
        )
        color = jax.nn.relu(jnp.reshape(color, (b, n_loc, num_bands)))
        sigma = jax.nn.relu(jnp.reshape(pos_out[..., :nd], (b, n_loc, -1)))

        color_map_atmo, trans_total, _, weights = render_partial(
            z * scale_km, color, sigma, "sample"
        )
        return color_map_atmo, trans_total, weights

    color_map_atmo, trans_total, weights = jax.shard_map(
        vol,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data", "sample")),
        out_specs=(P("data"), P("data"), P("data", "sample")),
        check_vma=False,
    )(
        vol_params,
        ray_batch["origin"],
        ray_batch["dir"],
        z_vals,
    )

    # surface branch: per-ray, ordinary GSPMD region
    pts_surf = (
        ray_batch["origin"] + ray_batch["dir"] * ray_batch["len"][:, None]
    )
    pts_surf = (pts_surf + 1.0) / 2.0
    surf_in = jnp.concatenate([pts_surf[:, :2], ray_batch["dir"]], axis=1)
    surf_enc = apply_composite(params["surf_enc"], pipe.surf_specs, surf_in)
    color_surf = jax.nn.relu(
        small_mlp_apply(
            params["surf_mlp"], surf_enc, compute_dtype=pipe.compute_dtype
        )
    )

    color_map_surf = trans_total * color_surf
    color_map = color_map_atmo + color_map_surf
    return {
        "color_map_fine": color_map,
        "color_map_atmo": color_map_atmo,
        "color_map_surf": color_map_surf,
        "color_surf": color_surf,
        "weights_fine": weights,
    }


def forward_loss_data_sharded(
    pipe,
    params: dict,
    batch: Mapping[str, jax.Array],
    mesh: Mesh,
    key: jax.Array | None = None,
    aux: dict | None = None,
):
    """Forward + loss with the ray batch sharded over the mesh "data" axis.

    Wraps the pipeline's own single-device ``forward`` in a ``shard_map``
    over "data": each chip runs the unmodified pipeline code — including the
    Pallas hash kernels, which must see shard-local shapes (a ``pallas_call``
    is an opaque custom call with no GSPMD partitioning rule, so leaving it
    in the automatic-sharding region would make XLA all-gather its operands
    and replicate the hot kernel on every chip instead of scaling it). Only
    the scalar loss crosses shards (``pmean``); the gradient all-reduce of
    the replicated parameters is inserted by shard_map's transpose.

    Works for any pipeline (hierarchical NeRF and Instant-NGP alike, with or
    without occupancy aux state). With a ``key``, each shard folds in its
    axis index so stratified-sampling jitter is independent across shards —
    the same distribution as the single-device step, not bitwise identical.
    Deterministic forwards (``key=None``) match the unsharded step exactly.

    Returns ``(loss, results)`` with every results array sharded P("data").
    """
    def local(params, batch, aux, *maybe_key):
        k = None
        if maybe_key:
            k = jax.random.fold_in(
                maybe_key[0], jax.lax.axis_index("data")
            )
        results = pipe.forward(params, batch, k, aux=aux or None)
        # equal shard sizes => pmean of per-shard means is the global mean
        loss = jax.lax.pmean(pipe.compute_loss(batch, results), "data")
        return loss, results

    args = [params, dict(batch), aux or {}]
    in_specs = [P(), P("data"), P()]
    if key is not None:
        args.append(key)
        in_specs.append(P())
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P("data")),
        check_vma=False,
    )(*args)


def make_ngp_sharded_train_step(pipe, optimizer, mesh: Mesh, batch_size: int):
    """Jitted multi-chip train step: gather -> sharded forward -> loss ->
    grads (ICI all-reduce) -> optax update. ``train_state`` may carry an
    "aux" entry (the replicated occupancy grid); refresh it on the host
    cadence with ``jax.jit(pipe.update_aux)``."""

    @partial(jax.jit, donate_argnums=(0,))
    def step(train_state, rays, perm, step_in_epoch, global_step):
        batch = batching.batch_at_step(rays, perm, step_in_epoch, batch_size)
        key = jax.random.fold_in(jax.random.PRNGKey(0), global_step)
        aux = train_state.get("aux")

        def loss_fn(params):
            results = ngp_forward_sample_sharded(
                pipe, params, batch, mesh, key, aux=aux or None
            )
            return pipe.compute_loss(batch, results)

        loss, grads = jax.value_and_grad(loss_fn)(train_state["params"])
        updates, opt_state = optimizer.update(
            grads, train_state["opt_state"], train_state["params"]
        )
        params = optax.apply_updates(train_state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state}
        if aux is not None:
            new_state["aux"] = aux
        return new_state, loss

    return step
