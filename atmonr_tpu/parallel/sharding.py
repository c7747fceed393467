"""Sharding utilities + the sample-axis-parallel compositor.

Ray (data-axis) sharding: rays are i.i.d., so the granule's ray arrays shard
on their leading axis; parameters replicate and their gradients all-reduce
over ICI (inserted by GSPMD under jit, or explicit ``psum`` in the shard_map
training path).

Sample-axis sharding (the sequence/context-parallel analog, SURVEY §2b.2):
the compositor's transmittance factorizes multiplicatively across contiguous
sample shards, so each shard composites its slice locally and the combination
needs only per-ray shard totals:

    weights_i = alpha_i * prod_{j<i}(1 - alpha_j + eps)
             = alpha_i * [prod over earlier shards of their totals] * C_local

Boundary Voronoi deltas need one neighbor z value per side (``ppermute``),
shard totals are combined with an ``all_gather`` + masked product, and the
final color is a ``psum`` — three cheap collectives riding ICI per forward,
exact (not approximate) with respect to the single-device compositor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_rays(rays: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place ray arrays sharded on their leading axis over ``axis``.

    Trims to a multiple of the axis size (ray counts are millions; the
    trimmed remainder is < n_shards rays).
    """
    n_shards = mesh.shape[axis]
    sharding = NamedSharding(mesh, P(axis))
    out = {}
    for k, v in rays.items():
        n = (v.shape[0] // n_shards) * n_shards
        out[k] = jax.device_put(v[:n], sharding)
    return out


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# ---------------------------------------------------------------------------
# Sample-axis-parallel compositing (call INSIDE shard_map over ``axis_name``)
# ---------------------------------------------------------------------------


def render_partial(
    z_local: jax.Array,
    color_local: jax.Array,
    sigma_local: jax.Array,
    axis_name: str = "sample",
):
    """Per-shard Beer-Lambert compositing with exact cross-shard combination.

    Args (all local slices of the sample axis, inside shard_map):
        z_local: (B, n_loc) sample distances (km), globally sorted with shard
            s owning the contiguous slice [s*n_loc, (s+1)*n_loc).
        color_local: (B, n_loc, C). sigma_local: (B, n_loc, 1 or C).

    Returns:
        color_map: (B, C) composited color, replicated across the axis.
        trans_total: (B, C) total volume transmittance prod(1 - alpha)
            (no epsilon guard — the surface term's factor, reference
            graphics_utils.py:75), replicated.
        alpha_local: (B, n_loc, C). weights_local: (B, n_loc, 1 or C).
    """
    s = jax.lax.axis_index(axis_name)
    ns = jax.lax.psum(1, axis_name)
    b = z_local.shape[0]
    z_local = z_local.astype(color_local.dtype)

    # Voronoi edges need one neighbor z on each side (ring exchange).
    right_perm = [(i, (i + 1) % ns) for i in range(ns)] if ns > 1 else [(0, 0)]
    left_perm = [(i, (i - 1) % ns) for i in range(ns)] if ns > 1 else [(0, 0)]
    left_last = jax.lax.ppermute(z_local[:, -1], axis_name, right_perm)
    right_first = jax.lax.ppermute(z_local[:, 0], axis_name, left_perm)

    e_left = jnp.where(s == 0, 0.0, (left_last + z_local[:, 0]) / 2.0)
    e_right = jnp.where(
        s == ns - 1, z_local[:, -1], (z_local[:, -1] + right_first) / 2.0
    )
    e_inner = (z_local[:, :-1] + z_local[:, 1:]) / 2.0
    edges = jnp.concatenate(
        [e_left[:, None], e_inner, e_right[:, None]], axis=-1
    )
    delta = jnp.diff(edges, axis=-1)[..., None]

    alpha = 1.0 - jnp.exp(-sigma_local * delta)
    guarded = 1.0 - alpha + 1e-10

    # within-shard exclusive cumulative transmittance
    ones = jnp.ones((b, 1, alpha.shape[2]), dtype=alpha.dtype)
    c_local = jnp.cumprod(jnp.concatenate([ones, guarded], axis=1), axis=1)[:, :-1]

    # cross-shard prefix: product of earlier shards' totals
    t_local = jnp.prod(guarded, axis=1)  # (B, C)
    t_all = jax.lax.all_gather(t_local, axis_name)  # (ns, B, C)
    mask = (jnp.arange(ns) < s)[:, None, None]
    prefix = jnp.prod(jnp.where(mask, t_all, 1.0), axis=0)  # (B, C)

    weights = alpha * prefix[:, None, :] * c_local
    color_map = jax.lax.psum(
        jnp.sum(color_local * weights, axis=1), axis_name
    )

    # total transmittance for the opaque-surface term (no epsilon guard)
    t2_all = jax.lax.all_gather(jnp.prod(1.0 - alpha, axis=1), axis_name)
    trans_total = jnp.prod(t2_all, axis=0)
    return color_map, trans_total, alpha, weights


def render_sample_sharded(
    z_vals: jax.Array,
    color: jax.Array,
    sigma: jax.Array,
    mesh: Mesh,
    axis_name: str = "sample",
):
    """Standalone sample-sharded compositor over global (B, N, C) arrays.

    Equivalent to ``ops.compositor.render`` but with the sample axis sharded
    over ``mesh[axis_name]``; used directly for long-ray workloads whose
    sample dimension exceeds one chip's memory, and as the parity test
    harness for :func:`render_partial`.
    """
    def body(z_l, c_l, s_l):
        color_map, trans_total, alpha, weights = render_partial(
            z_l, c_l, s_l, axis_name
        )
        return color_map, trans_total, alpha, weights

    in_specs = (P(None, axis_name), P(None, axis_name, None), P(None, axis_name, None))
    out_specs = (P(), P(), P(None, axis_name, None), P(None, axis_name, None))
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )(z_vals, color, sigma)
