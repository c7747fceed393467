"""Tests for the scatter-free hash-table gradient paths (sorted + Pallas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atmonr_tpu.models import hash_grid as hg
from atmonr_tpu.models.hash_grid import _segment_sum_sorted
from atmonr_tpu.ops import hash_bwd_pallas as hbp


def _scatter_ref(cfg, x, g):
    ref = jnp.zeros((cfg.total_params, cfg.n_features_per_level))
    for level in range(cfg.n_levels):
        idx, w = hg.level_indices(x, cfg, level)
        g_l = g[:, 2 * level : 2 * level + 2]
        vals = w[..., None] * g_l[:, None, :]
        ref = ref.at[(cfg.level_offsets[level] + idx).reshape(-1)].add(
            vals.reshape(-1, 2)
        )
    return ref


@pytest.mark.parametrize("mode,rtol", [("f32", 1e-5), ("bf16", 2e-2)])
def test_hash_bwd_pallas_matches_scatter(mode, rtol):
    """The one-hot-matmul kernel (interpret mode on CPU) vs dense scatter,
    including a mix of dense and hashed levels and M % block != 0 padding."""
    cfg = hg.HashGridConfig(
        n_dims=3, n_levels=4, n_features_per_level=2,
        log2_hashmap_size=10, base_resolution=4, per_level_scale=2.0,
    )
    m = 2048 + 77  # exercises the in-kernel zero-cotangent padding
    x = jax.random.uniform(jax.random.PRNGKey(1), (m, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (m, cfg.n_output_dims))
    ref = _scatter_ref(cfg, x, g)
    out = hbp.hash_encode_pallas_bwd(x, g, cfg, mode)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=rtol * scale
    )


def test_hash_bwd_pallas_supported_gate():
    small = hg.HashGridConfig(
        n_dims=3, n_levels=16, n_features_per_level=2,
        log2_hashmap_size=15, base_resolution=16, per_level_scale=1.3819,
    )
    assert hbp.supported(small)  # flagship TPU config
    big = hg.HashGridConfig(
        n_dims=3, n_levels=16, n_features_per_level=2,
        log2_hashmap_size=21, base_resolution=16, per_level_scale=1.3819,
    )
    assert not hbp.supported(big)  # reference config -> sorted fallback
    surf = hg.HashGridConfig(n_dims=2, n_levels=8, n_features_per_level=2,
                             log2_hashmap_size=15, base_resolution=16,
                             per_level_scale=1.5)
    assert hbp.supported(surf)  # 2-D surface grids run the kernel too
    assert not hbp.supported(
        hg.HashGridConfig(n_dims=4, n_levels=8, n_features_per_level=2,
                          log2_hashmap_size=10)
    )


def test_hash_bwd_pallas_2d_matches_scatter():
    """2-D grids (the Instant-NGP surface branch) through the same kernel."""
    cfg = hg.HashGridConfig(
        n_dims=2, n_levels=4, n_features_per_level=2,
        log2_hashmap_size=9, base_resolution=4, per_level_scale=2.0,
    )
    m = 1024 + 33
    x = jax.random.uniform(jax.random.PRNGKey(4), (m, 2))
    g = jax.random.normal(jax.random.PRNGKey(5), (m, cfg.n_output_dims))
    ref = _scatter_ref(cfg, x, g)
    out = hbp.hash_encode_pallas_bwd(x, g, cfg, "f32")
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-5 * scale
    )


def test_bwd_row_layout_round_trip():
    """unpack_grad_rows inverts the kernel's packed row layout exactly."""
    cfg = hg.HashGridConfig(
        n_dims=3, n_levels=3, n_features_per_level=2,
        log2_hashmap_size=9, base_resolution=4, per_level_scale=2.3,
    )
    row_offs, row_counts, r_total = hbp.bwd_row_layout(cfg)
    packed = jnp.zeros((r_total, 128))
    # write a recognizable value for entry (level=2, t=37, f=1)
    level, t, f = 2, 37, 1
    j = 2 * (t // 128) + f
    packed = packed.at[row_offs[level] + j, t % 128].set(7.0)
    flat = hbp.unpack_grad_rows(packed, cfg)
    assert flat.shape == (cfg.total_params, 2)
    assert float(flat[cfg.level_offsets[level] + t, f]) == 7.0
    assert float(jnp.sum(jnp.abs(flat))) == 7.0


def test_segment_sum_sorted_matches_scatter():
    rng = np.random.default_rng(0)
    m, t, f = 10000, 257, 2
    idx = jnp.asarray(rng.integers(0, t, m), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(m, f)), jnp.float32)
    ref = np.zeros((t, f), np.float64)
    np.add.at(ref, np.asarray(idx), np.asarray(vals, np.float64))
    out = _segment_sum_sorted(idx, vals, t)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)


def test_segment_sum_sorted_empty_segments():
    idx = jnp.asarray([5, 5, 5], jnp.int32)
    vals = jnp.ones((3, 2), jnp.float32)
    out = np.asarray(_segment_sum_sorted(idx, vals, 10))
    assert out[5].tolist() == [3.0, 3.0]
    assert np.abs(np.delete(out, 5, axis=0)).max() == 0.0


@pytest.mark.parametrize("m,t", [(10000, 257), (500, 2048), (3, 10)])
def test_segment_sum_runs_densify_matches_scatter(m, t):
    """The big-table densify (run compaction + sorted-unique scatter-set,
    the 2^21 reference-capacity path) vs a plain scatter reference —
    covering m > t (sentinel-free), m < t (sentinel pad rows), and the
    tiny empty-segments case."""
    rng = np.random.default_rng(1)
    f = 2
    idx = jnp.asarray(rng.integers(0, t, m), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(m, f)), jnp.float32)
    ref = np.zeros((t, f), np.float64)
    np.add.at(ref, np.asarray(idx), np.asarray(vals, np.float64))
    out = _segment_sum_sorted(idx, vals, t, densify_mode="runs")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)
    # both densify strategies agree exactly (same sort, same adds)
    out_search = _segment_sum_sorted(idx, vals, t, densify_mode="search")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_search), rtol=1e-6, atol=1e-6
    )


def test_hash_bwd_sorted_equals_autodiff_reference():
    """Force the sorted path (as used on TPU) and compare to plain scatter."""
    cfg = hg.HashGridConfig(
        n_dims=3, n_levels=3, n_features_per_level=2,
        log2_hashmap_size=8, base_resolution=4, per_level_scale=2.0,
    )
    table = hg.init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (500, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (500, cfg.n_output_dims))

    grad_vjp = jax.grad(lambda t: jnp.sum(hg.hash_encode(t, x, cfg) * g))(table)
    grad_ref = jax.grad(lambda t: jnp.sum(hg._hash_encode_impl(t, x, cfg) * g))(
        table
    )
    np.testing.assert_allclose(
        np.asarray(grad_vjp), np.asarray(grad_ref), rtol=1e-4, atol=1e-5
    )

    # explicitly exercise the sorted path on this backend too
    all_idx, all_vals = [], []
    f = cfg.n_features_per_level
    for level in range(cfg.n_levels):
        idx, w = hg.level_indices(x, cfg, level)
        g_l = g[:, level * f : (level + 1) * f]
        all_idx.append((cfg.level_offsets[level] + idx).reshape(-1))
        all_vals.append((w[..., None] * g_l[:, None, :]).reshape(-1, f))
    sorted_grad = _segment_sum_sorted(
        jnp.concatenate(all_idx), jnp.concatenate(all_vals), cfg.total_params
    )
    np.testing.assert_allclose(
        np.asarray(sorted_grad), np.asarray(grad_ref), rtol=1e-3, atol=1e-4
    )


def test_hash_dx_gradient_when_requested():
    cfg = hg.HashGridConfig(
        n_dims=3, n_levels=2, n_features_per_level=2,
        log2_hashmap_size=8, base_resolution=4, per_level_scale=2.0,
    )
    table = hg.init_hash_table(jax.random.PRNGKey(0), cfg) * 1e4
    x0 = jnp.asarray([[0.33, 0.41, 0.57]])

    def f(x):
        return jnp.sum(hg.hash_encode(table, x, cfg, True))

    dx = jax.grad(f)(x0)
    # finite difference check
    eps = 1e-4
    for d in range(3):
        xp = x0.at[0, d].add(eps)
        xm = x0.at[0, d].add(-eps)
        fd = (f(xp) - f(xm)) / (2 * eps)
        np.testing.assert_allclose(float(dx[0, d]), float(fd), rtol=2e-2, atol=1e-3)
