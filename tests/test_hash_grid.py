"""Property tests for the multiresolution hash-grid encoding."""

import jax
import jax.numpy as jnp
import numpy as np

from atmonr_tpu.models import hash_grid as hg


def _cfg(**kw):
    defaults = dict(
        n_dims=3,
        n_levels=4,
        n_features_per_level=2,
        log2_hashmap_size=10,
        base_resolution=4,
        per_level_scale=2.0,
    )
    defaults.update(kw)
    return hg.HashGridConfig(**defaults)


def test_level_geometry():
    cfg = _cfg()
    # scale_l = 4 * 2^l - 1 -> res_l = ceil(scale)+1 = 4*2^l
    assert cfg.level_resolutions == (4, 8, 16, 32)
    # dense sizes: 64, 512, 4096>1024 -> hashed 1024, 1024
    assert cfg.level_sizes == (64, 512, 1024, 1024)
    assert cfg.level_offsets == (0, 64, 576, 1600)
    assert cfg.total_params == 2624
    assert cfg.level_is_dense(0) and cfg.level_is_dense(1)
    assert not cfg.level_is_dense(2) and not cfg.level_is_dense(3)
    assert cfg.n_output_dims == 8


def test_from_reference_config():
    # the reference instant_ngp.json position encoding
    cfg = hg.HashGridConfig.from_options(
        {
            "n_levels": 16,
            "n_features_per_level": 2,
            "log2_hashmap_size": 21,
            "base_resolution": 16,
            "per_level_scale": 1.3819,
        },
        n_dims=3,
    )
    assert cfg.n_output_dims == 32
    assert cfg.level_resolutions[0] == 16
    # growth factor ~1.3819 -> last level around 16*1.3819^15
    assert 1800 < cfg.level_resolutions[-1] < 2200
    # large levels saturate at the hashmap size (aligned)
    assert cfg.level_sizes[-1] == 1 << 21


def test_encode_shape_and_dtype():
    cfg = _cfg()
    key = jax.random.PRNGKey(0)
    table = hg.init_hash_table(key, cfg)
    assert table.shape == (cfg.total_params, 2)
    assert float(jnp.max(jnp.abs(table))) <= 1e-4
    x = jax.random.uniform(jax.random.PRNGKey(1), (100, 3))
    out = hg.hash_encode(table, x, cfg)
    assert out.shape == (100, cfg.n_output_dims)


def test_dense_level_vertex_exactness():
    """At grid vertices, interpolation returns the vertex feature exactly."""
    cfg = _cfg(n_levels=1, base_resolution=4, per_level_scale=2.0)
    scale = cfg.level_scales[0]  # 3.0
    res = cfg.level_resolutions[0]  # 4
    table = jax.random.normal(jax.random.PRNGKey(2), (cfg.total_params, 2))
    # pick vertices: pos = x*scale + 0.5 must be integral -> x = (k - 0.5)/scale
    ks = np.array([1, 2], dtype=np.float64)
    xs = (ks - 0.5) / scale
    pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    out = hg.hash_encode(table, jnp.asarray(pts, jnp.float32), cfg)
    # expected: table[ x + y*res + z*res^2 ]
    gi = np.floor(pts * scale + 0.5).astype(int)
    idx = gi[:, 0] + gi[:, 1] * res + gi[:, 2] * res * res
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(table)[idx], rtol=1e-5, atol=1e-6
    )


def test_encode_is_continuous():
    cfg = _cfg()
    table = hg.init_hash_table(jax.random.PRNGKey(3), cfg) * 1e4  # O(1) features
    x = jnp.asarray([[0.3, 0.5, 0.7]])
    eps = 1e-5
    a = hg.hash_encode(table, x, cfg)
    b = hg.hash_encode(table, x + eps, cfg)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-2


def test_hash_table_gradient_scatter_add():
    """Backward through the encoding is a scatter-add into touched entries."""
    cfg = _cfg(n_levels=2)
    table = hg.init_hash_table(jax.random.PRNGKey(4), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5), (16, 3))

    def loss(t):
        return jnp.sum(hg.hash_encode(t, x, cfg))

    grad = jax.grad(loss)(table)
    # gradient sums to (number of points) per level per feature: interpolation
    # weights sum to 1 per point-level
    per_level = []
    for lvl in range(cfg.n_levels):
        o, s = cfg.level_offsets[lvl], cfg.level_sizes[lvl]
        per_level.append(np.asarray(jnp.sum(grad[o : o + s], axis=0)))
    np.testing.assert_allclose(np.stack(per_level), 16.0, rtol=1e-5)


def test_2d_hash_grid():
    cfg = _cfg(n_dims=2, n_levels=3)
    table = hg.init_hash_table(jax.random.PRNGKey(6), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(7), (10, 2))
    out = hg.hash_encode(table, x, cfg)
    assert out.shape == (10, 6)


def test_segment_sum_sorted_bf16_packed_path(monkeypatch):
    """The large-contribution sort path packs (f32, f32) payloads into one
    bf16-pair word; result must equal the unpacked path at bf16 precision."""
    from atmonr_tpu.models import hash_grid as hg

    rng = np.random.default_rng(0)
    m, t = 4096, 64
    idx = jnp.asarray(rng.integers(0, t, m, dtype=np.int32))
    vals = jnp.asarray(rng.normal(size=(m, 2)).astype(np.float32))

    exact = hg._segment_sum_sorted(idx, vals, t)
    monkeypatch.setattr(hg, "_PACK_BF16_SORT_THRESHOLD", 1)
    packed = hg._segment_sum_sorted(idx, vals, t)
    # bf16 rounding of the CONTRIBUTIONS only; accumulation stays f32
    np.testing.assert_allclose(np.asarray(packed), np.asarray(exact),
                               rtol=2e-2, atol=2e-2)
    ref = hg._segment_sum_sorted(
        idx, jnp.asarray(np.asarray(vals, np.float32)).astype(jnp.bfloat16).astype(jnp.float32), t
    )
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_dense_tile_layout_covers_every_corner_cube():
    """build_dense_tiles: row (t_z,t_y,t_x) must hold entry (x,y,z) at slot
    (l_z,l_y,l_x) for every in-window coordinate, and every clipped base
    coordinate's 2x2x2 corner cube must lie inside tile b // S."""
    res, f = 7, 2
    key = jax.random.PRNGKey(0)
    level = jax.random.normal(key, (res**3, f))
    tiles = np.asarray(hg.build_dense_tiles(level, res, 3))
    nt = hg._n_tiles(res)
    lvl = np.asarray(level).reshape(res, res, res, f)  # (z, y, x, f)
    W, S = hg._TILE_W, hg._TILE_S
    for tz in range(nt):
        for ty in range(nt):
            for tx in range(nt):
                row = tiles[(tz * nt + ty) * nt + tx].reshape(W, W, W, f)
                for lz in range(W):
                    for ly in range(W):
                        for lx in range(W):
                            z, y, x = S * tz + lz, S * ty + ly, S * tx + lx
                            if z < res and y < res and x < res:
                                np.testing.assert_array_equal(
                                    row[lz, ly, lx], lvl[z, y, x]
                                )
    # coverage: for every base b in [0, res-2], b and b+1 fit tile b // S
    for b in range(res - 1):
        t = b // S
        assert S * t <= b and b + 1 <= S * t + W - 1


def test_dense_tiled_encode_matches_per_corner():
    """The overlapped-tile fetch + separable contraction equals the
    per-corner gather up to f32 summation order — for f32 and the bf16-row
    fallback alike, including out-of-range positions that clamp. The
    "auto" gate engages only beyond the Pallas table limit (2^16), where
    the XLA gather fallback is the hot path."""
    assert not hg._use_dense_tiles(_cfg(log2_hashmap_size=12), 0)  # gated
    key = jax.random.PRNGKey(1)
    cfg_on = _cfg(n_levels=6, log2_hashmap_size=17)  # mix of dense + hashed
    cfg_off = _cfg(n_levels=6, log2_hashmap_size=17, dense_tile="off")
    assert any(hg._use_dense_tiles(cfg_on, l) for l in range(6))
    assert any(not cfg_on.level_is_dense(l) for l in range(6))
    table = hg.init_hash_table(key, cfg_on)
    x = jax.random.uniform(
        jax.random.PRNGKey(2), (257, 3), minval=-0.2, maxval=1.2
    )
    out_on = hg._hash_encode_impl(table, x, cfg_on)
    out_off = hg._hash_encode_impl(table, x, cfg_off)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), rtol=1e-5, atol=1e-7
    )

    bf_on = hg._hash_encode_impl(table.astype(jnp.bfloat16), x, cfg_on)
    bf_off = hg._hash_encode_impl(table.astype(jnp.bfloat16), x, cfg_off)
    np.testing.assert_allclose(
        np.asarray(bf_on), np.asarray(bf_off), rtol=1e-5, atol=1e-6
    )


def test_dense_tiled_encode_gradients_unchanged():
    """The custom-VJP table gradient is fetch-path independent: grads with
    dense_tile on == off."""
    cfg_on = _cfg(n_levels=3, log2_hashmap_size=17, dense_tile="on")
    cfg_off = _cfg(n_levels=3, log2_hashmap_size=17, dense_tile="off")
    table = hg.init_hash_table(jax.random.PRNGKey(3), cfg_on)
    x = jax.random.uniform(jax.random.PRNGKey(4), (64, 3))

    def loss(t, cfg):
        return jnp.sum(hg.hash_encode(t, x, cfg) ** 2)

    g_on = jax.grad(lambda t: loss(t, cfg_on))(table)
    g_off = jax.grad(lambda t: loss(t, cfg_off))(table)
    np.testing.assert_allclose(
        np.asarray(g_on), np.asarray(g_off), rtol=1e-6, atol=1e-8
    )


def _per_corner_oracle(table, x, cfg):
    """Reference encode built directly from level_indices: gather each
    corner row and weight-sum. level_indices is hashed_tile-aware, so this
    cross-validates the bucket/slot math of the fast wide-row forward."""
    outs = []
    for level in range(cfg.n_levels):
        idx, w = hg.level_indices(x, cfg, level)
        feats = table[cfg.level_offsets[level] + idx]
        outs.append(jnp.sum(feats.astype(w.dtype) * w[..., None], axis=1))
    return jnp.concatenate(outs, axis=-1)


def test_hashed_tile_gating_and_geometry():
    cfg = _cfg()  # default: off
    assert not any(hg._use_hashed_tiles(cfg, l) for l in range(cfg.n_levels))
    cfg_on = _cfg(hashed_tile="on")
    # engages exactly on the hashed 3-D levels (2, 3 at this geometry)
    assert [hg._use_hashed_tiles(cfg_on, l) for l in range(4)] == [
        False, False, True, True,
    ]
    # 2-D grids keep per-corner hashing
    assert not hg._use_hashed_tiles(_cfg(n_dims=2, hashed_tile="on"), 2)
    # parameter count/layout unchanged: the level slice is reinterpreted,
    # not resized
    assert cfg_on.level_sizes == cfg.level_sizes
    assert cfg_on.total_params == cfg.total_params


def test_hashed_tile_forward_matches_level_indices_oracle():
    """The one-fetch bucket-row forward equals the per-corner gather under
    the SAME (window-hashed) indexing, to f32 summation order — including
    out-of-range positions that clamp."""
    cfg = _cfg(hashed_tile="on")
    table = hg.init_hash_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (301, 3), minval=-0.2, maxval=1.2
    )
    fast = hg._hash_encode_impl(table, x, cfg)
    oracle = _per_corner_oracle(table, x, cfg)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(oracle), rtol=1e-5, atol=1e-7
    )


def test_hashed_tile_changes_hashed_levels_only():
    """Dense levels are identical to the per-cell model; hashed levels
    genuinely change (different collision structure)."""
    cfg_on = _cfg(hashed_tile="on")
    cfg_off = _cfg()
    table = hg.init_hash_table(jax.random.PRNGKey(2), cfg_on)
    x = jax.random.uniform(jax.random.PRNGKey(3), (64, 3))
    f = cfg_on.n_features_per_level
    out_on = np.asarray(hg._hash_encode_impl(table, x, cfg_on))
    out_off = np.asarray(hg._hash_encode_impl(table, x, cfg_off))
    np.testing.assert_allclose(
        out_on[:, : 2 * f], out_off[:, : 2 * f], rtol=1e-5, atol=1e-7
    )
    assert np.abs(out_on[:, 2 * f :] - out_off[:, 2 * f :]).max() > 0


def test_hashed_tile_gradient_matches_oracle_and_weight_sum():
    """The custom VJP's sorted-scatter table gradient under hashed_tile
    equals autodiff of the per-corner oracle, and interpolation weights
    still sum to 1 per point-level (the scatter-add invariant)."""
    cfg = _cfg(hashed_tile="on", n_levels=3)
    table = hg.init_hash_table(jax.random.PRNGKey(4), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5), (48, 3))

    g_fast = jax.grad(lambda t: jnp.sum(hg.hash_encode(t, x, cfg) ** 2))(
        table
    )
    g_oracle = jax.grad(
        lambda t: jnp.sum(_per_corner_oracle(t, x, cfg) ** 2)
    )(table)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_oracle), rtol=1e-5, atol=1e-8
    )

    g_ones = jax.grad(lambda t: jnp.sum(hg.hash_encode(t, x, cfg)))(table)
    for lvl in range(cfg.n_levels):
        o, s = cfg.level_offsets[lvl], cfg.level_sizes[lvl]
        np.testing.assert_allclose(
            np.asarray(jnp.sum(g_ones[o : o + s], axis=0)), 48.0, rtol=1e-5
        )


def test_hashed_tile_continuous_within_window():
    """Within one storage window the field stays continuous (the model's
    discontinuities live only at window seams)."""
    cfg = _cfg(hashed_tile="on", n_levels=3)
    table = hg.init_hash_table(jax.random.PRNGKey(6), cfg) * 1e4
    x = jnp.asarray([[0.31, 0.52, 0.73]])
    a = hg.hash_encode(table, x, cfg)
    b = hg.hash_encode(table, x + 1e-5, cfg)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-2


def test_chunked_encode_matches_unchunked(monkeypatch):
    """Above _POINT_CHUNK the encode runs as a lax.map over chunks; outputs
    must match the unchunked path for per-corner, dense-tile and
    hashed-tile configs alike (shrunken chunk size so the test is small)."""
    monkeypatch.setattr(hg, "_POINT_CHUNK", 64)
    for kw in (
        dict(),
        dict(log2_hashmap_size=17, dense_tile="on"),
        dict(hashed_tile="on"),
    ):
        cfg = _cfg(n_levels=3, **kw)
        table = hg.init_hash_table(jax.random.PRNGKey(7), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(8), (200, 3))
        big = hg.hash_encode(table, x, cfg)  # 200 > 64: chunked
        small = jnp.concatenate(
            [hg.hash_encode(table, x[i : i + 50], cfg) for i in range(0, 200, 50)]
        )
        np.testing.assert_allclose(
            np.asarray(big), np.asarray(small), rtol=1e-5, atol=1e-7
        ), kw

        g_big = jax.grad(lambda t: jnp.sum(hg.hash_encode(t, x, cfg) ** 2))(
            table
        )
        g_small = jax.grad(
            lambda t: sum(
                jnp.sum(hg.hash_encode(t, x[i : i + 50], cfg) ** 2)
                for i in range(0, 200, 50)
            )
        )(table)
        np.testing.assert_allclose(
            np.asarray(g_big), np.asarray(g_small), rtol=1e-5, atol=1e-7
        ), kw
