"""Fused Pallas hash-encode kernel vs the pure-JAX reference forward.

Runs in pallas interpret mode on the CPU test platform; the same code path
compiles to Mosaic on TPU (gated by ``hash_gather_pallas.supported``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atmonr_tpu.models.hash_grid import (
    HashGridConfig,
    _hash_encode_impl,
    init_hash_table,
)
from atmonr_tpu.ops.hash_gather_pallas import (
    hash_encode_pallas_fwd,
    pack_tables,
    supported,
)


@pytest.fixture(scope="module")
def cfg():
    # mixes dense levels (4^3, 6^3, ...) and hashed levels at 2^9 entries
    return HashGridConfig(
        n_dims=3,
        n_levels=4,
        n_features_per_level=2,
        log2_hashmap_size=9,
        base_resolution=4,
        per_level_scale=1.5,
    )


@pytest.fixture(scope="module")
def table(cfg):
    return init_hash_table(jax.random.PRNGKey(0), cfg)


def test_supported_gate(cfg):
    assert supported(cfg)
    # 2-D grids (the surface branch) are supported too; 4-D are not
    assert supported(HashGridConfig(n_dims=2, n_levels=4, log2_hashmap_size=9))
    assert not supported(HashGridConfig(n_dims=4, n_levels=4, log2_hashmap_size=9))
    assert not supported(
        HashGridConfig(n_dims=3, n_levels=4, log2_hashmap_size=19, base_resolution=64)
    )
    # bf16 packing requires exactly 2 features/level
    assert not supported(
        HashGridConfig(n_dims=3, n_levels=4, n_features_per_level=4,
                       log2_hashmap_size=9),
        mode="bf16",
    )


def test_pack_tables_roundtrip(table, cfg):
    packed, offs, counts, scales = pack_tables(table, cfg, "f32")
    assert scales is None
    assert packed.shape[0] == 2 and packed.shape[2] == 128
    assert offs[0] == 0 and len(offs) == len(counts) == cfg.n_levels
    assert packed.shape[1] == sum(counts)
    # level 0 is dense 4x4x4 = 64 entries, padded to one 128-chunk
    w0 = jax.lax.bitcast_convert_type(packed[0, 0, :64], jnp.float32)
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(table[:64, 0]))


def test_pallas_fwd_f32_exact(table, cfg):
    x = jax.random.uniform(jax.random.PRNGKey(7), (300, 3))
    got = hash_encode_pallas_fwd(table, x, cfg, mode="f32")
    want = _hash_encode_impl(table, x, cfg)
    assert got.shape == want.shape == (300, cfg.n_output_dims)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-9)


def test_pallas_fwd_bf16_matches_rounded_table(table, cfg):
    x = jax.random.uniform(jax.random.PRNGKey(8), (300, 3))
    got = hash_encode_pallas_fwd(table, x, cfg, mode="bf16")
    rounded = table.astype(jnp.bfloat16).astype(jnp.float32)
    want = _hash_encode_impl(rounded, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-9)
    # and close to the exact f32 result at bf16 tolerance
    exact = _hash_encode_impl(table, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), rtol=2e-2, atol=1e-6)


def test_pallas_fwd_q8_matches_quantized_table(table, cfg):
    from atmonr_tpu.ops.hash_gather_pallas import quantize_level_q8

    x = jax.random.uniform(jax.random.PRNGKey(8), (300, 3))
    got = hash_encode_pallas_fwd(table, x, cfg, mode="q8")
    # reference: dequantize per level, then the exact XLA path
    parts = []
    for level in range(cfg.n_levels):
        q, s = quantize_level_q8(
            table, cfg.level_offsets[level], cfg.level_sizes[level]
        )
        parts.append(q.astype(jnp.float32) * s)
    deq = jnp.concatenate(parts, axis=0)
    want = _hash_encode_impl(deq, x, cfg)
    # same products, different scale-multiply order -> f32 roundoff only
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-9)
    # and close to the exact f32 result at int8 tolerance (scale = max|t|/127)
    exact = _hash_encode_impl(table, x, cfg)
    atol = float(jnp.max(jnp.abs(table))) / 127.0 * 8  # 8 corners
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=atol)


def test_pallas_fwd_f8_matches_quantized_table(table, cfg):
    from atmonr_tpu.ops.hash_gather_pallas import quantize_level_f8

    x = jax.random.uniform(jax.random.PRNGKey(8), (300, 3))
    got = hash_encode_pallas_fwd(table, x, cfg, mode="f8")
    parts = []
    for level in range(cfg.n_levels):
        f8, s = quantize_level_f8(
            table, cfg.level_offsets[level], cfg.level_sizes[level]
        )
        parts.append(f8.astype(jnp.float32) * s)
    deq = jnp.concatenate(parts, axis=0)
    want = _hash_encode_impl(deq, x, cfg)
    # same products, different scale-multiply order: near-cancelling sums
    # round differently, so allow absolute slack well below feature scale
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-8)
    # e4m3 keeps ~6% relative precision: compare against exact f32
    exact = _hash_encode_impl(table, x, cfg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(exact), rtol=0.2, atol=float(jnp.max(jnp.abs(table))) * 0.07
    )


def test_decode_e4m3_all_codes():
    """The in-kernel decoder matches XLA's float8_e4m3fn -> f32 for every
    code the encoder can emit (all 256 except the two NaN codes)."""
    from atmonr_tpu.ops.hash_gather_pallas import _decode_e4m3

    codes = np.arange(256, dtype=np.uint8)
    keep = (codes & 0x7F) != 0x7F  # e4m3fn NaN codes
    codes = codes[keep]
    want = jax.lax.bitcast_convert_type(
        jnp.asarray(codes), jnp.float8_e4m3fn
    ).astype(jnp.float32)
    got = _decode_e4m3(jnp.asarray(codes, jnp.uint32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_fwd_q8_2d():
    from atmonr_tpu.models.hash_grid import init_hash_table

    cfg2 = HashGridConfig(
        n_dims=2,
        n_levels=4,
        n_features_per_level=2,
        log2_hashmap_size=9,
        base_resolution=4,
        per_level_scale=1.5,
    )
    table2 = init_hash_table(jax.random.PRNGKey(3), cfg2)
    x = jax.random.uniform(jax.random.PRNGKey(12), (300, 2))
    got = hash_encode_pallas_fwd(table2, x, cfg2, mode="q8")
    exact = _hash_encode_impl(table2, x, cfg2)
    atol = float(jnp.max(jnp.abs(table2))) / 127.0 * 4
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=atol)


def test_pallas_fwd_out_of_range_positions(table, cfg):
    # positions slightly outside [0,1] must still agree (clamp/hash-wrap)
    x = jax.random.uniform(jax.random.PRNGKey(9), (64, 3), minval=-0.1, maxval=1.1)
    got = hash_encode_pallas_fwd(table, x, cfg, mode="f32")
    want = _hash_encode_impl(table, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-9)


def test_pallas_fwd_block_multiple(table, cfg):
    # exactly one kernel block, no padding path
    x = jax.random.uniform(jax.random.PRNGKey(10), (4096, 3))
    got = hash_encode_pallas_fwd(table, x, cfg, mode="f32")
    want = _hash_encode_impl(table, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-9)


def test_pallas_fwd_2d_exact():
    """2-D grids (the Instant-NGP surface branch) run the same kernel."""
    cfg2 = HashGridConfig(
        n_dims=2,
        n_levels=4,
        n_features_per_level=2,
        log2_hashmap_size=9,
        base_resolution=4,
        per_level_scale=1.5,
    )
    table2 = init_hash_table(jax.random.PRNGKey(3), cfg2)
    x = jax.random.uniform(jax.random.PRNGKey(11), (300, 2))
    got = hash_encode_pallas_fwd(table2, x, cfg2, mode="f32")
    want = _hash_encode_impl(table2, x, cfg2)
    assert got.shape == want.shape == (300, cfg2.n_output_dims)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-9)


def test_q8_stochastic_rounding(table, cfg):
    """SR quantization: within 1 LSB of deterministic, unbiased in
    expectation, and noise=None keeps the historical round-to-nearest."""
    from atmonr_tpu.ops.hash_gather_pallas import quantize_level_q8

    size = cfg.level_sizes[0]
    q_det, s_det = quantize_level_q8(table, 0, size)
    # noise=0.5 reproduces round-half-up; any noise stays within 1 LSB
    n_half = jnp.full(table.shape, 0.5)
    q_half, s_half = quantize_level_q8(table, 0, size, n_half)
    assert float(s_half) == float(s_det)
    assert int(jnp.max(jnp.abs(q_half - q_det))) <= 1
    # unbiased: mean of q*s over noise draws approaches the f32 values
    t = table[:size]
    acc = jnp.zeros_like(t)
    draws = 400
    for i in range(draws):
        u = jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(3), i),
                               table.shape)
        q, s = quantize_level_q8(table, 0, size, u)
        acc = acc + q * s
    err_lsb = jnp.max(jnp.abs(acc / draws - t)) / s_det
    assert float(err_lsb) < 0.2, float(err_lsb)


def test_hash_encode_sr_noise_grad_passthrough(table, cfg):
    """The sr_noise arg must not change the table gradient (the backward
    depends only on positions and cotangents) and must accept None."""
    import atmonr_tpu.models.hash_grid as hg

    x = jax.random.uniform(jax.random.PRNGKey(11), (64, 3))
    noise = jax.random.uniform(jax.random.PRNGKey(12), table.shape)
    g0 = jax.grad(lambda t: jnp.sum(hg.hash_encode(t, x, cfg)))(table)
    g1 = jax.grad(
        lambda t: jnp.sum(hg.hash_encode(t, x, cfg, False, noise))
    )(table)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1))
