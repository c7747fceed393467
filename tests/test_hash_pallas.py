"""Pallas chunked-VMEM hash-gather kernel vs the pure-JAX reference forward.

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
    gather_interp_level,
    hash_encode_pallas_fwd,
    pack_level_table,
    supported,
)


@pytest.fixture(scope="module")
def cfg():
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
    assert not supported(HashGridConfig(n_dims=2, n_levels=4, log2_hashmap_size=9))
    assert not supported(
        HashGridConfig(n_dims=3, n_levels=4, log2_hashmap_size=19, base_resolution=64)
    )


def test_gather_interp_level_matches_manual(table, cfg):
    level = cfg.n_levels - 1  # largest (hashed) level
    size = cfg.level_sizes[level]
    rng = np.random.default_rng(3)
    r = 256  # one block
    idx2 = jnp.asarray(rng.integers(0, size, size=(r, 128)), jnp.int32)
    w2 = jnp.asarray(rng.uniform(0, 1, size=(r, 128)), jnp.float32)
    packed = pack_level_table(table, cfg.level_offsets[level], size)

    out = gather_interp_level(packed, idx2, w2)  # (F, R, 16)

    t = np.asarray(table[cfg.level_offsets[level] : cfg.level_offsets[level] + size])
    weighted = t[np.asarray(idx2)] * np.asarray(w2)[..., None]  # (R, 128, F)
    expect = weighted.reshape(r, 16, 8, cfg.n_features_per_level).sum(axis=2)
    np.testing.assert_allclose(
        np.asarray(out), np.moveaxis(expect, -1, 0), rtol=1e-6, atol=1e-7
    )


def test_pallas_fwd_matches_reference_impl(table, cfg):
    x = jax.random.uniform(jax.random.PRNGKey(7), (300, 3))
    got = hash_encode_pallas_fwd(table, x, cfg)
    want = _hash_encode_impl(table, x, cfg)
    assert got.shape == want.shape == (300, cfg.n_output_dims)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7)


def test_pallas_fwd_out_of_range_positions(table, cfg):
    # positions slightly outside [0,1] must still agree (clamp/hash-wrap)
    x = jax.random.uniform(jax.random.PRNGKey(9), (64, 3), minval=-0.1, maxval=1.1)
    got = hash_encode_pallas_fwd(table, x, cfg)
    want = _hash_encode_impl(table, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7)
