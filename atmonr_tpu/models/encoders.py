"""Input encoders: NeRF frequency encoding, spherical harmonics, composites.

- ``positional_encoding`` has exact layout parity with reference
  ``encoders.py:4-28`` including the different channel orders of the scalar-L
  (per-frequency sin/cos interleave) and per-axis-list-L (sin block then cos
  block per axis) variants.
- ``spherical_harmonics`` replaces tiny-cuda-nn's CUDA ``SphericalHarmonics``
  encoding (reference instant_ngp.py:69-72): a closed-form polynomial basis,
  trivially fused by XLA — no kernel needed on TPU. It reproduces tcnn's
  input convention (inputs treated as [0,1]-scaled and mapped by x*2-1),
  which the reference inherits by feeding raw unit vectors to tcnn.
- ``CompositeEncoder`` replaces tcnn's ``Composite``/``Identity`` encodings
  (config-driven slicing of input dims into nested encoders).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp


def positional_encoding(pts: jax.Array, L: int | Sequence[int]) -> jax.Array:
    """NeRF sin/cos frequency encoding; scalar or per-axis frequency counts.

    Scalar ``L``: flattens to (M, D) and returns (M, D, 2L) with per-frequency
    interleaved [sin_l, cos_l]. List ``L`` (e.g. [14, 14, 10] = lower altitude
    frequency): keeps leading shape, returns (..., 2*sum(L)) with per-axis
    [sin_0..sin_{L-1}, cos_0..cos_{L-1}] blocks. Parity: reference
    encoders.py:4-28.
    """
    if isinstance(L, int):
        flat = jnp.reshape(pts, (-1, pts.shape[-1]))
        freqs = (2.0 ** jnp.arange(L, dtype=flat.dtype)) * jnp.pi
        x = flat[..., None] * freqs[None, None, :]  # (M, D, L)
        enc = jnp.stack([jnp.sin(x), jnp.cos(x)], axis=-1)  # (M, D, L, 2)
        return jnp.reshape(enc, (enc.shape[0], enc.shape[1], -1))
    parts = []
    for i, num_freqs in enumerate(L):
        freqs = (2.0 ** jnp.arange(num_freqs, dtype=pts.dtype)) * jnp.pi
        x = pts[..., i, None] * freqs
        parts.append(jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1))
    return jnp.concatenate(parts, axis=-1)


# tcnn-order real spherical harmonics constants (degrees 1..4).
def _sh_l0(x, y, z):
    return [jnp.full_like(x, 0.28209479177387814)]


def _sh_l1(x, y, z):
    return [
        -0.48860251190291987 * y,
        0.48860251190291992 * z,
        -0.48860251190291987 * x,
    ]


def _sh_l2(x, y, z):
    xy, yz, xz = x * y, y * z, x * z
    x2, y2, z2 = x * x, y * y, z * z
    return [
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * z2 - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * x2 - 0.54627421529603959 * y2,
    ]


def _sh_l3(x, y, z):
    xy, yz, xz = x * y, y * z, x * z
    x2, y2, z2 = x * x, y * y, z * z
    return [
        0.59004358992664352 * y * (-3.0 * x2 + y2),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * z2),
        0.3731763325901154 * z * (5.0 * z2 - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * z2),
        1.4453057213202769 * z * (x2 - y2),
        0.59004358992664352 * x * (-x2 + 3.0 * y2),
    ]


def spherical_harmonics(
    v: jax.Array, degree: int, tcnn_input_convention: bool = True
) -> jax.Array:
    """Real spherical-harmonics basis of ``v``, tcnn component order.

    ``degree`` follows tcnn: total outputs = degree**2 (degree 2 -> 4 dims).
    With ``tcnn_input_convention`` the input is treated as [0,1]-scaled and
    mapped by ``x*2-1`` before basis evaluation — the convention the
    reference inherits by passing raw unit direction vectors to tcnn
    (instant_ngp.py:165-171); keep it on for behavioral parity.
    """
    assert 1 <= degree <= 4
    if tcnn_input_convention:
        v = v * 2.0 - 1.0
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    comps = _sh_l0(x, y, z)
    if degree >= 2:
        comps += _sh_l1(x, y, z)
    if degree >= 3:
        comps += _sh_l2(x, y, z)
    if degree >= 4:
        comps += _sh_l3(x, y, z)
    return jnp.stack(comps, axis=-1)


@dataclass(frozen=True)
class EncoderSpec:
    """One nested entry of a composite encoding config (tcnn schema).

    ``otype`` in {"SphericalHarmonics", "Identity", "HashGrid", "Frequency"};
    ``n_dims_to_encode`` slices the input (None = all remaining dims).
    """

    otype: str
    n_dims_to_encode: int | None = None
    options: dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def from_config(cfg: dict) -> "EncoderSpec":
        cfg = dict(cfg)
        otype = cfg.pop("otype")
        n_dims = cfg.pop("n_dims_to_encode", None)
        return EncoderSpec(otype=otype, n_dims_to_encode=n_dims, options=cfg)


def composite_output_dim(specs: Sequence[EncoderSpec], n_input_dims: int) -> int:
    """Output dimensionality of a composite encoding over ``n_input_dims``."""
    from atmonr_tpu.models import hash_grid as hg

    total, consumed = 0, 0
    for spec in specs:
        n_dims = spec.n_dims_to_encode
        if n_dims is None:
            n_dims = n_input_dims - consumed
        consumed += n_dims
        if spec.otype == "SphericalHarmonics":
            total += int(spec.options["degree"]) ** 2
        elif spec.otype == "Identity":
            total += n_dims
        elif spec.otype == "HashGrid":
            total += int(spec.options["n_levels"]) * int(
                spec.options["n_features_per_level"]
            )
        elif spec.otype == "Frequency":
            total += 2 * int(spec.options["n_frequencies"]) * n_dims
        else:
            raise NotImplementedError(spec.otype)
    assert consumed <= n_input_dims
    return total


def parse_encoding_config(cfg: dict) -> list[EncoderSpec]:
    """Parse a tcnn-style encoding config (possibly ``Composite``) into specs.

    Accepts the reference's config JSON unchanged (configs/instant_ngp.json).
    """
    if cfg.get("otype") == "Composite":
        return [EncoderSpec.from_config(c) for c in cfg["nested"]]
    return [EncoderSpec.from_config(cfg)]


def init_composite(
    key: jax.Array, specs: Sequence[EncoderSpec], n_input_dims: int
) -> list[dict]:
    """Initialize parameters (hash tables) for a composite encoding."""
    from atmonr_tpu.models import hash_grid as hg

    params: list[dict] = []
    consumed = 0
    for spec in specs:
        n_dims = spec.n_dims_to_encode
        if n_dims is None:
            n_dims = n_input_dims - consumed
        consumed += n_dims
        if spec.otype == "HashGrid":
            key, sub = jax.random.split(key)
            cfg = hg.HashGridConfig.from_options(spec.options, n_dims)
            params.append({"hash_table": hg.init_hash_table(sub, cfg)})
        else:
            params.append({})
    return params


def apply_composite(
    params: Sequence[dict],
    specs: Sequence[EncoderSpec],
    x: jax.Array,
) -> jax.Array:
    """Apply a composite encoding to (M, n_input_dims) inputs."""
    from atmonr_tpu.models import hash_grid as hg

    outs = []
    consumed = 0
    for spec, p in zip(specs, params):
        n_dims = spec.n_dims_to_encode
        if n_dims is None:
            n_dims = x.shape[-1] - consumed
        xs = x[..., consumed : consumed + n_dims]
        consumed += n_dims
        if spec.otype == "SphericalHarmonics":
            outs.append(spherical_harmonics(xs, int(spec.options["degree"])))
        elif spec.otype == "Identity":
            outs.append(xs)
        elif spec.otype == "HashGrid":
            cfg = hg.HashGridConfig.from_options(spec.options, n_dims)
            outs.append(hg.hash_encode(p["hash_table"], xs, cfg))
        elif spec.otype == "Frequency":
            nf = int(spec.options["n_frequencies"])
            enc = positional_encoding(xs, nf)
            outs.append(jnp.reshape(enc, (enc.shape[0], -1)))
        else:
            raise NotImplementedError(spec.otype)
    return jnp.concatenate(outs, axis=-1)
