"""MLPs as explicit parameter pytrees with pure apply functions.

- ``AtmoNeRF``: the 11-layer NeRF MLP with positional skip connection,
  density head, and view-dependent color head (parity with reference
  ``models/nerf.py:6-144`` including Kaiming fan-out init and the
  training-time Gaussian density noise, which here takes an explicit key).
- ``small_mlp``: the narrow ReLU MLPs that replace tiny-cuda-nn's
  ``FullyFusedMLP`` (reference instant_ngp.py:64-85). On TPU these are plain
  bf16/f32 matmuls XLA fuses; the Pallas fused path lives in
  ``atmonr_tpu.ops.fused_mlp``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _kaiming_fan_out(key, out_dim: int, in_dim: int, dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_(mode='fan_out') for a (out, in) weight."""
    std = (2.0 / out_dim) ** 0.5
    return std * jax.random.normal(key, (out_dim, in_dim), dtype=dtype)


def _torch_linear_bias(key, out_dim: int, in_dim: int, dtype=jnp.float32):
    """torch.nn.Linear default bias init U(-1/sqrt(in), 1/sqrt(in))."""
    bound = 1.0 / (in_dim**0.5)
    return jax.random.uniform(
        key, (out_dim,), minval=-bound, maxval=bound, dtype=dtype
    )


def linear_init(key, out_dim: int, in_dim: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    return {
        "w": _kaiming_fan_out(kw, out_dim, in_dim, dtype),
        "b": _torch_linear_bias(kb, out_dim, in_dim, dtype),
    }


def linear_apply(p, x):
    """y = x @ W^T + b (torch Linear convention, W stored (out, in))."""
    return x @ p["w"].T + p["b"]


# ---------------------------------------------------------------------------
# AtmoNeRF
# ---------------------------------------------------------------------------


def atmonerf_layer_dims(
    pos_channels: int,
    dir_channels: int,
    out_channels: int,
    volume_channels: int,
    hidden_dim: int,
) -> list[tuple[int, int]]:
    """(out, in) dims of fc1..fc11, reference models/nerf.py:33-43."""
    h = hidden_dim
    return [
        (h, pos_channels),  # fc1
        (h, h),  # fc2
        (h, h),  # fc3
        (h, h),  # fc4
        (h, h),  # fc5
        (h, h + pos_channels),  # fc6 (skip concat)
        (h, h),  # fc7
        (h, h),  # fc8
        (h + volume_channels, h),  # fc9
        (h // 2, h + dir_channels),  # fc10
        (out_channels, h // 2),  # fc11
    ]


def atmonerf_init(
    key: jax.Array,
    pos_channels: int,
    dir_channels: int,
    out_channels: int,
    volume_channels: int,
    hidden_dim: int = 256,
) -> dict:
    dims = atmonerf_layer_dims(
        pos_channels, dir_channels, out_channels, volume_channels, hidden_dim
    )
    keys = jax.random.split(key, len(dims))
    return {
        f"fc{i + 1}": linear_init(k, o, i_)
        for i, (k, (o, i_)) in enumerate(zip(keys, dims))
    }


def atmonerf_forward_pos_only(
    params: dict, x_pos: jax.Array, noise_key: jax.Array | None = None
):
    """Position branch up to the density head.

    Returns (features (M, hidden+vol), sigma (M, vol)); with ``noise_key``
    set, standard-normal noise is added to sigma pre-ReLU (training-time
    regularization, reference models/nerf.py:70-71). Layer dimensions are
    derived from the weight shapes so the params pytree stays pure arrays
    (grad/optax-safe).
    """
    hidden = params["fc1"]["w"].shape[0]
    relu = jax.nn.relu
    x = relu(linear_apply(params["fc1"], x_pos))
    x = relu(linear_apply(params["fc2"], x))
    x = relu(linear_apply(params["fc3"], x))
    x = relu(linear_apply(params["fc4"], x))
    x = relu(linear_apply(params["fc5"], x))
    x = jnp.concatenate([x, x_pos], axis=1)  # skip connection
    x = relu(linear_apply(params["fc6"], x))
    x = relu(linear_apply(params["fc7"], x))
    x = relu(linear_apply(params["fc8"], x))
    x = linear_apply(params["fc9"], x)
    sigma = x[:, hidden:]
    if noise_key is not None:
        sigma = sigma + jax.random.normal(noise_key, sigma.shape, sigma.dtype)
    sigma = relu(sigma)
    return x, sigma


def atmonerf_apply(
    params: dict, x: jax.Array, noise_key: jax.Array | None = None
):
    """Full forward: x = [pos_enc | dir_enc] -> (color, sigma).

    Parity: reference models/nerf.py:75-93 (sigmoid color head; exp-clamp
    color activation is applied by the pipeline, not here).
    """
    pos_ch = params["fc1"]["w"].shape[1]
    hidden = params["fc1"]["w"].shape[0]
    x_pos, d = x[:, :pos_ch], x[:, pos_ch:]
    feats, sigma = atmonerf_forward_pos_only(params, x_pos, noise_key)
    h = jnp.concatenate([feats[:, :hidden], d], axis=1)
    h = jax.nn.relu(linear_apply(params["fc10"], h))
    color = jax.nn.sigmoid(linear_apply(params["fc11"], h))
    return color, sigma


def atmonerf_channel_counts(
    L_x: int | Sequence[int], L_d: int, include_height: bool
) -> tuple[int, int]:
    """(pos_channels, dir_channels) math, reference models/nerf.py:116-127."""
    if isinstance(L_x, int):
        pos_channels = L_x * 6
        if include_height:
            pos_channels += L_x * 2
    else:
        assert (include_height and len(L_x) == 4) or (
            not include_height and len(L_x) == 3
        )
        pos_channels = sum(L_x) * 2
    return pos_channels, L_d * 6


def get_nerf_models(
    key: jax.Array,
    hidden_dim: int,
    N_lambda: int,
    L_x: int | Sequence[int],
    L_d: int,
    include_height: bool,
) -> tuple[dict, dict]:
    """Coarse (1 density channel) and fine (per-band density) AtmoNeRFs.

    Parity: reference models/nerf.py:96-144.
    """
    pos_ch, dir_ch = atmonerf_channel_counts(L_x, L_d, include_height)
    kc, kf = jax.random.split(key)
    nerf_c = atmonerf_init(kc, pos_ch, dir_ch, N_lambda, 1, hidden_dim)
    nerf_f = atmonerf_init(kf, pos_ch, dir_ch, N_lambda, N_lambda, hidden_dim)
    return nerf_c, nerf_f


# ---------------------------------------------------------------------------
# Small (tcnn-style) MLPs
# ---------------------------------------------------------------------------


def small_mlp_init(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    n_neurons: int,
    n_hidden_layers: int,
    dtype=jnp.float32,
) -> dict:
    """Narrow ReLU MLP: in -> [n_neurons]*n_hidden_layers -> out (no output
    activation), the role tcnn's FullyFusedMLP plays in the reference.

    Xavier-uniform init (tcnn's default for its network weights).
    """
    dims = [(n_neurons, in_dim)]
    for _ in range(n_hidden_layers):
        dims.append((n_neurons, n_neurons))
    dims.append((out_dim, n_neurons))
    keys = jax.random.split(key, len(dims))
    layers = []
    for k, (o, i) in zip(keys, dims):
        bound = (6.0 / (i + o)) ** 0.5
        layers.append(
            {
                "w": jax.random.uniform(
                    k, (o, i), minval=-bound, maxval=bound, dtype=dtype
                )
            }
        )
    return {"layers": layers}


def small_mlp_apply(params: dict, x: jax.Array, compute_dtype=None) -> jax.Array:
    """Forward through the narrow MLP; ReLU between layers, linear output.

    ``compute_dtype`` (e.g. bfloat16) casts weights+activations for the
    matmul chain while returning the final output in the input dtype —
    mirrors tcnn's fp16 tensor-core compute on the TPU MXU.
    """
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        w = layer["w"]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        x = x @ w.T
        if i < n - 1:
            x = jax.nn.relu(x)
    return x.astype(in_dtype)
