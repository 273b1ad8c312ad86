"""Minimal functional NN primitives (params are pytrees of jnp arrays).

Initialization parity: the reference's layers use either torch defaults
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for Linear/Conv3d) or PyG's ``uniform(size,
tensor)`` (same bound with an explicit size) — reproduced here so freshly
initialized networks are statistically identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_linear(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True, init_size: int | None = None) -> dict:
    """Linear layer params: ``w [in, out]`` (+ ``b [out]``)."""
    bound = 1.0 / jnp.sqrt(init_size if init_size is not None else in_dim)
    wkey, bkey = jax.random.split(key)
    params = {"w": jax.random.uniform(wkey, (in_dim, out_dim), minval=-bound, maxval=bound, dtype=jnp.float32)}
    if bias:
        params["b"] = jax.random.uniform(bkey, (out_dim,), minval=-bound, maxval=bound, dtype=jnp.float32)
    return params


def linear(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    out = x @ params["w"]
    if "b" in params:
        out = out + params["b"]
    return out


def init_conv3d(key: jax.Array, in_ch: int, out_ch: int, ksize: int, bias: bool = True) -> dict:
    """Conv3d params: ``w [out, in, k, k, k]`` (+ ``b [out]``); torch default init."""
    fan_in = in_ch * ksize**3
    bound = 1.0 / jnp.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    params = {"w": jax.random.uniform(wkey, (out_ch, in_ch, ksize, ksize, ksize), minval=-bound, maxval=bound, dtype=jnp.float32)}
    if bias:
        params["b"] = jax.random.uniform(bkey, (out_ch,), minval=-bound, maxval=bound, dtype=jnp.float32)
    return params


def conv3d(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """VALID 3D convolution over ``x [N, C, W, H, D]`` (NCDHW layout, MXU path)."""
    out = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    if "b" in params:
        out = out + params["b"].reshape(1, -1, 1, 1, 1)
    return out


def max_pool3d(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """Max pooling with stride = window over ``x [N, C, W, H, D]``."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, window, window, window),
        window_strides=(1, 1, window, window, window),
        padding="VALID",
    )


def dropout(rng: jax.Array | None, x: jnp.ndarray, rate: float, training: bool) -> jnp.ndarray:
    """Inverted dropout (torch semantics)."""
    if not training or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


relu = jax.nn.relu
leaky_relu = jax.nn.leaky_relu
