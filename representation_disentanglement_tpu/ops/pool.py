"""Pooling via lax.reduce_window (NHWC / [..., H, W, C])."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _window(x_ndim: int, k, s):
    if isinstance(k, int):
        k = (k, k)
    if s is None:
        s = k
    if isinstance(s, int):
        s = (s, s)
    dims = [1] * x_ndim
    strides = [1] * x_ndim
    dims[-3], dims[-2] = k[0], k[1]
    strides[-3], strides[-2] = s[0], s[1]
    return dims, strides


def max_pool(x: jnp.ndarray, kernel, stride=None) -> jnp.ndarray:
    """torch F.max_pool2d parity (VALID padding, stride defaults to kernel)."""
    dims, strides = _window(x.ndim, kernel, stride)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")


def avg_pool(x: jnp.ndarray, kernel, stride=None) -> jnp.ndarray:
    """torch F.avg_pool2d parity (VALID padding, full-window divisor)."""
    dims, strides = _window(x.ndim, kernel, stride)
    s = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add, dims, strides,
                          "VALID")
    k = dims[-3] * dims[-2]
    return (s / k).astype(x.dtype)
