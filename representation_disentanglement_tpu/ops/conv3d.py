"""3D convolution primitives (NDHWC) + group norm, for the volumetric stack.

Reference: the Myronenko-style 3D U-Net + VAE (src/model.py:1856-2060) uses
nn.Conv3d / nn.GroupNorm(8) / nearest Upsample.  Layout here is
``[B, D, H, W, C]`` — depth leading among spatial dims so the
depth-sharded (context-parallel) path in parallel/halo.py can shard dim 1.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

DN3 = ("NDHWC", "DHWIO", "NDHWC")

# When set (inside a shard_map over the depth axis), conv3d/group_norm/
# global_mean3d switch to halo-exchange / psum variants so the SAME model
# code runs depth-sharded (the imaging analogue of context parallelism,
# SURVEY §5.7).
_DEPTH_AXIS: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "rdt_depth_axis", default=None)


@contextlib.contextmanager
def depth_sharded(axis_name: str):
    tok = _DEPTH_AXIS.set(axis_name)
    try:
        yield
    finally:
        _DEPTH_AXIS.reset(tok)


def current_depth_axis() -> Optional[str]:
    """The active depth-shard mesh axis, or None outside a
    ``depth_sharded`` scope (used by shard-aware loss reductions)."""
    return _DEPTH_AXIS.get()


def _halo_exchange_d(x: jnp.ndarray, halo: int, axis_name: str):
    """Concatenate `halo` depth slices from each neighbor (zeros at the
    global volume boundary — ppermute leaves non-receivers zero-filled)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        z = jnp.zeros_like(x[:, :halo])
        return jnp.concatenate([z, x, z], axis=1)
    # my last `halo` slices -> right neighbor's left halo
    left_halo = lax.ppermute(x[:, -halo:], axis_name,
                             [(i, i + 1) for i in range(n - 1)])
    # my first `halo` slices -> left neighbor's right halo
    right_halo = lax.ppermute(x[:, :halo], axis_name,
                              [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([left_halo, x, right_halo], axis=1)


def _triple(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


def conv3d(x: jnp.ndarray, w: jnp.ndarray, b=None, stride=1, padding=1,
           preferred_dtype=jnp.float32) -> jnp.ndarray:
    """x: [B, D, H, W, Ci]; w: [kd, kh, kw, Ci, Co].

    Inside a ``depth_sharded`` scope, the depth padding is realized by a
    one-hop halo exchange (ppermute over ICI) followed by a VALID conv on D
    — exact for kernels with kd//2 <= depth padding (kd in {1, 3} here).
    Requires the local depth to be stride-aligned (shards of even length for
    stride 2), which holds for power-of-two shard counts."""
    stride = _triple(stride)
    if isinstance(padding, int):
        padding = [(padding, padding)] * 3
    else:
        padding = [(p, p) if isinstance(p, int) else tuple(p)
                   for p in padding]
    axis = _DEPTH_AXIS.get()
    if axis is not None and padding[0][0] > 0:
        halo = padding[0][0]
        assert w.shape[0] == 2 * halo + 1, "halo path expects kd == 2*pad+1"
        x = _halo_exchange_d(x, halo, axis)
        padding = [(0, 0), padding[1], padding[2]]
    pref = preferred_dtype if x.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=DN3, preferred_element_type=pref)
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int = 8, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.GroupNorm parity on [..., C]: normalize per (sample, group)
    over all spatial dims + the group's channels.  Depth-sharded: the
    (mean, mean-of-squares) reductions psum over the depth axis so the
    statistics are global."""
    c = x.shape[-1]
    g = num_groups
    lead = x.shape[:1]
    spatial = x.shape[1:-1]
    x32 = x.astype(jnp.float32).reshape(lead + (-1, g, c // g))
    axis = _DEPTH_AXIS.get()
    if axis is None:
        mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
        msq = jnp.mean(jnp.square(x32), axis=(1, 3), keepdims=True)
    else:
        n = lax.axis_size(axis)
        mean = lax.pmean(jnp.mean(x32, axis=(1, 3), keepdims=True), axis)
        msq = lax.pmean(jnp.mean(jnp.square(x32), axis=(1, 3),
                                 keepdims=True), axis)
        del n
    var = msq - jnp.square(mean)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(lead + spatial + (c,))
    return (y * scale + bias).astype(x.dtype)


def global_mean3d(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over (D, H, W); psums over the depth axis when sharded
    (AdaptiveAvgPool3d(1) equivalent, src/model.py:1893)."""
    m = jnp.mean(x, axis=(1, 2, 3))
    axis = _DEPTH_AXIS.get()
    if axis is not None:
        m = lax.pmean(m, axis)
    return m


def upsample3d_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """torch nn.Upsample(scale_factor=2) default (nearest) for 3D."""
    for ax in (1, 2, 3):
        x = jnp.repeat(x, factor, axis=ax)
    return x
