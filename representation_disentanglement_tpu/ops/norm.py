"""Normalization primitives with exact torch semantics.

The reference uses ``nn.BatchNorm2d`` throughout the conv blocks
(src/model.py:2131-2132, 2179, 2646, 2695) and a parameter-free
``nn.InstanceNorm2d`` in SPADE (src/model.py:2431).  Torch details that
matter for numeric parity:

- BatchNorm normalizes with the *biased* batch variance but updates the
  running variance with the *unbiased* estimate (momentum 0.1, eps 1e-5).
- InstanceNorm2d defaults to ``affine=False, track_running_stats=False`` —
  it is a pure per-(sample, channel) standardization over (H, W).
- Because shared modules are invoked once per modality in sequence, their
  running stats receive M *ordered* EMA updates per step.  ``sequential_ema``
  reproduces that fold in closed form so we can batch all modalities into a
  single conv call and still match the reference's running statistics.
"""

from __future__ import annotations

import jax.numpy as jnp


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free InstanceNorm over the spatial dims of [..., H, W, C]."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(-3, -2), keepdims=True)
    return ((x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))).astype(x.dtype)


def batch_stats(x: jnp.ndarray, reduce_axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mean, biased var) over `reduce_axes` of x, computed in f32."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=reduce_axes)
    var = jnp.mean(jnp.square(x32), axis=reduce_axes) - jnp.square(mean)
    return mean, var


def batch_norm_apply(x, mean, var, scale, bias, eps: float = 1e-5):
    """Normalize x (channels-last) with given per-channel stats + affine."""
    inv = jnp.reciprocal(jnp.sqrt(var.astype(jnp.float32) + eps))
    w = (scale * inv).astype(x.dtype)
    b = (bias - mean * scale * inv).astype(x.dtype)
    return x * w + b


def sequential_ema(running, per_call_stats, momentum: float = 0.1):
    """Fold M ordered EMA updates into one.

    torch BN: r <- (1-m) * r + m * stat_k, applied for k = 0..M-1 in order.
    Closed form:  r' = (1-m)^M r + m * sum_k (1-m)^(M-1-k) stat_k.

    `per_call_stats`: [M, C] array of the per-call statistics in call order.
    """
    m = momentum
    M = per_call_stats.shape[0]
    decay = (1.0 - m) ** M
    weights = m * (1.0 - m) ** jnp.arange(M - 1, -1, -1, dtype=jnp.float32)
    contrib = jnp.tensordot(weights, per_call_stats.astype(jnp.float32), axes=1)
    return decay * running.astype(jnp.float32) + contrib
