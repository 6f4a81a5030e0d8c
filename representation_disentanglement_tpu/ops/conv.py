"""Convolution primitives: NHWC conv + CondConv as kernel-space mixing.

The reference's ``CondConv2d`` (src/model.py:2075-2117) mixes
``num_experts=3`` weight banks with per-sample sigmoid routing weights and
then runs a **Python loop over the batch**, one ``F.conv2d`` per sample —
the single hottest inefficiency in the codebase (SURVEY §3.1 "HOT LOOP").

TPU-native observation: in the *active* model every CondConv call routes on
``inputs_type = (1+i) * ones(bs, 1)`` (src/model.py:3138, 3169, 3190, 3211)
— a scalar that is constant across the batch.  The routing weights are
therefore identical for all samples, and CondConv degenerates to a plain
conv whose kernel is a *per-modality* mixture of the expert banks:

    W(i) = sum_e sigmoid(fc(1+i))_e * W_e        (one tiny einsum)

so the "conditional" part costs one [E] x [E, kh*kw*Cin*Cout] contraction
per modality and **zero** extra conv FLOPs.  All M modalities then run as a
single vmapped conv (JAX lowers a kernel-batched vmap to one grouped XLA
conv), keeping the MXU busy with one large op instead of M*B small ones.

For genuinely per-sample routing (the z-conditioned ``GANShortGeneratorNew``,
src/model.py:2714-2766) `percase_conv2d` vmaps over the batch, which XLA
lowers to a feature-grouped conv — still loop-free.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

# dimension numbers for NHWC activations and HWIO kernels
DN = ("NHWC", "HWIO", "NHWC")


def _pad_pair(padding: Union[int, Sequence[int]]):
    if isinstance(padding, int):
        return [(padding, padding), (padding, padding)]
    return [tuple(p) if isinstance(p, (tuple, list)) else (p, p)
            for p in padding]


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b=None, stride=1, padding=0,
           preferred_dtype=jnp.float32) -> jnp.ndarray:
    """Plain NHWC conv. x: [B,H,W,Cin], w: [kh,kw,Cin,Cout], b: [Cout].

    bf16 inputs run the conv natively in bf16 (the MXU still accumulates in
    f32 internally); requesting an f32 output there breaks the conv
    transpose rule's dtype matching under autodiff."""
    if isinstance(stride, int):
        stride = (stride, stride)
    pref = preferred_dtype if x.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride,
        padding=_pad_pair(padding), dimension_numbers=DN,
        preferred_element_type=pref)
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def cond_route(type_value: jnp.ndarray, fc_w: jnp.ndarray, fc_b: jnp.ndarray):
    """Routing weights sigmoid(type @ fc_w + fc_b)  (src/model.py:2065-2073).

    type_value: [..., emb]  ->  [..., E]
    """
    return jax.nn.sigmoid(type_value.astype(jnp.float32) @ fc_w + fc_b)


def mix_experts(route: jnp.ndarray, experts: jnp.ndarray) -> jnp.ndarray:
    """Mix expert kernel banks: route [..., E] x experts [E, kh, kw, Ci, Co]
    -> [..., kh, kw, Ci, Co]   (src/model.py:2113, vectorized)."""
    return jnp.einsum("...e,ehwio->...hwio", route,
                      experts.astype(jnp.float32))


def modality_conv2d(x: jnp.ndarray, w: jnp.ndarray, b=None, stride=1,
                    padding=0) -> jnp.ndarray:
    """Conv with a distinct kernel per leading-axis group.

    x: [M, B, H, W, Cin], w: [M, kh, kw, Cin, Cout]  ->  [M, B, H', W', Cout]

    jax.vmap's conv batching rule lowers this to ONE feature-grouped XLA
    conv over the flattened [M*B] batch — the TPU replacement for the
    reference's per-modality (and per-sample) conv loops.
    """
    f = lambda xm, wm: conv2d(xm, wm, None, stride, padding)
    y = jax.vmap(f)(x, w.astype(x.dtype))
    if b is not None:
        # b: [Cout] (shared) or [M, Cout] (per-modality mixed bias)
        if b.ndim == 1:
            y = y + b.astype(y.dtype)
        else:
            y = y + b[:, None, None, None, :].astype(y.dtype)
    return y


def percase_conv2d(x: jnp.ndarray, w: jnp.ndarray, b=None, stride=1,
                   padding=0) -> jnp.ndarray:
    """Per-sample-kernel conv: x [B,H,W,Ci], w [B,kh,kw,Ci,Co] -> [B,...,Co].

    Exact CondConv semantics for per-sample routing, loop-free (vmap ->
    grouped conv)."""
    f = lambda xb, wb: conv2d(xb[None], wb, None, stride, padding)[0]
    y = jax.vmap(f)(x, w.astype(x.dtype))
    if b is not None:
        y = y + (b[:, None, None, :] if b.ndim == 2 else b).astype(y.dtype)
    return y
