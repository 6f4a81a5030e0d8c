"""Bilinear resize as separable matmuls — the TPU-native way to upsample.

The reference mixes two bilinear conventions (quirk Q7, SURVEY §7.4):
``align_corners=True`` in the U-Net up blocks (src/model.py:157, 2175, 2691)
and PyTorch's default ``align_corners=False`` everywhere in SPADE
(src/model.py:2432, 2463-2471, 2501-2510) and in the attention gates
(src/model.py:1321-1324).

Instead of a gather-based interpolation (scalar-ish on TPU), we precompute —
at trace time, with static shapes — a sparse-in-structure dense interpolation
matrix per axis and apply it as two einsums.  XLA maps these onto the MXU and
fuses the surrounding elementwise work; for 2x upsampling of NHWC feature
maps this is both faster and exactly reproducible against torch's
``F.interpolate`` (see tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _resize_matrix_np(in_size: int, out_size: int, align_corners: bool):
    """[out_size, in_size] bilinear interpolation matrix (float32).

    Matches torch ``F.interpolate(mode='bilinear')`` source-index math:
    - align_corners=True:  src = dst * (in-1)/(out-1)
    - align_corners=False: src = max(0, (dst+0.5) * in/out - 0.5)
    """
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for dst in range(out_size):
        if align_corners:
            src = dst * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = max((dst + 0.5) * in_size / out_size - 0.5, 0.0)
        lo = min(int(np.floor(src)), in_size - 1)
        hi = min(lo + 1, in_size - 1)
        w_hi = src - lo
        m[dst, lo] += 1.0 - w_hi
        m[dst, hi] += w_hi
    return m


def resize_matrix(in_size: int, out_size: int, align_corners: bool):
    return jnp.asarray(_resize_matrix_np(in_size, out_size, bool(align_corners)))


@functools.lru_cache(maxsize=None)
def _weights_exact_in_bf16(in_size: int, out_size: int,
                           align_corners: bool) -> bool:
    """True when every interpolation weight for this (in, out, mode) is
    exactly representable in bfloat16 — e.g. all x2 up/downsamples, whose
    weights are dyadic fractions (0, 1/4, 1/2, 3/4, 1)."""
    try:
        import ml_dtypes
    except ImportError:                                # pragma: no cover
        return False
    m = _resize_matrix_np(in_size, out_size, align_corners)
    return bool(np.all(m.astype(ml_dtypes.bfloat16).astype(np.float32) == m))


def bilinear_resize(x: jnp.ndarray, out_hw, align_corners: bool = False):
    """Bilinear-resize the (H, W) dims of an NHWC (or [..., H, W, C]) array.

    Applied as two MXU matmuls: out = Rh @ x @ Rw^T (per batch/channel).
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    orig_dtype = x.dtype
    if (h_in, w_in) == (h_out, w_out):
        return x
    rh = resize_matrix(h_in, h_out, align_corners)
    rw = resize_matrix(w_in, w_out, align_corners)
    import jax
    if (orig_dtype == jnp.bfloat16
            and _weights_exact_in_bf16(h_in, h_out, bool(align_corners))
            and _weights_exact_in_bf16(w_in, w_out, bool(align_corners))):
        # bf16 fast path (bandwidth lever, PERF.md ladder): when every
        # weight is exact in bf16 — all the model's x2 up/downsamples —
        # bf16 x bf16 products accumulated in f32 (preferred_element_type)
        # are EXACT, so the only rounding added vs the f32 interior is the
        # single bf16 cast of the intermediate between the two einsums.
        # That halves the bytes of the materialized [..., H_out, w_in, c]
        # intermediate, on an HBM-bound step.
        y = jnp.einsum("Hh,...hwc->...Hwc", rh.astype(jnp.bfloat16), x,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("Ww,...hwc->...hWc", rw.astype(jnp.bfloat16),
                       y.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return y.astype(orig_dtype)
    # full-f32 accumulation: interpolation weights are parity-critical and
    # the matrices are tiny, so HIGHEST precision costs nothing
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("Hh,...hwc->...Hwc", rh, x.astype(jnp.float32),
                   precision=hi)
    if orig_dtype == jnp.bfloat16:
        # same bandwidth lever for non-dyadic weights (the up-blocks'
        # align_corners=True x2, whose 79/159-style weights are NOT exact
        # in bf16): keep f32 weights + HIGHEST accumulation, round only the
        # materialized intermediate to bf16 — identical one-extra-rounding
        # semantics as the fast path above, half the intermediate bytes
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    y = jnp.einsum("Ww,...hwc->...hWc", rw, y, precision=hi)
    return y.astype(orig_dtype)
