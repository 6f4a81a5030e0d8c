"""Pallas TPU kernels for the SPADE hot path.

``fused_instance_norm_modulate`` fuses the SPADE block interior
(src/model.py:2440-2446):

    out = instance_norm(zi) * (1 + gamma) + beta

into a single VMEM-resident pass per sample: one read of zi (stats +
normalization in registers), one read each of gamma/beta, one write — versus
the unfused graph's extra zi round-trip between the reduction and the
normalize/modulate elementwise chain.  Falls back to the XLA composition
when a (H, W, C) slab would not fit VMEM or when running on CPU (tests use
interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.ops.norm import instance_norm

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:                                     # pragma: no cover
    _HAS_PALLAS = False

_VMEM_BUDGET = 12 * 1024 * 1024        # leave headroom under ~16MB/core

# test hook: RDT_PALLAS_INTERPRET=1 runs every kernel in interpret mode so
# the full model's kernel dispatch is exercisable on CPU
import os as _os
_FORCE_INTERPRET = _os.environ.get("RDT_PALLAS_INTERPRET") == "1"


# ---------------------------------------------------------------------------
# packed-lane variant for small channel counts (the not-shared SPADE halves:
# C = 64/32/16 at 1/4 .. full resolution).  A [H, W, C] slab with C < 128
# pads its lane dimension to 128 in VMEM (Mosaic tiles the minor-most dim to
# 128 lanes), inflating VMEM 2-8x and overflowing at full resolution — which
# is why the fusion was previously disabled in these halves.  Instead we view
# the slab as [H, W*C] (layout-preserving collapse of the two minor dims;
# W*C is a multiple of 128 for every SPADE block of the 160x192 model) and
# do the per-channel reductions with an iota channel-selector matmul on the
# MXU: lane l belongs to channel l % C.
# ---------------------------------------------------------------------------


def _ch_selector(c: int, wc: int, dtype=jnp.float32):
    """selT[ch, l] = 1 if lane l holds channel ch (l % C == ch)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 1)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)
    return (lane % c == ch).astype(dtype)


def _ch_mean(x_rowsum, selT, inv_n):
    """x_rowsum: [1, W*C] column sums -> per-channel means [1, C]."""
    s = jax.lax.dot_general(x_rowsum, selT,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s * inv_n


def _lanes(row_c, selT):
    """Broadcast per-channel [1, C] back to lanes [1, W*C]."""
    return jax.lax.dot_general(row_c, selT,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _packed_kernel(zi_ref, gamma_ref, beta_ref, out_ref, *, eps: float,
                   c: int):
    zi = zi_ref[0].astype(jnp.float32)               # [H, W*C]
    h, wc = zi.shape
    selT = _ch_selector(c, wc)
    inv_n = 1.0 / (h * (wc // c))
    rs = jnp.sum(zi, axis=0, keepdims=True)          # [1, W*C]
    rs2 = jnp.sum(zi * zi, axis=0, keepdims=True)
    mean = _ch_mean(rs, selT, inv_n)                 # [1, C]
    var = _ch_mean(rs2, selT, inv_n) - jnp.square(mean)
    mean_l = _lanes(mean, selT)                      # [1, W*C]
    rstd_l = _lanes(jax.lax.rsqrt(var + eps), selT)
    zin = (zi - mean_l) * rstd_l
    out = zin * (1.0 + gamma_ref[0].astype(jnp.float32)) \
        + beta_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _packed_bwd_kernel(zi_ref, gamma_ref, g_ref, dz_ref, dgamma_ref,
                       *, eps: float, c: int):
    """Fused backward: one VMEM pass computes dz and dgamma.

    dz = rstd * (dzin - mean(dzin) - zin * mean(dzin * zin)) with per-channel
    means; dgamma = g * zin.  dbeta == g and never enters the kernel (the
    caller aliases the cotangent directly), which keeps the kernel's VMEM
    footprint under the 16M scoped limit at full resolution."""
    zi = zi_ref[0].astype(jnp.float32)               # [H, W*C]
    g = g_ref[0].astype(jnp.float32)
    h, wc = zi.shape
    selT = _ch_selector(c, wc)
    inv_n = 1.0 / (h * (wc // c))
    rs = jnp.sum(zi, axis=0, keepdims=True)
    rs2 = jnp.sum(zi * zi, axis=0, keepdims=True)
    mean = _ch_mean(rs, selT, inv_n)
    var = _ch_mean(rs2, selT, inv_n) - jnp.square(mean)
    mean_l = _lanes(mean, selT)
    rstd_l = _lanes(jax.lax.rsqrt(var + eps), selT)
    zin = (zi - mean_l) * rstd_l
    dzin = g * (1.0 + gamma_ref[0].astype(jnp.float32))
    m1_l = _lanes(_ch_mean(jnp.sum(dzin, 0, keepdims=True), selT, inv_n),
                  selT)
    m2_l = _lanes(_ch_mean(jnp.sum(dzin * zin, 0, keepdims=True), selT,
                           inv_n), selT)
    dz_ref[0] = (rstd_l * (dzin - m1_l - zin * m2_l)).astype(dz_ref.dtype)
    dgamma_ref[0] = (g * zin).astype(dgamma_ref.dtype)


def _packed_ok(h: int, w: int, c: int, itemsize: int) -> bool:
    wc = w * c
    # in+out slabs (double-buffered by the pipeline) must fit VMEM
    slab = h * wc * max(itemsize, 2)
    return wc % 128 == 0 and c <= 128 and 10 * slab < _VMEM_BUDGET


def _packed_call(zi, gamma, beta, eps, interpret):
    lead = zi.shape[:-3]
    h, w, c = zi.shape[-3:]
    zf = zi.reshape((-1, h, w * c))
    gf = jnp.broadcast_to(gamma, zi.shape).reshape((-1, h, w * c))
    bf = jnp.broadcast_to(beta, zi.shape).reshape((-1, h, w * c))
    n = zf.shape[0]
    spec = pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_packed_kernel, eps=eps, c=c),
        grid=(n,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(zf.shape, zi.dtype),
        interpret=interpret,
    )(zf, gf, bf)
    return out.reshape(lead + (h, w, c))


def _packed_bwd_call(zi, gamma, g, eps, interpret):
    lead = zi.shape[:-3]
    h, w, c = zi.shape[-3:]
    zf = zi.reshape((-1, h, w * c))
    gf = jnp.broadcast_to(gamma, zi.shape).reshape((-1, h, w * c))
    gr = g.reshape((-1, h, w * c))
    n = zf.shape[0]
    spec = pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0))
    # cotangent dtypes must match each primal's dtype (zi and gamma/beta may
    # differ, e.g. an f32 z-stream modulated by bf16 conv outputs)
    sd_z = jax.ShapeDtypeStruct(zf.shape, zi.dtype)
    sd_g = jax.ShapeDtypeStruct(zf.shape, gamma.dtype)
    dz, dgamma = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, eps=eps, c=c),
        grid=(n,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[sd_z, sd_g],
        interpret=interpret,
    )(zf, gf, gr)
    rs = lambda a: a.reshape(lead + (h, w, c))
    return rs(dz), rs(dgamma), g.astype(gamma.dtype)


def _kernel(zi_ref, gamma_ref, beta_ref, out_ref, *, eps: float):
    zi = zi_ref[0].astype(jnp.float32)               # [H, W, C]
    mean = jnp.mean(zi, axis=(0, 1), keepdims=True)
    var = jnp.mean(jnp.square(zi), axis=(0, 1), keepdims=True) \
        - jnp.square(mean)
    zin = (zi - mean) * jax.lax.rsqrt(var + eps)
    out = zin * (1.0 + gamma_ref[0].astype(jnp.float32)) \
        + beta_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(zi_ref, gamma_ref, g_ref, dz_ref, dgamma_ref, *,
                eps: float):
    """Whole-slab fused backward (C a lane multiple): one VMEM pass.
    dbeta == g is aliased by the caller, not computed here."""
    zi = zi_ref[0].astype(jnp.float32)               # [H, W, C]
    g = g_ref[0].astype(jnp.float32)
    mean = jnp.mean(zi, axis=(0, 1), keepdims=True)
    var = jnp.mean(jnp.square(zi), axis=(0, 1), keepdims=True) \
        - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    zin = (zi - mean) * rstd
    dzin = g * (1.0 + gamma_ref[0].astype(jnp.float32))
    m1 = jnp.mean(dzin, axis=(0, 1), keepdims=True)
    m2 = jnp.mean(dzin * zin, axis=(0, 1), keepdims=True)
    dz_ref[0] = (rstd * (dzin - m1 - zin * m2)).astype(dz_ref.dtype)
    dgamma_ref[0] = (g * zin).astype(dgamma_ref.dtype)


def _dispatch(zi) -> str:
    """Pick the kernel layout for a [..., H, W, C] operand: 'slab' (C is a
    128-lane multiple and the slab fits VMEM), 'packed' (small C, W*C a lane
    multiple), or 'xla' fallback."""
    h, w, c = zi.shape[-3:]
    if not _HAS_PALLAS:
        return "xla"
    if c % 128 == 0 and 4 * (4 * h * w * c) <= _VMEM_BUDGET:
        return "slab"
    if _packed_ok(h, w, c, zi.dtype.itemsize):
        return "packed"
    return "xla"


def fused_instance_norm_modulate(zi: jnp.ndarray, gamma: jnp.ndarray,
                                 beta: jnp.ndarray, eps: float = 1e-5,
                                 interpret: bool = False) -> jnp.ndarray:
    """zi, gamma, beta: [..., H, W, C] (any leading batch dims)."""
    lead = zi.shape[:-3]
    h, w, c = zi.shape[-3:]
    interpret = interpret or _FORCE_INTERPRET
    on_tpu = jax.default_backend() == "tpu"
    kind = _dispatch(zi) if (on_tpu or interpret) else "xla"
    if kind == "xla":
        return instance_norm(zi, eps) * (1.0 + gamma) + beta
    if kind == "packed":
        return _packed_call(zi, gamma, beta, eps, interpret)

    zf = zi.reshape((-1, h, w, c))
    gf = jnp.broadcast_to(gamma, zi.shape).reshape((-1, h, w, c))
    bf = jnp.broadcast_to(beta, zi.shape).reshape((-1, h, w, c))
    n = zf.shape[0]
    spec = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(n,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(zf.shape, zi.dtype),
        interpret=interpret,
    )(zf, gf, bf)
    return out.reshape(lead + (h, w, c))


def _slab_bwd_call(zi, gamma, g, eps, interpret):
    lead = zi.shape[:-3]
    h, w, c = zi.shape[-3:]
    zf = zi.reshape((-1, h, w, c))
    gf = jnp.broadcast_to(gamma, zi.shape).reshape((-1, h, w, c))
    gr = g.reshape((-1, h, w, c))
    n = zf.shape[0]
    spec = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0))
    sd_z = jax.ShapeDtypeStruct(zf.shape, zi.dtype)
    sd_g = jax.ShapeDtypeStruct(zf.shape, gamma.dtype)
    dz, dgamma = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(n,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[sd_z, sd_g],
        interpret=interpret,
    )(zf, gf, gr)
    rs = lambda a: a.reshape(lead + (h, w, c))
    return rs(dz), rs(dgamma), g.astype(gamma.dtype)


# ---------------------------------------------------------------------------
# differentiable wrapper (custom VJP: fused Pallas forward, XLA backward)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def in_modulate(zi, gamma, beta, eps: float = 1e-5,
                interpret: bool = False):
    return fused_instance_norm_modulate(zi, gamma, beta, eps, interpret)


def _in_modulate_fwd(zi, gamma, beta, eps, interpret):
    return in_modulate(zi, gamma, beta, eps, interpret), (zi, gamma)


def _in_modulate_bwd(eps, interpret, res, g):
    zi, gamma = res
    interpret = interpret or _FORCE_INTERPRET
    on_tpu = jax.default_backend() == "tpu"
    if gamma.shape == zi.shape and (on_tpu or interpret):
        kind = _dispatch(zi)
        h, w, c = zi.shape[-3:]
        if kind == "packed":
            return _packed_bwd_call(zi, gamma, g, eps, interpret)
        # the backward holds more live f32 state than the forward (zi, g,
        # zin, dzin, dz, dgamma ~ 6-7 slabs vs the forward's 4): require
        # extra headroom before fusing, else fall through to the XLA math
        if kind == "slab" and 7 * (4 * h * w * c) <= _VMEM_BUDGET:
            return _slab_bwd_call(zi, gamma, g, eps, interpret)
    z = zi.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mean = jnp.mean(z, axis=(-3, -2), keepdims=True)
    var = jnp.mean(jnp.square(z - mean), axis=(-3, -2), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    zin = (z - mean) * rstd
    dbeta = g32
    dgamma = g32 * zin
    dzin = g32 * (1.0 + gamma.astype(jnp.float32))
    m1 = jnp.mean(dzin, axis=(-3, -2), keepdims=True)
    m2 = jnp.mean(dzin * zin, axis=(-3, -2), keepdims=True)
    dz = rstd * (dzin - m1 - zin * m2)
    return (dz.astype(zi.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(gamma.dtype))


in_modulate.defvjp(_in_modulate_fwd, _in_modulate_bwd)
