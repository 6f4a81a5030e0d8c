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


def _kernel(zi_ref, gamma_ref, beta_ref, out_ref, *, eps: float):
    zi = zi_ref[0].astype(jnp.float32)               # [H, W, C]
    mean = jnp.mean(zi, axis=(0, 1), keepdims=True)
    var = jnp.mean(jnp.square(zi), axis=(0, 1), keepdims=True) \
        - jnp.square(mean)
    zin = (zi - mean) * jax.lax.rsqrt(var + eps)
    out = zin * (1.0 + gamma_ref[0].astype(jnp.float32)) \
        + beta_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def fused_instance_norm_modulate(zi: jnp.ndarray, gamma: jnp.ndarray,
                                 beta: jnp.ndarray, eps: float = 1e-5,
                                 interpret: bool = False) -> jnp.ndarray:
    """zi, gamma, beta: [..., H, W, C] (any leading batch dims)."""
    lead = zi.shape[:-3]
    h, w, c = zi.shape[-3:]
    slab_bytes = 4 * h * w * c          # f32 working set per input slab
    on_tpu = jax.default_backend() == "tpu"
    if (not _HAS_PALLAS or 4 * slab_bytes > _VMEM_BUDGET
            or (not on_tpu and not interpret)):
        return instance_norm(zi, eps) * (1.0 + gamma) + beta

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
