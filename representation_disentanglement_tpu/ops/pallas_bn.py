"""Fused BatchNorm training pass (VERDICT r3 item 4 — the conv->BN ladder
rung).

``BatchNormTorch``'s train mode is the encoders' remaining two-pass
full-resolution stage: XLA lowers it as a reduction pass over the conv
output plus a separate normalize pass.  The byte floor for batch-norm is
structural (stats over (B, H, W) cannot normalize in the same pass unless
the whole group fits VMEM — at 160x192xB16 it does not), so the fused
kernel targets the remaining slack, not the floor:

- kernel 1 (stats): ONE read of x per (g, b) block computes sum and sum-sq
  together in f32 VMEM accumulators that persist across the sequential
  grid (two moments for one pass, guaranteed — XLA usually multi-output-
  fuses this but schedules it independently of the consumer);
- kernel 2 (normalize): one read + one write with the [G, C] stats staying
  on-chip per group.

Total traffic: 2 reads + 1 write of x — the structural floor.  Semantics
are exactly ``BatchNormTorch``'s (biased batch variance for normalization;
the caller derives the unbiased EMA update from the returned biased var,
reference src/model.py:2131-2132 via nn.BatchNorm2d).  The backward is the
standard XLA batch-norm VJP (identical math to autodiff of the unfused
path).  Falls back to the XLA composition off-TPU or when a block would
not fit VMEM.  Measured on-chip either way — see PERF.md's ladder.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:                                     # pragma: no cover
    _HAS_PALLAS = False

_VMEM_BUDGET = 12 * 1024 * 1024
_FORCE_INTERPRET = _os.environ.get("RDT_PALLAS_INTERPRET") == "1"


def _stats_kernel(x_ref, mean_ref, var_ref, acc, *, inv_n: float):
    b = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[0, 0].astype(jnp.float32)                 # [H, W, C]
    acc[0] += jnp.sum(x, axis=(0, 1))
    acc[1] += jnp.sum(x * x, axis=(0, 1))

    @pl.when(b == nb - 1)
    def _():
        # stats carried as [G, 1, C] blocks: a [G, C] output with block
        # (1, C) would violate Mosaic's last-two-dims (8, 128) block rule
        # whenever G > 1 (block dim 1 != array dim G); the trailing
        # singleton makes the last two dims (1, C) == block dims exactly
        m = acc[0] * inv_n
        mean_ref[0, 0] = m
        var_ref[0, 0] = acc[1] * inv_n - m * m          # biased


def _norm_kernel(x_ref, mean_ref, var_ref, scale_ref, bias_ref, y_ref, *,
                 eps: float):
    x = x_ref[0, 0].astype(jnp.float32)
    rstd = jax.lax.rsqrt(var_ref[0, 0] + eps)
    y = (x - mean_ref[0, 0]) * (rstd * scale_ref[:].astype(jnp.float32)) \
        + bias_ref[:].astype(jnp.float32)
    y_ref[0, 0] = y.astype(y_ref.dtype)


def _fits(x) -> bool:
    h, w, c = x.shape[-3:]
    # double-buffered in + out blocks, f32 working copy
    return 6 * h * w * c * 4 <= _VMEM_BUDGET


def bn_train_fused_available(x) -> bool:
    if not _HAS_PALLAS:
        return False
    on_tpu = jax.default_backend() == "tpu"
    return (on_tpu or _FORCE_INTERPRET) and x.ndim == 5 and _fits(x)


def _bn_train_pallas(x, scale, bias, eps: float, interpret: bool):
    g, b, h, w, c = x.shape
    xspec = pl.BlockSpec((1, 1, h, w, c), lambda i, j: (i, j, 0, 0, 0))
    gc_spec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))
    mean, var = pl.pallas_call(
        functools.partial(_stats_kernel, inv_n=1.0 / (b * h * w)),
        grid=(g, b),
        in_specs=[xspec],
        out_specs=[gc_spec, gc_spec],
        out_shape=[jax.ShapeDtypeStruct((g, 1, c), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(x)
    cspec = pl.BlockSpec((c,), lambda i, j: (0,))
    y = pl.pallas_call(
        functools.partial(_norm_kernel, eps=eps),
        grid=(g, b),
        in_specs=[xspec, gc_spec, gc_spec, cspec, cspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, mean, var, scale, bias)
    return y, mean[:, 0], var[:, 0]


def _bn_train_xla(x, scale, bias, eps: float):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2, 3))                      # [G, C]
    var = jnp.mean(jnp.square(x32), axis=(1, 2, 3)) - mean ** 2
    mb = mean[:, None, None, None, :]
    vb = var[:, None, None, None, :]
    y = (x32 - mb) * jax.lax.rsqrt(vb + eps) \
        * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype), mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train_fused(x, scale, bias, eps: float = 1e-5):
    """x: [G, B, H, W, C] -> (y, mean [G, C] f32, var [G, C] f32 biased).
    Torch BatchNorm2d train-mode normalization per group."""
    interpret = _FORCE_INTERPRET
    if bn_train_fused_available(x):
        return _bn_train_pallas(x, scale, bias, float(eps), interpret)
    return _bn_train_xla(x, scale, bias, float(eps))


def _fwd(x, scale, bias, eps):
    y, mean, var = bn_train_fused(x, scale, bias, eps)
    return (y, mean, var), (x, scale, mean, var)


def _bwd(eps, res, cts):
    """Standard batch-norm VJP (same math autodiff derives for the unfused
    path); cotangents on the mean/var outputs are folded in so the EMA
    consumer stays differentiable-safe (they are stop-gradiented by the
    caller in practice)."""
    x, scale, mean, var = res
    gy = cts[0].astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2] * x.shape[3]
    mb = mean[:, None, None, None, :]
    rstd = jax.lax.rsqrt(var + eps)[:, None, None, None, :]
    xhat = (x32 - mb) * rstd
    s32 = scale.astype(jnp.float32)
    dxhat = gy * s32
    m1 = jnp.mean(dxhat, axis=(1, 2, 3), keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=(1, 2, 3), keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    # mean/var output cotangents (usually zero: EMA consumers stop-grad)
    if cts[1] is not None:
        dmu = cts[1][:, None, None, None, :]
        dx = dx + dmu / n
    if cts[2] is not None:
        dvar = cts[2][:, None, None, None, :]
        dx = dx + dvar * 2.0 * (x32 - mb) / n
    dscale = jnp.sum(gy * xhat, axis=(0, 1, 2, 3))
    dbias = jnp.sum(gy, axis=(0, 1, 2, 3))
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


bn_train_fused.defvjp(_fwd, _bwd)
