"""Pallas kernel correctness (interpret mode on CPU) + VJP parity.

Two kernel layouts are exercised explicitly (ops/pallas_kernels._dispatch):
- 'slab':   C a 128-lane multiple, whole [H, W, C] slab per grid step;
- 'packed': small C viewed as [H, W*C] so the lane dim isn't padded to 128
  (the not-shared SPADE halves: C = 64/32/16 at up to full resolution).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.ops import instance_norm
from representation_disentanglement_tpu.ops.pallas_kernels import (
    _dispatch, fused_instance_norm_modulate, in_modulate)


def _ref(zi, gamma, beta):
    return instance_norm(zi) * (1.0 + gamma) + beta


# (shape, expected kernel layout): slab = C % 128 == 0; packed = W*C % 128
SHAPES = [
    ((3, 8, 16, 128), "slab"),
    ((3, 16, 16, 8), "packed"),
    ((2, 40, 48, 64), "packed"),     # sp4 geometry of the 160x192 model
    ((2, 160, 192, 16), "packed"),   # sp6 full-resolution geometry (bf16-
                                     # sized slab fits; f32 would fall back)
]


def _mk(rng, shape, dtype=np.float32):
    mk = lambda: jnp.asarray(rng.normal(size=shape).astype(dtype))
    return mk(), mk(), mk()


@pytest.mark.parametrize("shape,kind", SHAPES)
def test_fused_kernel_matches_reference(rng, shape, kind):
    zi, gamma, beta = _mk(rng, shape)
    if shape[-3] >= 160:
        zi = zi.astype(jnp.bfloat16)   # full-res packed requires bf16 slabs
        gamma, beta = gamma.astype(jnp.bfloat16), beta.astype(jnp.bfloat16)
    assert _dispatch(zi) == kind
    # reference in f32 (the kernel computes stats in f32 from the bf16
    # slabs); bf16 outputs round to ~2^-8 relative
    want = _ref(zi.astype(jnp.float32), gamma.astype(jnp.float32),
                beta.astype(jnp.float32))
    got = fused_instance_norm_modulate(zi, gamma, beta, interpret=True)
    bf16 = zi.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2 if bf16 else 1e-6,
                               atol=6e-2 if bf16 else 1e-5)


def test_fused_kernel_leading_axes(rng):
    zi, gamma, beta = _mk(rng, (3, 16, 16, 8))
    want = _ref(zi, gamma, beta)
    got5 = fused_instance_norm_modulate(
        zi.reshape(1, 3, 16, 16, 8), gamma[None], beta[None], interpret=True)
    np.testing.assert_allclose(np.asarray(got5[0]), np.asarray(want),
                               atol=1e-5)


@pytest.mark.parametrize("shape,kind", SHAPES[:3])
def test_fused_kernel_vjp_matches_autodiff(rng, shape, kind):
    zi, gamma, beta = _mk(rng, shape)
    assert _dispatch(zi) == kind

    def loss_ref(z, g, b):
        return jnp.sum(jnp.sin(_ref(z, g, b)))

    def loss_fused(z, g, b):
        return jnp.sum(jnp.sin(in_modulate(z, g, b, 1e-5, True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(zi, gamma, beta)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(zi, gamma, beta)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_oversize_slab_falls_back(rng):
    # slab > VMEM budget -> silently uses the XLA composition
    zi = jnp.ones((1, 512, 512, 16), jnp.float32)
    assert _dispatch(zi) == "xla"
    out = fused_instance_norm_modulate(zi, zi * 0, zi * 0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(zi, zi * 0,
                                                                zi * 0)),
                               atol=1e-5)


def test_vjp_mixed_dtype_cotangents(rng):
    """zi f32 with bf16 gamma/beta (the sampled z-stream meets bf16 conv
    outputs): cotangent dtypes must match each primal's dtype, or the
    upstream conv transposes fail under remat (regression: TPU b32 run)."""
    zi = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    gamma = jnp.asarray(
        rng.normal(size=(2, 16, 16, 8)).astype(np.float32)).astype(
        jnp.bfloat16)
    beta = jnp.zeros_like(gamma)
    assert _dispatch(zi) == "packed"

    def loss(z, g, b):
        return jnp.sum(in_modulate(z, g, b, 1e-5, True).astype(jnp.float32))

    dz, dg, db = jax.grad(loss, argnums=(0, 1, 2))(zi, gamma, beta)
    assert dz.dtype == jnp.float32
    assert dg.dtype == jnp.bfloat16 and db.dtype == jnp.bfloat16


@pytest.mark.slow
def test_fused_bn_train_matches_unfused(rng, monkeypatch):
    """ops/pallas_bn.bn_train_fused (VERDICT r3 item 4): interpret-mode
    kernel == the BatchNormTorch train math (biased normalize var, f32
    stats) for values AND gradients, grouped [G, B, H, W, C]."""
    monkeypatch.setenv("RDT_PALLAS_INTERPRET", "1")
    import importlib
    from representation_disentanglement_tpu.ops import pallas_bn
    importlib.reload(pallas_bn)
    try:
        from representation_disentanglement_tpu.ops import (
            batch_norm_apply, batch_stats)

        G, B, H, W, C = 2, 3, 16, 128, 32
        x = jnp.asarray(rng.normal(size=(G, B, H, W, C)).astype(np.float32)
                        * 2.0 + 0.5)
        scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

        assert pallas_bn.bn_train_fused_available(x)
        y, mean, var = pallas_bn.bn_train_fused(x, scale, bias, 1e-5)
        m0, v0 = batch_stats(x, (1, 2, 3))
        y0 = batch_norm_apply(x, m0[:, None, None, None, :],
                              v0[:, None, None, None, :], scale, bias, 1e-5)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(m0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(var), np.asarray(v0),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y0), rtol=2e-4,
                                   atol=2e-4)

        # gradients: custom VJP == autodiff of the unfused composition
        def loss_fused(x, s, b):
            yy, _, _ = pallas_bn.bn_train_fused(x, s, b, 1e-5)
            return jnp.sum(yy * yy) + jnp.sum(jnp.sin(yy))

        def loss_ref(x, s, b):
            m, v = batch_stats(x, (1, 2, 3))
            yy = batch_norm_apply(x, m[:, None, None, None, :],
                                  v[:, None, None, None, :], s, b, 1e-5)
            return jnp.sum(yy * yy) + jnp.sum(jnp.sin(yy))

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3)

        # bf16 x keeps the f32 stats path
        yb, mb, vb = pallas_bn.bn_train_fused(x.astype(jnp.bfloat16),
                                              scale, bias, 1e-5)
        assert yb.dtype == jnp.bfloat16 and mb.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(mb), np.asarray(m0),
                                   rtol=2e-2, atol=2e-2)
    finally:
        monkeypatch.delenv("RDT_PALLAS_INTERPRET", raising=False)
        importlib.reload(pallas_bn)
