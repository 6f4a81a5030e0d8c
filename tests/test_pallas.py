"""Pallas kernel correctness (interpret mode on CPU) + VJP parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.ops import instance_norm
from representation_disentanglement_tpu.ops.pallas_kernels import (
    fused_instance_norm_modulate, in_modulate)


def _ref(zi, gamma, beta):
    return instance_norm(zi) * (1.0 + gamma) + beta


def test_fused_kernel_matches_reference(rng):
    zi = jnp.asarray(rng.normal(size=(3, 16, 24, 8)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(3, 16, 24, 8)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(3, 16, 24, 8)).astype(np.float32))
    want = _ref(zi, gamma, beta)
    got = fused_instance_norm_modulate(zi, gamma, beta, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # leading group axis
    zi5 = zi.reshape(1, 3, 16, 24, 8)
    got5 = fused_instance_norm_modulate(zi5, gamma[None], beta[None],
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got5[0]), np.asarray(want),
                               atol=1e-5)


def test_fused_kernel_vjp_matches_autodiff(rng):
    zi = jnp.asarray(rng.normal(size=(2, 8, 16, 4)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(2, 8, 16, 4)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(2, 8, 16, 4)).astype(np.float32))

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
    out = fused_instance_norm_modulate(zi, zi * 0, zi * 0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(zi, zi * 0,
                                                                zi * 0)),
                               atol=1e-5)
