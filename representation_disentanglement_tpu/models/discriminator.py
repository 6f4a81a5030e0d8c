"""Anatomy-code discriminator + learned z prior.

Reference: ``Discriminator`` (src/model.py:2769-2800) — 5 stride-2 convs
with real LeakyReLU(0.2) (BN on stages 2-5) then a 2-layer MLP critic —
and ``ModalityDistribution`` (src/model.py:2902-2914) — per-modality-label
MLP emitting a (mean, log_var) prior for the KL loss.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.layers import (
    BatchNormTorch, MaybeCondConv, TorchLinear)


class Discriminator(nn.Module):
    inter_num_ch: int = 16
    is_patch_gan: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        f = self.inter_num_ch
        chans = [f, 2 * f, 4 * f, 8 * f, 4 * f]
        h = x
        for i, ch in enumerate(chans):
            h = MaybeCondConv(ch, 4, 2, 1, name=f"conv_{i}")(h)
            if i > 0:
                h = BatchNormTorch(ch, name=f"bn_{i}")(
                    h, use_running_average=not train)
            h = jax.nn.leaky_relu(h, 0.2)
        if self.is_patch_gan:
            return MaybeCondConv(1, 3, 1, 1, name="fc_conv")(h)
        lead = h.shape[:-3]
        h = h.reshape(*lead, -1)
        h = jax.nn.leaky_relu(TorchLinear(self.inter_num_ch * 16,
                                          name="fc_0")(h), 0.2)
        return TorchLinear(1, name="fc_1")(h)


class ModalityDistribution(nn.Module):
    z_size: int = 16
    inter_num_ch: int = 128

    @nn.compact
    def __call__(self, x):
        h = TorchLinear(self.inter_num_ch, name="linear_0")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        h = TorchLinear(2 * self.z_size, name="linear_1")(h)
        return h[..., :self.z_size], h[..., self.z_size:]
