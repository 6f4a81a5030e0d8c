"""Attention gates used by the output decoders.

Reference: ``SpatialAttentionLayer`` (src/model.py:1303-1327),
``ChannelAttentionLayer`` (SE, src/model.py:1417-1433),
``SymmetrySpatialAttentionLayer`` (src/model.py:1329-1357),
``SymmetryGateResidualSpatialAttentionLayer`` (src/model.py:1389-1415).

All internal resizes use torch's F.upsample default align_corners=False
(quirk Q7).  The flip in the symmetry variants is along H (torch dims=[2]
on NCHW), exploiting left-right brain symmetry in the coronal axis of the
stored orientation.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.layers import (
    BatchNormTorch, MaybeCondConv, TorchLinear)
from representation_disentanglement_tpu.ops import bilinear_resize


class SpatialAttentionLayer(nn.Module):
    inter_num_ch: int
    sample_factor: Tuple[int, int] = (2, 2)

    @nn.compact
    def __call__(self, x, g, *, train: bool):
        in_ch = x.shape[-1]
        x_post = MaybeCondConv(self.inter_num_ch, self.sample_factor,
                               self.sample_factor, 0, use_bias=False,
                               name="W_x")(x)
        g_post = MaybeCondConv(self.inter_num_ch, 1, 1, 0, name="W_g")(g)
        g_post = bilinear_resize(g_post, x_post.shape[-3:-1],
                                 align_corners=False)
        xg = jax.nn.relu(x_post + g_post)
        alpha = jax.nn.sigmoid(
            MaybeCondConv(1, 1, 1, 0, name="W_psi")(xg))
        alpha_up = bilinear_resize(alpha, x.shape[-3:-1], align_corners=False)
        out = MaybeCondConv(in_ch, 1, 1, 0, name="W_out_conv")(alpha_up * x)
        out = BatchNormTorch(in_ch, name="W_out_bn")(
            out, use_running_average=not train)
        return out, alpha_up


class SymmetryGateResidualSpatialAttentionLayer(nn.Module):
    """Gate-only symmetry attention: alpha from g and |g - flip_H(g)|;
    residual (1 + alpha) * x   (src/model.py:1389-1415)."""
    inter_num_ch: int
    sample_factor: Tuple[int, int] = (2, 2)
    is_bn: bool = True

    @nn.compact
    def __call__(self, x, g, *, train: bool):
        in_ch = x.shape[-1]
        g_flip = jnp.flip(g, axis=-3)
        g_diff = jnp.abs(g - g_flip)
        g_post = jax.nn.relu(
            MaybeCondConv(self.inter_num_ch, 1, 1, 0, name="W_g")(g)
            + MaybeCondConv(self.inter_num_ch, 1, 1, 0, name="W_g_diff")(
                g_diff))
        alpha = jax.nn.sigmoid(
            MaybeCondConv(1, 1, 1, 0, name="W_psi")(g_post))
        alpha_up = bilinear_resize(alpha, x.shape[-3:-1], align_corners=False)
        out = MaybeCondConv(in_ch, 1, 1, 0, name="W_out_conv")(
            (1.0 + alpha_up) * x)
        if self.is_bn:
            out = BatchNormTorch(in_ch, name="W_out_bn")(
                out, use_running_average=not train)
        return out, alpha_up


class ChannelAttentionLayer(nn.Module):
    """Squeeze-excitation; output (1 + alpha) * x (src/model.py:1417-1433)."""
    sample_factor: int = 16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        gp = jnp.mean(x, axis=(-3, -2))
        dn = jax.nn.relu(TorchLinear(in_ch // self.sample_factor,
                                     name="W_down")(gp))
        alpha = jax.nn.sigmoid(TorchLinear(in_ch, name="W_up")(dn))
        alpha_exp = alpha[..., None, None, :]
        return (1.0 + alpha_exp) * x, alpha
