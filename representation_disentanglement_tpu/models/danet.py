"""DANet (dual-attention segmentation net), src/model.py:1695-1853.

The reference's DANet is BROKEN upstream: ``BackBone`` references an
undefined module ``resnet`` (src/model.py:1767; the torch-encoding import
is commented out at :15), so it cannot be constructed at all.  This is a
WORKING port of what the code intends (documented divergence — there is no
runnable oracle):

- ``PAM_Module`` (position attention, SAGAN-style): quadratic spatial
  self-attention expressed as two einsums — on TPU the (HW)x(HW) energy
  matrix is a single MXU matmul per sample;
- ``CAM_Module`` (channel attention): CxC gram attention with the
  max-minus-energy trick;
- ``BackBone``: dilated ResNet50 in torch-encoding's configuration
  (``dilated=True, multi_grid=True, multi_dilation=[4,8,16]`` — layer3
  dilation 2, layer4 stride 1 with per-block dilations 4/8/16; output
  stride 8);
- ``DANetHead`` and the ``DANet`` wrapper (x2 upsample + 3ch projection in
  front, trilinear head outputs resized back to the input size).

The reference's head hard-codes 512 input channels for conv6/7/8
(src/model.py:1806-1810), consistent with in_channels=2048 -> inter 512;
kept as derived inter_channels here.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.layers import (
    BatchNormTorch, MaybeCondConv)
from representation_disentanglement_tpu.ops import bilinear_resize, max_pool


class PAM(nn.Module):
    """Position attention (src/model.py:1695-1728).  x: [B, H, W, C]."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        q = MaybeCondConv(C // 8, 1, 1, 0, name="query_conv")(x)
        k = MaybeCondConv(C // 8, 1, 1, 0, name="key_conv")(x)
        v = MaybeCondConv(C, 1, 1, 0, name="value_conv")(x)
        q = q.reshape(B, H * W, C // 8).astype(jnp.float32)
        k = k.reshape(B, H * W, C // 8).astype(jnp.float32)
        v = v.reshape(B, H * W, C).astype(jnp.float32)
        energy = jnp.einsum("bqc,bkc->bqk", q, k)          # [B, HW, HW]
        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(B, H, W, C)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out.astype(x.dtype) + x


class CAM(nn.Module):
    """Channel attention (src/model.py:1731-1760).  x: [B, H, W, C]."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        f = x.reshape(B, H * W, C).astype(jnp.float32)
        energy = jnp.einsum("bnc,bnd->bcd", f, f)          # [B, C, C]
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy_new, axis=-1)
        out = jnp.einsum("bcd,bnd->bnc", attn, f).reshape(B, H, W, C)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out.astype(x.dtype) + x


class Bottleneck(nn.Module):
    """ResNet bottleneck with optional dilation (torch-encoding layout)."""
    planes: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool):
        p = self.planes
        h = MaybeCondConv(p, 1, 1, 0, use_bias=False, name="conv1")(x)
        h = BatchNormTorch(p, name="bn1")(h, use_running_average=not train)
        h = jax.nn.relu(h)
        # dilated 3x3: padding == dilation keeps the spatial size
        h = nn.Conv(p, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=self.dilation, use_bias=False, name="conv2")(h)
        h = BatchNormTorch(p, name="bn2")(h, use_running_average=not train)
        h = jax.nn.relu(h)
        h = MaybeCondConv(4 * p, 1, 1, 0, use_bias=False, name="conv3")(h)
        h = BatchNormTorch(4 * p, name="bn3")(h, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != 4 * p:
            x = MaybeCondConv(4 * p, 1, self.stride, 0, use_bias=False,
                              name="downsample_conv")(x)
            x = BatchNormTorch(4 * p, name="downsample_bn")(
                x, use_running_average=not train)
        return jax.nn.relu(h + x)


class BackBone(nn.Module):
    """Dilated ResNet50, output stride 8 (src/model.py:1762-1778 intent:
    torch-encoding resnet50 with dilated=True + multi_grid [4,8,16])."""
    multi_dilation: Tuple[int, ...] = (4, 8, 16)

    @nn.compact
    def __call__(self, x, *, train: bool):
        h = MaybeCondConv(64, 7, 2, 3, use_bias=False, name="conv1")(x)
        h = BatchNormTorch(64, name="bn1")(h, use_running_average=not train)
        h = jax.nn.relu(h)
        pad = [(0, 0)] * (h.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
        h = max_pool(jnp.pad(h, pad, constant_values=-jnp.inf), 3, 2)
        layer_cfg = [  # (planes, blocks, stride, dilations per block)
            (64, 3, 1, None),
            (128, 4, 2, None),
            (256, 6, 1, [2] * 6),                 # dilated=True: stride->1
            (512, 3, 1, list(self.multi_dilation)),
        ]
        for li, (p, nblk, s, dil) in enumerate(layer_cfg, start=1):
            for b in range(nblk):
                h = Bottleneck(
                    p, stride=s if b == 0 else 1,
                    dilation=(dil[b] if dil else 1),
                    name=f"layer{li}_{b}")(h, train=train)
        return h                                   # [B, H/8, W/8, 2048]


class DANetHead(nn.Module):
    """src/model.py:1780-1825."""
    out_num_ch: int

    @nn.compact
    def __call__(self, x, *, train: bool, rng=None):
        inter = x.shape[-1] // 4

        def conv_bn_relu(h, name):
            h = MaybeCondConv(inter, 3, 1, 1, use_bias=False,
                              name=f"{name}_conv")(h)
            h = BatchNormTorch(inter, name=f"{name}_bn")(
                h, use_running_average=not train)
            return jax.nn.relu(h)

        feat1 = conv_bn_relu(x, "conv5a")
        sa = PAM(name="sa")(feat1)
        sa_conv = conv_bn_relu(sa, "conv51")
        feat2 = conv_bn_relu(x, "conv5c")
        sc = CAM(name="sc")(feat2)
        sc_conv = conv_bn_relu(sc, "conv52")

        rngs = (jax.random.split(rng, 3)
                if (train and rng is not None) else (None,) * 3)

        def head(h, name, r):
            # reference Dropout2d(0.1) before the 1x1 (train only)
            if r is not None:
                keep = jax.random.bernoulli(
                    r, 0.9, h.shape[:1] + (1, 1) + h.shape[-1:])
                h = h * keep.astype(h.dtype) / 0.9
            return MaybeCondConv(self.out_num_ch, 1, 1, 0, name=name)(h)

        sasc_out = head(sa_conv + sc_conv, "conv8", rngs[0])
        sa_out = head(sa_conv, "conv6", rngs[1])
        sc_out = head(sc_conv, "conv7", rngs[2])
        return sasc_out, sa_out, sc_out


class DANet(nn.Module):
    """src/model.py:1827-1853: x2 upsample + 3-channel projection ->
    dilated-ResNet50 -> dual-attention head -> outputs resized to input."""
    out_num_ch: int

    @nn.compact
    def __call__(self, x, *, train: bool = False, rng=None):
        imsize = x.shape[-3:-1]
        h = bilinear_resize(x, (2 * imsize[0], 2 * imsize[1]),
                            align_corners=True)
        h = jax.nn.relu(MaybeCondConv(3, 3, 1, 1, name="input_conv")(h))
        c4 = BackBone(name="backbone")(h, train=train)
        o0, o1, o2 = DANetHead(self.out_num_ch, name="head")(
            c4, train=train, rng=rng)
        o0 = bilinear_resize(o0, imsize, align_corners=True)
        # reference returns (main_output, []) (src/model.py:1852)
        return o0, []
