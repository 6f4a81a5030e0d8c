"""Volumetric stack: Myronenko-style 3D U-Net + VAE regularization branch.

Reference: ``BasicBlock`` / ``VAEBranch`` / ``UNet3D`` / ``NVNet3D``
(src/model.py:1856-2060) — the whole-volume BraTS segmentation path (no
driver exists in the reference repo; SURVEY §2.6).  TPU-native notes:

- layout [B, D, H, W, C] (depth leading among spatial dims for the
  depth-sharded inference in parallel/halo.py);
- GroupNorm(8) instead of BatchNorm -> no cross-replica stats issues and a
  clean depth-sharded reduction (just a psum over the D axis);
- nearest 2x upsampling (torch Upsample default used by the reference).

Faithfully reproduced detail: the reference BasicBlock's second GroupNorm is
constructed over ``in_channels`` (src/model.py:1862) though it is applied
after conv1's ``out_channels`` output — consistent only because every
instantiation uses in == out, which this implementation asserts.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.layers import (
    TorchLinear, torch_conv_bias_init_factory)
from representation_disentanglement_tpu.ops.conv3d import (
    _DEPTH_AXIS, conv3d, global_mean3d, group_norm, upsample3d_nearest)


def torch_conv3d_kernel_init(key, shape, dtype=jnp.float32):
    kd, kh, kw, ci, _ = shape
    bound = 1.0 / math.sqrt(ci * kd * kh * kw)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv3d(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        ks = (self.kernel_size,) * 3
        ci = x.shape[-1]
        w = self.param("kernel", torch_conv3d_kernel_init,
                       (*ks, ci, self.features))
        b = self.param("bias", torch_conv_bias_init_factory(
            ci * ks[0] * ks[1] * ks[2]), (self.features,)) \
            if self.use_bias else None
        return conv3d(x, w, b, self.stride, self.padding)


class GroupNorm(nn.Module):
    features: int
    num_groups: int = 8

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return group_norm(x, scale, bias, self.num_groups)


class BasicBlock3D(nn.Module):
    """Pre-activation residual block (src/model.py:1856-1875)."""
    features: int

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == self.features, (
            "reference BasicBlock requires in_channels == out_channels "
            "(its gn2 is sized for in_channels, src/model.py:1862)")
        r = x
        h = jax.nn.relu(GroupNorm(self.features, name="gn1")(x))
        h = Conv3d(self.features, name="conv1")(h)
        h = jax.nn.relu(GroupNorm(self.features, name="gn2")(h))
        h = Conv3d(self.features, name="conv2")(h)
        return h + r


class UNet3D(nn.Module):
    """src/model.py:1952-2047."""
    in_channels: int = 4
    out_channels: int = 3
    init_channels: int = 32
    dropout_p: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool,
                 dropout_rng: Optional[jax.Array] = None):
        f = self.init_channels
        c1 = Conv3d(f, name="conv1a")(x)
        c1 = BasicBlock3D(f, name="conv1b")(c1)
        c1d = Conv3d(2 * f, stride=2, name="ds1")(c1)

        c2 = BasicBlock3D(2 * f, name="conv2a")(c1d)
        c2 = BasicBlock3D(2 * f, name="conv2b")(c2)
        c2d = Conv3d(4 * f, stride=2, name="ds2")(c2)

        c3 = BasicBlock3D(4 * f, name="conv3a")(c2d)
        c3 = BasicBlock3D(4 * f, name="conv3b")(c3)
        c3d = Conv3d(8 * f, stride=2, name="ds3")(c3)

        c4 = BasicBlock3D(8 * f, name="conv4a")(c3d)
        c4 = BasicBlock3D(8 * f, name="conv4b")(c4)
        c4 = BasicBlock3D(8 * f, name="conv4c")(c4)
        c4d = BasicBlock3D(8 * f, name="conv4d")(c4)

        if train and self.dropout_p > 0 and dropout_rng is not None:
            keep = 1.0 - self.dropout_p
            mask = jax.random.bernoulli(dropout_rng, keep, c4d.shape)
            c4d = jnp.where(mask, c4d / keep, 0.0).astype(c4d.dtype)

        u4 = Conv3d(4 * f, kernel_size=1, padding=0, name="up4conva")(c4d)
        u4 = upsample3d_nearest(u4) + c3
        u4 = BasicBlock3D(4 * f, name="up4convb")(u4)

        u3 = Conv3d(2 * f, kernel_size=1, padding=0, name="up3conva")(u4)
        u3 = upsample3d_nearest(u3) + c2
        u3 = BasicBlock3D(2 * f, name="up3convb")(u3)

        u2 = Conv3d(f, kernel_size=1, padding=0, name="up2conva")(u3)
        u2 = upsample3d_nearest(u2) + c1
        u2 = BasicBlock3D(f, name="up2convb")(u2)

        uout = Conv3d(self.out_channels, kernel_size=1, padding=0,
                      name="up1conv")(u2)
        return uout, c4d


class VAEBranch(nn.Module):
    """src/model.py:1878-1949.  input_shape is (D, H, W) of the volume."""
    input_shape: Tuple[int, int, int]
    init_channels: int = 16
    out_channels: int = 4
    squeeze_channels: Optional[int] = None

    @nn.compact
    def __call__(self, c4d, rng: Optional[jax.Array] = None):
        f = self.init_channels
        sq = self.squeeze_channels or f * 4
        h = jax.nn.relu(GroupNorm(8 * f, name="hidden_gn")(c4d))
        h = Conv3d(sq, name="hidden_conv")(h)
        h = global_mean3d(h)                               # AdaptiveAvgPool(1)
        mu = TorchLinear(sq // 2, name="mu_fc")(h[:, :sq // 2])
        logvar = TorchLinear(sq // 2, name="logvar_fc")(h[:, sq // 2:])
        if rng is not None:
            eps = jax.random.normal(rng, mu.shape, jnp.float32)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z = mu
        d16 = tuple(s // 16 for s in self.input_shape)
        re = jax.nn.relu(TorchLinear(
            8 * f * d16[0] * d16[1] * d16[2], name="reconstruction")(z))
        # torch reshapes channel-major [B, C, d, h, w]
        re = re.reshape(re.shape[0], 8 * f, *d16)
        re = jnp.moveaxis(re, 1, -1)                        # -> [B,d,h,w,C]
        axis = _DEPTH_AXIS.get()
        if axis is not None:
            # depth-sharded: each shard decodes only its local depth block
            n = jax.lax.axis_size(axis)
            rank = jax.lax.axis_index(axis)
            local = d16[0] // n
            assert local > 0, ("depth/16 must be divisible by the mesh "
                               "size for sharded VAE decoding")
            re = jax.lax.dynamic_slice_in_dim(re, rank * local, local,
                                              axis=1)
        v = Conv3d(8 * f, kernel_size=1, padding=0, name="vconv4_conv")(re)
        v = upsample3d_nearest(v)
        v = Conv3d(4 * f, name="vconv3_conv")(v)
        v = upsample3d_nearest(v)
        v = BasicBlock3D(4 * f, name="vconv3_block")(v)
        v = Conv3d(2 * f, name="vconv2_conv")(v)
        v = upsample3d_nearest(v)
        v = BasicBlock3D(2 * f, name="vconv2_block")(v)
        v = Conv3d(f, name="vconv1_conv")(v)
        v = upsample3d_nearest(v)
        v = BasicBlock3D(f, name="vconv1_block")(v)
        vout = Conv3d(self.out_channels, kernel_size=1, padding=0,
                      name="vconv0")(v)
        return vout, mu, logvar


class NVNet3D(nn.Module):
    """src/model.py:2050-2060: U-Net output + VAE reconstruction branch."""
    input_shape: Tuple[int, int, int] = (64, 160, 192)   # (D, H, W)
    in_channels: int = 4
    out_channels: int = 3
    init_channels: int = 16
    dropout_p: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 rng: Optional[jax.Array] = None):
        drop_rng = vae_rng = None
        if rng is not None:
            drop_rng, vae_rng = jax.random.split(rng)
        uout, c4d = UNet3D(self.in_channels, self.out_channels,
                           self.init_channels, self.dropout_p,
                           name="unet")(x, train=train, dropout_rng=drop_rng)
        vout, mu, logvar = VAEBranch(
            self.input_shape, self.init_channels,
            out_channels=self.in_channels, name="vae_branch")(
            c4d, vae_rng if train else None)
        return uout, vout, mu, logvar


def nvnet_loss(uout, vout, mu, logvar, seg_target, x_input,
               kl_weight: float = 0.1, recon_weight: float = 0.1,
               data_axis=None):
    """Standard Myronenko NVNet loss (the reference ships no 3D driver):
    3-class soft dice on sigmoid(uout) + L2 VAE recon + KL.

    Inside a ``depth_sharded`` scope (training under shard_map over the
    depth mesh axis, parallel/halo.py) the dice numerator/denominator and
    the recon mean reduce GLOBALLY via psum/pmean — dice is a ratio of
    whole-volume sums, so per-shard dice would be wrong.  mu/logvar are
    already replicated (global_mean3d pmeans inside the encoder).

    ``data_axis`` (composed DP x depth mesh): the batch also shards over a
    data mesh axis, and dice is a nonlinear ratio of batch-pooled sums — a
    mean of per-row dices is NOT the unsharded global-batch dice.  The
    num/den psum and the recon/KL means therefore reduce over the data
    axis too, so the composed step optimizes the exact loss the unsharded
    step does (the gradient assembly in train3d.local_grads — pmean over
    every sharded axis — is consistent with forward psum AND pmean: the
    shard_map transpose of either re-broadcasts summed cotangents)."""
    from representation_disentanglement_tpu.ops.conv3d import (
        current_depth_axis)
    axes = tuple(a for a in (current_depth_axis(), data_axis) if a)
    gsum = (lambda v: jax.lax.psum(v, axes)) if axes else (lambda v: v)
    gmean = (lambda v: jax.lax.pmean(v, axes)) if axes else (lambda v: v)
    p = jax.nn.sigmoid(uout.astype(jnp.float32))
    dice = 0.0
    for i in range(uout.shape[-1]):
        gt_i = (seg_target[..., 0] == i + 1).astype(jnp.float32)
        num = 2.0 * gsum(jnp.sum(p[..., i] * gt_i))
        den = gsum(jnp.sum(jnp.square(p[..., i]) + jnp.square(gt_i)))
        dice += 1.0 - num / (den + 1e-6)
    dice = dice / uout.shape[-1]
    depth_axis = current_depth_axis()
    n_shards = jax.lax.axis_size(depth_axis) if depth_axis else 1
    n = x_input.size / x_input.shape[0] * n_shards     # global volume size
    recon = gmean(jnp.mean(jnp.square(vout.astype(jnp.float32)
                                      - x_input.astype(jnp.float32))))
    # KL is replicated over depth (mu/logvar come from a pmean'd encoder)
    # but differs per data row: mean it over the data axis (equal shares)
    kl = jnp.mean(jnp.sum(
        jnp.exp(logvar) + jnp.square(mu) - 1.0 - logvar, axis=-1)) / n
    if data_axis is not None:
        kl = jax.lax.pmean(kl, data_axis)
    return dice + recon_weight * recon + kl_weight * kl, {
        "dice_loss": dice, "vae_recon": recon, "kl": kl}
