"""Legacy / lineage models kept for capability parity (SURVEY §2.6).

These are the reference's ZeroDose-GAN / GBM-VAE / Lowdose lineage modules
that are present but unused by the active entry point.  Re-implemented
faithfully (including quirk Q1 identity activations inside the Conv_BN_Act
blocks) so users of those model names can migrate:

- ``UNet`` + ConvDouble/Down/Up blocks           (src/model.py:20-112);
  the reference's 'linear' output activation crashes (nn.Linear() no-args,
  src/model.py:96) — here it is an explicit error with a message
- ``GANStandardGenerator`` (8-down pix2pix)      (src/model.py:209-259)
- ``GANShortNoShortCutGenerator``                (src/model.py:301-339)
- ``GANShortGeneratorVAE`` + ``VariationNet``    (src/model.py:1606-1684);
  the reference's LatentLayer samples with NUMPY RNG (src/model.py:1659) —
  here sampling uses a jax PRNG key
- ``LowdoseModel`` (residual U-Net, Tanh head)   (src/model.py:2803-2898)
- ``SymmetrySpatialAttentionLayer`` / ``SymmetryResidualSpatialAttentionLayer``
  / ``MultiAttentionLayer``                      (src/model.py:1329-1467)

``DANet`` (broken upstream — undefined ``resnet`` module,
src/model.py:1767) has a WORKING port in models/danet.py; the ``ResNet18``
amyloid classifier lives in models/resnet.py (npz weight contract); the
remaining legacy generator bodies live in models/legacy_generators.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.layers import (
    ActDeconvBNConcat, BatchNormTorch, ConvBNAct, MaybeCondConv)
from representation_disentanglement_tpu.ops import (
    apply_act, avg_pool, bilinear_resize, max_pool)


def _out_act(name: str):
    if name == "linear":
        raise ValueError(
            "output_activation='linear' crashes in the reference "
            "(nn.Linear() without args, src/model.py:96); use 'no'")
    if name in ("sigmoid", "tanh", "no"):
        return name
    return "softplus"


class ConvDoubleBlock(nn.Module):
    features: int
    is_bn: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool):
        for i in range(2):
            x = MaybeCondConv(self.features, 3, 1, 1, name=f"conv{i}")(x)
            if self.is_bn:
                x = BatchNormTorch(self.features, name=f"bn{i}")(
                    x, use_running_average=not train)
            x = jax.nn.relu(x)
        return x


class UNet(nn.Module):
    """Plain U-Net (src/model.py:76-112): maxpool downs, real ReLUs."""
    out_num_ch: int
    first_num_ch: int = 64
    output_activation: str = "softplus"

    @nn.compact
    def __call__(self, x, *, train: bool):
        f = self.first_num_ch
        d1 = ConvDoubleBlock(f, name="down_1")(x, train=train)
        downs = [d1]
        for i, ch in enumerate([2 * f, 4 * f, 8 * f, 16 * f]):
            h = max_pool(downs[-1], 2)
            downs.append(ConvDoubleBlock(ch, name=f"down_{i + 2}")(
                h, train=train))
        up = downs[4]
        for i, ch in zip((4, 3, 2, 1), (8 * f, 4 * f, 2 * f, f)):
            u = bilinear_resize(up, (2 * up.shape[-3], 2 * up.shape[-2]),
                                align_corners=True)
            u = MaybeCondConv(ch, 3, 1, 1, name=f"up_{i}_conv")(u)
            u = jnp.concatenate([downs[i - 1], u], axis=-1)
            up = ConvDoubleBlock(ch, name=f"up_{i}_block")(u, train=train)
        out = MaybeCondConv(self.out_num_ch, 1, 1, 0, name="output")(up)
        return apply_act(out, _out_act(self.output_activation)), {}


class GANStandardGenerator(nn.Module):
    """8-down pix2pix generator (src/model.py:209-259)."""
    out_num_ch: int
    first_num_ch: int = 64
    output_activation: str = "softplus"
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        f, fx = self.first_num_ch, self.fix_act_bug
        d = MaybeCondConv(f, 4, 2, 1, name="down_1")(x)
        d = jax.nn.leaky_relu(d, 0.2)
        downs = [d]
        chans = [2 * f, 4 * f] + [8 * f] * 5
        for i, ch in enumerate(chans):
            act = "no" if i == len(chans) - 1 else "lrelu"
            downs.append(ConvBNAct(ch, activation=act, fix_act_bug=fx,
                                   name=f"down_{i + 2}")(downs[-1],
                                                         train=train))
        up = downs[-1]
        up_chans = [8 * f] * 4 + [4 * f, 2 * f, f]
        for i, ch in enumerate(up_chans):
            skip = downs[6 - i]
            up = ActDeconvBNConcat(ch, fix_act_bug=fx,
                                   name=f"up_{7 - i}")(skip, up, train=train)
        out = ActDeconvBNConcat(self.out_num_ch, is_last=True,
                                fix_act_bug=fx, name="output")(
            None, up, train=train)
        return apply_act(out, _out_act(self.output_activation)), {}


class GANShortNoShortCutGenerator(nn.Module):
    """Short U-Net without skip connections (src/model.py:301-339)."""
    out_num_ch: int
    first_num_ch: int = 64
    output_activation: str = "softplus"
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        f, fx = self.first_num_ch, self.fix_act_bug
        h = MaybeCondConv(f, 4, 2, 1, name="down_1")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        for i, ch in enumerate([2 * f, 4 * f, 8 * f, 8 * f]):
            act = "no" if i == 3 else "lrelu"
            h = ConvBNAct(ch, activation=act, fix_act_bug=fx,
                          name=f"down_{i + 2}")(h, train=train)
        # Act_Deconv_BN without concat (src/model.py:176-207)
        for i, ch in zip((4, 3, 2, 1), (8 * f, 4 * f, 2 * f, f)):
            h = apply_act(h, "identity")        # quirk Q1 'relu' -> identity
            h = bilinear_resize(h, (2 * h.shape[-3], 2 * h.shape[-2]),
                                align_corners=True)
            h = MaybeCondConv(ch, 3, 1, 1, name=f"up_{i}_conv")(h)
            h = BatchNormTorch(ch, name=f"up_{i}_bn")(
                h, use_running_average=not train)
        h = bilinear_resize(h, (2 * h.shape[-3], 2 * h.shape[-2]),
                            align_corners=True)
        out = MaybeCondConv(self.out_num_ch, 3, 1, 1, name="output_conv")(h)
        return apply_act(out, _out_act(self.output_activation)), {}


class VariationNet(nn.Module):
    """Encoder to a spatial latent with unit-variance sampling
    (src/model.py:1648-1684)."""
    first_num_ch: int = 64
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, rng: Optional[jax.Array] = None, *, train: bool):
        f, fx = self.first_num_ch, self.fix_act_bug
        h = MaybeCondConv(f, 4, 2, 1, name="down_1")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        for i, ch in enumerate([2 * f, 4 * f, 8 * f, 8 * f]):
            act = "no" if i == 3 else "lrelu"
            h = ConvBNAct(ch, activation=act, fix_act_bug=fx,
                          name=f"down_{i + 2}")(h, train=train)
        if rng is not None:                       # LatentLayer sampling
            h = h + jax.random.normal(rng, h.shape, jnp.float32).astype(
                h.dtype)
        return h


class GANShortGeneratorVAE(nn.Module):
    """Short U-Net conditioned on a concatenated latent at the bottleneck
    (src/model.py:1606-1645)."""
    out_num_ch: int
    first_num_ch: int = 64
    output_activation: str = "softplus"
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, latent, *, train: bool):
        f, fx = self.first_num_ch, self.fix_act_bug
        d1 = MaybeCondConv(f, 4, 2, 1, name="down_1")(x)
        d1 = jax.nn.leaky_relu(d1, 0.2)
        d2 = ConvBNAct(2 * f, fix_act_bug=fx, name="down_2")(d1, train=train)
        d3 = ConvBNAct(4 * f, fix_act_bug=fx, name="down_3")(d2, train=train)
        d4 = ConvBNAct(8 * f, fix_act_bug=fx, name="down_4")(d3, train=train)
        d5 = ConvBNAct(8 * f, activation="no", fix_act_bug=fx,
                       name="down_5")(d4, train=train)
        cat5 = jnp.concatenate([d5, latent], axis=-1)
        u4 = ActDeconvBNConcat(8 * f, fix_act_bug=fx, name="up_4")(
            d4, cat5, train=train)
        u3 = ActDeconvBNConcat(4 * f, fix_act_bug=fx, name="up_3")(
            d3, u4, train=train)
        u2 = ActDeconvBNConcat(2 * f, fix_act_bug=fx, name="up_2")(
            d2, u3, train=train)
        u1 = ActDeconvBNConcat(f, fix_act_bug=fx, name="up_1")(
            d1, u2, train=train)
        out = ActDeconvBNConcat(self.out_num_ch, is_last=True,
                                fix_act_bug=fx, name="output")(
            None, u1, train=train)
        return apply_act(out, _out_act(self.output_activation)), {}


class LowdoseModel(nn.Module):
    """Residual U-Net, Tanh correction added to input channel 0
    (src/model.py:2803-2898)."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        def triple(h, ch, name):
            for i in range(3):
                h = MaybeCondConv(ch, 3, 1, 1, name=f"{name}_c{i}")(h)
                h = BatchNormTorch(ch, name=f"{name}_bn{i}")(
                    h, use_running_average=not train)
                h = jax.nn.relu(h)
            return h

        up2x = lambda h: bilinear_resize(
            h, (2 * h.shape[-3], 2 * h.shape[-2]), align_corners=False)
        c1 = triple(x, 32, "conv1")
        c2 = triple(max_pool(c1, 2), 32, "conv2")
        c3 = triple(max_pool(c2, 2), 64, "conv3")
        bott = max_pool(c3, 2)
        c4 = triple(bott, 64, "conv4")
        u3 = up2x(c4 + bott)
        d3 = triple(jnp.concatenate([u3, c3], -1), 64, "dconv3")
        u2 = up2x(d3)
        d2 = triple(jnp.concatenate([u2, c2], -1), 32, "dconv2")
        u1 = up2x(d2)
        h = jnp.concatenate([u1, c1], -1)
        for i in range(3):
            h = MaybeCondConv(32, 3, 1, 1, name=f"dconv1_c{i}")(h)
            h = BatchNormTorch(32, name=f"dconv1_bn{i}")(
                h, use_running_average=not train)
            h = jax.nn.relu(h)
        corr = jnp.tanh(MaybeCondConv(1, 3, 1, 1, name="dconv1_out")(h))
        return x[..., 0:1] + corr, None


class SymmetrySpatialAttentionLayer(nn.Module):
    """Gate from |g - flip_H(g)| (src/model.py:1329-1357); output alpha*x."""
    inter_num_ch: int
    sample_factor: Tuple[int, int] = (2, 2)
    residual: bool = False      # True -> SymmetryResidual variant (:1359)

    @nn.compact
    def __call__(self, x, g, *, train: bool):
        in_ch = x.shape[-1]
        x_post = MaybeCondConv(self.inter_num_ch, self.sample_factor,
                               self.sample_factor, 0, use_bias=False,
                               name="W_x")(x)
        g_diff = jnp.abs(g - jnp.flip(g, axis=-3))
        g_post = MaybeCondConv(self.inter_num_ch, 1, 1, 0, name="W_g")(
            g_diff)
        g_post = bilinear_resize(g_post, x_post.shape[-3:-1],
                                 align_corners=False)
        alpha = jax.nn.sigmoid(MaybeCondConv(1, 1, 1, 0, name="W_psi")(
            jax.nn.relu(x_post + g_post)))
        alpha_up = bilinear_resize(alpha, x.shape[-3:-1],
                                   align_corners=False)
        gate = (1.0 + alpha_up) if self.residual else alpha_up
        out = MaybeCondConv(in_ch, 1, 1, 0, name="W_out_conv")(gate * x)
        out = BatchNormTorch(in_ch, name="W_out_bn")(
            out, use_running_average=not train)
        return out, alpha_up


class MultiAttentionLayer(nn.Module):
    """Spatial-pooled channel attention over x + symmetry-gated g
    (src/model.py:1435-1467).  NOTE: the reference constructs its 1x1 convs
    with a float channel count (`in_num_ch/sample_factor_channel`,
    src/model.py:1441) and would crash; integer division is used here."""
    sample_factor_spatial: Tuple[int, int] = (2, 2)
    sample_factor_channel: int = 16
    kernel_stride_ratio: int = 4
    is_bn: bool = True

    @nn.compact
    def __call__(self, x, g, *, train: bool):
        in_ch = x.shape[-1]
        x_post = MaybeCondConv(in_ch, 1, 1, 0, name="W_x")(x)
        g_diff = g - jnp.flip(g, axis=-3)
        g_post = MaybeCondConv(in_ch, 1, 1, 0, name="W_g")(g_diff)
        g_post = bilinear_resize(g_post, x.shape[-3:-1],
                                 align_corners=False)
        xg = jax.nn.relu(x_post + g_post)
        k = tuple(z * self.kernel_stride_ratio
                  for z in self.sample_factor_spatial)
        xg_avg = avg_pool(xg, k, self.sample_factor_spatial)
        down = jax.nn.relu(MaybeCondConv(
            in_ch // self.sample_factor_channel, 1, 1, 0, name="W_down")(
            xg_avg))
        alpha = jax.nn.sigmoid(MaybeCondConv(in_ch, 1, 1, 0, name="W_up")(
            down))
        alpha_up = bilinear_resize(alpha, x.shape[-3:-1],
                                   align_corners=False)
        out = MaybeCondConv(in_ch, 1, 1, 0, name="W_out_conv")(
            (1.0 + alpha_up) * x)
        if self.is_bn:
            out = BatchNormTorch(in_ch, name="W_out_bn")(
                out, use_running_average=not train)
        return out, alpha_up
