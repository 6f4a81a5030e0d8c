"""Output decoders (target synthesis / segmentation heads).

Reference dispatch on ``target_model_name`` (src/model.py:2955-2964):
- 'U'        -> GANShortGenerator (src/model.py:261-299)
- 'U+SA'     -> GANShortGeneratorWithSpatialAttention (src/model.py:341-390)
- 'U+SA+CA'  -> ...ChannelAttentionAllAndSpatialAttention (src/model.py:1070-1135)
- 'U+SSA+CA' -> ...ChannelAttentionAllAndSymmetrySpatialAttention
               (src/model.py:1002-1067)

All are non-conditional; blocks carry quirk-Q1 identity activations, real
nonlinearity is the first LeakyReLU only.  They accept grouped inputs
[G, B, H, W, C] so the per-modality y decodes + the fused decode run as one
batched call with reference-ordered BatchNorm statistics.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.attention import (
    ChannelAttentionLayer, SpatialAttentionLayer,
    SymmetryGateResidualSpatialAttentionLayer)
from representation_disentanglement_tpu.models.layers import (
    ActDeconvBNConcat, ConvBNAct, MaybeCondConv)
from representation_disentanglement_tpu.ops import apply_act


def _down_path(x, f, fix_act_bug, train):
    d1 = MaybeCondConv(f, 4, 2, 1, name="down_1")(x)
    d1 = jax.nn.leaky_relu(d1, 0.2)
    d2 = ConvBNAct(2 * f, name="down_2", fix_act_bug=fix_act_bug)(
        d1, train=train)
    d3 = ConvBNAct(4 * f, name="down_3", fix_act_bug=fix_act_bug)(
        d2, train=train)
    d4 = ConvBNAct(8 * f, name="down_4", fix_act_bug=fix_act_bug)(
        d3, train=train)
    d5 = ConvBNAct(8 * f, activation="no", name="down_5",
                   fix_act_bug=fix_act_bug)(d4, train=train)
    return d1, d2, d3, d4, d5


class GANShortGenerator(nn.Module):
    """'U': plain short U-Net (src/model.py:261-299)."""
    out_num_ch: int
    first_num_ch: int = 64
    output_activation: str = "softplus"
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        f, fx = self.first_num_ch, self.fix_act_bug
        d1, d2, d3, d4, d5 = _down_path(x, f, fx, train)
        u4 = ActDeconvBNConcat(8 * f, name="up_4", fix_act_bug=fx)(
            d4, d5, train=train)
        u3 = ActDeconvBNConcat(4 * f, name="up_3", fix_act_bug=fx)(
            d3, u4, train=train)
        u2 = ActDeconvBNConcat(2 * f, name="up_2", fix_act_bug=fx)(
            d2, u3, train=train)
        u1 = ActDeconvBNConcat(f, name="up_1", fix_act_bug=fx)(
            d1, u2, train=train)
        out = ActDeconvBNConcat(self.out_num_ch, is_last=True, name="output",
                                fix_act_bug=fx)(None, u1, train=train)
        return apply_act(out, self.output_activation), {}


class GANShortGeneratorWithSpatialAttention(nn.Module):
    """'U+SA': attention-gated skips (src/model.py:341-390)."""
    out_num_ch: int
    first_num_ch: int = 64
    output_activation: str = "softplus"
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        f, fx = self.first_num_ch, self.fix_act_bug
        d1, d2, d3, d4, d5 = _down_path(x, f, fx, train)
        c4, a4 = SpatialAttentionLayer(8 * f, name="att_4")(d4, d5,
                                                            train=train)
        u4 = ActDeconvBNConcat(8 * f, name="up_4", fix_act_bug=fx)(
            c4, d5, train=train)
        c3, a3 = SpatialAttentionLayer(4 * f, name="att_3")(d3, u4,
                                                            train=train)
        u3 = ActDeconvBNConcat(4 * f, name="up_3", fix_act_bug=fx)(
            c3, u4, train=train)
        c2, a2 = SpatialAttentionLayer(2 * f, name="att_2")(d2, u3,
                                                            train=train)
        u2 = ActDeconvBNConcat(2 * f, name="up_2", fix_act_bug=fx)(
            c2, u3, train=train)
        c1, a1 = SpatialAttentionLayer(f, name="att_1")(d1, u2, train=train)
        u1 = ActDeconvBNConcat(f, name="up_1", fix_act_bug=fx)(
            c1, u2, train=train)
        out = ActDeconvBNConcat(self.out_num_ch, is_last=True, name="output",
                                fix_act_bug=fx)(None, u1, train=train)
        return (apply_act(out, self.output_activation),
                {"alpha_4": a4, "alpha_3": a3, "alpha_2": a2, "alpha_1": a1})


class _CAGenerator(nn.Module):
    """Shared body for the two channel-attention-all variants
    (src/model.py:1002-1135): skip = CA(down) + SA(down, gate)."""
    out_num_ch: int
    first_num_ch: int = 64
    output_activation: str = "softplus"
    symmetry: bool = False
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        f, fx = self.first_num_ch, self.fix_act_bug
        SA = (SymmetryGateResidualSpatialAttentionLayer if self.symmetry
              else SpatialAttentionLayer)
        d1, d2, d3, d4, d5 = _down_path(x, f, fx, train)
        alphas = {}
        g = d5
        ups = []
        downs = [d4, d3, d2, d1]
        chs = [8 * f, 4 * f, 2 * f, f]
        ca_sf = [8, 4, 2, 1]
        for lvl, (d, ch, sf) in enumerate(zip(downs, chs, ca_sf)):
            idx = 4 - lvl
            cc, _ = ChannelAttentionLayer(sf, name=f"att_{idx}_c")(d)
            cs, a = SA(ch, name=f"att_{idx}_s")(d, g, train=train)
            alphas[f"alpha_{idx}"] = a
            g = ActDeconvBNConcat(ch, name=f"up_{idx}", fix_act_bug=fx)(
                cc + cs, g, train=train)
            ups.append(g)
        out = ActDeconvBNConcat(self.out_num_ch, is_last=True, name="output",
                                fix_act_bug=fx)(None, g, train=train)
        return apply_act(out, self.output_activation), alphas


def make_output_decoder(target_model_name: str, out_num_ch: int,
                        output_activation: str, fix_act_bug: bool = False,
                        first_num_ch: int = 64):
    kw = dict(out_num_ch=out_num_ch, first_num_ch=first_num_ch,
              output_activation=output_activation, fix_act_bug=fix_act_bug,
              name="output_decoder")
    if target_model_name == "U":
        return GANShortGenerator(**kw)
    if target_model_name == "U+SA":
        return GANShortGeneratorWithSpatialAttention(**kw)
    if target_model_name == "U+SA+CA":
        return _CAGenerator(symmetry=False, **kw)
    if target_model_name == "U+SSA+CA":
        return _CAGenerator(symmetry=True, **kw)
    raise ValueError(f"unknown target_model_name {target_model_name!r}")
