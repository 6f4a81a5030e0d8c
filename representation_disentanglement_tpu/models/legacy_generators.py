"""ZeroDose-GAN legacy generator variants (SURVEY §2.6, src/model.py:393-1301).

These are the lineage generators that predate the disentanglement model.
None is reachable from the shipped config (``target_model_name`` dispatches
only 'U'/'U+SA'/'U+SA+CA'/'U+SSA+CA', src/model.py:2955-2964), but they are
part of the reference's surface, so they are ported faithfully — including
quirk Q1 (block activations resolve to identity) and the split-input channel
layouts.  Parity-tested against the reference classes with transplanted
weights (tests/test_legacy_generators.py).

Known-broken upstream, fixed here with the divergence documented:
- ``GANShortGeneratorWithSplitInputMultiAttentionAll`` constructs 1x1 convs
  with FLOAT channel counts (``in_num_ch/sample_factor_channel``,
  src/model.py:1441-1442) and cannot be instantiated under python3 torch;
  models/legacy.MultiAttentionLayer uses integer division.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.attention import (
    ChannelAttentionLayer, SpatialAttentionLayer,
    SymmetryGateResidualSpatialAttentionLayer)
from representation_disentanglement_tpu.models.layers import (
    ActDeconvBNConcat, ConvBNAct, MaybeCondConv)
from representation_disentanglement_tpu.models.legacy import (
    MultiAttentionLayer, SymmetrySpatialAttentionLayer, _out_act)
from representation_disentanglement_tpu.ops import apply_act

# split-input channel layouts (NCHW slices in the reference -> NHWC here):
# 3-channel ZeroDose: one branch per contrast (src/model.py:455-458)
SPLIT3 = (slice(0, 1), slice(1, 2), slice(2, 3))
# 4 single channels (GANStandardGenerator...One, src/model.py:533-536)
SPLIT4 = (slice(0, 1), slice(1, 2), slice(2, 3), slice(3, 4))
# 8-channel stroke layout: DWI | ADCx2 | TMAXx2 | CBV,CBF,MTT
# (src/model.py:851-854, 964-967)
SPLIT8 = (slice(2, 3), slice(0, 2), slice(6, 8), slice(3, 6))


class _SplitDown1(nn.Module):
    """Per-branch stride-2 conv(4,2,1)+LeakyReLU on channel slices, concat,
    optional SE channel attention, 1x1 comb conv + LeakyReLU
    (src/model.py:404-419 etc.)."""
    first_num_ch: int
    splits: Tuple[slice, ...]
    use_ca: bool = False

    @nn.compact
    def __call__(self, x):
        f = self.first_num_ch
        parts = []
        for i, sl in enumerate(self.splits):
            h = MaybeCondConv(f, 4, 2, 1, name=f"down_1_{i + 1}")(x[..., sl])
            parts.append(jax.nn.leaky_relu(h, 0.2))
        h = jnp.concatenate(parts, axis=-1)
        if self.use_ca:
            h, _ = ChannelAttentionLayer(4, name="down_1_ca")(h)
        h = MaybeCondConv(f, 1, 1, 0, name="down_1_comb")(h)
        return jax.nn.leaky_relu(h, 0.2)


def _downs_2_5(h, f, fx, train, is_bn=True):
    d2 = ConvBNAct(2 * f, is_bn=is_bn, fix_act_bug=fx, name="down_2")(
        h, train=train)
    d3 = ConvBNAct(4 * f, is_bn=is_bn, fix_act_bug=fx, name="down_3")(
        d2, train=train)
    d4 = ConvBNAct(8 * f, is_bn=is_bn, fix_act_bug=fx, name="down_4")(
        d3, train=train)
    d5 = ConvBNAct(8 * f, activation="no", is_bn=is_bn, fix_act_bug=fx,
                   name="down_5")(d4, train=train)
    return d2, d3, d4, d5


def _att_up_path(att_ctor, downs, f, fx, out_ch, train, is_bn=True,
                 ca_all=False):
    """Attention-gated short up path shared by all variants
    (e.g. src/model.py:458-470).  att_ctor(inter_ch, name) builds the gate;
    with ca_all the skip is CA(d) + att(d, g) (src/model.py:983-998)."""
    d1, d2, d3, d4, d5 = downs
    alphas = {}
    g = d5
    for idx, (d, ch, sf) in zip((4, 3, 2, 1),
                                ((d4, 8 * f, 8), (d3, 4 * f, 4),
                                 (d2, 2 * f, 2), (d1, f, 1))):
        cs, a = att_ctor(ch, f"att_{idx}_s" if ca_all else f"att_{idx}")(
            d, g, train=train)
        alphas[f"alpha_{idx}"] = a
        if ca_all:
            cc, _ = ChannelAttentionLayer(sf, name=f"att_{idx}_c")(d)
            cs = cc + cs
        g = ActDeconvBNConcat(ch, is_bn=is_bn, fix_act_bug=fx,
                              name=f"up_{idx}")(cs, g, train=train)
    out = ActDeconvBNConcat(out_ch, is_last=True, is_bn=is_bn,
                            fix_act_bug=fx, name="output")(
        None, g, train=train)
    return out, alphas


class _LegacyAttGenerator(nn.Module):
    """Shared body: [split] down path -> attention-gated up path."""
    out_num_ch: int
    attention: str                   # 'sa' | 'ssa' | 'ssa_res' | 'sgrsa'
                                     # | 'multi'
    splits: Tuple[slice, ...] = ()   # empty -> plain down_1 conv
    use_ca_comb: bool = False        # SE on the concatenated split branches
    ca_all: bool = False             # per-level CA added to the gated skip
    first_num_ch: int = 64
    output_activation: str = "softplus"
    is_bn: bool = True
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        f, fx = self.first_num_ch, self.fix_act_bug
        if self.splits:
            d1 = _SplitDown1(f, self.splits, self.use_ca_comb,
                             name="split_down_1")(x)
        else:
            d1 = jax.nn.leaky_relu(
                MaybeCondConv(f, 4, 2, 1, name="down_1")(x), 0.2)
        d2, d3, d4, d5 = _downs_2_5(d1, f, fx, train, is_bn=self.is_bn)

        def att_ctor(ch, name):
            if self.attention == "sa":
                return SpatialAttentionLayer(ch, name=name)
            if self.attention == "ssa":
                return SymmetrySpatialAttentionLayer(ch, name=name)
            if self.attention == "ssa_res":
                return SymmetrySpatialAttentionLayer(ch, residual=True,
                                                     name=name)
            if self.attention == "sgrsa":
                return SymmetryGateResidualSpatialAttentionLayer(
                    ch, is_bn=self.is_bn, name=name)
            if self.attention == "multi":
                return MultiAttentionLayer(is_bn=self.is_bn, name=name)
            raise ValueError(f"unknown attention {self.attention!r}")

        out, alphas = _att_up_path(att_ctor, (d1, d2, d3, d4, d5), f, fx,
                                   self.out_num_ch, train, is_bn=self.is_bn,
                                   ca_all=self.ca_all)
        return apply_act(out, _out_act(self.output_activation)), alphas


def GANShortGeneratorWithSplitInputAndSpatialAttention(
        out_num_ch, first_num_ch=64, output_activation="softplus",
        fix_act_bug=False, name=None):
    """src/model.py:393-471: 3 single-channel down branches + SA gates."""
    return _LegacyAttGenerator(
        out_num_ch=out_num_ch, attention="sa", splits=SPLIT3,
        first_num_ch=first_num_ch, output_activation=output_activation,
        fix_act_bug=fix_act_bug, name=name)


def GANShortGeneratorWithSymmetrySpatialAttention(
        out_num_ch, first_num_ch=64, output_activation="softplus",
        fix_act_bug=False, name=None):
    """src/model.py:550-599."""
    return _LegacyAttGenerator(
        out_num_ch=out_num_ch, attention="ssa", first_num_ch=first_num_ch,
        output_activation=output_activation, fix_act_bug=fix_act_bug,
        name=name)


def GANShortGeneratorWithSymmetryResidualSpatialAttention(
        out_num_ch, first_num_ch=64, output_activation="softplus",
        fix_act_bug=False, name=None):
    """src/model.py:601-650."""
    return _LegacyAttGenerator(
        out_num_ch=out_num_ch, attention="ssa_res",
        first_num_ch=first_num_ch, output_activation=output_activation,
        fix_act_bug=fix_act_bug, name=name)


def GANShortGeneratorWithSymmetryGateResidualSpatialAttention(
        out_num_ch, first_num_ch=64, output_activation="softplus",
        fix_act_bug=False, name=None):
    """src/model.py:652-701."""
    return _LegacyAttGenerator(
        out_num_ch=out_num_ch, attention="sgrsa",
        first_num_ch=first_num_ch, output_activation=output_activation,
        fix_act_bug=fix_act_bug, name=name)


def GANShortGeneratorWithSplitInputAndSymmetryGateResidualSpatialAttention(
        out_num_ch, first_num_ch=64, output_activation="softplus",
        fix_act_bug=False, name=None):
    """src/model.py:703-768."""
    return _LegacyAttGenerator(
        out_num_ch=out_num_ch, attention="sgrsa", splits=SPLIT3,
        first_num_ch=first_num_ch, output_activation=output_activation,
        fix_act_bug=fix_act_bug, name=name)


def GANShortGeneratorWithSplitInputChannelAttentionOneAndSpatialAttention(
        out_num_ch, in_num_ch=3, first_num_ch=64,
        output_activation="softplus", fix_act_bug=False, name=None):
    """src/model.py:770-878: split branches + SE on the concat + SGRSA gates
    (despite the 'SpatialAttention' name, the gates are the symmetry-gate-
    residual layer, src/model.py:822-829).  in_num_ch selects the ZeroDose
    3-channel or the 8-channel stroke split layout."""
    return _LegacyAttGenerator(
        out_num_ch=out_num_ch, attention="sgrsa",
        splits=SPLIT3 if in_num_ch == 3 else SPLIT8, use_ca_comb=True,
        first_num_ch=first_num_ch, output_activation=output_activation,
        fix_act_bug=fix_act_bug, name=name)


def GANShortGeneratorWithSplitInputChannelAttentionAllAndSpatialAttention(
        out_num_ch, in_num_ch=3, first_num_ch=64,
        output_activation="softplus", fix_act_bug=False, name=None):
    """src/model.py:880-1000 ('current best model 2019/6/12'): split + SE
    comb + per-level CA added to the SGRSA-gated skips."""
    return _LegacyAttGenerator(
        out_num_ch=out_num_ch, attention="sgrsa",
        splits=SPLIT3 if in_num_ch == 3 else SPLIT8, use_ca_comb=True,
        ca_all=True, first_num_ch=first_num_ch,
        output_activation=output_activation, fix_act_bug=fix_act_bug,
        name=name)


def GANShortGeneratorWithSplitInputChannelAttentionAllAndSpatialAttentionNoBN(
        out_num_ch, first_num_ch=64, output_activation="softplus",
        fix_act_bug=False, name=None):
    """src/model.py:1139-1226: the CA-All variant with every BatchNorm off."""
    return _LegacyAttGenerator(
        out_num_ch=out_num_ch, attention="sgrsa", splits=SPLIT3,
        use_ca_comb=True, ca_all=True, is_bn=False,
        first_num_ch=first_num_ch, output_activation=output_activation,
        fix_act_bug=fix_act_bug, name=name)


def GANShortGeneratorWithSplitInputMultiAttentionAll(
        out_num_ch, first_num_ch=64, output_activation="softplus",
        fix_act_bug=False, name=None):
    """src/model.py:1228-1301 (dual-attention).  Broken upstream: float
    channel counts in MultiAttentionLayer (src/model.py:1441-1442); integer
    division here."""
    return _LegacyAttGenerator(
        out_num_ch=out_num_ch, attention="multi", splits=SPLIT3,
        use_ca_comb=True, first_num_ch=first_num_ch,
        output_activation=output_activation, fix_act_bug=fix_act_bug,
        name=name)


class GANStandardGeneratorWithSplitInputChannelAttentionOne(nn.Module):
    """src/model.py:473-548: 4 single-channel split branches + SE + the
    8-down pix2pix body, no attention gates."""
    out_num_ch: int
    first_num_ch: int = 64
    output_activation: str = "softplus"
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        f, fx = self.first_num_ch, self.fix_act_bug
        d1 = _SplitDown1(f, SPLIT4, use_ca=True, name="split_down_1")(x)
        downs = [d1]
        chans = [2 * f, 4 * f] + [8 * f] * 5
        for i, ch in enumerate(chans):
            act = "no" if i == len(chans) - 1 else "lrelu"
            downs.append(ConvBNAct(ch, activation=act, fix_act_bug=fx,
                                   name=f"down_{i + 2}")(downs[-1],
                                                         train=train))
        up = downs[-1]
        up_chans = [8 * f] * 4 + [4 * f, 2 * f, f]
        for i, ch in enumerate(up_chans):
            up = ActDeconvBNConcat(ch, fix_act_bug=fx, name=f"up_{7 - i}")(
                downs[6 - i], up, train=train)
        out = ActDeconvBNConcat(self.out_num_ch, is_last=True,
                                fix_act_bug=fx, name="output")(
            None, up, train=train)
        return apply_act(out, _out_act(self.output_activation)), {}
