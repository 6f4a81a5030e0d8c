"""Anatomy encoder (U-Net enc/dec halves).

Reference: ``AnatomyEncoderEncNew`` (src/model.py:2218-2245) — 5 stride-2
stages, first stage raw conv+LeakyReLU(0.2), stages 2-5 Conv_BN_Act_New
(whose activations are identity via quirk Q1, so they are conv+BN only) —
and ``AnatomyEncoderDecNew`` (src/model.py:2271-2296) — 4 up blocks with
skip concat + a final is_last block emitting s-logits.

All modules operate on grouped activations [M, B, H, W, C] with per-group
conditioning types [M].
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.layers import (
    ActDeconvBNConcat, ConvBNAct, MaybeCondConv)


class AnatomyEncoderEnc(nn.Module):
    first_num_ch: int = 32
    is_cond: bool = False
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, types=None, *, train: bool):
        f = self.first_num_ch
        kw = dict(is_cond=self.is_cond, fix_act_bug=self.fix_act_bug)
        d1 = MaybeCondConv(f, 4, 2, 1, is_cond=self.is_cond, name="down_1")(
            x, types)
        d1 = jax.nn.leaky_relu(d1, 0.2)           # real act (model.py:2227)
        d2 = ConvBNAct(2 * f, name="down_2", **kw)(d1, types, train=train)
        d3 = ConvBNAct(4 * f, name="down_3", **kw)(d2, types, train=train)
        d4 = ConvBNAct(8 * f, name="down_4", **kw)(d3, types, train=train)
        d5 = ConvBNAct(8 * f, activation="no", name="down_5", **kw)(
            d4, types, train=train)
        return (d1, d2, d3, d4, d5)


class AnatomyEncoderDec(nn.Module):
    first_num_ch: int = 32
    out_num_ch: int = 4            # s_num_ch
    is_cond: bool = False
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, feats: Tuple, types=None, *, train: bool):
        f = self.first_num_ch
        kw = dict(is_cond=self.is_cond, fix_act_bug=self.fix_act_bug)
        d1, d2, d3, d4, d5 = feats
        u4 = ActDeconvBNConcat(8 * f, name="up_4", **kw)(
            d4, d5, types, train=train)
        u3 = ActDeconvBNConcat(4 * f, name="up_3", **kw)(
            d3, u4, types, train=train)
        u2 = ActDeconvBNConcat(2 * f, name="up_2", **kw)(
            d2, u3, types, train=train)
        u1 = ActDeconvBNConcat(f, name="up_1", **kw)(
            d1, u2, types, train=train)
        s_logits = ActDeconvBNConcat(self.out_num_ch, is_last=True,
                                     name="output", **kw)(
            None, u1, types, train=train)
        return s_logits


def anatomy_activation(s_logits: jnp.ndarray, mask_img: jnp.ndarray,
                       ana_dec_act: str = "softmax",
                       softmax_remove_mask: bool = True) -> jnp.ndarray:
    """s activation (src/model.py:3145-3155).

    s_logits: [M, B, H, W, Cs]; mask_img: [B, H, W] background map (quirk Q6:
    derived from channel 0 of modality 0 only, util.py:564).

    softmax_remove_mask prepends a 100*mask_img background channel before the
    softmax and drops it after (src/model.py:3149-3153), suppressing anatomy
    mass on background pixels.
    """
    if ana_dec_act == "softplus":
        return jax.nn.softplus(s_logits)
    if softmax_remove_mask:
        bg = 100.0 * mask_img[None, :, :, :, None]
        bg = jnp.broadcast_to(bg, s_logits.shape[:-1] + (1,)).astype(
            s_logits.dtype)
        cat = jnp.concatenate([bg, s_logits], axis=-1)
        return jax.nn.softmax(cat, axis=-1)[..., 1:]
    return jax.nn.softmax(s_logits, axis=-1)
