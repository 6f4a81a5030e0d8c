"""z-conditioned U-Net input decoder (reference ``GANShortGeneratorNew``,
src/model.py:2714-2766; selectable alternative to SPADE at
src/model.py:3118-3119).

Every conv is a CondConv routed on the 16-dim z vector — genuinely
per-sample kernels, exercising the ``percase_conv2d`` path (vmap ->
feature-grouped conv; no per-sample Python loop)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.layers import (
    ActDeconvBNConcat, ConvBNAct, MaybeCondConv)
from representation_disentanglement_tpu.ops import apply_act


class GANShortGeneratorZCond(nn.Module):
    out_num_ch: int
    first_num_ch: int = 64
    z_size: int = 16
    output_activation: str = "softplus"
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, z, *, train: bool):
        """x: [G, B, H, W, C]; z: [G, B, z_size] (per-sample routing)."""
        f, fx = self.first_num_ch, self.fix_act_bug
        kw = dict(is_cond=True, embeddings=self.z_size, fix_act_bug=fx)
        d1 = MaybeCondConv(f, 4, 2, 1, is_cond=True,
                           embeddings=self.z_size, name="down_1")(x, z)
        d1 = jax.nn.leaky_relu(d1, 0.2)
        d2 = ConvBNAct(2 * f, name="down_2", **kw)(d1, z, train=train)
        d3 = ConvBNAct(4 * f, name="down_3", **kw)(d2, z, train=train)
        d4 = ConvBNAct(8 * f, name="down_4", **kw)(d3, z, train=train)
        d5 = ConvBNAct(8 * f, activation="no", name="down_5", **kw)(
            d4, z, train=train)
        u4 = ActDeconvBNConcat(8 * f, name="up_4", **kw)(d4, d5, z,
                                                         train=train)
        u3 = ActDeconvBNConcat(4 * f, name="up_3", **kw)(d3, u4, z,
                                                         train=train)
        u2 = ActDeconvBNConcat(2 * f, name="up_2", **kw)(d2, u3, z,
                                                         train=train)
        u1 = ActDeconvBNConcat(f, name="up_1", **kw)(d1, u2, z, train=train)
        out = ActDeconvBNConcat(self.out_num_ch, is_last=True, name="output",
                                **kw)(None, u1, z, train=train)
        act = self.output_activation
        if act not in ("sigmoid", "tanh", "no"):
            act = "softplus"                    # reference default fallback
        return apply_act(out, act)
