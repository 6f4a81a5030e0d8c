"""Modality (appearance) encoder -> Gaussian z.

Reference: ``ModalityEncoderNew`` (src/model.py:2332-2400): 5 stride-2
3x3 (cond)convs with *real* leaky_relu(0.2) activations, flatten the
(H/32 x W/32 x 128) feature map, one FC+lrelu, then mean / log_var heads.

The reference hard-codes the flatten as 5*6*128 (src/model.py:2396), pinning
inputs to 160x192; here it is shape-derived.  Torch flattens CHW-major; we
flatten HWC-major — `utils/transplant.py` permutes the FC weight when
importing torch checkpoints so the math is identical.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.layers import (
    MaybeCondConv, TorchLinear)


class ModalityEncoder(nn.Module):
    first_num_ch: int = 16
    z_size: int = 16
    use_s: bool = False        # others['mod_enc_s'] (src/model.py:3104-3105)
    is_cond: bool = False

    @nn.compact
    def __call__(self, x, s, types=None):
        """x: [M, B, H, W, Cb]; s: [M, B, H, W, Cs] or None."""
        f = self.first_num_ch
        h = jnp.concatenate([x, s], axis=-1) if self.use_s else x
        for i, ch in enumerate([f, 2 * f, 4 * f, 8 * f, 8 * f]):
            h = MaybeCondConv(ch, 3, 2, 1, is_cond=self.is_cond,
                              name=f"conv{i + 1}")(h, types)
            h = jax.nn.leaky_relu(h, 0.2)
        m, b = h.shape[0], h.shape[1]
        h = h.reshape(m, b, -1)
        h = TorchLinear(2 * self.z_size, name="fcs")(h)
        h = jax.nn.leaky_relu(h, 0.2)
        z_mean = TorchLinear(self.z_size, name="mean")(h)
        z_log_var = TorchLinear(self.z_size, name="log_var")(h)
        return z_mean, z_log_var
