"""SPADE input decoders: z + anatomy-code modulation -> reconstructed image.

Reference: ``SPADEBlockNew`` (src/model.py:2424-2454), full decoder
``SPADENew`` (src/model.py:2490-2538) and the active split pair
``SPADENewShared`` (first 3 blocks, src/model.py:2540-2582) +
``SPADENewNotShared`` (last 3 blocks + 1x1 head, per modality,
src/model.py:2584-2632), selected by ``shared_inp_dec: False``
(src/config.yaml:66, wiring src/model.py:3114-3133).

All bilinear resizes in SPADE use align_corners=False (torch default at
src/model.py:2432, 2501-2510).  InstanceNorm is parameter-free.  The z
scaler reshapes channel-major to match torch (src/model.py:2526).

Everything runs on grouped activations [P, B, ...] where P is the decode
(i, j)-pair axis, so one call decodes every (anatomy, modality) combination.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.layers import (
    MaybeCondConv, TorchLinear)
from representation_disentanglement_tpu.ops import (
    apply_act, bilinear_resize, instance_norm)


class SPADEBlock(nn.Module):
    """zi-stream InstanceNorm, si-stream conv -> (gamma, beta) modulation.

    With ``use_pallas`` the instance-norm + modulation interior runs as one
    fused Pallas kernel (ops/pallas_kernels.py) — single VMEM pass instead
    of a reduction/elementwise round-trip through HBM."""
    input_size: Tuple[int, int]
    in_num_ch: int = 128
    out_num_ch: int = 128
    is_cond: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, si, zi, types=None):
        cv = lambda ch, name: MaybeCondConv(ch, 3, 1, 1, is_cond=self.is_cond,
                                            name=name)
        si_up = bilinear_resize(si, self.input_size, align_corners=False)
        si_out = cv(self.in_num_ch, "si_layers")(si_up, types)
        gamma = cv(self.in_num_ch, "gamma")(si_out, types)
        beta = cv(self.in_num_ch, "beta")(si_out, types)
        if self.use_pallas:
            from representation_disentanglement_tpu.ops.pallas_kernels \
                import in_modulate
            mix = in_modulate(zi, gamma, beta)
        else:
            mix = instance_norm(zi) * (1.0 + gamma) + beta
        return cv(self.out_num_ch, "out")(mix, types)


def _up2(x):
    return bilinear_resize(x, (2 * x.shape[-3], 2 * x.shape[-2]),
                           align_corners=False)


class ZScaler(nn.Module):
    """zi_scaler: Linear(z -> H/32 * W/32 * 128), reshaped channel-major
    like torch (src/model.py:2525-2526), emitted NHWC."""
    image_size: Tuple[int, int]
    z_num_ch: int = 128

    @nn.compact
    def __call__(self, zi):
        h32, w32 = self.image_size[0] // 32, self.image_size[1] // 32
        y = TorchLinear(h32 * w32 * self.z_num_ch, name="zi_scaler")(zi)
        lead = y.shape[:-1]
        y = y.reshape(*lead, self.z_num_ch, h32, w32)       # torch CHW order
        return jnp.moveaxis(y, -3, -1)                       # -> NHWC


class SPADEShared(nn.Module):
    """SPADENewShared: zi_scaler + blocks 1-3, output at 1/4 resolution
    (note the reference reuses its x2 upsample twice after sp3,
    src/model.py:2571-2573)."""
    image_size: Tuple[int, int]
    z_num_ch: int = 128
    is_cond: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, si, zi, types=None):
        hs, ws = self.image_size
        zc = self.z_num_ch
        z0 = ZScaler(self.image_size, zc)(zi)
        h = SPADEBlock((hs // 32, ws // 32), zc, zc, is_cond=self.is_cond, use_pallas=self.use_pallas,
                       name="sp1")(si, z0, types)
        h = SPADEBlock((hs // 16, ws // 16), zc, zc, is_cond=self.is_cond, use_pallas=self.use_pallas,
                       name="sp2")(si, _up2(h), types)
        h = SPADEBlock((hs // 8, ws // 8), zc, zc, is_cond=self.is_cond, use_pallas=self.use_pallas,
                       name="sp3")(si, _up2(h), types)
        return _up2(h)                                       # 1/4 res, zc ch


class SPADENotShared(nn.Module):
    """SPADENewNotShared: blocks 4-6 + 1x1 head, one copy per modality."""
    image_size: Tuple[int, int]
    in_num_ch: int = 7          # reconstructed slice-block channels
    z_num_ch: int = 128
    is_cond: bool = False
    output_activation: str = "softplus"
    use_pallas: bool = False

    @nn.compact
    def __call__(self, si, mid, types=None):
        hs, ws = self.image_size
        zc = self.z_num_ch
        h = SPADEBlock((hs // 4, ws // 4), zc, zc // 2, is_cond=self.is_cond, use_pallas=self.use_pallas,
                       name="sp4")(si, mid, types)
        h = SPADEBlock((hs // 2, ws // 2), zc // 2, zc // 4,
                       is_cond=self.is_cond, use_pallas=self.use_pallas, name="sp5")(si, _up2(h), types)
        h = SPADEBlock((hs, ws), zc // 4, zc // 8, is_cond=self.is_cond, use_pallas=self.use_pallas,
                       name="sp6")(si, _up2(h), types)
        out = MaybeCondConv(self.in_num_ch, 1, 1, 0, is_cond=self.is_cond,
                            name="out")(h, types)
        return apply_act(out, self.output_activation)


class SPADEFull(nn.Module):
    """SPADENew: the single shared decoder (shared_inp_dec=True,
    src/model.py:2490-2538)."""
    image_size: Tuple[int, int]
    in_num_ch: int = 7
    z_num_ch: int = 128
    is_cond: bool = False
    output_activation: str = "softplus"
    use_pallas: bool = False

    @nn.compact
    def __call__(self, si, zi, types=None):
        hs, ws = self.image_size
        zc = self.z_num_ch
        z0 = ZScaler(self.image_size, zc)(zi)
        h = SPADEBlock((hs // 32, ws // 32), zc, zc, is_cond=self.is_cond, use_pallas=self.use_pallas,
                       name="sp1")(si, z0, types)
        h = SPADEBlock((hs // 16, ws // 16), zc, zc, is_cond=self.is_cond, use_pallas=self.use_pallas,
                       name="sp2")(si, _up2(h), types)
        h = SPADEBlock((hs // 8, ws // 8), zc, zc, is_cond=self.is_cond, use_pallas=self.use_pallas,
                       name="sp3")(si, _up2(h), types)
        h = SPADEBlock((hs // 4, ws // 4), zc, zc // 2, is_cond=self.is_cond, use_pallas=self.use_pallas,
                       name="sp4")(si, _up2(h), types)
        h = SPADEBlock((hs // 2, ws // 2), zc // 2, zc // 4,
                       is_cond=self.is_cond, use_pallas=self.use_pallas, name="sp5")(si, _up2(h), types)
        h = SPADEBlock((hs, ws), zc // 4, zc // 8, is_cond=self.is_cond, use_pallas=self.use_pallas,
                       name="sp6")(si, _up2(h), types)
        out = MaybeCondConv(self.in_num_ch, 1, 1, 0, is_cond=self.is_cond,
                            name="out")(h, types)
        return apply_act(out, self.output_activation)
