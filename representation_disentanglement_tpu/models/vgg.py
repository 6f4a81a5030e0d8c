"""VGG16 feature extractor for the perceptual similarity loss.

Reference: ``compute_perceptual`` (src/model.py:3417-3445) pads inputs to
224x224, maps s-channels to RGB with a learned 3x3 conv (``vgg_pre``,
src/model.py:2946), then uses torchvision's pretrained VGG16:
- content: conv4_2 features (``features[:21]``),
- style: Gram matrices of the features after layers [0, 5, 10, 17, 24]
  (input itself, pool1, pool2, pool3, pool4).

Pretrained torchvision weights are not downloadable offline; load them from
an npz produced by ``dump_torchvision_vgg16`` (run wherever torchvision is
available) and pass the resulting dict as the ``vgg_params``.  All convs
3x3/pad1 + ReLU, maxpool 2x2 between stages — exactly VGG16's `features`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from representation_disentanglement_tpu.ops import conv2d, max_pool

# channel plan of VGG16 'features'; 'M' = 2x2 max-pool
VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


def dump_torchvision_vgg16(npz_path: str) -> None:   # pragma: no cover
    """Run where torchvision IS available to produce the weights npz."""
    import torchvision
    m = torchvision.models.vgg16(pretrained=True)
    out = {}
    conv_i = 0
    for layer in m.features:
        if layer.__class__.__name__ == "Conv2d":
            out[f"conv{conv_i}_kernel"] = np.transpose(
                layer.weight.detach().numpy(), (2, 3, 1, 0))
            out[f"conv{conv_i}_bias"] = layer.bias.detach().numpy()
            conv_i += 1
    np.savez(npz_path, **out)


def load_vgg_npz(npz_path: str) -> Dict[str, np.ndarray]:
    return dict(np.load(npz_path))


def vgg16_features(x: jnp.ndarray, params: Dict[str, np.ndarray],
                   taps: Tuple[int, ...]) -> List[jnp.ndarray]:
    """Run VGG16 'features'; return activations at torch Sequential indices
    `taps` (index semantics identical to torchvision: conv/relu/pool each
    count one slot; tap i == output of features[:i])."""
    outs = {}
    seq_idx = 0
    conv_i = 0
    h = x
    max_tap = max(taps)
    if 0 in taps:
        outs[0] = h
    for item in VGG16_PLAN:
        if seq_idx >= max_tap:
            break
        if item == "M":
            h = max_pool(h, 2)
            seq_idx += 1
            if seq_idx in taps:
                outs[seq_idx] = h
        else:
            h = conv2d(h, jnp.asarray(params[f"conv{conv_i}_kernel"]),
                       jnp.asarray(params[f"conv{conv_i}_bias"]), 1, 1)
            conv_i += 1
            seq_idx += 1
            if seq_idx in taps:
                outs[seq_idx] = h
            h = jax.nn.relu(h)
            seq_idx += 1
            if seq_idx in taps:
                outs[seq_idx] = h
    return [outs[t] for t in taps]


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """Gram over spatial dims (src/model.py:3430-3434): [B, H, W, C] ->
    [B, C, C] / (H*W)."""
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c).astype(jnp.float32)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (h * w)


def _pad224(x: jnp.ndarray) -> jnp.ndarray:
    """Symmetric zero-pad [B, H, W, C] to 224x224 (src/model.py:3418-3421)."""
    pad_h = (224 - x.shape[1]) // 2
    pad_w = (224 - x.shape[2]) // 2
    return jnp.pad(x, [(0, 0), (pad_h, 224 - x.shape[1] - pad_h),
                       (pad_w, 224 - x.shape[2] - pad_w), (0, 0)])


def compact_s_vgg(x: jnp.ndarray, pre_kernel: jnp.ndarray,
                  pre_bias: jnp.ndarray,
                  vgg_params: Dict[str, np.ndarray]) -> jnp.ndarray:
    """compute_compact_s_vgg (src/model.py:3460-3467): pad to 224, learned
    3x3 RGB projection, FULL VGG16 'features' (31 layers), 7x7 avg-pool,
    flatten -> [B, 512]."""
    xp = conv2d(_pad224(x.astype(jnp.float32)), pre_kernel, pre_bias, 1, 1)
    (feat,) = vgg16_features(xp, vgg_params, (31,))
    pooled = feat.reshape(feat.shape[0], feat.shape[1] // 7, 7,
                          feat.shape[2] // 7, 7, feat.shape[3]).mean((2, 4))
    return pooled.reshape(feat.shape[0], -1)


def perceptual_similarity(x: jnp.ndarray, y: jnp.ndarray,
                          pre_kernel: jnp.ndarray, pre_bias: jnp.ndarray,
                          vgg_params: Dict[str, np.ndarray],
                          input_size: Optional[Tuple[int, int]] = None,
                          ) -> jnp.ndarray:
    """compute_perceptual parity (src/model.py:3417-3445): returns the
    NEGATED (content + 1e3 * style) loss, i.e. a similarity score."""
    del input_size                      # pads derive from the array shape
    xp = conv2d(_pad224(x.astype(jnp.float32)), pre_kernel, pre_bias, 1, 1)
    yp = conv2d(_pad224(y.astype(jnp.float32)), pre_kernel, pre_bias, 1, 1)
    taps = (0, 5, 10, 17, 21, 24)
    fx = vgg16_features(xp, vgg_params, taps)
    fy = vgg16_features(yp, vgg_params, taps)
    content = jnp.mean(jnp.square(fx[4] - fy[4]))        # features[:21]
    style = 0.0
    for i in (0, 1, 2, 3, 5):                            # [0, 5, 10, 17, 24]
        gx, gy = gram_matrix(fx[i]), gram_matrix(fy[i])
        style += jnp.mean(jnp.square(gx - gy)) / (gx.shape[-1] ** 2)
    return -(content + 1e3 * style)
