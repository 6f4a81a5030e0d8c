"""ResNet18 amyloid-status classifier (reference ``ResNet18``,
src/model.py:1591-1601: torchvision resnet18 with the fc replaced by
Linear(512, 1) and a sigmoid head).

The reference constructs it with ``pretrained=False`` (random init), so no
weight download is needed for parity; for users with trained torchvision
weights the same npz contract as models/vgg.py applies
(``dump_torchvision_resnet18`` -> ``load_resnet18_params``).

Architecture matches torchvision's resnet18 exactly: conv7x7/2 -> BN ->
ReLU -> maxpool3x3/2(pad 1) -> 4 stages x 2 BasicBlocks (64/128/256/512,
stride 2 between stages, 1x1+BN downsample on the first block of stages
2-4) -> global average pool -> fc -> sigmoid.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from representation_disentanglement_tpu.models.layers import (
    BatchNormTorch, MaybeCondConv, TorchLinear)
from representation_disentanglement_tpu.ops import max_pool


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool):
        f = self.features
        h = MaybeCondConv(f, 3, self.stride, 1, use_bias=False,
                          name="conv1")(x)
        h = BatchNormTorch(f, name="bn1")(h, use_running_average=not train)
        h = jax.nn.relu(h)
        h = MaybeCondConv(f, 3, 1, 1, use_bias=False, name="conv2")(h)
        h = BatchNormTorch(f, name="bn2")(h, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != f:
            x = MaybeCondConv(f, 1, self.stride, 0, use_bias=False,
                              name="downsample_conv")(x)
            x = BatchNormTorch(f, name="downsample_bn")(
                x, use_running_average=not train)
        return jax.nn.relu(h + x)


class ResNet18(nn.Module):
    """Binary classifier head (sigmoid), torchvision-resnet18 body."""
    num_outputs: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool):
        h = MaybeCondConv(64, 7, 2, 3, use_bias=False, name="conv1")(x)
        h = BatchNormTorch(64, name="bn1")(h, use_running_average=not train)
        h = jax.nn.relu(h)
        # torch maxpool(3, 2, padding=1) pads with -inf
        pad = [(0, 0)] * (h.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
        h = max_pool(jnp.pad(h, pad, constant_values=-jnp.inf), 3, 2)
        for stage, (f, s) in enumerate(
                [(64, 1), (128, 2), (256, 2), (512, 2)], start=1):
            h = BasicBlock(f, s, name=f"layer{stage}_0")(h, train=train)
            h = BasicBlock(f, 1, name=f"layer{stage}_1")(h, train=train)
        h = jnp.mean(h, axis=(-3, -2))                    # adaptive avgpool
        logits = TorchLinear(self.num_outputs, name="fc")(h)
        return jax.nn.sigmoid(logits)


def dump_torchvision_resnet18(npz_path: str) -> None:   # pragma: no cover
    """Run where torchvision IS available to produce a weights npz
    compatible with load_resnet18_params."""
    import torchvision
    m = torchvision.models.resnet18(pretrained=True)
    np.savez(npz_path, **{k: v.detach().numpy()
                          for k, v in m.state_dict().items()})


def load_resnet18_params(sd: Dict[str, np.ndarray], num_outputs: int = 1):
    """(params, batch_stats) for ResNet18 from a torchvision resnet18
    state_dict-style mapping (tensors or ndarrays).  The fc is taken only
    when its shape matches ``num_outputs`` (default 1: the reference
    replaces torchvision's 1000-way head, src/model.py:1595; pass 1000 to
    keep the pretrained head for full-network parity checks)."""
    from representation_disentanglement_tpu.utils.transplant import (
        t2j_conv, t2j_linear, _np)

    params: Dict = {}
    stats: Dict = {}

    def conv(t, j):
        params.setdefault(j, {})["kernel"] = t2j_conv(_np(sd[f"{t}.weight"]))

    def bn(t, j):
        params.setdefault(j, {})
        params[j]["scale"] = _np(sd[f"{t}.weight"])
        params[j]["bias"] = _np(sd[f"{t}.bias"])
        stats.setdefault(j, {})
        stats[j]["mean"] = _np(sd[f"{t}.running_mean"])
        stats[j]["var"] = _np(sd[f"{t}.running_var"])

    conv("conv1", "conv1")
    bn("bn1", "bn1")
    for stage in (1, 2, 3, 4):
        for blk in (0, 1):
            t = f"layer{stage}.{blk}"
            j = f"layer{stage}_{blk}"
            sub_p: Dict = {}
            sub_s: Dict = {}
            for cname in ("conv1", "conv2"):
                sub_p[cname] = {"kernel": t2j_conv(
                    _np(sd[f"{t}.{cname}.weight"]))}
            for bname in ("bn1", "bn2"):
                sub_p[bname] = {"scale": _np(sd[f"{t}.{bname}.weight"]),
                                "bias": _np(sd[f"{t}.{bname}.bias"])}
                sub_s[bname] = {"mean": _np(sd[f"{t}.{bname}.running_mean"]),
                                "var": _np(sd[f"{t}.{bname}.running_var"])}
            if f"{t}.downsample.0.weight" in sd:
                sub_p["downsample_conv"] = {"kernel": t2j_conv(
                    _np(sd[f"{t}.downsample.0.weight"]))}
                sub_p["downsample_bn"] = {
                    "scale": _np(sd[f"{t}.downsample.1.weight"]),
                    "bias": _np(sd[f"{t}.downsample.1.bias"])}
                sub_s["downsample_bn"] = {
                    "mean": _np(sd[f"{t}.downsample.1.running_mean"]),
                    "var": _np(sd[f"{t}.downsample.1.running_var"])}
            params[j] = sub_p
            stats[j] = sub_s
    if "fc.weight" in sd and _np(sd["fc.weight"]).shape[0] == num_outputs:
        params["fc"] = {"kernel": t2j_linear(_np(sd["fc.weight"])),
                        "bias": _np(sd["fc.bias"])}
    return params, stats
