"""Core flax modules: torch-parity conv / linear / norm blocks.

Data layout convention: activations carry an explicit leading *group* axis —
``x: [G, B, H, W, C]`` — where G is the modality axis (or the (i, j)
decode-pair axis).  This is how the reference's per-modality Python loops
(src/model.py:3135-3224) become single batched XLA ops: a conditional conv
mixes one kernel per group (src/model.py:2113) and runs one grouped conv for
all of them; BatchNorm computes per-group batch statistics, matching the
reference's M sequential calls of a shared ``nn.BatchNorm2d`` exactly
(including the ordered running-stat EMA; see ops/norm.sequential_ema).

Torch-init parity: Conv2d / Linear use kaiming-uniform(a=sqrt(5)) =
U(±1/sqrt(fan_in)) with matching bias init; CondConv expert banks use
xavier-normal over the stacked [E, Co, Ci, kh, kw] tensor with zero bias
(src/model.py:2095-2097).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.ops import (
    apply_act, batch_norm_apply, batch_stats, bilinear_resize, cond_route,
    conv2d, instance_norm, mix_experts, modality_conv2d, resolve_block_act,
    sequential_ema)
from representation_disentanglement_tpu.ops.conv import percase_conv2d


# ---------------------------------------------------------------------------
# torch-style initializers
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) on HWIO: U(±1/sqrt(Ci*kh*kw))."""
    kh, kw, ci, _ = shape
    bound = 1.0 / math.sqrt(ci * kh * kw)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init_factory(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch Linear default on [in, out]: U(±1/sqrt(in))."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_normal_experts_init(key, shape, dtype=jnp.float32):
    """xavier_normal_ on the stacked torch tensor [E, Co, Ci, kh, kw]
    (src/model.py:2096): fan_in = Co*Ci*kh*kw, fan_out = E*Ci*kh*kw.
    Our storage is [E, kh, kw, Ci, Co]."""
    e, kh, kw, ci, co = shape
    receptive = ci * kh * kw
    fan_in, fan_out = co * receptive, e * receptive
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

class TorchLinear(nn.Module):
    """Dense layer with torch's default init; kernel stored [in, out]."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (in_f, self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_conv_bias_init_factory(in_f),
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y


# ---------------------------------------------------------------------------
# (Cond)Conv
# ---------------------------------------------------------------------------

# process-wide default CondConv execution mode, resolved at trace time;
# set via set_cond_mode BEFORE building/jitting the model
_COND_MODE_DEFAULT = "grouped"


def set_cond_mode(mode: str) -> None:
    assert mode in ("grouped", "sum_experts"), mode
    global _COND_MODE_DEFAULT
    _COND_MODE_DEFAULT = mode

class MaybeCondConv(nn.Module):
    """Conv2d or CondConv2d (src/model.py:2075-2120) on grouped activations.

    x: [G, B, H, W, Ci]; types: None | [G] | [G, emb] | [G, B, emb].
    - is_cond=False: one shared kernel, single conv over the folded [G*B].
    - is_cond=True with per-group types: per-group expert mixing + one
      grouped conv (zero extra conv FLOPs vs a plain conv).
    - is_cond=True with per-sample types: per-sample kernels via vmap
      (lowers to a feature-grouped conv).
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    is_cond: bool = False
    num_experts: int = 3
    embeddings: int = 1
    use_bias: bool = True
    cond_mode: str = ""          # '' -> module default (set_cond_mode);
                                 # 'grouped': per-group mixed kernels, one
                                 # grouped conv (min FLOPs); 'sum_experts':
                                 # E dense convs over the flat batch + routed
                                 # output mix (3x FLOPs but copy-free dense
                                 # convs — faster on TPU for many small-
                                 # channel groups; profiled 26% of step time
                                 # in grouped-conv layout copies)

    @nn.compact
    def __call__(self, x, types=None):
        squeeze = x.ndim == 4
        if squeeze:                      # plain [B,H,W,C] call -> G=1
            x = x[None]
        g = x.shape[0]
        ks = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) \
            else tuple(self.kernel_size)
        ci = x.shape[-1]
        fan_in = ci * ks[0] * ks[1]

        if not self.is_cond:
            kernel = self.param("kernel", torch_conv_kernel_init,
                                (*ks, ci, self.features))
            bias = self.param("bias", torch_conv_bias_init_factory(fan_in),
                              (self.features,)) if self.use_bias else None
            xf = x.reshape((-1,) + x.shape[2:])
            y = conv2d(xf, kernel, bias, self.stride, self.padding)
            y = y.reshape((g, -1) + y.shape[1:])
        else:
            experts = self.param(
                "experts", xavier_normal_experts_init,
                (self.num_experts, *ks, ci, self.features))
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,)) if self.use_bias else None
            route_w = self.param("route_kernel", torch_linear_kernel_init,
                                 (self.embeddings, self.num_experts))
            route_b = self.param(
                "route_bias", torch_conv_bias_init_factory(self.embeddings),
                (self.num_experts,))
            t = jnp.asarray(types, jnp.float32)
            if t.ndim == 0:              # scalar (e.g. under nn.vmap) -> [1]
                t = t.reshape(1)
            elif squeeze and t.ndim == 2:  # 4D x + per-sample [B, emb] types
                t = t[None]
            if t.ndim == 1:              # [G] scalar types -> [G, emb]
                t = t[:, None] * jnp.ones((1, self.embeddings), jnp.float32)
            if t.ndim == 2:              # per-group routing
                route = cond_route(t, route_w, route_b)          # [G, E]
                mode = self.cond_mode or _COND_MODE_DEFAULT
                if mode == "sum_experts":
                    # conv is linear in the kernel: conv(x, sum_e r_e W_e)
                    # == sum_e r_e conv(x, W_e); run E dense convs on the
                    # flattened batch and accumulate the routed mix
                    # incrementally (stacking all E outputs at full res
                    # overflows HBM)
                    xf = x.reshape((-1,) + x.shape[2:])
                    y = None
                    for e in range(self.num_experts):
                        ye = conv2d(xf, experts[e], None, self.stride,
                                    self.padding)
                        ye = ye.reshape((g, -1) + ye.shape[1:])
                        contrib = route[:, e, None, None, None, None].astype(
                            ye.dtype) * ye
                        y = contrib if y is None else y + contrib
                    if bias is not None:
                        y = y + bias.astype(y.dtype)
                else:
                    kernels = mix_experts(route, experts)    # [G,kh,kw,Ci,Co]
                    y = modality_conv2d(x, kernels, bias, self.stride,
                                        self.padding)
            else:                        # [G, B, emb] per-sample routing
                route = cond_route(t, route_w, route_b)          # [G, B, E]
                kernels = mix_experts(route.reshape(-1, self.num_experts),
                                      experts)                   # [G*B, ...]
                xf = x.reshape((-1,) + x.shape[2:])
                y = percase_conv2d(xf, kernels, None, self.stride,
                                   self.padding)
                if bias is not None:
                    y = y + bias.astype(y.dtype)
                y = y.reshape((g, -1) + y.shape[1:])
        return y[0] if squeeze else y


# ---------------------------------------------------------------------------
# BatchNorm with torch semantics over grouped activations
# ---------------------------------------------------------------------------

# process-wide switch (same pattern as set_cond_mode): route the train-mode
# stats+normalize through the fused Pallas pass (ops/pallas_bn.py); set from
# build_model via cfg.use_pallas BEFORE tracing
_BN_FUSED_DEFAULT = False


def set_bn_fused(on: bool) -> None:
    global _BN_FUSED_DEFAULT
    _BN_FUSED_DEFAULT = bool(on)


class BatchNormTorch(nn.Module):
    """nn.BatchNorm2d parity: biased batch var for normalization, unbiased
    for the running update (momentum 0.1, eps 1e-5).  When called on grouped
    x [G, B, H, W, C] in train mode, each group is normalized with its own
    batch statistics and the running stats receive G *ordered* EMA updates —
    identical to the reference invoking one shared BN once per modality."""
    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        squeeze = x.ndim == 4
        if squeeze:
            x = x[None]
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))

        if use_running_average:
            y = batch_norm_apply(x, ra_mean.value, ra_var.value, scale, bias,
                                 self.eps)
        else:
            from representation_disentanglement_tpu.ops.pallas_bn import (
                bn_train_fused, bn_train_fused_available)
            if _BN_FUSED_DEFAULT and bn_train_fused_available(x):
                # fused stats+normalize (2 reads + 1 write of x, the
                # structural floor; ops/pallas_bn.py) — identical math
                y, mean, var = bn_train_fused(x, scale, bias, self.eps)
                mean = jax.lax.stop_gradient(mean)
                var = jax.lax.stop_gradient(var)
            else:
                mean, var = batch_stats(x, (1, 2, 3))      # [G, C] biased
                y = batch_norm_apply(
                    x, mean[:, None, None, None, :],
                    var[:, None, None, None, :], scale, bias, self.eps)
            if not self.is_initializing() and \
                    self.is_mutable_collection("batch_stats"):
                n = x.shape[1] * x.shape[2] * x.shape[3]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = sequential_ema(ra_mean.value, mean,
                                               self.momentum)
                ra_var.value = sequential_ema(ra_var.value, unbiased,
                                              self.momentum)
        return y[0] if squeeze else y


# ---------------------------------------------------------------------------
# Reference conv blocks (with quirk-Q1 activation resolution)
# ---------------------------------------------------------------------------

class ConvBNAct(nn.Module):
    """Conv_BN_Act / Conv_BN_Act_New (src/model.py:117-139, 2122-2153).

    NOTE quirk Q1: `activation` passes through resolve_block_act — anything
    but 'elu' is the identity in the trained reference."""
    features: int
    filter_size: int = 4
    stride: int = 2
    padding: int = 1
    activation: str = "lrelu"
    is_bn: bool = True
    is_cond: bool = False
    embeddings: int = 1
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x, types=None, *, train: bool):
        x = MaybeCondConv(self.features, self.filter_size, self.stride,
                          self.padding, is_cond=self.is_cond,
                          embeddings=self.embeddings, name="conv")(x, types)
        if self.is_bn:
            x = BatchNormTorch(self.features, name="bn")(
                x, use_running_average=not train)
        return apply_act(x, resolve_block_act(self.activation,
                                              self.fix_act_bug))


class ActDeconvBNConcat(nn.Module):
    """Act_Deconv_BN_Concat / _New (src/model.py:141-174, 2155-2195).

    act(quirk-Q1'd) -> bilinear x2 upsample (align_corners=True,
    src/model.py:157, 2175) -> conv3x3 -> [BN -> concat(skip)] unless last."""
    features: int
    filter_size: int = 3
    stride: int = 1
    padding: int = 1
    activation: str = "relu"
    is_last: bool = False
    is_bn: bool = True
    is_cond: bool = False
    embeddings: int = 1
    fix_act_bug: bool = False

    @nn.compact
    def __call__(self, x_down, x_up, types=None, *, train: bool):
        x_up = apply_act(x_up, resolve_block_act(self.activation,
                                                 self.fix_act_bug))
        h, w = x_up.shape[-3], x_up.shape[-2]
        x_up = bilinear_resize(x_up, (2 * h, 2 * w), align_corners=True)
        x_up = MaybeCondConv(self.features, self.filter_size, self.stride,
                             self.padding, is_cond=self.is_cond,
                             embeddings=self.embeddings, name="conv")(
            x_up, types)
        if not self.is_last:
            if self.is_bn:
                x_up = BatchNormTorch(self.features, name="bn")(
                    x_up, use_running_average=not train)
            return jnp.concatenate([x_down, x_up], axis=-1)
        return x_up
