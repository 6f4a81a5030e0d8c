"""Op-level torch-parity tests: resize, pooling, norms, CondConv."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from representation_disentanglement_tpu.ops import (  # noqa: E402
    avg_pool, batch_norm_apply, batch_stats, bilinear_resize, instance_norm,
    max_pool, sequential_ema)
from representation_disentanglement_tpu.ops.conv import (  # noqa: E402
    conv2d, mix_experts, modality_conv2d, percase_conv2d)


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("hw,out_hw", [((5, 6), (10, 12)), ((8, 12), (16, 24)),
                                       ((4, 4), (7, 9)), ((10, 12), (5, 6))])
def test_bilinear_resize_matches_torch(rng, align, hw, out_hw):
    x = _rand(rng, 2, 3, *hw)                      # NCHW for torch
    want = F.interpolate(torch.tensor(x), size=out_hw, mode="bilinear",
                         align_corners=align).numpy()
    got = bilinear_resize(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), out_hw,
                          align_corners=align)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, atol=2e-6, rtol=1e-5)


def test_pools_match_torch(rng):
    x = _rand(rng, 2, 4, 32, 48)
    want_max = F.max_pool2d(torch.tensor(x), 16).numpy()
    want_avg = F.avg_pool2d(torch.tensor(x), 16).numpy()
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got_max = np.transpose(np.asarray(max_pool(xj, 16)), (0, 3, 1, 2))
    got_avg = np.transpose(np.asarray(avg_pool(xj, 16)), (0, 3, 1, 2))
    np.testing.assert_allclose(got_max, want_max, atol=1e-6)
    np.testing.assert_allclose(got_avg, want_avg, atol=1e-6)


def test_instance_norm_matches_torch(rng):
    x = _rand(rng, 3, 5, 8, 9)
    want = torch.nn.InstanceNorm2d(5)(torch.tensor(x)).numpy()
    got = instance_norm(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, atol=1e-5)


def test_batchnorm_train_and_running_match_torch(rng):
    """Per-call normalization + M sequential running-stat updates."""
    C = 6
    bn = torch.nn.BatchNorm2d(C)
    bn.train()
    g = rng.normal(size=C).astype(np.float32)
    b = rng.normal(size=C).astype(np.float32)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(g))
        bn.bias.copy_(torch.tensor(b))
    xs = [_rand(rng, 4, C, 8, 10) for _ in range(3)]
    wants = [bn(torch.tensor(x)).detach().numpy() for x in xs]

    xg = jnp.stack([jnp.asarray(np.transpose(x, (0, 2, 3, 1))) for x in xs])
    mean, var = batch_stats(xg, (1, 2, 3))
    got = batch_norm_apply(xg, mean[:, None, None, None, :],
                           var[:, None, None, None, :], jnp.asarray(g),
                           jnp.asarray(b))
    for i, want in enumerate(wants):
        np.testing.assert_allclose(
            np.transpose(np.asarray(got[i]), (0, 3, 1, 2)), want, atol=2e-5)

    n = 4 * 8 * 10
    unbiased = var * n / (n - 1)
    r_mean = sequential_ema(jnp.zeros(C), mean, 0.1)
    r_var = sequential_ema(jnp.ones(C), unbiased, 0.1)
    np.testing.assert_allclose(np.asarray(r_mean),
                               bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_var),
                               bn.running_var.numpy(), atol=1e-4)


def test_condconv_matches_reference_loop(rng, ref_model_module):
    """Kernel-space mixing + grouped conv == the reference's per-sample
    F.conv2d loop (src/model.py:2108-2117)."""
    ref = ref_model_module
    cc = ref.CondConv2d(5, 7, kernel_size=3, stride=2, padding=1,
                        embeddings=1, num_experts=3)
    cc.eval()
    M, B = 3, 2
    x = _rand(rng, M * B, 5, 12, 16)
    types = np.repeat(np.arange(1, M + 1, dtype=np.float32), B)[:, None]
    with torch.no_grad():
        want = cc(torch.tensor(x), torch.tensor(types)).numpy()

    experts = jnp.asarray(np.transpose(
        cc.weight.detach().numpy(), (0, 3, 4, 2, 1)))
    bias = jnp.asarray(cc.bias.detach().numpy())
    fc_w = jnp.asarray(cc._routing_fn.fc.weight.detach().numpy().T)
    fc_b = jnp.asarray(cc._routing_fn.fc.bias.detach().numpy())
    route = jax.nn.sigmoid(
        jnp.arange(1, M + 1, dtype=jnp.float32)[:, None] @ fc_w + fc_b)
    kernels = mix_experts(route, experts)                    # [M, ...]
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1))).reshape(M, B, 12, 16, 5)
    got = modality_conv2d(xj, kernels, bias, stride=2, padding=1)
    got = np.transpose(np.asarray(got).reshape(M * B, 6, 8, 7), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # per-sample path: same result through percase_conv2d
    route_ps = jax.nn.sigmoid(jnp.asarray(types) @ fc_w + fc_b)
    kernels_ps = mix_experts(route_ps, experts)
    got_ps = percase_conv2d(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                            kernels_ps, None, stride=2, padding=1) + bias
    got_ps = np.transpose(np.asarray(got_ps), (0, 3, 1, 2))
    np.testing.assert_allclose(got_ps, want, atol=2e-5, rtol=1e-4)


def test_plain_conv_matches_torch(rng):
    x = _rand(rng, 2, 5, 13, 17)
    w = _rand(rng, 7, 5, 4, 4)
    b = _rand(rng, 7)
    want = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                    stride=2, padding=1).numpy()
    got = conv2d(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                 jnp.asarray(np.transpose(w, (2, 3, 1, 0))), jnp.asarray(b),
                 stride=2, padding=1)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, atol=2e-5, rtol=1e-4)


def test_condconv_sum_experts_matches_grouped(rng):
    """sum-of-dense-expert-convs == grouped mixed-kernel conv (same math)."""
    import flax.linen as nn_  # noqa
    from representation_disentanglement_tpu.models.layers import MaybeCondConv
    x = jnp.asarray(rng.normal(size=(3, 2, 12, 16, 5)).astype(np.float32))
    types = jnp.arange(1, 4, dtype=jnp.float32)
    m_g = MaybeCondConv(7, 3, 2, 1, is_cond=True, cond_mode="grouped")
    m_s = MaybeCondConv(7, 3, 2, 1, is_cond=True, cond_mode="sum_experts")
    v = m_g.init({"params": jax.random.PRNGKey(0)}, x, types)
    y_g = m_g.apply(v, x, types)
    y_s = m_s.apply(v, x, types)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_g), atol=2e-5,
                               rtol=1e-4)
