"""Parity of the perceptual / vgg-compact sim-s paths vs the reference.

The reference uses pretrained torchvision VGG16 (src/model.py:2945-2949,
3417-3475).  Pretrained weights are unavailable offline, but numeric parity
doesn't need them: both sides load the SAME random VGG16 weights — the torch
side through a stand-in ``torchvision.models.vgg16`` (the real one is
stubbed out in conftest), our side through the npz contract of
``models.vgg.dump_torchvision_vgg16``.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from representation_disentanglement_tpu import losses as L  # noqa: E402
from representation_disentanglement_tpu.models.vgg import (  # noqa: E402
    VGG16_PLAN, compact_s_vgg, perceptual_similarity)

B, H, W, CS = 2, 64, 96, 4


@pytest.fixture(scope="module")
def torch_vgg16():
    """Random-weight torch VGG16 'features' matching torchvision's layout."""
    torch.manual_seed(3)
    layers, in_ch = [], 3
    for item in VGG16_PLAN:
        if item == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, item, 3, padding=1))
            layers.append(torch.nn.ReLU())
            in_ch = item
    m = torch.nn.Module()
    m.features = torch.nn.Sequential(*layers)
    return m


def _vgg_npz_dict(torch_vgg):
    out, conv_i = {}, 0
    for layer in torch_vgg.features:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{conv_i}_kernel"] = np.transpose(
                layer.weight.detach().numpy(), (2, 3, 1, 0))
            out[f"conv{conv_i}_bias"] = layer.bias.detach().numpy()
            conv_i += 1
    return out


@pytest.fixture(scope="module")
def ref_vgg_model(ref_model_module, torch_vgg16):
    """Reference MultimodalModel with s_compact_method='vgg' and the
    stand-in VGG16 patched into the torchvision stub."""
    sys.modules["torchvision.models"].vgg16 = (
        lambda pretrained=True: torch_vgg16)
    ref = ref_model_module
    torch.manual_seed(7)
    model = ref.MultimodalModel(
        input_size=(H, W), modality_num=2, in_num_ch=7, out_num_ch=1,
        s_num_ch=CS, z_size=16, is_cond=False, shared_ana_enc=True,
        shared_mod_enc=True, shared_inp_dec=True, device=torch.device("cpu"),
        s_compact_method="vgg", s_sim_method="perceptual",
        z_sim_method="cosine", input_output_act="no", target_output_act="no",
        target_model_name="U",
        others={"mod_enc_s": False, "ana_dec_act": "softmax", "old": False,
                "softmax_remove_mask": True})
    return model


def _vgg_ctx(ref_vgg_model, torch_vgg16):
    return {
        "pre_kernel": jnp.asarray(np.transpose(
            ref_vgg_model.vgg_pre.weight.detach().numpy(), (2, 3, 1, 0))),
        "pre_bias": jnp.asarray(
            ref_vgg_model.vgg_pre.bias.detach().numpy()),
        "vgg_params": {k: jnp.asarray(v)
                       for k, v in _vgg_npz_dict(torch_vgg16).items()},
    }


@pytest.mark.slow
def test_perceptual_similarity_parity(rng, ref_vgg_model, torch_vgg16):
    """compute_perceptual (src/model.py:3417-3445) == perceptual_similarity."""
    si = rng.normal(size=(B, CS, H, W)).astype(np.float32)
    sj = rng.normal(size=(B, CS, H, W)).astype(np.float32)
    with torch.no_grad():
        want = ref_vgg_model.compute_perceptual(
            torch.tensor(si), torch.tensor(sj)).item()
    ctx = _vgg_ctx(ref_vgg_model, torch_vgg16)
    got = float(perceptual_similarity(
        jnp.asarray(np.moveaxis(si, 1, -1)), jnp.asarray(np.moveaxis(sj, 1, -1)),
        ctx["pre_kernel"], ctx["pre_bias"], ctx["vgg_params"]))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-6)


@pytest.mark.slow
def test_similarity_s_loss_perceptual_parity(rng, ref_vgg_model, torch_vgg16):
    """Full sim-s dispatch, perceptual branch (src/model.py:3525-3532)."""
    s = rng.normal(size=(2, B, CS, H, W)).astype(np.float32)
    mask = np.ones((B, 2), np.float32)
    with torch.no_grad():
        want = ref_vgg_model.compute_similarity_s_loss(
            [torch.tensor(s[0]), torch.tensor(s[1])],
            torch.tensor(mask)).item()
    ctx = _vgg_ctx(ref_vgg_model, torch_vgg16)
    got = float(L.similarity_s_loss(
        jnp.asarray(np.moveaxis(s, 2, -1)), jnp.asarray(mask),
        jnp.asarray([0, 1]), sim_method="perceptual", vgg_ctx=ctx))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-6)
    # empty pair mask -> exactly 0 (reference returns int 0)
    got0 = float(L.similarity_s_loss(
        jnp.asarray(np.moveaxis(s, 2, -1)),
        jnp.zeros((B, 2), jnp.float32), jnp.asarray([0, 1]),
        sim_method="perceptual", vgg_ctx=ctx))
    assert got0 == 0.0


@pytest.mark.slow
def test_compact_s_vgg_and_cosine_branch_parity(rng, ref_vgg_model,
                                                torch_vgg16):
    """compute_compact_s_vgg (src/model.py:3460-3467) + the cosine sim-s
    branch running on vgg-compact keys."""
    ref_vgg_model.s_sim_method = "cosine"   # dispatch through compact 'vgg'
    try:
        s = rng.normal(size=(2, B, CS, H, W)).astype(np.float32)
        mask = np.ones((B, 2), np.float32)
        ctx = _vgg_ctx(ref_vgg_model, torch_vgg16)
        with torch.no_grad():
            want_vec = ref_vgg_model.compute_compact_s(
                torch.tensor(s[0])).numpy()
            want_loss = ref_vgg_model.compute_similarity_s_loss(
                [torch.tensor(s[0]), torch.tensor(s[1])],
                torch.tensor(mask)).item()
        got_vec = np.asarray(compact_s_vgg(
            jnp.asarray(np.moveaxis(s[0], 1, -1)), ctx["pre_kernel"],
            ctx["pre_bias"], ctx["vgg_params"]))
        np.testing.assert_allclose(got_vec, want_vec, rtol=1e-3, atol=1e-2)
        got_loss = float(L.similarity_s_loss(
            jnp.asarray(np.moveaxis(s, 2, -1)), jnp.asarray(mask),
            jnp.asarray([0, 1]), compact_method="vgg", vgg_ctx=ctx))
        np.testing.assert_allclose(got_loss, want_loss, rtol=1e-3, atol=1e-5)
    finally:
        ref_vgg_model.s_sim_method = "perceptual"


@pytest.mark.slow
def test_perceptual_train_step_end_to_end(tmp_path, rng, torch_vgg16):
    """A train step with s_sim_method='perceptual' runs through the CLI
    config path and TRAINS vgg_pre (the params move)."""
    from tests.test_train import synth_batch, tiny_cfg
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.train import (
        create_train_state, make_train_step)

    npz = tmp_path / "vgg16.npz"
    np.savez(npz, **_vgg_npz_dict(torch_vgg16))
    cfg = tiny_cfg(batch_size=2, effective_batch=2)
    cfg.s_sim_method = "perceptual"
    cfg.s_compact_method = "vgg"
    cfg.vgg_npz = str(npz)
    cfg.validate()
    model = build_model(cfg)
    b = synth_batch(cfg, rng)
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(0), b)
    assert "vgg_pre_kernel" in state.params
    pre0 = np.asarray(state.params["vgg_pre_kernel"])
    step, n_micro = make_train_step(model, cfg, txs, donate=False)
    stacked = jax.tree.map(lambda v: v[None], b)
    rngs = jax.random.split(jax.random.PRNGKey(7), n_micro)
    pair = jnp.zeros((n_micro, 2), jnp.int32).at[:, 1].set(1)
    state, metrics = step(state, stacked, rngs, pair, pair,
                          jnp.float32(2e-4), first_of_epoch=False)
    from representation_disentanglement_tpu.training.train import (
        metrics_to_dict)
    m = metrics_to_dict(metrics)
    assert np.isfinite(m["all"]) and m["sim_s"] != 0.0
    assert np.abs(np.asarray(state.params["vgg_pre_kernel"]) - pre0).max() > 0
