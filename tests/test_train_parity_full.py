"""End-to-end TRAINING parity vs the torch reference.

Transplants a freshly-initialized reference model, then runs BOTH
frameworks' full training iteration (forward stages -> 10-term loss ->
backward -> accumulated-grad clip -> Adam step) on identical data for
several steps and compares the loss trajectories.

Determinism controls: z sampling pinned to the mean on both sides (the
only RNG in the step besides the sim-s pair, which is fixed for M=2),
dropoff off, full masks.

Runs at the reference's native 160x192 (its ModalityEncoder hard-codes the
flatten, src/model.py:2396), so the CPU compile is slow — gated behind
RDT_FULL_PARITY=1; CI covers module-level parity instead.  Result recorded
in PARITY.md.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("RDT_FULL_PARITY"),
    reason="slow full-train parity; set RDT_FULL_PARITY=1")

torch = pytest.importorskip("torch")

M, B = 2, 2
H, W = 160, 192
STEPS = 3
LR = 2e-4


def _ref_train_losses(ref, sd_out, xs_np, mask_np, mask_img_np):
    dev = torch.device("cpu")
    model = ref.MultimodalModel(
        input_size=(H, W), modality_num=M, in_num_ch=7, out_num_ch=1,
        s_num_ch=4, z_size=16, is_cond=True, is_discrim_s=False,
        is_distri_z=False, shared_ana_enc=True, shared_mod_enc=True,
        shared_inp_dec=False, s_compact_method="max", s_sim_method="cosine",
        z_sim_method="cosine", input_output_act="no", target_output_act="no",
        target_model_name="U+SA", fuse_method="mean", device=dev,
        others={"mod_enc_s": False, "ana_dec_act": "softmax", "old": False,
                "softmax_remove_mask": True})
    model.sample = lambda mean, log_var: mean      # pin z to the mean
    # snapshot BEFORE training: state_dict() returns live tensor references
    sd_out.update({k: v.detach().clone()
                   for k, v in model.state_dict().items()})
    opt = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=1e-5,
                           amsgrad=True)
    losses = []
    model.train()
    for step in range(STEPS):
        xs = [torch.tensor(x) for x in xs_np]
        mask = torch.tensor(mask_np)
        mask_img = torch.tensor(mask_img_np)
        si = model.compute_anatomy_encoding(xs, mask_img)
        zi, zm, zlv = model.compute_modality_encoding(xs, si, phase="train")
        xf = model.reconstruct_input_si_zi(si, zi)
        xfm = model.reconstruct_input_si_zj(si, zi)
        loss = model.compute_recon_loss_x_list(xs, xf, mask, p=1)
        loss = loss + 2.0 * model.compute_recon_loss_x_mix_list(
            xs, xfm, mask, p=1)
        si2 = model.compute_anatomy_encoding(xf, mask_img)
        _, zm2, _ = model.compute_modality_encoding(xf, si2, phase="train")
        loss = loss + 0.1 * model.compute_latent_z_loss(zm, zm2, mask)
        loss = loss + 10.0 * model.compute_similarity_s_loss(si, mask)
        loss = loss + 2.0 * model.compute_similarity_z_loss(zi, mask)
        losses.append(float(loss))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        opt.zero_grad()
    return losses


def test_full_training_trajectory_matches(rng, ref_model_module):
    from representation_disentanglement_tpu.config import Config
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.train import (
        create_train_state, make_train_step)
    from representation_disentanglement_tpu.utils.transplant import (
        transplant_multimodal)

    xs_np = [rng.normal(size=(B, 7, H, W)).astype(np.float32) * 0.5
             for _ in range(M)]
    mask_np = np.ones((B, M), np.float32)
    mask_img_np = np.zeros((B, H, W), np.float32)

    sd = {}
    ref_losses = _ref_train_losses(ref_model_module, sd, xs_np, mask_np,
                                   mask_img_np)

    cfg = Config(dataset_name="BraTS", contrast_list=["T1", "T2"],
                 input_height=H, input_width=W, batch_size=B,
                 effective_batch=B, shared_inp_dec=False, is_cond=True,
                 use_pallas=False,
                 others={"mod_enc_s": False, "ana_dec_act": "softmax",
                         "old": False, "softmax_remove_mask": True})
    cfg.derive().validate()
    model = build_model(cfg)
    batch = {
        "inputs": jnp.asarray(np.stack(
            [np.moveaxis(x, 1, -1) for x in xs_np], 0)),
        "targets": jnp.zeros((B, H, W, 1), jnp.float32),
        "mask": jnp.asarray(mask_np),
        "mask_img": jnp.asarray(mask_img_np),
    }
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                    batch)
    params, stats = transplant_multimodal(
        sd, M, input_size=(H, W), is_cond=True, shared_inp_dec=False,
        notshared_impl=cfg.notshared_impl)
    from representation_disentanglement_tpu.training.checkpoint import (
        load_partial_params)
    merged, n_res, n_tot = load_partial_params(state.params, params)
    assert n_res == n_tot, f"transplant covered {n_res}/{n_tot}"
    bstats, _, _ = load_partial_params(state.batch_stats, stats)
    state = state._replace(params=merged, batch_stats=bstats)

    step_fn, n_micro = make_train_step(model, cfg, txs, donate=False)
    assert n_micro == 1
    stacked = jax.tree.map(lambda v: v[None], batch)
    pair = jnp.asarray([[0, 1]], jnp.int32)
    # rngs unused content-wise: z pinned to mean by patching sample_z? No —
    # our step samples when rng is given; pin by zeroing log-var effect:
    # instead pass rng=None path via a custom loss: simplest is to exploit
    # that eps ~ N(0,1) scaled by exp(0.5*log_var)... we need z == mean, so
    # monkeypatch the class method for the duration of this test.
    orig_sample = type(model).sample_z
    type(model).sample_z = lambda self, rng, mean, lv: mean
    try:
        my_losses = []
        for i in range(STEPS):
            rngs = jax.random.split(jax.random.PRNGKey(i), 1)
            state, m = step_fn(state, stacked, rngs, pair, pair,
                               jnp.float32(LR), first_of_epoch=False)
            from representation_disentanglement_tpu.training.train import \
                metrics_to_dict
            my_losses.append(metrics_to_dict(m)["all"])
    finally:
        type(model).sample_z = orig_sample

    print("reference:", ref_losses)
    print("ours     :", my_losses)
    np.testing.assert_allclose(my_losses, ref_losses, rtol=2e-3)
