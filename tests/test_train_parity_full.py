"""End-to-end TRAINING parity vs the torch reference.

Transplants a freshly-initialized reference model, then runs BOTH
frameworks' full training iteration (forward stages -> 10-term loss ->
backward -> accumulated-grad clip -> Adam step [-> alternating D step]) on
identical data for several steps and compares the loss trajectories.

Determinism controls: z sampling pinned to the mean on both sides (the
only RNG in the step besides the sim-s/adv pair draws, which are pinned),
dropoff off, full masks.

Runs at the reference's native 160x192 (its ModalityEncoder hard-codes the
flatten, src/model.py:2396).  The DEFAULT suite runs one reduced variant
(M=2, B=2, 2 steps) covering ALL loss terms at once — segmentation (quirk
Q9), adversarial D-step (quirks Q3/Q4/Q10), KL, and the shipped five; the
persistent compile cache keeps re-runs fast.  The larger M=4 and
longer-trajectory variants stay behind RDT_FULL_PARITY=1.  Results recorded
in PARITY.md.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

H, W = 160, 192
LR = 2e-4

SHIPPED = dict(lambda_recon_y=0.0, lambda_recon_y_fused=0.0,
               lambda_recon_x=1.0, lambda_recon_x_mix=2.0, lambda_kl=0.0,
               lambda_latent_z=0.1, lambda_sim_s=10.0, lambda_sim_z=2.0,
               lambda_adv_s=0.0)
# lambda_recon_y_fused stays 0 in ALL parity configs: the reference's fused
# decode boolean-indexes si_cat[mask==1] (src/model.py:3242), flattening the
# (batch, modality) axes to a [B*M] batch, so for M > 1 its own fused seg /
# recon losses CRASH on the batch mismatch (we reproduced: torch raises
# "Expected input batch_size (4) to match target batch_size (2)").  The
# framework implements the intended per-sample fusion (multimodal.py
# docstring), which therefore has no runnable reference oracle; the fused
# decode itself is covered by eval/e2e tests.  Per-modality y (recon_y) is
# sane in the reference and parity-tested here.
EVERYTHING = dict(lambda_recon_y=1.0, lambda_recon_y_fused=0.0,
                  lambda_recon_x=1.0, lambda_recon_x_mix=2.0,
                  lambda_kl=0.01, lambda_latent_z=0.1, lambda_sim_s=10.0,
                  lambda_sim_z=2.0, lambda_adv_s=0.1)
SEG_STAGE2 = dict(lambda_recon_y=1.0, lambda_recon_y_fused=0.0,
                  lambda_recon_x=0.0, lambda_recon_x_mix=0.0, lambda_kl=0.0,
                  lambda_latent_z=0.0, lambda_sim_s=0.0, lambda_sim_z=0.0,
                  lambda_adv_s=0.0)


def _pin_ref_pairs(ref, pairs_iter):
    """Reference draws sim-s/adv pairs with global numpy RNG when M > 2
    (src/model.py:3485, 3564); pin np.random.choice for determinism."""
    import numpy as _np
    orig = _np.random.choice

    def fake_choice(n, k, replace=False):
        return _np.asarray(next(pairs_iter))

    _np.random.choice = fake_choice
    return lambda: setattr(_np.random, "choice", orig)


def _ref_train(ref, sd_out, xs_np, targets_np, mask_np, mask_img_np, lam,
               M, out_num_ch, steps, freeze=False, pin_pairs=None):
    dev = torch.device("cpu")
    # Deterministic reference init: the trajectory tolerances below were
    # measured for a FIXED init.  Without this, torch's global RNG gives a
    # fresh init every run and the chaotic step-3 divergence of the M=4
    # variant varies run-to-run around its tolerance (observed flake).
    torch.manual_seed(0)
    model = ref.MultimodalModel(
        input_size=(H, W), modality_num=M, in_num_ch=7,
        out_num_ch=out_num_ch, s_num_ch=4, z_size=16, is_cond=True,
        is_discrim_s=lam["lambda_adv_s"] > 0, is_distri_z=False,
        shared_ana_enc=True, shared_mod_enc=True, shared_inp_dec=False,
        s_compact_method="max", s_sim_method="cosine", z_sim_method="cosine",
        input_output_act="no", target_output_act="no",
        target_model_name="U+SA", fuse_method="mean", device=dev,
        others={"mod_enc_s": False, "ana_dec_act": "softmax", "old": False,
                "softmax_remove_mask": True})
    model.sample = lambda mean, log_var: mean      # pin z to the mean
    sd_out.update({k: v.detach().clone()
                   for k, v in model.state_dict().items()})
    if freeze:   # src/main_missing.py:104-116
        for sub in model.anatomy_encoder_enc_list:
            for p in sub.parameters():
                p.requires_grad = False
        for p in model.anatomy_encoder_dec.parameters():
            p.requires_grad = False
        for sub in model.modality_encoder_list:
            for p in sub.parameters():
                p.requires_grad = False
        for sub in model.input_decoder_list:
            for p in sub.parameters():
                p.requires_grad = False
    opt = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=1e-5,
                           amsgrad=True)
    opt_d = (torch.optim.Adam(model.parameters(), lr=LR, amsgrad=True)
             if lam["lambda_adv_s"] > 0 else None)
    losses = []
    model.train()
    undo = _pin_ref_pairs(ref, pin_pairs) if pin_pairs is not None else None
    try:
        for step in range(steps):
            xs = [torch.tensor(x) for x in xs_np]
            targets = torch.tensor(targets_np)
            mask = torch.tensor(mask_np)
            mask_img = torch.tensor(mask_img_np)
            si = model.compute_anatomy_encoding(xs, mask_img)
            zi, zm, zlv = model.compute_modality_encoding(xs, si,
                                                          phase="train")
            xf = model.reconstruct_input_si_zi(si, zi)
            xfm = model.reconstruct_input_si_zj(si, zi)
            # y decode exactly like the driver (main_missing.py:182-190)
            if step == 0 or lam["lambda_recon_y"] > 0:
                yl = model.reconstruct_output_si(si)
            if step == 0 or lam["lambda_recon_y_fused"] > 0:
                yf = model.reconstruct_output_si_fused(si, mask)
            loss = torch.tensor(0.0)
            if lam["lambda_recon_y"] > 0:
                loss = loss + lam["lambda_recon_y"] * \
                    model.compute_segmentation_loss_y_list(targets, yl, mask)
            if lam["lambda_recon_y_fused"] > 0:
                loss = loss + lam["lambda_recon_y_fused"] * \
                    model.compute_segmentation_loss_y(targets, yf)
            if lam["lambda_recon_x"] > 0:
                loss = loss + lam["lambda_recon_x"] * \
                    model.compute_recon_loss_x_list(xs, xf, mask, p=1)
            if lam["lambda_recon_x_mix"] > 0:
                loss = loss + lam["lambda_recon_x_mix"] * \
                    model.compute_recon_loss_x_mix_list(xs, xfm, mask, p=1)
            if lam["lambda_kl"] > 0:
                loss = loss + lam["lambda_kl"] * \
                    model.compute_kl_loss_list_standard(zm, zlv, mask)
            if lam["lambda_latent_z"] > 0:
                si2 = model.compute_anatomy_encoding(xf, mask_img)
                _, zm2, _ = model.compute_modality_encoding(xf, si2,
                                                            phase="train")
                loss = loss + lam["lambda_latent_z"] * \
                    model.compute_latent_z_loss(zm, zm2, mask)
            if lam["lambda_sim_s"] > 0:
                loss = loss + lam["lambda_sim_s"] * \
                    model.compute_similarity_s_loss(si, mask)
            if lam["lambda_sim_z"] > 0:
                loss = loss + lam["lambda_sim_z"] * \
                    model.compute_similarity_z_loss(zi, mask)
            d_loss = None
            if lam["lambda_adv_s"] > 0:
                d_loss, g_loss = model.compute_adversarial_loss(si, mask)
                loss = loss + lam["lambda_adv_s"] * g_loss
            losses.append(float(loss))
            loss.backward(retain_graph=d_loss is not None)
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            if d_loss is not None:
                # The reference calls d_loss.backward() AFTER opt.step()
                # (main_missing.py:286-289), which only worked under old
                # torch's .data-mutating optimizers (no version bump);
                # modern torch raises "modified by an inplace operation".
                # Reproduce the old semantics: d-grads at PRE-step params,
                # applied after the main step, left in .grad (quirk Q10).
                plist = [p for p in model.parameters() if p.requires_grad]
                d_grads = torch.autograd.grad(d_loss, plist,
                                              allow_unused=True)
            opt.step()
            opt.zero_grad()
            if d_loss is not None:      # main_missing.py:286-289
                for p, g in zip(plist, d_grads):
                    p.grad = None if g is None else g.clone()
                opt_d.step()
    finally:
        if undo:
            undo()
    return losses, model


def _ours_train(sd, rng, xs_np, targets_np, mask_np, mask_img_np, lam, M,
                out_num_ch, steps, B, freeze=False, pairs=None):
    from representation_disentanglement_tpu.config import Config
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.checkpoint import (
        load_partial_params)
    from representation_disentanglement_tpu.training.train import (
        create_train_state, make_train_step, metrics_to_dict)
    from representation_disentanglement_tpu.utils.transplant import (
        transplant_multimodal)

    cfg = Config(dataset_name="BraTS",
                 contrast_list=["T1", "T1c", "T2", "T2_FLAIR"][:M],
                 input_height=H, input_width=W, batch_size=B,
                 effective_batch=B, shared_inp_dec=False, is_cond=True,
                 use_pallas=False, out_num_ch=out_num_ch,
                 fix_pretrain=freeze, continue_train=freeze,
                 others={"mod_enc_s": False, "ana_dec_act": "softmax",
                         "old": False, "softmax_remove_mask": True}, **lam)
    cfg.derive().validate()
    model = build_model(cfg)
    batch = {
        "inputs": jnp.asarray(np.stack(
            [np.moveaxis(x, 1, -1) for x in xs_np], 0)),
        "targets": jnp.asarray(np.moveaxis(targets_np, 1, -1)),
        "mask": jnp.asarray(mask_np),
        "mask_img": jnp.asarray(mask_img_np),
    }
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    params, stats = transplant_multimodal(
        sd, M, input_size=(H, W), is_cond=True, shared_inp_dec=False,
        discrim=lam["lambda_adv_s"] > 0, notshared_impl=cfg.notshared_impl)
    merged, n_res, n_tot = load_partial_params(state.params, params)
    assert n_res == n_tot, f"transplant covered {n_res}/{n_tot}"
    bstats, _, _ = load_partial_params(state.batch_stats, stats)
    state = state._replace(params=merged, batch_stats=bstats)

    step_fn, n_micro = make_train_step(model, cfg, txs, donate=False)
    assert n_micro == 1
    stacked = jax.tree.map(lambda v: v[None], batch)
    orig_sample = type(model).sample_z
    type(model).sample_z = lambda self, rng, mean, lv: mean
    try:
        my_losses = []
        for i in range(steps):
            pair = jnp.asarray([pairs[i] if pairs else [0, 1]], jnp.int32)
            apair = jnp.asarray([pairs[steps + i] if pairs else [0, 1]],
                                jnp.int32)
            rngs = jax.random.split(jax.random.PRNGKey(i), 1)
            state, m = step_fn(state, stacked, rngs, pair, apair,
                               jnp.float32(LR), first_of_epoch=(i == 0))
            my_losses.append(metrics_to_dict(m)["all"])
    finally:
        type(model).sample_z = orig_sample
    return my_losses, state


def _run_case(rng, ref_model_module, lam, M, out_num_ch, steps, B,
              freeze=False, rtol=2e-3, pairs=None):
    # Test-LOCAL data stream: the shared session `rng` fixture's state
    # depends on which tests ran before this one, so adding an unrelated
    # rng-consuming test silently changed this test's data (and with it the
    # chaotic trajectory divergence the tolerances were measured for).
    rng = np.random.default_rng(10)
    xs_np = [rng.normal(size=(B, 7, H, W)).astype(np.float32) * 0.5
             for _ in range(M)]
    targets_np = rng.integers(0, 4, size=(B, 1, H, W)).astype(np.float32)
    mask_np = np.ones((B, M), np.float32)
    mask_img_np = np.zeros((B, H, W), np.float32)

    sd = {}
    pin = None
    # reference draw order per step: sim-s pair then adv pair
    if pairs:
        interleaved = []
        for i in range(steps):
            interleaved += [pairs[i], pairs[steps + i]]
        pin = iter(interleaved)
    ref_losses, ref_model = _ref_train(
        ref_model_module, sd, xs_np, targets_np, mask_np, mask_img_np, lam,
        M, out_num_ch, steps, freeze=freeze, pin_pairs=pin)
    my_losses, state = _ours_train(
        sd, rng, xs_np, targets_np, mask_np, mask_img_np, lam, M,
        out_num_ch, steps, B, freeze=freeze,
        pairs=pairs)
    print("reference:", ref_losses)
    print("ours     :", my_losses)
    if np.ndim(rtol):              # per-step tolerances (chaotic growth)
        assert len(rtol) == len(my_losses) == len(ref_losses), (
            "one rtol per step — a short list would silently skip steps")
        for k, (mine, ref) in enumerate(zip(my_losses, ref_losses)):
            np.testing.assert_allclose(mine, ref, rtol=rtol[k],
                                       err_msg=f"step {k}")
    else:
        np.testing.assert_allclose(my_losses, ref_losses, rtol=rtol)
    return ref_model, state, sd


@pytest.mark.slow
def test_everything_trajectory_reduced(rng, ref_model_module):
    """DEFAULT-suite parity: ALL loss terms at once — seg y-losses (quirk
    Q9), adversarial D step (quirks Q3/Q4/Q10 incl. the d-grad leak into
    the next window), KL, latent-z cycle, sim-s/sim-z — M=2, 2 steps."""
    _run_case(rng, ref_model_module, EVERYTHING, M=2, out_num_ch=4,
              steps=2, B=2)


@pytest.mark.slow
def test_stage2_freeze_trajectory(rng, ref_model_module):
    """DEFAULT-suite stage-2 parity: fix_pretrain+continue_train freezes
    anatomy/modality/input-decoder params (src/main_missing.py:104-116);
    they must stay BIT-IDENTICAL while the output decoder trains, and the
    loss trajectory must match torch doing the same."""
    ref_model, state, sd = _run_case(
        rng, ref_model_module, SEG_STAGE2, M=2, out_num_ch=4, steps=2, B=2,
        freeze=True)
    # torch side: frozen PARAMETERS unchanged vs the init snapshot (BN
    # running stats still update in train mode on both sides, so only
    # check actual parameters)
    param_names = {k for k, _ in ref_model.named_parameters()}
    post = ref_model.state_dict()
    for k in post:
        if k in param_names and any(k.startswith(p) for p in
               ("anatomy_encoder", "modality_encoder", "input_decoder")):
            assert torch.equal(post[k], sd[k]), f"ref moved frozen {k}"
    # our side: stage-1 subtrees unchanged; output decoder moved
    from representation_disentanglement_tpu.training.train import (
        is_stage1_param)
    from representation_disentanglement_tpu.utils.transplant import (
        transplant_multimodal)
    init_params, _ = transplant_multimodal(
        sd, 2, input_size=(H, W), is_cond=True, shared_inp_dec=False,
        notshared_impl="loop")
    from flax.traverse_util import flatten_dict
    flat_now = flatten_dict(state.params)
    flat_init = flatten_dict(init_params)
    moved_out = False
    for k, v in flat_now.items():
        if is_stage1_param(k[0]):
            assert np.array_equal(np.asarray(v),
                                  np.asarray(flat_init[k])), \
                f"frozen param moved: {k}"
        elif k[0] == "output_decoder" and not np.array_equal(
                np.asarray(v), np.asarray(flat_init[k])):
            moved_out = True
    assert moved_out, "output decoder did not train"


FULL = pytest.mark.skipif(
    not os.environ.get("RDT_FULL_PARITY"),
    reason="slow full-train parity; set RDT_FULL_PARITY=1")


@FULL
def test_full_training_trajectory_matches(rng, ref_model_module):
    """Shipped 5-loss config, M=2, 3 steps (the round-1 headline test)."""
    _run_case(rng, ref_model_module, SHIPPED, M=2, out_num_ch=1, steps=3,
              B=2)


@FULL
def test_full_training_trajectory_m4_everything(rng, ref_model_module):
    """Flagship M=4 with every loss term on, pinned pair draws.

    Tolerance note (measured, for the PINNED torch.manual_seed(0) init +
    default_rng(10) data): per-step relative divergence is
    2e-7 -> 2.9e-4 -> 1.2e-2 — growth of ~40-100x per optimizer step, the
    signature of chaotic amplification of f32 reduction-order noise through
    the hinge losses (max(0, margin - cos + cos_mix) flips its active set
    at the boundary), NOT a constant semantic offset (which would show at
    step 1).  Hence per-step tolerances: tight where parity is provable
    (step 1), bounded-noise margins where the trajectory is chaotic; the
    M=2 variant with the same loss set holds 2e-3 across all steps."""
    pairs = [[0, 1], [2, 3], [1, 2], [0, 3], [3, 1], [2, 0]]
    _run_case(rng, ref_model_module, EVERYTHING, M=4, out_num_ch=4,
              steps=3, B=2, pairs=pairs, rtol=[1e-5, 2e-3, 3e-2])


# fused-y M=1: with one modality the reference's si_cat[mask==1] flattening
# (src/model.py:3242) degenerates to a no-op, so its OWN fused path runs —
# the only configuration where the fixed per-sample fusion has a runnable
# reference oracle (VERDICT r2 item 10).
M1_FUSED = dict(lambda_recon_y=1.0, lambda_recon_y_fused=1.0,
                lambda_recon_x=1.0, lambda_recon_x_mix=0.0,
                lambda_kl=0.01, lambda_latent_z=0.1, lambda_sim_s=0.0,
                lambda_sim_z=0.0, lambda_adv_s=0.0)


@pytest.mark.slow
def test_m1_fused_y_trajectory(rng, ref_model_module):
    """Degenerate (M=1) trajectory parity for the fused y decode + fused
    segmentation loss (compute_segmentation_loss_y on
    reconstruct_output_si_fused, src/model.py:3239-3313)."""
    _run_case(rng, ref_model_module, M1_FUSED, M=1, out_num_ch=4,
              steps=2, B=2)
