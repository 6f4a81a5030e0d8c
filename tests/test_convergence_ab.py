"""Multi-epoch convergence A/B (VERDICT r3 item 1) — the load-bearing form
of the ±0.5 dB / ±0.005 north star.

Both frameworks train from the SAME initialization on the SAME multi-batch
synthetic dataset for several FULL epochs (identical batch order), and after
every epoch BOTH weight sets are scored on a held-out validation set through
the real ``evaluate()`` path (val PSNR/SSIM on the cross-modal mix
reconstructions, the shipped config's metric family,
src/main_missing.py:519-527).  The per-epoch deltas must stay inside the
north-star tolerances — two frameworks *converging together*, not just
matching step math.

Oracle: the torch reference on CPU (src/main_missing.py:141-335 loop
semantics, src/config.yaml:4 epochs) at the native 160x192 (the reference's
modality encoder hard-codes its flatten to that geometry,
src/model.py:2396), small batches/epochs so CPU-torch stays tractable.
Torch-side weights are scored by transplant into our
model + the same evaluator — legitimate per test_ab_accuracy.py's argument
(forward parity and metric parity are independently tested; this isolates
the optimization dynamics).

Gated behind RDT_FULL_PARITY=1 (CPU-torch minutes).  Recorded results:
PARITY.md "Multi-epoch convergence A/B".
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("RDT_FULL_PARITY"),
    reason="multi-epoch convergence A/B is slow (torch CPU); "
           "set RDT_FULL_PARITY=1")

torch = pytest.importorskip("torch")

H, W, M, B = 160, 192, 2, 2
EPOCHS = int(os.environ.get("RDT_CONV_EPOCHS", "4"))
BATCHES_PER_EPOCH = int(os.environ.get("RDT_CONV_BATCHES", "4"))
VAL_BATCHES = int(os.environ.get("RDT_CONV_VAL_BATCHES", "2"))
LR = 2e-4
# plateau scheduler (reference: factor .1, patience 5, min 1e-5,
# main_missing.py:118-121; patience shrunk via env so an LR-reduction
# event actually occurs inside the test horizon, VERDICT r4 item 8)
PATIENCE = int(os.environ.get("RDT_CONV_PATIENCE", "5"))
REQUIRE_LR_DROP = os.environ.get("RDT_CONV_REQUIRE_LR_DROP") == "1"
# Two comparison regimes (VERDICT r4 item 8, long horizons):
#
# - "lockstep" (default): per-epoch val PSNR/SSIM deltas must sit inside the
#   north-star tolerances AND the LR trajectories must agree epoch-by-epoch.
#   This is the right criterion for short horizons; measured round 4:
#   deltas <=1.2e-3 dB over 4 epochs x 4 batches.
# - "long": past ~50 optimizer steps trajectory lockstep is
#   information-theoretically dead in ANY framework pair: the loss surface's
#   nonsmooth kinks (sim-s/sim-z hinges, amsgrad max, BN batch stats) amplify
#   1-ulp differences chaotically (measured here: 5e-5 dB at 24 steps ->
#   1.4 dB at 64 steps).  The long regime therefore asserts what long
#   training must actually preserve — both frameworks CONVERGE TO EQUALLY
#   GOOD solutions and exercise the plateau scheduler — and quantifies the
#   chaos claim with a CONTROL: the torch reference trained against ITSELF
#   from a 1-ulp-perturbed init.  Ours-vs-ref divergence is benign if it is
#   the same order as ref-vs-ref(1ulp); final quality must satisfy
#   |d| <= max(north_star, 2 * control_final_d).
MODE = os.environ.get("RDT_CONV_MODE", "lockstep")
CONTROL = os.environ.get("RDT_CONV_CONTROL", "1" if MODE == "long" else "0") == "1"


def _phantom_batch(rng):
    """Structured multi-contrast slices (shared anatomy, per-sample
    gain/gamma per contrast) so PSNR/SSIM are meaningful, unlike pure
    noise.  Returns xs_np [M][B, 7, H, W] + targets/mask/mask_img."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    xs = []
    base = []
    for b in range(B):
        cy, cx = rng.uniform(0.3, 0.7) * H, rng.uniform(0.3, 0.7) * W
        r = ((yy - cy) ** 2 / (0.16 * H * H) +
             (xx - cx) ** 2 / (0.16 * W * W))
        anat = np.clip(1.0 - r, 0, None)
        anat += 0.3 * np.clip(np.sin(yy / 7.0 + b) * np.cos(xx / 9.0), 0,
                              None) * (anat > 0)
        base.append(anat)
    base = np.stack(base, 0)                       # [B, H, W]
    for m in range(M):
        gain = rng.uniform(0.6, 1.6)
        gamma = rng.uniform(0.8, 1.3)
        img = gain * np.power(base + 0.05, gamma)
        img = img + 0.02 * rng.normal(size=base.shape).astype(np.float32)
        xs.append(np.repeat(img[:, None], 7, axis=1).astype(np.float32))
    return (xs, np.zeros((B, 1, H, W), np.float32),
            np.ones((B, M), np.float32), np.zeros((B, H, W), np.float32))


class _RefTrainer:
    """Torch reference trainer held open across epochs so the plateau
    scheduler can interleave with per-epoch validation (the driver's
    structure: train epoch -> evaluate val -> scheduler.step(monitor),
    src/main_missing.py:141-335, :316-321).  z pinned to mean; per-
    iteration backward + clip + step (effective_batch == batch here).

    ``perturb_ulp=True`` multiplies one weight of the fresh init by
    (1 + 2^-23) — the chaos control for the long regime: a second copy of
    the REFERENCE whose trajectory differs from the first only by 1 ulp at
    step 0."""

    def __init__(self, ref, lam, perturb_ulp=False):
        torch.manual_seed(0)
        dev = torch.device("cpu")
        self.lam = lam
        self.model = ref.MultimodalModel(
            input_size=(H, W), modality_num=M, in_num_ch=7, out_num_ch=1,
            s_num_ch=4, z_size=16, is_cond=True, is_discrim_s=False,
            is_distri_z=False, shared_ana_enc=True, shared_mod_enc=True,
            shared_inp_dec=False, s_compact_method="max",
            s_sim_method="cosine", z_sim_method="cosine",
            input_output_act="no", target_output_act="no",
            target_model_name="U+SA", fuse_method="mean", device=dev,
            others={"mod_enc_s": False, "ana_dec_act": "softmax",
                    "old": False, "softmax_remove_mask": True})
        self.model.sample = lambda mean, log_var: mean
        if perturb_ulp:
            with torch.no_grad():
                next(self.model.parameters()).view(-1)[0].mul_(1 + 2 ** -23)
        self.sd0 = {k: v.detach().clone()
                    for k, v in self.model.state_dict().items()}
        self.opt = torch.optim.Adam(self.model.parameters(), lr=LR,
                                    weight_decay=1e-5, amsgrad=True)
        self.scheduler = torch.optim.lr_scheduler.ReduceLROnPlateau(
            self.opt, factor=0.1, patience=PATIENCE, min_lr=1e-5)
        self.it = 0

    @property
    def lr(self):
        return self.opt.param_groups[0]["lr"]

    def train_epoch(self, batches):
        model, lam = self.model, self.lam
        model.train()
        ep_losses = []
        for xs_np, targets_np, mask_np, mask_img_np in batches:
            xs = [torch.tensor(x) for x in xs_np]
            mask = torch.tensor(mask_np)
            mask_img = torch.tensor(mask_img_np)
            si = model.compute_anatomy_encoding(xs, mask_img)
            zi, zm, zlv = model.compute_modality_encoding(xs, si,
                                                          phase="train")
            xf = model.reconstruct_input_si_zi(si, zi)
            xfm = model.reconstruct_input_si_zj(si, zi)
            if self.it == 0:     # y decode only at iter 0 (driver :182-190)
                model.reconstruct_output_si(si)
                model.reconstruct_output_si_fused(si, mask)
            loss = torch.tensor(0.0)
            loss = loss + lam["lambda_recon_x"] * \
                model.compute_recon_loss_x_list(xs, xf, mask, p=1)
            loss = loss + lam["lambda_recon_x_mix"] * \
                model.compute_recon_loss_x_mix_list(xs, xfm, mask, p=1)
            si2 = model.compute_anatomy_encoding(xf, mask_img)
            _, zm2, _ = model.compute_modality_encoding(xf, si2,
                                                        phase="train")
            loss = loss + lam["lambda_latent_z"] * \
                model.compute_latent_z_loss(zm, zm2, mask)
            loss = loss + lam["lambda_sim_s"] * \
                model.compute_similarity_s_loss(si, mask)
            loss = loss + lam["lambda_sim_z"] * \
                model.compute_similarity_z_loss(zi, mask)
            ep_losses.append(float(loss))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            self.opt.step()
            self.opt.zero_grad()
            self.it += 1
        return float(np.mean(ep_losses))

    def snapshot(self):
        return {k: v.detach().clone()
                for k, v in self.model.state_dict().items()}


class _ListLoader:
    def __init__(self, jbatches):
        self.jbatches = jbatches

    def __iter__(self):
        for i, b in enumerate(self.jbatches):
            yield dict(b, subj_id=[f"s{i}_{j}" for j in range(B)],
                       slice_idx=np.arange(B))


def test_multi_epoch_convergence_ab(rng, ref_model_module, tmp_path):
    from tests.test_train_parity_full import SHIPPED
    from representation_disentanglement_tpu.config import Config
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.checkpoint import (
        load_partial_params)
    from representation_disentanglement_tpu.training.evaluate import (
        evaluate, make_eval_step)
    from representation_disentanglement_tpu.training.optim import (
        ReduceLROnPlateau)
    from representation_disentanglement_tpu.training.train import (
        create_train_state, make_train_step)
    from representation_disentanglement_tpu.utils.transplant import (
        transplant_multimodal)

    lam = SHIPPED
    data_rng = np.random.default_rng(7)
    train_batches = [_phantom_batch(data_rng)
                     for _ in range(BATCHES_PER_EPOCH)]
    val_batches = [_phantom_batch(data_rng) for _ in range(VAL_BATCHES)]

    ref = _RefTrainer(ref_model_module, lam)
    ctl = _RefTrainer(ref_model_module, lam, perturb_ulp=True) if CONTROL \
        else None

    # ---- ours: same init, same data, same batch order ----
    cfg = Config(dataset_name="BraTS", contrast_list=["T1", "T2"],
                 input_height=H, input_width=W, batch_size=B,
                 effective_batch=B, shared_inp_dec=False, is_cond=True,
                 use_pallas=False,
                 others={"mod_enc_s": False, "ana_dec_act": "softmax",
                         "old": False, "softmax_remove_mask": True}, **lam)
    cfg.derive().validate()
    cfg.ckpt_path = str(tmp_path)
    model = build_model(cfg)

    def to_jax(b):
        xs_np, targets_np, mask_np, mask_img_np = b
        return {"inputs": jnp.asarray(np.stack(
                    [np.moveaxis(x, 1, -1) for x in xs_np], 0)),
                "targets": jnp.asarray(np.moveaxis(targets_np, 1, -1)),
                "mask": jnp.asarray(mask_np),
                "mask_img": jnp.asarray(mask_img_np)}

    jtrain = [to_jax(b) for b in train_batches]
    jval = [to_jax(b) for b in val_batches]
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                    jtrain[0])

    def transplant(sd):
        p, s = transplant_multimodal(
            sd, M, input_size=(H, W), is_cond=True, shared_inp_dec=False,
            notshared_impl=cfg.notshared_impl)
        mp, n_res, n_tot = load_partial_params(state.params, p)
        assert n_res == n_tot
        ms, _, _ = load_partial_params(state.batch_stats, s)
        return mp, ms

    p0, s0 = transplant(ref.sd0)
    my_state = state._replace(params=p0, batch_stats=s0)
    step_fn, _ = make_train_step(model, cfg, txs, donate=False)
    eval_steps = make_eval_step(model, cfg)
    pair = jnp.asarray([[0, 1]], jnp.int32)
    our_sched = ReduceLROnPlateau(LR, factor=0.1, patience=PATIENCE,
                                  min_lr=1e-5)
    our_lr = LR

    def val_stat(params, bstats, tag):
        return evaluate(model, params, bstats, cfg, _ListLoader(jval),
                        phase="val", set_name=tag, save_res=False,
                        eval_steps=eval_steps)

    orig_sample = type(model).sample_z
    type(model).sample_z = lambda self, rng, mean, lv: mean
    rows = []
    lr_drops_ref = lr_drops_ours = 0
    ctl_sched = (torch.optim.lr_scheduler.ReduceLROnPlateau(
        ctl.opt, factor=0.1, patience=PATIENCE, min_lr=1e-5)
        if ctl else None)
    try:
        it = 0
        for epoch in range(EPOCHS):
            lr_ref_this, lr_ours_this = ref.lr, our_lr
            ref_loss = ref.train_epoch(train_batches)
            ctl_loss = ctl.train_epoch(train_batches) if ctl else None
            ep_losses = []
            for jb in jtrain:
                stacked = jax.tree.map(lambda v: v[None], jb)
                rngs = jax.random.split(jax.random.PRNGKey(it), 1)
                my_state, m = step_fn(my_state, stacked, rngs, pair, pair,
                                      jnp.float32(our_lr),
                                      first_of_epoch=(it == 0))
                ep_losses.append(float(np.asarray(m)[-2]))   # 'all'
                it += 1
            ours_loss = float(np.mean(ep_losses))

            st_ours = val_stat(my_state.params, my_state.batch_stats,
                               f"conv_ours_{epoch}")
            rp, rs = transplant(ref.snapshot())
            st_ref = val_stat(rp, rs, f"conv_ref_{epoch}")
            st_ctl = None
            if ctl:
                cp, cs = transplant(ctl.snapshot())
                st_ctl = val_stat(cp, cs, f"conv_ctl_{epoch}")

            # driver semantics: scheduler steps on the VAL recon_x_mix
            # monitor every epoch (src/main_missing.py:316-321); each
            # framework is driven by ITS OWN monitor value
            ref.scheduler.step(st_ref["recon_x_mix"])
            our_lr = our_sched.step(st_ours["recon_x_mix"])
            if ctl:
                ctl_sched.step(st_ctl["recon_x_mix"])
            if ref.lr < lr_ref_this:
                lr_drops_ref += 1
            if our_lr < lr_ours_this:
                lr_drops_ours += 1

            d_loss = abs(ours_loss - ref_loss)
            d_psnr = abs(st_ours["psnr"] - st_ref["psnr"])
            d_ssim = abs(st_ours["ssim"] - st_ref["ssim"])
            d_psnr_ctl = abs(st_ctl["psnr"] - st_ref["psnr"]) if ctl \
                else float("nan")
            d_ssim_ctl = abs(st_ctl["ssim"] - st_ref["ssim"]) if ctl \
                else float("nan")
            rows.append((epoch, ref_loss, ours_loss, d_loss,
                         st_ref["psnr"], st_ours["psnr"], d_psnr,
                         st_ref["ssim"], st_ours["ssim"], d_ssim,
                         lr_ref_this, lr_ours_this,
                         st_ref["recon_x_mix"], st_ours["recon_x_mix"],
                         d_psnr_ctl, d_ssim_ctl))
            print(f"[conv-ab e{epoch}] ref {ref_loss:.4f} ours "
                  f"{ours_loss:.4f}" +
                  (f" ctl {ctl_loss:.4f}" if ctl else "") +
                  f" | psnr {st_ref['psnr']:.4f}/{st_ours['psnr']:.4f}"
                  f" d={d_psnr:.2e} ctl_d={d_psnr_ctl:.2e}"
                  f" | lr {ref.lr:.1e}/{our_lr:.1e}", flush=True)
            if MODE == "lockstep":
                assert d_psnr <= 0.5, (epoch, d_psnr)
                assert d_ssim <= 0.005, (epoch, d_ssim)
                # the LR trajectories must agree: each side steps its own
                # plateau scheduler on its own monitor, and the monitors
                # track closely enough that every reduction event lands on
                # the same epoch in both frameworks
                assert abs(ref.lr - our_lr) < 1e-12, (
                    epoch, ref.lr, our_lr, st_ref["recon_x_mix"],
                    st_ours["recon_x_mix"])
    finally:
        type(model).sample_z = orig_sample

    print("\nmulti-epoch convergence A/B "
          "(epoch: ref_loss ours_loss d_loss | ref_psnr ours_psnr d_psnr |"
          " ref_ssim ours_ssim d_ssim | lr | val_mix ref/ours |"
          " ctl d_psnr d_ssim):")
    for r in rows:
        print(f"  {r[0]}: {r[1]:.4f} {r[2]:.4f} {r[3]:.1e} | "
              f"{r[4]:.4f} {r[5]:.4f} {r[6]:.1e} | "
              f"{r[7]:.5f} {r[8]:.5f} {r[9]:.1e} | lr={r[10]:.1e} | "
              f"{r[12]:.5f} {r[13]:.5f} | {r[14]:.1e} {r[15]:.1e}")
    print(f"  LR reductions: ref {lr_drops_ref}, ours {lr_drops_ours}")
    # both frameworks actually LEARNED together (loss decreased >10% over
    # the run on both sides) — convergence, not a frozen-weights triviality
    assert rows[-1][1] < 0.9 * rows[0][1]
    assert rows[-1][2] < 0.9 * rows[0][2]
    if MODE == "long":
        # converged-quality parity: ours ends no further from the reference
        # than the north star, or than 2x the reference's own 1-ulp chaos
        # control if the control itself exceeds it
        d_psnr_f, d_ssim_f = rows[-1][6], rows[-1][9]
        ctl_psnr_f, ctl_ssim_f = rows[-1][14], rows[-1][15]
        tol_psnr = max(0.5, 2 * ctl_psnr_f) if ctl else 0.5
        tol_ssim = max(0.005, 2 * ctl_ssim_f) if ctl else 0.005
        assert d_psnr_f <= tol_psnr, (d_psnr_f, tol_psnr)
        assert d_ssim_f <= tol_ssim, (d_ssim_f, tol_ssim)
        if REQUIRE_LR_DROP:
            assert lr_drops_ref >= 1, "reference never reduced LR"
            assert lr_drops_ours >= 1, "ours never reduced LR"
    elif REQUIRE_LR_DROP:
        assert lr_drops_ref >= 1, "no LR-reduction event inside the horizon"
