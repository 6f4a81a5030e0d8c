"""A/B accuracy protocol (BASELINE.md north star; VERDICT r1 item 9).

Train the torch reference and this framework from the SAME initialization
on IDENTICAL data for N optimizer steps, then evaluate BOTH resulting
weight sets through the real ``evaluate()`` -> ``results_all.h5`` path and
require reconstruction-metric agreement within the north-star tolerances:
PSNR +-0.5 dB, SSIM +-0.005.

The torch-side weights are scored by transplanting them into our model and
running the same evaluator — legitimate because (a) eval-mode forward
parity is covered by test_parity_model.py / test_train_parity_full.py and
(b) the metric definitions are skimage-parity-tested in test_metrics.py;
this isolates the question the protocol asks: do the OPTIMIZATION DYNAMICS
land on equivalent weights?

Native 160x192 (the reference pins it), torch CPU: minutes — gated behind
RDT_FULL_PARITY=1.  Last recorded run (see PARITY.md):
  ours: psnr 6.0704 ssim 0.00279 | ref-trained: psnr 6.0703 ssim 0.00279
  |d_psnr| = 5e-5 dB, |d_ssim| = 9e-7 (vs tolerances 0.5 dB / 0.005).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("RDT_FULL_PARITY"),
    reason="A/B accuracy protocol is slow (torch CPU at 160x192); "
           "set RDT_FULL_PARITY=1")

torch = pytest.importorskip("torch")

H, W, M, B = 160, 192, 2, 2
# RDT_AB_STEPS extends the protocol to longer optimizer-step horizons
# (the recorded 24-step "few synthetic epochs" run is in PARITY.md)
STEPS = int(os.environ.get("RDT_AB_STEPS", "6"))
LR = 2e-4


def test_ab_accuracy_protocol(rng, ref_model_module, tmp_path):
    from tests.test_train_parity_full import SHIPPED, _ref_train
    from representation_disentanglement_tpu.config import Config
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.checkpoint import (
        load_partial_params)
    from representation_disentanglement_tpu.training.evaluate import evaluate
    from representation_disentanglement_tpu.training.train import (
        create_train_state, make_train_step, metrics_to_dict)
    from representation_disentanglement_tpu.utils.transplant import (
        transplant_multimodal)

    # identical training data for both frameworks
    xs_np = [rng.normal(size=(B, 7, H, W)).astype(np.float32) * 0.5
             for _ in range(M)]
    targets_np = np.zeros((B, 1, H, W), np.float32)
    mask_np = np.ones((B, M), np.float32)
    mask_img_np = np.zeros((B, H, W), np.float32)

    # ---- torch reference: STEPS optimizer steps from a fresh init ----
    sd0 = {}
    ref_losses, ref_model = _ref_train(
        ref_model_module, sd0, xs_np, targets_np, mask_np, mask_img_np,
        SHIPPED, M, 1, STEPS)
    sd_final = {k: v.detach().clone()
                for k, v in ref_model.state_dict().items()}

    # ---- ours: same init (transplant sd0), same data, same steps ----
    cfg = Config(dataset_name="BraTS", contrast_list=["T1", "T2"],
                 input_height=H, input_width=W, batch_size=B,
                 effective_batch=B, shared_inp_dec=False, is_cond=True,
                 use_pallas=False,
                 others={"mod_enc_s": False, "ana_dec_act": "softmax",
                         "old": False, "softmax_remove_mask": True},
                 **SHIPPED)
    cfg.derive().validate()
    cfg.ckpt_path = str(tmp_path)
    model = build_model(cfg)
    batch = {
        "inputs": jnp.asarray(np.stack(
            [np.moveaxis(x, 1, -1) for x in xs_np], 0)),
        "targets": jnp.asarray(np.moveaxis(targets_np, 1, -1)),
        "mask": jnp.asarray(mask_np),
        "mask_img": jnp.asarray(mask_img_np),
    }
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)

    def transplant(sd):
        p, s = transplant_multimodal(
            sd, M, input_size=(H, W), is_cond=True, shared_inp_dec=False,
            notshared_impl=cfg.notshared_impl)
        mp, n_res, n_tot = load_partial_params(state.params, p)
        assert n_res == n_tot
        ms, _, _ = load_partial_params(state.batch_stats, s)
        return mp, ms

    p0, s0 = transplant(sd0)
    my_state = state._replace(params=p0, batch_stats=s0)
    step_fn, n_micro = make_train_step(model, cfg, txs, donate=False)
    stacked = jax.tree.map(lambda v: v[None], batch)
    pair = jnp.asarray([[0, 1]], jnp.int32)
    orig_sample = type(model).sample_z
    type(model).sample_z = lambda self, rng, mean, lv: mean
    try:
        for i in range(STEPS):
            rngs = jax.random.split(jax.random.PRNGKey(i), 1)
            my_state, m = step_fn(my_state, stacked, rngs, pair, pair,
                                  jnp.float32(LR), first_of_epoch=(i == 0))
    finally:
        type(model).sample_z = orig_sample

    # ---- evaluate BOTH weight sets through the real evaluate() path ----
    class OneBatchLoader:
        def __iter__(self):
            yield dict(batch, subj_id=["s0"] * B,
                       slice_idx=np.arange(B))

    stats = {}
    for tag, (p, s) in (("ours", (my_state.params, my_state.batch_stats)),
                        ("ref", transplant(sd_final))):
        st = evaluate(model, p, s, cfg, OneBatchLoader(), phase="test",
                      set_name=f"ab_{tag}", save_res=True)
        assert os.path.exists(os.path.join(
            str(tmp_path), f"result_ab_{tag}", "results_all.h5"))
        stats[tag] = st

    d_psnr = abs(stats["ours"]["psnr"] - stats["ref"]["psnr"])
    d_ssim = abs(stats["ours"]["ssim"] - stats["ref"]["ssim"])
    print(f"A/B: ours psnr={stats['ours']['psnr']:.4f} "
          f"ssim={stats['ours']['ssim']:.5f} | ref-trained "
          f"psnr={stats['ref']['psnr']:.4f} ssim={stats['ref']['ssim']:.5f} "
          f"| d_psnr={d_psnr:.5f} d_ssim={d_ssim:.7f}")
    assert d_psnr <= 0.5, f"PSNR divergence {d_psnr} > 0.5 dB"
    assert d_ssim <= 0.005, f"SSIM divergence {d_ssim} > 0.005"


def test_ab_dropoff_matrix(rng, ref_model_module, tmp_path):
    """Per-drop-subset A/B — the paper's headline table scenario.

    TestDropoffDataset semantics (src/util.py:571-632): every subset of
    dropped contrasts is zero-filled with mask=0; evaluation scores the
    cross-modal ("mix") reconstructions (src/main_missing.py:519-527).
    Both frameworks run the SAME torch-trained weights over every drop
    subset; per-subset PSNR/SSIM must agree within the north-star
    tolerances (0.5 dB / 0.005).  Results recorded in PARITY.md."""
    from tests.test_train_parity_full import SHIPPED, _ref_train
    from representation_disentanglement_tpu.config import Config
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.metrics import (
        compute_reconstruction_metrics)
    from representation_disentanglement_tpu.training.checkpoint import (
        load_partial_params)
    from representation_disentanglement_tpu.training.evaluate import (
        make_eval_step)
    from representation_disentanglement_tpu.training.train import (
        create_train_state)
    from representation_disentanglement_tpu.utils.transplant import (
        transplant_multimodal)

    xs_np = [rng.normal(size=(B, 7, H, W)).astype(np.float32) * 0.5
             for _ in range(M)]
    targets_np = np.zeros((B, 1, H, W), np.float32)
    mask_np = np.ones((B, M), np.float32)
    mask_img_np = np.zeros((B, H, W), np.float32)

    sd0 = {}
    _, ref_model = _ref_train(ref_model_module, sd0, xs_np, targets_np,
                              mask_np, mask_img_np, SHIPPED, M, 1, STEPS)
    ref_model.eval()

    cfg = Config(dataset_name="BraTS", contrast_list=["T1", "T2"],
                 input_height=H, input_width=W, batch_size=B,
                 effective_batch=B, shared_inp_dec=False, is_cond=True,
                 use_pallas=False,
                 others={"mod_enc_s": False, "ana_dec_act": "softmax",
                         "old": False, "softmax_remove_mask": True},
                 **SHIPPED)
    cfg.derive().validate()
    cfg.ckpt_path = str(tmp_path)
    model = build_model(cfg)
    batch0 = {
        "inputs": jnp.asarray(np.stack(
            [np.moveaxis(x, 1, -1) for x in xs_np], 0)),
        "targets": jnp.asarray(np.moveaxis(targets_np, 1, -1)),
        "mask": jnp.asarray(mask_np),
        "mask_img": jnp.asarray(mask_img_np),
    }
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), batch0)
    p, s = transplant_multimodal(
        ref_model.state_dict(), M, input_size=(H, W), is_cond=True,
        shared_inp_dec=False, notshared_impl=cfg.notshared_impl)
    params, n_res, n_tot = load_partial_params(state.params, p)
    assert n_res == n_tot
    bstats, _, _ = load_partial_params(state.batch_stats, s)
    eval_step, _, metric_names = make_eval_step(model, cfg)

    # drop subsets with >= 1 contrast present (util.py:580-584: <= 2 drops)
    subsets = [(), (0,), (1,)]
    rows = []
    for drop in subsets:
        keep = np.ones((B, M), np.float32)
        xs_d = [x.copy() for x in xs_np]
        for d in drop:
            keep[:, d] = 0.0
            xs_d[d][:] = 0.0

        # torch side: eval-mode forward, z = mean; mix-recon metrics with
        # the SAME (skimage-parity-tested) metric functions
        with torch.no_grad():
            xs_t = [torch.tensor(x) for x in xs_d]
            si = ref_model.compute_anatomy_encoding(
                xs_t, torch.tensor(mask_img_np))
            _, zm, _ = ref_model.compute_modality_encoding(xs_t, si,
                                                           phase="test")
            xfm = ref_model.reconstruct_input_si_zj(si, zm)
        # reference mix order is i-major, j != i (model.py:3205-3224);
        # score only pairs whose TARGET modality j is present — a dropped
        # target is all-zeros, making PSNR's data_range 0 (NaN) on both
        # sides by construction
        pair_js = [j for i in range(M) for j in range(M) if i != j]
        keep_rows = np.concatenate([keep[:, j] for j in pair_js]) > 0
        gts = np.concatenate([xs_d[j][:, 0] for i in range(M)
                              for j in range(M) if i != j], 0)
        preds = np.concatenate([x.numpy()[:, 0] for x in xfm], 0)
        mt = compute_reconstruction_metrics(gts[..., None],
                                            preds[..., None])
        mt = {k: np.asarray(v)[keep_rows] for k, v in mt.items()}

        # our side: the real jitted eval step's on-device metric matrix
        jb = dict(batch0,
                  inputs=jnp.asarray(np.stack(
                      [np.moveaxis(x, 1, -1) for x in xs_d], 0)),
                  mask=jnp.asarray(keep))
        _, _, metric_mat = eval_step(params, bstats, jb,
                                     jnp.asarray([0, 1]),
                                     jnp.asarray([0, 1]), compute_y=False)
        ours = {k: row[keep_rows] for k, row in zip(
            metric_names, np.asarray(metric_mat, np.float64))}

        d_psnr = abs(np.mean(mt["psnr"]) - np.mean(ours["psnr"]))
        d_ssim = abs(np.mean(mt["ssim"]) - np.mean(ours["ssim"]))
        rows.append((drop, float(np.mean(mt["psnr"])),
                     float(np.mean(ours["psnr"])), d_psnr, d_ssim))
        assert d_psnr <= 0.5, (drop, d_psnr)
        assert d_ssim <= 0.005, (drop, d_ssim)

    print("\ndropoff matrix A/B (drop -> ref_psnr ours_psnr dpsnr dssim):")
    for r in rows:
        print(f"  drop={r[0]}: {r[1]:.4f} {r[2]:.4f} "
              f"d_psnr={r[3]:.2e} d_ssim={r[4]:.2e}")


def test_ab_dropoff_matrix_m4(rng, ref_model_module, tmp_path):
    """4-modality dropoff-matrix A/B (VERDICT r3 item 9): all <=2-drop
    subsets with >=2 contrasts present — 11 rows (1 none + 4 single + 6
    pairs), same torch-trained weights on both sides, per-subset PSNR/SSIM
    within the north-star tolerances.  Matches the BraTS M=4 scenario of
    src/util.py:571-632.  Results recorded in PARITY.md."""
    import itertools
    from tests.test_train_parity_full import SHIPPED, _ref_train
    from representation_disentanglement_tpu.config import Config
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.metrics import (
        compute_reconstruction_metrics)
    from representation_disentanglement_tpu.training.checkpoint import (
        load_partial_params)
    from representation_disentanglement_tpu.training.evaluate import (
        make_eval_step)
    from representation_disentanglement_tpu.training.train import (
        create_train_state)
    from representation_disentanglement_tpu.utils.transplant import (
        transplant_multimodal)

    M4 = 4
    steps = min(STEPS, 4)                  # torch-CPU M=4 at 160x192
    xs_np = [rng.normal(size=(B, 7, H, W)).astype(np.float32) * 0.5
             for _ in range(M4)]
    targets_np = np.zeros((B, 1, H, W), np.float32)
    mask_np = np.ones((B, M4), np.float32)
    mask_img_np = np.zeros((B, H, W), np.float32)

    # pin the reference's global-RNG sim-s pair draws (M > 2 path)
    pair_cycle = itertools.cycle([[0, 1], [2, 3], [1, 2], [0, 3]])
    sd0 = {}
    _, ref_model = _ref_train(ref_model_module, sd0, xs_np, targets_np,
                              mask_np, mask_img_np, SHIPPED, M4, 1, steps,
                              pin_pairs=pair_cycle)
    ref_model.eval()

    cfg = Config(dataset_name="BraTS",
                 contrast_list=["T1", "T1c", "T2", "T2_FLAIR"],
                 input_height=H, input_width=W, batch_size=B,
                 effective_batch=B, shared_inp_dec=False, is_cond=True,
                 use_pallas=False,
                 others={"mod_enc_s": False, "ana_dec_act": "softmax",
                         "old": False, "softmax_remove_mask": True},
                 **SHIPPED)
    cfg.derive().validate()
    cfg.ckpt_path = str(tmp_path)
    model = build_model(cfg)
    batch0 = {
        "inputs": jnp.asarray(np.stack(
            [np.moveaxis(x, 1, -1) for x in xs_np], 0)),
        "targets": jnp.asarray(np.moveaxis(targets_np, 1, -1)),
        "mask": jnp.asarray(mask_np),
        "mask_img": jnp.asarray(mask_img_np),
    }
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), batch0)
    p, s = transplant_multimodal(
        ref_model.state_dict(), M4, input_size=(H, W), is_cond=True,
        shared_inp_dec=False, notshared_impl=cfg.notshared_impl)
    params, n_res, n_tot = load_partial_params(state.params, p)
    assert n_res == n_tot
    bstats, _, _ = load_partial_params(state.batch_stats, s)
    eval_step, _, metric_names = make_eval_step(model, cfg)

    # <=2-drop subsets with >= 2 contrasts present (util.py:580-584)
    subsets = [()] + [(i,) for i in range(M4)] + \
        [t for t in itertools.combinations(range(M4), 2)]
    assert len(subsets) == 11
    rows = []
    for drop in subsets:
        keep = np.ones((B, M4), np.float32)
        xs_d = [x.copy() for x in xs_np]
        for d in drop:
            keep[:, d] = 0.0
            xs_d[d][:] = 0.0

        with torch.no_grad():
            xs_t = [torch.tensor(x) for x in xs_d]
            si = ref_model.compute_anatomy_encoding(
                xs_t, torch.tensor(mask_img_np))
            _, zm, _ = ref_model.compute_modality_encoding(xs_t, si,
                                                           phase="test")
            xfm = ref_model.reconstruct_input_si_zj(si, zm)
        pair_js = [j for i in range(M4) for j in range(M4) if i != j]
        keep_rows = np.concatenate([keep[:, j] for j in pair_js]) > 0
        gts = np.concatenate([xs_d[j][:, 0] for i in range(M4)
                              for j in range(M4) if i != j], 0)
        preds = np.concatenate([x.numpy()[:, 0] for x in xfm], 0)
        mt = compute_reconstruction_metrics(gts[..., None],
                                            preds[..., None])
        mt = {k: np.asarray(v)[keep_rows] for k, v in mt.items()}

        jb = dict(batch0,
                  inputs=jnp.asarray(np.stack(
                      [np.moveaxis(x, 1, -1) for x in xs_d], 0)),
                  mask=jnp.asarray(keep))
        _, _, metric_mat = eval_step(params, bstats, jb,
                                     jnp.asarray([0, 1]),
                                     jnp.asarray([0, 1]), compute_y=False)
        ours = {k: row[keep_rows] for k, row in zip(
            metric_names, np.asarray(metric_mat, np.float64))}

        d_psnr = abs(np.mean(mt["psnr"]) - np.mean(ours["psnr"]))
        d_ssim = abs(np.mean(mt["ssim"]) - np.mean(ours["ssim"]))
        rows.append((drop, float(np.mean(mt["psnr"])),
                     float(np.mean(ours["psnr"])), d_psnr, d_ssim))
        assert d_psnr <= 0.5, (drop, d_psnr)
        assert d_ssim <= 0.005, (drop, d_ssim)

    print("\nM=4 dropoff matrix A/B "
          "(drop -> ref_psnr ours_psnr dpsnr dssim):")
    for r in rows:
        print(f"  drop={r[0]}: {r[1]:.4f} {r[2]:.4f} "
              f"d_psnr={r[3]:.2e} d_ssim={r[4]:.2e}")
