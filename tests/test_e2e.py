"""CLI end-to-end regression: train -> artifacts -> resume -> test dump."""

import os

import numpy as np
import pytest
import yaml

h5py = pytest.importorskip("h5py")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    from representation_disentanglement_tpu.data.synthetic import (
        make_synthetic_dataset)
    make_synthetic_dataset(str(d / "data"), "BraTS", ("T1", "T2"),
                           "z-score", n_subj=6, shape=(32, 64, 16),
                           slice_range=(4, 12))
    return d


def _cfg(workdir, _name="config.yaml", **kw):
    d = dict(phase="train", load_yaml=True, epochs=1,
             dataset_name="BraTS", contrast_list=["T1", "T2"],
             norm_type="z-score", block_size=3,
             data_path=str(workdir / "data") + "/", batch_size=4,
             num_fold=5, fold=0, shuffle=True, lr=2e-4,
             model_name="MultimodalModel", p=1, s_num_ch=4, z_size=16,
             lambda_recon_y=0.0, lambda_recon_y_fused=0.0,
             lambda_recon_x=1.0, lambda_recon_x_mix=2.0,
             lambda_sim_s=10.0, lambda_sim_z=2.0, lambda_kl=0.0,
             lambda_latent_z=0.1, lambda_adv_s=0.0,
             s_compact_method="max", s_sim_method="cosine",
             z_sim_method="cosine", is_cond=True, is_distri_z=False,
             shared_ana_enc=True, shared_mod_enc=True, shared_inp_dec=False,
             others={"mod_enc_s": False, "ana_dec_act": "softmax",
                     "old": False, "softmax_remove_mask": True},
             out_num_ch=1, input_height=32, input_width=64, dropoff=False,
             skull_strip=False, fuse_method="mean", target_model_name="U",
             continue_train=False, fix_pretrain=False,
             ckpt_name="model_best.ckpt", ckpt_timelabel="e2e",
             effective_batch=4, log_every=0)
    d.update(kw)
    p = workdir / _name
    p.write_text(yaml.dump(d))
    return str(p)


@pytest.mark.slow
@pytest.mark.veryslow
def test_cli_train_then_test(workdir):
    from representation_disentanglement_tpu.main_missing import main
    cfg_path = _cfg(workdir, phase="train", ckpt_timelabel="run_e2e",
                    continue_train=True)  # timelabel honored for resume-less
    # continue_train=True with no ckpt would fail; use a fresh train dir:
    cfg_path = _cfg(workdir, phase="train")
    main([cfg_path, "--ckpt-root", str(workdir / "ckpt")])
    # find the timestamped run dir
    runs = os.listdir(workdir / "ckpt" / "BraTS" / "MultimodalModel")
    assert runs
    run = runs[0]
    run_dir = workdir / "ckpt" / "BraTS" / "MultimodalModel" / run
    assert (run_dir / "stat.csv").exists()
    assert (run_dir / "model_best.ckpt").exists()
    assert (run_dir / "config.yaml").exists()

    cfg_path = _cfg(workdir, phase="test", ckpt_timelabel=run)
    stat = main([cfg_path, "--ckpt-root", str(workdir / "ckpt")])
    assert np.isfinite(stat["recon_x_mix"])
    res = run_dir / "result_test" / "results_all.h5"
    assert res.exists()
    with h5py.File(res) as f:
        # reference dump contract (main_missing.py:592-607)
        for k in ("subj_id", "slice_idx", "inputs", "targets", "mask",
                  "y_fake_fused", "y_fake_list", "xi_fake_mix",
                  "xi_fake_list", "s_list", "z_list"):
            assert k in f, k
        n = f["inputs"].shape[0]
        assert f["inputs"].shape == (n, 14, 32, 64)     # [N, M*bc, H, W]
        assert f["s_list"].shape == (n, 2, 4, 32, 64)
        assert f["z_list"].shape == (n, 2, 16)


@pytest.mark.slow
@pytest.mark.veryslow
def test_cli_zerodose_pet_synthesis(tmp_path):
    """ZeroDose PET synthesis e2e: y-losses on (recon_y/recon_y_fused
    through the FIXED per-sample fusion), monitor = recon_y_fused, recon
    metrics computed on the fused y (src/main_missing.py:528-533), ZeroDose
    h5 name + contrast-count fold-txt dispatch (util.py:650-668)."""
    import yaml
    from representation_disentanglement_tpu.data.synthetic import (
        make_synthetic_dataset)
    from representation_disentanglement_tpu.main_missing import main

    make_synthetic_dataset(str(tmp_path / "data"), "ZeroDose",
                           ("T1", "T2_FLAIR"), "z-score", n_subj=6,
                           shape=(32, 64, 16), slice_range=(4, 12))
    d = dict(phase="train", load_yaml=False, epochs=1,
             dataset_name="ZeroDose", contrast_list=["T1", "T2_FLAIR"],
             norm_type="z-score", block_size=3,
             data_path=str(tmp_path / "data") + "/", batch_size=4,
             num_fold=5, fold=0, shuffle=True, lr=2e-4, p=1,
             model_name="MultimodalModel", s_num_ch=4, z_size=16,
             lambda_recon_y=1.0, lambda_recon_y_fused=2.0,
             lambda_recon_x=1.0, lambda_recon_x_mix=2.0, lambda_sim_s=10.0,
             lambda_sim_z=2.0, lambda_latent_z=0.1,
             others={"mod_enc_s": False, "ana_dec_act": "softmax",
                     "old": False, "softmax_remove_mask": True},
             out_num_ch=1, input_height=32, input_width=64,
             fuse_method="mean", target_model_name="U+SA",
             effective_batch=4, log_every=0, use_pallas=False)
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.dump(d))
    main([str(cfg_path), "--ckpt-root", str(tmp_path / "ckpt")])
    run = os.listdir(tmp_path / "ckpt" / "ZeroDose" / "MultimodalModel")[0]
    run_dir = tmp_path / "ckpt" / "ZeroDose" / "MultimodalModel" / run

    d.update(phase="test", ckpt_timelabel=run, load_yaml=False,
             continue_train=False)
    cfg_path.write_text(yaml.dump(d))
    stat = main([str(cfg_path), "--ckpt-root", str(tmp_path / "ckpt")])
    # y-losses active: metrics are PSNR/SSIM on the FUSED synthesized PET
    assert np.isfinite(stat["recon_y_fused"]) and stat["recon_y_fused"] > 0
    assert np.isfinite(stat["psnr"]) and np.isfinite(stat["ssim"])
    with h5py.File(run_dir / "result_test" / "results_all.h5") as f:
        assert f["y_fake_fused"].shape[1:] == (1, 32, 64)   # [N, Co, H, W]
        assert f["targets"].shape[1:] == (1, 32, 64)


@pytest.mark.slow
@pytest.mark.veryslow
def test_cli_ncanda_cross_synthesis(tmp_path):
    """NCANDA T1/T2 e2e: the generic fold_<ds>_<fold>_<set>.txt dispatch
    (util.py:718-720) and the y-free disentanglement config (no target
    exists for NCANDA; metrics fall back to mix-reconstruction PSNR/SSIM,
    src/main_missing.py:519-528)."""
    import yaml
    from representation_disentanglement_tpu.data.synthetic import (
        make_synthetic_dataset)
    from representation_disentanglement_tpu.main_missing import main

    make_synthetic_dataset(str(tmp_path / "data"), "NCANDA", ("T1", "T2"),
                           "z-score", n_subj=6, shape=(32, 64, 16),
                           slice_range=(4, 12))
    d = dict(phase="train", load_yaml=False, epochs=1,
             dataset_name="NCANDA", contrast_list=["T1", "T2"],
             norm_type="z-score", block_size=3,
             data_path=str(tmp_path / "data") + "/", batch_size=4,
             num_fold=5, fold=0, shuffle=True, lr=2e-4, p=1,
             model_name="MultimodalModel", s_num_ch=4, z_size=16,
             lambda_recon_x=1.0, lambda_recon_x_mix=2.0, lambda_sim_s=10.0,
             lambda_sim_z=2.0, lambda_latent_z=0.1,
             others={"mod_enc_s": False, "ana_dec_act": "softmax",
                     "old": False, "softmax_remove_mask": True},
             out_num_ch=1, input_height=32, input_width=64,
             fuse_method="mean", target_model_name="U",
             effective_batch=4, log_every=0, use_pallas=False)
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.dump(d))
    main([str(cfg_path), "--ckpt-root", str(tmp_path / "ckpt")])
    run = os.listdir(tmp_path / "ckpt" / "NCANDA" / "MultimodalModel")[0]

    d.update(phase="test", ckpt_timelabel=run)
    cfg_path.write_text(yaml.dump(d))
    stat = main([str(cfg_path), "--ckpt-root", str(tmp_path / "ckpt")])
    assert np.isfinite(stat["recon_x_mix"]) and np.isfinite(stat["psnr"])


@pytest.fixture(scope="module")
def serve_env(workdir):
    """Shared serving fixture: its OWN config file (config_serve.yaml — the
    default config.yaml is rewritten by unrelated tests in this module), an
    untrained-but-real checkpoint, and the encoder-z serving baseline run.
    Both serve CLI tests consume this, so neither depends on the other
    having run first (they survive -k selection and reordering)."""
    import jax
    from representation_disentanglement_tpu import serve as serve_mod
    from representation_disentanglement_tpu.config import (
        load_config, resolve_run)
    from representation_disentanglement_tpu.data.dataset import DataAll
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.checkpoint import (
        save_checkpoint)
    from representation_disentanglement_tpu.training.train import (
        create_train_state)

    cfg_path = _cfg(workdir, _name="config_serve.yaml", phase="test",
                    ckpt_timelabel="serve_run", model_name="ServeModel",
                    load_yaml=False)
    root = str(workdir / "ckpt_serve")
    cfg = load_config(cfg_path)
    cfg.phase = "test"
    cfg = resolve_run(cfg, ckpt_root=root).derive().validate()

    # untrained but real checkpoint (params + batch_stats round-trip)
    model = build_model(cfg)
    data = DataAll(cfg.dataset_name, cfg.data_path, norm_type=cfg.norm_type,
                   batch_size=cfg.batch_size, fold=cfg.fold, shuffle=False,
                   block_size=cfg.block_size, contrast_list=cfg.contrast_list,
                   image_size=cfg.input_size, seed=cfg.seed)
    ds = data.test_dataset
    first = ds.get_batch(list(range(cfg.batch_size)))
    sample = {k: first[k] for k in ("inputs", "targets", "mask", "mask_img")}
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), sample)
    save_checkpoint({"params": state.params,
                     "batch_stats": state.batch_stats, "epoch": 0},
                    True, cfg.ckpt_path, name=None)

    out_dir = str(workdir / "serve_out")
    serve_mod.main([cfg_path, "--missing", "T2", "--ckpt-root", root,
                    "--out-dir", out_dir, "--format", "npy"])
    return dict(cfg_path=cfg_path, root=root, cfg=cfg, model=model,
                state=state, ds=ds, out_dir=out_dir)


@pytest.mark.slow
def test_cli_serve_missing_modality(workdir, serve_env):
    """Serving CLI e2e: restore a checkpoint, zero-fill a contrast, write
    re-assembled synth/recon/y volumes for every test-fold subject, and
    match a direct model.synthesize call on the first batch."""
    import jax.numpy as jnp
    from representation_disentanglement_tpu import serve as serve_mod

    cfg, model, state, ds, out_dir = (
        serve_env["cfg"], serve_env["model"], serve_env["state"],
        serve_env["ds"], serve_env["out_dir"])
    rows = serve_mod._group_by_subject(ds.subj_list, ds.idx_list)
    D = len(next(iter(rows.values())))
    H, W = cfg.input_size
    for subj in rows:
        synth = np.load(os.path.join(out_dir, f"{subj}_T2_synth.npy"))
        recon = np.load(os.path.join(out_dir, f"{subj}_T1_recon.npy"))
        y = np.load(os.path.join(out_dir, f"{subj}_y.npy"))
        assert synth.shape == (D, H, W) and recon.shape == (D, H, W)
        assert y.shape == (D, H, W)
        assert np.isfinite(synth).all() and np.abs(synth).sum() > 0

    # oracle: first batch through model.synthesize directly
    subj0, ii0 = next(iter(rows.items()))
    batch = ds.get_batch(ii0[:cfg.batch_size])
    inputs, mask = batch["inputs"], batch["mask"]
    inputs[1] = 0.0
    mask[:, 1] = 0.0
    mask_img = (inputs[0, :, :, :, 0] == 0).astype(np.float32)
    x_hat, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(inputs), jnp.asarray(mask), jnp.asarray(mask_img),
        method=model.synthesize, source=0)
    want = np.asarray(x_hat)[1, :, :, :, cfg.block_size]
    got = np.load(os.path.join(out_dir, f"{subj0}_T2_synth.npy"))[
        :cfg.batch_size]
    np.testing.assert_allclose(got, want, atol=1e-5)

    # --batch overrides the dispatch batch (the serving-throughput lever,
    # PERF.md sweep) without changing any written volume
    out_b = str(workdir / "serve_out_b")
    serve_mod.main([serve_env["cfg_path"], "--missing", "T2",
                    "--ckpt-root", serve_env["root"], "--out-dir", out_b,
                    "--format", "npy", "--batch",
                    str(2 * cfg.batch_size)])
    for subj in rows:
        np.testing.assert_allclose(
            np.load(os.path.join(out_b, f"{subj}_T2_synth.npy")),
            np.load(os.path.join(out_dir, f"{subj}_T2_synth.npy")),
            atol=1e-5)


@pytest.mark.slow
def test_cli_serve_with_z_bank(workdir, serve_env):
    """--z-bank retrieval: missing modality z comes from the bank.  Oracle
    for --z-mode mean (retrieved z == bank mean, checked via a direct
    synthesize(z=...) call); nearest_neighbour exercised for execution."""
    import jax.numpy as jnp
    from representation_disentanglement_tpu import serve as serve_mod
    from representation_disentanglement_tpu.training.checkpoint import (
        load_checkpoint, load_partial_params)

    cfg_path, root, cfg = (serve_env["cfg_path"], serve_env["root"],
                           serve_env["cfg"])

    # synthetic latent bank with the results_all.h5 contract
    rng = np.random.default_rng(3)
    N, M, Cs, H, W, Z = 11, 2, 4, 32, 64, 16
    bank_path = str(workdir / "bank.h5")
    with h5py.File(bank_path, "w") as f:
        f["s_list"] = rng.normal(size=(N, M, Cs, H, W)).astype(np.float32)
        f["z_list"] = rng.normal(size=(N, M, Z)).astype(np.float32)

    out_mean = str(workdir / "serve_out_mean")
    serve_mod.main([cfg_path, "--missing", "T2", "--ckpt-root", root,
                    "--out-dir", out_mean, "--format", "npy",
                    "--z-bank", bank_path, "--z-mode", "mean"])
    out_nn = str(workdir / "serve_out_nn")
    serve_mod.main([cfg_path, "--missing", "T2", "--ckpt-root", root,
                    "--out-dir", out_nn, "--format", "npy",
                    "--z-bank", bank_path])

    ds = serve_env["ds"]
    model = serve_env["model"]
    rows = serve_mod._group_by_subject(ds.subj_list, ds.idx_list)
    subj0, ii0 = next(iter(rows.items()))

    # oracle for mean mode on the first batch — restore through the same
    # checkpoint-load path the CLI uses (not the in-memory fixture state)
    batch = ds.get_batch(ii0[:cfg.batch_size])
    inputs, mask = batch["inputs"], batch["mask"]
    inputs[1] = 0.0
    mask[:, 1] = 0.0
    mask_img = (inputs[0, :, :, :, 0] == 0).astype(np.float32)
    state = serve_env["state"]
    ckpt = load_checkpoint(cfg.ckpt_path, cfg.ckpt_name)
    params, _, _ = load_partial_params(state.params, ckpt.get("params"))
    bstats, _, _ = load_partial_params(state.batch_stats,
                                       ckpt.get("batch_stats", {}))
    v = {"params": params, "batch_stats": bstats}
    x = jnp.asarray(inputs)
    s = model.apply(v, x, jnp.asarray(mask_img), train=False,
                    method=model.encode_anatomy)
    z_enc, _ = model.apply(v, x, s, method=model.encode_modality)
    with h5py.File(bank_path) as f:
        z_saved = np.asarray(f["z_list"])
    z = jnp.stack([z_enc[0],
                   jnp.broadcast_to(jnp.asarray(z_saved[:, 1].mean(0)),
                                    (cfg.batch_size, Z))], 0)
    x_hat, _ = model.apply(v, x, jnp.asarray(mask), jnp.asarray(mask_img),
                           method=model.synthesize, source=0, z=z)
    want = np.asarray(x_hat)[1, :, :, :, cfg.block_size]
    got = np.load(os.path.join(out_mean, f"{subj0}_T2_synth.npy"))[
        :cfg.batch_size]
    np.testing.assert_allclose(got, want, atol=1e-5)

    # NN mode executed and produced different volumes than encoder-z serving
    nn_vol = np.load(os.path.join(out_nn, f"{subj0}_T2_synth.npy"))
    assert np.isfinite(nn_vol).all()
    enc_vol = np.load(os.path.join(serve_env["out_dir"],
                                   f"{subj0}_T2_synth.npy"))
    assert not np.allclose(nn_vol, enc_vol)


@pytest.mark.slow
def test_cli_serve_aot_artifact(workdir, serve_env):
    """AOT serving: --export-aot writes a jax.export StableHLO artifact;
    --aot serves from it and reproduces the live-traced serving output
    exactly; header mismatches (with_y) are rejected before execution."""
    from representation_disentanglement_tpu import serve as serve_mod
    from representation_disentanglement_tpu.utils.aot import read_header

    cfg_path, root, cfg = (serve_env["cfg_path"], serve_env["root"],
                           serve_env["cfg"])
    art = str(workdir / "serve_B.rdx")
    serve_mod.main([cfg_path, "--missing", "T2", "--ckpt-root", root,
                    "--export-aot", art])
    with open(art, "rb") as f:
        blob = f.read()
    hdr = read_header(blob)
    assert hdr["source"] == 0 and hdr["with_y"] is True
    assert hdr["inputs_shape"][1] == cfg.batch_size

    out_aot = str(workdir / "serve_out_aot")
    serve_mod.main([cfg_path, "--missing", "T2", "--ckpt-root", root,
                    "--out-dir", out_aot, "--format", "npy", "--aot", art])

    ds = serve_env["ds"]
    rows = serve_mod._group_by_subject(ds.subj_list, ds.idx_list)
    for subj in rows:
        for name in (f"{subj}_T2_synth.npy", f"{subj}_T1_recon.npy",
                     f"{subj}_y.npy"):
            live = np.load(os.path.join(serve_env["out_dir"], name))
            aot = np.load(os.path.join(out_aot, name))
            np.testing.assert_allclose(aot, live, atol=1e-6)

    # header guard: artifact was exported with the fused-y decode
    with pytest.raises(ValueError, match="with_y"):
        serve_mod.main([cfg_path, "--missing", "T2", "--ckpt-root", root,
                        "--out-dir", out_aot, "--aot", art, "--no-y"])

    # header guard: the artifact bakes in its compute_dtype cast — a config
    # requesting a different dtype must be rejected, not silently served
    import copy
    cfg_flip = copy.deepcopy(cfg)
    cfg_flip.compute_dtype = ("float32" if cfg.compute_dtype == "bfloat16"
                              else "bfloat16")
    with pytest.raises(ValueError, match="compute_dtype"):
        serve_mod.serve(cfg_flip, ["T2"], None, out_aot, fmt="npy", aot=art)

    # cross-platform export: lowering for the TPU serving fleet works from
    # this CPU box and the artifact still executes on the CPU platform
    art2 = str(workdir / "serve_multi.rdx")
    serve_mod.main([cfg_path, "--missing", "T2", "--ckpt-root", root,
                    "--export-aot", art2, "--aot-platforms", "cpu,tpu"])
    with open(art2, "rb") as f:
        hdr2 = read_header(f.read())
    assert hdr2["platforms"] == ["cpu", "tpu"]
    out_multi = str(workdir / "serve_out_multi")
    serve_mod.main([cfg_path, "--missing", "T2", "--ckpt-root", root,
                    "--out-dir", out_multi, "--format", "npy",
                    "--aot", art2])
    subj = next(iter(rows))
    np.testing.assert_allclose(
        np.load(os.path.join(out_multi, f"{subj}_T2_synth.npy")),
        np.load(os.path.join(serve_env["out_dir"], f"{subj}_T2_synth.npy")),
        atol=1e-6)
