"""Mesh-sharded HBM volume cache (VERDICT r3 item 2), virtual 8-way CPU mesh.

The replicated cache pays full-dataset HBM on every DP chip; the sharded
cache deals subjects round-robin over the ``data`` axis (per-chip bytes
~total/N) and draws each device's batch rows from its resident subjects.
Correctness: the sharded gather and a full sharded epoch must match the
replicated path fed the SAME batch composition (same seed -> same loss
trajectory), and the CLI must activate it under ``mesh_shape``.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

from representation_disentanglement_tpu.data.dataset import (  # noqa: E402
    VolumeStore, load_idx_list)
from representation_disentanglement_tpu.data.device_store import (  # noqa: E402
    DeviceBatchLoader, ShardedDeviceBatchLoader, build_device_cache,
    build_sharded_device_cache, gather_blocks)
from representation_disentanglement_tpu.data.synthetic import (  # noqa: E402
    make_synthetic_dataset)
from representation_disentanglement_tpu.parallel import make_mesh  # noqa: E402


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("shardcache")
    make_synthetic_dataset(str(d), "BraTS", ("T1", "T2"), "z-score",
                           n_subj=26, shape=(32, 64, 16),
                           slice_range=(4, 12))
    store = VolumeStore(f"{d}/BraTS_All_zscore_10.h5")
    subjs, idxs = load_idx_list(f"{d}/fold_BraTS_0_train_noval.txt")
    return store, subjs, idxs


def _caches(env, n_mesh):
    store, subjs, idxs = env
    mesh = make_mesh(n_mesh)
    rep = build_device_cache("BraTS", store, subjs, ("T1", "T2"),
                             block_size=3, dtype=jnp.float32, clamp_max=155)
    sh = build_sharded_device_cache("BraTS", store, subjs, ("T1", "T2"),
                                    mesh, block_size=3, dtype=jnp.float32,
                                    clamp_max=155)
    return mesh, rep, sh, subjs, idxs


def _global_rows(sh_cache, rep_cache, rows):
    """Map per-device local rows [..., N, b] to the replicated cache's
    global rows, concatenated in the sharded batch order."""
    shp = rows.shape
    N, b = shp[-2], shp[-1]
    out = np.zeros(shp[:-2] + (N * b,), np.int32)
    flat = rows.reshape(-1, N, b)
    oflat = out.reshape(-1, N * b)
    for i in range(flat.shape[0]):
        names = [sh_cache.subjects[n * sh_cache.s_loc + flat[i, n, j]]
                 for n in range(N) for j in range(b)]
        oflat[i] = [rep_cache.row[s] for s in names]
    return out


def test_per_chip_bytes_scale(env):
    for n in (4, 8):
        mesh, rep, sh, _, _ = _caches(env, n)
        assert sh is not None
        # padded to equal shards: per-chip <= ceil(S/n)/S of the total
        s = len([x for x in sh.subjects if x])
        assert sh.nbytes_per_chip == sh.nbytes // n
        assert sh.nbytes_per_chip <= rep.nbytes * (-(-s // n)) // s + 1
        # every real subject is resident somewhere exactly once
        assert sorted(x for x in sh.subjects if x) == sorted(rep.subjects)


def test_sharded_gather_matches_global(env):
    mesh, rep, sh, subjs, idxs = _caches(env, 8)
    loader = ShardedDeviceBatchLoader(sh, subjs, idxs, batch_size=8,
                                      shuffle=True, seed=5)
    batch = next(iter(loader))
    # reconstruct the same batch from the replicated cache
    g_rows = np.asarray([rep.row[s] for s in batch["subj_id"]], np.int32)
    ref = gather_blocks(rep.vols, rep.tgts, rep.presence,
                        jnp.asarray(g_rows),
                        jnp.asarray(batch["slice_idx"], np.int32),
                        jnp.ones((8, 2), np.float32), block_size=3)
    for k in ("inputs", "targets", "mask", "mask_img"):
        np.testing.assert_allclose(np.asarray(batch[k]),
                                   np.asarray(ref[k]), atol=1e-6,
                                   err_msg=k)


@pytest.mark.slow
def test_sharded_epoch_matches_replicated(env):
    """One full epoch over the sharded cache == the replicated epoch fed
    the SAME batch composition: same seed, same loss trajectory (f32
    reduction order aside), same final params."""
    from tests.test_train import tiny_cfg
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.epoch import (
        epoch_indices, make_train_epoch)
    from representation_disentanglement_tpu.training.train import (
        create_train_state)

    mesh, rep, sh, subjs, idxs = _caches(env, 8)
    cfg = tiny_cfg(batch_size=8, effective_batch=16)   # A=2 microbatches
    loader = ShardedDeviceBatchLoader(sh, subjs, idxs, cfg.batch_size,
                                      shuffle=True, seed=cfg.seed)
    model = build_model(cfg)
    sample = next(iter(loader))
    sample = {k: sample[k] for k in ("inputs", "targets", "mask",
                                     "mask_img")}
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                    sample)

    pair_rng = np.random.default_rng(cfg.seed)
    plan, _ = epoch_indices(loader, 2, cfg.modality_num, pair_rng,
                            jax.random.PRNGKey(cfg.seed))
    assert plan is not None
    rows, slices, drop, rng_keys, sim, adv = plan
    assert rows.ndim == 4                              # [steps, A, N, b]

    from representation_disentanglement_tpu.parallel import replicate
    state_sh = type(state)(*[replicate(s, mesh) for s in state])
    ep_sh, _ = make_train_epoch(model, cfg, txs, sh, donate=False)
    s_sh, m_sh = ep_sh(state_sh, *plan, jnp.float32(cfg.lr),
                       jnp.asarray(True))

    # replicated oracle: identical composition, global rows
    g_rows = _global_rows(sh, rep, np.asarray(rows))
    M = np.asarray(drop).shape[-1]
    rep_plan = (jnp.asarray(g_rows),
                jnp.asarray(np.asarray(slices).reshape(
                    g_rows.shape)),
                jnp.asarray(np.asarray(drop).reshape(
                    g_rows.shape + (M,))),
                jnp.asarray(rng_keys), jnp.asarray(sim), jnp.asarray(adv))
    ep_rep, _ = make_train_epoch(model, cfg, txs, rep, donate=False)
    s_rep, m_rep = ep_rep(state, *rep_plan, jnp.float32(cfg.lr),
                          jnp.asarray(True))

    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_rep),
                               rtol=2e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(s_sh.params),
                    jax.tree.leaves(s_rep.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=2e-4)


@pytest.mark.slow
def test_cli_sharded_cache_dp8(tmp_path, capsys):
    """CLI e2e: mesh_shape {data: 8} + shard_data_cache (default) trains
    through the sharded-cache epoch loop and reports per-chip bytes."""
    import os
    import yaml
    from representation_disentanglement_tpu.main_missing import main

    make_synthetic_dataset(str(tmp_path / "data"), "BraTS", ("T1", "T2"),
                           "z-score", n_subj=26, shape=(32, 64, 16),
                           slice_range=(4, 12))
    d = dict(phase="train", load_yaml=False, epochs=2,
             dataset_name="BraTS", contrast_list=["T1", "T2"],
             norm_type="z-score", block_size=3,
             data_path=str(tmp_path / "data") + "/", batch_size=8,
             num_fold=5, fold=0, shuffle=True, lr=2e-4, p=1,
             model_name="MultimodalModel", s_num_ch=4, z_size=16,
             lambda_recon_x=1.0, lambda_recon_x_mix=2.0, lambda_sim_s=10.0,
             lambda_sim_z=2.0, lambda_latent_z=0.1,
             others={"mod_enc_s": False, "ana_dec_act": "softmax",
                     "old": False, "softmax_remove_mask": True},
             out_num_ch=1, input_height=32, input_width=64,
             fuse_method="mean", target_model_name="U",
             ckpt_timelabel="shcache", effective_batch=8, log_every=0,
             mesh_shape={"data": 8}, use_pallas=False)
    p = tmp_path / "config.yaml"
    p.write_text(yaml.dump(d))
    main([str(p), "--ckpt-root", str(tmp_path / "ckpt")])
    out = capsys.readouterr().out
    assert "train cache sharded over 8 devices" in out
    run_dir = tmp_path / "ckpt" / "BraTS" / "MultimodalModel" / "shcache"
    assert (run_dir / "model_best.ckpt").exists()
    # two epochs of finite losses in stat.csv
    rows = [l for l in open(run_dir / "stat.csv").readlines()[1:]
            if l.split(",")[1].startswith("epoch")]
    assert len(rows) == 2
    assert all(np.isfinite(float(r.split(",")[4])) for r in rows)


def test_sharded_eval_loader_exact_coverage(env):
    """ShardedEvalBatchLoader (VERDICT r4 item 7): every (subj, slice)
    sample appears exactly once with valid=1; padding rows carry valid=0
    AND mask=0 (so mask-gated losses already exclude them)."""
    from representation_disentanglement_tpu.data.device_store import (
        ShardedEvalBatchLoader)
    mesh, rep, sh, subjs, idxs = _caches(env, 8)
    loader = ShardedEvalBatchLoader(sh, subjs, idxs, batch_size=8)
    seen = []
    for batch in loader:
        v = np.asarray(batch["valid"])
        mask = np.asarray(batch["mask"])
        # padding rows: all-modalities-missing
        assert np.all(mask[~v] == 0.0)
        # real rows keep presence
        assert np.all(mask[v].sum(1) > 0)
        for ok, s, i in zip(v, batch["subj_id"],
                            np.asarray(batch["slice_idx"])):
            if ok:
                seen.append((s, int(i)))
    b = sh.block_size
    D = sh.vols.shape[3]
    hi = min(sh.clamp_hi - b, D - b - 1)
    want = sorted((str(s), int(np.clip(i, b, hi)))
                  for s, i in zip(subjs, idxs))
    assert sorted(seen) == want


@pytest.mark.slow
def test_sharded_eval_matches_replicated(env, tmp_path):
    """evaluate() over the sharded eval cache == over the replicated cache:
    identical per-row dump tensors keyed by (subj, slice) and matching
    aggregate metrics.  Stricter than the train equivalence (eval is
    deterministic); the stale iter-0 y dump is composition-dependent by
    reference design (src/main_missing.py:435-443) and is excluded."""
    from tests.test_train import tiny_cfg
    from representation_disentanglement_tpu.data.device_store import (
        DeviceBatchLoader, ShardedEvalBatchLoader)
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.evaluate import evaluate
    from representation_disentanglement_tpu.training.train import (
        create_train_state)

    mesh, rep, sh, subjs, idxs = _caches(env, 8)
    cfg = tiny_cfg(batch_size=8, effective_batch=8)
    model = build_model(cfg)
    rep_loader = DeviceBatchLoader(rep, subjs, idxs, cfg.batch_size)
    sh_loader = ShardedEvalBatchLoader(sh, subjs, idxs, cfg.batch_size)
    sample = next(iter(rep_loader))
    sample = {k: sample[k] for k in ("inputs", "targets", "mask",
                                     "mask_img")}
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), sample)

    stats = {}
    for tag, loader, m in (("rep", rep_loader, None),
                           ("sh", sh_loader, mesh)):
        cfg.ckpt_path = str(tmp_path / tag)
        stats[tag] = evaluate(model, state.params, state.batch_stats, cfg,
                              loader, phase="test", set_name="test",
                              save_res=True, mesh=m,
                              sim_rng=np.random.default_rng(10))

    def rows(tag):
        with h5py.File(tmp_path / tag / "result_test" /
                       "results_all.h5", "r") as f:
            keys = [(s.decode(), int(i)) for s, i in
                    zip(f["subj_id"][:], f["slice_idx"][:])]
            data = {k: np.asarray(f[k]) for k in
                    ("inputs", "targets", "mask", "xi_fake_list",
                     "xi_fake_mix", "s_list", "z_list")}
        return keys, data

    krep, drep = rows("rep")
    ksh, dsh = rows("sh")
    assert sorted(krep) == sorted(ksh)
    # row permutation sharded -> replicated
    pos = {k: i for i, k in enumerate(krep)}
    perm = np.asarray([pos[k] for k in ksh])
    for name in drep:
        np.testing.assert_allclose(dsh[name], drep[name][perm], atol=1e-5,
                                   err_msg=name)
    # aggregate metrics match (same per-sample values, summation order
    # aside); composition-dependent sim losses are excluded by checking
    # the metric keys only
    for k in ("psnr", "ssim", "rmse"):
        np.testing.assert_allclose(stats["sh"][k], stats["rep"][k],
                                   rtol=1e-5, err_msg=k)
