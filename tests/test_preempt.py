"""Preemption-safe training (utils/preempt.py): guard signal semantics,
resume-source selection, and a mid-epoch preempt -> resume round trip
through the real per-step train loop.

The reference has no preemption story (a kill loses everything since the
last end-of-epoch save, src/main_missing.py:326-335); this is the TPU
framework's SURVEY §5.3 elastic-recovery subsystem.
"""

import os
import signal

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.training.checkpoint import (
    load_checkpoint, save_checkpoint)
from representation_disentanglement_tpu.utils.preempt import (
    PREEMPT_NAME, PreemptionGuard, clear_stale_preempt,
    latest_resume_checkpoint, preempt_path)


def test_guard_catches_signal_and_restores_handlers():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.requested                       # flag, not termination
    assert signal.getsignal(signal.SIGTERM) is prev


def test_guard_programmatic_request():
    g = PreemptionGuard()
    assert not g.requested
    g.request()
    assert g.requested


def _mini_ckpt(path, name, epoch):
    save_checkpoint({"epoch": epoch, "params": {"w": np.zeros(2)}},
                    False, path, name=name)


def test_latest_resume_prefers_newer_preempt(tmp_path):
    d = str(tmp_path)
    # no preempt file -> named checkpoint, nothing loaded
    name, pre = latest_resume_checkpoint(d, "model_best.ckpt")
    assert name == "model_best.ckpt" and pre is None

    # preempt newer than named -> preempt wins
    _mini_ckpt(d, "model_best.ckpt", epoch=3)
    _mini_ckpt(d, PREEMPT_NAME, epoch=5)
    name, pre = latest_resume_checkpoint(d, "model_best.ckpt")
    assert name == PREEMPT_NAME and int(pre["epoch"]) == 5

    # named newer than preempt (stale preempt) -> named wins
    _mini_ckpt(d, PREEMPT_NAME, epoch=1)
    name, pre = latest_resume_checkpoint(d, "model_best.ckpt")
    assert name == "model_best.ckpt" and int(pre["epoch"]) == 3

    # preempt present, named absent -> preempt
    os.remove(os.path.join(d, "model_best.ckpt"))
    name, pre = latest_resume_checkpoint(d, "model_best.ckpt")
    assert name == PREEMPT_NAME

    # epoch TIE keeps the preempt file: latest_resume_checkpoint prefers it
    # on a tie (partial-epoch progress), so deletion needs a strictly newer
    # regular checkpoint (ADVICE r3)
    clear_stale_preempt(d, 1)
    assert os.path.exists(preempt_path(d))
    clear_stale_preempt(d, 2)
    assert not os.path.exists(preempt_path(d))
    clear_stale_preempt(d, 2)                    # idempotent on missing


def test_preempt_epoch_fails_closed_and_sidecar_atomic(tmp_path):
    """A preempt.ckpt whose epoch cannot be read must NOT be treated as
    ancient (fail-open deletion); the sidecar tag is written atomically and
    droppable before a new save (ADVICE r3)."""
    from representation_disentanglement_tpu.utils.preempt import (
        _preempt_epoch, drop_preempt_sidecar, tag_preempt_epoch)
    d = str(tmp_path)
    # corrupt checkpoint, no sidecar -> sentinel that blocks deletion
    with open(preempt_path(d), "wb") as f:
        f.write(b"not a checkpoint")
    assert _preempt_epoch(d) > 10**9
    clear_stale_preempt(d, 999)                  # must refuse to delete
    assert os.path.exists(preempt_path(d))
    # sidecar supplies the tag; drop_preempt_sidecar falls back to slow path
    tag_preempt_epoch(d, 7)
    assert _preempt_epoch(d) == 7
    assert not os.path.exists(preempt_path(d) + ".epoch.tmp")  # tmp+rename
    drop_preempt_sidecar(d)
    assert _preempt_epoch(d) > 10**9             # corrupt ckpt, fail closed
    # with a valid checkpoint the tie-keep/strictly-newer-delete rule holds
    _mini_ckpt(d, PREEMPT_NAME, epoch=4)
    clear_stale_preempt(d, 4)
    assert os.path.exists(preempt_path(d))
    clear_stale_preempt(d, 5)
    assert not os.path.exists(preempt_path(d))


@pytest.mark.slow
def test_train_loop_preempts_and_resumes(tmp_path, rng, capsys):
    """A requested guard makes the per-step loop save preempt.ckpt after
    the in-flight optimizer step and return; the resume protocol then picks
    that file and restores the live state bit-for-bit."""
    from tests.test_train import synth_batch, tiny_cfg
    from representation_disentanglement_tpu.main_missing import (
        build_model, train)
    from representation_disentanglement_tpu.training.optim import (
        ReduceLROnPlateau)
    from representation_disentanglement_tpu.training.checkpoint import (
        restore_model_state)
    from representation_disentanglement_tpu.training.train import (
        create_train_state)

    cfg = tiny_cfg(batch_size=2, effective_batch=2, epochs=3, log_every=0)
    cfg.ckpt_path = str(tmp_path)
    model = build_model(cfg)
    b0 = synth_batch(cfg, rng)
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(0), b0)

    batches = [{k: np.asarray(v) for k, v in synth_batch(cfg, rng).items()}
               for _ in range(4)]
    guard = PreemptionGuard()
    guard.request()                               # preempt before step 1
    out_state = train(cfg, model, state, txs, (batches, None, None),
                      start_epoch=-1, scheduler=ReduceLROnPlateau(cfg.lr),
                      guard=guard)
    assert "[preempt] saved" in capsys.readouterr().out
    assert os.path.exists(preempt_path(cfg.ckpt_path))

    # resume source selection picks the preempt file, tagged with the last
    # COMPLETED epoch (-1: epoch 0 was interrupted and must replay)
    name, pre = latest_resume_checkpoint(cfg.ckpt_path, "model_best.ckpt")
    assert name == PREEMPT_NAME and int(pre["epoch"]) == -1

    # restored params == the live post-step params (exact round trip)
    fresh_state, _txs = create_train_state(model, cfg,
                                           jax.random.PRNGKey(0), b0)
    ckpt, params, bstats, n_res, n_tot = restore_model_state(
        fresh_state.params, fresh_state.batch_stats, cfg.ckpt_path, name)
    assert n_res == n_tot
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, out_state.params)


@pytest.mark.slow
def test_epoch_loop_preempts_mid_epoch(tmp_path, rng, capsys):
    """Chunked epoch-on-device dispatch (VERDICT r3 item 3a): with
    epoch_chunk_steps=1 a guard request after the first segment persists
    preempt.ckpt mid-epoch instead of losing the whole epoch, and the
    resume protocol picks it (tagged with the last COMPLETED epoch)."""
    h5py = pytest.importorskip("h5py")
    from tests.test_train import tiny_cfg
    from representation_disentanglement_tpu.data.dataset import (
        VolumeStore, load_idx_list)
    from representation_disentanglement_tpu.data.device_store import (
        DeviceBatchLoader, build_device_cache, gather_blocks)
    from representation_disentanglement_tpu.data.synthetic import (
        make_synthetic_dataset)
    from representation_disentanglement_tpu.main_missing import (
        build_model, train)
    from representation_disentanglement_tpu.training.optim import (
        ReduceLROnPlateau)
    from representation_disentanglement_tpu.training.train import (
        create_train_state)

    d = str(tmp_path / "data")
    make_synthetic_dataset(d, "BraTS", ("T1", "T2"), "z-score", n_subj=6,
                           shape=(32, 64, 16), slice_range=(4, 12))
    store = VolumeStore(f"{d}/BraTS_All_zscore_10.h5")
    subjs, idxs = load_idx_list(f"{d}/fold_BraTS_0_train_noval.txt")
    cfg = tiny_cfg(batch_size=2, effective_batch=2, epochs=3, log_every=0,
                   epoch_chunk_steps=1)
    cfg.ckpt_path = str(tmp_path / "run")
    os.makedirs(cfg.ckpt_path, exist_ok=True)
    cache = build_device_cache("BraTS", store, subjs, ("T1", "T2"),
                               block_size=3, clamp_max=155)
    loader = DeviceBatchLoader(cache, subjs, idxs, cfg.batch_size,
                               shuffle=True, drop_last=True, seed=3)
    assert len(loader.rows) // cfg.batch_size >= 2   # >= 2 one-step chunks

    model = build_model(cfg)
    sample = gather_blocks(cache.vols, cache.tgts, cache.presence,
                           jnp.asarray(loader.rows[:2]),
                           jnp.asarray(loader.slices[:2]),
                           jnp.ones((2, 2), jnp.float32), block_size=3)
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                    sample)
    guard = PreemptionGuard()
    guard.request()                          # preempt before the 2nd chunk
    train(cfg, model, state, txs, (loader, None, None), start_epoch=-1,
          scheduler=ReduceLROnPlateau(cfg.lr), guard=guard)
    out = capsys.readouterr().out
    assert "[preempt] saved" in out and "mid-epoch 0 after 1/" in out
    assert os.path.exists(preempt_path(cfg.ckpt_path))
    name, pre = latest_resume_checkpoint(cfg.ckpt_path, "model_best.ckpt")
    assert name == PREEMPT_NAME and int(pre["epoch"]) == -1
