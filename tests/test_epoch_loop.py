"""Epoch-on-device loop coverage (VERDICT r3 item 3).

(b) make_train_epoch now runs the adversarial (d_carry + pre-step d-grads
    over ALL params, quirks Q3/Q10) and the stage-2-freeze
    (main_missing.py:104-116) configs inside the ``lax.scan`` body: each
    must reproduce the per-step ``make_train_step`` trajectory on the same
    epoch plan.
(a) chunked dispatch: splitting the plan into K-step segments (with the
    iter-0 y decode only in the first segment) equals the single dispatch,
    so the driver's between-segment preemption poll costs nothing
    semantically.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

from tests.test_train import tiny_cfg  # noqa: E402
from representation_disentanglement_tpu.data.device_store import (  # noqa: E402
    DeviceBatchLoader, build_device_cache, gather_blocks)
from representation_disentanglement_tpu.data.dataset import (  # noqa: E402
    VolumeStore, load_idx_list)
from representation_disentanglement_tpu.data.synthetic import (  # noqa: E402
    make_synthetic_dataset)
from representation_disentanglement_tpu.main_missing import (  # noqa: E402
    build_model)
from representation_disentanglement_tpu.training.epoch import (  # noqa: E402
    epoch_indices, make_train_epoch)
from representation_disentanglement_tpu.training.train import (  # noqa: E402
    create_train_state, make_train_step)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("epochloop")
    make_synthetic_dataset(str(d), "BraTS", ("T1", "T2"), "z-score",
                           n_subj=6, shape=(32, 64, 16), slice_range=(4, 12))
    store = VolumeStore(f"{d}/BraTS_All_zscore_10.h5")
    subjs, idxs = load_idx_list(f"{d}/fold_BraTS_0_train_noval.txt")
    return store, subjs, idxs


def _setup(env, **cfg_kw):
    store, subjs, idxs = env
    cfg = tiny_cfg(batch_size=2, effective_batch=4, **cfg_kw)
    cache = build_device_cache("BraTS", store, subjs, ("T1", "T2"),
                               block_size=3, dtype=jnp.float32,
                               clamp_max=155)
    loader = DeviceBatchLoader(cache, subjs, idxs, cfg.batch_size,
                               shuffle=True, drop_last=True, seed=3)
    model = build_model(cfg)
    sample = gather_blocks(cache.vols, cache.tgts, cache.presence,
                           jnp.asarray(loader.rows[:cfg.batch_size]),
                           jnp.asarray(loader.slices[:cfg.batch_size]),
                           jnp.ones((cfg.batch_size, 2), jnp.float32),
                           block_size=3)
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                    sample)
    return cfg, cache, loader, model, state, txs


def _run_per_step(cfg, cache, model, state, txs, plan, n_steps_cap=None):
    """Drive make_train_step over the SAME epoch plan the scan consumes."""
    step_fn, n_micro = make_train_step(model, cfg, txs, donate=False)
    rows, slices, drop, rng_keys, sim, adv = plan
    n_steps = rows.shape[0] if n_steps_cap is None else n_steps_cap
    metrics = []
    for i in range(int(n_steps)):
        mbs = [gather_blocks(cache.vols, cache.tgts, cache.presence,
                             rows[i, a], slices[i, a], drop[i, a],
                             block_size=cache.block_size)
               for a in range(n_micro)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *mbs)
        rngs = jax.random.split(rng_keys[i], n_micro)
        state, m = step_fn(state, stacked, rngs, sim[i], adv[i],
                           jnp.float32(cfg.lr), first_of_epoch=(i == 0))
        metrics.append(np.asarray(m))
    return state, np.stack(metrics)


def _assert_states_close(s1, s2, atol):
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=atol)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["adversarial", "stage2_freeze"])
def test_epoch_loop_matches_per_step(env, variant):
    kw = {"lambda_adv_s": 0.1} if variant == "adversarial" else \
        {"fix_pretrain": True, "continue_train": True}
    cfg, cache, loader, model, state, txs = _setup(env, **kw)
    pair_rng = np.random.default_rng(cfg.seed)
    plan, _ = epoch_indices(loader, 2, cfg.modality_num, pair_rng,
                            jax.random.PRNGKey(cfg.seed))
    assert plan is not None

    train_epoch, n_micro = make_train_epoch(model, cfg, txs, cache,
                                            donate=False)
    s_scan, m_scan = train_epoch(state, *plan, jnp.float32(cfg.lr),
                                 jnp.asarray(True))
    s_step, m_step = _run_per_step(cfg, cache, model, state, txs, plan)

    np.testing.assert_allclose(np.asarray(m_scan), m_step, rtol=2e-4,
                               atol=1e-5)
    _assert_states_close(s_scan, s_step, atol=5e-5)

    if variant == "stage2_freeze":
        # frozen stage-1 params are bit-identical to the initial state
        from flax.traverse_util import flatten_dict
        from representation_disentanglement_tpu.training.train import (
            is_stage1_param)
        f0 = flatten_dict(state.params)
        f1 = flatten_dict(s_scan.params)
        n_frozen = 0
        for k in f0:
            if is_stage1_param(k[0]):
                np.testing.assert_array_equal(np.asarray(f0[k]),
                                              np.asarray(f1[k]))
                n_frozen += 1
        assert n_frozen > 0
    else:
        # the d-carry leaked into the scan state like the per-step loop's
        assert jax.tree.leaves(s_scan.d_carry)
        for a, b in zip(jax.tree.leaves(s_scan.d_carry),
                        jax.tree.leaves(s_step.d_carry)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32), atol=5e-5)


@pytest.mark.slow
def test_epoch_loop_chunked_matches_whole(env):
    cfg, cache, loader, model, state, txs = _setup(env)
    pair_rng = np.random.default_rng(cfg.seed)
    plan, _ = epoch_indices(loader, 2, cfg.modality_num, pair_rng,
                            jax.random.PRNGKey(cfg.seed))
    n_steps = int(plan[0].shape[0])
    assert n_steps >= 2

    train_epoch, _ = make_train_epoch(model, cfg, txs, cache, donate=False)
    s_whole, m_whole = train_epoch(state, *plan, jnp.float32(cfg.lr),
                                   jnp.asarray(True))

    k = n_steps // 2
    chunk = lambda lo, hi: tuple(p[lo:hi] for p in plan)
    s_c, m1 = train_epoch(state, *chunk(0, k), jnp.float32(cfg.lr),
                          jnp.asarray(True))
    s_c, m2 = train_epoch(s_c, *chunk(k, n_steps), jnp.float32(cfg.lr),
                          jnp.asarray(False))   # NOT the epoch's iter 0
    m_chunks = np.concatenate([np.asarray(m1), np.asarray(m2)], 0)

    np.testing.assert_allclose(m_chunks, np.asarray(m_whole), rtol=1e-5,
                               atol=1e-6)
    _assert_states_close(s_whole, s_c, atol=1e-6)
