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
