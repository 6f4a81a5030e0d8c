"""3D training driver: loss decreases over a few steps."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.unet3d import NVNet3D
from representation_disentanglement_tpu.training.train3d import (
    create_state_3d, make_eval_step_3d, make_train_step_3d)


@pytest.mark.slow
def test_train3d_loss_decreases(rng):
    D, H, W = 16, 32, 32
    model = NVNet3D(input_shape=(D, H, W), in_channels=2, out_channels=3,
                    init_channels=8, dropout_p=0.0)
    x = jnp.asarray(rng.normal(size=(2, D, H, W, 2)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 4, size=(2, D, H, W, 1)).astype(
        np.float32))
    batch = {"inputs": x, "targets": seg}
    state, tx = create_state_3d(model, jax.random.PRNGKey(0), x)
    step = make_train_step_3d(model, tx, donate=False)
    losses = []
    for i in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(i),
                        jnp.float32(1e-3))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    ev = make_eval_step_3d(model)
    probs, vout = ev(state.params, x)
    assert probs.shape == (2, D, H, W, 3)
    assert float(probs.min()) >= 0 and float(probs.max()) <= 1
