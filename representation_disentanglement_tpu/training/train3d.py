"""Training driver for the whole-volume 3D path (NVNet3D).

The reference ships the NVNet3D modules (src/model.py:1856-2060) and the 3D
datasets (src/util.py:723-843) but NO driver (SURVEY §2.6); this provides
one with the standard Myronenko recipe: soft-dice segmentation + VAE L2
reconstruction + KL regularization, Adam, data-parallel over the mesh.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from representation_disentanglement_tpu.models.unet3d import (
    NVNet3D, nvnet_loss)
from representation_disentanglement_tpu.training.optim import (
    adam_amsgrad_torch, clip_global_norm)


class Train3DState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_state_3d(model: NVNet3D, rng, sample_inputs,
                    weight_decay: float = 1e-5):
    # one jitted init = one backend compile instead of one per op
    variables = jax.jit(lambda r: model.init(
        {"params": r}, sample_inputs, train=False))(rng)
    tx = adam_amsgrad_torch(weight_decay=weight_decay)
    return Train3DState(variables["params"], tx.init(variables["params"]),
                        jnp.zeros([], jnp.int32)), tx


def make_train_step_3d(model: NVNet3D, tx, clip_norm: float = 1.0,
                       kl_weight: float = 0.1, recon_weight: float = 0.1,
                       donate: bool = True):
    def loss_fn(params, batch, rng):
        uout, vout, mu, logvar = model.apply(
            {"params": params}, batch["inputs"], train=True, rng=rng)
        loss, aux = nvnet_loss(uout, vout, mu, logvar, batch["targets"],
                               batch["inputs"], kl_weight, recon_weight)
        return loss, aux

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: Train3DState, batch, rng, lr):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        grads, gnorm = clip_global_norm(grads, clip_norm)
        updates, opt_state = tx.update(grads, state.opt_state, state.params,
                                       learning_rate=lr)
        params = jax.tree.map(jnp.add, state.params, updates)
        metrics = dict(aux, loss=loss, grad_norm=gnorm)
        return Train3DState(params, opt_state, state.step + 1), metrics

    return step


def make_eval_step_3d(model: NVNet3D):
    @jax.jit
    def step(params, inputs):
        uout, vout, mu, logvar = model.apply({"params": params}, inputs,
                                             train=False)
        return jax.nn.sigmoid(uout), vout
    return step
