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
                       donate: bool = True, accum: int = 1):
    """Jitted 3D train step.  With ``accum > 1`` the batch dict carries a
    leading microbatch axis [A, ...] and gradients average over the A
    microbatches before the single Adam step (volumes are large — this is
    how effective batch grows without HBM growth)."""
    def loss_fn(params, batch, rng):
        uout, vout, mu, logvar = model.apply(
            {"params": params}, batch["inputs"], train=True, rng=rng)
        loss, aux = nvnet_loss(uout, vout, mu, logvar, batch["targets"],
                               batch["inputs"], kl_weight, recon_weight)
        return loss, aux

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: Train3DState, batch, rng, lr):
        if accum == 1:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng)
        else:
            rngs = jax.random.split(rng, accum)

            def micro(carry, ab):
                mb, r = ab
                (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, mb, r)
                return jax.tree.map(jnp.add, carry, g), (l, a)

            zero = jax.tree.map(jnp.zeros_like, state.params)
            g_sum, (losses, auxes) = jax.lax.scan(
                micro, zero, (batch, rngs))
            grads = jax.tree.map(lambda g: g / accum, g_sum)
            loss = jnp.mean(losses)
            aux = jax.tree.map(jnp.mean, auxes)
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


def make_sharded_train_step_3d(model: NVNet3D, tx, mesh, axis: str = "depth",
                               clip_norm: float = 1.0,
                               kl_weight: float = 0.1,
                               recon_weight: float = 0.1,
                               donate: bool = True,
                               data_axis: str = None):
    """Depth-sharded training step (context parallelism for volumes).

    The volume's D axis shards over the ``axis`` mesh dimension; inside the
    shard_map the conv3d/group_norm/global_mean3d primitives switch to their
    halo-exchange / pmean variants (ops/conv3d.depth_sharded) and nvnet_loss
    reduces globally, so the loss — and, because ppermute/psum transpose
    correctly, the GRADIENT — matches the unsharded step exactly (verified
    one-optimizer-step in tests/test_unet3d.py).  Per-device grads carry
    only the contributions flowing through that device's shard; the psum
    below assembles the total gradient, replicated, and Adam runs
    identically everywhere.

    With ``data_axis`` (a 2D ``parallel.halo.make_volume_mesh`` mesh) the
    batch additionally shards over that axis — composed DP x SP, both
    collectives riding ICI.  The loss reductions (dice num/den psum,
    recon/KL means) extend over the data axis INSIDE nvnet_loss, because
    dice is a nonlinear ratio of batch-pooled sums: averaging per-row
    dices after the fact would optimize a different loss than the
    unsharded step (mean-of-ratios vs ratio-of-sums).
    The VAE eps / dropout rng is folded with the data-row index so samples
    on different rows draw independent noise (rng=None stays deterministic:
    z = mu, no dropout — the equivalence-test oracle)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from representation_disentanglement_tpu.ops.conv3d import depth_sharded

    def loss_fn(params, x_local, t_local, rng):
        with depth_sharded(axis):
            uout, vout, mu, logvar = model.apply(
                {"params": params}, x_local, train=True, rng=rng)
            return nvnet_loss(uout, vout, mu, logvar, t_local, x_local,
                              kl_weight, recon_weight, data_axis=data_axis)

    def local_grads(params, x_local, t_local, rng):
        if rng is not None and data_axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x_local, t_local, rng)
        # with check_rep=False the transpose of the loss's psum/pmean
        # reductions re-broadcasts SUMMED cotangents, so each device's grad
        # is already n_shards * (its share of the total): pmean assembles
        # the exact total gradient (verified vs the unsharded step in
        # tests/test_unet3d.py — a psum here would overcount by n_shards)
        grads = jax.lax.pmean(grads, axis)
        if data_axis is not None:
            # loss/aux are already globally reduced inside nvnet_loss
            # (replicated across rows); only the grads still need the
            # data-axis assembly (pmean over every forward-reduced axis
            # turns the transpose's summed cotangents into exact totals)
            grads = jax.lax.pmean(grads, data_axis)
        return loss, aux, grads

    sharded = shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P(data_axis, axis), P(data_axis, axis), P()),
        out_specs=(P(), P(), P()),
        check_rep=False)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: Train3DState, batch, rng, lr):
        loss, aux, grads = sharded(state.params, batch["inputs"],
                                   batch["targets"], rng)
        grads, gnorm = clip_global_norm(grads, clip_norm)
        updates, opt_state = tx.update(grads, state.opt_state, state.params,
                                       learning_rate=lr)
        params = jax.tree.map(jnp.add, state.params, updates)
        metrics = dict(aux, loss=loss, grad_norm=gnorm)
        return Train3DState(params, opt_state, state.step + 1), metrics

    return step
