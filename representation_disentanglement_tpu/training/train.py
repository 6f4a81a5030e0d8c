"""Jitted training step with reference-exact gradient-accumulation semantics.

Reference loop (src/main_missing.py:141-335): per data iteration it runs the
4 forward stages, assembles the 10-term weighted loss, ``backward()``s into
accumulated ``.grad``, clips the ACCUMULATED gradient to global-norm 1.0
every iteration, and steps Adam every ``16 // batch_size`` iterations
(+ an alternating discriminator step on the last iteration's d-loss).

Here one ``train_step`` consumes all A = effective_batch // batch_size
microbatches at once (stacked on a leading axis), unrolled inside one jit:

    for a in range(A):  g_acc = clip(g_acc + grad(microbatch_a))
    params <- adam_amsgrad(g_acc)
    [if adv] params <- adam_d(d_grads of last microbatch)   # quirk Q3: over
                                                            # ALL params

BatchNorm statistics thread through the microbatches in order, matching the
reference's sequential updates.  ``compute_y`` mirrors the reference's
"decode y only at iter 0 unless y-losses are on" optimization
(src/main_missing.py:182-190) — it only affects which BN stats get touched
when the y-loss weights are zero.

The learning rate is a traced argument so the host-side plateau scheduler
(training/optim.ReduceLROnPlateau) never recompiles the step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from representation_disentanglement_tpu import losses as L
from representation_disentanglement_tpu.training.optim import (
    adam_amsgrad_torch, clip_global_norm)

LOSS_KEYS = ("recon_y", "recon_y_fused", "recon_x", "recon_x_mix", "kl",
             "latent_z", "sim_s", "sim_z", "adv_s", "adv_s_d", "all")


@functools.lru_cache(maxsize=2)
def _vgg_constants_cached(npz_path: str):
    from representation_disentanglement_tpu.models.vgg import load_vgg_npz
    return {k: jnp.asarray(v) for k, v in load_vgg_npz(npz_path).items()}


def load_vgg_constants(cfg):
    """Frozen VGG16 feature weights for the perceptual / vgg-compact sim-s
    paths (ref loads pretrained torchvision VGG16, src/model.py:2945-2949).
    Returns None when the config doesn't use them.  Cached per path so the
    train/epoch/eval/retrieval consumers share one host load + upload
    (the ~59MB of weights do still get embedded as constants in each jitted
    executable that closes over them — acceptable for the gated configs)."""
    if cfg.s_sim_method != "perceptual" and cfg.s_compact_method != "vgg":
        return None
    return _vgg_constants_cached(cfg.vgg_npz)


def make_vgg_ctx(params, vgg_constants):
    """Bundle the trained vgg_pre projection (model params) with the frozen
    VGG16 weights for the loss functions."""
    if vgg_constants is None:
        return None
    return {"pre_kernel": params["vgg_pre_kernel"],
            "pre_bias": params["vgg_pre_bias"],
            "vgg_params": vgg_constants}


def assemble_losses(cfg, batch, out, sim_pair, adv_pair=None,
                    d_logits=None, vgg_ctx=None) -> Dict[str, jnp.ndarray]:
    """Weighted loss assembly (src/main_missing.py:192-251)."""
    x = batch["inputs"]
    mask = batch["mask"]
    targets = batch["targets"]
    M = x.shape[0]
    grid = out["x_fake_grid"]
    diag = grid[jnp.arange(M), jnp.arange(M)]
    zero = jnp.float32(0.0)
    l: Dict[str, jnp.ndarray] = {k: zero for k in LOSS_KEYS}
    total = zero

    if cfg.lambda_recon_y > 0:
        if cfg.dataset_name == "BraTS":
            l["recon_y"] = L.segmentation_loss_y_list(
                targets, out["y_fake_list"], mask)
        else:
            l["recon_y"] = L.recon_loss_y_list(
                targets, out["y_fake_list"], mask, p=cfg.p)
        total += cfg.lambda_recon_y * l["recon_y"]
    if cfg.lambda_recon_y_fused > 0:
        if cfg.dataset_name == "BraTS":
            l["recon_y_fused"] = L.segmentation_loss_y(
                targets, out["y_fake_fused"])
        else:
            l["recon_y_fused"] = L.recon_loss_y(
                targets, out["y_fake_fused"], p=cfg.p)
        total += cfg.lambda_recon_y_fused * l["recon_y_fused"]
    if cfg.lambda_recon_x > 0:
        l["recon_x"] = L.recon_loss_x(x, diag, mask, p=cfg.p)
        total += cfg.lambda_recon_x * l["recon_x"]
    if cfg.lambda_recon_x_mix > 0:
        l["recon_x_mix"] = L.recon_loss_x_mix(x, grid, mask, p=cfg.p)
        total += cfg.lambda_recon_x_mix * l["recon_x_mix"]
    if cfg.lambda_kl > 0:
        if cfg.is_distri_z:
            pm, pv = out["z_prior"]
            l["kl"] = L.kl_loss_two_gaussian_list(
                out["z_mean"], out["z_log_var"], pm, pv, mask)
        else:
            l["kl"] = L.kl_loss_standard_list(
                out["z_mean"], out["z_log_var"], mask)
        total += cfg.lambda_kl * l["kl"]
    if cfg.lambda_latent_z > 0:
        l["latent_z"] = L.latent_z_loss(out["z_mean"], out["z_mean_new"],
                                        mask)
        total += cfg.lambda_latent_z * l["latent_z"]
    if cfg.lambda_sim_s > 0:
        l["sim_s"] = L.similarity_s_loss(
            out["s"], mask, sim_pair, compact_method=cfg.s_compact_method,
            sim_method=cfg.s_sim_method, vgg_ctx=vgg_ctx)
        total += cfg.lambda_sim_s * l["sim_s"]
    if cfg.lambda_sim_z > 0:
        l["sim_z"] = L.similarity_z_loss(out["z"], mask)
        total += cfg.lambda_sim_z * l["sim_z"]
    if cfg.lambda_adv_s > 0 and d_logits is not None:
        mask_pair = jnp.take(mask, adv_pair, axis=1).T          # [2, B]
        d_loss, g_loss = L.adversarial_loss(d_logits, mask_pair)
        l["adv_s"], l["adv_s_d"] = g_loss, d_loss
        total += cfg.lambda_adv_s * g_loss
    l["all"] = total
    return l


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    opt_d_state: Any          # discriminator Adam (quirk Q3: over all params)
    d_carry: Any = ()         # quirk Q10: the reference's D-step backward
                              # leaves d-grads in .grad AFTER zero_grad, so
                              # they leak into the next accumulation window
                              # (main_missing.py:286-289); carried here.
                              # Deliberately NOT checkpointed: torch resume
                              # also restarts with .grad = None.


def create_train_state(model, cfg, rng, sample_batch) -> Tuple[TrainState, Any]:
    # jit the whole init: unjitted flax init runs op-by-op, which costs one
    # backend compilation per op (hundreds of round trips through a remote-
    # compile tunnel); one traced program initializes in a single compile
    variables = jax.jit(lambda r: model.init(
        {"params": r}, sample_batch["inputs"], sample_batch["mask"],
        sample_batch["mask_img"], jax.random.PRNGKey(0), train=False,
        # the discriminator branch only runs when a pair is given, so the
        # adversarial config must init with one or discrim params are missing
        adv_pair=jnp.asarray([0, 1]) if cfg.is_discrim_s else None))(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = adam_amsgrad_torch(weight_decay=cfg.weight_decay)
    tx_d = adam_amsgrad_torch(weight_decay=0.0)  # main_missing.py:122: no wd
    opt_state = tx.init(params)
    opt_d_state = tx_d.init(params) if cfg.is_discrim_s else ()
    d_carry = jax.tree.map(jnp.zeros_like, params) if cfg.is_discrim_s else ()
    return (TrainState(params, batch_stats, opt_state, opt_d_state, d_carry),
            (tx, tx_d))


STAGE1_ROOTS = ("anatomy_encoder_enc", "anatomy_encoder_dec",
                "modality_encoder", "input_decoder", "input_decoder_shared",
                "input_decoder_notshared")


def is_stage1_param(root: str) -> bool:
    # prefix match: the 'loop' decoder impl names its halves
    # input_decoder_notshared_<i>
    return any(root == r or root.startswith(r + "_") for r in STAGE1_ROOTS)


def freeze_stage1_grads(grads):
    """Two-stage training: zero stage-1 submodule grads when
    fix_pretrain + continue_train (src/main_missing.py:104-116)."""
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat = flatten_dict(grads)
    out = {k: (jnp.zeros_like(v) if is_stage1_param(k[0]) else v)
           for k, v in flat.items()}
    return unflatten_dict(out)


def make_train_step(model, cfg, txs, donate: bool = True):
    tx, tx_d = txs
    n_micro = max(cfg.effective_batch // cfg.batch_size, 1)
    needs_y = cfg.lambda_recon_y > 0 or cfg.lambda_recon_y_fused > 0
    freeze = cfg.fix_pretrain and cfg.continue_train
    vgg_constants = load_vgg_constants(cfg)

    cast = (lambda mb: dict(mb, inputs=mb["inputs"].astype(jnp.bfloat16))) \
        if cfg.compute_dtype == "bfloat16" else (lambda mb: mb)

    def loss_fn(params, batch_stats, mb, rng, sim_pair, adv_pair,
                compute_y: bool):
        mb = cast(mb)
        out, muts = model.apply(
            {"params": params, "batch_stats": batch_stats},
            mb["inputs"], mb["mask"], mb["mask_img"], rng, train=True,
            compute_y=compute_y, latent_cycle=cfg.lambda_latent_z > 0,
            adv_pair=adv_pair if cfg.is_discrim_s else None,
            mutable=["batch_stats"])
        l = assemble_losses(cfg, mb, out, sim_pair, adv_pair,
                            out.get("d_logits"),
                            vgg_ctx=make_vgg_ctx(params, vgg_constants))
        return l["all"], (l, muts["batch_stats"])

    def d_loss_fn(params, batch_stats, mb, rng, adv_pair):
        """Discriminator loss only, grads wrt ALL params (quirk Q3)."""
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            mb["inputs"], mb["mask"], mb["mask_img"], rng, train=True,
            compute_y=False, latent_cycle=False, adv_pair=adv_pair,
            mutable=["batch_stats"])
        mask_pair = jnp.take(mb["mask"], adv_pair, axis=1).T
        d_loss, _ = L.adversarial_loss(out["d_logits"], mask_pair)
        return d_loss

    @functools.partial(jax.jit, static_argnames=("first_of_epoch",),
                       donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, microbatches, rngs, sim_pairs,
                   adv_pairs, lr, first_of_epoch: bool = False):
        params, batch_stats = state.params, state.batch_stats
        if cfg.is_discrim_s:
            # quirk Q10: the previous window's d-grads are still in .grad
            g_acc = jax.tree.map(jnp.asarray, state.d_carry)
        else:
            g_acc = jax.tree.map(jnp.zeros_like, params)
        loss_sums = {k: jnp.float32(0.0) for k in LOSS_KEYS}
        grad_norm = jnp.float32(0.0)

        mb_a = lambda a: jax.tree.map(lambda v: v[a], microbatches)
        for a in range(n_micro):
            mb = mb_a(a)
            compute_y = needs_y or (first_of_epoch and a == 0)
            (loss, (l, batch_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                params, batch_stats, mb, rngs[a], sim_pairs[a], adv_pairs[a],
                compute_y)
            if freeze:
                # frozen params never receive grads in torch, so they are
                # excluded from the clip norm too (main_missing.py:104-116,
                # 272) — mask BEFORE accumulate+clip
                grads = freeze_stage1_grads(grads)
            g_acc = jax.tree.map(jnp.add, g_acc, grads)
            # reference clips the ACCUMULATED grad every iteration
            # (main_missing.py:272, clip of clip(g1)+g2)
            g_acc, grad_norm = clip_global_norm(g_acc, cfg.grad_clip_norm)
            loss_sums = {k: loss_sums[k] + l[k] for k in LOSS_KEYS}

        if cfg.is_discrim_s:
            d_grads = jax.grad(d_loss_fn)(
                params, batch_stats, mb_a(n_micro - 1), rngs[n_micro - 1],
                adv_pairs[n_micro - 1])
            if freeze:
                d_grads = freeze_stage1_grads(d_grads)

        updates, opt_state = tx.update(g_acc, state.opt_state, params,
                                       learning_rate=lr)
        if freeze:
            # torch skips frozen params entirely (no grad -> no wd either)
            updates = freeze_stage1_grads(updates)
        params = jax.tree.map(jnp.add, params, updates)

        opt_d_state, d_carry = state.opt_d_state, state.d_carry
        if cfg.is_discrim_s:
            # torch order: d-grads at pre-step params, applied after the
            # main step (main_missing.py:286-289)
            d_updates, opt_d_state = tx_d.update(
                d_grads, state.opt_d_state, params, learning_rate=lr)
            if freeze:
                d_updates = freeze_stage1_grads(d_updates)
            params = jax.tree.map(jnp.add, params, d_updates)
            d_carry = d_grads

        new_state = TrainState(params, batch_stats, opt_state, opt_d_state,
                               d_carry)
        # ONE stacked vector instead of a dict of scalars: fetching a dict
        # costs one host<->device roundtrip per leaf (the reference syncs 11
        # scalars per iteration, main_missing.py:253-263; over the TPU
        # tunnel that dominated real step time)
        metrics = jnp.stack([loss_sums[k] for k in LOSS_KEYS] + [grad_norm])
        return new_state, metrics

    return train_step, n_micro


METRIC_KEYS = LOSS_KEYS + ("grad_norm",)


def metrics_to_dict(vec) -> Dict[str, float]:
    import numpy as _np
    vals = _np.asarray(vec)
    return {k: float(v) for k, v in zip(METRIC_KEYS, vals)}


def draw_pairs(rng: np.random.Generator, modality_num: int, n: int):
    """Host-side random (i, j) pair choice per microbatch, mirroring the
    reference's numpy RNG use (src/model.py:3485, 3564)."""
    if modality_num == 2:
        return np.tile(np.array([0, 1], np.int32), (n, 1))
    out = np.stack([rng.choice(modality_num, 2, replace=False)
                    for _ in range(n)]).astype(np.int32)
    return out
