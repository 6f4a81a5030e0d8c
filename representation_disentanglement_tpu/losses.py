"""Loss zoo — pure functions, branch-free under jit.

Every loss replicates the reference's mask semantics exactly
(src/model.py:3260-3587): a modality's term only contributes when its mask
column has at least one present sample in the batch, masked means divide by
the mask sum, and the outer average divides by the number of *contributing*
terms.  The reference implements this with Python ``if mask.sum() == 0:
continue`` branches; here it is `where`-gated arithmetic with identical
normalization, so one compiled graph covers every missing-modality pattern.

Layouts: per-modality tensors carry a leading modality axis
(``x: [M, B, H, W, C]``, ``z: [M, B, zdim]``), the decode grid is
``[M_i, M_j, B, H, W, C]``, masks are ``[B, M]``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.ops import avg_pool, max_pool

_EPS_DIV = 1e-12


def _safe_div(num, den):
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


def per_sample_recon(gt: jnp.ndarray, out: jnp.ndarray, p: int):
    """compute_recon_loss (src/model.py:3260-3266): per-sample mean over all
    non-batch dims; batch axis is the LAST leading axis before spatial."""
    diff = gt.astype(jnp.float32) - out.astype(jnp.float32)
    red = tuple(range(gt.ndim - 3, gt.ndim))  # (H, W, C)
    if p == 1:
        return jnp.mean(jnp.abs(diff), axis=red)
    return jnp.mean(jnp.square(diff), axis=red)


def recon_loss_x(gt: jnp.ndarray, x_fake: jnp.ndarray, mask: jnp.ndarray,
                 p: int = 2):
    """compute_recon_loss_x_list (src/model.py:3315-3325).
    gt, x_fake: [M, B, H, W, C]; mask: [B, M]."""
    r = per_sample_recon(gt, x_fake, p)                      # [M, B]
    m = mask.T.astype(jnp.float32)                           # [M, B]
    msum = jnp.sum(m, axis=1)                                # [M]
    per_mod = _safe_div(jnp.sum(m * r, axis=1), msum)        # [M]
    present = (msum > 0).astype(jnp.float32)
    return _safe_div(jnp.sum(per_mod * present), jnp.sum(present))


def recon_loss_x_mix(gt: jnp.ndarray, grid: jnp.ndarray, mask: jnp.ndarray,
                     p: int = 2):
    """compute_recon_loss_x_mix_list (src/model.py:3327-3341).
    grid[i, j] reconstructs modality j from anatomy i; compared to gt[j]
    under mask_i * mask_j, excluding the diagonal.

    Deliberate fix of a reference bug: when a pair's mask product is empty
    the reference ``continue``s WITHOUT advancing its x_list index
    (src/model.py:3335-3338), so every later pair is compared against the
    wrong reconstruction.  Here grid[i, j] always pairs with gt[j]; the
    empty pair simply contributes nothing (identical result whenever no
    modality is absent across the whole batch, i.e. in all of the
    reference's shipped training runs)."""
    M = grid.shape[0]
    r = per_sample_recon(gt[None, :], grid, p)               # [M_i, M_j, B]
    m = mask.T.astype(jnp.float32)                           # [M, B]
    mm = m[:, None, :] * m[None, :, :]                       # [M_i, M_j, B]
    off_diag = (1.0 - jnp.eye(M))[:, :, None]
    mm = mm * off_diag
    mmsum = jnp.sum(mm, axis=2)                              # [M, M]
    per_pair = _safe_div(jnp.sum(mm * r, axis=2), mmsum)
    contributing = (mmsum > 0).astype(jnp.float32)
    return _safe_div(jnp.sum(per_pair * contributing), jnp.sum(contributing))


def recon_loss_y(gt: jnp.ndarray, y: jnp.ndarray, p: int = 2):
    """compute_recon_loss_y (src/model.py:3280-3285)."""
    return jnp.mean(per_sample_recon(gt, y, p))


def recon_loss_y_list(gt: jnp.ndarray, y_list: jnp.ndarray,
                      mask: jnp.ndarray, p: int = 2):
    """compute_recon_loss_y_list (src/model.py:3268-3278).
    gt: [B, H, W, C]; y_list: [M, B, H, W, C]."""
    r = per_sample_recon(gt[None], y_list, p)                # [M, B]
    m = mask.T.astype(jnp.float32)
    msum = jnp.sum(m, axis=1)
    per_mod = _safe_div(jnp.sum(m * r, axis=1), msum)
    present = (msum > 0).astype(jnp.float32)
    return _safe_div(jnp.sum(per_mod * present), jnp.sum(present))


def segmentation_loss_y(gt: jnp.ndarray, y: jnp.ndarray,
                        weight=(1.0, 5.0, 5.0, 5.0)):
    """compute_segmentation_loss_y (src/model.py:3287-3297): torch weighted
    CE (mean divides by the summed per-pixel class weights) + 3-class soft
    Dice on softmax probabilities.

    gt: [B, H, W, 1] float labels; y: [B, H, W, 4] logits."""
    w = jnp.asarray(weight, jnp.float32)
    labels = gt[..., 0].astype(jnp.int32)                    # [B, H, W]
    logp = jax.nn.log_softmax(y.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    wpix = w[labels]
    loss_seg = jnp.sum(wpix * nll) / jnp.sum(wpix)
    y_act = jax.nn.softmax(y.astype(jnp.float32), axis=-1)
    loss_dice = 0.0
    for i in range(1, 4):
        gt_i = (labels == i).astype(jnp.float32)
        num = 2.0 * jnp.sum(y_act[..., i] * gt_i)
        den = jnp.sum(jnp.square(y_act[..., i]) + jnp.square(gt_i))
        loss_dice += 1.0 - num / (den + 1e-6)
    return loss_seg + loss_dice / 3.0


def segmentation_loss_y_list(gt: jnp.ndarray, y_list: jnp.ndarray,
                             mask: jnp.ndarray,
                             weight=(1.0, 5.0, 5.0, 5.0)):
    """compute_segmentation_loss_y_list (src/model.py:3299-3313).  NOTE the
    reference adds each modality's seg loss UNMASKED; the mask only decides
    whether a modality contributes at all."""
    M = y_list.shape[0]
    msum = jnp.sum(mask.astype(jnp.float32), axis=0)         # [M]
    present = (msum > 0).astype(jnp.float32)
    losses = jnp.stack([segmentation_loss_y(gt, y_list[i], weight)
                        for i in range(M)])
    return _safe_div(jnp.sum(losses * present), jnp.sum(present))


def kl_loss_standard_list(z_mean: jnp.ndarray, z_log_var: jnp.ndarray,
                          mask: jnp.ndarray):
    """compute_kl_loss_list_standard (src/model.py:3343-3360): all
    modalities concatenated, one masked mean, divided by M.
    z_mean, z_log_var: [M, B, z]; mask: [B, M]."""
    M = z_mean.shape[0]
    kl = 0.5 * jnp.sum(jnp.exp(z_log_var) + jnp.square(z_mean) - 1.0
                       - z_log_var, axis=-1)                 # [M, B]
    m = mask.T.astype(jnp.float32)
    return _safe_div(jnp.sum(kl * m), jnp.sum(m)) / M


def kl_loss_two_gaussian_list(z_mean, z_log_var, prior_mean, prior_log_var,
                              mask):
    """compute_kl_loss_list_two_gaussian (src/model.py:3372-3382).
    prior_mean/log_var: [M, z] (broadcast over batch)."""
    M = z_mean.shape[0]
    pm = prior_mean[:, None, :]
    pv = prior_log_var[:, None, :]
    kl = 0.5 * (-1.0 + (pv - z_log_var)
                + (jnp.exp(z_log_var) + jnp.square(z_mean - pm))
                / jnp.exp(pv))                               # [M, B, z]
    m = mask.T.astype(jnp.float32)[:, :, None]
    per_mod = _safe_div(jnp.sum(kl * m, axis=(1, 2)),
                        jnp.sum(mask.T.astype(jnp.float32), axis=1))
    return jnp.sum(per_mod) / M


def latent_z_loss(z_mean: jnp.ndarray, z_mean_new: jnp.ndarray,
                  mask: jnp.ndarray):
    """compute_latent_z_loss (src/model.py:3384-3394): masked L1 between the
    original and re-encoded z means; note the divisor is the mask sum, NOT
    mask_sum * z_size (reference parity)."""
    diff = jnp.abs(z_mean.astype(jnp.float32)
                   - z_mean_new.astype(jnp.float32))          # [M, B, z]
    m = mask.T.astype(jnp.float32)
    msum = jnp.sum(m, axis=1)
    per_mod = _safe_div(jnp.sum(diff * m[:, :, None], axis=(1, 2)), msum)
    present = (msum > 0).astype(jnp.float32)
    return _safe_div(jnp.sum(per_mod * present), jnp.sum(present))


# ---------------------------------------------------------------------------
# similarity losses
# ---------------------------------------------------------------------------

def compact_s(s: jnp.ndarray, method: str = "max", vgg_ctx=None):
    """compute_compact_s (src/model.py:3448-3475): 16x16 pooling, flattened
    — or, for method='vgg', full VGG16 features pooled to [B, 512]
    (compute_compact_s_vgg, src/model.py:3460-3467).
    s: [..., H, W, C] -> [..., D]."""
    if method == "max":
        pooled = max_pool(s, 16)
    elif method == "mean":
        pooled = avg_pool(s, 16)
    elif method == "vgg":
        if vgg_ctx is None:
            raise ValueError(
                "s_compact_method='vgg' needs VGG16 weights: set cfg.vgg_npz "
                "(produce the npz with models.vgg.dump_torchvision_vgg16)")
        from representation_disentanglement_tpu.models.vgg import (
            compact_s_vgg)
        lead = s.shape[:-3]
        flat = s.reshape((-1,) + s.shape[-3:])
        vec = compact_s_vgg(flat, vgg_ctx["pre_kernel"], vgg_ctx["pre_bias"],
                            vgg_ctx["vgg_params"])
        return vec.reshape(lead + (vec.shape[-1],))
    else:
        raise ValueError(f"unknown s_compact_method {method!r}")
    lead = pooled.shape[:-3]
    return pooled.reshape(*lead, -1)


def cosine(x: jnp.ndarray, y: jnp.ndarray):
    """compute_cosine (src/model.py:3407-3415), incl. its epsilon scheme."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xn = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(x), -1) + 1e-8), 1e-8)
    yn = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(y), -1) + 1e-8), 1e-8)
    return jnp.sum(x * y, -1) / (xn * yn)


def _roll1(a, axis=0):
    """torch.cat([a[1:], a[:1]]) == roll by -1."""
    return jnp.roll(a, -1, axis=axis)


def similarity_s_loss(s: jnp.ndarray, mask: jnp.ndarray, pair: jnp.ndarray,
                      margin: float = 0.1, compact_method: str = "max",
                      sim_method: str = "cosine", vgg_ctx=None):
    """compute_similarity_s_loss (src/model.py:3478-3535): anatomy of the
    SAME subject across modalities should be closer than anatomy of
    different subjects (batch-rolled negative).

    pair: int32 [2] — the reference picks it with host-side numpy RNG when
    M > 2 (src/model.py:3485); we accept it as an argument so the step stays
    jittable while the pair is drawn per-iteration outside.

    sim_method='perceptual' (src/model.py:3525-3532): the VGG perceptual
    score is a SCALAR (content+style over the whole pair batch), so the
    reference's masked mean ``-(mask_mix*sim).sum()/mask_mix.sum()``
    degenerates to ``-sim`` whenever the pair mask is nonempty.  NOTE the
    reference only constructs vgg/vgg_pre when s_compact_method=='vgg'
    (src/model.py:2944-2949), so 'perceptual' with any other compact method
    crashes upstream; here it works whenever vgg weights are provided."""
    M = s.shape[0]
    if M == 1:
        return jnp.float32(0.0)
    i, j = pair[0], pair[1]
    si = jnp.take(s, i, axis=0)
    sj = jnp.take(s, j, axis=0)
    mask_i = jnp.take(mask, i, axis=1).astype(jnp.float32)
    mask_j = jnp.take(mask, j, axis=1).astype(jnp.float32)
    si_perm = _roll1(si)
    mask_i_perm = _roll1(mask_i)
    mask_mix = mask_i * mask_j * mask_i_perm
    if sim_method == "perceptual":
        if vgg_ctx is None:
            raise ValueError(
                "s_sim_method='perceptual' needs VGG16 weights: set "
                "cfg.vgg_npz")
        from representation_disentanglement_tpu.models.vgg import (
            perceptual_similarity)
        sim = perceptual_similarity(si, sj, vgg_ctx["pre_kernel"],
                                    vgg_ctx["pre_bias"],
                                    vgg_ctx["vgg_params"])
        return jnp.where(jnp.sum(mask_mix) > 0, -sim, 0.0)
    if sim_method != "cosine":
        raise ValueError(f"unknown s_sim_method {sim_method!r}")
    si_c = compact_s(si, compact_method, vgg_ctx)
    sj_c = compact_s(sj, compact_method, vgg_ctx)
    si_perm_c = compact_s(si_perm, compact_method, vgg_ctx)
    sim = cosine(si_c, sj_c)
    sim_mix = cosine(si_perm_c, si_c)
    hinge = jnp.maximum(0.0, margin - sim + sim_mix)
    return _safe_div(jnp.sum(mask_mix * hinge), jnp.sum(mask_mix))


def similarity_z_loss(z: jnp.ndarray, mask: jnp.ndarray,
                      margin: float = 0.1):
    """compute_similarity_z_loss (src/model.py:3537-3557): all pairs i<j;
    z across modalities should differ, z across subjects (same modality)
    should match."""
    M = z.shape[0]
    if M == 1:
        return jnp.float32(0.0)
    m = mask.T.astype(jnp.float32)                            # [M, B]
    total = jnp.float32(0.0)
    count = jnp.float32(0.0)
    for i in range(M - 1):
        zi = z[i]
        zi_perm = _roll1(zi)
        mask_i_perm = _roll1(m[i])
        for j in range(i + 1, M):
            mm = m[i] * m[j] * mask_i_perm
            cos = cosine(zi, z[j])
            cos_mix = cosine(zi, zi_perm)
            hinge = jnp.maximum(0.0, margin - cos_mix + cos)
            term = _safe_div(jnp.sum(mm * hinge), jnp.sum(mm))
            has = (jnp.sum(mm) > 0).astype(jnp.float32)
            total = total + term * has
            count = count + has
    return _safe_div(total, count)


def _bce_with_logits(logits, target):
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def adversarial_loss(d_logits: jnp.ndarray, mask_pair: jnp.ndarray):
    """compute_adversarial_loss (src/model.py:3559-3587) given discriminator
    logits for the chosen pair.  d_logits: [2, B]; mask_pair: [2, B].
    Returns (d_loss, g_loss).  Quirk Q4 preserved: g_loss for the second
    modality equals its d_loss (both target ones, src/model.py:3579-3580)."""
    m0, m1 = mask_pair[0].astype(jnp.float32), mask_pair[1].astype(jnp.float32)
    d0, d1 = d_logits[0].astype(jnp.float32), d_logits[1].astype(jnp.float32)
    d_loss_0 = _safe_div(jnp.sum(m0 * _bce_with_logits(d0, 0.0)), jnp.sum(m0))
    g_loss_0 = _safe_div(jnp.sum(m0 * _bce_with_logits(d0, 1.0)), jnp.sum(m0))
    d_loss_1 = _safe_div(jnp.sum(m1 * _bce_with_logits(d1, 1.0)), jnp.sum(m1))
    g_loss_1 = d_loss_1
    return 0.5 * (d_loss_0 + d_loss_1), 0.5 * (g_loss_0 + g_loss_1)


# ---------------------------------------------------------------------------
# retrieval (test-time imputation, src/model.py:3396-3405)
# ---------------------------------------------------------------------------

def nearest_neighbour_z_by_s(s_bank: jnp.ndarray, z_bank: jnp.ndarray,
                             s_query: jnp.ndarray):
    """For each query compact-anatomy key, retrieve the z of the most
    cosine-similar bank entry.  One matmul + argmax on TPU.
    s_bank: [N, D], z_bank: [N, z], s_query: [Q, D] -> [Q, z]."""
    sims = cosine(s_query[:, None, :], s_bank[None, :, :])   # [Q, N]
    idx = jnp.argmax(sims, axis=1)
    return z_bank[idx]


def mean_z(z_bank: jnp.ndarray):
    return jnp.mean(z_bank, axis=0)
