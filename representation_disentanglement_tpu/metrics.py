"""Evaluation metrics with skimage-parity semantics, computed in JAX.

Reference eval (src/util.py:928-992) shifts target and prediction by their
own minima, uses ``data_range = shifted_target.max()`` and computes per-slice
MSE / PSNR / SSIM via skimage, plus per-class Dice/IoU with +1 smoothing for
BraTS.  skimage is not required here: SSIM is re-implemented to match
``skimage.metrics.structural_similarity`` defaults for 2D float inputs
(win_size=7 uniform windows, K1=0.01, K2=0.03, sample covariance, border
crop of win_size//2 — interior uniform_filter values equal valid-window
means, so a VALID-window implementation is exact).  Parity is tested against
an independent scipy.ndimage implementation in tests/test_metrics.py.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _valid_window_mean(x: jnp.ndarray, win: int):
    """Mean over all valid win x win windows of a 2D array."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (win, win), (1, 1), "VALID")
    return s / (win * win)


def ssim_single(target: jnp.ndarray, pred: jnp.ndarray, data_range,
                win: int = 7, k1: float = 0.01, k2: float = 0.03):
    """skimage structural_similarity parity for one 2D slice (float64-free).

    Assumes inputs are already min-shifted as the reference does
    (src/util.py:959-961)."""
    t = target.astype(jnp.float32)
    p = pred.astype(jnp.float32)
    np_ = win * win
    cov_norm = np_ / (np_ - 1.0)                 # sample covariance
    ux = _valid_window_mean(t, win)
    uy = _valid_window_mean(p, win)
    uxx = _valid_window_mean(t * t, win)
    uyy = _valid_window_mean(p * p, win)
    uxy = _valid_window_mean(t * p, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    return jnp.mean((a1 * a2) / (b1 * b2))


@jax.jit
def recon_metrics_device(target: jnp.ndarray, pred: jnp.ndarray):
    """Per-slice (ssim, psnr, rmse) for [B, H, W] channel-0 slices,
    replicating compute_reconstruction_metrics_single (src/util.py:955-978):
    shift both by their own min, data_range = shifted target max.

    Stays on device — the eval loop fetches only the [3, B] result instead
    of the full prediction tensors (the reference syncs GPU->CPU numpy per
    batch for skimage, src/main_missing.py:519-534)."""
    def one(t, p):
        t = t - jnp.min(t)
        p = p - jnp.min(p)
        rng = jnp.max(t)
        mse = jnp.mean(jnp.square(t - p))
        psnr = 10.0 * jnp.log10(jnp.square(rng) / mse)
        ssim = ssim_single(t, p, rng)
        return ssim, psnr, mse
    return jax.vmap(one)(target.astype(jnp.float32), pred.astype(jnp.float32))


_recon_metrics_batch = recon_metrics_device    # back-compat alias


@jax.jit
def seg_metrics_device(target: jnp.ndarray, pred: jnp.ndarray):
    """Per-sample (dice, iou) over classes 1-3 with +1 smoothing and 0.5
    prediction threshold (src/util.py:946-953, 980-992), on device.

    target: [B, H, W] integer-ish labels; pred: [B, H, W, >=3] where channel
    i corresponds to class i+1 (the reference indexes pred[i]).  All counts
    are exact in float32 (< 2^24 pixels per slice)."""
    def one(t, p):
        dl, il = [], []
        for i in range(3):
            gt_i = (t == (i + 1)).astype(jnp.float32)
            pr_i = (p[..., i] > 0.5).astype(jnp.float32)
            inter = jnp.sum(gt_i * pr_i)
            union = jnp.sum(jnp.maximum(gt_i, pr_i))
            dl.append((2.0 * inter + 1) / (jnp.sum(gt_i) + jnp.sum(pr_i) + 1))
            il.append((inter + 1) / (union + 1))
        return jnp.mean(jnp.stack(dl)), jnp.mean(jnp.stack(il))
    return jax.vmap(one)(target.astype(jnp.float32), pred.astype(jnp.float32))


def compute_reconstruction_metrics(target: np.ndarray,
                                   pred: np.ndarray) -> Dict[str, list]:
    """Batch wrapper (src/util.py:935-944): uses channel 0 of each sample.
    target/pred: [B, H, W, C] (NHWC) or [B, C, H, W] (auto-detected by the
    reference dump convention: callers pass NHWC here)."""
    t = np.asarray(target)[..., 0]
    p = np.asarray(pred)[..., 0]
    ssim, psnr, mse = (np.asarray(a) for a in _recon_metrics_batch(t, p))
    return {"ssim": list(ssim.astype(float)), "psnr": list(psnr.astype(float)),
            "rmse": list(mse.astype(float))}


def compute_segmentation_metrics(target: np.ndarray,
                                 pred: np.ndarray) -> Dict[str, list]:
    """Per-class (1-3) Dice/IoU with +1 smoothing, pred threshold 0.5
    (src/util.py:946-953, 980-992).  target: [B, H, W, 1] labels;
    pred: [B, H, W, C>=3] per-class maps (reference indexes pred[i] = class
    i+1's channel, i.e. channels 0..2 correspond to classes 1..3)."""
    t = np.asarray(target)[..., 0]
    p = np.asarray(pred)
    dice_out, iou_out = [], []
    for b in range(t.shape[0]):
        dl, il = [], []
        for i in range(3):
            gt_i = t[b] == (i + 1)
            pr_i = p[b, ..., i] > 0.5
            inter = np.logical_and(gt_i, pr_i).sum()
            union = np.logical_or(gt_i, pr_i).sum()
            dl.append((2.0 * inter + 1) / (gt_i.sum() + pr_i.sum() + 1))
            il.append((inter + 1) / (union + 1))
        dice_out.append(float(np.mean(dl)))
        iou_out.append(float(np.mean(il)))
    return {"dice": dice_out, "iou": iou_out}
