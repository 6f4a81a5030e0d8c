"""Legacy classification/volume metric suite (reference src/util.py:311-415).

`classification_metrics` reproduces the full confusion-matrix panel
(src/util.py:348-379); `compute_stat` the reconstruction/segmentation stat
dispatch (src/util.py:311-346, with ROC-AUC computed in numpy since sklearn
may be absent); `majority_vote_volume_prediction` the per-volume vote
(src/util.py:394-404, interior slices only)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from representation_disentanglement_tpu.metrics import (
    compute_reconstruction_metrics)


def classification_metrics(real: np.ndarray, fake: np.ndarray) -> Dict:
    real = np.asarray(real).ravel()
    fake = np.asarray(fake).ravel()
    tp = float(((fake == 1.0) & (real == 1.0)).sum())
    tn = float(((fake == 0.0) & (real == 0.0)).sum())
    fp = float(((fake == 1.0) & (real == 0.0)).sum())
    fn = float(((fake == 0.0) & (real == 1.0)).sum())
    div = lambda a, b: a / b if b else float("nan")
    tpr = div(tp, tp + fn)
    tnr = div(tn, tn + fp)
    ppv = div(tp, tp + fp)
    npv = div(tn, tn + fn)
    return {"tpr": tpr, "tnr": tnr, "ppv": ppv, "npv": npv,
            "fnr": 1 - tpr, "fpr": 1 - tnr, "fdr": 1 - ppv,
            "fomr": 1 - npv,
            "acc": div(tp + tn, tp + tn + fp + fn),
            "dice": div(2 * tp, 2 * tp + fp + fn),
            "iou": div(tp, tp + fp + fn)}


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based AUC (equivalent to sklearn.roc_auc_score)."""
    labels = np.asarray(labels).ravel()
    scores = np.asarray(scores).ravel()
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    order = np.argsort(np.concatenate([neg, pos]), kind="mergesort")
    ranks = np.empty(len(order))
    # average ranks for ties
    sorted_scores = np.concatenate([neg, pos])[order]
    ranks[order] = np.arange(1, len(order) + 1)
    uniq, inv, cnt = np.unique(sorted_scores, return_inverse=True,
                               return_counts=True)
    csum = np.cumsum(cnt)
    avg = (csum - (cnt - 1) / 2.0)
    ranks[order] = avg[inv]
    pos_ranks = ranks[len(neg):]
    u = pos_ranks.sum() - len(pos) * (len(pos) + 1) / 2.0
    return float(u / (len(pos) * len(neg)))


def compute_stat(real_b: np.ndarray, fake_b: np.ndarray,
                 task: str = "reconstruction") -> Dict:
    if task == "reconstruction":
        m = compute_reconstruction_metrics(real_b[None, ..., None],
                                           fake_b[None, ..., None])
        return {"psnr": m["psnr"][0], "ssim": m["ssim"][0],
                "rmse": m["rmse"][0]}
    fake = np.where(np.asarray(fake_b) >= 0.5, 1.0, 0.0).ravel()
    real = np.asarray(real_b).ravel()
    cm = classification_metrics(real, fake)
    return {"auc": roc_auc(real, fake), "dice": cm["dice"],
            "tpr": cm["tpr"], "tnr": cm["tnr"],
            "alvd": float(np.abs(real.sum() - fake.sum()))}


def majority_vote_volume_prediction(prediction_list: np.ndarray,
                                    label_list: np.ndarray,
                                    slice_per_subj: int = 48):
    """Per-volume mean over interior slices ([10, -10] window,
    src/util.py:394-404)."""
    subj_num = int(prediction_list.shape[0] // slice_per_subj)
    preds, labels = [], []
    for s in range(subj_num):
        preds.append(float(prediction_list[
            s * slice_per_subj + 10:(s + 1) * slice_per_subj - 10].mean()))
        labels.append(float(label_list[
            s * slice_per_subj:(s + 1) * slice_per_subj].mean()))
    return preds, labels
