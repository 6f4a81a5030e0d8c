"""Synthetic dataset fixtures reproducing the reference's data contract.

The reference repo ships no data; its preprocessing scripts emit an HDF5 of
``<subj>/<contrast>`` volumes plus fold txts of ``subj slice`` rows
(SURVEY §2.4).  This module writes structurally-identical synthetic
artifacts (phantom brains: ellipsoid "anatomy" shared across contrasts with
per-contrast intensity transforms, z-scored with background -10) so the full
train/eval/CLI path runs hermetically in tests and benchmarks.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

try:
    import h5py
except ImportError:                                   # pragma: no cover
    h5py = None

_H5_NAME = {
    ("BraTS", "z-score"): "BraTS_All_zscore_10.h5",
    ("BraTS", "mean"): "BraTS_All.h5",
    ("ZeroDose", "z-score"): "ZeroDose_FDG_All_1103_zscore_10.h5",
    ("ZeroDose", "mean"): "ZeroDose_FDG_All_1103.h5",
    ("NCANDA", "z-score"): "NCANDA_All_zscore_10.h5",
    ("NCANDA", "mean"): "NCANDA_All.h5",
}


def phantom_volume(rng: np.random.Generator, shape=(160, 192, 155),
                   n_blobs: int = 4) -> np.ndarray:
    """Shared 'anatomy': a few smooth ellipsoid blobs inside a brain mask."""
    H, W, D = shape
    yy, xx, zz = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                             np.linspace(-1, 1, D), indexing="ij")
    brain = ((yy / 0.8) ** 2 + (xx / 0.7) ** 2 + (zz / 0.9) ** 2) < 1.0
    vol = np.zeros(shape, np.float32)
    for _ in range(n_blobs):
        c = rng.uniform(-0.5, 0.5, 3)
        r = rng.uniform(0.15, 0.45, 3)
        blob = np.exp(-(((yy - c[0]) / r[0]) ** 2 + ((xx - c[1]) / r[1]) ** 2
                        + ((zz - c[2]) / r[2]) ** 2))
        vol += rng.uniform(0.3, 1.0) * blob.astype(np.float32)
    return vol * brain, brain


def make_synthetic_dataset(data_path: str, dataset_name: str = "BraTS",
                           contrast_list: Sequence[str] = ("T1", "T2"),
                           norm_type: str = "z-score", n_subj: int = 6,
                           shape=(64, 96, 32), fold: int = 0,
                           slice_range=(8, 24), seed: int = 10,
                           missing_prob: float = 0.0) -> str:
    """Write the h5 + fold txts contract into `data_path`; returns h5 path."""
    if h5py is None:
        raise ImportError("h5py required")
    os.makedirs(data_path, exist_ok=True)
    rng = np.random.default_rng(seed)
    h5_path = os.path.join(data_path, _H5_NAME[(dataset_name, norm_type)])
    subj_prefix = {"BraTS": "BraTS20_Training_",
                   "ZeroDose": "case_", "NCANDA": "NCANDA_S0"}[dataset_name]
    subjects = [f"{subj_prefix}{i:03d}" for i in range(n_subj)]

    with h5py.File(h5_path, "w") as f:
        for subj in subjects:
            anatomy, brain = phantom_volume(rng, shape)
            for contrast in contrast_list:
                if missing_prob and rng.random() < missing_prob:
                    continue                     # absent contrast
                gain = rng.uniform(0.5, 2.0)
                gamma = rng.uniform(0.7, 1.4)
                img = gain * np.power(np.clip(anatomy, 0, None) + 0.05,
                                      gamma)
                img += 0.02 * rng.standard_normal(shape).astype(np.float32)
                img = img * brain
                if norm_type == "z-score":
                    mu, sd = img[brain].mean(), img[brain].std() + 1e-6
                    img = (img - mu) / sd
                    img[~brain] = -10.0          # background := -10
                f.create_dataset(f"{subj}/{contrast}",
                                 data=img.astype(np.float32))
            if dataset_name == "BraTS":
                seg = (anatomy > np.quantile(anatomy[brain], 0.9)).astype(
                    np.float32)
                seg = seg * rng.integers(1, 5, 1)[0]
                f.create_dataset(f"{subj}/seg", data=seg)
            elif dataset_name == "ZeroDose":
                pet = np.clip(anatomy * 1.5, 0, None)
                f.create_dataset(f"{subj}/PET", data=pet.astype(np.float32))

    # fold txts: seed-shuffled subjects, slice rows (SURVEY §2.4)
    order = list(subjects)
    rng.shuffle(order)
    n_test = max(1, n_subj // 5)
    n_val = max(1, n_subj // 6)
    test_s = order[:n_test]
    val_s = order[n_test:n_test + n_val]
    train_s = order[n_test + n_val:] or order[:1]
    if dataset_name == "BraTS":
        names = [f"fold_BraTS_{fold}_{s}_noval.txt"
                 for s in ("train", "val", "test")]
    elif dataset_name == "ZeroDose":
        sel = {2: "1103_sel", 3: "3contrasts_sel", 4: "4contrasts_sel_all"}
        names = [f"fold{fold}_{s}_{sel[len(contrast_list)]}.txt"
                 for s in ("train", "val", "test")]
    else:
        names = [f"fold_{dataset_name}_{fold}_{s}.txt"
                 for s in ("train", "val", "test")]
    for name, subset in zip(names, (train_s, val_s, test_s)):
        with open(os.path.join(data_path, name), "w") as f:
            for subj in subset:
                for sl in range(*slice_range):
                    f.write(f"{subj} {sl}\n")
    return h5_path
