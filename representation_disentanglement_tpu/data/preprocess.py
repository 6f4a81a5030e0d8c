"""Offline preprocessing: NIfTI -> HDF5 volumes + fold splits.

Reproduces the three reference scripts' numeric semantics exactly
(SURVEY §2.4; data_preprocessing_{BraTS,NCANDA,ZeroDose}.py) as a proper
CLI instead of pdb-gated run-once code:

- BraTS  (:80-96):  expect (240,240,155); NaN->0; crop [40:-40, 24:-24] ->
  (160,192,155); z-score over brain (img>0), background := -10;
  fold txts over slices range(50,105), seed-10 shuffle, 5 folds.
- NCANDA (:47-62):  (240,240,240) crop [40:-40, 24:-24, 40:-40] ->
  (160,192,160); same z-score; slices range(60,100).
- ZeroDose (:118-137): multiply by brain mask, clip >= 0, z-score over
  mask, background -10, pad (157,189)->(160,192); slices range(20,136).

The numeric core is pure numpy (tested without nibabel); nibabel is only
needed to read .nii inputs and is import-gated.

Usage:
  python -m representation_disentanglement_tpu.data.preprocess brats \
      --input-dir .../MICCAI_BraTS2020_TrainingData --output-dir ../data
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import h5py
except ImportError:                                    # pragma: no cover
    h5py = None


# ---------------------------------------------------------------------------
# numeric core (pure numpy, reference-parity)
# ---------------------------------------------------------------------------

def zscore_brain(img: np.ndarray, brain: Optional[np.ndarray] = None,
                 background: float = -10.0) -> np.ndarray:
    """Z-score over brain voxels; background set to `background`
    (data_preprocessing_BraTS.py:87-96)."""
    img = np.nan_to_num(img.astype(np.float32), nan=0.0)
    if brain is None:
        brain = img > 0
    brain = brain.astype(bool)
    if brain.sum() == 0:
        return np.full_like(img, background)
    mu = img[brain].mean()
    sd = img[brain].std() + 1e-8
    out = (img - mu) / sd
    out[~brain] = background
    return out


def crop_brats(vol: np.ndarray) -> np.ndarray:
    """(240,240,155) -> (160,192,155) via [40:-40, 24:-24]
    (data_preprocessing_BraTS.py:85)."""
    return vol[40:-40, 24:-24]


def crop_ncanda(vol: np.ndarray) -> np.ndarray:
    """(240,240,240) -> (160,192,160) (data_preprocessing_NCANDA.py:52)."""
    return vol[40:-40, 24:-24, 40:-40]


def pad_zerodose(vol: np.ndarray) -> np.ndarray:
    """(157,189,D) -> (160,192,D) zero pad
    (data_preprocessing_ZeroDose.py:136-137, util.py:618-619)."""
    h, w = vol.shape[:2]
    return np.pad(vol, ((0, 160 - h), (0, 192 - w), (0, 0)))


def make_folds(subjects: Sequence[str], slice_range: Tuple[int, int],
               num_fold: int = 5, seed: int = 10,
               val_frac: float = 0.1, test_frac: float = 0.2
               ) -> List[Dict[str, List[Tuple[str, int]]]]:
    """Seed-shuffled subject folds -> per-fold (subj, slice) rows
    (data_preprocessing_BraTS.py:100-146)."""
    subjects = list(subjects)
    rng = np.random.RandomState(seed)
    rng.shuffle(subjects)
    n = len(subjects)
    n_test = max(int(n * test_frac), 1)
    n_val = max(int(n * val_frac), 1)
    folds = []
    for f in range(num_fold):
        lo = (f * n_test) % max(n, 1)
        test_s = subjects[lo:lo + n_test]
        rest = [s for s in subjects if s not in test_s]
        val_s = rest[:n_val]
        train_s = rest[n_val:]
        expand = lambda ss: [(s, i) for s in ss
                             for i in range(*slice_range)]
        folds.append({"train": expand(train_s), "val": expand(val_s),
                      "test": expand(test_s)})
    return folds


def write_fold_txts(folds, out_dir: str, name_fn) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for f, split in enumerate(folds):
        for part, rows in split.items():
            with open(os.path.join(out_dir, name_fn(f, part)), "w") as fh:
                for subj, sl in rows:
                    fh.write(f"{subj} {sl}\n")


# ---------------------------------------------------------------------------
# dataset drivers (nibabel-gated)
# ---------------------------------------------------------------------------

def _load_nii(path: str) -> np.ndarray:
    try:
        import nibabel as nib
    except ImportError as e:                            # pragma: no cover
        raise ImportError(
            "nibabel is required to read NIfTI inputs; install it or "
            "convert volumes to HDF5 with another tool") from e
    return np.asarray(nib.load(path).get_fdata(), np.float32)


_BRATS_CONTRASTS = {"T1": "t1", "T1c": "t1ce", "T2": "t2",
                    "T2_FLAIR": "flair", "seg": "seg"}


def preprocess_brats(input_dir: str, output_dir: str,
                     num_fold: int = 5) -> str:
    """BraTS 2020 -> BraTS_All_zscore_10.h5 + fold_BraTS_* txts."""
    if h5py is None:
        raise ImportError("h5py required")
    os.makedirs(output_dir, exist_ok=True)
    h5_path = os.path.join(output_dir, "BraTS_All_zscore_10.h5")
    subj_dirs = sorted(glob.glob(os.path.join(input_dir, "BraTS20_*")))
    subjects = []
    with h5py.File(h5_path, "w") as f:
        for sd in subj_dirs:
            subj = os.path.basename(sd)
            ok = True
            vols = {}
            for cname, suffix in _BRATS_CONTRASTS.items():
                p = os.path.join(sd, f"{subj}_{suffix}.nii.gz")
                if not os.path.exists(p):
                    p = p[:-3]                     # .nii fallback
                if not os.path.exists(p):
                    ok = cname == "seg"
                    continue
                vol = _load_nii(p)
                if vol.shape != (240, 240, 155):
                    print(f"skip {subj}: shape {vol.shape}")
                    ok = False
                    break
                vol = crop_brats(vol)
                if cname != "seg":
                    vol = zscore_brain(vol)
                vols[cname] = vol
            if not ok or not vols:
                continue
            for cname, vol in vols.items():
                f.create_dataset(f"{subj}/{cname}", data=vol)
            subjects.append(subj)
    folds = make_folds(subjects, (50, 105), num_fold)
    write_fold_txts(folds, output_dir,
                    lambda f, p: f"fold_BraTS_{f}_{p}_noval.txt")
    return h5_path


def preprocess_ncanda(input_dir: str, output_dir: str,
                      num_fold: int = 5) -> str:
    """NCANDA T1/T2 -> NCANDA_All_zscore_10.h5 + folds."""
    if h5py is None:
        raise ImportError("h5py required")
    os.makedirs(output_dir, exist_ok=True)
    h5_path = os.path.join(output_dir, "NCANDA_All_zscore_10.h5")
    t1s = {os.path.basename(p).split("_")[0]: p for p in
           glob.glob(os.path.join(input_dir, "*T1*.nii*"))}
    t2s = {os.path.basename(p).split("_")[0]: p for p in
           glob.glob(os.path.join(input_dir, "*T2*.nii*"))}
    subjects = sorted(set(t1s) & set(t2s))        # T1 AND T2 (:21)
    with h5py.File(h5_path, "w") as f:
        for subj in subjects:
            for cname, path in (("T1", t1s[subj]), ("T2", t2s[subj])):
                vol = crop_ncanda(_load_nii(path))
                f.create_dataset(f"{subj}/{cname}",
                                 data=zscore_brain(vol))
    folds = make_folds(subjects, (60, 100), num_fold)
    write_fold_txts(folds, output_dir,
                    lambda f, p: f"fold_NCANDA_{f}_{p}.txt")
    return h5_path


_ZD_FILES = {"T1": "tpm_T1.nii", "PET": "tpm_r2T1_PET.nii",
             "T1c": "tpm_r2T1_T1c.nii", "T2_FLAIR": "tpm_r2T1_T2_FLAIR.nii",
             "ASL": "tpm_r2PET_ASL.nii"}


def preprocess_zerodose(input_dir: str, output_dir: str, mask_path: str,
                        num_fold: int = 5,
                        contrasts: Sequence[str] = ("T1", "T1c", "T2_FLAIR",
                                                    "ASL")) -> str:
    """ZeroDose SPM-space volumes -> h5 + contrast-count fold txts."""
    if h5py is None:
        raise ImportError("h5py required")
    os.makedirs(output_dir, exist_ok=True)
    h5_path = os.path.join(output_dir, "ZeroDose_FDG_All_1103_zscore_10.h5")
    brain = _load_nii(mask_path) > 0
    subj_dirs = sorted(d for d in glob.glob(os.path.join(input_dir, "*"))
                       if os.path.isdir(d))
    complete: List[str] = []
    with h5py.File(h5_path, "w") as f:
        for sd in subj_dirs:
            subj = os.path.basename(sd)
            vols = {}
            for cname, fname in _ZD_FILES.items():
                p = os.path.join(sd, fname)
                if not os.path.exists(p):
                    continue
                vol = _load_nii(p)
                vol = vol * brain[..., :vol.shape[2]]
                vol = np.clip(vol, 0, None)              # (:127)
                vol = zscore_brain(vol, brain[..., :vol.shape[2]])
                vols[cname] = pad_zerodose(vol)
            for cname, vol in vols.items():
                f.create_dataset(f"{subj}/{cname}", data=vol)
            if all(c in vols for c in contrasts) and "PET" in vols:
                complete.append(subj)
    sel = {2: "1103_sel", 3: "3contrasts_sel", 4: "4contrasts_sel_all"}
    folds = make_folds(complete, (20, 136), num_fold)
    write_fold_txts(
        folds, output_dir,
        lambda f, p: f"fold{f}_{p}_{sel[len(contrasts)]}.txt")
    return h5_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="dataset", required=True)
    for name in ("brats", "ncanda", "zerodose"):
        sp = sub.add_parser(name)
        sp.add_argument("--input-dir", required=True)
        sp.add_argument("--output-dir", required=True)
        sp.add_argument("--num-fold", type=int, default=5)
        if name == "zerodose":
            sp.add_argument("--mask", required=True)
    args = ap.parse_args(argv)
    if args.dataset == "brats":
        print(preprocess_brats(args.input_dir, args.output_dir,
                               args.num_fold))
    elif args.dataset == "ncanda":
        print(preprocess_ncanda(args.input_dir, args.output_dir,
                                args.num_fold))
    else:
        print(preprocess_zerodose(args.input_dir, args.output_dir,
                                  args.mask, args.num_fold))


if __name__ == "__main__":
    main()
