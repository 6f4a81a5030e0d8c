"""Preprocessing numeric-core parity (pure numpy, no nibabel needed)."""

import numpy as np

from representation_disentanglement_tpu.data.preprocess import (
    crop_brats, crop_ncanda, make_folds, pad_zerodose, write_fold_txts,
    zscore_brain)


def test_zscore_brain_semantics(rng):
    img = np.zeros((10, 10, 5), np.float32)
    img[2:8, 2:8] = rng.random((6, 6, 5)).astype(np.float32) + 0.5
    img[0, 0, 0] = np.nan                      # NaN -> 0 (BraTS :82)
    out = zscore_brain(img)
    brain = np.nan_to_num(img) > 0
    assert abs(out[brain].mean()) < 1e-5
    assert abs(out[brain].std() - 1.0) < 1e-4
    assert (out[~brain] == -10.0).all()


def test_crop_shapes():
    assert crop_brats(np.zeros((240, 240, 155))).shape == (160, 192, 155)
    assert crop_ncanda(np.zeros((240, 240, 240))).shape == (160, 192, 160)
    assert pad_zerodose(np.zeros((157, 189, 156))).shape == (160, 192, 156)


def test_make_folds_disjoint_and_seeded(tmp_path):
    subs = [f"s{i}" for i in range(20)]
    folds = make_folds(subs, (50, 55), num_fold=5, seed=10)
    assert len(folds) == 5
    f0 = folds[0]
    tr = {s for s, _ in f0["train"]}
    va = {s for s, _ in f0["val"]}
    te = {s for s, _ in f0["test"]}
    assert not (tr & te) and not (tr & va) and not (va & te)
    # per-subject slice expansion
    assert sum(1 for s, _ in f0["test"] if s == next(iter(te))) == 5
    # deterministic under the seed
    folds2 = make_folds(subs, (50, 55), num_fold=5, seed=10)
    assert folds[0]["test"] == folds2[0]["test"]
    # txt round-trip matches the loader contract
    write_fold_txts(folds, str(tmp_path), lambda f, p: f"f{f}_{p}.txt")
    from representation_disentanglement_tpu.data.dataset import load_idx_list
    subjs, idxs = load_idx_list(str(tmp_path / "f0_test.txt"))
    assert list(zip(subjs.tolist(), idxs.tolist())) == f0["test"]
