"""Vectorized batch gather: equivalence with per-sample path + throughput."""

import time

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from representation_disentanglement_tpu.data.dataset import (  # noqa: E402
    SliceDataset, VolumeStore, load_idx_list)
from representation_disentanglement_tpu.data.loader import BatchLoader
from representation_disentanglement_tpu.data.synthetic import (
    make_synthetic_dataset)


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("fast")
    make_synthetic_dataset(str(d), "BraTS", ("T1", "T2"), "z-score",
                           n_subj=6, shape=(32, 48, 16), slice_range=(4, 12))
    store = VolumeStore(f"{d}/BraTS_All_zscore_10.h5")
    subjs, idxs = load_idx_list(f"{d}/fold_BraTS_0_train_noval.txt")
    return SliceDataset("BraTS", store, subjs, idxs, block_size=3,
                        contrast_list=["T1", "T2"], image_size=(32, 48))


def test_get_batch_matches_getitem(ds):
    idxs = [0, 3, 7, 11]
    batch = ds.get_batch(idxs)
    for j, i in enumerate(idxs):
        s = ds[i]
        np.testing.assert_array_equal(batch["inputs"][:, j], s["inputs"])
        np.testing.assert_array_equal(batch["targets"][j], s["targets"])
        np.testing.assert_array_equal(batch["mask"][j], s["mask"])
        np.testing.assert_array_equal(batch["mask_img"][j], s["mask_img"])
        assert batch["subj_id"][j] == s["subj_id"]
        assert batch["slice_idx"][j] == s["slice_idx"]


def test_loader_uses_fast_path(ds):
    loader = BatchLoader(ds, 4, shuffle=True, drop_last=True,
                         to_device=False, prefetch=0)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    assert batches[0]["inputs"].shape == (2, 4, 32, 48, 7)


def test_fast_path_throughput(ds):
    """The vectorized gather must be faster per batch.  Wall-clock on a
    shared host is noisy at these tiny shapes, so compare best-of-5
    interleaved trials rather than a single pass."""
    ds.get_batch([0])                       # pack once
    [ds[i] for i in range(8)]               # warm the per-sample path too

    def best_of(fn, trials=5, reps=20):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            best = min(best, time.perf_counter() - t0)
        return best

    fast = best_of(lambda: ds.get_batch(list(range(8))))
    slow = best_of(lambda: [ds[i] for i in range(8)])
    assert fast < slow, (fast, slow)
