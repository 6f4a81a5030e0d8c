"""Native (C++) batch-gather core: kernel correctness + dataset-path
equivalence with the pure-numpy fallback.

The native path replaces the per-(modality, sample) numpy transpose loop
in SliceDataset.get_batch with one threaded C++ call (native/gather.cpp);
the reference's equivalent work is per-sample h5py reads + transposes
inside a torch Dataset (src/util.py:508-516)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from representation_disentanglement_tpu import native  # noqa: E402
from representation_disentanglement_tpu.data.dataset import (  # noqa: E402
    SliceDataset, VolumeStore, load_idx_list)
from representation_disentanglement_tpu.data.synthetic import (  # noqa: E402
    make_synthetic_dataset)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native gather lib unavailable (no g++)")


def test_kernel_matches_numpy_transpose():
    rng = np.random.default_rng(0)
    vol_a = rng.standard_normal((20, 32, 48)).astype(np.float32)
    vol_b = rng.standard_normal((16, 32, 48)).astype(np.float32)
    out = np.empty((4, 32, 48, 7), np.float32)
    ptrs = np.zeros(4, np.uint64)
    plane = 32 * 48 * 4
    ptrs[0] = vol_a.ctypes.data + 2 * plane
    ptrs[1] = 0                                 # absent -> zero-fill
    ptrs[2] = vol_b.ctypes.data + 5 * plane
    ptrs[3] = vol_a.ctypes.data                 # block at depth 0
    native.gather_blocks(ptrs, out)
    np.testing.assert_array_equal(out[0], np.transpose(vol_a[2:9], (1, 2, 0)))
    np.testing.assert_array_equal(out[1], 0.0)
    np.testing.assert_array_equal(out[2], np.transpose(vol_b[5:12], (1, 2, 0)))
    np.testing.assert_array_equal(out[3], np.transpose(vol_a[0:7], (1, 2, 0)))


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    make_synthetic_dataset(str(d), "BraTS", ("T1", "T2"), "z-score",
                           n_subj=6, shape=(32, 48, 16), slice_range=(4, 12))
    store = VolumeStore(f"{d}/BraTS_All_zscore_10.h5")
    subjs, idxs = load_idx_list(f"{d}/fold_BraTS_0_train_noval.txt")
    # request a contrast the fixture does NOT contain so the batch
    # exercises the zero-fill + mask=0 missing-modality path
    return SliceDataset("BraTS", store, subjs, idxs, block_size=3,
                        contrast_list=["T1", "T2", "T2_FLAIR"],
                        image_size=(32, 48))


def test_dataset_native_matches_numpy_path(ds):
    idxs = list(range(8))
    a = ds.get_batch(idxs)
    assert ds._packed["native_ok"], "native path not engaged"
    ds._packed["native_ok"] = False             # force numpy fallback
    b = ds.get_batch(idxs)
    ds._packed["native_ok"] = True
    for k in ("inputs", "targets", "mask", "mask_img"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    assert a["subj_id"] == b["subj_id"]
    np.testing.assert_array_equal(a["slice_idx"], b["slice_idx"])
    # the absent third contrast is zero-filled with mask 0
    np.testing.assert_array_equal(a["inputs"][2], 0.0)
    np.testing.assert_array_equal(a["mask"][:, 2], 0.0)


def test_dataset_matches_getitem_under_native(ds):
    batch = ds.get_batch([0, 3, 7])
    for j, i in enumerate([0, 3, 7]):
        s = ds[i]
        np.testing.assert_array_equal(batch["inputs"][:, j], s["inputs"])
        np.testing.assert_array_equal(batch["mask"][j], s["mask"])


def test_out_of_depth_block_raises(ds):
    """Memory safety: a block outside the packed volume depth must raise,
    not read out of bounds (the numpy path raises a shape error)."""
    ds._clamped = None
    orig = ds._clamp_slice
    try:
        ds._clamp_slice = lambda s: 14          # 14+3+1 > D=16
        with pytest.raises(ValueError):
            ds.get_batch([0])
    finally:
        ds._clamp_slice = orig
