"""Data layer: contract fidelity of datasets, loaders, synthetic fixtures."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from representation_disentanglement_tpu.data.dataset import (  # noqa: E402
    DataAll, SliceDataset, TestDropoffDataset, VolumeStore, load_idx_list)
from representation_disentanglement_tpu.data.loader import BatchLoader
from representation_disentanglement_tpu.data.synthetic import (
    make_synthetic_dataset)


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    make_synthetic_dataset(str(d), "BraTS", ("T1", "T2"), "z-score",
                           n_subj=6, shape=(32, 48, 16), slice_range=(4, 12))
    return str(d)


def test_fold_txt_contract(synth_dir):
    subjs, idxs = load_idx_list(f"{synth_dir}/fold_BraTS_0_train_noval.txt")
    assert len(subjs) == len(idxs) > 0
    assert all(s.startswith("BraTS20_Training_") for s in subjs)


def test_slice_dataset_block_and_mask(synth_dir):
    store = VolumeStore(f"{synth_dir}/BraTS_All_zscore_10.h5")
    subjs, idxs = load_idx_list(f"{synth_dir}/fold_BraTS_0_train_noval.txt")
    ds = SliceDataset("BraTS", store, subjs, idxs, block_size=3,
                      contrast_list=["T1", "T2"], image_size=(32, 48))
    s = ds[0]
    assert s["inputs"].shape == (2, 32, 48, 7)     # [M, H, W, block_ch]
    assert s["targets"].shape == (32, 48, 1)
    assert s["mask"].tolist() == [1.0, 1.0]
    # block slices are contiguous around the (clamped) index
    vol = store.get(f"{s['subj_id']}/T1")
    si = s["slice_idx"]
    np.testing.assert_array_equal(s["inputs"][0],
                                  vol[:, :, si - 3:si + 4])
    # mask_img: background of channel 0, modality 0 (quirk Q6)
    np.testing.assert_array_equal(
        s["mask_img"], (s["inputs"][0, :, :, 0] == 0).astype(np.float32))
    # BraTS seg labels remapped 4 -> 3
    assert s["targets"].max() <= 3


def test_missing_contrast_zero_fill(synth_dir):
    store = VolumeStore(f"{synth_dir}/BraTS_All_zscore_10.h5")
    subjs, idxs = load_idx_list(f"{synth_dir}/fold_BraTS_0_train_noval.txt")
    ds = SliceDataset("BraTS", store, subjs, idxs, block_size=3,
                      contrast_list=["T1", "NOPE"], image_size=(32, 48))
    s = ds[0]
    assert s["mask"].tolist() == [1.0, 0.0]
    assert (s["inputs"][1] == 0).all()


def test_dropoff_augmentation(synth_dir):
    store = VolumeStore(f"{synth_dir}/BraTS_All_zscore_10.h5")
    subjs, idxs = load_idx_list(f"{synth_dir}/fold_BraTS_0_train_noval.txt")
    rng = np.random.default_rng(0)
    ds = SliceDataset("BraTS", store, subjs, idxs, block_size=3,
                      contrast_list=["T1", "T2"], dropoff=True,
                      image_size=(32, 48), rng=rng)
    dropped = sum(ds[i % len(ds)]["mask"].sum() < 2 for i in range(50))
    assert 2 < dropped < 25                   # ~20% dropoff rate


def test_test_dropoff_dataset(synth_dir):
    store = VolumeStore(f"{synth_dir}/BraTS_All_zscore_10.h5")
    subjs, idxs = load_idx_list(f"{synth_dir}/fold_BraTS_0_test_noval.txt")
    ds = TestDropoffDataset(store, subjs, idxs, sel_idx_list=[0, 1],
                            block_size=3, contrast_list=["T1", "T2"],
                            dataset_name="BraTS", image_size=(32, 48))
    # subsets: [], [0], [0,1], [1] -> 4 per selected index
    assert len(ds) == 2 * 4
    masks = [ds[i]["mask"].tolist() for i in range(4)]
    assert [1, 1] in masks and [0, 0] in masks and [0, 1] in masks


def test_batch_loader_shapes(synth_dir):
    data = DataAll("BraTS", synth_dir, norm_type="z-score", batch_size=4,
                   contrast_list=["T1", "T2"], image_size=(32, 48))
    loader = BatchLoader(data.train_dataset, 4, shuffle=True, drop_last=True,
                         to_device=False)
    b = next(iter(loader))
    assert b["inputs"].shape == (2, 4, 32, 48, 7)
    assert b["mask"].shape == (4, 2)
    assert b["targets"].shape == (4, 32, 48, 1)
    assert len(b["subj_id"]) == 4
    assert len(loader) == len(data.train_dataset) // 4
