"""Device-resident volume cache: gather parity with the host dataset."""

import numpy as np
import pytest
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

from representation_disentanglement_tpu.data.dataset import (  # noqa: E402
    SliceDataset, VolumeStore, load_idx_list)
from representation_disentanglement_tpu.data.device_store import (
    DeviceBatchLoader, build_device_cache)
from representation_disentanglement_tpu.data.synthetic import (
    make_synthetic_dataset)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("dev")
    make_synthetic_dataset(str(d), "BraTS", ("T1", "T2"), "z-score",
                           n_subj=5, shape=(32, 48, 16), slice_range=(4, 12))
    store = VolumeStore(f"{d}/BraTS_All_zscore_10.h5")
    subjs, idxs = load_idx_list(f"{d}/fold_BraTS_0_train_noval.txt")
    return store, subjs, idxs


def test_device_gather_matches_host(env):
    store, subjs, idxs = env
    cache = build_device_cache("BraTS", store, subjs, ("T1", "T2"),
                               block_size=3, dtype=jnp.float32,
                               clamp_max=155)
    loader = DeviceBatchLoader(cache, subjs, idxs, batch_size=4,
                               shuffle=False, drop_last=True)
    host = SliceDataset("BraTS", store, subjs, idxs, block_size=3,
                        contrast_list=["T1", "T2"], image_size=(32, 48))
    batch = next(iter(loader))
    for j in range(4):
        s = host[j]
        np.testing.assert_allclose(np.asarray(batch["inputs"][:, j]),
                                   s["inputs"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(batch["targets"][j]),
                                   s["targets"], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(batch["mask"][j]),
                                      s["mask"])
        np.testing.assert_array_equal(np.asarray(batch["mask_img"][j]),
                                      s["mask_img"])
        assert batch["subj_id"][j] == s["subj_id"]


def test_budget_fallback(env):
    store, subjs, idxs = env
    assert build_device_cache("BraTS", store, subjs, ("T1", "T2"),
                              budget_bytes=10) is None


def test_dropoff_on_device(env):
    store, subjs, idxs = env
    cache = build_device_cache("BraTS", store, subjs, ("T1", "T2"),
                               block_size=3, clamp_max=155)
    rngseed = 0
    loader = DeviceBatchLoader(cache, subjs, idxs, batch_size=8,
                               shuffle=False, drop_last=False, dropoff=True,
                               seed=rngseed)
    dropped = 0
    for _ in range(5):
        for batch in loader:
            m = np.asarray(batch["mask"])
            dropped += int((m.sum(1) < 2).sum())
            # dropped modality inputs must be zeroed
            for j in range(m.shape[0]):
                for mi in range(2):
                    if m[j, mi] == 0:
                        assert (np.asarray(
                            batch["inputs"][mi, j]) == 0).all()
    assert dropped > 0
