"""Aux subsystems: visualization, classification metrics, legacy
transforms, 3D datasets, VGG feature extractor."""

import os
import pickle

import numpy as np
import pytest

from representation_disentanglement_tpu.data.transforms import (
    AddNoise, CenterCropAndPad, Compose, Dropoff, MedicalDataset, Tile)
from representation_disentanglement_tpu.utils.classification import (
    classification_metrics, compute_stat, roc_auc)
from representation_disentanglement_tpu.utils.visualize import (
    hsv_to_rgb, jet_colormap, rgb_to_hsv, save_test_result,
    save_test_result_by_volume)


def test_transforms(rng):
    x = rng.random((64, 96, 4)).astype(np.float32)
    noised = AddNoise(0.1, rng)(x)
    assert noised.min() >= 0 and noised.shape == x.shape
    dropped = Dropoff(rng=rng)(x.copy())
    zero_cols = [(dropped[:, :, i] == 0).all() for i in range(4)]
    assert any(zero_cols) or (dropped == x).all()
    assert Tile(3)(x[:, :, :1]).shape == (64, 96, 3)
    assert CenterCropAndPad((32, 64))(x).shape == (32, 64, 4)
    assert CenterCropAndPad((96, 128))(x).shape == (96, 128, 4)
    with pytest.raises(ValueError):
        CenterCropAndPad((33, 64))(x)


def test_medical_dataset(tmp_path, rng):
    samples = [{"input": rng.random((32, 32, 4)).astype(np.float32),
                "target": rng.random((32, 32, 1)).astype(np.float32),
                "label": 1}]
    p = tmp_path / "d.pkl"
    with open(p, "wb") as f:
        pickle.dump(samples, f)
    ds = MedicalDataset(str(p), task="reconstruction", contrast_idx=[0, 2])
    s = ds[0]
    assert s["input"].shape == (32, 32, 2)
    ds_c = MedicalDataset(str(p), task="classification")
    assert ds_c[0]["label"] == 1


def test_classification_metrics():
    real = np.array([1, 1, 0, 0, 1, 0])
    fake = np.array([1, 0, 0, 1, 1, 0])
    m = classification_metrics(real, fake)
    assert m["tpr"] == pytest.approx(2 / 3)
    assert m["tnr"] == pytest.approx(2 / 3)
    assert m["dice"] == pytest.approx(2 * 2 / (2 * 2 + 1 + 1))
    assert roc_auc(real, fake) == pytest.approx(2 / 3)
    st = compute_stat(real.astype(float), fake.astype(float), task="cls")
    assert st["alvd"] == 0.0


def test_color_roundtrip(rng):
    rgb = rng.random((8, 8, 3))
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-6)
    jet = jet_colormap(np.linspace(0, 1, 16))
    assert jet.shape == (16, 3) and jet.min() >= 0 and jet.max() <= 1


def test_save_test_result(tmp_path, rng):
    res = {"real_A": rng.random((2, 3, 32, 48)).astype(np.float32),
           "real_B": rng.random((2, 1, 32, 48)).astype(np.float32),
           "fake_B": rng.random((2, 1, 32, 48)).astype(np.float32),
           "alpha_1": rng.random((2, 1, 16, 24)).astype(np.float32)}
    save_test_result(res, str(tmp_path), bs=2, iteration=0,
                     save_att_maps=True)
    assert os.path.exists(tmp_path / "000.jpg")
    assert os.path.exists(tmp_path / "001_att_maps.jpg")


def test_volume_reassembly(tmp_path, rng):
    real = rng.random((10, 32, 48)).astype(np.float32)
    fake = (real + 0.05 * rng.random((10, 32, 48))).astype(np.float32)
    stats = save_test_result_by_volume(real, fake, str(tmp_path),
                                       save_nifti=False, slice_per_subj=5)
    assert len(stats["psnr"]) == 2
    assert all(p > 10 for p in stats["psnr"])


def test_dataset3d(tmp_path, rng):
    from representation_disentanglement_tpu.data.dataset import VolumeStore
    from representation_disentanglement_tpu.data.dataset3d import (
        VolumeDataset3D, collate_volumes)
    vols = {}
    for subj in ("s0", "s1"):
        for c in ("T1", "T2"):
            vols[f"{subj}/{c}"] = rng.random((16, 24, 100)).astype(
                np.float32)
        vols[f"{subj}/seg"] = (rng.random((16, 24, 100)) > 0.9).astype(
            np.float32) * 4
    store = VolumeStore(data=vols)
    ds = VolumeDataset3D("BraTS", store, ["s0", "s1"],
                         contrast_list=["T1", "T2"], aug=True,
                         image_size=(16, 24, 9), rng=rng)
    s = ds[0]
    assert s["inputs"].shape == (2, 9, 16, 24)      # [M, D, H, W], 100-91
    assert s["targets"].shape == (9, 16, 24, 1)
    assert s["targets"].max() <= 3
    batch = collate_volumes([ds[0], ds[1]])
    assert batch["inputs"].shape == (2, 9, 16, 24, 2)


def test_vgg_features_shapes(rng):
    import jax.numpy as jnp
    from representation_disentanglement_tpu.models.vgg import (
        VGG16_PLAN, gram_matrix, vgg16_features)
    params = {}
    ci = 3
    k = 0
    for item in VGG16_PLAN:
        if item == "M":
            continue
        params[f"conv{k}_kernel"] = rng.normal(
            size=(3, 3, ci, item)).astype(np.float32) * 0.01
        params[f"conv{k}_bias"] = np.zeros(item, np.float32)
        ci = item
        k += 1
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    taps = (0, 5, 10, 17, 21, 24)
    outs = vgg16_features(x, params, taps)
    assert outs[0].shape == (1, 64, 64, 3)
    assert outs[1].shape == (1, 32, 32, 64)       # after pool1
    assert outs[2].shape == (1, 16, 16, 128)      # after pool2
    assert outs[4].shape == (1, 8, 8, 512)        # conv4_2 act (post-relu
                                                  # of conv4_2 = idx 21's
                                                  # input relu applied)
    g = gram_matrix(outs[1])
    assert g.shape == (1, 64, 64)
