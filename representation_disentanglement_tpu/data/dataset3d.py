"""Whole-volume 3D datasets (reference src/util.py:723-843).

``VolumeDataset3D`` emits per-subject volume slabs for the NVNet3D path:
BraTS uses the depth slab [45:-46] of the 155-slice volume (64 slices),
ZeroDose [45:-47]; augmentation is an H-flip plus random intensity
scale/shift with the background re-pinned to -10 (src/util.py:798-805).

Output layout is [M, D, H, W] per sample (depth-major spatial dims for the
depth-sharded model); targets [D, H, W, 1].
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from representation_disentanglement_tpu.data.dataset import (
    VolumeStore, _TARGET_KEY)


class VolumeDataset3D:
    def __init__(self, dataset_name: str, store: VolumeStore,
                 subj_list: Sequence[str],
                 contrast_list: Sequence[str] = ("T1",), aug: bool = False,
                 dropoff: bool = False, image_size=(160, 192, 64),
                 slab: Optional[slice] = None,
                 rng: Optional[np.random.Generator] = None):
        self.dataset_name = dataset_name
        self.store = store
        self.subj_list = list(subj_list)
        self.contrast_list = list(contrast_list)
        self.aug = aug
        self.dropoff = dropoff
        self.image_size = list(image_size)      # (H, W, D)
        if slab is None:
            slab = slice(45, -47) if dataset_name == "ZeroDose" \
                else slice(45, -46)             # src/util.py:766-769
        self.slab = slab
        self.rng = rng or np.random.default_rng(10)

    def __len__(self):
        return len(self.subj_list)

    def __getitem__(self, idx: int) -> Optional[dict]:
        try:
            subj = str(self.subj_list[idx])
            H, W, D = self.image_size
            imgs, mask = [], []
            for contrast in self.contrast_list:
                key = f"{subj}/{contrast}"
                if key in self.store:
                    imgs.append(self.store.get(key)[:, :, self.slab])
                    mask.append(1)
                else:
                    imgs.append(np.zeros((H, W, D), np.float32))
                    mask.append(0)
            mask = np.array(mask, np.float32)
            inputs = np.stack(imgs, 0)                    # [M, H, W, D]

            tkey = _TARGET_KEY.get(self.dataset_name)
            if tkey and f"{subj}/{tkey}" in self.store:
                targets = self.store.get(f"{subj}/{tkey}")[
                    :, :, self.slab].copy()
                if self.dataset_name == "BraTS":
                    targets[targets == 4] = 3.0
            else:
                targets = np.zeros((H, W, D), np.float32)

            if self.dropoff and mask.sum() > 1:
                if self.rng.random() > 0.8:
                    drop = self.rng.choice(np.where(mask == 1)[0])
                    inputs[drop] = 0.0
                    mask[drop] = 0.0

            if self.aug:
                if self.rng.random() > 0.5:               # H flip
                    inputs = inputs[:, ::-1].copy()
                    targets = targets[::-1].copy()
                scale = 1 + 0.2 * (self.rng.random() - 0.5)
                shift = 0.2 * (self.rng.random() - 0.5)
                inputs = inputs * scale + shift
                inputs[inputs == inputs.min()] = -10.0    # src/util.py:805

            # [M, H, W, D] -> [M, D, H, W] (depth-major for the 3D model)
            inputs = np.transpose(inputs, (0, 3, 1, 2))
            targets = np.transpose(targets, (2, 0, 1))[..., None]
            return {"inputs": inputs.astype(np.float32),
                    "targets": targets.astype(np.float32),
                    "subj_id": subj, "mask": mask, "slice_idx": 0,
                    "mask_img": (inputs[0, :, :, 0] == 0).astype(
                        np.float32)}
        except Exception:
            return None


def collate_volumes(samples):
    """[M, D, H, W] samples -> batch dict with inputs [B, D, H, W, M]
    (modalities as channels, the NVNet3D input convention)."""
    inputs = np.stack([np.transpose(s["inputs"], (1, 2, 3, 0))
                       for s in samples], 0)
    return {
        "inputs": inputs,
        "targets": np.stack([s["targets"] for s in samples], 0),
        "mask": np.stack([s["mask"] for s in samples], 0),
        "subj_id": [s["subj_id"] for s in samples],
    }
