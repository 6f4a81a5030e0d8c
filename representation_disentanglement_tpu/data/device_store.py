"""Device-resident volume cache + on-device slice-block gather.

The reference reads each 7-slice block from h5py per sample
(src/util.py:508-516) and re-reads the 6/7 overlapping slices of adjacent
samples from disk every time (SURVEY §7.4 item 6).  Even with host-RAM
packing, shipping ~27MB per batch over the host<->TPU link dominates step
time (measured: the 6.8ms train step waits tens of ms on H2D).

TPU-native answer: upload every volume ONCE into HBM as a packed
``[S, M, D, H, W]`` (bf16 by default: the full 369-subject BraTS set is
~14GB; the training fold fits comfortably) and gather each batch's blocks
with a jitted dynamic-slice — a training batch then costs only a handful of
int32 indices over the link.

Falls back automatically (returns None) when the packed array would exceed
``budget_bytes``.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from representation_disentanglement_tpu.data.dataset import (
    VolumeStore, _TARGET_KEY)


class DeviceVolumeCache:
    """vols: [S, M, D, H, W] device array; tgts: [S, D, H, W];
    presence: [S, M]; subject order matches ``subjects``."""

    def __init__(self, vols, tgts, presence, subjects: List[str],
                 block_size: int, clamp_hi: int):
        self.vols = vols
        self.tgts = tgts
        self.presence = presence
        self.subjects = subjects
        self.row = {s: i for i, s in enumerate(subjects)}
        self.block_size = block_size
        self.clamp_hi = clamp_hi

    @property
    def nbytes(self) -> int:
        return self.vols.size * self.vols.dtype.itemsize


def build_device_cache(dataset_name: str, store: VolumeStore,
                       subj_list: Sequence[str],
                       contrast_list: Sequence[str], block_size: int = 3,
                       dtype=jnp.bfloat16,
                       budget_bytes: int = 12 * 2**30,
                       clamp_max: int = 155
                       ) -> Optional[DeviceVolumeCache]:
    subjects = [str(s) for s in dict.fromkeys(np.asarray(subj_list).tolist())]
    if not subjects:
        return None
    # probe shape from the first present volume
    probe = None
    for s in subjects:
        for c in contrast_list:
            if f"{s}/{c}" in store:
                probe = store.get(f"{s}/{c}")
                break
        if probe is not None:
            break
    if probe is None:
        return None
    H, W, D = probe.shape
    S, M = len(subjects), len(contrast_list)
    itemsize = jnp.dtype(dtype).itemsize
    if S * M * D * H * W * itemsize > budget_bytes:
        return None

    vols = np.zeros((S, M, D, H, W), np.float32)
    presence = np.zeros((S, M), np.float32)
    tgts = np.zeros((S, D, H, W), np.float32)
    tkey = _TARGET_KEY.get(dataset_name)
    for si, subj in enumerate(subjects):
        for mi, c in enumerate(contrast_list):
            key = f"{subj}/{c}"
            if key in store:
                vols[si, mi] = np.transpose(store.get(key), (2, 0, 1))
                presence[si, mi] = 1.0
        if tkey is not None and f"{subj}/{tkey}" in store:
            t = np.transpose(store.get(f"{subj}/{tkey}"), (2, 0, 1))
            if dataset_name == "BraTS":
                t = t.copy()
                t[t == 4] = 3.0
            tgts[si] = t
    return DeviceVolumeCache(
        jax.device_put(vols.astype(jnp.dtype(dtype))),
        jax.device_put(tgts.astype(np.float32)),
        jax.device_put(presence), subjects, block_size,
        min(clamp_max, D) )


@functools.partial(jax.jit, static_argnames=("block_size",))
def gather_blocks(vols, tgts, presence, rows, slices, drop_mask,
                  block_size: int = 3):
    """On-device batch assembly.

    rows, slices: int32 [B]; drop_mask: [B, M] multiplier (host-drawn
    dropoff; all-ones when off).  Returns the standard batch dict:
    inputs [M, B, H, W, bc] (f32), targets [B, H, W, 1], mask [B, M],
    mask_img [B, H, W].
    """
    b = block_size
    bc = 2 * b + 1

    def one(row, sl):
        v = jax.lax.dynamic_slice_in_dim(vols[row], sl - b, bc, axis=1)
        t = jax.lax.dynamic_index_in_dim(tgts[row], sl, axis=0,
                                         keepdims=False)
        return v, t                               # [M, bc, H, W], [H, W]

    v, t = jax.vmap(one)(rows, slices)            # [B, M, bc, H, W]
    mask = jnp.take(presence, rows, axis=0) * drop_mask          # [B, M]
    inputs = jnp.transpose(v, (1, 0, 3, 4, 2)).astype(jnp.float32)
    inputs = inputs * mask.T[:, :, None, None, None]
    targets = t[..., None]
    mask_img = (inputs[0, :, :, :, 0] == 0).astype(jnp.float32)
    return {"inputs": inputs, "targets": targets, "mask": mask,
            "mask_img": mask_img}


class DeviceBatchLoader:
    """Batch iterator over a DeviceVolumeCache: host work is index
    shuffling + an optional dropoff draw; all tensor assembly is on-device."""

    def __init__(self, cache: DeviceVolumeCache, subj_list, idx_list,
                 batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, dropoff: bool = False,
                 seed: int = 10):
        self.cache = cache
        self.rows = np.array([cache.row[str(s)] for s in subj_list],
                             np.int32)
        b = cache.block_size
        D = cache.vols.shape[2]
        # reference clamp (util.py:477-484) + hard bound so the device
        # dynamic_slice never clips (sl + b + 1 <= D)
        hi = min(cache.clamp_hi - b, D - b - 1)
        self.slices = np.clip(np.asarray(idx_list, np.int64), b,
                              hi).astype(np.int32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.dropoff = dropoff
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.rows)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.rows))
        if self.shuffle:
            self.rng.shuffle(order)
        n = len(order)
        stop = n // self.batch_size * self.batch_size if self.drop_last \
            else n
        M = self.cache.presence.shape[1]
        presence_np = np.asarray(self.cache.presence)
        for lo in range(0, stop, self.batch_size):
            sel = order[lo:lo + self.batch_size]
            rows = self.rows[sel]
            drop = np.ones((len(sel), M), np.float32)
            if self.dropoff:
                for j, r in enumerate(rows):
                    pres = np.where(presence_np[r] > 0)[0]
                    if len(pres) > 1 and self.rng.random() > 0.8:
                        drop[j, self.rng.choice(pres)] = 0.0
            batch = gather_blocks(
                self.cache.vols, self.cache.tgts, self.cache.presence,
                jnp.asarray(rows), jnp.asarray(self.slices[sel]),
                jnp.asarray(drop), block_size=self.cache.block_size)
            batch = dict(batch)
            batch["subj_id"] = [self.cache.subjects[r] for r in rows]
            batch["slice_idx"] = self.slices[sel]
            yield batch
