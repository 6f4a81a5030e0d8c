"""Batch assembly + double-buffered device prefetch.

Replaces the reference's single-threaded torch DataLoader (num_workers=0,
src/util.py:706-708, main_missing.py:63): batches are gathered in numpy on a
background thread, converted to modality-major NHWC device arrays, and
prefetched so host IO overlaps TPU compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np


class BatchLoader:
    """Iterates dict batches:
    inputs [M, B, H, W, Cb], targets [B, H, W, Ct], mask [B, M],
    mask_img [B, H, W], subj_id list[B], slice_idx [B].

    Drops failed (None) samples like nonechucks.SafeDataset
    (src/util.py:702-704); short final batches are dropped in training
    (drop_last) and kept in eval."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 10,
                 prefetch: int = 2, to_device: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.to_device = to_device

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _collate(self, samples):
        inputs = np.stack([s["inputs"] for s in samples], 1)  # [M, B, H, W, C]
        batch = {
            "inputs": inputs,
            "targets": np.stack([s["targets"] for s in samples], 0),
            "mask": np.stack([s["mask"] for s in samples], 0),
            "mask_img": np.stack([s["mask_img"] for s in samples], 0),
            "slice_idx": np.array([s["slice_idx"] for s in samples]),
        }
        subj = [s["subj_id"] for s in samples]
        if self.to_device:
            batch = {k: jax.device_put(v) for k, v in batch.items()}
        batch["subj_id"] = subj
        return batch

    def _batches(self) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        # vectorized batch-gather fast path (SliceDataset.get_batch)
        fast = getattr(self.dataset, "get_batch", None)
        if fast is not None:
            n = len(order)
            stop = (n // self.batch_size * self.batch_size
                    if self.drop_last else n)
            for lo in range(0, stop, self.batch_size):
                batch = fast(order[lo:lo + self.batch_size].tolist())
                subj = batch.pop("subj_id")
                if self.to_device:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                batch["subj_id"] = subj
                yield batch
            return
        buf = []
        for idx in order:
            s = self.dataset[int(idx)]
            if s is None:
                continue
            buf.append(s)
            if len(buf) == self.batch_size:
                yield self._collate(buf)
                buf = []
        if buf and not self.drop_last:
            yield self._collate(buf)

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            except Exception as e:          # surfaced on the main thread
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        if err:
            raise err[0]
