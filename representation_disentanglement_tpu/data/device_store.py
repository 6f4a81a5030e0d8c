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


def _pack_host(dataset_name: str, store: VolumeStore,
               subj_list: Sequence[str], contrast_list: Sequence[str]):
    """Host-side packing shared by the replicated and mesh-sharded caches:
    returns (vols [S, M, D, H, W] f32, tgts [S, D, H, W], presence [S, M],
    subjects) or None when no volume is present."""
    subjects = [str(s) for s in dict.fromkeys(np.asarray(subj_list).tolist())]
    if not subjects:
        return None
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
    return vols, tgts, presence, subjects


def build_device_cache(dataset_name: str, store: VolumeStore,
                       subj_list: Sequence[str],
                       contrast_list: Sequence[str], block_size: int = 3,
                       dtype=jnp.bfloat16,
                       budget_bytes: int = 12 * 2**30,
                       clamp_max: int = 155
                       ) -> Optional[DeviceVolumeCache]:
    packed = _pack_host(dataset_name, store, subj_list, contrast_list)
    if packed is None:
        return None
    vols, tgts, presence, subjects = packed
    itemsize = jnp.dtype(dtype).itemsize
    if vols.size * itemsize > budget_bytes:
        return None
    D = vols.shape[2]
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


class ShardedVolumeCache:
    """Volume cache SHARDED over a data mesh (VERDICT r3 item 2).

    The replicated cache pays the full dataset's HBM on EVERY mesh device
    (main_missing.run used to `replicate` the packed arrays), so DP scaled
    compute but not data capacity.  Here subjects are dealt round-robin
    onto the ``data`` axis: ``vols`` is ``[N, S_loc, M, D, H, W]`` with a
    ``P('data')`` sharding (each chip materializes ONLY its own
    ``[1, S_loc, ...]`` shard), so per-chip cache bytes are ~total/N.
    Batches are assembled locality-aware: each device's rows come from its
    resident subjects (``gather_blocks_sharded`` vmaps the per-device
    gather over the sharded axis — elementwise in the mesh dimension, so
    XLA's SPMD partitioner keeps it communication-free).

    ``row`` maps subject -> GLOBAL padded index dev * S_loc + local (the
    convention the sharded epoch plan uses); padding rows have presence 0.
    """

    def __init__(self, vols, tgts, presence, subjects: List[str],
                 block_size: int, clamp_hi: int, mesh, axis: str = "data"):
        self.vols = vols                       # [N, S_loc, M, D, H, W]
        self.tgts = tgts                       # [N, S_loc, D, H, W]
        self.presence = presence               # [N, S_loc, M]
        self.subjects = subjects               # length N * S_loc, '' = pad
        self.row = {s: i for i, s in enumerate(subjects) if s}
        self.block_size = block_size
        self.clamp_hi = clamp_hi
        self.mesh = mesh
        self.axis = axis
        self.n_shards = vols.shape[0]
        self.s_loc = vols.shape[1]

    @property
    def nbytes(self) -> int:                    # total across the mesh
        return self.vols.size * self.vols.dtype.itemsize

    @property
    def nbytes_per_chip(self) -> int:
        return self.nbytes // self.n_shards


def build_sharded_device_cache(dataset_name: str, store: VolumeStore,
                               subj_list: Sequence[str],
                               contrast_list: Sequence[str], mesh,
                               axis: str = "data", block_size: int = 3,
                               dtype=jnp.bfloat16,
                               budget_bytes: int = 12 * 2**30,
                               clamp_max: int = 155
                               ) -> Optional[ShardedVolumeCache]:
    """Like build_device_cache but subject-sharded over ``mesh[axis]``.
    ``budget_bytes`` bounds the PER-CHIP shard."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    packed = _pack_host(dataset_name, store, subj_list, contrast_list)
    if packed is None:
        return None
    vols, tgts, presence, subjects = packed
    S, M, D, H, W = vols.shape
    n = int(mesh.shape[axis])
    s_loc = -(-S // n)                         # ceil: pad to equal shards
    pad = n * s_loc - S
    itemsize = jnp.dtype(dtype).itemsize
    if s_loc * M * D * H * W * itemsize > budget_bytes:
        return None
    if pad:
        z = lambda a: np.concatenate(
            [a, np.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        vols, tgts, presence = z(vols), z(tgts), z(presence)
        subjects = subjects + [""] * pad
    # round-robin subject -> shard: subjects[g] lives at
    # (dev g % n, local g // n); reorder so reshape(n, s_loc) is the deal
    order = np.argsort(np.arange(n * s_loc) % n, kind="stable")
    vols, tgts, presence = vols[order], tgts[order], presence[order]
    subjects = [subjects[i] for i in order]

    sh = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    vols = sh(vols.reshape(n, s_loc, M, D, H, W).astype(jnp.dtype(dtype)),
              P(axis))
    tgts = sh(tgts.reshape(n, s_loc, D, H, W).astype(np.float32), P(axis))
    presence = sh(presence.reshape(n, s_loc, M), P(axis))
    return ShardedVolumeCache(vols, tgts, presence, subjects, block_size,
                              min(clamp_max, D), mesh, axis)


@functools.partial(jax.jit, static_argnames=("block_size",))
def gather_blocks_sharded(vols, tgts, presence, rows, slices, drop_mask,
                          block_size: int = 3):
    """Locality-aware batch assembly over the sharded cache.

    vols [N, S_loc, M, D, H, W] (sharded dim 0); rows/slices int32 [N, b]
    LOCAL indices into each device's shard (sharded dim 0); drop [N, b, M].
    Returns the standard batch dict with global batch N*b, sample axis
    sharded over the mesh: inputs [M, N*b, H, W, bc], targets
    [N*b, H, W, 1], mask [N*b, M], mask_img [N*b, H, W]."""
    per_dev = jax.vmap(functools.partial(gather_blocks.__wrapped__,
                                         block_size=block_size))
    out = per_dev(vols, tgts, presence, rows, slices, drop_mask)
    inputs = out["inputs"]                      # [N, M, b, H, W, bc]
    N, M, b = inputs.shape[:3]
    return {
        "inputs": jnp.transpose(inputs, (1, 0, 2, 3, 4, 5)).reshape(
            (M, N * b) + inputs.shape[3:]),
        "targets": out["targets"].reshape((N * b,) +
                                          out["targets"].shape[2:]),
        "mask": out["mask"].reshape(N * b, -1),
        "mask_img": out["mask_img"].reshape((N * b,) +
                                            out["mask_img"].shape[2:]),
    }


class ShardedEvalBatchLoader:
    """Exhaustive single-pass iterator over a ShardedVolumeCache for
    evaluation (VERDICT r4 item 7: val/test caches sharded over the mesh).

    Eval must visit EVERY sample exactly once, but locality pins each
    sample to the device holding its subject's volumes, and shards are not
    perfectly balanced — so every batch is a full ``[N, b_loc]`` plan and
    short shards are padded with repeats carrying ``valid=0`` AND
    ``mask=0``: an all-modalities-missing row contributes exactly zero to
    every mask-gated loss (the present-count normalization excludes it,
    losses.py), while metrics and the results_all.h5 dump drop the padded
    rows host-side via the yielded ``valid`` vector.  Row order is
    shard-major (device 0's subjects first within each batch) instead of
    fold order; each dump row still carries subj_id + slice_idx, and the
    equivalence with replicated-cache eval is asserted in
    tests/test_sharded_cache.py."""

    def __init__(self, cache: ShardedVolumeCache, subj_list, idx_list,
                 batch_size: int, dropoff: bool = False, seed: int = 10):
        if batch_size % cache.n_shards:
            raise ValueError(f"batch_size {batch_size} must divide by the "
                             f"mesh size {cache.n_shards}")
        self.cache = cache
        self.batch_size = batch_size
        self.b_loc = batch_size // cache.n_shards
        self.dropoff = dropoff      # reference applies dropoff on VAL too
        self.rng = np.random.default_rng(seed)   # (src/util.py:703, :538)
        b = cache.block_size
        D = cache.vols.shape[3]
        hi = min(cache.clamp_hi - b, D - b - 1)
        self.groups = [[] for _ in range(cache.n_shards)]
        for s, idx in zip(np.asarray(subj_list), np.asarray(idx_list)):
            g = cache.row[str(s)]
            dev, loc = divmod(g, cache.s_loc)
            self.groups[dev].append((loc, int(np.clip(idx, b, hi))))
        self.groups = [np.asarray(g, np.int32).reshape(-1, 2)
                       for g in self.groups]
        self._presence_np = np.asarray(cache.presence)   # [N, S_loc, M]

    def __len__(self):
        longest = max(len(g) for g in self.groups)
        return -(-longest // self.b_loc)

    def __iter__(self):
        N, b = self.cache.n_shards, self.b_loc
        n_batches = len(self)
        M = self.cache.presence.shape[-1]
        rows = np.zeros((n_batches, N, b), np.int32)
        slices = np.zeros((n_batches, N, b), np.int32)
        valid = np.zeros((n_batches, N, b), bool)
        for n, g in enumerate(self.groups):
            k = len(g)
            if k:
                flat_r = np.resize(g[:, 0], n_batches * b)   # repeats pad
                flat_s = np.resize(g[:, 1], n_batches * b)
            else:                       # shard with no eval subjects
                flat_r = np.zeros(n_batches * b, np.int32)
                flat_s = np.full(n_batches * b,
                                 self.cache.block_size, np.int32)
            rows[:, n] = flat_r.reshape(n_batches, b)
            slices[:, n] = flat_s.reshape(n_batches, b)
            v = np.zeros(n_batches * b, bool)
            v[:k] = True
            valid[:, n] = v.reshape(n_batches, b)
        drop = valid[..., None].astype(np.float32) * np.ones(
            (1, 1, 1, M), np.float32)                   # mask=0 on padding
        if self.dropoff:
            for i in range(n_batches):
                for n in range(N):
                    for j in range(b):
                        if not valid[i, n, j]:
                            continue
                        pres = np.where(
                            self._presence_np[n, rows[i, n, j]] > 0)[0]
                        if len(pres) > 1 and self.rng.random() > 0.8:
                            drop[i, n, j, self.rng.choice(pres)] = 0.0
        for i in range(n_batches):
            batch = gather_blocks_sharded(
                self.cache.vols, self.cache.tgts, self.cache.presence,
                jnp.asarray(rows[i]), jnp.asarray(slices[i]),
                jnp.asarray(drop[i]), block_size=self.cache.block_size)
            batch = dict(batch)
            gl = (rows[i] + np.arange(N)[:, None] *
                  self.cache.s_loc).reshape(-1)
            batch["subj_id"] = [self.cache.subjects[r] for r in gl]
            batch["slice_idx"] = slices[i].reshape(-1)
            batch["valid"] = valid[i].reshape(-1)
            yield batch


class ShardedDeviceBatchLoader:
    """Batch iterator over a ShardedVolumeCache.

    Each global batch of size ``batch_size`` draws ``batch_size / N`` rows
    from every device's resident subjects (locality: no cross-chip volume
    traffic).  Iteration length is bounded by the SMALLEST shard's sample
    count — a few tail samples of imbalanced shards are skipped per epoch
    (different epochs reshuffle, so coverage evens out); use the replicated
    cache when exact single-pass semantics matter more than HBM."""

    def __init__(self, cache: ShardedVolumeCache, subj_list, idx_list,
                 batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, dropoff: bool = False,
                 seed: int = 10):
        if batch_size % cache.n_shards:
            raise ValueError(f"batch_size {batch_size} must divide by the "
                             f"mesh size {cache.n_shards}")
        self.cache = cache
        self.batch_size = batch_size
        self.b_loc = batch_size // cache.n_shards
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.dropoff = dropoff
        self.rng = np.random.default_rng(seed)
        b = cache.block_size
        D = cache.vols.shape[3]
        hi = min(cache.clamp_hi - b, D - b - 1)
        # per-device sample groups: (local_row, slice) for every dataset
        # sample whose subject resides on that device
        self.groups = [[] for _ in range(cache.n_shards)]
        for s, idx in zip(np.asarray(subj_list), np.asarray(idx_list)):
            g = cache.row[str(s)]
            dev, loc = divmod(g, cache.s_loc)
            self.groups[dev].append((loc, int(np.clip(idx, b, hi))))
        self.groups = [np.asarray(g, np.int32).reshape(-1, 2)
                       for g in self.groups]
        self._presence_np = np.asarray(cache.presence)   # [N, S_loc, M]

    @property
    def steps_per_pass(self) -> int:
        return min(len(g) for g in self.groups) // self.b_loc

    def __len__(self):
        return self.steps_per_pass

    def plan(self, n_batches: int):
        """Shuffled per-device index plan: (rows, slices, drop) each
        [n_batches, N, b_loc(, M)] — the layout gather_blocks_sharded and
        the sharded epoch plan consume."""
        N, b = self.cache.n_shards, self.b_loc
        rows = np.zeros((n_batches, N, b), np.int32)
        slices = np.zeros((n_batches, N, b), np.int32)
        M = self._presence_np.shape[-1]
        drop = np.ones((n_batches, N, b, M), np.float32)
        for n, g in enumerate(self.groups):
            order = np.arange(len(g))
            if self.shuffle:
                self.rng.shuffle(order)
            sel = g[order[:n_batches * b]].reshape(n_batches, b, 2)
            rows[:, n] = sel[..., 0]
            slices[:, n] = sel[..., 1]
            if self.dropoff:
                for i in range(n_batches):
                    for j in range(b):
                        pres = np.where(
                            self._presence_np[n, rows[i, n, j]] > 0)[0]
                        if len(pres) > 1 and self.rng.random() > 0.8:
                            drop[i, n, j, self.rng.choice(pres)] = 0.0
        return rows, slices, drop

    def __iter__(self):
        n_batches = self.steps_per_pass
        if n_batches == 0:
            return
        rows, slices, drop = self.plan(n_batches)
        for i in range(n_batches):
            batch = gather_blocks_sharded(
                self.cache.vols, self.cache.tgts, self.cache.presence,
                jnp.asarray(rows[i]), jnp.asarray(slices[i]),
                jnp.asarray(drop[i]), block_size=self.cache.block_size)
            batch = dict(batch)
            gl = (rows[i] + np.arange(self.cache.n_shards)[:, None] *
                  self.cache.s_loc).reshape(-1)
            batch["subj_id"] = [self.cache.subjects[r] for r in gl]
            batch["slice_idx"] = slices[i].reshape(-1)
            yield batch
