"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY §2.7: no torch.distributed anywhere);
scaling here is first-class: a ``jax.sharding.Mesh`` with a ``data`` axis
shards the global batch, parameters are replicated, and XLA inserts the
gradient ``psum`` over ICI automatically when the jitted train step consumes
sharded batches and produces replicated params.

Batches are modality-major ``[M, B, ...]`` — the batch axis is dim 1 for
inputs and dim 0 for targets/masks, handled by `shard_batch`.  Microbatch
stacks ``[A, M, B, ...]`` shard on the same per-tensor batch axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_data or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


_BATCH_AXIS = {  # which dim of each batch tensor is the sample axis
    "inputs": 1,       # [M, B, H, W, C]
    "targets": 0,      # [B, H, W, C]
    "mask": 0,         # [B, M]
    "mask_img": 0,     # [B, H, W]
    "slice_idx": 0,
}


def batch_sharding(mesh: Mesh, key: str, ndim: int, stacked: bool = False,
                   axis: str = "data") -> NamedSharding:
    d = _BATCH_AXIS.get(key, 0) + (1 if stacked else 0)
    spec = [None] * ndim
    spec[d] = axis
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: dict, mesh: Mesh, stacked: bool = False):
    """Place a (possibly microbatch-stacked) batch dict onto the mesh with
    the sample axis sharded over `data`."""
    out = {}
    for k, v in batch.items():
        if k == "subj_id":
            out[k] = v
            continue
        sh = batch_sharding(mesh, k, np.ndim(v), stacked)
        out[k] = jax.device_put(v, sh)
    return out
