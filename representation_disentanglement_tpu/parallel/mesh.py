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


def mesh_from_config(cfg) -> Optional[Mesh]:
    """Build the data-parallel mesh requested by ``cfg.mesh_shape`` (a
    TPU-native config addition, config.py: ``mesh_shape: {data: N}``).
    Returns None for the single-device configuration."""
    n = int((cfg.mesh_shape or {}).get("data", 1) or 1)
    if n <= 1:
        return None
    devs = jax.devices()
    if len(devs) < n:
        raise ValueError(
            f"config mesh_shape data={n} but only {len(devs)} devices are "
            f"visible ({[str(d) for d in devs[:4]]}...)")
    if cfg.batch_size % n:
        raise ValueError(
            f"batch_size {cfg.batch_size} must be divisible by the data-"
            f"mesh size {n} (global batch is sharded over the data axis)")
    return make_mesh(n)


def shard_epoch_plan(plan, mesh: Mesh, axis: str = "data"):
    """Shard a whole-epoch device plan (training/epoch.epoch_indices) over
    the data axis: rows/slices [steps, A, B] and drop [steps, A, B, M] shard
    on the per-step batch dim; RNG keys and pair draws are replicated."""
    rows, slices, drop, rng_keys, sim, adv = plan
    bsh = NamedSharding(mesh, P(None, None, axis))
    rep = NamedSharding(mesh, P())
    return (jax.device_put(rows, bsh), jax.device_put(slices, bsh),
            jax.device_put(drop, NamedSharding(mesh, P(None, None, axis,
                                                       None))),
            jax.device_put(rng_keys, rep), jax.device_put(sim, rep),
            jax.device_put(adv, rep))
