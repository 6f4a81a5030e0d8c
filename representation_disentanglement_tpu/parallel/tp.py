"""Channel (tensor) parallelism for the scaled 3D variant (SURVEY §2.7).

The 2D model (~32M params) fits per chip, so TP is an *optional* axis used
by the whole-volume NVNet3D at larger ``init_channels``: conv kernels are
sharded on their output-channel axis over a ``model`` mesh axis and the
activations on their channel axis; XLA's SPMD partitioner propagates the
shardings and inserts the reduce-scatter/all-gather collectives over ICI.

Usage:
    mesh = make_tp_mesh(n)
    sharded_params = shard_params_by_channel(params, mesh)
    y = jax.jit(model.apply)({"params": sharded_params}, x)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(n: int, axis: str = "model") -> Mesh:
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), (axis,))


def channel_sharding(mesh: Mesh, leaf: Any, axis: str = "model"
                     ) -> NamedSharding:
    """Shard the trailing (output-channel) dim when divisible by the mesh;
    replicate otherwise.  Applies to conv kernels [*k, Ci, Co], biases [Co],
    linear kernels [in, out], and norm scales [C]."""
    n = mesh.shape[axis]
    shape = np.shape(leaf)
    if shape and shape[-1] % n == 0 and shape[-1] >= 2 * n:
        spec = [None] * (len(shape) - 1) + [axis]
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_params_by_channel(params, mesh: Mesh, axis: str = "model"):
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, channel_sharding(mesh, leaf, axis)),
        params)
