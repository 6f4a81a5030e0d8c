"""Depth-sharded whole-volume 3D inference (context parallelism for images).

The BASELINE "scaled variant" runs whole-volume batched 3D inference with
the depth axis sharded across the mesh (SURVEY §5.7).  ``shard_map`` splits
the volume's D axis over the ``depth`` mesh axis; inside, the 3D primitives
(ops/conv3d) transparently switch to:

- one-hop halo exchange (``ppermute`` over ICI) before every depth-padded
  conv — exact, since every conv here has kd in {1, 3};
- ``pmean`` for GroupNorm statistics and the VAE's global pooling;
- local nearest upsampling (alignment-preserving for 2x blocks).

The result is bitwise-equivalent (up to reduction order) to the unsharded
forward — verified in tests/test_unet3d.py on the virtual CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from representation_disentanglement_tpu.ops.conv3d import depth_sharded


def make_depth_mesh(n: int, axis: str = "depth") -> Mesh:
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), (axis,))


def make_volume_mesh(n_data: int, n_depth: int,
                     axes: Tuple[str, str] = ("data", "depth")) -> Mesh:
    """2D mesh composing batch data-parallelism with depth sharding: the
    global batch splits over ``data`` while every volume's D axis splits
    over ``depth`` (the gradient psum over ``data`` rides one ICI axis,
    halo ppermutes ride the other)."""
    n = n_data * n_depth
    devs = jax.devices()
    if len(devs) < n:
        raise ValueError(f"mesh {n_data}x{n_depth} needs {n} devices, "
                         f"have {len(devs)}")
    return Mesh(np.asarray(devs[:n]).reshape(n_data, n_depth), axes)


def sharded_nvnet_infer_fn(model, mesh: Mesh, axis: str = "depth"):
    """Returns a jitted fn(variables, x[B, D, H, W, C]) -> (uout, vout, mu,
    logvar) with D sharded over `axis`.  Variables are passed per call so
    one compiled executable serves every epoch's params (a per-epoch
    closure would recompile).  Constraints: D and D//16 divisible by the
    mesh size; per-shard depth divisible by 8 (3 stride-2 stages)."""

    def local_fwd(variables, x_local):
        with depth_sharded(axis):
            return model.apply(variables, x_local, train=False, rng=None)

    fn = shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=(P(None, axis), P(None, axis), P(), P()),
        check_rep=False)

    @jax.jit
    def run(variables, x):
        x = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
        v = jax.device_put(variables, NamedSharding(mesh, P()))
        return fn(v, x)

    return run


def sharded_nvnet_infer(model, variables, mesh: Mesh, axis: str = "depth"):
    """`sharded_nvnet_infer_fn` with `variables` bound at construction."""
    return functools.partial(sharded_nvnet_infer_fn(model, mesh, axis),
                             variables)
