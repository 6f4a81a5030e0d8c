"""Activation resolution, including the reference's overwrite quirk (Q1).

Reference blocks build their activation with an ``if/if/if-else`` chain
(src/model.py:127-134, 2134-2141, 2164-2171, 2648-2655, 2680-2687):

    if activation == 'lrelu': act = LeakyReLU(0.2)
    if activation == 'relu':  act = ReLU()
    if activation == 'elu':   act = ELU()
    else:                     act = Identity()

Any name other than 'elu' falls into the final ``else`` and becomes the
identity, so the trained reference networks have NO activation inside these
blocks; their real nonlinearities are the raw LeakyReLU usages (e.g.
src/model.py:2227, 2375-2394).  ``resolve_block_act`` reproduces that chain
exactly; pass ``fix_bug=True`` to get the obviously-intended behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_block_act(name: str, fix_bug: bool = False) -> str:
    if fix_bug:
        return name if name in ("lrelu", "relu", "elu") else "identity"
    return "elu" if name == "elu" else "identity"


def apply_act(x: jnp.ndarray, name: str) -> jnp.ndarray:
    if name == "identity" or name == "no":
        return x
    if name == "lrelu":
        return jax.nn.leaky_relu(x, 0.2)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "elu":
        return jax.nn.elu(x)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "softplus":
        return jax.nn.softplus(x)
    raise ValueError(f"unknown activation {name!r}")
