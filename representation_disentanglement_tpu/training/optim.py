"""Optimizer stack with exact torch semantics.

Reference: ``torch.optim.Adam(lr=2e-4, weight_decay=1e-5, amsgrad=True)`` +
``ReduceLROnPlateau(factor=0.1, patience=5, min_lr=1e-5)`` + per-iteration
``clip_grad_norm_(1.0)`` on the *accumulated* gradients
(src/main_missing.py:118-122, 272, 282-289).

torch Adam details replicated:
- weight decay is L2 added to the gradient BEFORE the moment updates
  (not decoupled AdamW);
- amsgrad keeps the elementwise max of the second moment;
- update = lr/bc1 * m / (sqrt(vmax)/sqrt(bc2) + eps).

The learning rate is a runtime argument (not baked into the graph) so the
host-side plateau scheduler never forces a recompile.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdamAmsgradState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def adam_amsgrad_torch(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8, weight_decay: float = 0.0
                       ) -> optax.GradientTransformationExtraArgs:
    """torch.optim.Adam(amsgrad=True) parity; lr passed via extra arg."""

    def init(params):
        z = lambda: jax.tree.map(jnp.zeros_like, params)
        return AdamAmsgradState(jnp.zeros([], jnp.int32), z(), z(), z())

    def update(grads, state, params=None, *, learning_rate):
        assert params is not None
        if weight_decay:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p,
                                 grads, params)
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, grads)
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        step = learning_rate / bc1
        updates = jax.tree.map(
            lambda m, vm: -step * m / (jnp.sqrt(vm) / jnp.sqrt(bc2) + eps),
            mu, nu_max)
        return updates, AdamAmsgradState(count, mu, nu, nu_max)

    return optax.GradientTransformationExtraArgs(init, update)


def clip_global_norm(grads, max_norm: float = 1.0):
    """torch.nn.utils.clip_grad_norm_ parity: scale all grads by
    max_norm / (total_norm + 1e-6) when total_norm > max_norm."""
    leaves = jax.tree.leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), total


class ReduceLROnPlateau:
    """Host-side torch ReduceLROnPlateau parity (mode='min', rel threshold
    1e-4, cooldown 0)."""

    def __init__(self, lr: float, factor: float = 0.1, patience: int = 5,
                 min_lr: float = 1e-5, threshold: float = 1e-4):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self):
        return {"lr": self.lr, "best": self.best,
                "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, d):
        self.lr = d["lr"]
        self.best = d["best"]
        self.num_bad_epochs = d["num_bad_epochs"]
