"""Checkpoint I/O with the reference's contract.

Reference (src/util.py:148-170, 870-903; src/main_missing.py:326-335):
per-epoch ``epochNNN.pth.tar`` holding {epoch, monitor_metric, stat,
optimizer, scheduler, model [, optimizer_d_s]} plus a ``model_best`` copy on
improvement; resume restores by key with per-key tolerance and a
shape-filtered partial merge for the model.

Here the payload is a flax msgpack blob ``epochNNN.ckpt`` / ``model_best.ckpt``
with the same logical keys; ``load_partial_params`` reproduces
``load_checkpoint_model``'s shape-tolerant merge (src/util.py:895-903).
Writes are atomic (tmp + rename).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict


def _to_numpy(tree):
    # to_state_dict converts NamedTuple optimizer states / tuples to dicts so
    # msgpack can serialize them
    tree = serialization.to_state_dict(tree)
    return jax.tree.map(lambda v: np.asarray(v), tree)


def save_checkpoint(state_dict: Dict[str, Any], is_best: bool,
                    ckpt_path: str, name: Optional[str] = None) -> str:
    os.makedirs(ckpt_path, exist_ok=True)
    epoch = int(state_dict.get("epoch", 0))
    name = name or f"epoch{epoch:03d}.ckpt"
    payload = serialization.msgpack_serialize(_to_numpy(state_dict))
    path = os.path.join(ckpt_path, name)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    if is_best:
        best = os.path.join(ckpt_path, "model_best.ckpt")
        shutil.copyfile(path, best)
    return path


def load_checkpoint(ckpt_path: str, ckpt_name: str = "model_best.ckpt"
                    ) -> Dict[str, Any]:
    filename = os.path.join(ckpt_path, ckpt_name)
    if not os.path.isfile(filename):
        raise ValueError(f"No correct checkpoint at {filename}")
    with open(filename, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_partial_params(current: Any, saved: Any) -> Tuple[Any, int, int]:
    """Shape-filtered merge (src/util.py:895-903): keep saved leaves whose
    path exists in `current` with a matching shape; keep current values
    elsewhere.  Returns (merged, n_restored, n_total_current)."""
    cur_flat = flatten_dict(current)
    saved_flat = flatten_dict(saved) if saved else {}
    restored = 0
    out = {}
    for k, v in cur_flat.items():
        sv = saved_flat.get(k)
        if sv is not None and np.shape(sv) == np.shape(v):
            out[k] = jax.numpy.asarray(sv, dtype=v.dtype) \
                if hasattr(v, "dtype") else sv
            restored += 1
        else:
            out[k] = v
    return unflatten_dict(out), restored, len(cur_flat)


def restore_model_state(params: Any, batch_stats: Any, ckpt_path: str,
                        ckpt_name: str = "model_best.ckpt"
                        ) -> Tuple[Dict[str, Any], Any, Any, int, int]:
    """The shared half of the resume protocol (src/util.py:880-903): load a
    checkpoint and partial-restore params + batch_stats against the current
    shapes.  Returns (raw ckpt dict, params, batch_stats, n_restored,
    n_total) so callers can additionally restore opt_state / scheduler /
    epoch with their own tolerance rules."""
    ckpt = load_checkpoint(ckpt_path, ckpt_name)
    p, n_res, n_tot = load_partial_params(params, ckpt.get("params"))
    bs, _, _ = load_partial_params(batch_stats, ckpt.get("batch_stats", {}))
    return ckpt, p, bs, n_res, n_tot
