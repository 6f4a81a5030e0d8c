"""AOT serving artifacts via ``jax.export``.

The reference has no deployment story beyond "run the eval loop in the
training repo" (src/main_missing.py:611-624).  On TPU the production-serving
pattern is ahead-of-time export: trace + lower the serving computation ONCE,
serialize the StableHLO artifact, and run it on the serving fleet without
the model's Python code — the artifact pins the computation across jax
versions (StableHLO forward compatibility) and can be lowered for multiple
platforms at export time.

The artifact captures the serving STEP as a function of
``(params, batch_stats, inputs, mask, mask_img)`` — weights stay arguments,
so one artifact serves every checkpoint of the run (hot-swap without
re-export) and the file stays small (~1 MB of IR, no baked constants).

Usage (see also ``serve.py --export-aot / --aot``)::

    blob = export_serve_step(model, cfg, source=0, sample=batch,
                             params=params, batch_stats=bstats,
                             platforms=("tpu", "cpu"))
    open("serve_B16.rdx", "wb").write(blob)
    # ... on the serving host (no model code needed):
    step, header = load_serve_step("serve_B16.rdx")
    x_hat, y = step(params, bstats, inputs, mask, mask_img)
"""

from __future__ import annotations

import json
from typing import Optional, Sequence, Tuple

import jax
from jax import export as jax_export
import jax.numpy as jnp

_MAGIC = b"RDTAOT1\n"


def export_serve_step(model, cfg, *, source: int, sample,
                      params, batch_stats, with_y: bool = True,
                      platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the jitted serving step for ``sample``-shaped batches.

    ``sample``: a batch dict providing the input shapes/dtypes
    (``inputs [M, B, H, W, bc]``, ``mask [B, M]``, ``mask_img [B, H, W]``).
    ``platforms``: lowering targets (default: the current backend only);
    pass ``("tpu", "cpu")`` to build one artifact that runs on both.

    The blob embeds a small JSON header (source, with_y, shapes) ahead of
    the StableHLO payload so a serving host can validate compatibility
    before deserializing.
    """
    from representation_disentanglement_tpu.serve import make_serve_step
    step = make_serve_step(model, cfg, source, with_y=with_y)

    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exp = jax_export.export(step, **kw)(
        params, batch_stats, sample["inputs"], sample["mask"],
        sample["mask_img"])
    header = json.dumps({
        "source": source, "with_y": with_y,
        "inputs_shape": list(sample["inputs"].shape),
        "compute_dtype": cfg.compute_dtype,
        "platforms": list(exp.platforms),
    }).encode()
    return _MAGIC + len(header).to_bytes(4, "big") + header + exp.serialize()


def read_header(blob: bytes) -> dict:
    if not blob.startswith(_MAGIC):
        raise ValueError("not an RDT AOT artifact (bad magic)")
    n = int.from_bytes(blob[len(_MAGIC):len(_MAGIC) + 4], "big")
    off = len(_MAGIC) + 4
    return json.loads(blob[off:off + n].decode())


def load_serve_step(path_or_blob) -> Tuple["jax_export.Exported", dict]:
    """Deserialize an artifact.  Returns ``(step, header)`` where ``step``
    is callable with the exact argument structure it was exported with
    (params, batch_stats, inputs, mask, mask_img)."""
    blob = path_or_blob
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    header = read_header(blob)
    n = int.from_bytes(blob[len(_MAGIC):len(_MAGIC) + 4], "big")
    exp = jax_export.deserialize(blob[len(_MAGIC) + 4 + n:])

    def step(params, batch_stats, inputs, mask, mask_img):
        return exp.call(params, batch_stats, inputs, mask, mask_img)

    return jax.jit(step), header
