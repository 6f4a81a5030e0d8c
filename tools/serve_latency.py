"""Serving latency profile (VERDICT r3 item 7).

Measures per-request latency (p50 / p95 / p99 over N requests, value-fetch
synchronized — see bench.py's docstring for why ``block_until_ready`` is
not an honest sync in this environment) of the missing-modality serving
step at B in {1, 8, 16, 64}, plus cold-start cost: live-trace compile time
vs loading an AOT artifact (utils/aot.py).  Results recorded in PERF.md's
serving section.

Usage (real TPU chip; do not run while the CPU test suite runs):
    python tools/serve_latency.py [--requests 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x) -> float:
    """Value-fetch sync that does NOT drag the whole result through the
    tunnel: index on device (a dependent dispatch that cannot start until
    x is fully materialized), then fetch the 4-byte scalar.  Fetching the
    full x_hat would measure the axon tunnel's ~150 MB/s egress (550 MB at
    B=16), not serving — a real deployment's result egress is PCIe/DMA;
    the tunnel egress is reported once, separately, per batch size."""
    return float(np.asarray(x.ravel()[0]))


def build(batch: int):
    from representation_disentanglement_tpu.config import Config
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.serve import make_serve_step
    from representation_disentanglement_tpu.training.train import (
        create_train_state)

    cfg = Config(dataset_name="BraTS",
                 contrast_list=["T1", "T1c", "T2", "T2_FLAIR"],
                 input_height=160, input_width=192, batch_size=batch,
                 effective_batch=batch, shared_inp_dec=False, is_cond=True,
                 use_pallas=True, compute_dtype="bfloat16",
                 others={"mod_enc_s": False, "ana_dec_act": "softmax",
                         "old": False, "softmax_remove_mask": True})
    cfg.derive().validate()
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    M, H, W = 4, 160, 192
    batch_d = {
        "inputs": jnp.asarray(rng.normal(size=(M, batch, H, W, 7)).astype(
            np.float32)),
        "targets": jnp.zeros((batch, H, W, 1), jnp.float32),
        "mask": jnp.ones((batch, M), jnp.float32),
        "mask_img": jnp.zeros((batch, H, W), jnp.float32),
    }
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  batch_d)
    step = make_serve_step(model, cfg, source=0, with_y=True)
    return cfg, model, state, step, batch_d


def profile_batch(batch: int, n_requests: int):
    cfg, model, state, step, b = build(batch)
    args = (state.params, state.batch_stats, b["inputs"], b["mask"],
            b["mask_img"])
    t0 = time.perf_counter()
    x_hat, y = step(*args)
    _sync(x_hat)
    cold = time.perf_counter() - t0          # trace+compile+first execute
    lat = []
    for _ in range(n_requests):
        t0 = time.perf_counter()
        x_hat, y = step(*args)
        _sync(x_hat)
        lat.append(time.perf_counter() - t0)
    # tunnel egress of the full result, measured once for transparency
    # (environment artifact, not part of the per-request latency)
    t0 = time.perf_counter()
    full = np.asarray(x_hat)
    egress = time.perf_counter() - t0
    lat = np.asarray(sorted(lat))
    pct = lambda p: float(lat[min(len(lat) - 1,
                                  int(round(p / 100 * (len(lat) - 1))))])
    return {"batch": batch, "cold_start_s": round(cold, 3),
            "p50_ms": round(pct(50) * 1e3, 2),
            "p95_ms": round(pct(95) * 1e3, 2),
            "p99_ms": round(pct(99) * 1e3, 2),
            "mean_ms": round(float(lat.mean()) * 1e3, 2),
            "slices_per_s": round(batch / float(np.median(lat)), 1),
            "tunnel_egress_s_full_result": round(egress, 3),
            "result_mb": round(full.nbytes / 1e6, 1)}


def profile_aot(batch: int, n_requests: int, path: str):
    """AOT artifact: export once, reload, measure load+first-call cold
    start vs the live trace's."""
    from representation_disentanglement_tpu.utils.aot import (
        export_serve_step, load_serve_step)
    cfg, model, state, step, b = build(batch)
    blob = export_serve_step(model, cfg, source=0, sample=b,
                             params=state.params,
                             batch_stats=state.batch_stats)
    with open(path, "wb") as f:
        f.write(blob)
    t0 = time.perf_counter()
    with open(path, "rb") as f:
        aot_step, _hdr = load_serve_step(f.read())
    x_hat, y = aot_step(state.params, state.batch_stats, b["inputs"],
                        b["mask"], b["mask_img"])
    _sync(x_hat)
    cold = time.perf_counter() - t0
    lat = []
    for _ in range(n_requests):
        t0 = time.perf_counter()
        x_hat, _ = aot_step(state.params, state.batch_stats, b["inputs"],
                            b["mask"], b["mask_img"])
        _sync(x_hat)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(sorted(lat))
    return {"batch": batch, "aot_cold_start_s": round(cold, 3),
            "aot_p50_ms": round(float(np.median(lat)) * 1e3, 2)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--requests", type=int, default=50)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 16, 64])
    ap.add_argument("--aot-batch", type=int, default=16)
    ap.add_argument("--aot-path", default="/tmp/serve_latency.rdx")
    args = ap.parse_args()
    rows = [profile_batch(b, args.requests) for b in args.batches]
    try:
        rows.append(profile_aot(args.aot_batch, args.requests,
                                args.aot_path))
    except Exception as e:                      # AOT optional in odd envs
        rows.append({"aot_error": str(e)[:200]})
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
