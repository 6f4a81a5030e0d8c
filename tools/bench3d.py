"""Benchmark the whole-volume 3D path (NVNet3D) on the real chip.

The reference ships the NVNet3D modules (src/model.py:1856-2060) with no
driver and no numbers; this measures OUR driver's training step
(training/train3d.make_train_step_3d) and eval forward at the reference's
volume geometry (src/util.py:723-843: 160x192 plane, 64-deep slab), plus an
in-situ torch baseline of the same fwd+bwd on this host for a reproducible
anchor — the same protocol bench.py uses for the 2D flagship.

Prints one JSON line.  Usage:
    python tools/bench3d.py [--steps N] [--batch B] [--init-channels C]
                            [--dtype bfloat16|float32] [--baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_ours(D, H, W, in_ch, out_ch, init_ch, batch, steps, dtype):
    import jax
    import jax.numpy as jnp

    from representation_disentanglement_tpu.models.unet3d import NVNet3D
    from representation_disentanglement_tpu.training.train3d import (
        create_state_3d, make_eval_step_3d, make_train_step_3d)
    from representation_disentanglement_tpu.utils.profiling import (
        enable_compile_cache)
    enable_compile_cache()

    model = NVNet3D(input_shape=(D, H, W), in_channels=in_ch,
                    out_channels=out_ch, init_channels=init_ch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, D, H, W, in_ch)),
                    jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    # a 0..out_ch label volume: nvnet_loss reads targets[..., 0] as class
    # labels (gt_i = labels == i+1), matching the driver's semantics
    t = jnp.asarray(rng.integers(0, out_ch + 1, size=(batch, D, H, W, 1))
                    .astype(np.float32))
    batch_d = {"inputs": x, "targets": t}

    state, tx = create_state_3d(model, jax.random.PRNGKey(10), x)
    step = make_train_step_3d(model, tx)
    lr = jnp.float32(1e-4)
    key = jax.random.PRNGKey(0)

    # value fetch = the only honest sync through the axon tunnel (bench.py)
    state, m = step(state, batch_d, key, lr)
    np.asarray(m["loss"])
    flops = byts = 0.0
    try:
        comp = step.lower(state, batch_d, key, lr).compile()
        cost = comp.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))
    except Exception as e:                               # pragma: no cover
        print(f"[bench3d] cost_analysis unavailable: {e}", file=sys.stderr)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, batch_d, key, lr)
        np.asarray(m["loss"])
        best = min(best, time.perf_counter() - t0)
    train_vps = steps * batch / best

    estep = make_eval_step_3d(model)
    o = estep(state.params, x)
    np.asarray(o[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            o = estep(state.params, x)
        np.asarray(o[0])
        best = min(best, time.perf_counter() - t0)
    infer_vps = steps * batch / best
    return train_vps, infer_vps, flops, byts


def bench_reference(D, H, W, in_ch, out_ch, init_ch, batch, steps=1):
    """The torch reference's own NVNet3D fwd+bwd (src/model.py:2034-2060)
    with the standard Myronenko losses, measured in-situ on this host."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from conftest import make_ref_model_module
    ref = make_ref_model_module()
    if ref is None:
        return None
    import torch
    # reference NVNet3D only uses prod(input_shape) // 16^3 for its VAE
    # flatten, so (H, W, D) ordering is shape-agnostic there
    model = ref.NVNet3D(input_shape=(H, W, D), in_channels=in_ch,
                        out_channels=out_ch, init_channels=init_ch)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    rng = np.random.default_rng(0)
    x = torch.randn(batch, in_ch, H, W, D)
    # same label-volume semantics as bench_ours / models.unet3d.nvnet_loss:
    # per-class soft dice over gt_i = (labels == i+1)
    t = torch.from_numpy(
        rng.integers(0, out_ch + 1, size=(batch, H, W, D)).astype(
            np.float32))

    def one_iter():
        uout, vout, mu, logvar = model(x)
        pred = torch.sigmoid(uout)
        dice = 0.0
        for i in range(out_ch):
            gt = (t == i + 1).float()
            num = 2.0 * (pred[:, i] * gt).sum()
            den = (pred[:, i].pow(2) + gt.pow(2)).sum()
            dice = dice + 1.0 - num / (den + 1e-6)
        dice = dice / out_ch
        n = x.numel() / x.shape[0]
        kl = ((mu.pow(2) + logvar.exp() - logvar - 1).sum(-1).mean()) / n
        l2 = (vout - x).pow(2).mean()
        (dice + 0.1 * kl + 0.1 * l2).backward()
        opt.step()
        opt.zero_grad()

    one_iter()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_iter()
    return steps * batch / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--init-channels", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--shape", type=int, nargs=3, default=[64, 160, 192],
                    metavar=("D", "H", "W"))
    ap.add_argument("--baseline", action="store_true",
                    help="also measure the torch reference in-situ (slow)")
    args = ap.parse_args()

    D, H, W = args.shape
    train_vps, infer_vps, flops, byts = bench_ours(
        D, H, W, 4, 3, args.init_channels, args.batch, args.steps,
        args.dtype)
    baseline = None
    if args.baseline:
        baseline = bench_reference(D, H, W, 4, 3, args.init_channels,
                                   args.batch)

    import jax
    step_s = args.batch / train_vps
    print(json.dumps({
        "metric": "train_volumes_per_sec_per_chip",
        "value": round(train_vps, 4),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(train_vps / baseline, 2) if baseline else None,
        "infer_volumes_per_sec": round(infer_vps, 4),
        "train_slices_per_sec": round(train_vps * D, 2),
        "flops_per_step": flops,
        "bytes_per_step": byts,
        "tflops_per_sec": round(flops / step_s / 1e12, 2) if flops else None,
        # bf16 peak per chip: v5e 197 TFLOP/s (bench.py's table)
        "mfu": round(flops / step_s / 1e12 / 197.0, 4) if flops else None,
        "hbm_gbps": round(byts / step_s / 1e9, 1) if byts else None,
        "config": f"NVNet3D {D}x{H}x{W} 4-contrast init_ch "
                  f"{args.init_channels} batch {args.batch} {args.dtype}",
        "device": str(jax.devices()[0]),
        "baseline_train_volumes_per_sec": baseline,
    }))


if __name__ == "__main__":
    main()
