"""Benchmark: training + inference throughput of the flagship configuration.

Prints ONE JSON line:
  {"metric": "train_slices_per_sec_per_chip", "value": N, "unit":
   "slices/sec/chip", "vs_baseline": R, ...extras}

Configuration matches the reference's shipped run (SURVEY §6): 4-modality
BraTS, 160x192, 7-slice blocks, batch 8, effective batch 16 via gradient
accumulation, full shipped loss set (recon_x 1, recon_x_mix 2, sim_s 10,
sim_z 2, latent_z 0.1).

``vs_baseline`` compares against the torch reference executing its own
training iteration (same shapes, same losses) measured once on this host and
cached in ``bench_baseline.json``.  The reference repo publishes no numbers
(BASELINE.md), so a measured-here floor is the only reproducible anchor; the
reference runs on CPU-torch here (no CUDA in this environment), which is
recorded in the JSON for transparency.

Usage:  python bench.py [--smoke] [--steps N] [--no-baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")


# bf16 peak TFLOP/s per chip by TPU generation (public figures)
_PEAK_TFLOPS = {"v5 lite": 197.0, "v5e": 197.0, "v4": 275.0, "v5p": 459.0,
                "v6 lite": 918.0, "v6e": 918.0}


def _device_peak_tflops() -> float:
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return 197.0                           # conservative default


def _step_cost(step_fn, *args, **static):
    """(flops, bytes_accessed) of one compiled step via XLA's cost analysis
    (zeros when the backend doesn't expose it)."""
    try:
        compiled = step_fn.lower(*args, **static).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return (float(cost.get("flops", 0.0)),
                float(cost.get("bytes accessed", 0.0)))
    except Exception as e:                             # pragma: no cover
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)
        return 0.0, 0.0


def _time_best3(call, steps):
    """Best-of-3 windows of `steps` dispatches of `call`, each window ended
    by a value fetch of call()'s result (the only honest sync through the
    axon tunnel — see the warmup note in bench_ours)."""
    o = call()
    np.asarray(o)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            o = call()
        np.asarray(o)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_ours(height, width, contrasts, batch_size, effective_batch,
               steps, dtype="bfloat16", use_pallas=False,
               cond_mode="grouped", notshared_impl="loop", remat=True,
               fuse_bn=False):
    import jax
    import jax.numpy as jnp
    from representation_disentanglement_tpu.utils.profiling import (
        enable_compile_cache)
    enable_compile_cache()
    from __graft_entry__ import _make_cfg, _synthetic_batch
    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.train import (
        create_train_state, draw_pairs, make_train_step)

    cfg = _make_cfg(height, width, contrasts, batch_size, effective_batch)
    cfg.compute_dtype = dtype
    cfg.use_pallas = use_pallas
    cfg.cond_mode = cond_mode
    cfg.notshared_impl = notshared_impl
    cfg.remat = remat
    cfg.fuse_bn = fuse_bn
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = _synthetic_batch(cfg, rng)
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(10), batch)
    train_step, n_micro = make_train_step(model, cfg, txs, donate=True)

    stacked = {k: jnp.stack([batch[k]] * n_micro)
               for k in ("inputs", "targets", "mask", "mask_img")}
    rngs = jax.random.split(jax.random.PRNGKey(0), n_micro)
    pair_rng = np.random.default_rng(0)
    pairs = lambda: jnp.asarray(draw_pairs(pair_rng, cfg.modality_num,
                                           n_micro))

    # warmup / compile.  NOTE: through the axon tunnel block_until_ready
    # returns before execution completes — a VALUE FETCH is the only honest
    # synchronization (measured 70x discrepancy), so every timing window
    # ends with np.asarray of the result.
    sync = lambda a: np.asarray(a)
    state, m = train_step(state, stacked, rngs, pairs(), pairs(),
                          jnp.float32(cfg.lr), first_of_epoch=False)
    sync(m)
    # AFTER the warmup dispatch: the persistent compile cache then serves
    # the cost-analysis lower().compile() from disk instead of recompiling
    flops_per_step, bytes_per_step = _step_cost(
        train_step, state, stacked, rngs, pairs(), pairs(),
        jnp.float32(cfg.lr), first_of_epoch=False)
    # best-of-3 windows: the shared TPU tunnel adds run-to-run noise
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = train_step(state, stacked, rngs, pairs(), pairs(),
                                  jnp.float32(cfg.lr), first_of_epoch=False)
        sync(m)
        best_dt = min(best_dt, time.perf_counter() - t0)
    train_sps = steps * effective_batch / best_dt

    # two inference numbers:
    # - infer_sps: the product's synthesis forward (grid + y decode, z=mean,
    #   no losses) in the compute dtype — the "missing-modality synthesis"
    #   serving path;
    # - val_sps: the REAL validation step (training/evaluate.make_eval_step):
    #   full loss set + PSNR/SSIM/Dice on device, two small fetches/batch.
    cast_in = (lambda b: dict(b, inputs=b["inputs"].astype(jnp.bfloat16))) \
        if cfg.compute_dtype == "bfloat16" else (lambda b: b)

    @jax.jit
    def synth_fwd(params, bstats, b):
        b = cast_in(b)
        out = model.apply({"params": params, "batch_stats": bstats},
                          b["inputs"], b["mask"], b["mask_img"], None,
                          train=False, compute_y=True, latent_cycle=False)
        return out["x_fake_grid"], out["y_fake_fused"]

    best_dt = _time_best3(
        lambda: synth_fwd(state.params, state.batch_stats, batch)[1], steps)
    infer_sps = steps * batch_size / best_dt

    # serving path: missing-modality synthesis (M decodes from one anatomy
    # source + fused y) instead of the M^2 evaluation grid
    @jax.jit
    def serve_fwd(params, bstats, b):
        b = cast_in(b)
        return model.apply({"params": params, "batch_stats": bstats},
                           b["inputs"], b["mask"], b["mask_img"],
                           method=model.synthesize, source=0)

    best_dt = _time_best3(
        lambda: serve_fwd(state.params, state.batch_stats, batch)[1], steps)
    serve_sps = steps * batch_size / best_dt

    from representation_disentanglement_tpu.training.evaluate import \
        make_eval_step
    eval_step, _, _ = make_eval_step(model, cfg)
    ebatch = {k: batch[k] for k in ("inputs", "targets", "mask", "mask_img")}
    pair = jnp.asarray([0, 1], jnp.int32)

    best_dt = _time_best3(
        lambda: eval_step(state.params, state.batch_stats, ebatch, pair,
                          pair, compute_y=True)[2], steps)
    val_sps = steps * batch_size / best_dt
    from representation_disentanglement_tpu.training.train import \
        metrics_to_dict
    final_loss = metrics_to_dict(m)["all"] / n_micro
    step_time = effective_batch / train_sps
    tflops_achieved = flops_per_step / step_time / 1e12 if flops_per_step \
        else 0.0
    mfu = tflops_achieved / _device_peak_tflops()
    hbm_gbps = bytes_per_step / step_time / 1e9 if bytes_per_step else 0.0
    return {"train_sps": train_sps, "infer_sps": infer_sps,
            "serve_sps": serve_sps, "val_sps": val_sps,
            "final_loss": final_loss, "flops_per_step": flops_per_step,
            "bytes_per_step": bytes_per_step, "hbm_gbps": hbm_gbps,
            "tflops_per_sec": tflops_achieved, "mfu": mfu}


def bench_reference(height, width, n_contrasts, batch_size, steps=2):
    """Measure the torch reference's own train iteration (fwd+bwd of the
    shipped loss set) on this host.  Imports /root/reference/src/model.py
    as an oracle with unavailable deps stubbed."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from conftest import make_ref_model_module
    ref = make_ref_model_module()
    if ref is None:
        return None
    import torch
    dev = torch.device("cpu")
    model = ref.MultimodalModel(
        input_size=(height, width), modality_num=n_contrasts, in_num_ch=7,
        out_num_ch=1, s_num_ch=4, z_size=16, is_cond=True,
        is_discrim_s=False, is_distri_z=False, shared_ana_enc=True,
        shared_mod_enc=True, shared_inp_dec=False,
        s_compact_method="max", s_sim_method="cosine",
        z_sim_method="cosine", input_output_act="no", target_output_act="no",
        target_model_name="U+SA", fuse_method="mean", device=dev,
        others={"mod_enc_s": False, "ana_dec_act": "softmax", "old": False,
                "softmax_remove_mask": True})
    opt = torch.optim.Adam(model.parameters(), lr=2e-4, weight_decay=1e-5,
                           amsgrad=True)
    xs = [torch.randn(batch_size, 7, height, width) for _ in
          range(n_contrasts)]
    mask = torch.ones(batch_size, n_contrasts)
    mask_img = torch.zeros(batch_size, height, width)

    def one_iter():
        si = model.compute_anatomy_encoding(xs, mask_img)
        zi, zm, zlv = model.compute_modality_encoding(xs, si, phase="train")
        xf = model.reconstruct_input_si_zi(si, zi)
        xfm = model.reconstruct_input_si_zj(si, zi)
        loss = model.compute_recon_loss_x_list(xs, xf, mask, p=1)
        loss = loss + 2.0 * model.compute_recon_loss_x_mix_list(
            xs, xfm, mask, p=1)
        si2 = model.compute_anatomy_encoding(xf, mask_img)
        _, zm2, _ = model.compute_modality_encoding(xf, si2, phase="train")
        loss = loss + 0.1 * model.compute_latent_z_loss(zm, zm2, mask)
        loss = loss + 10.0 * model.compute_similarity_s_loss(si, mask)
        loss = loss + 2.0 * model.compute_similarity_z_loss(zi, mask)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        opt.zero_grad()

    one_iter()                                     # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_iter()
    dt = time.perf_counter() - t0
    return steps * batch_size / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes, CPU-safe")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--no-baseline", action="store_true")
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="fused Pallas SPADE interior (+22% measured)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--cond-mode", default="grouped",
                    choices=["grouped", "sum_experts"])
    ap.add_argument("--fuse-bn", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="fused Pallas BN train pass (ops/pallas_bn.py)")
    ap.add_argument("--notshared", default="loop",
                    choices=["vmap", "loop"])
    ap.add_argument("--remat", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="segmented remat; OFF by default for the flagship "
                         "bench (bf16 + loop decoders fit in HBM; +26% "
                         "measured without it)")
    ap.add_argument("--batch", type=int, default=None,
                    help="per-step microbatch size (default 16: one "
                         "microbatch — same optimizer semantics as the "
                         "reference's accumulated effective batch 16)")
    ap.add_argument("--effective", type=int, default=None,
                    help="effective batch via grad accumulation (default 16)")
    args = ap.parse_args()

    if args.smoke:
        h, w, contrasts = 32, 64, ("T1", "T2")
        bs = args.batch or 2
        eb = args.effective or max(4, bs)
        steps = args.steps or 2
    else:
        h, w = 160, 192
        contrasts = ("T1", "T1c", "T2", "T2_FLAIR")
        # one 16-sample microbatch beats 2x8 accumulation by ~12% (measured
        # 49.7 vs 44.5 slices/s); optimizer semantics identical (the
        # reference's effective batch is 16, main_missing.py:282)
        bs, eb = args.batch or 16, args.effective or 16
        steps = args.steps or 20

    r = bench_ours(
        h, w, contrasts, bs, eb, steps, dtype=args.dtype,
        use_pallas=args.pallas, cond_mode=args.cond_mode,
        notshared_impl=args.notshared, remat=args.remat,
        fuse_bn=args.fuse_bn)
    train_sps, infer_sps, loss = (r["train_sps"], r["infer_sps"],
                                  r["final_loss"])

    baseline = None
    # the torch reference hard-pins 160x192 (the 5*6*128 flatten,
    # ref model.py:2396), so --smoke's tiny shapes can't baseline it.
    # The reference is always measured at ITS shipped batch 8
    # (config.yaml:17) — slices/sec is batch-agnostic for the comparison,
    # and our sweep batch must not invalidate the cache.
    if not args.no_baseline and not args.smoke:
        key = f"{h}x{w}_M{len(contrasts)}_B8"
        cache = {}
        if os.path.exists(BASELINE_CACHE):
            with open(BASELINE_CACHE) as f:
                cache = json.load(f)
        if key in cache:
            baseline = cache[key]["train_slices_per_sec"]
        else:
            b = bench_reference(h, w, len(contrasts), 8, steps=1)
            if b is not None:
                baseline = b
                cache[key] = {"train_slices_per_sec": b,
                              "hardware": "host CPU (torch, no CUDA here)",
                              "note": "reference measured in-situ; repo "
                                      "publishes no numbers (BASELINE.md)"}
                with open(BASELINE_CACHE, "w") as f:
                    json.dump(cache, f, indent=1)

    import jax
    result = {
        "metric": "train_slices_per_sec_per_chip",
        "value": round(train_sps, 3),
        "unit": "slices/sec/chip",
        "vs_baseline": round(train_sps / baseline, 2) if baseline else None,
        "infer_slices_per_sec": round(infer_sps, 3),
        "val_slices_per_sec": round(r["val_sps"], 3),
        "serving_slices_per_sec": round(r["serve_sps"], 3),
        "mfu": round(r["mfu"], 4),
        "tflops_per_sec": round(r["tflops_per_sec"], 2),
        "flops_per_step": r["flops_per_step"],
        "bytes_per_step": r["bytes_per_step"],
        "hbm_gbps": round(r["hbm_gbps"], 1),
        "final_loss": round(loss, 4),
        "config": f"BraTS {len(contrasts)}-modality {h}x{w} batch {bs} "
                  f"(effective {eb})",
        "device": str(jax.devices()[0]),
        "baseline_train_slices_per_sec": baseline,
        "baseline_config": "torch reference at ITS shipped batch 8 "
                           "(config.yaml:17), host CPU; ours at the best "
                           "semantically-identical config (effective 16)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
