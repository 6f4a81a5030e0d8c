"""Per-stage timing + roofline accounting on the TPU (B=16 flagship).

Produces the numbers recorded in PERF.md: per-stage wall time, XLA
cost-analysis FLOPs and bytes, and the achieved TF/s / GB/s.  Run on the
TPU host:  python tools/profile_stages.py
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from representation_disentanglement_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
from __graft_entry__ import _make_cfg, _synthetic_batch
from representation_disentanglement_tpu.main_missing import build_model
from representation_disentanglement_tpu.training.train import (
    create_train_state, make_train_step, assemble_losses)

cfg = _make_cfg(160, 192, ("T1", "T1c", "T2", "T2_FLAIR"), 16, 16)
cfg.compute_dtype = "bfloat16"; cfg.use_pallas = True
cfg.cond_mode = "grouped"; cfg.notshared_impl = "loop"; cfg.remat = False
model = build_model(cfg)
rng = np.random.default_rng(0)
batch = _synthetic_batch(cfg, rng)
state, txs = create_train_state(model, cfg, jax.random.PRNGKey(10), batch)
P, BS = state.params, state.batch_stats
xb = batch["inputs"].astype(jnp.bfloat16)

def timed(name, fn, *args, n=10):
    out = fn(*args); np.asarray(jax.tree.leaves(out)[0])
    try:
        c = fn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)): c = c[0]
        fl = c.get("flops", 0.0); by = c.get("bytes accessed", 0.0)
    except Exception:
        fl = by = 0.0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n): out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:28s} {best*1e3:8.2f} ms  {fl/1e9:9.1f} GFLOP "
          f"{fl/best/1e12:7.2f} TF/s  {by/1e9:7.2f} GB {by/best/1e9:7.1f} GB/s")
    return out

@jax.jit
def f_anat(p, bs, x, mi):
    return model.apply({"params": p, "batch_stats": bs}, x, mi,
                       train=True, mutable=["batch_stats"],
                       method=model.encode_anatomy)[0]

s = timed("anatomy encode (fwd)", f_anat, P, BS, xb, batch["mask_img"])

@jax.jit
def f_mod(p, bs, x, s):
    return model.apply({"params": p, "batch_stats": bs}, x, s,
                       method=model.encode_modality)
zm, zlv = timed("modality encode (fwd)", f_mod, P, BS, xb, s)

@jax.jit
def f_grid(p, bs, s, z):
    return model.apply({"params": p, "batch_stats": bs}, s, z,
                       method=model.decode_inputs_grid)
grid = timed("SPADE MxM grid decode (fwd)", f_grid, P, BS, s, zm)

@jax.jit
def f_y(p, bs, s, m):
    return model.apply({"params": p, "batch_stats": bs}, s, m, train=True,
                       mutable=["batch_stats"], method=model.decode_outputs)[0]
timed("output decode M+1 (fwd)", f_y, P, BS, s, batch["mask"])

@jax.jit
def f_full_fwd(p, bs, b, rng):
    out, muts = model.apply({"params": p, "batch_stats": bs},
        b["inputs"].astype(jnp.bfloat16), b["mask"], b["mask_img"], rng,
        train=True, compute_y=False, latent_cycle=True,
        mutable=["batch_stats"])
    l = assemble_losses(cfg, b, out, jnp.asarray([0, 1]))
    return l["all"]
timed("full fwd + losses", f_full_fwd, P, BS, batch, jax.random.PRNGKey(0))

step, n_micro = make_train_step(model, cfg, txs, donate=False)
rngs = jax.random.split(jax.random.PRNGKey(0), 1)
stacked = {k: jnp.stack([batch[k]]) for k in
           ("inputs", "targets", "mask", "mask_img")}
pair = jnp.asarray([[0, 1]], jnp.int32)
timed("FULL train step", lambda st: step(st, stacked, rngs, pair, pair,
      jnp.float32(2e-4), first_of_epoch=False)[1], state, n=5)
