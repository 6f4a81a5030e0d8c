"""Missing-modality serving CLI — the imputation product as an entry point.

The reference answers the missing-modality question inside its eval loop
(``src/main_missing.py:402-428``: decode a present modality's anatomy into
the absent contrast).  Here that product question gets its own driver built
on the TPU-native serving path ``MultimodalModel.synthesize`` (M decodes
from ONE anatomy source + the fused y decode, NOT the M^2 evaluation
grid — ~3x the grid forward's throughput, see PERF.md):

    python -m representation_disentanglement_tpu.serve config.yaml \
        --missing T1,T2_FLAIR [--source T2] [--out-dir serve_out] \
        [--ckpt-root ../ckpt] [--format auto|npy|nifti] [--subjects a,b]

Workflow: resolve the run directory exactly like ``phase: test``
(``ckpt_timelabel`` selects the trained run), restore ``model_best.ckpt``,
iterate the test fold subject by subject, zero-fill the requested absent
contrasts, run the jitted serving step over the subject's slices, and write
one re-assembled [D, H, W] volume per synthesized contrast (plus the fused
y output: label volume for segmentation heads, image volume otherwise).

The model's background mask (quirk Q6) is normally derived from contrast 0;
when contrast 0 itself is being served it is derived from the anatomy
``--source`` contrast instead (the closest present-data analogue).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.config import (
    Config, load_config, resolve_run)
from representation_disentanglement_tpu.data.dataset import DataAll


def _group_by_subject(subj_list, idx_list) -> Dict[str, List[int]]:
    """Dataset-row indices per subject, in slice order (the fold txts list
    each subject's slices contiguously; sort by slice index within)."""
    rows: Dict[str, List[int]] = {}
    for i, s in enumerate(subj_list):
        rows.setdefault(str(s), []).append(i)
    for s, ii in rows.items():
        ii.sort(key=lambda i: int(idx_list[i]))
    return rows


def make_serve_step(model, cfg: Config, source: int, with_y: bool = True):
    """Jitted serving step: inputs already zero-filled for absent
    contrasts.  Returns (x_hat [M, B, H, W, bc], y_fused [B, H, W, C] or
    None when ``with_y`` is off — the fused decode is skipped, not just
    discarded)."""
    bf16 = cfg.compute_dtype == "bfloat16"

    @jax.jit
    def step(params, batch_stats, inputs, mask, mask_img):
        x = inputs.astype(jnp.bfloat16) if bf16 else inputs
        x_hat, y = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, mask, mask_img, method=model.synthesize, source=source,
            with_y=with_y)
        return (x_hat.astype(jnp.float32),
                y.astype(jnp.float32) if with_y else None)

    return step


def make_serve_step_retrieval(model, cfg: Config, source: int,
                              miss_idx: Sequence[int], z_mode: str,
                              vgg_ctx, with_y: bool = True):
    """Serving step with latent retrieval: the missing modalities' z comes
    from a bank of training-set latents keyed by compact anatomy (the
    reference's test-time imputation, src/main_missing.py:402-428 — its
    query rule |1-i| generalizes here to "query with the anatomy source's
    compact s").  Present modalities keep their encoder z."""
    from representation_disentanglement_tpu import losses as L
    bf16 = cfg.compute_dtype == "bfloat16"
    miss = frozenset(int(i) for i in miss_idx)

    @jax.jit
    def step(params, batch_stats, inputs, mask, mask_img, s_bank_key,
             z_bank):
        x = inputs.astype(jnp.bfloat16) if bf16 else inputs
        v = {"params": params, "batch_stats": batch_stats}
        s = model.apply(v, x, mask_img, train=False,
                        method=model.encode_anatomy)
        z_enc, _ = model.apply(v, x, s, method=model.encode_modality)
        s_key = L.compact_s(s[source].astype(jnp.float32),
                            cfg.s_compact_method, vgg_ctx)       # [B, D]
        rows = []
        for i in range(cfg.modality_num):
            if i not in miss:
                rows.append(z_enc[i])
            elif z_mode == "nearest_neighbour":
                rows.append(L.nearest_neighbour_z_by_s(
                    s_bank_key, z_bank[:, i], s_key))
            else:
                rows.append(jnp.broadcast_to(
                    L.mean_z(z_bank[:, i]),
                    (s_key.shape[0], z_bank.shape[-1])))
        z = jnp.stack(rows, 0)                                   # [M, B, z]
        # pass s back in: synthesize must not re-run the anatomy encoder
        # (under remat the two passes sit in separate checkpoint scopes
        # and XLA cannot CSE them)
        x_hat, y = model.apply(v, x, mask, mask_img,
                               method=model.synthesize, source=source,
                               z=z, s=s, with_y=with_y)
        return (x_hat.astype(jnp.float32),
                y.astype(jnp.float32) if with_y else None)

    return step


def load_z_bank(bank_path: str, cfg: Config, source: int, vgg_ctx):
    """Load a results_all.h5 dump (typically from ``--set train`` eval) and
    precompute the bank: compact anatomy keys of the source modality +
    per-modality z vectors.  Returns (s_bank_key [N, D], z_bank [N, M, z])."""
    import h5py
    from representation_disentanglement_tpu import losses as L
    with h5py.File(bank_path, "r") as f:
        s_saved = np.asarray(f["s_list"])          # [N, M, Cs, H, W] (NCHW)
        z_saved = np.asarray(f["z_list"])          # [N, M, z]
    s_src = np.moveaxis(s_saved[:, source], 1, -1)  # [N, H, W, Cs]
    key = jax.jit(lambda a: L.compact_s(a, cfg.s_compact_method, vgg_ctx))(
        jnp.asarray(s_src))
    return key, jnp.asarray(z_saved)


def _save_volume(base: str, vol: np.ndarray, fmt: str) -> str:
    if fmt == "nifti":
        from representation_disentanglement_tpu.utils.visualize import (
            save_volume_nifti)
        save_volume_nifti(base + ".nii", vol)
        return base + ".nii"
    np.save(base + ".npy", vol)
    return base + ".npy"


def serve(cfg: Config, missing: Sequence[str], source: str | None,
          out_dir: str, fmt: str = "auto",
          subjects: Sequence[str] | None = None,
          save_y: bool = True, z_bank: str | None = None,
          z_mode: str = "nearest_neighbour",
          export_aot: str | None = None,
          aot: str | None = None,
          aot_platforms: Sequence[str] | None = None,
          batch: int | None = None) -> Dict[str, list]:
    """Run missing-modality synthesis over the test fold.  Returns
    {subject: [written paths]}.

    ``export_aot``: instead of serving, write an AOT artifact
    (utils/aot.export_serve_step) for this config's batch shape and exit.
    ``aot``: load such an artifact and use it as the serving step (the
    model's Python code is then only needed for param-tree construction).
    ``batch``: serving batch size (default: the config's train batch_size;
    larger serving batches amortize fixed overheads — +31% at 64 vs 16 on
    a v5e, PERF.md serving sweep).
    """
    contrasts = list(cfg.contrast_list)
    miss_idx = []
    for m in missing:
        if m not in contrasts:
            raise ValueError(f"--missing {m!r} not in contrast_list "
                             f"{contrasts}")
        miss_idx.append(contrasts.index(m))
    if source is None:
        present = [c for c in contrasts if c not in missing]
        if not present:
            raise ValueError("every contrast is missing; nothing to "
                             "anchor the anatomy on")
        source = present[0]
    if source in missing:
        raise ValueError(f"--source {source!r} is in --missing")
    src_idx = contrasts.index(source)

    if fmt == "auto":
        try:
            import nibabel  # noqa: F401
            fmt = "nifti"
        except ImportError:
            fmt = "npy"

    from representation_disentanglement_tpu.main_missing import build_model
    from representation_disentanglement_tpu.training.checkpoint import (
        restore_model_state)
    from representation_disentanglement_tpu.training.train import (
        create_train_state)

    B = batch or cfg.batch_size
    model = build_model(cfg)
    data = DataAll(cfg.dataset_name, cfg.data_path, norm_type=cfg.norm_type,
                   batch_size=cfg.batch_size, num_fold=cfg.num_fold,
                   fold=cfg.fold, shuffle=False, block_size=cfg.block_size,
                   contrast_list=contrasts, dropoff=False,
                   skull_strip=cfg.skull_strip, image_size=cfg.input_size,
                   seed=cfg.seed)
    ds = data.test_dataset
    rows = _group_by_subject(ds.subj_list, ds.idx_list)
    if subjects:
        unknown = [s for s in subjects if s not in rows]
        if unknown:
            raise ValueError(f"subjects not in test fold: {unknown}")
        rows = {s: rows[s] for s in subjects}
    if not rows:
        raise ValueError("test fold is empty")

    # init params (jitted, tiny one-batch trace) then restore the checkpoint
    first = ds.get_batch(rows[next(iter(rows))][:cfg.batch_size])
    sample = {k: first[k] for k in ("inputs", "targets", "mask", "mask_img")}
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                                  sample)
    _, params, bstats, n_res, n_tot = restore_model_state(
        state.params, state.batch_stats, cfg.ckpt_path, cfg.ckpt_name)
    print(f"[serve] restored {n_res}/{n_tot} param tensors from "
          f"{os.path.join(cfg.ckpt_path, cfg.ckpt_name)}")

    if (export_aot or aot) and z_bank:
        raise ValueError("AOT artifacts cover the plain serving step; "
                         "--z-bank retrieval is a live-bank computation")
    if export_aot:
        from representation_disentanglement_tpu.utils.aot import (
            export_serve_step)
        sample_b = ds.get_batch(rows[next(iter(rows))][:1] * B)
        sample_b = {k: sample_b[k]
                    for k in ("inputs", "mask", "mask_img")}
        blob = export_serve_step(model, cfg, source=src_idx,
                                 sample=sample_b, params=params,
                                 batch_stats=bstats, with_y=save_y,
                                 platforms=aot_platforms)
        with open(export_aot, "wb") as f:
            f.write(blob)
        print(f"[serve] wrote AOT artifact {export_aot} "
              f"({len(blob) / 1e6:.2f} MB, batch {B})")
        return {}

    if z_bank:
        from representation_disentanglement_tpu.training.train import (
            load_vgg_constants, make_vgg_ctx)
        vgg_ctx = make_vgg_ctx(params, load_vgg_constants(cfg))
        bank_key, bank_z = load_z_bank(z_bank, cfg, src_idx, vgg_ctx)
        print(f"[serve] z retrieval ({z_mode}) from {z_bank}: "
              f"{bank_key.shape[0]} bank entries")
        ret_step = make_serve_step_retrieval(model, cfg, src_idx, miss_idx,
                                             z_mode, vgg_ctx, with_y=save_y)
        step = lambda p, bs, x, m, mi: ret_step(p, bs, x, m, mi,
                                                bank_key, bank_z)
    elif aot:
        from representation_disentanglement_tpu.utils.aot import (
            load_serve_step)
        step, hdr = load_serve_step(aot)
        if hdr["source"] != src_idx or hdr["with_y"] != save_y:
            raise ValueError(
                f"AOT artifact was exported for source={hdr['source']}, "
                f"with_y={hdr['with_y']}; requested source={src_idx}, "
                f"with_y={save_y}")
        if hdr["inputs_shape"][1] != B:
            raise ValueError(
                f"AOT artifact batch {hdr['inputs_shape'][1]} != serving "
                f"batch {B}")
        if hdr.get("compute_dtype", cfg.compute_dtype) != cfg.compute_dtype:
            raise ValueError(
                f"AOT artifact was exported with compute_dtype="
                f"{hdr['compute_dtype']!r} baked into its cast; config "
                f"requests {cfg.compute_dtype!r} — re-export or match the "
                f"config")
        print(f"[serve] AOT step from {aot} (platforms "
              f"{hdr['platforms']})")
    else:
        step = make_serve_step(model, cfg, src_idx, with_y=save_y)
    os.makedirs(out_dir, exist_ok=True)
    b = cfg.block_size
    written: Dict[str, list] = {}
    n_slices = 0
    t0 = time.perf_counter()
    # only the rows that get written are kept on the host
    keep_idx = miss_idx + ([src_idx] if src_idx not in miss_idx else [])
    for subj, ii in rows.items():
        # batches of B with the tail padded by repeating the last row so
        # every dispatch reuses the one compiled executable
        per_mod = {mi: [] for mi in keep_idx}
        y_slices = []
        for lo in range(0, len(ii), B):
            chunk = ii[lo:lo + B]
            n_valid = len(chunk)
            if n_valid < B:
                chunk = chunk + [chunk[-1]] * (B - n_valid)
            batch = ds.get_batch(chunk)
            inputs, mask = batch["inputs"], batch["mask"]
            for mi in miss_idx:
                inputs[mi] = 0.0
                mask[:, mi] = 0.0
            # Q6 background mask: contrast 0 unless it is being served
            ref_mod = 0 if 0 not in miss_idx else src_idx
            mask_img = (inputs[ref_mod, :, :, :, 0] == 0).astype(np.float32)
            x_hat, y = step(params, bstats, inputs, mask, mask_img)
            x_hat = np.asarray(x_hat)[:, :n_valid, :, :, b]  # center slice
            for mi in keep_idx:
                per_mod[mi].append(x_hat[mi])
            if save_y:
                y_slices.append(np.asarray(y)[:n_valid])
            n_slices += n_valid
        paths = []
        for mi in keep_idx:
            tag = "synth" if mi in miss_idx else "recon"
            vol = np.concatenate(per_mod[mi], axis=0)      # [D, H, W]
            paths.append(_save_volume(
                os.path.join(out_dir, f"{subj}_{contrasts[mi]}_{tag}"),
                vol, fmt))
        if save_y:
            yv = np.concatenate(y_slices, axis=0)          # [D, H, W, C]
            if cfg.dataset_name == "BraTS" and yv.shape[-1] >= 4:
                # label map via the reference's per-class rule: channel i
                # is class i+1, thresholded at 0.5 (src/util.py:946-953;
                # evaluate.device_metrics scores yf[..., 1:] the same way)
                fg = yv[..., 1:4]
                yv = (np.argmax(fg, axis=-1) + 1).astype(np.float32) \
                    * (np.max(fg, axis=-1) > 0.5)
            else:
                yv = yv[..., 0]
            paths.append(_save_volume(
                os.path.join(out_dir, f"{subj}_y"), yv, fmt))
        written[subj] = paths
        print(f"[serve] {subj}: {len(ii)} slices -> {len(paths)} volumes")
    dt = time.perf_counter() - t0
    print(f"[serve] {len(rows)} subjects, {n_slices} slices in {dt:.1f}s "
          f"({n_slices / dt:.1f} slices/s incl. IO)")
    return written


def main(argv=None):
    from representation_disentanglement_tpu.utils.profiling import (
        enable_compile_cache)
    enable_compile_cache()      # warm-start recompiles across CLI runs
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", nargs="?", default="config.yaml")
    ap.add_argument("--missing", required=True,
                    help="comma-separated contrasts to zero-fill and "
                         "synthesize (e.g. T1,T2_FLAIR)")
    ap.add_argument("--source", default=None,
                    help="present contrast whose anatomy drives the "
                         "synthesis (default: first non-missing)")
    ap.add_argument("--out-dir", default="serve_out")
    ap.add_argument("--ckpt-root", default="../ckpt")
    ap.add_argument("--format", default="auto",
                    choices=("auto", "npy", "nifti"))
    ap.add_argument("--subjects", default=None,
                    help="comma-separated subset of test-fold subjects")
    ap.add_argument("--no-y", action="store_true",
                    help="skip the fused y output volume")
    ap.add_argument("--z-bank", default=None,
                    help="results_all.h5 latent bank (from a `--set train` "
                         "eval dump); the missing modalities' z is then "
                         "retrieved by compact-anatomy similarity instead "
                         "of encoded from the zero-filled input")
    ap.add_argument("--z-mode", default="nearest_neighbour",
                    choices=("nearest_neighbour", "mean"))
    ap.add_argument("--export-aot", default=None, metavar="PATH",
                    help="write an ahead-of-time serving artifact "
                         "(jax.export StableHLO; utils/aot.py) for this "
                         "config's batch shape and exit")
    ap.add_argument("--aot-platforms", default=None, metavar="P1,P2",
                    help="lowering targets for --export-aot (e.g. tpu,cpu "
                         "to export for the serving fleet from a CPU box; "
                         "default: the current backend)")
    ap.add_argument("--aot", default=None, metavar="PATH",
                    help="serve with a previously exported AOT artifact "
                         "instead of tracing the model")
    ap.add_argument("--batch", type=int, default=None,
                    help="serving batch size (default: the config's "
                         "batch_size; 64 measured +31%% over 16 on a v5e "
                         "— PERF.md serving sweep)")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    cfg.phase = "test"            # resolve_run: reuse ckpt_timelabel dir
    cfg = resolve_run(cfg, ckpt_root=args.ckpt_root).derive().validate()
    serve(cfg, [m for m in args.missing.split(",") if m],
          args.source, args.out_dir, fmt=args.format,
          subjects=args.subjects.split(",") if args.subjects else None,
          save_y=not args.no_y, z_bank=args.z_bank, z_mode=args.z_mode,
          export_aot=args.export_aot, aot=args.aot,
          aot_platforms=(args.aot_platforms.split(",")
                         if args.aot_platforms else None),
          batch=args.batch)


if __name__ == "__main__":
    sys.exit(main())
