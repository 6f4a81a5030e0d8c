"""Evaluation loop: losses + metrics + results_all.h5 dump + retrieval.

Reference ``evaluate`` (src/main_missing.py:337-609): no-grad forward with
z = mean, the same loss accounting as training, per-batch metrics
(reconstruction metrics on the mix reconstructions when no y-loss is active,
else segmentation / reconstruction metrics on the fused y), an optional
nearest-neighbour / mean z-retrieval path for missing-modality imputation,
accumulation of all tensors and an HDF5 dump (src/main_missing.py:592-607),
with a safety break past 500 iterations.

The dump layout is converted to the reference's NCHW conventions so
``results_all<info>.h5`` is drop-in comparable:
  inputs [B, M*Cb, H, W], targets [B, Ct, H, W], y_fake_fused [B, Co, H, W],
  y_fake_list / xi_fake_list [B, M, C, H, W], xi_fake_mix [B, M(M-1), Cb, H, W],
  s_list [B, M, Cs, H, W], z_list [B, M, z].
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from representation_disentanglement_tpu import losses as L
from representation_disentanglement_tpu.training.train import (
    LOSS_KEYS, assemble_losses, load_vgg_constants, make_vgg_ctx)

try:
    import h5py
except ImportError:                                    # pragma: no cover
    h5py = None


def _nchw(a: np.ndarray) -> np.ndarray:
    """[..., H, W, C] -> [..., C, H, W]."""
    return np.moveaxis(a, -1, -3)


def parse_retrieval_info(info: str):
    """Parse the eval ``info`` tag into (retrieval_mode, query_source).

    ``nearest_neighbour`` / ``mean`` -> the reference's faithful rule
    (query modality |1-i|, src/main_missing.py:416-425).
    ``nearest_neighbour_src=<c>`` / ``mean_src=<c>`` -> serve.py's
    generalized rule: every missing modality is queried with modality c's
    anatomy (sensible for any M).  Anything else -> (None, None)."""
    for mode in ("nearest_neighbour", "mean"):
        if info == mode:
            return mode, None
        if info.startswith(mode + "_src="):
            return mode, int(info[len(mode) + 5:])
    return None, None


def make_eval_step(model, cfg):
    """Build the jitted eval step with the same TPU discipline as training:

    - inputs cast to ``cfg.compute_dtype`` (mirrors train.py's cast),
    - the 11 loss scalars returned as ONE stacked vector (one fetch per
      batch instead of 11 host<->device roundtrips, the pathology the
      reference has at src/main_missing.py:253-263),
    - PSNR/SSIM/MSE or Dice/IoU computed ON DEVICE per sample
      (metrics.recon_metrics_device / seg_metrics_device) so the full
      prediction grid is never fetched unless the caller dumps results.
    """
    M = cfg.modality_num
    needs_y = cfg.lambda_recon_y > 0 or cfg.lambda_recon_y_fused > 0
    vgg_constants = load_vgg_constants(cfg)
    cast = (lambda b: dict(b, inputs=b["inputs"].astype(jnp.bfloat16))) \
        if cfg.compute_dtype == "bfloat16" else (lambda b: b)

    # which metric family applies (src/main_missing.py:519-534)
    if cfg.lambda_recon_y == 0 and cfg.lambda_recon_y_fused == 0:
        metric_names = ("ssim", "psnr", "rmse")          # on mix recon
    elif cfg.dataset_name == "BraTS":
        metric_names = ("dice", "iou")                   # on fused y
    else:
        metric_names = ("ssim", "psnr", "rmse")          # on fused y

    from representation_disentanglement_tpu.metrics import (
        recon_metrics_device, seg_metrics_device)

    def device_metrics(batch, out):
        """-> [n_metrics, n_samples] per-sample metric matrix on device.
        `batch` must be the UNCAST batch: ground truth is scored at full
        precision like the reference, even when the model runs bf16."""
        if cfg.lambda_recon_y == 0 and cfg.lambda_recon_y_fused == 0:
            return mix_metric_mat(batch["inputs"], out["x_fake_grid"])
        yf = out["y_fake_fused"]
        tgt = batch["targets"][..., 0]
        if cfg.dataset_name == "BraTS":
            # reference indexes pred[i] for class i+1: its 4-ch logits'
            # channels 1..3 -> our channels 1..3 of NHWC
            return jnp.stack(seg_metrics_device(tgt, yf[..., 1:]))
        return jnp.stack(recon_metrics_device(tgt, yf[..., 0]))

    @functools.partial(jax.jit, static_argnames=("compute_y",))
    def eval_step(params, batch_stats, batch, sim_pair, adv_pair,
                  compute_y: bool = True):
        cb = cast(batch)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            cb["inputs"], cb["mask"], cb["mask_img"], None,
            train=False, compute_y=compute_y or needs_y,
            latent_cycle=cfg.lambda_latent_z > 0,
            adv_pair=adv_pair if cfg.is_discrim_s else None)
        l = assemble_losses(cfg, cb, out, sim_pair, adv_pair,
                            out.get("d_logits"),
                            vgg_ctx=make_vgg_ctx(params, vgg_constants))
        loss_vec = jnp.stack([l[k] for k in LOSS_KEYS])
        metric_mat = device_metrics(batch, out)
        return out, loss_vec, metric_mat

    @jax.jit
    def decode_with_z(params, batch_stats, s, z_find):
        """Re-decode with retrieved z (src/main_missing.py:427-428)."""
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, s, z_find,
            method=model.decode_inputs_grid)

    return eval_step, decode_with_z, metric_names


def mix_metric_mat(inputs, grid):
    """Per-slice recon metrics over the mix reconstructions, channel 0, in
    the reference's i-major j != i order (src/main_missing.py:519-527).
    inputs: [M, B, H, W, Cb] full-precision ground truth;
    grid: [M_i, M_j, B, H, W, Cb] decoded grid -> [3, M(M-1)*B]."""
    from representation_disentanglement_tpu.metrics import (
        recon_metrics_device)
    M = grid.shape[0]
    gts = jnp.concatenate(
        [inputs[j, ..., 0] for i in range(M) for j in range(M) if i != j], 0)
    preds = jnp.concatenate(
        [grid[i, j, ..., 0] for i in range(M) for j in range(M) if i != j],
        0)
    return jnp.stack(recon_metrics_device(gts, preds))


def _mix_views(grid: np.ndarray):
    """Off-diagonal (i, j) pairs in reference order (i-major, j != i)."""
    M = grid.shape[0]
    return [grid[i, j] for i in range(M) for j in range(M) if i != j]


class _H5Stream:
    """Incremental ``results_all<info>.h5`` writer.

    The reference accumulates every per-batch tensor in host lists and
    concatenates once at the end (src/main_missing.py:548-607) — for a real
    BraTS test fold that is tens of GB of host RAM (inputs + the M(M-1) mix
    grid + s/z per slice).  Here each batch is appended to resizable h5
    datasets instead, so host memory stays O(one batch) regardless of fold
    size while the final on-disk layout (dataset names, dtypes, row order)
    is unchanged."""

    def __init__(self, path: str):
        self.f = h5py.File(path, "w")
        self._str_rows: list = []        # subj_id: tiny, needs global max
                                         # byte width to match the
                                         # reference's concatenated dtype

    def append(self, key: str, arr) -> None:
        arr = np.asarray(arr)
        if key == "subj_id":
            self._str_rows.append(arr)
            return
        if key not in self.f:
            self.f.create_dataset(
                key, data=arr, maxshape=(None,) + arr.shape[1:],
                chunks=(max(1, arr.shape[0]),) + arr.shape[1:])
        else:
            d = self.f[key]
            n = d.shape[0]
            d.resize(n + arr.shape[0], axis=0)
            d[n:] = arr

    def close(self) -> None:
        if self._str_rows:
            self.f.create_dataset(
                "subj_id", data=np.concatenate(self._str_rows, 0))
        self.f.close()


def evaluate(model, params, batch_stats, cfg, loader, *, phase="val",
             set_name="val", save_res=False, info="",
             sim_rng: Optional[np.random.Generator] = None,
             eval_steps=None, mesh=None) -> Dict[str, float]:
    """Evaluation loop.  With ``mesh`` (a data-parallel ``jax.sharding.Mesh``)
    each batch's sample axis is sharded over the mesh and params replicated,
    so per-epoch validation under ``mesh_shape: {data: N}`` uses every chip
    the training loop does."""
    if h5py is None and (save_res or
                         parse_retrieval_info(info)[0] is not None):
        raise ImportError("h5py required for result dumps / retrieval")
    eval_step, decode_with_z, metric_names = \
        eval_steps or make_eval_step(model, cfg)
    sim_rng = sim_rng or np.random.default_rng(10)
    M = cfg.modality_num
    if mesh is not None:
        from representation_disentanglement_tpu.parallel.mesh import (
            replicate, shard_batch)
        params = replicate(params, mesh)
        batch_stats = replicate(batch_stats, mesh)

    loss_sums = np.zeros(len(LOSS_KEYS), np.float64)
    metrics_acc: Dict[str, list] = {}

    res_path = os.path.join(cfg.ckpt_path, "result_" + set_name)
    os.makedirs(res_path, exist_ok=True)
    dump = _H5Stream(os.path.join(res_path, "results_all" + info + ".h5")) \
        if phase == "test" and save_res else None

    retrieval_mode, retrieval_src = parse_retrieval_info(info)
    retrieval = retrieval_mode is not None
    if retrieval:
        if retrieval_src is None and M > 2:
            # faithful to the reference (src/main_missing.py:416-425, which
            # queries modality |1-i|, i.e. modality 1 for every i > 1) but
            # only *meaningful* for the 2-contrast setups it was written for.
            # `info=<mode>_src=<c>` activates serve.py's generalized
            # "query with the anatomy source" rule instead.
            print(f"[retrieval] WARNING: the reference's retrieval query "
                  f"rule src=|1-i| assumes 2 contrasts; with M={M} every "
                  f"missing modality i>1 is queried with modality 1's "
                  f"anatomy key. Pass --info {retrieval_mode}_src=<c> for "
                  f"the generalized single-source rule.")
        vgg_ctx = make_vgg_ctx(params, load_vgg_constants(cfg))
        bank_path = os.path.join(res_path, "results_all.h5")
        with h5py.File(bank_path, "r") as bank:
            s_saved = np.asarray(bank["s_list"])       # [N, M, Cs, H, W]
            z_saved = np.asarray(bank["z_list"])       # [N, M, z]
        s_saved_nhwc = np.moveaxis(s_saved, 2, -1)
        s_compact_saved = [np.asarray(L.compact_s(
            jnp.asarray(s_saved_nhwc[:, i]), cfg.s_compact_method, vgg_ctx))
            for i in range(M)]

    n_iter = 0
    stale_y = None          # reference appends the stale iter-0 y each iter
                            # when y-losses are off (main_missing.py:435-443,
                            # 548-549) so dump rows stay aligned with inputs
    for it, batch in enumerate(loader):
        from representation_disentanglement_tpu.training.train import \
            draw_pairs
        sim_pair = jnp.asarray(draw_pairs(sim_rng, M, 1)[0])
        adv_pair = jnp.asarray(draw_pairs(sim_rng, M, 1)[0])
        jb = {k: batch[k] for k in
              ("inputs", "targets", "mask", "mask_img")}
        if mesh is not None and np.shape(jb["mask"])[0] % mesh.size == 0:
            jb = shard_batch(jb, mesh)
        out, loss_vec, metric_mat = eval_step(
            params, batch_stats, jb, sim_pair, adv_pair, compute_y=(it == 0))

        z_find = None
        if retrieval:
            # assume missing modality i; query with compact-s of |1-i|
            # (src/main_missing.py:416-425; written for the 2-contrast case)
            # or, with `_src=<c>`, always with modality c's anatomy — the
            # generalized rule the serving path uses (serve.py:79-106)
            z_cols = []
            for i in range(M):
                src = retrieval_src if retrieval_src is not None \
                    else abs(1 - i)
                si_c = L.compact_s(out["s"][src], cfg.s_compact_method,
                                   vgg_ctx)
                if retrieval_mode == "nearest_neighbour":
                    zf = L.nearest_neighbour_z_by_s(
                        jnp.asarray(s_compact_saved[src]),
                        jnp.asarray(z_saved[:, i]), si_c)
                else:
                    zf = jnp.broadcast_to(
                        L.mean_z(jnp.asarray(z_saved[:, i])),
                        (si_c.shape[0], z_saved.shape[-1]))
                z_cols.append(zf)
            z_find = jnp.stack(z_cols, 0)                  # [M, B, z]
            grid = decode_with_z(params, batch_stats, out["s"], z_find)
            out = dict(out, x_fake_grid=grid)

        if z_find is not None and cfg.lambda_recon_y == 0 \
                and cfg.lambda_recon_y_fused == 0:
            # retrieval replaced the grid: recompute the mix-recon metrics
            # on device from the re-decoded grid (src/main_missing.py:519-527
            # evaluates whatever xi_fake_mix the retrieval path produced)
            metric_mat = mix_metric_mat(jb["inputs"], out["x_fake_grid"])

        # two small fetches per batch (11-loss vector + per-sample metric
        # matrix); prediction tensors stay on device unless dumping.
        # ``valid`` marks the padding rows a sharded eval cache emits to
        # keep every per-device plan full (data/device_store.py:
        # ShardedEvalBatchLoader); they carry mask=0 so every mask-gated
        # loss already excludes them — metrics and dump rows are filtered
        # host-side here.
        valid = np.asarray(batch["valid"]) if "valid" in batch else None
        loss_sums += np.asarray(loss_vec, np.float64)
        mat = np.asarray(metric_mat, np.float32)
        if valid is not None:
            reps = mat.shape[1] // valid.shape[0]   # 1 (y) or M(M-1) (mix)
            mat = mat[:, np.tile(valid, reps)]
        for k, row in zip(metric_names, mat):
            metrics_acc.setdefault(k, []).extend(row.astype(float).tolist())

        if dump is not None:
            sel = valid if valid is not None else slice(None)
            grid_np = np.asarray(out["x_fake_grid"], np.float32)
            B = np.asarray(jb["targets"]).shape[0]
            inp = np.asarray(jb["inputs"])                 # [M,B,H,W,Cb]
            dump.append("inputs",
                        _nchw(inp).transpose(1, 0, 2, 3, 4).reshape(
                            B, -1, inp.shape[2], inp.shape[3])[sel])
            dump.append("targets", _nchw(np.asarray(jb["targets"]))[sel])
            dump.append("mask", np.asarray(jb["mask"])[sel])
            dump.append("subj_id",
                        np.array(batch["subj_id"], dtype="S")[sel])
            dump.append("slice_idx", np.asarray(batch["slice_idx"])[sel])
            if out.get("y_fake_fused") is not None:
                stale_y = (np.asarray(out["y_fake_fused"], np.float32),
                           np.asarray(out["y_fake_list"], np.float32))
            if stale_y is not None:
                dump.append("y_fake_fused", _nchw(stale_y[0])[sel])
                dump.append("y_fake_list",
                            _nchw(stale_y[1]).transpose(1, 0, 2, 3, 4)[sel])
            diag = grid_np[np.arange(M), np.arange(M)]
            dump.append("xi_fake_list",
                        _nchw(diag).transpose(1, 0, 2, 3, 4)[sel])
            mix = np.stack(_mix_views(grid_np), 0)
            dump.append("xi_fake_mix",
                        _nchw(mix).transpose(1, 0, 2, 3, 4)[sel])
            dump.append("s_list", _nchw(np.asarray(
                out["s"], np.float32)).transpose(1, 0, 2, 3, 4)[sel])
            dump.append("z_list",
                        np.asarray(out["z"],
                                   np.float32).transpose(1, 0, 2)[sel])
            if z_find is not None:
                dump.append("z_list_find_all",
                            np.asarray(z_find,
                                       np.float32).transpose(1, 0, 2)[sel])

        n_iter = it + 1
        if it > cfg.eval_max_iters - 1:                 # main_missing.py:561
            break

    stat = {k: float(v) / max(n_iter, 1)
            for k, v in zip(LOSS_KEYS, loss_sums)}
    for k, v in metrics_acc.items():
        stat[k] = float(np.mean(v))

    if dump is not None:
        dump.close()
    return stat
