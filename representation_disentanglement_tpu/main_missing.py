"""Entry point: the reference's ``python main_missing.py`` workflow on TPU.

Run as ``python -m representation_disentanglement_tpu.main_missing
[config.yaml] [--data-root DIR] [--ckpt-root DIR]``.  Behavior follows
src/main_missing.py: everything is driven by the YAML config (same keys);
``phase: train`` runs the epoch loop with per-epoch validation, plateau LR
scheduling on the monitor metric, and best-checkpoint selection;
``phase: test`` evaluates the test fold and dumps ``results_all<info>.h5``.

Differences from the reference, all deliberate:
- gradient accumulation happens inside one jitted step (A microbatches per
  optimizer update; leftover microbatches at the epoch tail are dropped
  rather than leaking accumulated grads into the next epoch, which is what
  the reference's never-zeroed ``.grad`` does at non-divisible epoch
  lengths);
- non-finite losses raise with a state dump instead of ``pdb.set_trace()``
  (src/main_missing.py:265-278);
- the input pipeline prefetches to device on a background thread.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from representation_disentanglement_tpu.config import (
    Config, load_config, resolve_run)
from representation_disentanglement_tpu.data.dataset import DataAll
from representation_disentanglement_tpu.data.loader import BatchLoader
from representation_disentanglement_tpu.models import MultimodalModel
from representation_disentanglement_tpu.training.checkpoint import (
    restore_model_state, save_checkpoint)
from representation_disentanglement_tpu.training.evaluate import (
    evaluate, make_eval_step)
from representation_disentanglement_tpu.training.optim import (
    ReduceLROnPlateau)
from representation_disentanglement_tpu.training.stats import (
    save_result_stat)
from representation_disentanglement_tpu.utils.preempt import (
    PREEMPT_NAME, PreemptionGuard, clear_stale_preempt,
    drop_preempt_sidecar, latest_resume_checkpoint, tag_preempt_epoch)
from representation_disentanglement_tpu.training.train import (
    LOSS_KEYS, TrainState, create_train_state, draw_pairs, make_train_step)


def build_model(cfg: Config) -> MultimodalModel:
    # others['old'] selects the reference's pre-CondConv module set
    # (src/model.py:2938-2940), which is mathematically the non-conditional
    # shared-decoder configuration of the same architecture (SURVEY §2.6)
    is_cond = cfg.is_cond and not cfg.others.get("old", False)
    shared_inp_dec = cfg.shared_inp_dec or cfg.others.get("old", False)
    from representation_disentanglement_tpu.models.layers import (
        set_bn_fused, set_cond_mode)
    set_cond_mode(getattr(cfg, "cond_mode", "grouped") or "grouped")
    set_bn_fused(getattr(cfg, "fuse_bn", False))
    return MultimodalModel(
        modality_num=cfg.modality_num, in_num_ch=cfg.block_ch,
        out_num_ch=cfg.out_num_ch, s_num_ch=cfg.s_num_ch, z_size=cfg.z_size,
        input_size=cfg.input_size, is_cond=is_cond,
        is_discrim_s=cfg.is_discrim_s, is_distri_z=cfg.is_distri_z,
        shared_ana_enc=cfg.shared_ana_enc, shared_mod_enc=cfg.shared_mod_enc,
        shared_inp_dec=shared_inp_dec, fuse_method=cfg.fuse_method,
        input_output_act=cfg.input_output_act,
        target_output_act=cfg.target_output_act,
        target_model_name=cfg.target_model_name,
        mod_enc_s=cfg.others.get("mod_enc_s", True),
        s_compact_method=cfg.s_compact_method,
        s_sim_method=cfg.s_sim_method,
        ana_dec_act=cfg.others.get("ana_dec_act", "softmax"),
        softmax_remove_mask=cfg.others.get("softmax_remove_mask", False),
        fix_act_bug=cfg.fix_activation_bug,
        use_pallas=getattr(cfg, "use_pallas", False),
        notshared_impl=getattr(cfg, "notshared_impl", "vmap"),
        remat=getattr(cfg, "remat", True))


def make_loaders(cfg: Config, mesh=None):
    data = DataAll(
        cfg.dataset_name, cfg.data_path, norm_type=cfg.norm_type,
        batch_size=cfg.batch_size, num_fold=cfg.num_fold, fold=cfg.fold,
        shuffle=cfg.shuffle, block_size=cfg.block_size,
        contrast_list=cfg.contrast_list, aug=False, dropoff=cfg.dropoff,
        skull_strip=cfg.skull_strip, image_size=cfg.input_size,
        seed=cfg.seed)

    # HBM-resident volume cache: a batch then costs only int32 indices over
    # the host<->TPU link instead of ~27MB of slice blocks.  Under a data
    # mesh the TRAIN cache (the bulk of the subjects) is SHARDED over the
    # mesh axis so per-chip cache bytes scale ~1/N (VERDICT r3 item 2);
    # the small val/test caches stay replicated (exact single-pass eval).
    if cfg.device_data_cache and not cfg.skull_strip:
        from representation_disentanglement_tpu.data.device_store import (
            DeviceBatchLoader, ShardedDeviceBatchLoader,
            ShardedEvalBatchLoader, build_device_cache,
            build_sharded_device_cache)
        budget = int(cfg.device_cache_budget_gb * 2**30)
        clamp = 89 if cfg.dataset_name == "Tau" else 155
        loaders = []
        ok = True
        for ds, shuffle, drop_last, dropoff in (
                (data.train_dataset, cfg.shuffle, True, cfg.dropoff),
                (data.val_dataset, False, False, cfg.dropoff),
                (data.test_dataset, False, False, False)):
            shard_this = mesh is not None and (
                cfg.shard_data_cache if ds is data.train_dataset
                else cfg.shard_eval_cache)
            if shard_this:
                cache = build_sharded_device_cache(
                    cfg.dataset_name, data.store, ds.subj_list,
                    cfg.contrast_list, mesh, block_size=cfg.block_size,
                    budget_bytes=budget, clamp_max=clamp)
                if cache is None:
                    ok = False
                    break
                tag = "train" if ds is data.train_dataset else (
                    "val" if ds is data.val_dataset else "test")
                print(f"[data] {tag} cache sharded over {cache.n_shards} "
                      f"devices: {cache.nbytes_per_chip / 2**20:.0f} "
                      f"MiB/chip (total {cache.nbytes / 2**20:.0f} MiB)")
                if ds is data.train_dataset:
                    loaders.append(ShardedDeviceBatchLoader(
                        cache, ds.subj_list, ds.idx_list, cfg.batch_size,
                        shuffle=shuffle, drop_last=drop_last,
                        dropoff=dropoff, seed=cfg.seed))
                else:
                    # exhaustive padded single-pass (eval visits every
                    # sample once; padding rows carry mask=0 + valid=0)
                    loaders.append(ShardedEvalBatchLoader(
                        cache, ds.subj_list, ds.idx_list, cfg.batch_size,
                        dropoff=dropoff, seed=cfg.seed))
                continue
            cache = build_device_cache(
                cfg.dataset_name, data.store, ds.subj_list,
                cfg.contrast_list, cfg.block_size, budget_bytes=budget,
                clamp_max=clamp)
            if cache is None:
                ok = False
                break
            loaders.append(DeviceBatchLoader(
                cache, ds.subj_list, ds.idx_list, cfg.batch_size,
                shuffle=shuffle, drop_last=drop_last, dropoff=dropoff,
                seed=cfg.seed))
        if ok:
            print("[data] device-resident volume cache active")
            return tuple(loaders)

    train = BatchLoader(data.train_dataset, cfg.batch_size,
                        shuffle=cfg.shuffle, drop_last=True, seed=cfg.seed,
                        prefetch=cfg.prefetch_depth)
    val = BatchLoader(data.val_dataset, cfg.batch_size, shuffle=False,
                      prefetch=cfg.prefetch_depth)
    test = BatchLoader(data.test_dataset, cfg.batch_size, shuffle=False,
                       prefetch=cfg.prefetch_depth)
    return train, val, test


def _stack_micro(micro):
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *micro)


def train_device_epochs(cfg: Config, model, state: TrainState, txs, loaders,
                        start_epoch: int, scheduler: ReduceLROnPlateau,
                        mesh=None, guard=None) -> TrainState:
    """Whole-epoch-on-device loop (training/epoch.py): one upload, one
    metrics fetch per epoch, the steps dispatched in K-step ``lax.scan``
    segments (``cfg.epoch_chunk_steps``) with a host-side preemption poll
    between segments — a preempt loses at most K optimizer steps instead of
    the whole epoch (VERDICT r3 item 3a).  Under a data mesh the epoch plan
    is batch-sharded and the volume cache replicated; XLA inserts the
    gradient psum over ICI."""
    from representation_disentanglement_tpu.training.epoch import (
        epoch_indices, make_train_epoch)
    from representation_disentanglement_tpu.training.train import (
        METRIC_KEYS)
    train_loader, val_loader, _ = loaders
    train_epoch, n_micro = make_train_epoch(model, cfg, txs,
                                            train_loader.cache)
    eval_steps = make_eval_step(model, cfg)
    pair_rng = np.random.default_rng(cfg.seed)
    z_key = jax.random.PRNGKey(cfg.seed)
    monitor_best = 100.0
    for epoch in range(start_epoch + 1, cfg.epochs):
        t0 = time.time()
        plan, z_key = epoch_indices(train_loader, n_micro,
                                    cfg.modality_num, pair_rng, z_key)
        if plan is None:
            raise ValueError("not enough samples for one optimizer step")
        from representation_disentanglement_tpu.data.device_store import (
            ShardedDeviceBatchLoader)
        if mesh is not None and not isinstance(train_loader,
                                               ShardedDeviceBatchLoader):
            # sharded-cache plans come back already mesh-placed
            from representation_disentanglement_tpu.parallel import (
                shard_epoch_plan)
            plan = shard_epoch_plan(plan, mesh)
        total_steps = int(plan[0].shape[0])
        K = cfg.epoch_chunk_steps or total_steps
        chunks = []
        done = 0
        preempted_mid_epoch = False
        while done < total_steps:
            n = min(K, total_steps - done)
            chunk_plan = tuple(p[done:done + n] for p in plan)
            state, m = train_epoch(state, *chunk_plan,
                                   jnp.float32(scheduler.lr),
                                   jnp.asarray(done == 0))
            chunks.append(m)
            done += n
            if guard is not None and guard.requested and done < total_steps:
                # mid-epoch preemption: the state after `done` steps is
                # live on device; persist it tagged with the last COMPLETED
                # epoch so a resume replays this epoch (at-least-once, same
                # protocol as the per-step loop; utils/preempt.py)
                drop_preempt_sidecar(cfg.ckpt_path)
                save_checkpoint(
                    {"epoch": epoch - 1, "monitor_metric": monitor_best,
                     "stat": {}, "params": state.params,
                     "batch_stats": state.batch_stats,
                     "opt_state": state.opt_state,
                     "opt_d_state": state.opt_d_state,
                     "scheduler": scheduler.state_dict()},
                    False, cfg.ckpt_path, name=PREEMPT_NAME)
                tag_preempt_epoch(cfg.ckpt_path, epoch - 1)
                print(f"[preempt] saved {PREEMPT_NAME} mid-epoch {epoch} "
                      f"after {done}/{total_steps} on-device steps "
                      f"(resume replays the epoch); exiting", flush=True)
                preempted_mid_epoch = True
                break
        if preempted_mid_epoch:
            return state
        metrics = np.concatenate([np.asarray(m) for m in chunks], 0)
        n_steps = metrics.shape[0]
        if not np.isfinite(metrics).all():
            bad = np.where(~np.isfinite(metrics))[0][:1]
            raise FloatingPointError(
                f"non-finite metrics at epoch {epoch}, step {bad}")
        sums = metrics.sum(0)
        stat_train = {k: float(v) / (n_steps * n_micro)
                      for k, v in zip(METRIC_KEYS, sums)}
        stat_train.pop("grad_norm", None)
        dt = time.time() - t0
        sps = n_steps * cfg.effective_batch / dt
        save_result_stat(stat_train, cfg.ckpt_path, info=f"epoch[{epoch:2d}]")
        print(f"epoch {epoch} train ({dt:.1f}s, {sps:.1f} slices/s, "
              f"{n_steps} steps on-device):", stat_train)

        stat = evaluate(model, state.params, state.batch_stats, cfg,
                        val_loader, phase="val", set_name="val",
                        save_res=False, eval_steps=eval_steps, mesh=mesh)
        if cfg.lambda_recon_y == 0 or cfg.lambda_recon_y_fused == 0:
            monitor = stat["recon_x_mix"]
        else:
            monitor = stat["recon_y_fused"]
        scheduler.step(monitor)
        save_result_stat(stat, cfg.ckpt_path, info="val")
        print(f"epoch {epoch} val:", stat)
        is_best = monitor <= monitor_best
        monitor_best = min(monitor, monitor_best)
        save_checkpoint(
            {"epoch": epoch, "monitor_metric": monitor, "stat": stat,
             "params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state,
             "opt_d_state": state.opt_d_state,
             "scheduler": scheduler.state_dict()},
            is_best, cfg.ckpt_path)
        clear_stale_preempt(cfg.ckpt_path, epoch)
        if guard is not None and guard.requested:
            print(f"[preempt] stopped cleanly after epoch {epoch}",
                  flush=True)
            break
    return state


def train(cfg: Config, model, state: TrainState, txs, loaders,
          start_epoch: int, scheduler: ReduceLROnPlateau,
          mesh=None, guard=None) -> TrainState:
    if guard is None:
        with PreemptionGuard() as g:
            return train(cfg, model, state, txs, loaders, start_epoch,
                         scheduler, mesh=mesh, guard=g)
    from representation_disentanglement_tpu.data.device_store import (
        DeviceBatchLoader, ShardedDeviceBatchLoader)
    if isinstance(loaders[0], (DeviceBatchLoader, ShardedDeviceBatchLoader)):
        # the epoch-on-device scan now covers the adversarial and the
        # stage-2-freeze configs too (training/epoch.py)
        return train_device_epochs(cfg, model, state, txs, loaders,
                                   start_epoch, scheduler, mesh=mesh,
                                   guard=guard)
    train_loader, val_loader, _ = loaders
    from representation_disentanglement_tpu.utils.profiling import StepTimer
    train_step, n_micro = make_train_step(model, cfg, txs)
    eval_steps = make_eval_step(model, cfg)
    pair_rng = np.random.default_rng(cfg.seed)
    z_key = jax.random.PRNGKey(cfg.seed)
    monitor_best = 100.0
    timer = StepTimer(warmup=1)

    from representation_disentanglement_tpu.training.train import (
        metrics_to_dict)
    for epoch in range(start_epoch + 1, cfg.epochs):
        t0 = time.time()
        timer.reset_interval()
        metric_sum = None          # device-side accumulator; ONE fetch at
        n_iters = 0                # epoch end + one per log interval
        micro = []
        first = True
        for batch in train_loader:
            micro.append({k: batch[k] for k in
                          ("inputs", "targets", "mask", "mask_img")})
            if len(micro) < n_micro:
                continue
            stacked = _stack_micro(micro)
            micro = []
            if mesh is not None:
                from representation_disentanglement_tpu.parallel import (
                    shard_batch)
                stacked = shard_batch(stacked, mesh, stacked=True)
            z_key, *sub = jax.random.split(z_key, n_micro + 1)
            rngs = jnp.stack(sub)
            sim_pairs = jnp.asarray(draw_pairs(pair_rng, cfg.modality_num,
                                               n_micro))
            adv_pairs = jnp.asarray(draw_pairs(pair_rng, cfg.modality_num,
                                               n_micro))
            state, metrics = train_step(
                state, stacked, rngs, sim_pairs, adv_pairs,
                jnp.float32(scheduler.lr), first_of_epoch=first)
            first = False
            n_iters += n_micro
            timer.step(cfg.effective_batch)
            metric_sum = metrics if metric_sum is None \
                else metric_sum + metrics
            if guard is not None and guard.requested:
                # mid-epoch preemption: persist the live state tagged with
                # the last COMPLETED epoch so a resume replays this epoch
                # (at-least-once; utils/preempt.py). Drop any stale sidecar
                # FIRST so a kill between the save and the tag never leaves
                # a tag from an earlier preemption paired with this ckpt.
                drop_preempt_sidecar(cfg.ckpt_path)
                save_checkpoint(
                    {"epoch": epoch - 1, "monitor_metric": monitor_best,
                     "stat": {}, "params": state.params,
                     "batch_stats": state.batch_stats,
                     "opt_state": state.opt_state,
                     "opt_d_state": state.opt_d_state,
                     "scheduler": scheduler.state_dict()},
                    False, cfg.ckpt_path, name=PREEMPT_NAME)
                tag_preempt_epoch(cfg.ckpt_path, epoch - 1)
                print(f"[preempt] saved {PREEMPT_NAME} mid-epoch {epoch} "
                      f"(resume replays it); exiting", flush=True)
                return state
            if cfg.log_every and (n_iters // n_micro) % cfg.log_every == 0:
                m = metrics_to_dict(metrics)        # one transfer
                if not np.isfinite(m["all"]):
                    raise FloatingPointError(
                        f"non-finite loss at epoch {epoch}: {m}")
                print(f"Epoch[{epoch:3d}], iter[{n_iters:3d}]: " +
                      ", ".join(f"{k}=[{m[k] / n_micro:.4f}]"
                                for k in ("all", "recon_x", "recon_x_mix",
                                          "sim_s", "sim_z", "latent_z")))
        sums = metrics_to_dict(metric_sum) if metric_sum is not None else {
            k: 0.0 for k in LOSS_KEYS}
        if not np.isfinite(sums.get("all", 0.0)):
            raise FloatingPointError(
                f"non-finite loss during epoch {epoch}: {sums}")
        stat_train = {k: sums.get(k, 0.0) / max(n_iters, 1)
                      for k in LOSS_KEYS}
        save_result_stat(stat_train, cfg.ckpt_path, info=f"epoch[{epoch:2d}]")
        print(f"epoch {epoch} train ({time.time() - t0:.1f}s, "
              f"{timer.throughput:.1f} slices/s):", stat_train)

        stat = evaluate(model, state.params, state.batch_stats, cfg,
                        val_loader, phase="val", set_name="val",
                        save_res=False, eval_steps=eval_steps, mesh=mesh)
        # monitor metric selection (src/main_missing.py:317-320)
        if cfg.lambda_recon_y == 0 or cfg.lambda_recon_y_fused == 0:
            monitor = stat["recon_x_mix"]
        else:
            monitor = stat["recon_y_fused"]
        scheduler.step(monitor)
        save_result_stat(stat, cfg.ckpt_path, info="val")
        print(f"epoch {epoch} val:", stat)

        is_best = monitor <= monitor_best
        monitor_best = min(monitor, monitor_best)
        save_checkpoint(
            {"epoch": epoch, "monitor_metric": monitor, "stat": stat,
             "params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state,
             "opt_d_state": state.opt_d_state,
             "scheduler": scheduler.state_dict()},
            is_best, cfg.ckpt_path)
        clear_stale_preempt(cfg.ckpt_path, epoch)
        if guard is not None and guard.requested:
            print(f"[preempt] stopped cleanly after epoch {epoch}",
                  flush=True)
            break
    return state


def make_dropoff_loader(cfg: Config, sel_idx_list=(438, 450)):
    """`set: test_dropoff` harness (main_missing.py:348-350): exhaustive
    <=2-contrast drop subsets over selected test rows."""
    from representation_disentanglement_tpu.data.dataset import (
        TestDropoffDataset, VolumeStore, _H5_NAMES, load_idx_list)
    names = _H5_NAMES[cfg.dataset_name]
    h5_name = names[0] if cfg.norm_type == "mean" else names[1]
    store = VolumeStore(os.path.join(cfg.data_path, h5_name))
    if cfg.dataset_name == "BraTS":
        fold_txt = f"fold_BraTS_{cfg.fold}_test_noval.txt"
    elif cfg.dataset_name == "ZeroDose":
        from representation_disentanglement_tpu.data.dataset import (
            _zerodose_fold_names)
        fold_txt = _zerodose_fold_names(cfg.fold, cfg.modality_num)[2]
    else:
        fold_txt = f"fold_{cfg.dataset_name}_{cfg.fold}_test.txt"
    subjs, idxs = load_idx_list(os.path.join(cfg.data_path, fold_txt))
    sel = [i for i in sel_idx_list if i < len(subjs)] or list(
        range(min(2, len(subjs))))
    ds = TestDropoffDataset(store, subjs, idxs, sel,
                            block_size=cfg.block_size,
                            contrast_list=cfg.contrast_list,
                            dataset_name=cfg.dataset_name,
                            image_size=cfg.input_size)
    return BatchLoader(ds, cfg.batch_size, shuffle=False,
                       prefetch=cfg.prefetch_depth)


def run(cfg: Config, ckpt_root: str = "../ckpt", eval_set: str = "test",
        eval_info: str = "") -> dict:
    cfg = resolve_run(cfg, ckpt_root=ckpt_root).derive().validate()
    print(cfg.model_name, "->", cfg.ckpt_path)
    from representation_disentanglement_tpu.parallel import (
        mesh_from_config, replicate)
    mesh = mesh_from_config(cfg)
    if mesh is not None:
        print(f"[mesh] data-parallel over {mesh.devices.size} devices")
    model = build_model(cfg)
    loaders = make_loaders(cfg, mesh=mesh if cfg.phase == "train" else None)
    if mesh is not None:
        # device caches must be addressable by every mesh device: replicate
        # the packed volumes (the gather then runs shard-local per device)
        from representation_disentanglement_tpu.data.device_store import (
            DeviceBatchLoader)
        seen = set()
        for ld in loaders:
            if isinstance(ld, DeviceBatchLoader) and id(ld.cache) not in seen:
                seen.add(id(ld.cache))
                ld.cache.vols = replicate(ld.cache.vols, mesh)
                ld.cache.tgts = replicate(ld.cache.tgts, mesh)
                ld.cache.presence = replicate(ld.cache.presence, mesh)

    sample = next(iter(loaders[0 if cfg.phase == "train" else 2]))
    sample = {k: sample[k] for k in ("inputs", "targets", "mask", "mask_img")}
    state, txs = create_train_state(model, cfg,
                                    jax.random.PRNGKey(cfg.seed), sample)
    scheduler = ReduceLROnPlateau(cfg.lr)
    start_epoch = -1
    if cfg.continue_train or cfg.phase == "test":
        resume_name = cfg.ckpt_name
        if cfg.phase == "train":
            # prefer a preempt.ckpt when it is the more recent epoch
            # (utils/preempt.py; the test phase never reads preempt state)
            resume_name, _ = latest_resume_checkpoint(cfg.ckpt_path,
                                                      cfg.ckpt_name)
        ckpt, params, bstats, n_res, n_tot = restore_model_state(
            state.params, state.batch_stats, cfg.ckpt_path, resume_name)
        print(f"restored {n_res}/{n_tot} param tensors")
        state = state._replace(params=params, batch_stats=bstats)
        if "opt_state" in ckpt and n_res == n_tot:
            try:
                from flax import serialization
                state = state._replace(opt_state=serialization.from_state_dict(
                    state.opt_state, ckpt["opt_state"]))
            except Exception:
                print("loading optimizer failed!")  # per-key tolerance
                                                    # (util.py:880-888)
        if "scheduler" in ckpt:
            try:
                scheduler.load_state_dict(
                    jax.tree.map(float, ckpt["scheduler"]))
            except Exception:
                print("loading scheduler failed!")
        start_epoch = int(ckpt.get("epoch", -1))

    if mesh is not None:
        state = TrainState(*[replicate(s, mesh) for s in state])

    if cfg.phase == "train":
        cfg.snapshot_txt(cfg.ckpt_path)
        train(cfg, model, state, txs, loaders, start_epoch, scheduler,
              mesh=mesh)
        return {}
    if eval_set == "test_dropoff":
        loader, set_name = make_dropoff_loader(cfg), "test_dropoff"
    elif eval_set == "train":
        loader, set_name = loaders[0], "train"
    elif eval_set == "val":
        loader, set_name = loaders[1], "val"
    else:
        loader, set_name = loaders[2], "test"
    stat = evaluate(model, state.params, state.batch_stats, cfg, loader,
                    phase="test", set_name=set_name, save_res=True,
                    info=eval_info, mesh=mesh)
    print(stat)
    return stat


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", nargs="?", default="config.yaml")
    ap.add_argument("--ckpt-root", default="../ckpt")
    ap.add_argument("--data-root", default=None,
                    help="override the config's data_path (the directory "
                         "holding <dataset>_All_*.h5 + fold txts)")
    ap.add_argument("--set", dest="eval_set", default="test",
                    choices=["test", "val", "train", "test_dropoff"],
                    help="test-phase loader (ref main_missing.py:611-623)")
    ap.add_argument("--info", default="",
                    help="eval variant tag; 'nearest_neighbour' / 'mean' "
                         "activate latent retrieval (needs a prior "
                         "results_all.h5 bank)")
    args = ap.parse_args(argv)
    from representation_disentanglement_tpu.utils.profiling import (
        enable_compile_cache)
    enable_compile_cache()      # warm-start recompiles across CLI runs
    cfg = load_config(args.config)
    if args.data_root:
        cfg.data_path = args.data_root.rstrip("/") + "/"
    return run(cfg, ckpt_root=args.ckpt_root, eval_set=args.eval_set,
               eval_info=args.info)


if __name__ == "__main__":
    main()
