"""Whole-volume 3D entry point (NVNet3D) — the reference ships the modules
and datasets but no driver (SURVEY §2.6).

Usage:
  python -m representation_disentanglement_tpu.main_3d \
      --data-path ../data --dataset BraTS --epochs 10 --batch-size 1 \
      [--depth-shards N]   # depth-sharded eval over a mesh

Expects the same HDF5 + fold-txt artifacts as the 2D path; trains on
whole-volume slabs ([45:-46] of BraTS, src/util.py:769).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from representation_disentanglement_tpu.data.dataset import (
    VolumeStore, _H5_NAMES, load_idx_list)
from representation_disentanglement_tpu.data.dataset3d import (
    VolumeDataset3D, collate_volumes)
from representation_disentanglement_tpu.models.unet3d import NVNet3D
from representation_disentanglement_tpu.training.train3d import (
    create_state_3d, make_eval_step_3d, make_train_step_3d)


def volume_loader(ds, batch_size, shuffle, seed=10, drop_last=True):
    """``drop_last=True`` for training (fixed batch shape = one compiled
    executable, and sharded steps need the full batch); eval passes False
    so a tail smaller than the batch (e.g. a 1-subject val fold) still
    yields instead of silently evaluating nothing."""
    rng = np.random.default_rng(seed)

    def gen():
        order = np.arange(len(ds))
        if shuffle:
            rng.shuffle(order)
        buf = []
        for i in order:
            s = ds[int(i)]
            if s is None:
                continue
            buf.append(s)
            if len(buf) == batch_size:
                yield collate_volumes(buf)
                buf = []
        if buf and not drop_last:
            yield collate_volumes(buf)
    return gen


def main(argv=None):
    from representation_disentanglement_tpu.utils.profiling import (
        enable_compile_cache)
    enable_compile_cache()      # warm-start recompiles across CLI runs
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--dataset", default="BraTS")
    ap.add_argument("--contrasts", nargs="+",
                    default=["T1", "T1c", "T2", "T2_FLAIR"])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--init-channels", type=int, default=16)
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--image-size", type=int, nargs=3,
                    default=[160, 192, 64], help="H W D slab")
    ap.add_argument("--slab-start", type=int, default=None,
                    help="first slab slice (default 45, the reference's)")
    ap.add_argument("--depth-shards", type=int, default=0,
                    help="shard the volume depth axis over N devices for "
                         "BOTH training (shard_map + halo exchange) and eval")
    ap.add_argument("--data-shards", type=int, default=0,
                    help="additionally shard the batch over N devices "
                         "(composed DP x depth-SP on an N x depth-shards "
                         "mesh; requires --batch-size divisible by N)")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation microbatches per step "
                         "(unsharded training only)")
    ap.add_argument("--resume", action="store_true",
                    help="resume params/opt-state/epoch from --ckpt-dir")
    ap.add_argument("--ckpt-dir", default="../ckpt3d")
    ap.add_argument("--phase", choices=["train", "test"], default="train",
                    help="test: restore --ckpt-name, evaluate the test "
                         "fold (per-subject + mean dice/IoU) and export "
                         "predicted label volumes (2D-driver symmetry; "
                         "volume contract of src/util.py:257-309)")
    ap.add_argument("--ckpt-name", default="model_best.ckpt",
                    help="checkpoint restored by --phase test")
    ap.add_argument("--no-export", action="store_true",
                    help="skip writing per-subject prediction volumes")
    args = ap.parse_args(argv)

    names = _H5_NAMES[args.dataset]
    store = VolumeStore(os.path.join(args.data_path, names[1]))
    if args.dataset == "BraTS":
        fold = lambda s: f"fold_BraTS_{args.fold}_{s}_noval.txt"
    else:
        fold = lambda s: f"fold_{args.dataset}_{args.fold}_{s}.txt"
    train_subjs = np.unique(load_idx_list(
        os.path.join(args.data_path, fold("train")))[0])
    val_subjs = np.unique(load_idx_list(
        os.path.join(args.data_path, fold("val")))[0])
    test_subjs = np.unique(load_idx_list(
        os.path.join(args.data_path, fold("test")))[0]) \
        if args.phase == "test" else []

    H, W, D = args.image_size
    # reference slabs [45:-46] (BraTS, D=155) / [45:-47] (ZeroDose, D=156)
    # both equal [45 : 45+64]; generalize to the requested depth
    slab = slice(45, 45 + D) if args.slab_start is None \
        else slice(args.slab_start, args.slab_start + D)
    train_ds = VolumeDataset3D(args.dataset, store, train_subjs,
                               args.contrasts, aug=True,
                               image_size=(H, W, D), slab=slab)
    val_ds = VolumeDataset3D(args.dataset, store, val_subjs, args.contrasts,
                             image_size=(H, W, D), slab=slab)
    test_ds = VolumeDataset3D(args.dataset, store, test_subjs,
                              args.contrasts, image_size=(H, W, D),
                              slab=slab) if args.phase == "test" else None

    model = NVNet3D(input_shape=(D, H, W), in_channels=len(args.contrasts),
                    out_channels=3, init_channels=args.init_channels)
    init_ds = test_ds if args.phase == "test" else train_ds
    sample = next(volume_loader(init_ds, args.batch_size, False,
                                drop_last=False)())
    state, tx = create_state_3d(model, jax.random.PRNGKey(10),
                                jnp.asarray(sample["inputs"]))
    mesh = None
    if args.depth_shards > 1 or args.data_shards > 1:
        from representation_disentanglement_tpu.parallel.halo import (
            make_depth_mesh, make_volume_mesh)
        from representation_disentanglement_tpu.training.train3d import (
            make_sharded_train_step_3d)
        nd = max(args.depth_shards, 1)
        na = max(args.data_shards, 1)
        if D % nd or (D // 16) % nd:
            raise ValueError(
                f"depth {D} and {D}//16 must divide by --depth-shards "
                f"{nd} (parallel/halo.py constraints)")
        if args.batch_size % na:
            raise ValueError(f"--batch-size {args.batch_size} must divide "
                             f"by --data-shards {na}")
        if args.accum > 1:
            raise ValueError("--accum is not supported together with "
                             "--depth-shards/--data-shards (the sharded "
                             "step takes one batch per optimizer step)")
        if na > 1:
            mesh = make_volume_mesh(na, nd)
            print(f"[mesh] composed {na}-way data x {nd}-way depth "
                  f"training over {mesh.devices.size} devices")
            step = make_sharded_train_step_3d(model, tx, mesh,
                                              data_axis="data")
        else:
            mesh = make_depth_mesh(nd)
            print(f"[mesh] depth-sharded training over {mesh.devices.size} "
                  f"devices (halo-exchange convs, psum'd loss reductions)")
            step = make_sharded_train_step_3d(model, tx, mesh)
    else:
        step = make_train_step_3d(model, tx, accum=args.accum)
    eval_step = make_eval_step_3d(model)

    from representation_disentanglement_tpu.training.checkpoint import (
        load_checkpoint, save_checkpoint)
    from representation_disentanglement_tpu.utils.preempt import (
        PREEMPT_NAME, clear_stale_preempt, latest_resume_checkpoint)
    start_epoch = 0
    resumed_monitor = float("inf")
    if args.phase == "test":
        from representation_disentanglement_tpu.training.checkpoint import (
            load_partial_params)
        ckpt = load_checkpoint(args.ckpt_dir, args.ckpt_name)
        params, n_res, n_tot = load_partial_params(state.params,
                                                   ckpt.get("params"))
        print(f"[test] restored {n_res}/{n_tot} param tensors from "
              f"{args.ckpt_name}")
        state = state._replace(params=params)
    elif args.resume:
        import glob
        from flax import serialization
        from representation_disentanglement_tpu.training.checkpoint import (
            load_partial_params)
        # numeric sort: lexicographic breaks past epoch 999 (epoch1000 <
        # epoch999 as strings with the 3-digit zero padding)
        epochs = sorted(
            glob.glob(os.path.join(args.ckpt_dir, "epoch*.ckpt")),
            key=lambda p: int("".join(filter(str.isdigit,
                                             os.path.basename(p))) or 0))
        name = os.path.basename(epochs[-1]) if epochs else "model_best.ckpt"
        # a mid-epoch preempt.ckpt (utils/preempt.py) wins when it is at
        # least as recent as the newest end-of-epoch checkpoint
        name, _pre = latest_resume_checkpoint(args.ckpt_dir, name)
        ckpt = _pre if _pre is not None else load_checkpoint(args.ckpt_dir,
                                                             name)
        params, n_res, n_tot = load_partial_params(state.params,
                                                   ckpt.get("params"))
        print(f"[resume] restored {n_res}/{n_tot} param tensors")
        opt_state = state.opt_state
        if "opt_state" in ckpt and n_res == n_tot:
            try:
                opt_state = serialization.from_state_dict(
                    state.opt_state, ckpt["opt_state"])
            except Exception:
                print("loading optimizer failed!")
        state = state._replace(params=params, opt_state=opt_state)
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        # `best` tracks the best-so-far monitor (model_best.ckpt), which may
        # be better than the latest epoch we resume the state from
        try:
            best_ckpt = load_checkpoint(args.ckpt_dir)
        except ValueError:
            best_ckpt = ckpt
        resumed_monitor = float(best_ckpt.get("monitor_metric",
                                              float("inf")))
        # checkpoints written before val-dice monitoring carry a train-loss
        # monitor_metric (no monitor_is_val_dice tag, stored as an int —
        # flax msgpack cannot round-trip str leaves): incommensurable with
        # 1 - val_dice, so restart the best tracking instead of min()-ing
        # apples against oranges
        if int(best_ckpt.get("monitor_is_val_dice", 0)) != 1:
            print("[resume] checkpoint monitor is not 1-val_dice "
                  "(train-loss era or no-positives fold); resetting "
                  "best-monitor tracking")
            resumed_monitor = float("inf")
        print(f"[resume] from epoch {start_epoch} ({name}, "
              f"best monitor {resumed_monitor:.4f})")

    # validation forward, built ONCE (params passed per call, so the same
    # compiled executable serves every epoch).  Optionally depth-sharded —
    # but NOT on the training mesh when it is composed (data x depth):
    # sharded_nvnet_infer_fn's specs only mention the depth axis, so every
    # data row would redundantly run the identical eval forward; a
    # depth-only mesh does the same work once.
    if args.depth_shards > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        from representation_disentanglement_tpu.parallel.halo import (
            make_depth_mesh, sharded_nvnet_infer_fn)
        emesh = mesh if mesh is not None and "data" not in mesh.axis_names \
            else make_depth_mesh(args.depth_shards)
        run = sharded_nvnet_infer_fn(model, emesh)
        # params trained on the composed (data x depth) mesh are committed
        # to MORE devices than the depth-only eval mesh; a committed array
        # entering run()'s jit raises "incompatible devices", so reshard
        # OUTSIDE the jit (no-op when train and eval mesh coincide)
        ev_spec = NamedSharding(emesh, PartitionSpec())
        reshard = lambda p: jax.device_put(p, ev_spec)
        # returns raw logits; match make_eval_step_3d's sigmoid
        infer = lambda p, x: jax.nn.sigmoid(run({"params": p}, x)[0])
    else:
        reshard = lambda p: p
        infer = lambda p, x: eval_step(p, x)[0]

    def validate(params):
        """Mean per-class dice over the val fold (reference dice semantics:
        +1 smoothing, classes 1-3, threshold 0.5 — src/util.py:980-992)."""
        params = reshard(params)        # once per epoch, not per batch
        dices = []
        for batch in volume_loader(val_ds, args.batch_size, False,
                                   drop_last=False)():
            probs = np.asarray(infer(params, jnp.asarray(batch["inputs"])))
            seg = batch["targets"][..., 0]
            for b in range(probs.shape[0]):
                for c in range(3):
                    gt = seg[b] == c + 1
                    pr = probs[b, ..., c] > 0.5
                    inter = np.logical_and(gt, pr).sum()
                    dices.append((2 * inter + 1) / (gt.sum() + pr.sum() + 1))
        return float(np.mean(dices)) if dices else float("nan")

    from representation_disentanglement_tpu.training.stats import (
        save_result_stat)
    os.makedirs(args.ckpt_dir, exist_ok=True)

    if args.phase == "test":
        # 3D test fold: per-subject + mean dice/IoU with the 2D driver's
        # metric definitions, plus predicted label volumes (NIfTI when
        # nibabel is importable, .npy otherwise) — the 2D path's
        # results_all.h5 + NIfTI symmetry (src/util.py:257-309 volume
        # re-assembly contract; here predictions are whole volumes already)
        from representation_disentanglement_tpu.metrics import (
            compute_segmentation_metrics)
        res_dir = os.path.join(args.ckpt_dir, "result_test")
        os.makedirs(res_dir, exist_ok=True)
        params = reshard(state.params)
        dices, ious = [], []
        for batch in volume_loader(test_ds, args.batch_size, False,
                                   drop_last=False)():
            probs = np.asarray(infer(params, jnp.asarray(batch["inputs"])),
                               np.float32)            # [B, D, H, W, 3]
            m = compute_segmentation_metrics(batch["targets"], probs)
            for b, subj in enumerate(batch["subj_id"]):
                dices.append(m["dice"][b])
                ious.append(m["iou"][b])
                print(f"[test] {subj}: dice {m['dice'][b]:.4f} "
                      f"iou {m['iou'][b]:.4f}")
                if args.no_export:
                    continue
                pr = probs[b]
                # label volume: 0 unless some class prob clears the 0.5
                # threshold (the per-class rule the metrics use), else the
                # argmax class id 1..3
                lab = np.where(pr.max(-1) > 0.5, pr.argmax(-1) + 1,
                               0).astype(np.float32)
                base = os.path.join(res_dir, f"{subj}_pred")
                try:
                    from representation_disentanglement_tpu.utils.visualize \
                        import save_volume_nifti
                    save_volume_nifti(base + ".nii.gz", lab)
                except ImportError:
                    np.save(base + ".npy", lab)
        stat = {"dice": float(np.mean(dices)) if dices else float("nan"),
                "iou": float(np.mean(ious)) if ious else float("nan"),
                "n_subjects": len(dices)}
        save_result_stat(stat, args.ckpt_dir, info="test")
        print(f"[test] mean dice {stat['dice']:.4f} iou {stat['iou']:.4f} "
              f"over {len(dices)} subjects -> {res_dir}")
        return stat

    key = jax.random.PRNGKey(10)
    best = resumed_monitor
    val_dice = float("nan")
    from representation_disentanglement_tpu.utils.preempt import (
        PreemptionGuard, drop_preempt_sidecar, tag_preempt_epoch)
    with PreemptionGuard() as guard:
        for epoch in range(start_epoch, args.epochs):
            t0 = time.time()
            terms = []
            micro = []
            for batch in volume_loader(train_ds, args.batch_size, True,
                                       seed=10 + epoch)():
                jb = {"inputs": jnp.asarray(batch["inputs"]),
                      "targets": jnp.asarray(batch["targets"])}
                if mesh is None and args.accum > 1:
                    micro.append(jb)
                    if len(micro) < args.accum:
                        continue
                    jb = jax.tree.map(lambda *xs: jnp.stack(xs), *micro)
                    micro = []
                key, sub = jax.random.split(key)
                state, m = step(state, jb, sub, jnp.float32(args.lr))
                # one device->host round trip per step: stack the metric
                # scalars on device, fetch the vector (a per-key float() would
                # sync once per metric through the tunnel)
                mkeys = sorted(m)
                mvals = np.asarray(jnp.stack([m[k] for k in mkeys]))
                if not np.isfinite(mvals).all():
                    # §5.3 failure detection: halt with context instead of
                    # training onward on NaN (the 2D driver does the same)
                    raise FloatingPointError(
                        f"non-finite metric at epoch {epoch} step "
                        f"{len(terms)}: "
                        f"{dict(zip(mkeys, map(float, mvals)))}")
                terms.append(dict(zip(mkeys, map(float, mvals))))
                if guard.requested:
                    # mid-epoch preemption: persist live state tagged with
                    # the last completed epoch so --resume replays this one.
                    # Stale sidecar dropped first (see utils/preempt.py).
                    drop_preempt_sidecar(args.ckpt_dir)
                    save_checkpoint(
                        {"epoch": epoch - 1, "params": state.params,
                         "opt_state": state.opt_state,
                         "monitor_metric": best,
                         # preserve the best-tracking era tag: best came
                         # from 1-val_dice iff a validation ran (finite)
                         "monitor_is_val_dice": int(np.isfinite(val_dice)
                                                    and np.isfinite(best)),
                         "stat": {}},
                        False, args.ckpt_dir, name=PREEMPT_NAME)
                    tag_preempt_epoch(args.ckpt_dir, epoch - 1)
                    print(f"[preempt] saved {PREEMPT_NAME} mid-epoch "
                          f"{epoch} after {len(terms)} steps; exiting",
                          flush=True)
                    return
            if micro:
                print(f"[accum] dropping {len(micro)} leftover microbatch(es) "
                      f"at epoch end (epoch yielded a non-multiple of --accum)")
                micro = []
            if not terms:
                raise ValueError(
                    f"no optimizer step ran in epoch {epoch}: fewer batches "
                    f"than --accum {args.accum}")
            stat_train = {k: float(np.mean([t[k] for t in terms]))
                          for k in terms[0]}
            mean_loss = stat_train["loss"]

            val_dice = validate(state.params)
            # monitor = 1 - dice so lower-is-better matches the reference's
            # best-checkpoint convention (and the resume path's min());
            # a val fold without positives (nan) falls back to train loss
            monitor_is_val = int(np.isfinite(val_dice))
            monitor = 1.0 - val_dice if monitor_is_val else mean_loss
            print(f"epoch {epoch}: loss {mean_loss:.4f} "
                  f"val dice {val_dice:.4f} "
                  f"({time.time() - t0:.1f}s, {len(terms)} steps)")
            # one row per epoch with a single schema: stat.csv's reference
            # format (training/stats.py) writes the header once, from the
            # first row's keys, and appends later rows positionally — so the
            # val metric joins the train terms instead of a second row shape
            save_result_stat(dict(stat_train, val_dice=val_dice),
                             args.ckpt_dir, info=f"epoch[{epoch:2d}]")
            is_best = monitor <= best
            best = min(best, monitor)
            save_checkpoint({"epoch": epoch, "params": state.params,
                             "opt_state": state.opt_state,
                             "monitor_metric": monitor,
                             "monitor_is_val_dice": monitor_is_val,
                             "stat": stat_train}, is_best, args.ckpt_dir)
            clear_stale_preempt(args.ckpt_dir, epoch)
            if guard.requested:
                print(f"[preempt] stopped cleanly after epoch {epoch}",
                      flush=True)
                break

    if start_epoch >= args.epochs:        # eval-only invocation
        val_dice = validate(state.params)
    print(f"val mean dice: {val_dice:.4f}")


if __name__ == "__main__":
    main()
