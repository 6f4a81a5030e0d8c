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


def volume_loader(ds, batch_size, shuffle, seed=10):
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
    return gen


def main(argv=None):
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
                    help="eval with the depth axis sharded over N devices")
    ap.add_argument("--ckpt-dir", default="../ckpt3d")
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

    model = NVNet3D(input_shape=(D, H, W), in_channels=len(args.contrasts),
                    out_channels=3, init_channels=args.init_channels)
    sample = next(volume_loader(train_ds, args.batch_size, False)())
    state, tx = create_state_3d(model, jax.random.PRNGKey(10),
                                jnp.asarray(sample["inputs"]))
    step = make_train_step_3d(model, tx)
    eval_step = make_eval_step_3d(model)

    os.makedirs(args.ckpt_dir, exist_ok=True)
    key = jax.random.PRNGKey(10)
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for batch in volume_loader(train_ds, args.batch_size, True,
                                   seed=10 + epoch)():
            key, sub = jax.random.split(key)
            jb = {"inputs": jnp.asarray(batch["inputs"]),
                  "targets": jnp.asarray(batch["targets"])}
            state, m = step(state, jb, sub, jnp.float32(args.lr))
            losses.append(float(m["loss"]))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"({time.time() - t0:.1f}s, {len(losses)} steps)")
        from representation_disentanglement_tpu.training.checkpoint import (
            save_checkpoint)
        save_checkpoint({"epoch": epoch, "params": state.params,
                         "opt_state": state.opt_state,
                         "monitor_metric": float(np.mean(losses)),
                         "stat": {}}, True, args.ckpt_dir)

    # eval (optionally depth-sharded)
    if args.depth_shards > 1:
        from representation_disentanglement_tpu.parallel.halo import (
            make_depth_mesh, sharded_nvnet_infer)
        mesh = make_depth_mesh(args.depth_shards)
        run = sharded_nvnet_infer(model, {"params": state.params}, mesh)
        infer = lambda x: run(x)[0]
    else:
        infer = lambda x: eval_step(state.params, x)[0]
    dices = []
    for batch in volume_loader(val_ds, args.batch_size, False)():
        probs = np.asarray(infer(jnp.asarray(batch["inputs"])))
        seg = batch["targets"][..., 0]
        for b in range(probs.shape[0]):
            for c in range(3):
                gt = seg[b] == c + 1
                pr = probs[b, ..., c] > 0.5
                inter = np.logical_and(gt, pr).sum()
                dices.append((2 * inter + 1) / (gt.sum() + pr.sum() + 1))
    print(f"val mean dice: {np.mean(dices):.4f}")


if __name__ == "__main__":
    main()
