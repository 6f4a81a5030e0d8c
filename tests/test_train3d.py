"""3D training driver: loss decreases over a few steps."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.unet3d import NVNet3D
from representation_disentanglement_tpu.training.train3d import (
    create_state_3d, make_eval_step_3d, make_train_step_3d)


@pytest.mark.slow
def test_train3d_loss_decreases(rng):
    D, H, W = 16, 32, 32
    model = NVNet3D(input_shape=(D, H, W), in_channels=2, out_channels=3,
                    init_channels=8, dropout_p=0.0)
    x = jnp.asarray(rng.normal(size=(2, D, H, W, 2)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 4, size=(2, D, H, W, 1)).astype(
        np.float32))
    batch = {"inputs": x, "targets": seg}
    state, tx = create_state_3d(model, jax.random.PRNGKey(0), x)
    step = make_train_step_3d(model, tx, donate=False)
    losses = []
    for i in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(i),
                        jnp.float32(1e-3))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    ev = make_eval_step_3d(model)
    probs, vout = ev(state.params, x)
    assert probs.shape == (2, D, H, W, 3)
    assert float(probs.min()) >= 0 and float(probs.max()) <= 1


@pytest.mark.slow
def test_train3d_grad_accumulation(rng):
    """accum=2 over two microbatches == one step on the averaged gradient
    of the same two batches (manual oracle)."""
    from representation_disentanglement_tpu.models.unet3d import nvnet_loss
    from representation_disentanglement_tpu.training.optim import (
        clip_global_norm)

    D, H, W = 16, 32, 32
    model = NVNet3D(input_shape=(D, H, W), in_channels=2, out_channels=3,
                    init_channels=8, dropout_p=0.0)
    mk = lambda: {
        "inputs": jnp.asarray(
            rng.normal(size=(1, D, H, W, 2)).astype(np.float32)),
        "targets": jnp.asarray(
            rng.integers(0, 4, size=(1, D, H, W, 1)).astype(np.float32))}
    b1, b2 = mk(), mk()
    state, tx = create_state_3d(model, jax.random.PRNGKey(0), b1["inputs"])

    # manual oracle: average of the two microbatch grads -> clip -> Adam
    def loss_fn(params, batch, r):
        uout, vout, mu, lv = model.apply({"params": params},
                                         batch["inputs"], train=True, rng=r)
        return nvnet_loss(uout, vout, mu, lv, batch["targets"],
                          batch["inputs"])[0]

    key = jax.random.PRNGKey(3)
    r1, r2 = jax.random.split(key, 2)
    g1 = jax.grad(loss_fn)(state.params, b1, r1)
    g2 = jax.grad(loss_fn)(state.params, b2, r2)
    g = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    g, _ = clip_global_norm(g, 1.0)
    updates, _ = tx.update(g, state.opt_state, state.params,
                           learning_rate=jnp.float32(1e-4))
    want = jax.tree.map(jnp.add, state.params, updates)

    step = make_train_step_3d(model, tx, donate=False, accum=2)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), b1, b2)
    s2, m = step(state, stacked, key, jnp.float32(1e-4))
    got = np.concatenate([np.ravel(np.asarray(x))
                          for x in jax.tree.leaves(s2.params)])
    exp = np.concatenate([np.ravel(np.asarray(x))
                          for x in jax.tree.leaves(want)])
    diff = np.abs(got - exp)
    # Adam's first update is sign-like (m_hat/sqrt(v_hat) ~ +-1), so an
    # f32 reduction-order difference between the fused step's grads and
    # the oracle's can flip a near-zero gradient component's update by
    # up to ~2*lr = 2e-4.  A real accumulation bug shifts a large
    # fraction of components; isolated flips bounded by 2.5*lr are noise.
    assert diff.max() <= 2.5e-4, f"max param deviation {diff.max():.2e}"
    frac = float((diff > 1e-5).mean())
    assert frac < 1e-3, f"{frac:.2e} of params deviate beyond 1e-5"


@pytest.mark.slow
def test_main3d_cli_train_resume_eval(tmp_path, capsys):
    """3D driver CLI e2e: train 1 epoch -> checkpoint artifacts -> --resume
    a second epoch (numeric epoch sort) -> eval prints a finite dice."""
    from representation_disentanglement_tpu.data.synthetic import (
        make_synthetic_dataset)
    from representation_disentanglement_tpu.main_3d import main

    pytest.importorskip("h5py")
    make_synthetic_dataset(str(tmp_path / "data"), "BraTS",
                           ("T1", "T2"), "z-score", n_subj=4,
                           shape=(32, 32, 32), slice_range=(8, 24), seed=4)
    ckpt = str(tmp_path / "ckpt3d")
    args = ["--data-path", str(tmp_path / "data"), "--contrasts", "T1", "T2",
            "--epochs", "1", "--batch-size", "1", "--init-channels", "8",
            "--image-size", "32", "32", "16", "--slab-start", "8",
            "--ckpt-dir", ckpt]
    main(args)
    import os
    files = os.listdir(ckpt)
    assert "model_best.ckpt" in files
    assert any(f.startswith("epoch") for f in files)
    # per-epoch stat.csv logging (reference save_result_stat format):
    # one train row (loss terms) + one val row (val_dice) per epoch
    assert "stat.csv" in files
    with open(os.path.join(ckpt, "stat.csv")) as f:
        csv = f.read()
    assert "dice_loss" in csv and "val_dice" in csv
    out1 = capsys.readouterr().out
    assert "val dice" in out1         # per-epoch val monitoring

    # same args with --epochs bumped 1 -> 2 (index 6 is the value)
    assert args[5] == "--epochs"
    main(args[:6] + ["2"] + args[7:] + ["--resume"])
    out = capsys.readouterr().out
    assert "[resume] from epoch 1" in out
    assert "dice" in out.lower()


@pytest.mark.slow
def test_main3d_cli_composed_mesh(tmp_path, capsys):
    """CLI e2e on the composed (data x depth) mesh: training shards batch
    AND depth, and the per-epoch validation (depth-only submesh) must
    reshard the composed-mesh params outside its jit — the exact path that
    raised 'incompatible devices' before the explicit device_put."""
    from representation_disentanglement_tpu.data.synthetic import (
        make_synthetic_dataset)
    from representation_disentanglement_tpu.main_3d import main

    pytest.importorskip("h5py")
    make_synthetic_dataset(str(tmp_path / "data"), "BraTS",
                           ("T1", "T2"), "z-score", n_subj=4,
                           shape=(32, 32, 32), slice_range=(8, 24), seed=4)
    ckpt = str(tmp_path / "ckpt3d")
    # D=32: 32 % 2 == 0 and (32//16) % 2 == 0 (halo constraints)
    main(["--data-path", str(tmp_path / "data"), "--contrasts", "T1", "T2",
          "--epochs", "1", "--batch-size", "2", "--init-channels", "8",
          "--image-size", "32", "32", "32", "--slab-start", "0",
          "--data-shards", "2", "--depth-shards", "2",
          "--ckpt-dir", ckpt])
    out = capsys.readouterr().out
    assert "[mesh] composed 2-way data x 2-way depth" in out
    assert "val dice" in out
    import os
    assert "model_best.ckpt" in os.listdir(ckpt)


@pytest.mark.slow
def test_main3d_cli_test_phase(tmp_path, capsys):
    """3D --phase test (VERDICT r3 item 5): restores model_best.ckpt,
    reports per-subject + mean dice/IoU on the test fold via the shared
    metric definitions, exports predicted label volumes, appends a stat
    row — 2D-driver symmetry."""
    import os
    from representation_disentanglement_tpu.data.synthetic import (
        make_synthetic_dataset)
    from representation_disentanglement_tpu.main_3d import main

    pytest.importorskip("h5py")
    make_synthetic_dataset(str(tmp_path / "data"), "BraTS",
                           ("T1", "T2"), "z-score", n_subj=4,
                           shape=(32, 32, 32), slice_range=(8, 24), seed=4)
    ckpt = str(tmp_path / "ckpt3d")
    base = ["--data-path", str(tmp_path / "data"), "--contrasts", "T1",
            "T2", "--epochs", "1", "--batch-size", "1", "--init-channels",
            "8", "--image-size", "32", "32", "16", "--slab-start", "8",
            "--ckpt-dir", ckpt]
    main(base)
    capsys.readouterr()

    stat = main(base + ["--phase", "test"])
    out = capsys.readouterr().out
    assert "[test] restored" in out
    assert np.isfinite(stat["dice"]) and np.isfinite(stat["iou"])
    assert stat["n_subjects"] >= 1
    res_dir = os.path.join(ckpt, "result_test")
    preds = [f for f in os.listdir(res_dir) if "_pred" in f]
    assert len(preds) == stat["n_subjects"]
    # exported label volume has the slab shape and integer class ids 0..3
    pred_path = os.path.join(res_dir, preds[0])
    if pred_path.endswith(".npy"):
        lab = np.load(pred_path)
    else:
        nib = pytest.importorskip("nibabel")
        lab = np.transpose(np.asarray(nib.load(pred_path).dataobj),
                           (2, 0, 1))
    assert lab.shape == (16, 32, 32)
    assert set(np.unique(lab)).issubset({0.0, 1.0, 2.0, 3.0})
    with open(os.path.join(ckpt, "stat.csv")) as f:
        assert "test" in f.read()
