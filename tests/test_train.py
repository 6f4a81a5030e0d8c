"""Training-step behavior: loss decreases, grads flow, optimizer parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.config import Config
from representation_disentanglement_tpu.main_missing import build_model
from representation_disentanglement_tpu.training.optim import (
    ReduceLROnPlateau, adam_amsgrad_torch, clip_global_norm)
from representation_disentanglement_tpu.training.train import (
    create_train_state, draw_pairs, make_train_step)


def tiny_cfg(**kw):
    base = dict(dataset_name="BraTS", contrast_list=["T1", "T2"],
                input_height=32, input_width=64, batch_size=2,
                effective_batch=4, shared_inp_dec=False, is_cond=True,
                others={"mod_enc_s": False, "ana_dec_act": "softmax",
                        "old": False, "softmax_remove_mask": True})
    base.update(kw)
    return Config(**base).derive().validate()


def synth_batch(cfg, rng, n_micro=1):
    M, B = cfg.modality_num, cfg.batch_size
    H, W = cfg.input_size
    mk = lambda: {
        "inputs": jnp.asarray(rng.normal(
            size=(M, B, H, W, cfg.block_ch)).astype(np.float32)),
        "targets": jnp.asarray(rng.integers(
            0, 4, size=(B, H, W, 1)).astype(np.float32)),
        "mask": jnp.ones((B, M), jnp.float32),
        "mask_img": jnp.zeros((B, H, W), jnp.float32),
    }
    if n_micro == 1:
        return mk()
    bs = [mk() for _ in range(n_micro)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *bs)


@pytest.mark.slow
def test_train_step_decreases_loss(rng):
    cfg = tiny_cfg()
    model = build_model(cfg)
    b0 = synth_batch(cfg, rng)
    state, txs = create_train_state(model, cfg, jax.random.PRNGKey(0), b0)
    step, n_micro = make_train_step(model, cfg, txs, donate=False)
    stacked = synth_batch(cfg, rng, n_micro)
    pr = np.random.default_rng(0)
    losses = []
    for i in range(8):
        rngs = jax.random.split(jax.random.PRNGKey(i), n_micro)
        sim = jnp.asarray(draw_pairs(pr, cfg.modality_num, n_micro))
        adv = jnp.asarray(draw_pairs(pr, cfg.modality_num, n_micro))
        state, m = step(state, stacked, rngs, sim, adv, jnp.float32(2e-4),
                        first_of_epoch=(i == 0))
        from representation_disentanglement_tpu.training.train import \
            metrics_to_dict
        losses.append(metrics_to_dict(m)["all"] / n_micro)
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses


def test_adam_amsgrad_matches_torch(rng):
    torch = pytest.importorskip("torch")
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(6)]

    pt = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.Adam([pt], lr=2e-4, weight_decay=1e-5, amsgrad=True)
    for g in grads:
        opt.zero_grad()
        pt.grad = torch.tensor(g)
        opt.step()

    tx = adam_amsgrad_torch(weight_decay=1e-5)
    params = {"w": jnp.asarray(p0)}
    st = tx.init(params)
    for g in grads:
        up, st = tx.update({"w": jnp.asarray(g)}, st, params,
                           learning_rate=2e-4)
        params = jax.tree.map(jnp.add, params, up)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               pt.detach().numpy(), atol=1e-6)


def test_clip_global_norm_matches_torch(rng):
    torch = pytest.importorskip("torch")
    gs = {"a": rng.normal(size=(4, 4)).astype(np.float32) * 3,
          "b": rng.normal(size=(7,)).astype(np.float32) * 3}
    ps = [torch.nn.Parameter(torch.zeros(4, 4)),
          torch.nn.Parameter(torch.zeros(7))]
    ps[0].grad = torch.tensor(gs["a"])
    ps[1].grad = torch.tensor(gs["b"])
    torch.nn.utils.clip_grad_norm_(ps, 1.0)
    clipped, _ = clip_global_norm({k: jnp.asarray(v) for k, v in gs.items()},
                                  1.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), ps[0].grad.numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["b"]), ps[1].grad.numpy(),
                               atol=1e-6)


def test_plateau_scheduler_matches_torch():
    torch = pytest.importorskip("torch")
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=2e-4)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.1, patience=5, min_lr=1e-5)
    mine = ReduceLROnPlateau(2e-4)
    metrics = [1.0, 0.9, 0.9, 0.91, 0.92, 0.93, 0.94, 0.95, 0.96, 0.97,
               0.5, 0.51, 0.52, 0.53, 0.54, 0.55, 0.56, 0.57, 0.58]
    for m in metrics:
        sch.step(m)
        lr_mine = mine.step(m)
        assert abs(opt.param_groups[0]["lr"] - lr_mine) < 1e-12, m


def test_draw_pairs_deterministic_for_two():
    pr = np.random.default_rng(0)
    p = draw_pairs(pr, 2, 4)
    assert (p == np.array([0, 1])).all()
    p4 = draw_pairs(pr, 4, 8)
    assert p4.shape == (8, 2)
    assert (p4[:, 0] != p4[:, 1]).all()


@pytest.mark.slow
@pytest.mark.parametrize("impl,pallas", [("loop", False), ("vmap", False),
                                         ("loop", True)])
def test_synthesize_matches_grid_row(rng, impl, pallas, monkeypatch):
    """The serving path (M decodes from one anatomy source) must equal the
    corresponding ROW of the full M x M evaluation grid, and its fused y
    must equal the grid path's fused y.  The pallas=True case runs the
    fused SPADE kernels in interpret mode — the serving config's kernel
    dispatch (shared half called with G=M, not G=M*M) gets CPU coverage."""
    if pallas:
        from representation_disentanglement_tpu.ops import pallas_kernels
        monkeypatch.setattr(pallas_kernels, "_FORCE_INTERPRET", True)
    cfg = tiny_cfg(notshared_impl=impl, use_pallas=pallas)
    model = build_model(cfg)
    b = synth_batch(cfg, rng)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), b)
    v = {"params": state.params, "batch_stats": state.batch_stats}

    out = jax.jit(lambda v, b: model.apply(
        v, b["inputs"], b["mask"], b["mask_img"], None, train=False,
        compute_y=True, latent_cycle=False))(v, b)
    x_hat, y_fused = jax.jit(lambda v, b: model.apply(
        v, b["inputs"], b["mask"], b["mask_img"],
        method=model.synthesize, source=1))(v, b)

    np.testing.assert_allclose(np.asarray(x_hat),
                               np.asarray(out["x_fake_grid"][1]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_fused),
                               np.asarray(out["y_fake_fused"]), atol=1e-5)
