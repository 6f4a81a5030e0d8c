"""3D stack: NVNet3D parity vs the torch reference + depth-sharded halo
inference equivalence on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.unet3d import (
    NVNet3D, nvnet_loss)

D, H, W = 16, 32, 32          # tiny but 16-divisible volume


def _params_from_torch(tm):
    """Transplant the reference NVNet3D state_dict onto our param tree."""
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # torch kernels are (O, I, kH, kW, kD) for its [B, C, H, W, D] data;
    # our data is [B, D, H, W, C] so spatial kernel order becomes (kD,kH,kW)
    c3 = lambda w: np.transpose(w, (4, 2, 3, 1, 0))
    lin = lambda w: np.transpose(w)

    def conv(t):
        return {"kernel": c3(sd[f"{t}.weight"]), "bias": sd[f"{t}.bias"]}

    def gn(t):
        return {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}

    def block(t):
        return {"gn1": gn(f"{t}.gn1"), "conv1": conv(f"{t}.conv1"),
                "gn2": gn(f"{t}.gn2"), "conv2": conv(f"{t}.conv2")}

    unet = {}
    for name in ("conv1a", "ds1", "ds2", "ds3", "up4conva", "up3conva",
                 "up2conva", "up1conv"):
        unet[name] = conv(f"unet.{name}")
    for name in ("conv1b", "conv2a", "conv2b", "conv3a", "conv3b", "conv4a",
                 "conv4b", "conv4c", "conv4d", "up4convb", "up3convb",
                 "up2convb"):
        unet[name] = block(f"unet.{name}")

    f = 16
    vae = {
        "hidden_gn": gn("vae_branch.hidden_conv.0"),
        "hidden_conv": conv("vae_branch.hidden_conv.2"),
        "mu_fc": {"kernel": lin(sd["vae_branch.mu_fc.weight"]),
                  "bias": sd["vae_branch.mu_fc.bias"]},
        "logvar_fc": {"kernel": lin(sd["vae_branch.logvar_fc.weight"]),
                      "bias": sd["vae_branch.logvar_fc.bias"]},
        # torch unflattens its linear output (C, H/16, W/16, D/16); ours is
        # (C, D/16, H/16, W/16): permute the output features accordingly
        "reconstruction": (lambda w, b: {
            "kernel": w[:, np.arange(w.shape[1]).reshape(
                8 * 16, H // 16, W // 16, D // 16).transpose(
                0, 3, 1, 2).ravel()],
            "bias": b[np.arange(b.shape[0]).reshape(
                8 * 16, H // 16, W // 16, D // 16).transpose(
                0, 3, 1, 2).ravel()]})(
            lin(sd["vae_branch.reconstraction.0.weight"]),
            sd["vae_branch.reconstraction.0.bias"]),
        "vconv4_conv": conv("vae_branch.vconv4.0"),
        "vconv3_conv": conv("vae_branch.vconv3.0"),
        "vconv3_block": block("vae_branch.vconv3.2"),
        "vconv2_conv": conv("vae_branch.vconv2.0"),
        "vconv2_block": block("vae_branch.vconv2.2"),
        "vconv1_conv": conv("vae_branch.vconv1.0"),
        "vconv1_block": block("vae_branch.vconv1.2"),
        "vconv0": conv("vae_branch.vconv0"),
    }
    del f
    return {"unet": unet, "vae_branch": vae}


@pytest.mark.slow
def test_nvnet3d_parity(rng, ref_model_module):
    torch = pytest.importorskip("torch")
    ref = ref_model_module
    # torch input_shape is (H, W, D)-agnostic: it only uses prod // 16^3
    tm = ref.NVNet3D(input_shape=(H, W, D), in_channels=2, out_channels=3,
                     init_channels=16, p=0.0).eval()
    # the reference VAE samples even in eval (src/model.py:1920-1924);
    # our eval path uses z = mu, so pin the oracle to the same
    tm.vae_branch.reparameterize = lambda mu, logvar: mu
    x = rng.normal(size=(2, 2, H, W, D)).astype(np.float32)   # torch NCHWD
    with torch.no_grad():
        uout_t, vout_t, mu_t, lv_t = tm(torch.tensor(x))

    model = NVNet3D(input_shape=(D, H, W), in_channels=2, out_channels=3,
                    init_channels=16, dropout_p=0.0)
    params = _params_from_torch(tm)
    # our layout [B, D, H, W, C]; torch here is [B, C, H, W, D]
    xj = jnp.asarray(np.transpose(x, (0, 4, 2, 3, 1)))
    uout, vout, mu, lv = model.apply({"params": params}, xj, train=False)

    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(lv), lv_t.numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(uout), (0, 4, 2, 3, 1)), uout_t.numpy(),
        atol=5e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(vout), (0, 4, 2, 3, 1)), vout_t.numpy(),
        atol=5e-4)


@pytest.mark.slow
def test_depth_sharded_inference_matches(rng):
    from representation_disentanglement_tpu.parallel.halo import (
        make_depth_mesh, sharded_nvnet_infer)

    D = 32            # D/16 = 2 shards; per-shard depth 16 (div by 8)
    model = NVNet3D(input_shape=(D, H, W), in_channels=2, out_channels=3,
                    init_channels=16, dropout_p=0.0)
    x = jnp.asarray(rng.normal(size=(1, D, H, W, 2)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    uout, vout, mu, lv = model.apply(variables, x, train=False)

    # D=16 over 2 shards: per-shard depth 8 (divisible by 8), D/16=1 -> 1
    mesh = make_depth_mesh(1)
    run1 = sharded_nvnet_infer(model, variables, mesh)
    u1, v1, m1, l1 = run1(x)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(uout), atol=1e-4)

    mesh2 = make_depth_mesh(2)
    run2 = sharded_nvnet_infer(model, variables, mesh2)
    u2, v2, m2, l2 = run2(x)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mu), atol=1e-4)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(uout), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(vout), atol=1e-4)


@pytest.mark.slow
def test_depth_sharded_8way_matches(rng):
    """Full 8-way depth sharding (VERDICT r1 item 7).  Constraints
    (parallel/halo.py): D and D//16 divisible by 8 -> D=128; per-shard
    depth 16."""
    from representation_disentanglement_tpu.parallel.halo import (
        make_depth_mesh, sharded_nvnet_infer)

    Dd, Hh, Ww = 128, 16, 16
    model = NVNet3D(input_shape=(Dd, Hh, Ww), in_channels=2, out_channels=3,
                    init_channels=8, dropout_p=0.0)
    x = jnp.asarray(rng.normal(size=(1, Dd, Hh, Ww, 2)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    uout, vout, mu, lv = model.apply(variables, x, train=False)

    mesh = make_depth_mesh(8)
    run8 = sharded_nvnet_infer(model, variables, mesh)
    u8, v8, m8, l8 = run8(x)
    np.testing.assert_allclose(np.asarray(m8), np.asarray(mu), atol=1e-4)
    np.testing.assert_allclose(np.asarray(u8), np.asarray(uout), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v8), np.asarray(vout), atol=1e-4)


def test_nvnet_loss_finite(rng):
    uout = jnp.asarray(rng.normal(size=(1, D, H, W, 3)).astype(np.float32))
    vout = jnp.asarray(rng.normal(size=(1, D, H, W, 2)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, D, H, W, 2)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 4, size=(1, D, H, W, 1)).astype(
        np.float32))
    mu = jnp.zeros((1, 32))
    lv = jnp.zeros((1, 32))
    loss, aux = nvnet_loss(uout, vout, mu, lv, seg, x)
    assert np.isfinite(float(loss))
    assert float(aux["kl"]) == 0.0


@pytest.mark.slow
def test_depth_sharded_train_step_matches(rng):
    """One OPTIMIZER STEP under 8-way depth sharding == the unsharded step
    (VERDICT r2 item 4: depth-sharded 3D *training*, not just inference).
    Exercises the halo-exchange transpose (grad of ppermute is ppermute),
    the psum'd dice/recon reductions, and the grad psum assembly."""
    from representation_disentanglement_tpu.parallel.halo import (
        make_depth_mesh)
    from representation_disentanglement_tpu.training.train3d import (
        Train3DState, create_state_3d, make_sharded_train_step_3d,
        make_train_step_3d)

    Dd, Hh, Ww = 128, 16, 16
    model = NVNet3D(input_shape=(Dd, Hh, Ww), in_channels=2, out_channels=3,
                    init_channels=8, dropout_p=0.0)
    x = jnp.asarray(rng.normal(size=(1, Dd, Hh, Ww, 2)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 4, size=(1, Dd, Hh, Ww, 1)).astype(
        np.float32))
    batch = {"inputs": x, "targets": seg}
    state, tx = create_state_3d(model, jax.random.PRNGKey(0), x)

    step1 = make_train_step_3d(model, tx, donate=False)
    s1, m1 = step1(state, batch, jax.random.PRNGKey(7), jnp.float32(1e-4))

    mesh = make_depth_mesh(8)
    step8 = make_sharded_train_step_3d(model, tx, mesh, donate=False)
    s8, m8 = step8(state, batch, jax.random.PRNGKey(7), jnp.float32(1e-4))

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m8["dice_loss"]),
                               float(m1["dice_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m8["grad_norm"]),
                               float(m1["grad_norm"]), rtol=1e-3)
    # post-Adam params: first step ~lr*sign(g); f32 reduction-order noise on
    # near-zero grads can flip an element by up to 2*lr
    for a, b in zip(jax.tree.leaves(s8.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


@pytest.mark.slow
def test_composed_dp_depth_train_step_matches(rng):
    """One optimizer step on a composed 2x4 (data x depth) mesh == the
    unsharded step: DP batch sharding stacked on depth-halo SP, the full
    'scaled variant' mesh (SURVEY §2.7 + §5.7).  rng=None keeps the VAE
    at z = mu so sharded/unsharded draws are identical by construction."""
    from representation_disentanglement_tpu.parallel.halo import (
        make_volume_mesh)
    from representation_disentanglement_tpu.training.train3d import (
        create_state_3d, make_sharded_train_step_3d, make_train_step_3d)

    Dd, Hh, Ww = 64, 16, 16   # 64/4=16 per depth shard (div 8), 64//16=4
    model = NVNet3D(input_shape=(Dd, Hh, Ww), in_channels=2, out_channels=3,
                    init_channels=8, dropout_p=0.0)
    x = jnp.asarray(rng.normal(size=(2, Dd, Hh, Ww, 2)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 4, size=(2, Dd, Hh, Ww, 1)).astype(
        np.float32))
    batch = {"inputs": x, "targets": seg}
    state, tx = create_state_3d(model, jax.random.PRNGKey(0), x)

    step1 = make_train_step_3d(model, tx, donate=False)
    s1, m1 = step1(state, batch, None, jnp.float32(1e-4))

    mesh = make_volume_mesh(2, 4)
    stepc = make_sharded_train_step_3d(model, tx, mesh, donate=False,
                                       data_axis="data")
    sc, mc = stepc(state, batch, None, jnp.float32(1e-4))

    np.testing.assert_allclose(float(mc["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(mc["dice_loss"]),
                               float(m1["dice_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(mc["grad_norm"]),
                               float(m1["grad_norm"]), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(sc.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
