"""Legacy model collection: shape/finiteness smoke + selective torch parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.legacy import (
    GANShortGeneratorVAE, GANShortNoShortCutGenerator, GANStandardGenerator,
    LowdoseModel, MultiAttentionLayer, SymmetrySpatialAttentionLayer, UNet,
    VariationNet)


def _init_apply(mod, *args, rng=0, **kw):
    v = mod.init({"params": jax.random.PRNGKey(rng)}, *args, train=False,
                 **kw)
    return mod.apply(v, *args, train=False, **kw)


def test_unet_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    y, aux = _init_apply(UNet(out_num_ch=1, first_num_ch=8), x)
    assert y.shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(y)).all()
    with pytest.raises(ValueError, match="linear"):
        _init_apply(UNet(out_num_ch=1, first_num_ch=8,
                         output_activation="linear"), x)


def test_gan_standard_generator(rng):
    x = jnp.asarray(rng.normal(size=(1, 256, 256, 3)).astype(np.float32))
    y, _ = _init_apply(GANStandardGenerator(out_num_ch=1, first_num_ch=4), x)
    assert y.shape == (1, 256, 256, 1)


def test_gan_short_noshortcut(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    y, _ = _init_apply(GANShortNoShortCutGenerator(out_num_ch=1,
                                                   first_num_ch=8), x)
    assert y.shape == (2, 64, 96, 1)


def test_vae_generator_pair(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    vn = VariationNet(first_num_ch=8)
    vv = vn.init({"params": jax.random.PRNGKey(0)}, x, None, train=False)
    latent = vn.apply(vv, x, None, train=False)
    assert latent.shape == (2, 2, 3, 64)
    lat_s = vn.apply(vv, x, jax.random.PRNGKey(1), train=False)
    assert not np.allclose(np.asarray(latent), np.asarray(lat_s))
    y, _ = _init_apply(GANShortGeneratorVAE(out_num_ch=1, first_num_ch=8),
                       x, latent)
    assert y.shape == (2, 64, 96, 1)


def test_lowdose_residual(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    y, _ = _init_apply(LowdoseModel(), x)
    assert y.shape == (2, 64, 96, 1)
    # residual head: output within tanh-bounded correction of channel 0
    assert np.abs(np.asarray(y - x[..., :1])).max() <= 1.0 + 1e-6


def test_symmetry_attention_layers(rng):
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 16, 24, 16)).astype(np.float32))
    for residual in (False, True):
        mod = SymmetrySpatialAttentionLayer(8, residual=residual)
        out, alpha = _init_apply(mod, x, g)
        assert out.shape == x.shape and alpha.shape == (2, 32, 48, 1)
    out, alpha = _init_apply(MultiAttentionLayer(sample_factor_channel=4),
                             x, g)
    assert out.shape == x.shape


def test_symmetry_flip_axis_matches_torch(rng, ref_model_module):
    """The symmetry gate flips along torch dim 2 (H); verify our axis."""
    torch = pytest.importorskip("torch")
    ref = ref_model_module
    tm = ref.SymmetryGateResidualSpatialAttentionLayer(8, 16, 8).eval()
    from representation_disentanglement_tpu.models.attention import (
        SymmetryGateResidualSpatialAttentionLayer)
    from representation_disentanglement_tpu.utils.transplant import Transplant
    t = Transplant(tm.state_dict())
    t.conv("W_g", ("W_g",), False)
    t.conv("W_g_diff", ("W_g_diff",), False)
    t.conv("W_psi", ("W_psi",), False)
    t.conv("W_out.0", ("W_out_conv",), False)
    t.bn("W_out.1", ("W_out_bn",))
    x = rng.normal(size=(2, 8, 32, 48)).astype(np.float32)
    g = rng.normal(size=(2, 16, 16, 24)).astype(np.float32)
    with torch.no_grad():
        want, want_a = tm(torch.tensor(x), torch.tensor(g))
    mod = SymmetryGateResidualSpatialAttentionLayer(8)
    got, got_a = mod.apply({"params": t.params, "batch_stats": t.stats},
                           jnp.asarray(np.moveaxis(x, 1, -1)),
                           jnp.asarray(np.moveaxis(g, 1, -1)), train=False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1),
                               want.numpy(), atol=2e-4)
