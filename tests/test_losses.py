"""Loss parity vs the reference implementations (torch oracle)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from representation_disentanglement_tpu import losses as L  # noqa: E402

M, B, C, H, W = 3, 4, 7, 32, 48
ATOL = 1e-5


@pytest.fixture(scope="module")
def ref_losses(ref_model_module):
    """A minimally-constructed reference model exposing the loss methods."""
    ref = ref_model_module
    model = ref.MultimodalModel(
        input_size=(160, 192), modality_num=2, in_num_ch=7, out_num_ch=1,
        s_num_ch=4, z_size=16, is_cond=False, shared_ana_enc=True,
        shared_mod_enc=True, shared_inp_dec=True, device=torch.device("cpu"),
        s_compact_method="max", s_sim_method="cosine", z_sim_method="cosine",
        input_output_act="no", target_output_act="no", target_model_name="U",
        others={"mod_enc_s": False, "ana_dec_act": "softmax", "old": False,
                "softmax_remove_mask": True})
    return model


def _mask(rng):
    # include an all-absent column and a partially-absent one
    m = (rng.random((B, M)) > 0.3).astype(np.float32)
    m[:, 2] = 0.0
    m[0, 0] = 1.0       # ensure at least one present
    return m


def test_recon_x_parity(rng, ref_losses):
    gt = rng.normal(size=(M, B, C, H, W)).astype(np.float32)
    out = rng.normal(size=(M, B, C, H, W)).astype(np.float32)
    mask = _mask(rng)
    for p in (1, 2):
        want = ref_losses.compute_recon_loss_x_list(
            [torch.tensor(g) for g in gt], [torch.tensor(o) for o in out],
            torch.tensor(mask), p=p).item()
        got = float(L.recon_loss_x(
            jnp.asarray(np.moveaxis(gt, 2, -1)),
            jnp.asarray(np.moveaxis(out, 2, -1)), jnp.asarray(mask), p=p))
        np.testing.assert_allclose(got, want, atol=ATOL)


def test_recon_x_mix_parity(rng, ref_losses):
    gt = rng.normal(size=(M, B, C, H, W)).astype(np.float32)
    grid = rng.normal(size=(M, M, B, C, H, W)).astype(np.float32)
    # no empty PAIR product: an empty m_i*m_j triggers a reference bug
    # (x_list index misalignment, src/model.py:3335-3338) that we fix —
    # see losses.recon_loss_x_mix docstring.  Row 0 fully present makes
    # every pair product nonempty regardless of the rng stream position
    # (the shared session rng makes per-test draws order-dependent).
    mask = _mask(rng)
    mask[0, :] = 1.0
    x_list = [torch.tensor(grid[i, j]) for i in range(M) for j in range(M)
              if i != j]
    want = ref_losses.compute_recon_loss_x_mix_list(
        [torch.tensor(g) for g in gt], x_list, torch.tensor(mask),
        p=1).item()
    got = float(L.recon_loss_x_mix(
        jnp.asarray(np.moveaxis(gt, 2, -1)),
        jnp.asarray(np.moveaxis(grid, 3, -1)), jnp.asarray(mask), p=1))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_kl_latent_parity(rng, ref_losses):
    zm = rng.normal(size=(M, B, 16)).astype(np.float32)
    zlv = rng.normal(size=(M, B, 16)).astype(np.float32) * 0.3
    zm2 = rng.normal(size=(M, B, 16)).astype(np.float32)
    mask = _mask(rng)
    mask[:, 2] = 1.0   # kl reference NaNs on empty columns; use full col
    want_kl = ref_losses.compute_kl_loss_list_standard(
        [torch.tensor(z) for z in zm], [torch.tensor(z) for z in zlv],
        torch.tensor(mask)).item()
    got_kl = float(L.kl_loss_standard_list(jnp.asarray(zm), jnp.asarray(zlv),
                                           jnp.asarray(mask)))
    np.testing.assert_allclose(got_kl, want_kl, rtol=1e-5)

    want_lat = ref_losses.compute_latent_z_loss(
        [torch.tensor(z) for z in zm], [torch.tensor(z) for z in zm2],
        torch.tensor(mask)).item()
    got_lat = float(L.latent_z_loss(jnp.asarray(zm), jnp.asarray(zm2),
                                    jnp.asarray(mask)))
    np.testing.assert_allclose(got_lat, want_lat, atol=ATOL)


def test_similarity_losses_parity(rng, ref_losses):
    # M=2 so the reference's random pair choice is deterministic (0, 1)
    s = rng.random((2, B, 4, 32, 32)).astype(np.float32)
    z = rng.normal(size=(2, B, 16)).astype(np.float32)
    mask = (rng.random((B, 2)) > 0.2).astype(np.float32)
    want_s = ref_losses.compute_similarity_s_loss(
        [torch.tensor(si) for si in s], torch.tensor(mask))
    want_s = want_s.item() if hasattr(want_s, "item") else float(want_s)
    got_s = float(L.similarity_s_loss(
        jnp.asarray(np.moveaxis(s, 2, -1)), jnp.asarray(mask),
        jnp.asarray([0, 1]), compact_method="max"))
    np.testing.assert_allclose(got_s, want_s, atol=ATOL)

    want_z = ref_losses.compute_similarity_z_loss(
        [torch.tensor(zi) for zi in z], torch.tensor(mask)).item()
    got_z = float(L.similarity_z_loss(jnp.asarray(z), jnp.asarray(mask)))
    np.testing.assert_allclose(got_z, want_z, atol=ATOL)


def test_segmentation_loss_parity(rng, ref_losses):
    y = rng.normal(size=(B, 4, H, W)).astype(np.float32)
    gt = rng.integers(0, 4, size=(B, 1, H, W)).astype(np.float32)
    want = ref_losses.compute_segmentation_loss_y(
        torch.tensor(gt), torch.tensor(y)).item()
    got = float(L.segmentation_loss_y(
        jnp.asarray(np.moveaxis(gt, 1, -1)), jnp.asarray(np.moveaxis(y, 1, -1))))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_adversarial_loss_parity(rng, ref_losses):
    """Given the same discriminator logits, the masked BCE terms match
    (incl. quirk Q4: g_loss_1 == d_loss_1)."""
    logits = rng.normal(size=(2, B)).astype(np.float32)
    mask = (rng.random((B, 2)) > 0.3).astype(np.float32)
    m0, m1 = torch.tensor(mask[:, 0]), torch.tensor(mask[:, 1])
    d0, d1 = torch.tensor(logits[0]), torch.tensor(logits[1])
    bce = torch.nn.functional.binary_cross_entropy_with_logits
    d_loss_0 = (m0 * bce(d0, torch.zeros_like(d0), reduction="none")).sum() / m0.sum()
    g_loss_0 = (m0 * bce(d0, torch.ones_like(d0), reduction="none")).sum() / m0.sum()
    d_loss_1 = (m1 * bce(d1, torch.ones_like(d1), reduction="none")).sum() / m1.sum()
    want_d = 0.5 * (d_loss_0 + d_loss_1)
    want_g = 0.5 * (g_loss_0 + d_loss_1)
    got_d, got_g = L.adversarial_loss(jnp.asarray(logits),
                                      jnp.asarray(mask.T))
    np.testing.assert_allclose(float(got_d), want_d.item(), atol=ATOL)
    np.testing.assert_allclose(float(got_g), want_g.item(), atol=ATOL)


def test_compact_cosine_parity(rng, ref_losses):
    s = rng.random((B, 4, 32, 32)).astype(np.float32)
    want_c = ref_losses.compute_compact_s(torch.tensor(s))
    got_c = L.compact_s(jnp.asarray(np.moveaxis(s, 1, -1)), "max")
    # flatten order differs (CHW vs HWC) but cosine is permutation-invariant
    x2 = rng.random((B, 4, 32, 32)).astype(np.float32)
    want = ref_losses.compute_cosine(
        want_c, ref_losses.compute_compact_s(torch.tensor(x2))).numpy()
    got = L.cosine(got_c, L.compact_s(jnp.asarray(np.moveaxis(x2, 1, -1)),
                                      "max"))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)
