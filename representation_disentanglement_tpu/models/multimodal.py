"""The multi-modal disentanglement model (reference ``MultimodalModel``,
src/model.py:2916-3258) as a single flax module with a method-per-stage API.

TPU-first restructuring (same math, batched execution):

- modalities live on an explicit leading axis: ``x: [M, B, H, W, Cb]``;
  every per-modality loop of the reference is one grouped op here.
- the M self-reconstructions + M*(M-1) cross-modal ("mix") reconstructions
  (src/model.py:3187-3224) are decoded as the full MxM (anatomy i,
  modality j) grid in ONE call: the shared SPADE half runs on all M^2
  combinations, the per-modality not-shared halves run under ``nn.vmap``;
  self-reconstructions are the grid diagonal.
- the M per-modality output decodes + the fused decode
  (src/model.py:3230-3258) run as one grouped [M+1] call, preserving the
  reference's BatchNorm call order.

Deliberate fix (documented deviation): the reference's
``reconstruct_output_si_fused`` boolean-indexes ``si_cat[mask==1]``
(src/model.py:3242), which flattens the (batch, modality) axes and returns a
[K, ...] batch instead of fusing per sample whenever M > 1.  We implement
the intended per-sample mask-weighted fusion (batch stays B), which is what
the paper describes and what every downstream consumer expects.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from representation_disentanglement_tpu.models.anatomy import (
    AnatomyEncoderDec, AnatomyEncoderEnc, anatomy_activation)
from representation_disentanglement_tpu.models.discriminator import (
    Discriminator, ModalityDistribution)
from representation_disentanglement_tpu.models.generators import (
    make_output_decoder)
from representation_disentanglement_tpu.models.modality import ModalityEncoder
from representation_disentanglement_tpu.models.spade import (
    SPADEFull, SPADENotShared, SPADEShared)


def fuse_anatomy(s: jnp.ndarray, mask: jnp.ndarray, fuse_method: str):
    """Per-sample mask-aware fusion of anatomy codes.

    s: [M, B, H, W, Cs]; mask: [B, M] -> fused [B, H, W, Cs or 3*Cs].
    (intended semantics of src/model.py:3239-3258; see module docstring)."""
    m = mask.T[:, :, None, None, None].astype(s.dtype)      # [M, B, 1, 1, 1]
    cnt = jnp.maximum(jnp.sum(m, axis=0), 1e-8)
    mean = jnp.sum(s * m, axis=0) / cnt
    if fuse_method == "mean":
        return mean
    neg = jnp.finfo(s.dtype).min
    smax = jnp.max(jnp.where(m > 0, s, neg), axis=0)
    if fuse_method == "max":
        return smax
    if fuse_method == "mean-max-min":
        pos = jnp.finfo(s.dtype).max
        smin = jnp.min(jnp.where(m > 0, s, pos), axis=0)
        return jnp.concatenate([mean, smax, smin], axis=-1)
    raise ValueError(f"unknown fuse_method {fuse_method!r}")


class MultimodalModel(nn.Module):
    modality_num: int = 4
    in_num_ch: int = 7               # per-modality slice-block channels
    out_num_ch: int = 1
    s_num_ch: int = 4
    z_size: int = 16
    input_size: Tuple[int, int] = (160, 192)
    first_num_ch: int = 32
    is_cond: bool = True
    is_discrim_s: bool = False
    is_distri_z: bool = False
    shared_ana_enc: bool = True
    shared_mod_enc: bool = True
    shared_inp_dec: bool = False
    fuse_method: str = "mean"
    input_output_act: str = "no"
    target_output_act: str = "no"
    target_model_name: str = "U+SA"
    mod_enc_s: bool = False          # others['mod_enc_s']
    ana_dec_act: str = "softmax"     # others['ana_dec_act']
    softmax_remove_mask: bool = True # others['softmax_remove_mask']
    s_compact_method: str = "max"    # max | mean | vgg (src/config.yaml:35)
    s_sim_method: str = "cosine"     # cosine | perceptual
    fix_act_bug: bool = False
    use_pallas: bool = False         # fused Pallas SPADE interior (TPU only;
                                     # auto-fallback on CPU / oversize slabs)
    notshared_impl: str = "vmap"     # per-modality decoder halves: 'vmap'
                                     # (stacked params, one feature-grouped
                                     # conv) or 'loop' (M sequential DENSE
                                     # convs — avoids grouped-conv layout
                                     # copies on TPU)
    remat: bool = True               # segmented rematerialization: recompute
                                     # each stage's activations in backward
                                     # instead of storing them (HBM >> FLOPs
                                     # tradeoff; essential for the M^2 decode
                                     # grid at full 160x192 resolution)

    def _maybe_remat(self, fn):
        """jax.checkpoint a (module, *arrays) stage function; static flags
        (train, ...) must be closed over, not passed as args."""
        return nn.remat(fn) if self.remat else fn

    # ------------------------------------------------------------------
    def setup(self):
        M = self.modality_num
        if self.shared_ana_enc:
            self.anatomy_encoder_enc = AnatomyEncoderEnc(
                self.first_num_ch, self.is_cond, self.fix_act_bug)
        else:
            self.anatomy_encoder_enc = nn.vmap(
                AnatomyEncoderEnc,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True}, in_axes=(0, 0), out_axes=0,
                axis_size=M)(
                self.first_num_ch, self.is_cond, self.fix_act_bug)
        # decoder half is ALWAYS shared (src/model.py:2937, 3098)
        self.anatomy_encoder_dec = AnatomyEncoderDec(
            self.first_num_ch, self.s_num_ch, self.is_cond, self.fix_act_bug)

        mod_kw = dict(first_num_ch=16, z_size=self.z_size,
                      use_s=self.mod_enc_s, is_cond=self.is_cond)
        if self.shared_mod_enc:
            self.modality_encoder = ModalityEncoder(**mod_kw)
        else:
            self.modality_encoder = nn.vmap(
                ModalityEncoder,
                variable_axes={"params": 0},
                split_rngs={"params": True}, in_axes=(0, 0, 0), out_axes=0,
                axis_size=M)(**mod_kw)

        dec_kw = dict(image_size=self.input_size, z_num_ch=128,
                      is_cond=self.is_cond, use_pallas=self.use_pallas)
        if self.shared_inp_dec:
            self.input_decoder = SPADEFull(
                in_num_ch=self.in_num_ch,
                output_activation=self.input_output_act, **dec_kw)
        else:
            self.input_decoder_shared = SPADEShared(**dec_kw)
            ns_kw = dict(in_num_ch=self.in_num_ch,
                         output_activation=self.input_output_act)
            if self.notshared_impl == "loop":
                # M separate halves, each running dense convs on the
                # [M_j * B] batch — no feature-grouped lowering.  The fused
                # Pallas interior runs here too via the packed-lane kernel
                # (ops/pallas_kernels._packed_call): C = 64/32/16 slabs are
                # viewed as [H, W*C] so the lane dim isn't padded to 128,
                # which is what used to overflow VMEM in this half.
                self.input_decoder_notshared = [
                    SPADENotShared(name=f"input_decoder_notshared_{i}",
                                   **ns_kw, **dec_kw)
                    for i in range(M)]
            else:
                # one not-shared half per modality, vmapped over the params
                # axis; types broadcast (the j-axis types are identical for
                # every i).  NOTE: the fused Pallas SPADE interior is
                # disabled inside the vmapped half — pallas_call's vmap
                # batching rule materializes the mapped axis into one kernel
                # invocation and overflows VMEM.
                self.input_decoder_notshared = nn.vmap(
                    SPADENotShared,
                    variable_axes={"params": 0},
                    split_rngs={"params": True}, in_axes=(0, 0, None),
                    out_axes=0, axis_size=M)(
                    **ns_kw, **dict(dec_kw, use_pallas=False))

        fuse_num_ch = 3 if self.fuse_method == "mean-max-min" else 1
        del fuse_num_ch  # input width is inferred from the fused tensor
        self.output_decoder = make_output_decoder(
            self.target_model_name, self.out_num_ch, self.target_output_act,
            self.fix_act_bug)

        if self.is_discrim_s:
            self.discrim_s = Discriminator(inter_num_ch=16)
        if self.is_distri_z:
            self.distri_z = ModalityDistribution(z_size=self.z_size,
                                                 inter_num_ch=128)
        if self.s_compact_method == "vgg" or self.s_sim_method == "perceptual":
            # trained s->RGB projection for the VGG perceptual path
            # (``vgg_pre``, src/model.py:2945-2946); the frozen VGG16
            # weights themselves are loss-side constants (cfg.vgg_npz), not
            # model params.  Declared via self.param so they exist in the
            # tree even though the loss consumes them outside apply().
            from representation_disentanglement_tpu.models.layers import (
                torch_conv_bias_init_factory, torch_conv_kernel_init)
            self.vgg_pre_kernel = self.param(
                "vgg_pre_kernel", torch_conv_kernel_init,
                (3, 3, self.s_num_ch, 3))
            self.vgg_pre_bias = self.param(
                "vgg_pre_bias",
                torch_conv_bias_init_factory(9 * self.s_num_ch), (3,))

    # ------------------------------------------------------------------
    def _types(self) -> jnp.ndarray:
        # inputs_type = (1+i) (src/model.py:3138)
        return jnp.arange(1, self.modality_num + 1, dtype=jnp.float32)

    def encode_anatomy(self, x, mask_img, *, train: bool):
        """x: [M, B, H, W, Cb]; mask_img: [B, H, W] -> s: [M, B, H, W, Cs]."""
        types = self._types()
        enc = self._maybe_remat(lambda m, a, t: m(a, t, train=train))
        feats = enc(self.anatomy_encoder_enc, x, types)
        dec = self._maybe_remat(lambda m, f, t: m(f, t, train=train))
        s_logits = dec(self.anatomy_encoder_dec, feats, types)
        return anatomy_activation(s_logits, mask_img, self.ana_dec_act,
                                  self.softmax_remove_mask)

    def encode_modality(self, x, s):
        """-> (z_mean, z_log_var): [M, B, z]."""
        fn = self._maybe_remat(lambda m, a, b, t: m(a, b, t))
        return fn(self.modality_encoder, x, s, self._types())

    def sample_z(self, rng, z_mean, z_log_var):
        """z = mean + eps * exp(0.5 * log_var)  (src/model.py:3159-3162)."""
        eps = jax.random.normal(rng, z_mean.shape, jnp.float32)
        return z_mean + eps * jnp.exp(0.5 * z_log_var)

    def decode_inputs_grid(self, s, z):
        """Decode every (anatomy i, modality j) combination.

        s: [M, B, H, W, Cs], z: [M, B, z] -> grid [M_i, M_j, B, H, W, Cb].
        Diagonal = self-reconstructions (src/model.py:3187-3203); off-
        diagonal = 'mix' cross-reconstructions (src/model.py:3205-3224).
        The not-shared half is indexed by the ANATOMY source i
        (src/model.py:3200-3201, 3221-3222); conditioning type is (1+j).
        """
        M = self.modality_num
        types = self._types()                                # [M] = 1..M
        # run the decoder z-stream in the compute dtype of the s-stream:
        # z is sampled in f32 (sample_z), and without this cast the entire
        # SPADE zi stream (ZScaler output + every block interior) silently
        # runs f32 even under compute_dtype=bfloat16 — 2x the HBM traffic
        # on the hottest stage.  No-op for the f32 config.
        z = z.astype(s.dtype)
        s_pair = jnp.broadcast_to(s[:, None], (M,) + s.shape)    # [i, j, ...]
        z_pair = jnp.broadcast_to(z[None, :], (M,) + z.shape)    # [i, j, ...]
        types_pair = jnp.broadcast_to(types[None, :], (M, M))    # t[i,j]=1+j

        flat = lambda a: a.reshape((M * M,) + a.shape[2:])
        dec = self._maybe_remat(lambda m, *a: m(*a))
        if self.shared_inp_dec:
            out = dec(self.input_decoder, flat(s_pair), flat(z_pair),
                      flat(types_pair))
            return out.reshape((M, M) + out.shape[1:])
        mid = dec(self.input_decoder_shared, flat(s_pair), flat(z_pair),
                  flat(types_pair))
        mid = mid.reshape((M, M) + mid.shape[1:])            # [i, j, B, ...]
        if self.notshared_impl == "loop":
            outs = [dec(d, s_pair[i], mid[i], types)
                    for i, d in enumerate(self.input_decoder_notshared)]
            return jnp.stack(outs, axis=0)                   # [i, j, B, ...]
        out = dec(self.input_decoder_notshared, s_pair, mid, types)
        return out                                            # [i, j, B, ...]

    def synthesize(self, x, mask, mask_img, *, source: int = 0,
                   z: Optional[jnp.ndarray] = None,
                   s: Optional[jnp.ndarray] = None,
                   with_y: bool = True, train: bool = False):
        """Missing-modality SERVING path: decode each target modality once.

        The evaluation forward decodes the full M x M (anatomy, modality)
        grid (M^2 SPADE decodes) because that is what the reference's eval
        scores; serving a missing-modality request only needs the M decodes
        from ONE anatomy source (the reference's own imputation decodes
        anatomy of a present modality i into the missing j,
        src/main_missing.py:402-428) plus the fused y decode.

        x: [M, B, H, W, Cb] with absent modalities zero-filled; mask [B, M];
        ``source``: the present modality whose anatomy (and per-modality
        decoder half, src/model.py:3221-3222) drives the synthesis;
        ``z``: optional [M, B, z] override (e.g. retrieved from a latent
        bank); defaults to the encoder means.  ``s``: optional precomputed
        anatomy codes [M, B, H, W, Cs] (a caller that already ran
        ``encode_anatomy`` — e.g. to build a retrieval query key — passes
        them back to avoid a second encoder pass); ``with_y=False`` skips
        the fused-y decode and returns ``y_fused=None``.

        Returns (x_hat [M_target, B, H, W, Cb], y_fused [B, H, W, out]).
        x_hat[source] is the self-reconstruction; rows for absent
        modalities are the imputations.  Matches row ``source`` of the
        full decode grid exactly (tested)."""
        M = self.modality_num
        if s is None:
            s = self.encode_anatomy(x, mask_img, train=train)
        if z is None:
            z, _ = self.encode_modality(x, s)
        z = z.astype(s.dtype)
        types = self._types()
        s_src = jnp.broadcast_to(s[source][None], (M,) + s.shape[1:])
        dec = self._maybe_remat(lambda m, *a: m(*a))
        if self.shared_inp_dec:
            x_hat = dec(self.input_decoder, s_src, z, types)
        elif self.notshared_impl == "loop":
            mid = dec(self.input_decoder_shared, s_src, z, types)
            x_hat = dec(self.input_decoder_notshared[source], s_src, mid,
                        types)
        else:
            # the vmapped not-shared half carries all M parameter copies on
            # a mapped axis and cannot be indexed; fall back to the grid row
            x_hat = self.decode_inputs_grid(s, z)[source]
        if not with_y:
            return x_hat, None
        _, y_fused = self.decode_outputs(s, mask, train=train,
                                         per_modality=False)
        return x_hat, y_fused

    def decode_outputs(self, s, mask, *, train: bool,
                       per_modality: bool = True):
        """y decodes. s: [M, B, H, W, Cs], mask: [B, M].

        Returns (y_list [M, B, H, W, out] or None, y_fused [B, H, W, out]).
        Grouped as [M+1] in the reference's call order
        (reconstruct_output_si then ..._fused, main_missing.py:184-185)."""
        M, B = s.shape[0], s.shape[1]
        ones = jnp.ones((B, 1), s.dtype)
        fused = fuse_anatomy(s, mask, self.fuse_method)
        outdec = self._maybe_remat(lambda m, a: m(a, train=train))
        if per_modality:
            groups = [fuse_anatomy(s[i:i + 1], ones, self.fuse_method)
                      for i in range(M)] + [fused]
            stacked = jnp.stack(groups, axis=0)              # [M+1, B, ...]
            y, _ = outdec(self.output_decoder, stacked)
            return y[:M], y[M]
        y, _ = outdec(self.output_decoder, fused)
        return None, y

    def discriminate(self, s_pair, *, train: bool):
        """s_pair: [2, B, H, W, Cs] -> logits [2, B]."""
        return self.discrim_s(s_pair, train=train)[..., 0]

    def z_prior(self):
        """Learned per-modality z prior (src/model.py:3362-3370).
        -> (mean, log_var): [M, z]."""
        labels = self._types()[:, None]
        return self.distri_z(labels)

    # ------------------------------------------------------------------
    def __call__(self, x, mask, mask_img, rng: Optional[jax.Array] = None,
                 *, train: bool = True, compute_y: bool = True,
                 latent_cycle: bool = True,
                 adv_pair: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
        """Full forward in the reference's stage order
        (main_missing.py:175-190, 228-231)."""
        out: Dict[str, Any] = {}
        s = self.encode_anatomy(x, mask_img, train=train)
        z_mean, z_log_var = self.encode_modality(x, s)
        if train and rng is not None:
            z = self.sample_z(rng, z_mean, z_log_var)
        else:
            z = z_mean                                       # eval: z = mean
        grid = self.decode_inputs_grid(s, z)
        out.update(s=s, z=z, z_mean=z_mean, z_log_var=z_log_var,
                   x_fake_grid=grid)
        if compute_y:
            y_list, y_fused = self.decode_outputs(s, mask, train=train)
            out.update(y_fake_list=y_list, y_fake_fused=y_fused)
        if latent_cycle:
            # re-encode the self-reconstructions (main_missing.py:228-231)
            M = self.modality_num
            xi_fake = grid[jnp.arange(M), jnp.arange(M)]     # diagonal
            s_new = self.encode_anatomy(xi_fake, mask_img, train=train)
            z_mean_new, _ = self.encode_modality(xi_fake, s_new)
            out["z_mean_new"] = z_mean_new
        if self.is_discrim_s and adv_pair is not None:
            s_sel = jnp.take(s, adv_pair, axis=0)
            out["d_logits"] = self.discriminate(s_sel, train=train)
        if self.is_distri_z:
            out["z_prior"] = self.z_prior()
        return out
