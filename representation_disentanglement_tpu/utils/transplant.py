"""Torch-checkpoint -> flax-params transplant.

Maps the reference ``MultimodalModel`` state_dict (src/model.py:2916-2969,
active CondConv path with the shipped flags: shared_ana_enc, shared_mod_enc,
shared_inp_dec=False, is_cond=True) onto this framework's parameter tree.
Used by the parity tests and by users migrating trained reference
checkpoints.

Layout conversions:
- torch Conv2d weight [O, I, kh, kw]        -> HWIO [kh, kw, I, O]
- CondConv expert bank [E, O, I, kh, kw]    -> [E, kh, kw, I, O]
- torch Linear weight [out, in]             -> [in, out]
- flatten-consuming Linears (ModalityEncoder.fcs, Discriminator.fc) get an
  input-dimension permutation from torch's CHW-major flatten to our
  HWC-major flatten;
- BatchNorm weight/bias -> scale/bias (params), running_mean/var ->
  batch_stats.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def t2j_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def t2j_condconv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (0, 3, 4, 2, 1))


def t2j_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def chw_to_hwc_perm(c: int, h: int, w: int) -> np.ndarray:
    """Index permutation p with flat_hwc[i] == flat_chw[p[i]]."""
    idx = np.arange(c * h * w).reshape(c, h, w)        # torch flatten order
    return np.transpose(idx, (1, 2, 0)).reshape(-1)     # our flatten order


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


class Transplant:
    """Collects params + batch_stats trees from a torch state_dict."""

    def __init__(self, sd: Dict[str, "np.ndarray"]):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.params: Dict = {}
        self.stats: Dict = {}

    # -- leaf setters ----------------------------------------------------
    def _set(self, tree: Dict, path: Tuple[str, ...], value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, tname: str, jpath: Tuple[str, ...], cond: bool,
             bias: bool = True):
        """A MaybeCondConv at `jpath` from torch (Cond)Conv2d at `tname`."""
        if cond:
            self._set(self.params, jpath + ("experts",),
                      t2j_condconv(self.sd[f"{tname}.weight"]))
            self._set(self.params, jpath + ("route_kernel",),
                      t2j_linear(self.sd[f"{tname}._routing_fn.fc.weight"]))
            self._set(self.params, jpath + ("route_bias",),
                      self.sd[f"{tname}._routing_fn.fc.bias"])
        else:
            self._set(self.params, jpath + ("kernel",),
                      t2j_conv(self.sd[f"{tname}.weight"]))
        if bias:
            self._set(self.params, jpath + ("bias",),
                      self.sd[f"{tname}.bias"])

    def bn(self, tname: str, jpath: Tuple[str, ...]):
        self._set(self.params, jpath + ("scale",), self.sd[f"{tname}.weight"])
        self._set(self.params, jpath + ("bias",), self.sd[f"{tname}.bias"])
        self._set(self.stats, jpath + ("mean",),
                  self.sd[f"{tname}.running_mean"])
        self._set(self.stats, jpath + ("var",),
                  self.sd[f"{tname}.running_var"])

    def linear(self, tname: str, jpath: Tuple[str, ...],
               in_perm: np.ndarray = None):
        w = t2j_linear(self.sd[f"{tname}.weight"])
        if in_perm is not None:
            w = w[in_perm]
        self._set(self.params, jpath + ("kernel",), w)
        self._set(self.params, jpath + ("bias",), self.sd[f"{tname}.bias"])

    # -- composite blocks -------------------------------------------------
    def conv_bn_act_new(self, tname, jpath, cond):
        self.conv(f"{tname}.conv", jpath + ("conv",), cond)
        self.bn(f"{tname}.bn", jpath + ("bn",))

    def deconv_block_new(self, tname, jpath, cond, is_last=False):
        self.conv(f"{tname}.conv", jpath + ("conv",), cond)
        if not is_last:          # reference creates but never applies BN
            self.bn(f"{tname}.bn", jpath + ("bn",))

    def conv_bn_act_old(self, tname, jpath):
        """Conv_BN_Act: self.conv = Sequential(Conv2d, BN)."""
        self.conv(f"{tname}.conv.0", jpath + ("conv",), cond=False)
        self.bn(f"{tname}.conv.1", jpath + ("bn",))

    def deconv_block_old(self, tname, jpath, is_last=False):
        """Act_Deconv_BN_Concat: self.up = Sequential(Upsample, Conv2d)."""
        self.conv(f"{tname}.up.1", jpath + ("conv",), cond=False)
        if not is_last:
            self.bn(f"{tname}.bn", jpath + ("bn",))

    def spade_block(self, tname, jpath, cond):
        for sub in ("si_layers", "gamma", "beta", "out"):
            self.conv(f"{tname}.{sub}", jpath + (sub,), cond)

    def spatial_attention(self, tname, jpath):
        self.conv(f"{tname}.W_x", jpath + ("W_x",), cond=False, bias=False)
        self.conv(f"{tname}.W_g", jpath + ("W_g",), cond=False)
        self.conv(f"{tname}.W_psi", jpath + ("W_psi",), cond=False)
        self.conv(f"{tname}.W_out.0", jpath + ("W_out_conv",), cond=False)
        self.bn(f"{tname}.W_out.1", jpath + ("W_out_bn",))


def _stack_subtrees(trees):
    """Stack a list of identically-shaped param trees on a new leading axis
    (for nn.vmap'd per-modality module copies)."""
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs, 0), *trees)


def transplant_multimodal(sd: Dict, modality_num: int, input_size=(160, 192),
                          is_cond: bool = True, shared_inp_dec: bool = False,
                          target_model_name: str = "U+SA",
                          mod_enc_first_ch: int = 16,
                          discrim: bool = False,
                          notshared_impl: str = "vmap"):
    """Build (params, batch_stats) for models.MultimodalModel from the
    reference state_dict with the shipped sharing flags."""
    t = Transplant(sd)
    M = modality_num

    # ---- anatomy encoder (shared enc + dec) ----
    enc = "anatomy_encoder_enc_list.0"
    t.conv(f"{enc}.down_1", ("anatomy_encoder_enc", "down_1"), is_cond)
    for i in (2, 3, 4, 5):
        t.conv_bn_act_new(f"{enc}.down_{i}",
                          ("anatomy_encoder_enc", f"down_{i}"), is_cond)
    dec = "anatomy_encoder_dec"
    for i in (4, 3, 2, 1):
        t.deconv_block_new(f"{dec}.up_{i}", ("anatomy_encoder_dec", f"up_{i}"),
                           is_cond)
    t.deconv_block_new(f"{dec}.output", ("anatomy_encoder_dec", "output"),
                       is_cond, is_last=True)

    # ---- modality encoder (shared) ----
    me = "modality_encoder_list.0"
    for i in range(1, 6):
        t.conv(f"{me}.conv{i}", ("modality_encoder", f"conv{i}"), is_cond)
    h32, w32 = input_size[0] // 32, input_size[1] // 32
    perm = chw_to_hwc_perm(8 * mod_enc_first_ch, h32, w32)
    t.linear(f"{me}.fcs.0", ("modality_encoder", "fcs"), in_perm=perm)
    t.linear(f"{me}.mean", ("modality_encoder", "mean"))
    t.linear(f"{me}.log_var", ("modality_encoder", "log_var"))

    # ---- input decoders ----
    if shared_inp_dec:
        d = "input_decoder_list.0"
        t.linear(f"{d}.zi_scaler",
                 ("input_decoder", "ZScaler_0", "zi_scaler"))
        for i in range(1, 7):
            t.spade_block(f"{d}.sp{i}", ("input_decoder", f"sp{i}"), is_cond)
        t.conv(f"{d}.out", ("input_decoder", "out"), is_cond)
    else:
        shared = f"input_decoder_list.{M}"     # last entry is the shared half
        t.linear(f"{shared}.zi_scaler",
                 ("input_decoder_shared", "ZScaler_0", "zi_scaler"))
        for i in (1, 2, 3):
            t.spade_block(f"{shared}.sp{i}",
                          ("input_decoder_shared", f"sp{i}"), is_cond)
        # per-modality halves: stacked (vmap impl) or separate (loop impl)
        subs = []
        for m in range(M):
            tm = Transplant(sd)
            for i in (4, 5, 6):
                tm.spade_block(f"input_decoder_list.{m}.sp{i}", (f"sp{i}",),
                               is_cond)
            tm.conv(f"input_decoder_list.{m}.out", ("out",), is_cond)
            subs.append(tm.params)
        if notshared_impl == "loop":
            for m, sub in enumerate(subs):
                t.params[f"input_decoder_notshared_{m}"] = sub
        else:
            t.params["input_decoder_notshared"] = _stack_subtrees(subs)

    # ---- output decoder ----
    od = "output_decoder"
    jod = ("output_decoder",)
    t.conv(f"{od}.down_1.0", jod + ("down_1",), cond=False)
    for i in (2, 3, 4, 5):
        t.conv_bn_act_old(f"{od}.down_{i}", jod + (f"down_{i}",))
    for i in (4, 3, 2, 1):
        t.deconv_block_old(f"{od}.up_{i}", jod + (f"up_{i}",))
    t.deconv_block_old(f"{od}.output", jod + ("output",), is_last=True)
    if "SA" in target_model_name:
        for i in (1, 2, 3, 4):
            if f"{od}.att_{i}.W_x.weight" in t.sd:
                t.spatial_attention(f"{od}.att_{i}", jod + (f"att_{i}",))
            if f"{od}.att_{i}_s.W_x.weight" in t.sd:
                t.spatial_attention(f"{od}.att_{i}_s", jod + (f"att_{i}_s",))
            if f"{od}.att_{i}_c.W_down.weight" in t.sd:
                t.linear(f"{od}.att_{i}_c.W_down",
                         jod + (f"att_{i}_c", "W_down"))
                t.linear(f"{od}.att_{i}_c.W_up", jod + (f"att_{i}_c", "W_up"))

    # ---- discriminator ----
    if discrim:
        dd = "discrim_s.discrim"
        conv_idx = [0, 2, 5, 8, 11]
        bn_idx = [None, 3, 6, 9, 12]
        for i, (ci, bi) in enumerate(zip(conv_idx, bn_idx)):
            t.conv(f"{dd}.{ci}", ("discrim_s", f"conv_{i}"), cond=False)
            if bi is not None:
                t.bn(f"{dd}.{bi}", ("discrim_s", f"bn_{i}"))
        h32, w32 = input_size[0] // 32, input_size[1] // 32
        perm_d = chw_to_hwc_perm(64, h32, w32)
        t.linear("discrim_s.fc.1", ("discrim_s", "fc_0"), in_perm=perm_d)
        t.linear("discrim_s.fc.3", ("discrim_s", "fc_1"))

    if "distri_z.linear.0.weight" in t.sd:
        t.linear("distri_z.linear.0", ("distri_z", "linear_0"))
        t.linear("distri_z.linear.2", ("distri_z", "linear_1"))

    return t.params, t.stats
