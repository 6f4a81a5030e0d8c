"""Typed config system, drop-in compatible with the reference ``config.yaml``.

The reference (src/main_missing.py:25-56, src/config.yaml) drives everything
from one flat YAML file read from the CWD, with derived fields injected at
load time and a snapshot/resume-merge scheme per checkpoint directory.  This
module reproduces those contracts on a typed dataclass:

- every reference key is a field with the reference default,
- derivations mirror main_missing.py:26-28 (``is_discrim_s``, ``in_num_ch``)
  and main_missing.py:75-86 (output-activation policy),
- ``merge_saved`` mirrors the resume-merge that preserves ``phase`` /
  ``continue_train`` from the live file (main_missing.py:42-56),
- ``validate`` catches the reference's latent misconfigurations, e.g. quirk
  Q9: BraTS segmentation losses require ``out_num_ch == 4``
  (src/model.py:3287-3297 vs src/config.yaml:73).

TPU-specific fields (mesh shape, dtype policy, CondConv execution mode) are
additive and default to sensible values so a verbatim reference YAML loads
unchanged.
"""

from __future__ import annotations

import copy
import dataclasses
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml

# Keys the resume-merge must never take from the saved snapshot
# (main_missing.py:47-48).
_LIVE_KEYS = ("phase", "continue_train")


@dataclass
class Config:
    # ---- run control (config.yaml:1-5) ----
    phase: str = "train"                     # 'train' | 'test'
    load_yaml: bool = True
    epochs: int = 50
    gpu: str = "0"                           # kept for YAML compat; unused on TPU

    # ---- data (config.yaml:6-20) ----
    dataset_name: str = "BraTS"              # BraTS | ZeroDose | NCANDA | Tau
    contrast_list: List[str] = field(
        default_factory=lambda: ["T1", "T1c", "T2", "T2_FLAIR"])
    norm_type: str = "z-score"               # 'z-score' | 'mean'
    block_size: int = 3                      # 7-slice blocks (2*3+1)
    data_path: str = "../data/"
    batch_size: int = 8
    num_fold: int = 5
    fold: int = 0
    shuffle: bool = True

    # ---- optimization (config.yaml:21-23) ----
    lr: float = 2e-4
    model_name: str = "MultimodalModel"
    p: int = 1                               # recon-loss norm (1=L1, 2=L2)

    # ---- model dims (config.yaml:24-25, 72-75) ----
    s_num_ch: int = 4
    z_size: int = 16
    out_num_ch: int = 1
    input_height: int = 160
    input_width: int = 192

    # ---- loss weights (config.yaml:27-56) ----
    lambda_recon_y: float = 0.0
    lambda_recon_y_fused: float = 0.0
    lambda_recon_x: float = 1.0
    lambda_recon_x_mix: float = 2.0
    lambda_sim_s: float = 10.0
    lambda_sim_z: float = 2.0
    lambda_kl: float = 0.0
    lambda_latent_z: float = 0.1
    lambda_adv_s: float = 0.0

    # ---- similarity methods (config.yaml:35-41) ----
    s_compact_method: str = "max"            # max | mean | vgg
    s_sim_method: str = "cosine"             # cosine | perceptual
    z_sim_method: str = "cosine"             # cosine | mse

    # ---- architecture switches (config.yaml:58-70, 78-82) ----
    is_cond: bool = True
    is_distri_z: bool = False
    shared_ana_enc: bool = True
    shared_mod_enc: bool = True
    shared_inp_dec: bool = False
    others: Dict[str, Any] = field(default_factory=lambda: {
        "mod_enc_s": False, "ana_dec_act": "softmax", "old": False,
        "softmax_remove_mask": True})
    dropoff: bool = False
    skull_strip: bool = False
    fuse_method: str = "mean"                # mean | max | mean-max-min
    target_model_name: str = "U+SA"          # U | U+SA | U+SA+CA | U+SSA+CA

    # ---- resume (config.yaml:84-91) ----
    continue_train: bool = False
    fix_pretrain: bool = False
    ckpt_name: str = "model_best.ckpt"
    ckpt_timelabel: Optional[str] = None

    # ---- derived (main_missing.py:26-28, 75-86); filled by `derive()` ----
    is_discrim_s: bool = False
    in_num_ch: int = 28
    target_output_act: str = "no"
    input_output_act: str = "no"
    ckpt_path: str = ""

    # ---- TPU-native additions (not present in the reference) ----
    mesh_shape: Dict[str, int] = field(default_factory=lambda: {"data": 1})
    compute_dtype: str = "float32"           # 'float32' | 'bfloat16'
    effective_batch: int = 16                # grad accumulation target
                                             # (main_missing.py:282)
    grad_clip_norm: float = 1.0              # (main_missing.py:272)
    weight_decay: float = 1e-5               # (main_missing.py:118)
    seed: int = 10                           # (main_missing.py:18)
    fix_activation_bug: bool = False         # quirk Q1: False = parity with
                                             # the reference's overwritten acts
    notshared_impl: str = "loop"             # per-modality decoder halves:
                                             # 'loop' (M sequential dense
                                             # convs; +8%% train, +17%% infer
                                             # measured) or 'vmap' (stacked
                                             # params, feature-grouped conv)
    cond_mode: str = "grouped"               # CondConv execution: 'grouped'
                                             # (min FLOPs; best measured) or
                                             # 'sum_experts' (E dense convs +
                                             # routed mix; OOMs at 160x192)
    remat: bool = True                       # segmented rematerialization
    use_pallas: bool = True                  # fused Pallas SPADE interior
                                             # (TPU only; auto-falls back on
                                             # CPU / oversize slabs / vmap)
    vgg_npz: Optional[str] = None            # VGG16 weights npz for the
                                             # perceptual / vgg-compact paths
                                             # (models.vgg.dump_torchvision_
                                             # vgg16 produces it)
    prefetch_depth: int = 2
    device_data_cache: bool = True           # upload packed volumes to HBM
                                             # once; gather slice-blocks on
                                             # device (auto-fallback to host
                                             # loading when it doesn't fit)
    device_cache_budget_gb: float = 10.0
    shard_data_cache: bool = True            # under mesh_shape {data: N}:
                                             # shard the TRAIN volume cache
                                             # over the mesh (per-chip HBM
                                             # ~1/N, locality-aware epoch
                                             # plan); False replicates it
                                             # (exact global-shuffle
                                             # semantics, full HBM per chip)
    shard_eval_cache: bool = True            # under mesh_shape {data: N}:
                                             # shard the val/test volume
                                             # caches too (exhaustive padded
                                             # single-pass eval, VERDICT r4
                                             # item 7); False replicates
                                             # them (fold-order dump rows)
    fuse_bn: bool = False                    # fused Pallas BN-train pass
                                             # (ops/pallas_bn.py); measured
                                             # in PERF.md's ladder
    epoch_chunk_steps: int = 32              # epoch-on-device dispatch
                                             # granularity: preemption loses
                                             # at most this many optimizer
                                             # steps (0 = whole epoch in one
                                             # dispatch)
    log_every: int = 10
    eval_max_iters: int = 501                # (main_missing.py:561-562)

    # ------------------------------------------------------------------
    def derive(self) -> "Config":
        """Inject derived fields (main_missing.py:26-28, 75-86)."""
        self.is_discrim_s = self.lambda_adv_s > 0
        self.in_num_ch = len(self.contrast_list) * (2 * self.block_size + 1)
        # output-activation policy (main_missing.py:75-86)
        if self.dataset_name == "BraTS" or self.norm_type == "z-score":
            self.target_output_act = "no"
        else:
            self.target_output_act = "softplus"
        self.input_output_act = "softplus" if self.norm_type == "mean" else "no"
        return self

    # per-modality slice-block channel count (2*block_size+1)
    @property
    def block_ch(self) -> int:
        return 2 * self.block_size + 1

    @property
    def modality_num(self) -> int:
        return len(self.contrast_list)

    @property
    def input_size(self):
        return (self.input_height, self.input_width)

    def validate(self) -> "Config":
        errs = []
        if self.input_height % 32 or self.input_width % 32:
            errs.append(
                f"input size {self.input_size} must be divisible by 32 "
                "(5 stride-2 stages; ref hard-codes 5*6*128 at model.py:2396)")
        # quirk Q9 (SURVEY §7.4): BraTS seg losses need 4 output channels.
        if (self.dataset_name == "BraTS"
                and (self.lambda_recon_y > 0 or self.lambda_recon_y_fused > 0)
                and self.out_num_ch != 4):
            errs.append(
                "BraTS segmentation losses require out_num_ch=4 "
                "(ref quirk Q9: config.yaml:73 ships 1, model.py:3287-3297 "
                "indexes channels 1-3)")
        if self.fuse_method not in ("mean", "max", "mean-max-min"):
            errs.append(f"unknown fuse_method {self.fuse_method!r}")
        if self.s_sim_method not in ("cosine", "perceptual"):
            errs.append(
                f"unknown s_sim_method {self.s_sim_method!r} (the reference "
                "silently falls into its perceptual branch for any "
                "non-'cosine' value, model.py:3496-3532; rejected here)")
        if self.s_compact_method not in ("max", "mean", "vgg"):
            errs.append(
                f"unknown s_compact_method {self.s_compact_method!r} (the "
                "reference silently falls into its vgg branch, "
                "model.py:3469-3475; rejected here)")
        if self.z_sim_method not in ("cosine", "mse"):
            errs.append(f"unknown z_sim_method {self.z_sim_method!r}")
        if (self.s_sim_method == "perceptual"
                or self.s_compact_method == "vgg"):
            if not self.vgg_npz:
                errs.append(
                    "s_sim_method='perceptual' / s_compact_method='vgg' "
                    "need VGG16 weights: set vgg_npz (produce it with "
                    "models.vgg.dump_torchvision_vgg16 where torchvision "
                    "is available; ref loads pretrained VGG16 at "
                    "model.py:2945-2949)")
            elif not os.path.exists(self.vgg_npz):
                errs.append(f"vgg_npz not found: {self.vgg_npz}")
        if self.target_model_name not in ("U", "U+SA", "U+SA+CA", "U+SSA+CA"):
            errs.append(f"unknown target_model_name {self.target_model_name!r}")
        if self.batch_size > self.effective_batch:
            self.effective_batch = self.batch_size
        if self.effective_batch % self.batch_size:
            errs.append("effective_batch must be a multiple of batch_size "
                        "(ref accumulates 16//batch_size iters, "
                        "main_missing.py:282)")
        if errs:
            raise ValueError("config validation failed:\n  - " +
                             "\n  - ".join(errs))
        return self

    # ------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def snapshot_yaml(self, ckpt_path: str) -> None:
        """Save a YAML snapshot into the run dir (util.py:913-925)."""
        d = {k: v for k, v in self.to_dict().items()
             if isinstance(v, (int, float, str, list, dict, bool))
             or v is None}
        os.makedirs(ckpt_path, exist_ok=True)
        with open(os.path.join(ckpt_path, "config.yaml"), "w") as f:
            yaml.dump(d, f)

    def snapshot_txt(self, ckpt_path: str) -> None:
        """Save the key: value txt snapshot (util.py:846-851)."""
        os.makedirs(ckpt_path, exist_ok=True)
        with open(os.path.join(ckpt_path, "config.txt"), "w") as f:
            for k, v in self.to_dict().items():
                f.write(f"{k}: {v}\n")

    def merge_saved(self, saved: Dict[str, Any]) -> "Config":
        """Resume-merge: saved values win except live keys
        (main_missing.py:42-56); derivations re-run afterwards."""
        known = {f.name for f in dataclasses.fields(self)}
        for k, v in saved.items():
            if k in _LIVE_KEYS:
                continue
            if k in known:
                setattr(self, k, copy.deepcopy(v))
        return self.derive()


def _from_dict(d: Dict[str, Any]) -> Config:
    known = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in d.items() if k in known})
    extra = set(d) - known
    if extra:
        # mirror the reference's tolerance of unknown keys (it prints and
        # drops them, main_missing.py:52)
        print(f"[config] ignoring unknown keys: {sorted(extra)}")
    return cfg.derive()


def load_config(path: str = "config.yaml") -> Config:
    """Load a (reference-compatible) YAML config file."""
    with open(path) as f:
        d = yaml.safe_load(f)
    return _from_dict(d or {})


def resolve_run(cfg: Config, ckpt_root: str = "../ckpt") -> Config:
    """Compute the run directory + resume-merge (main_missing.py:30-56)."""
    if cfg.ckpt_timelabel and (cfg.phase == "test" or cfg.continue_train):
        # YAML 1.1 parses unquoted 2026_8_21_2_31 as an int (underscores
        # are digit separators) — coerce so the run-dir join doesn't crash
        time_label = str(cfg.ckpt_timelabel)
    else:
        lt = time.localtime(time.time())
        time_label = (f"{lt.tm_year}_{lt.tm_mon}_{lt.tm_mday}"
                      f"_{lt.tm_hour}_{lt.tm_min}")
    cfg.ckpt_path = os.path.join(
        ckpt_root, cfg.dataset_name, cfg.model_name, time_label)
    saved_yaml = os.path.join(cfg.ckpt_path, "config.yaml")
    if not os.path.exists(cfg.ckpt_path):
        os.makedirs(cfg.ckpt_path, exist_ok=True)
        cfg.snapshot_yaml(cfg.ckpt_path)
    elif cfg.load_yaml and os.path.exists(saved_yaml):
        with open(saved_yaml) as f:
            cfg.merge_saved(yaml.safe_load(f) or {})
    else:
        cfg.snapshot_yaml(cfg.ckpt_path)
    return cfg
