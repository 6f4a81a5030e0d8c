"""representation_disentanglement_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework.

A from-scratch rebuild of the capabilities of
ouyangjiahong/representation-disentanglement ("Representation Disentanglement
for Multi-modal Brain MR Analysis", IPMI 2021): disentangled anatomy/modality
codes for co-registered multi-contrast brain MR, cross-modal synthesis,
missing-modality imputation, and fused target decoding (segmentation / PET
synthesis) — redesigned TPU-first:

- NHWC layouts, bf16-capable convs on the MXU,
- CondConv as kernel-space mixing (one einsum + one conv; no per-sample loop),
- all modalities batched through a single vmapped conv,
- a single jitted train step with `lax.scan` gradient accumulation,
- `jax.sharding.Mesh` data parallelism from day one.

Reference semantics are kept contract-compatible (config.yaml keys, HDF5
dataset layout, fold txt format, stat.csv / results_all.h5 artifacts, metric
definitions) so outputs are directly comparable.
"""

__version__ = "0.1.0"

from representation_disentanglement_tpu.config import Config, load_config  # noqa: F401
