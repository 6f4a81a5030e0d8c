from representation_disentanglement_tpu.models.multimodal import (  # noqa: F401
    MultimodalModel)
