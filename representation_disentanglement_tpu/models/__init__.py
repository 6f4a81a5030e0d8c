from representation_disentanglement_tpu.models.multimodal import (  # noqa: F401
    MultimodalModel)
from representation_disentanglement_tpu.models.resnet import (  # noqa: F401
    ResNet18)
