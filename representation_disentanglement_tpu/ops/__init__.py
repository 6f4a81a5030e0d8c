from representation_disentanglement_tpu.ops.resize import (  # noqa: F401
    bilinear_resize, resize_matrix)
from representation_disentanglement_tpu.ops.norm import (  # noqa: F401
    instance_norm, batch_norm_apply, batch_stats, sequential_ema)
from representation_disentanglement_tpu.ops.conv import (  # noqa: F401
    conv2d, mix_experts, cond_route, modality_conv2d)
from representation_disentanglement_tpu.ops.pool import (  # noqa: F401
    max_pool, avg_pool)
from representation_disentanglement_tpu.ops.activations import (  # noqa: F401
    resolve_block_act, apply_act)
