from representation_disentanglement_tpu.data.dataset import (  # noqa: F401
    SliceDataset, DataAll, TestDropoffDataset, load_idx_list)
from representation_disentanglement_tpu.data.loader import (  # noqa: F401
    BatchLoader)
