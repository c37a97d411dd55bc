from .torch_import import (
    import_torch_weights,
    load_torch_state_dict,
    load_torch_weights,
    resolve_torch_checkpoint,
)
from .urls import CLASSIFICATION_URLS, SEGMENTATION_URLS
from .serialize import save_model, load_model
