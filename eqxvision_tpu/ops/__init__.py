from .attention import attention, attention_reference
from .preprocessing import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop,
    imagenet_eval_pipeline,
    normalize,
    resize_shorter_side,
)
from .window_attention import (
    shifted_window_attention,
    window_partition,
    window_unpartition,
)
