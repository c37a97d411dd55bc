from .attention import attention, attention_reference, fused_qkv_attention
from .augment import (
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    adjust_saturation,
    affine,
    augmix,
    auto_augment,
    autocontrast,
    color_jitter,
    cutmix,
    equalize,
    imagenet_train_pipeline,
    invert,
    mixup,
    posterize,
    rand_augment,
    random_erasing,
    random_hflip,
    random_resized_crop,
    random_vflip,
    rotate,
    sharpness,
    smooth_labels,
    solarize,
    trivial_augment_wide,
)
from .fold_bn import fold_batchnorm
from .fold_ln import fold_layernorm
from .layernorm import layer_norm, layer_norm_reference
from .space_to_depth import conv2d_stride2_s2d
from .preprocessing import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop,
    five_crop,
    imagenet_eval_pipeline,
    normalize,
    resize_shorter_side,
    ten_crop,
)
from .window_attention import (
    shifted_window_attention,
    window_partition,
    window_unpartition,
)
