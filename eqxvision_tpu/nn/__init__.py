from .activations import (
    Identity,
    Lambda,
    gelu,
    hard_sigmoid,
    hard_swish,
    relu,
    relu6,
    sigmoid,
    silu,
    tanh,
)
from .containers import Sequential
from .conv import Conv2d
from .dropout import Dropout
from .flatten import FlattenCHW, flatten_chw
from .linear import Linear
from .norm import BatchNorm, GroupNorm, LayerNorm
from .pool import (
    AdaptiveAvgPool2d,
    AdaptiveMaxPool2d,
    AvgPool2d,
    MaxPool2d,
    adaptive_avg_pool2d,
)
