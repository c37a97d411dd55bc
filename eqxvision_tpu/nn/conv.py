"""2-D convolution, NHWC + HWIO — the TPU-native layout.

The reference used equinox's per-sample CHW ``Conv2d`` under
``jax.vmap`` (reference alexnet.py:42, SURVEY.md §1.1). Here convolution
is batched by construction: ``lax.conv_general_dilated`` with
``('NHWC','HWIO','NHWC')`` dimension numbers maps directly onto the MXU
with no layout transposes, and accumulation is pinned to f32 so bf16
inference keeps full precision in the systolic array.
"""
from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from ..core import init
from ..core.module import Module, static


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def _pad_pairs(padding) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    if len(padding) == 2 and all(isinstance(p, int) for p in padding):
        return ((padding[0], padding[0]), (padding[1], padding[1]))
    (a, b), (c, d) = padding
    return ((int(a), int(b)), (int(c), int(d)))


class Conv2d(Module):
    """Batched NHWC convolution with torch-compatible hyperparameters.

    weight layout: (kh, kw, in_channels // groups, out_channels)  [HWIO]
    (torch's OIHW checkpoint tensors are transposed (2,3,1,0) on import —
    see weights/torch_import.py).
    """

    weight: jax.Array
    bias: Optional[jax.Array]
    in_channels: int = static()
    out_channels: int = static()
    kernel_size: Tuple[int, int] = static()
    stride: Tuple[int, int] = static()
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = static()
    dilation: Tuple[int, int] = static()
    groups: int = static()

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: Union[int, Sequence[int]],
        stride: Union[int, Sequence[int]] = 1,
        padding=0,
        dilation: Union[int, Sequence[int]] = 1,
        groups: int = 1,
        use_bias: bool = True,
        *,
        key: jax.Array,
        dtype=jnp.float32,
    ):
        if in_channels % groups or out_channels % groups:
            raise ValueError("channels must be divisible by groups")
        self.in_channels = int(in_channels)
        self.out_channels = int(out_channels)
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pad_pairs(padding)
        self.dilation = _pair(dilation)
        self.groups = int(groups)

        kh, kw = self.kernel_size
        fan_in = (in_channels // groups) * kh * kw
        wkey, bkey = jax.random.split(key)
        self.weight = init.kaiming_uniform(
            wkey, (kh, kw, in_channels // groups, out_channels), fan_in, dtype=dtype
        )
        self.bias = init.uniform_fan_in(bkey, (out_channels,), fan_in, dtype=dtype) if use_bias else None

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        # RGB stem convs can use the exact space-to-depth rewrite
        # (ops/space_to_depth.py) — measured NEUTRAL on v5e (XLA already
        # runs the 3-channel stem at 62 TFLOP/s: 0.48 ms direct vs
        # 0.50 ms s2d for ResNet-50 b128), so it is opt-in.
        if (
            os.environ.get("EQXVISION_TPU_S2D_STEM") == "1"
            and self.groups == 1
            and self.dilation == (1, 1)
        ):
            from ..ops import space_to_depth as _s2d  # lazy: avoids nn<->ops cycle

            if _s2d.applicable(self.in_channels, self.stride, self.kernel_size, self.padding):
                return _s2d.conv2d_stride2_s2d(x, self.weight, self.bias, self.padding)
        # (N, H, W, C) -> (N, H', W', O); f32 accumulation on the MXU.
        # (accum_dtype() is None under mixed-precision training scopes —
        # the f32 OUTPUT preference breaks conv's transpose rule there;
        # see core/precision.py.)
        from ..core.precision import accum_dtype

        acc = accum_dtype()
        y = lax.conv_general_dilated(
            x,
            self.weight.astype(x.dtype),
            window_strides=self.stride,
            padding=self.padding,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=acc,
        )
        if self.bias is not None:
            y = y + self.bias.astype(acc if acc is not None else y.dtype)
        return y.astype(x.dtype)
