"""Conv2d -> norm -> activation block.

Equivalent capability to reference layers/conv_norm_activation.py:10-86,
minus all the ``axis_name="batch"`` plumbing: batched BatchNorm needs no
axis names (see nn/norm.py). Default padding ``(k-1)//2 * dilation``
and bias-iff-no-norm match the reference (:56-59).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax

from ..core.module import Module, static
from ..core.state import State
from ..nn.activations import Lambda, relu
from ..nn.conv import Conv2d
from ..nn.norm import BatchNorm


class ConvNormActivation(Module):
    __stateful__ = True

    conv: Conv2d
    norm: Optional[Module]
    act: Optional[Lambda]
    # exposed for channel discovery by heads (reference lraspp.py:164-167)
    out_channels: int = static(default=None)

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int = 3,
        stride: int = 1,
        padding: Optional[int] = None,
        groups: int = 1,
        norm_layer: Optional[Callable] = BatchNorm,
        activation_layer: Optional[Callable] = relu,
        dilation: int = 1,
        use_bias: Optional[bool] = None,
        *,
        key: jax.Array,
    ):
        if padding is None:
            if isinstance(kernel_size, int) and isinstance(dilation, int):
                padding = (kernel_size - 1) // 2 * dilation
            else:
                ks = kernel_size if not isinstance(kernel_size, int) else (kernel_size,) * 2
                dl = dilation if not isinstance(dilation, int) else (dilation,) * 2
                padding = tuple((k - 1) // 2 * d for k, d in zip(ks, dl))
        if use_bias is None:
            use_bias = norm_layer is None
        self.conv = Conv2d(
            in_channels,
            out_channels,
            kernel_size,
            stride=stride,
            padding=padding,
            dilation=dilation,
            groups=groups,
            use_bias=use_bias,
            key=key,
        )
        self.norm = norm_layer(out_channels) if norm_layer is not None else None
        if activation_layer is not None:
            self.act = activation_layer if isinstance(activation_layer, Module) else Lambda(activation_layer)
        else:
            self.act = None
        self.out_channels = out_channels

    def __call__(self, x: jax.Array, state: State = None, *, key=None):
        x = self.conv(x)
        if self.norm is not None:
            if getattr(type(self.norm), "__stateful__", False):
                x, state = self.norm(x, state)
            else:
                x = self.norm(x)
        if self.act is not None:
            x = self.act(x)
        return x, state
