"""Squeeze-and-Excitation block (NHWC).

Reference: layers/squeeze.py:11-61. Global average pool -> 1x1 squeeze
conv -> activation -> 1x1 excite conv -> gate activation -> channel
scale. The two 1x1 convs are stored as Conv2d so torchvision SE weights
(conv layout) import directly.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.module import Module
from ..nn.activations import Lambda, relu, sigmoid
from ..nn.conv import Conv2d


class SqueezeExcitation(Module):
    fc1: Conv2d
    fc2: Conv2d
    activation: Lambda
    scale_activation: Lambda

    def __init__(
        self,
        input_channels: int,
        squeeze_channels: int,
        activation: Callable = relu,
        scale_activation: Callable = sigmoid,
        *,
        key: jax.Array,
    ):
        k1, k2 = jax.random.split(key)
        self.fc1 = Conv2d(input_channels, squeeze_channels, 1, key=k1)
        self.fc2 = Conv2d(squeeze_channels, input_channels, 1, key=k2)
        self.activation = Lambda(activation)
        self.scale_activation = Lambda(scale_activation)

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)  # (N,1,1,C)
        s = self.activation(self.fc1(s))
        s = self.scale_activation(self.fc2(s))
        return x * s
