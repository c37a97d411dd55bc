"""MobileNetV2, NHWC batched.

Capability parity with reference eqxvision/models/classification/
mobilenetv2.py:16-244 and torchvision.models.mobilenetv2 (inverted
residuals with linear bottlenecks, width_mult channel scaling through
``_make_divisible``).
"""
from __future__ import annotations

from typing import Any, Callable, List, Optional

import jax

from ...core.module import Module, static
from ...core.state import State, init_state
from ... import nn
from ...layers import ConvNormActivation
from ...utils import _make_divisible
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights


class _InvertedResidual(Module):
    __stateful__ = True

    conv: nn.Sequential
    stride: int = static()
    use_res_connect: bool = static()
    out_channels: int = static()

    def __init__(self, inp, oup, stride, expand_ratio, norm_layer=nn.BatchNorm, *, key):
        if stride not in (1, 2):
            raise ValueError(f"stride should be 1 or 2, got {stride}")
        self.stride = stride
        hidden_dim = int(round(inp * expand_ratio))
        self.use_res_connect = stride == 1 and inp == oup
        self.out_channels = oup

        keys = jax.random.split(key, 3)
        layers = []
        if expand_ratio != 1:
            layers.append(
                ConvNormActivation(inp, hidden_dim, kernel_size=1, norm_layer=norm_layer, activation_layer=nn.relu6, key=keys[0])
            )
        layers.append(
            ConvNormActivation(
                hidden_dim, hidden_dim, stride=stride, groups=hidden_dim,
                norm_layer=norm_layer, activation_layer=nn.relu6, key=keys[1],
            )
        )
        layers.append(nn.Conv2d(hidden_dim, oup, 1, use_bias=False, key=keys[2]))
        layers.append(norm_layer(oup))
        self.conv = nn.Sequential(layers)

    def __call__(self, x, state, *, key=None):
        out, state = self.conv(x, state)
        if self.use_res_connect:
            out = out + x
        return out, state


class MobileNetV2(Module):
    __stateful__ = True

    features: nn.Sequential
    classifier: nn.Sequential

    def __init__(
        self,
        num_classes: int = 1000,
        width_mult: float = 1.0,
        inverted_residual_setting: Optional[List[List[int]]] = None,
        round_nearest: int = 8,
        dropout: float = 0.2,
        norm_layer: Callable = nn.BatchNorm,
        *,
        key: Optional[jax.Array] = None,
    ):
        key = default_key(key)
        input_channel = 32
        last_channel = 1280
        if inverted_residual_setting is None:
            inverted_residual_setting = [
                # t, c, n, s (reference mobilenetv2.py:139-149)
                [1, 16, 1, 1],
                [6, 24, 2, 2],
                [6, 32, 3, 2],
                [6, 64, 4, 2],
                [6, 96, 3, 1],
                [6, 160, 3, 2],
                [6, 320, 1, 1],
            ]
        input_channel = _make_divisible(input_channel * width_mult, round_nearest)
        self.last_channel = _make_divisible(last_channel * max(1.0, width_mult), round_nearest)
        n_blocks = sum(n for _, _, n, _ in inverted_residual_setting)
        keys = jax.random.split(key, n_blocks + 3)
        features = [
            ConvNormActivation(3, input_channel, stride=2, norm_layer=norm_layer, activation_layer=nn.relu6, key=keys[0])
        ]
        ki = 1
        for t, c, n, s in inverted_residual_setting:
            output_channel = _make_divisible(c * width_mult, round_nearest)
            for i in range(n):
                stride = s if i == 0 else 1
                features.append(
                    _InvertedResidual(input_channel, output_channel, stride, t, norm_layer, key=keys[ki])
                )
                input_channel = output_channel
                ki += 1
        features.append(
            ConvNormActivation(input_channel, self.last_channel, kernel_size=1, norm_layer=norm_layer, activation_layer=nn.relu6, key=keys[ki])
        )
        self.features = nn.Sequential(features)
        self.classifier = nn.Sequential(
            [nn.Dropout(dropout), nn.Linear(self.last_channel, num_classes, key=keys[ki + 1])]
        )

    last_channel: int = static(default=None)

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        import jax.numpy as jnp

        x, single = ensure_nhwc(x)
        x, state = self.features(x, state, key=key)
        x = jnp.mean(x, axis=(1, 2))
        x, state = self.classifier(x, state, key=key)
        return debatch(x, single), state


def mobilenet_v2(torch_weights: Optional[str] = None, **kwargs: Any):
    model = MobileNetV2(**kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)
