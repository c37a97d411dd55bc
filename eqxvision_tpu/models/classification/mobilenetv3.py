"""MobileNetV3 Large/Small, NHWC batched.

Capability parity with reference eqxvision/models/classification/
mobilenetv3.py:18-389 and torchvision.models.mobilenetv3: SE blocks with
hard-sigmoid gates, hard-swish activations, BN eps=1e-3 momentum=0.01,
and the ``reduced_tail`` / ``dilated`` variants used by LR-ASPP
segmentation backbones.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, List, Optional

import jax

from ...core.module import Module, static
from ...core.state import State, init_state
from ... import nn
from ...layers import ConvNormActivation, SqueezeExcitation
from ...utils import _make_divisible
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights

_SELayer = functools.partial(SqueezeExcitation, scale_activation=nn.hard_sigmoid)


@dataclass
class _InvertedResidualConfig:
    """reference mobilenetv3.py:18-43"""

    input_channels: int
    kernel: int
    expanded_channels: int
    out_channels: int
    use_se: bool
    activation: str  # "RE" | "HS"
    stride: int
    dilation: int

    def __init__(self, input_channels, kernel, expanded_channels, out_channels, use_se, activation, stride, dilation, width_mult):
        self.input_channels = self.adjust_channels(input_channels, width_mult)
        self.kernel = kernel
        self.expanded_channels = self.adjust_channels(expanded_channels, width_mult)
        self.out_channels = self.adjust_channels(out_channels, width_mult)
        self.use_se = use_se
        self.use_hs = activation == "HS"
        self.stride = stride
        self.dilation = dilation

    @staticmethod
    def adjust_channels(channels: int, width_mult: float) -> int:
        return _make_divisible(channels * width_mult, 8)


class _InvertedResidual(Module):
    __stateful__ = True

    block: nn.Sequential
    use_res_connect: bool = static()
    out_channels: int = static()

    def __init__(self, cnf: _InvertedResidualConfig, norm_layer: Callable, se_layer: Callable = _SELayer, *, key):
        if cnf.stride not in (1, 2):
            raise ValueError("illegal stride value")
        self.use_res_connect = cnf.stride == 1 and cnf.input_channels == cnf.out_channels
        self.out_channels = cnf.out_channels
        act = nn.hard_swish if cnf.use_hs else nn.relu
        keys = jax.random.split(key, 4)
        layers = []
        if cnf.expanded_channels != cnf.input_channels:
            layers.append(
                ConvNormActivation(cnf.input_channels, cnf.expanded_channels, kernel_size=1, norm_layer=norm_layer, activation_layer=act, key=keys[0])
            )
        stride = 1 if cnf.dilation > 1 else cnf.stride
        layers.append(
            ConvNormActivation(
                cnf.expanded_channels, cnf.expanded_channels, kernel_size=cnf.kernel,
                stride=stride, dilation=cnf.dilation, groups=cnf.expanded_channels,
                norm_layer=norm_layer, activation_layer=act, key=keys[1],
            )
        )
        if cnf.use_se:
            squeeze_channels = _make_divisible(cnf.expanded_channels // 4, 8)
            layers.append(se_layer(cnf.expanded_channels, squeeze_channels, key=keys[2]))
        layers.append(
            ConvNormActivation(cnf.expanded_channels, cnf.out_channels, kernel_size=1, norm_layer=norm_layer, activation_layer=None, key=keys[3])
        )
        self.block = nn.Sequential(layers)

    def __call__(self, x, state, *, key=None):
        out, state = self.block(x, state)
        if self.use_res_connect:
            out = out + x
        return out, state


class MobileNetV3(Module):
    __stateful__ = True

    features: nn.Sequential
    classifier: nn.Sequential

    def __init__(
        self,
        inverted_residual_setting: List[_InvertedResidualConfig],
        last_channel: int,
        num_classes: int = 1000,
        norm_layer: Optional[Callable] = None,
        dropout: float = 0.2,
        *,
        key: Optional[jax.Array] = None,
    ):
        key = default_key(key)
        if norm_layer is None:
            norm_layer = functools.partial(nn.BatchNorm, eps=1e-3, momentum=0.01)
        keys = jax.random.split(key, len(inverted_residual_setting) + 4)
        firstconv_output = inverted_residual_setting[0].input_channels
        layers = [
            ConvNormActivation(3, firstconv_output, kernel_size=3, stride=2, norm_layer=norm_layer, activation_layer=nn.hard_swish, key=keys[0])
        ]
        for i, cnf in enumerate(inverted_residual_setting):
            layers.append(_InvertedResidual(cnf, norm_layer, key=keys[i + 1]))
        lastconv_input = inverted_residual_setting[-1].out_channels
        lastconv_output = 6 * lastconv_input
        layers.append(
            ConvNormActivation(lastconv_input, lastconv_output, kernel_size=1, norm_layer=norm_layer, activation_layer=nn.hard_swish, key=keys[-3])
        )
        self.features = nn.Sequential(layers)
        self.classifier = nn.Sequential(
            [
                nn.Linear(lastconv_output, last_channel, key=keys[-2]),
                nn.Lambda(nn.hard_swish),
                nn.Dropout(dropout),
                nn.Linear(last_channel, num_classes, key=keys[-1]),
            ]
        )

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        import jax.numpy as jnp

        x, single = ensure_nhwc(x)
        x, state = self.features(x, state, key=key)
        x = jnp.mean(x, axis=(1, 2))
        x, state = self.classifier(x, state, key=key)
        return debatch(x, single), state


def _mobilenet_v3_conf(arch: str, width_mult: float = 1.0, reduced_tail: bool = False, dilated: bool = False):
    """Arch tables (reference mobilenetv3.py:250-340)."""
    reduce_divider = 2 if reduced_tail else 1
    dilation = 2 if dilated else 1
    bneck_conf = functools.partial(_InvertedResidualConfig, width_mult=width_mult)
    adjust_channels = functools.partial(_InvertedResidualConfig.adjust_channels, width_mult=width_mult)

    if arch == "mobilenet_v3_large":
        setting = [
            bneck_conf(16, 3, 16, 16, False, "RE", 1, 1),
            bneck_conf(16, 3, 64, 24, False, "RE", 2, 1),
            bneck_conf(24, 3, 72, 24, False, "RE", 1, 1),
            bneck_conf(24, 5, 72, 40, True, "RE", 2, 1),
            bneck_conf(40, 5, 120, 40, True, "RE", 1, 1),
            bneck_conf(40, 5, 120, 40, True, "RE", 1, 1),
            bneck_conf(40, 3, 240, 80, False, "HS", 2, 1),
            bneck_conf(80, 3, 200, 80, False, "HS", 1, 1),
            bneck_conf(80, 3, 184, 80, False, "HS", 1, 1),
            bneck_conf(80, 3, 184, 80, False, "HS", 1, 1),
            bneck_conf(80, 3, 480, 112, True, "HS", 1, 1),
            bneck_conf(112, 3, 672, 112, True, "HS", 1, 1),
            bneck_conf(112, 5, 672, 160 // reduce_divider, True, "HS", 2, dilation),
            bneck_conf(160 // reduce_divider, 5, 960 // reduce_divider, 160 // reduce_divider, True, "HS", 1, dilation),
            bneck_conf(160 // reduce_divider, 5, 960 // reduce_divider, 160 // reduce_divider, True, "HS", 1, dilation),
        ]
        last_channel = adjust_channels(1280 // reduce_divider)
    elif arch == "mobilenet_v3_small":
        setting = [
            bneck_conf(16, 3, 16, 16, True, "RE", 2, 1),
            bneck_conf(16, 3, 72, 24, False, "RE", 2, 1),
            bneck_conf(24, 3, 88, 24, False, "RE", 1, 1),
            bneck_conf(24, 5, 96, 40, True, "HS", 2, 1),
            bneck_conf(40, 5, 240, 40, True, "HS", 1, 1),
            bneck_conf(40, 5, 240, 40, True, "HS", 1, 1),
            bneck_conf(40, 5, 120, 48, True, "HS", 1, 1),
            bneck_conf(48, 5, 144, 48, True, "HS", 1, 1),
            bneck_conf(48, 5, 288, 96 // reduce_divider, True, "HS", 2, dilation),
            bneck_conf(96 // reduce_divider, 5, 576 // reduce_divider, 96 // reduce_divider, True, "HS", 1, dilation),
            bneck_conf(96 // reduce_divider, 5, 576 // reduce_divider, 96 // reduce_divider, True, "HS", 1, dilation),
        ]
        last_channel = adjust_channels(1024 // reduce_divider)
    else:
        raise ValueError(f"Unsupported model type {arch}")
    return setting, last_channel


def mobilenet_v3_large(torch_weights: Optional[str] = None, **kwargs: Any):
    setting, last_channel = _mobilenet_v3_conf(
        "mobilenet_v3_large",
        width_mult=kwargs.pop("width_mult", 1.0),
        reduced_tail=kwargs.pop("reduced_tail", False),
        dilated=kwargs.pop("dilated", False),
    )
    model = MobileNetV3(setting, last_channel, **kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)


def mobilenet_v3_small(torch_weights: Optional[str] = None, **kwargs: Any):
    setting, last_channel = _mobilenet_v3_conf(
        "mobilenet_v3_small",
        width_mult=kwargs.pop("width_mult", 1.0),
        reduced_tail=kwargs.pop("reduced_tail", False),
        dilated=kwargs.pop("dilated", False),
    )
    model = MobileNetV3(setting, last_channel, **kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)
