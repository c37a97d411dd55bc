"""EfficientNet v1 (B0-B7) and v2 (S/M/L), NHWC batched.

Capability parity with reference eqxvision/models/classification/
efficientnet.py:19-715 and torchvision.models.efficientnet: MBConv
(expand -> depthwise -> SE -> project) and FusedMBConv blocks, width/
depth scaling, per-variant BN eps/momentum overrides (reference
efficientnet.py:606-713), stochastic depth with per-block linearly
increasing drop probability. DropPath uses per-sample ("row") masking —
the semantics torchvision trained with (SURVEY.md §8.6 notes the
reference's "per_channel" was an accidental alias).
"""
from __future__ import annotations

import copy
import functools
import math
from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Sequence, Union

import jax

from ...core.module import Module, static
from ...core.state import State, init_state
from ... import nn
from ...layers import ConvNormActivation, DropPath, SqueezeExcitation
from ...utils import _make_divisible
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights


@dataclass
class _MBConvConfig:
    """reference efficientnet.py:19-92"""

    expand_ratio: float
    kernel: int
    stride: int
    input_channels: int
    out_channels: int
    num_layers: int
    block: str  # "mbconv" | "fused"

    @staticmethod
    def adjust_channels(channels: int, width_mult: float, min_value=None) -> int:
        return _make_divisible(channels * width_mult, 8, min_value)


def _mbconf(expand_ratio, kernel, stride, input_channels, out_channels, num_layers, width_mult=1.0, depth_mult=1.0):
    return _MBConvConfig(
        expand_ratio,
        kernel,
        stride,
        _MBConvConfig.adjust_channels(input_channels, width_mult),
        _MBConvConfig.adjust_channels(out_channels, width_mult),
        int(math.ceil(num_layers * depth_mult)),
        "mbconv",
    )


def _fusedconf(expand_ratio, kernel, stride, input_channels, out_channels, num_layers):
    return _MBConvConfig(expand_ratio, kernel, stride, input_channels, out_channels, num_layers, "fused")


class _MBConv(Module):
    __stateful__ = True

    block: nn.Sequential
    stochastic_depth: DropPath
    use_res_connect: bool = static()
    out_channels: int = static()

    def __init__(self, cnf: _MBConvConfig, stochastic_depth_prob: float, norm_layer: Callable, *, key):
        if not (1 <= cnf.stride <= 2):
            raise ValueError("illegal stride value")
        self.use_res_connect = cnf.stride == 1 and cnf.input_channels == cnf.out_channels
        self.out_channels = cnf.out_channels
        keys = jax.random.split(key, 4)
        layers = []
        expanded = _MBConvConfig.adjust_channels(cnf.input_channels, cnf.expand_ratio)
        if expanded != cnf.input_channels:
            layers.append(
                ConvNormActivation(cnf.input_channels, expanded, kernel_size=1, norm_layer=norm_layer, activation_layer=nn.silu, key=keys[0])
            )
        layers.append(
            ConvNormActivation(
                expanded, expanded, kernel_size=cnf.kernel, stride=cnf.stride,
                groups=expanded, norm_layer=norm_layer, activation_layer=nn.silu, key=keys[1],
            )
        )
        squeeze_channels = max(1, cnf.input_channels // 4)
        layers.append(SqueezeExcitation(expanded, squeeze_channels, activation=nn.silu, key=keys[2]))
        layers.append(
            ConvNormActivation(expanded, cnf.out_channels, kernel_size=1, norm_layer=norm_layer, activation_layer=None, key=keys[3])
        )
        self.block = nn.Sequential(layers)
        self.stochastic_depth = DropPath(stochastic_depth_prob, mode="global")

    def __call__(self, x, state, *, key=None):
        out, state = self.block(x, state)
        if self.use_res_connect:
            out = self.stochastic_depth(out, key=key) + x
        return out, state


class _FusedMBConv(Module):
    __stateful__ = True

    block: nn.Sequential
    stochastic_depth: DropPath
    use_res_connect: bool = static()
    out_channels: int = static()

    def __init__(self, cnf: _MBConvConfig, stochastic_depth_prob: float, norm_layer: Callable, *, key):
        if not (1 <= cnf.stride <= 2):
            raise ValueError("illegal stride value")
        self.use_res_connect = cnf.stride == 1 and cnf.input_channels == cnf.out_channels
        self.out_channels = cnf.out_channels
        k1, k2 = jax.random.split(key)
        layers = []
        expanded = _MBConvConfig.adjust_channels(cnf.input_channels, cnf.expand_ratio)
        if expanded != cnf.input_channels:
            layers.append(
                ConvNormActivation(cnf.input_channels, expanded, kernel_size=cnf.kernel, stride=cnf.stride, norm_layer=norm_layer, activation_layer=nn.silu, key=k1)
            )
            layers.append(
                ConvNormActivation(expanded, cnf.out_channels, kernel_size=1, norm_layer=norm_layer, activation_layer=None, key=k2)
            )
        else:
            layers.append(
                ConvNormActivation(cnf.input_channels, cnf.out_channels, kernel_size=cnf.kernel, stride=cnf.stride, norm_layer=norm_layer, activation_layer=nn.silu, key=k1)
            )
        self.block = nn.Sequential(layers)
        self.stochastic_depth = DropPath(stochastic_depth_prob, mode="global")

    def __call__(self, x, state, *, key=None):
        out, state = self.block(x, state)
        if self.use_res_connect:
            out = self.stochastic_depth(out, key=key) + x
        return out, state


class EfficientNet(Module):
    __stateful__ = True

    features: nn.Sequential
    classifier: nn.Sequential

    def __init__(
        self,
        inverted_residual_setting: Sequence[_MBConvConfig],
        dropout: float,
        stochastic_depth_prob: float = 0.2,
        num_classes: int = 1000,
        norm_layer: Optional[Callable] = None,
        last_channel: Optional[int] = None,
        *,
        key: Optional[jax.Array] = None,
    ):
        key = default_key(key)
        if norm_layer is None:
            norm_layer = nn.BatchNorm
        total_stage_blocks = sum(cnf.num_layers for cnf in inverted_residual_setting)
        keys = jax.random.split(key, total_stage_blocks + 3)

        firstconv_output = inverted_residual_setting[0].input_channels
        layers = [
            ConvNormActivation(3, firstconv_output, kernel_size=3, stride=2, norm_layer=norm_layer, activation_layer=nn.silu, key=keys[0])
        ]
        stage_block_id = 0
        for cnf in inverted_residual_setting:
            stage = []
            for i in range(cnf.num_layers):
                block_cnf = copy.copy(cnf)
                if i > 0:
                    block_cnf.input_channels = block_cnf.out_channels
                    block_cnf.stride = 1
                sd_prob = stochastic_depth_prob * float(stage_block_id) / total_stage_blocks
                block_cls = _FusedMBConv if block_cnf.block == "fused" else _MBConv
                stage.append(block_cls(block_cnf, sd_prob, norm_layer, key=keys[stage_block_id + 1]))
                stage_block_id += 1
            layers.append(nn.Sequential(stage))
        lastconv_input = inverted_residual_setting[-1].out_channels
        lastconv_output = last_channel if last_channel is not None else 4 * lastconv_input
        layers.append(
            ConvNormActivation(lastconv_input, lastconv_output, kernel_size=1, norm_layer=norm_layer, activation_layer=nn.silu, key=keys[-2])
        )
        self.features = nn.Sequential(layers)
        self.classifier = nn.Sequential(
            [nn.Dropout(dropout), nn.Linear(lastconv_output, num_classes, key=keys[-1])]
        )

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        import jax.numpy as jnp

        x, single = ensure_nhwc(x)
        x, state = self.features(x, state, key=key)
        x = jnp.mean(x, axis=(1, 2))
        x, state = self.classifier(x, state, key=key)
        return debatch(x, single), state


def _efficientnet_conf(arch: str):
    """Architecture tables (reference efficientnet.py:423-479)."""
    if arch.startswith("efficientnet_b"):
        width_mult, depth_mult = {
            "efficientnet_b0": (1.0, 1.0),
            "efficientnet_b1": (1.0, 1.1),
            "efficientnet_b2": (1.1, 1.2),
            "efficientnet_b3": (1.2, 1.4),
            "efficientnet_b4": (1.4, 1.8),
            "efficientnet_b5": (1.6, 2.2),
            "efficientnet_b6": (1.8, 2.6),
            "efficientnet_b7": (2.0, 3.1),
        }[arch]
        bneck = functools.partial(_mbconf, width_mult=width_mult, depth_mult=depth_mult)
        setting = [
            bneck(1, 3, 1, 32, 16, 1),
            bneck(6, 3, 2, 16, 24, 2),
            bneck(6, 5, 2, 24, 40, 2),
            bneck(6, 3, 2, 40, 80, 3),
            bneck(6, 5, 1, 80, 112, 3),
            bneck(6, 5, 2, 112, 192, 4),
            bneck(6, 3, 1, 192, 320, 1),
        ]
        last_channel = None
    elif arch == "efficientnet_v2_s":
        setting = [
            _fusedconf(1, 3, 1, 24, 24, 2),
            _fusedconf(4, 3, 2, 24, 48, 4),
            _fusedconf(4, 3, 2, 48, 64, 4),
            _mbconf(4, 3, 2, 64, 128, 6),
            _mbconf(6, 3, 1, 128, 160, 9),
            _mbconf(6, 3, 2, 160, 256, 15),
        ]
        last_channel = 1280
    elif arch == "efficientnet_v2_m":
        setting = [
            _fusedconf(1, 3, 1, 24, 24, 3),
            _fusedconf(4, 3, 2, 24, 48, 5),
            _fusedconf(4, 3, 2, 48, 80, 5),
            _mbconf(4, 3, 2, 80, 160, 7),
            _mbconf(6, 3, 1, 160, 176, 14),
            _mbconf(6, 3, 2, 176, 304, 18),
            _mbconf(6, 3, 1, 304, 512, 5),
        ]
        last_channel = 1280
    elif arch == "efficientnet_v2_l":
        setting = [
            _fusedconf(1, 3, 1, 32, 32, 4),
            _fusedconf(4, 3, 2, 32, 64, 7),
            _fusedconf(4, 3, 2, 64, 96, 7),
            _mbconf(4, 3, 2, 96, 192, 10),
            _mbconf(6, 3, 1, 192, 224, 19),
            _mbconf(6, 3, 2, 224, 384, 25),
            _mbconf(6, 3, 1, 384, 640, 7),
        ]
        last_channel = 1280
    else:
        raise ValueError(f"Unsupported model type {arch}")
    return setting, last_channel


_DROPOUT = {
    "efficientnet_b0": 0.2, "efficientnet_b1": 0.2, "efficientnet_b2": 0.3,
    "efficientnet_b3": 0.3, "efficientnet_b4": 0.4, "efficientnet_b5": 0.4,
    "efficientnet_b6": 0.5, "efficientnet_b7": 0.5,
    "efficientnet_v2_s": 0.2, "efficientnet_v2_m": 0.3, "efficientnet_v2_l": 0.4,
}


def _efficientnet(arch: str, torch_weights: Optional[str], **kwargs):
    setting, last_channel = _efficientnet_conf(arch)
    kwargs.setdefault("dropout", _DROPOUT[arch])
    kwargs.setdefault("last_channel", last_channel)
    if arch in ("efficientnet_b5", "efficientnet_b6", "efficientnet_b7"):
        # reference efficientnet.py:650,671,692 / torchvision BN override
        kwargs.setdefault("norm_layer", functools.partial(nn.BatchNorm, eps=1e-3, momentum=0.01))
    elif arch.startswith("efficientnet_v2"):
        kwargs.setdefault("norm_layer", functools.partial(nn.BatchNorm, eps=1e-3))
    model = EfficientNet(setting, **kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)


def efficientnet_b0(torch_weights: Optional[str] = None, **kwargs: Any):
    return _efficientnet("efficientnet_b0", torch_weights, **kwargs)


def efficientnet_b1(torch_weights: Optional[str] = None, **kwargs: Any):
    return _efficientnet("efficientnet_b1", torch_weights, **kwargs)


def efficientnet_b2(torch_weights: Optional[str] = None, **kwargs: Any):
    return _efficientnet("efficientnet_b2", torch_weights, **kwargs)


def efficientnet_b3(torch_weights: Optional[str] = None, **kwargs: Any):
    return _efficientnet("efficientnet_b3", torch_weights, **kwargs)


def efficientnet_b4(torch_weights: Optional[str] = None, **kwargs: Any):
    return _efficientnet("efficientnet_b4", torch_weights, **kwargs)


def efficientnet_b5(torch_weights: Optional[str] = None, **kwargs: Any):
    return _efficientnet("efficientnet_b5", torch_weights, **kwargs)


def efficientnet_b6(torch_weights: Optional[str] = None, **kwargs: Any):
    return _efficientnet("efficientnet_b6", torch_weights, **kwargs)


def efficientnet_b7(torch_weights: Optional[str] = None, **kwargs: Any):
    return _efficientnet("efficientnet_b7", torch_weights, **kwargs)


def efficientnet_v2_s(torch_weights: Optional[str] = None, **kwargs: Any):
    return _efficientnet("efficientnet_v2_s", torch_weights, **kwargs)


def efficientnet_v2_m(torch_weights: Optional[str] = None, **kwargs: Any):
    return _efficientnet("efficientnet_v2_m", torch_weights, **kwargs)


def efficientnet_v2_l(torch_weights: Optional[str] = None, **kwargs: Any):
    return _efficientnet("efficientnet_v2_l", torch_weights, **kwargs)
