"""RegNet X/Y families, NHWC batched.

Capability parity with reference eqxvision/models/classification/
regnet.py:16-676 and torchvision.models.regnet: the quantized log-space
width schedule (``BlockParams.from_init_params``, reference
regnet.py:206-326), X (plain bottleneck) and Y (with SE) stages, 15
factory variants.
"""
from __future__ import annotations

import math
from typing import Any, Callable, List, Optional, Tuple

import jax
import numpy as np

from ...core.module import Module
from ...core.state import State, init_state
from ... import nn
from ...layers import ConvNormActivation, SqueezeExcitation
from ...utils import _make_divisible
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights


class BlockParams:
    def __init__(self, depths, widths, group_widths, bottleneck_multipliers, strides, se_ratio=None):
        self.depths = depths
        self.widths = widths
        self.group_widths = group_widths
        self.bottleneck_multipliers = bottleneck_multipliers
        self.strides = strides
        self.se_ratio = se_ratio

    @classmethod
    def from_init_params(cls, depth, w_0, w_a, w_m, group_width, bottleneck_multiplier=1.0, se_ratio=None):
        """Quantized linear width schedule in log space (reference
        regnet.py:223-326): widths w_0 + i*w_a are snapped to powers of
        w_m and multiples of 8; consecutive equal widths form stages.

        Provenance: this transcribes TORCHVISION's published
        `BlockParams.from_init_params` / width-group compatibility
        algorithm (torchvision/models/regnet.py, itself from pycls) —
        it must match torchvision numerically or every RegNet
        checkpoint import breaks, so the variable structure (incl. the
        inherited `_adjust_widths_groups_compatibilty` method-name
        typo) intentionally mirrors the published code. The schedule is
        pinned independently by tests/test_param_counts.py and the
        per-variant manifests (tests/manifests/regnet_*.json)."""
        QUANT, STRIDE = 8, 2
        if w_a < 0 or w_0 <= 0 or w_m <= 1 or w_0 % 8 != 0:
            raise ValueError("Invalid RegNet settings")
        widths_cont = np.arange(depth) * w_a + w_0
        block_capacity = np.round(np.log(widths_cont / w_0) / math.log(w_m))
        block_widths = (np.round(w_0 * np.power(w_m, block_capacity) / QUANT) * QUANT).astype(int).tolist()
        num_stages = len(set(block_widths))

        split_helper = zip(block_widths + [0], [0] + block_widths, block_widths + [0], [0] + block_widths)
        splits = [w != wp or r != rp for w, wp, r, rp in split_helper]
        stage_widths = [w for w, t in zip(block_widths, splits[:-1]) if t]
        stage_depths = np.diff([d for d, t in enumerate(splits) if t]).astype(int).tolist()

        strides = [STRIDE] * num_stages
        bottleneck_multipliers = [bottleneck_multiplier] * num_stages
        group_widths = [group_width] * num_stages
        stage_widths, group_widths = cls._adjust_widths_groups_compatibilty(stage_widths, bottleneck_multipliers, group_widths)
        return cls(stage_depths, stage_widths, group_widths, bottleneck_multipliers, strides, se_ratio)

    def _get_expanded_params(self):
        return zip(self.widths, self.strides, self.depths, self.group_widths, self.bottleneck_multipliers)

    @staticmethod
    def _adjust_widths_groups_compatibilty(stage_widths, bottleneck_ratios, group_widths):
        widths = [int(w * b) for w, b in zip(stage_widths, bottleneck_ratios)]
        group_widths_min = [min(g, w_bot) for g, w_bot in zip(group_widths, widths)]
        ws_bot = [_make_divisible(w_bot, g) for w_bot, g in zip(widths, group_widths_min)]
        stage_widths = [int(w_bot / b) for w_bot, b in zip(ws_bot, bottleneck_ratios)]
        return stage_widths, group_widths_min


class SimpleStemIN(ConvNormActivation):
    """3x3/2 stem (reference regnet.py:16-36)."""

    def __init__(self, width_in, width_out, norm_layer, activation_layer, *, key):
        super().__init__(width_in, width_out, kernel_size=3, stride=2, norm_layer=norm_layer, activation_layer=activation_layer, key=key)


class BottleneckTransform(Module):
    """1x1 -> 3x3(group, stride) -> [SE] -> 1x1 (reference regnet.py:39-108)."""

    __stateful__ = True

    a: ConvNormActivation
    b: ConvNormActivation
    se: Optional[SqueezeExcitation]
    c: ConvNormActivation

    def __init__(self, width_in, width_out, stride, norm_layer, activation_layer, group_width, bottleneck_multiplier, se_ratio, *, key):
        keys = jax.random.split(key, 4)
        w_b = int(round(width_out * bottleneck_multiplier))
        g = w_b // group_width
        self.a = ConvNormActivation(width_in, w_b, kernel_size=1, norm_layer=norm_layer, activation_layer=activation_layer, key=keys[0])
        self.b = ConvNormActivation(w_b, w_b, kernel_size=3, stride=stride, groups=g, norm_layer=norm_layer, activation_layer=activation_layer, key=keys[1])
        if se_ratio:
            width_se_out = int(round(se_ratio * width_in))
            self.se = SqueezeExcitation(w_b, width_se_out, activation=activation_layer, key=keys[2])
        else:
            self.se = None
        self.c = ConvNormActivation(w_b, width_out, kernel_size=1, norm_layer=norm_layer, activation_layer=None, key=keys[3])

    def __call__(self, x, state, *, key=None):
        x, state = self.a(x, state)
        x, state = self.b(x, state)
        if self.se is not None:
            x = self.se(x)
        return self.c(x, state)


class ResBottleneckBlock(Module):
    """x + F(x) with optional 1x1 projection (reference regnet.py:111-165)."""

    __stateful__ = True

    proj: Optional[ConvNormActivation]
    f: BottleneckTransform

    def __init__(self, width_in, width_out, stride, norm_layer, activation_layer, group_width=1, bottleneck_multiplier=1.0, se_ratio=None, *, key):
        k1, k2 = jax.random.split(key)
        if width_in != width_out or stride != 1:
            self.proj = ConvNormActivation(width_in, width_out, kernel_size=1, stride=stride, norm_layer=norm_layer, activation_layer=None, key=k1)
        else:
            self.proj = None
        self.f = BottleneckTransform(width_in, width_out, stride, norm_layer, activation_layer, group_width, bottleneck_multiplier, se_ratio, key=k2)

    def __call__(self, x, state, *, key=None):
        fx, state = self.f(x, state)
        if self.proj is not None:
            px, state = self.proj(x, state)
        else:
            px = x
        return nn.relu(px + fx), state


class AnyStage(nn.Sequential):
    """A stage of ResBottleneckBlocks (reference regnet.py:168-203)."""

    def __init__(self, width_in, width_out, stride, depth, norm_layer, activation_layer, group_width, bottleneck_multiplier, se_ratio=None, *, key):
        keys = jax.random.split(key, depth)
        blocks = []
        for i in range(depth):
            blocks.append(
                ResBottleneckBlock(
                    width_in if i == 0 else width_out,
                    width_out,
                    stride if i == 0 else 1,
                    norm_layer,
                    activation_layer,
                    group_width,
                    bottleneck_multiplier,
                    se_ratio,
                    key=keys[i],
                )
            )
        super().__init__(blocks)


class RegNet(Module):
    __stateful__ = True

    stem: SimpleStemIN
    trunk_output: nn.Sequential
    fc: nn.Linear

    def __init__(
        self,
        block_params: BlockParams,
        num_classes: int = 1000,
        stem_width: int = 32,
        norm_layer: Callable = nn.BatchNorm,
        activation_layer: Callable = nn.relu,
        *,
        key: Optional[jax.Array] = None,
    ):
        key = default_key(key)
        n_stages = len(block_params.widths)
        keys = jax.random.split(key, n_stages + 2)
        self.stem = SimpleStemIN(3, stem_width, norm_layer, activation_layer, key=keys[0])
        current_width = stem_width
        stages = []
        for i, (width_out, stride, depth, group_width, bottleneck_multiplier) in enumerate(
            block_params._get_expanded_params()
        ):
            stages.append(
                AnyStage(
                    current_width, width_out, stride, depth, norm_layer, activation_layer,
                    group_width, bottleneck_multiplier, block_params.se_ratio, key=keys[i + 1],
                )
            )
            current_width = width_out
        self.trunk_output = nn.Sequential(stages)
        self.fc = nn.Linear(current_width, num_classes, key=keys[-1])

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        import jax.numpy as jnp

        x, single = ensure_nhwc(x)
        x, state = self.stem(x, state)
        x, state = self.trunk_output(x, state)
        x = jnp.mean(x, axis=(1, 2))
        x = self.fc(x)
        return debatch(x, single), state


_CONFIGS = {
    # name: (depth, w_0, w_a, w_m, group_width, se_ratio)
    "regnet_y_400mf": (16, 48, 27.89, 2.09, 8, 0.25),
    "regnet_y_800mf": (14, 56, 38.84, 2.4, 16, 0.25),
    "regnet_y_1_6gf": (27, 48, 20.71, 2.65, 24, 0.25),
    "regnet_y_3_2gf": (21, 80, 42.63, 2.66, 24, 0.25),
    "regnet_y_8gf": (17, 192, 76.82, 2.19, 56, 0.25),
    "regnet_y_16gf": (18, 200, 106.23, 2.48, 112, 0.25),
    "regnet_y_32gf": (20, 232, 115.89, 2.53, 232, 0.25),
    "regnet_y_128gf": (27, 456, 160.83, 2.52, 264, 0.25),
    "regnet_x_400mf": (22, 24, 24.48, 2.54, 16, None),
    "regnet_x_800mf": (16, 56, 35.73, 2.28, 16, None),
    "regnet_x_1_6gf": (18, 80, 34.01, 2.25, 24, None),
    "regnet_x_3_2gf": (25, 88, 26.31, 2.25, 48, None),
    "regnet_x_8gf": (23, 80, 49.56, 2.88, 120, None),
    "regnet_x_16gf": (22, 216, 55.59, 2.1, 128, None),
    "regnet_x_32gf": (23, 320, 69.86, 2.0, 168, None),
}


def _regnet(name: str, torch_weights: Optional[str], **kwargs):
    depth, w_0, w_a, w_m, g, se = _CONFIGS[name]
    params = BlockParams.from_init_params(depth, w_0, w_a, w_m, g, se_ratio=se)
    model = RegNet(params, **kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)


def _make_factory(name):
    def factory(torch_weights: Optional[str] = None, **kwargs: Any):
        return _regnet(name, torch_weights, **kwargs)

    factory.__name__ = name
    factory.__doc__ = f"{name} (reference regnet.py:449-676); returns (model, state)."
    return factory


regnet_y_400mf = _make_factory("regnet_y_400mf")
regnet_y_800mf = _make_factory("regnet_y_800mf")
regnet_y_1_6gf = _make_factory("regnet_y_1_6gf")
regnet_y_3_2gf = _make_factory("regnet_y_3_2gf")
regnet_y_8gf = _make_factory("regnet_y_8gf")
regnet_y_16gf = _make_factory("regnet_y_16gf")
regnet_y_32gf = _make_factory("regnet_y_32gf")
regnet_y_128gf = _make_factory("regnet_y_128gf")
regnet_x_400mf = _make_factory("regnet_x_400mf")
regnet_x_800mf = _make_factory("regnet_x_800mf")
regnet_x_1_6gf = _make_factory("regnet_x_1_6gf")
regnet_x_3_2gf = _make_factory("regnet_x_3_2gf")
regnet_x_8gf = _make_factory("regnet_x_8gf")
regnet_x_16gf = _make_factory("regnet_x_16gf")
regnet_x_32gf = _make_factory("regnet_x_32gf")
