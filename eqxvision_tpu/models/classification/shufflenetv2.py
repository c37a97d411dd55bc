"""ShuffleNetV2, NHWC batched.

Capability parity with reference eqxvision/models/classification/
shufflenetv2.py:15-321 and torchvision.models.shufflenetv2. Channel
shuffle is a reshape/transpose on the trailing channel axis in NHWC
(the reference's pure-fn ``_channel_shuffle`` did the CHW equivalent,
reference shufflenetv2.py:15-21).
"""
from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from ...core.module import Module, static
from ...core.state import State, init_state
from ... import nn
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    *lead, c = x.shape
    x = x.reshape(*lead, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(*lead, c)


class _InvertedResidual(Module):
    __stateful__ = True

    branch1: Optional[nn.Sequential]
    branch2: nn.Sequential
    stride: int = static()

    def __init__(self, inp, oup, stride, *, key):
        if stride not in (1, 2):
            raise ValueError("illegal stride value")
        self.stride = stride
        branch_features = oup // 2
        if stride == 1 and inp != branch_features * 2:
            raise ValueError("invalid inp/oup for stride 1")
        keys = jax.random.split(key, 5)
        if stride > 1:
            self.branch1 = nn.Sequential(
                [
                    nn.Conv2d(inp, inp, 3, stride=stride, padding=1, groups=inp, use_bias=False, key=keys[0]),
                    nn.BatchNorm(inp),
                    nn.Conv2d(inp, branch_features, 1, use_bias=False, key=keys[1]),
                    nn.BatchNorm(branch_features),
                    nn.Lambda(nn.relu),
                ]
            )
        else:
            self.branch1 = None
        b2_in = inp if stride > 1 else branch_features
        self.branch2 = nn.Sequential(
            [
                nn.Conv2d(b2_in, branch_features, 1, use_bias=False, key=keys[2]),
                nn.BatchNorm(branch_features),
                nn.Lambda(nn.relu),
                nn.Conv2d(branch_features, branch_features, 3, stride=stride, padding=1, groups=branch_features, use_bias=False, key=keys[3]),
                nn.BatchNorm(branch_features),
                nn.Conv2d(branch_features, branch_features, 1, use_bias=False, key=keys[4]),
                nn.BatchNorm(branch_features),
                nn.Lambda(nn.relu),
            ]
        )

    def __call__(self, x, state, *, key=None):
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            b2, state = self.branch2(x2, state)
            out = jnp.concatenate([x1, b2], axis=-1)
        else:
            b1, state = self.branch1(x, state)
            b2, state = self.branch2(x, state)
            out = jnp.concatenate([b1, b2], axis=-1)
        return channel_shuffle(out, 2), state


class ShuffleNetV2(Module):
    __stateful__ = True

    conv1: nn.Sequential
    maxpool: nn.MaxPool2d
    stage2: nn.Sequential
    stage3: nn.Sequential
    stage4: nn.Sequential
    conv5: nn.Sequential
    fc: nn.Linear

    def __init__(
        self,
        stages_repeats: List[int],
        stages_out_channels: List[int],
        num_classes: int = 1000,
        *,
        key: Optional[jax.Array] = None,
    ):
        key = default_key(key)
        if len(stages_repeats) != 3:
            raise ValueError("expected stages_repeats as list of 3 positive ints")
        if len(stages_out_channels) != 5:
            raise ValueError("expected stages_out_channels as list of 5 positive ints")
        keys = jax.random.split(key, 6)
        input_channels = 3
        output_channels = stages_out_channels[0]
        self.conv1 = nn.Sequential(
            [
                nn.Conv2d(input_channels, output_channels, 3, 2, 1, use_bias=False, key=keys[0]),
                nn.BatchNorm(output_channels),
                nn.Lambda(nn.relu),
            ]
        )
        input_channels = output_channels
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        stages = []
        for i, (repeats, output_channels) in enumerate(zip(stages_repeats, stages_out_channels[1:4])):
            skeys = jax.random.split(keys[i + 1], repeats)
            seq = [_InvertedResidual(input_channels, output_channels, 2, key=skeys[0])]
            for j in range(repeats - 1):
                seq.append(_InvertedResidual(output_channels, output_channels, 1, key=skeys[j + 1]))
            stages.append(nn.Sequential(seq))
            input_channels = output_channels
        self.stage2, self.stage3, self.stage4 = stages
        output_channels = stages_out_channels[-1]
        self.conv5 = nn.Sequential(
            [
                nn.Conv2d(input_channels, output_channels, 1, use_bias=False, key=keys[4]),
                nn.BatchNorm(output_channels),
                nn.Lambda(nn.relu),
            ]
        )
        self.fc = nn.Linear(output_channels, num_classes, key=keys[5])

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        x, single = ensure_nhwc(x)
        x, state = self.conv1(x, state)
        x = self.maxpool(x)
        x, state = self.stage2(x, state)
        x, state = self.stage3(x, state)
        x, state = self.stage4(x, state)
        x, state = self.conv5(x, state)
        x = jnp.mean(x, axis=(1, 2))  # global pool
        x = self.fc(x)
        return debatch(x, single), state


def _shufflenet(repeats, channels, torch_weights, **kwargs):
    model = ShuffleNetV2(repeats, channels, **kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)


def shufflenet_v2_x0_5(torch_weights: Optional[str] = None, **kwargs: Any):
    return _shufflenet([4, 8, 4], [24, 48, 96, 192, 1024], torch_weights, **kwargs)


def shufflenet_v2_x1_0(torch_weights: Optional[str] = None, **kwargs: Any):
    return _shufflenet([4, 8, 4], [24, 116, 232, 464, 1024], torch_weights, **kwargs)


def shufflenet_v2_x1_5(torch_weights: Optional[str] = None, **kwargs: Any):
    return _shufflenet([4, 8, 4], [24, 176, 352, 704, 1024], torch_weights, **kwargs)


def shufflenet_v2_x2_0(torch_weights: Optional[str] = None, **kwargs: Any):
    return _shufflenet([4, 8, 4], [24, 244, 488, 976, 2048], torch_weights, **kwargs)
