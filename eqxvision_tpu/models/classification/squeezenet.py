"""SqueezeNet 1.0 / 1.1, NHWC batched.

Capability parity with reference eqxvision/models/classification/
squeezenet.py:14-172 and torchvision.models.squeezenet (conv classifier
head + global average pool, ceil-mode max pools).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ...core.module import Module
from ...core.state import State, init_state
from ... import nn
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights


class _Fire(Module):
    squeeze: nn.Conv2d
    expand1x1: nn.Conv2d
    expand3x3: nn.Conv2d

    def __init__(self, inplanes, squeeze_planes, expand1x1_planes, expand3x3_planes, *, key):
        k1, k2, k3 = jax.random.split(key, 3)
        self.squeeze = nn.Conv2d(inplanes, squeeze_planes, 1, key=k1)
        self.expand1x1 = nn.Conv2d(squeeze_planes, expand1x1_planes, 1, key=k2)
        self.expand3x3 = nn.Conv2d(squeeze_planes, expand3x3_planes, 3, padding=1, key=k3)

    def __call__(self, x, *, key=None):
        x = nn.relu(self.squeeze(x))
        return jnp.concatenate(
            [nn.relu(self.expand1x1(x)), nn.relu(self.expand3x3(x))], axis=-1
        )


class SqueezeNet(Module):
    __stateful__ = True

    features: nn.Sequential
    classifier: nn.Sequential

    def __init__(self, version: str = "1_0", num_classes: int = 1000, dropout: float = 0.5, *, key: Optional[jax.Array] = None):
        key = default_key(key)
        keys = jax.random.split(key, 10)
        if version == "1_0":
            self.features = nn.Sequential(
                [
                    nn.Conv2d(3, 96, 7, stride=2, key=keys[0]),
                    nn.Lambda(nn.relu),
                    nn.MaxPool2d(3, 2, use_ceil=True),
                    _Fire(96, 16, 64, 64, key=keys[1]),
                    _Fire(128, 16, 64, 64, key=keys[2]),
                    _Fire(128, 32, 128, 128, key=keys[3]),
                    nn.MaxPool2d(3, 2, use_ceil=True),
                    _Fire(256, 32, 128, 128, key=keys[4]),
                    _Fire(256, 48, 192, 192, key=keys[5]),
                    _Fire(384, 48, 192, 192, key=keys[6]),
                    _Fire(384, 64, 256, 256, key=keys[7]),
                    nn.MaxPool2d(3, 2, use_ceil=True),
                    _Fire(512, 64, 256, 256, key=keys[8]),
                ]
            )
        elif version == "1_1":
            self.features = nn.Sequential(
                [
                    nn.Conv2d(3, 64, 3, stride=2, key=keys[0]),
                    nn.Lambda(nn.relu),
                    nn.MaxPool2d(3, 2, use_ceil=True),
                    _Fire(64, 16, 64, 64, key=keys[1]),
                    _Fire(128, 16, 64, 64, key=keys[2]),
                    nn.MaxPool2d(3, 2, use_ceil=True),
                    _Fire(128, 32, 128, 128, key=keys[3]),
                    _Fire(256, 32, 128, 128, key=keys[4]),
                    nn.MaxPool2d(3, 2, use_ceil=True),
                    _Fire(256, 48, 192, 192, key=keys[5]),
                    _Fire(384, 48, 192, 192, key=keys[6]),
                    _Fire(384, 64, 256, 256, key=keys[7]),
                    _Fire(512, 64, 256, 256, key=keys[8]),
                ]
            )
        else:
            raise ValueError(f"Unsupported SqueezeNet version {version}: 1_0 or 1_1 expected")
        self.classifier = nn.Sequential(
            [
                nn.Dropout(dropout),
                nn.Conv2d(512, num_classes, 1, key=keys[9]),
                nn.Lambda(nn.relu),
                nn.AdaptiveAvgPool2d((1, 1)),
            ]
        )

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        x, single = ensure_nhwc(x)
        x, state = self.features(x, state, key=key)
        x, state = self.classifier(x, state, key=key)
        x = x.reshape(x.shape[0], -1)
        return debatch(x, single), state


def squeezenet1_0(torch_weights: Optional[str] = None, **kwargs: Any):
    model = SqueezeNet("1_0", **kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)


def squeezenet1_1(torch_weights: Optional[str] = None, **kwargs: Any):
    model = SqueezeNet("1_1", **kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)
