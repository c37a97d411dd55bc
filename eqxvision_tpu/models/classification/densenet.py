"""DenseNet 121/161/169/201, NHWC batched.

Capability parity with reference eqxvision/models/classification/
densenet.py:15-305 and torchvision.models.densenet. Dense connectivity
is channel-axis concatenation — axis=-1 in NHWC (the reference used
axis=0 on per-sample CHW, reference densenet.py:63,103).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.module import Module
from ...core.state import State, init_state
from ... import nn
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights


class _DenseLayer(Module):
    __stateful__ = True

    norm1: nn.BatchNorm
    conv1: nn.Conv2d
    norm2: nn.BatchNorm
    conv2: nn.Conv2d

    def __init__(self, num_input_features, growth_rate, bn_size, *, key):
        k1, k2 = jax.random.split(key)
        self.norm1 = nn.BatchNorm(num_input_features)
        self.conv1 = nn.Conv2d(num_input_features, bn_size * growth_rate, 1, use_bias=False, key=k1)
        self.norm2 = nn.BatchNorm(bn_size * growth_rate)
        self.conv2 = nn.Conv2d(bn_size * growth_rate, growth_rate, 3, padding=1, use_bias=False, key=k2)

    def __call__(self, x, state, *, key=None):
        out, state = self.norm1(x, state)
        out = self.conv1(nn.relu(out))
        out, state = self.norm2(out, state)
        out = self.conv2(nn.relu(out))
        return out, state


class _DenseBlock(Module):
    __stateful__ = True

    layers: Tuple[_DenseLayer, ...]

    def __init__(self, num_layers, num_input_features, bn_size, growth_rate, *, key):
        keys = jax.random.split(key, num_layers)
        self.layers = tuple(
            _DenseLayer(num_input_features + i * growth_rate, growth_rate, bn_size, key=keys[i])
            for i in range(num_layers)
        )

    def __call__(self, x, state, *, key=None):
        features = [x]
        for layer in self.layers:
            new, state = layer(jnp.concatenate(features, axis=-1), state)
            features.append(new)
        return jnp.concatenate(features, axis=-1), state


class _Transition(Module):
    __stateful__ = True

    norm: nn.BatchNorm
    conv: nn.Conv2d
    pool: nn.AvgPool2d

    def __init__(self, num_input_features, num_output_features, *, key):
        self.norm = nn.BatchNorm(num_input_features)
        self.conv = nn.Conv2d(num_input_features, num_output_features, 1, use_bias=False, key=key)
        self.pool = nn.AvgPool2d(2, 2)

    def __call__(self, x, state, *, key=None):
        x, state = self.norm(x, state)
        return self.pool(self.conv(nn.relu(x))), state


class DenseNet(Module):
    __stateful__ = True

    features: nn.Sequential
    classifier: nn.Linear

    def __init__(
        self,
        growth_rate: int = 32,
        block_config: Tuple[int, ...] = (6, 12, 24, 16),
        num_init_features: int = 64,
        bn_size: int = 4,
        num_classes: int = 1000,
        *,
        key: Optional[jax.Array] = None,
    ):
        key = default_key(key)
        keys = jax.random.split(key, len(block_config) * 2 + 2)
        layers = [
            nn.Conv2d(3, num_init_features, 7, stride=2, padding=3, use_bias=False, key=keys[0]),
            nn.BatchNorm(num_init_features),
            nn.Lambda(nn.relu),
            nn.MaxPool2d(3, 2, 1),
        ]
        num_features = num_init_features
        for i, num_layers in enumerate(block_config):
            layers.append(_DenseBlock(num_layers, num_features, bn_size, growth_rate, key=keys[2 * i + 1]))
            num_features += num_layers * growth_rate
            if i != len(block_config) - 1:
                layers.append(_Transition(num_features, num_features // 2, key=keys[2 * i + 2]))
                num_features //= 2
        layers.append(nn.BatchNorm(num_features))
        self.features = nn.Sequential(layers)
        self.classifier = nn.Linear(num_features, num_classes, key=keys[-1])

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        x, single = ensure_nhwc(x)
        x, state = self.features(x, state, key=key)
        x = nn.relu(x)
        x = nn.adaptive_avg_pool2d(x, (1, 1))
        x = nn.flatten_chw(x)
        x = self.classifier(x)
        return debatch(x, single), state


def _densenet(growth_rate, block_config, num_init_features, torch_weights, **kwargs):
    model = DenseNet(growth_rate, block_config, num_init_features, **kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)


def densenet121(torch_weights: Optional[str] = None, **kwargs: Any):
    return _densenet(32, (6, 12, 24, 16), 64, torch_weights, **kwargs)


def densenet161(torch_weights: Optional[str] = None, **kwargs: Any):
    return _densenet(48, (6, 12, 36, 24), 96, torch_weights, **kwargs)


def densenet169(torch_weights: Optional[str] = None, **kwargs: Any):
    return _densenet(32, (6, 12, 32, 32), 64, torch_weights, **kwargs)


def densenet201(torch_weights: Optional[str] = None, **kwargs: Any):
    return _densenet(32, (6, 12, 48, 32), 64, torch_weights, **kwargs)
