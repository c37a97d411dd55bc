"""VGG 11/13/16/19 (+BN variants), NHWC batched.

Capability parity with reference eqxvision/models/classification/
vgg.py:15-275 and torchvision.models.vgg. The reference's classifier
dropped the first ReLU (reference vgg.py:97-106), collapsing pretrained
top-1 to 27.19 (SURVEY.md §8.1); this implementation uses the correct
torchvision ordering Linear-ReLU-Dropout x2 + Linear.
"""
from __future__ import annotations

from typing import Any, Optional

import jax

from ...core.module import Module
from ...core.state import State, init_state
from ... import nn
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights

_CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


def _make_features(cfg, batch_norm: bool, *, key) -> nn.Sequential:
    layers = []
    in_channels = 3
    keys = jax.random.split(key, len([v for v in cfg if v != "M"]))
    ki = 0
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_channels, v, 3, padding=1, key=keys[ki]))
            ki += 1
            if batch_norm:
                layers.append(nn.BatchNorm(v))
            layers.append(nn.Lambda(nn.relu))
            in_channels = v
    return nn.Sequential(layers)


class VGG(Module):
    __stateful__ = True

    features: nn.Sequential
    avgpool: nn.AdaptiveAvgPool2d
    classifier: nn.Sequential

    def __init__(self, cfg: str = "A", batch_norm: bool = False, num_classes: int = 1000, dropout: float = 0.5, *, key: Optional[jax.Array] = None):
        key = default_key(key)
        kf, k1, k2, k3 = jax.random.split(key, 4)
        self.features = _make_features(_CFGS[cfg], batch_norm, key=kf)
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            [
                nn.Linear(512 * 7 * 7, 4096, key=k1),
                nn.Lambda(nn.relu),
                nn.Dropout(dropout),
                nn.Linear(4096, 4096, key=k2),
                nn.Lambda(nn.relu),
                nn.Dropout(dropout),
                nn.Linear(4096, num_classes, key=k3),
            ]
        )

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        x, single = ensure_nhwc(x)
        k1, k2 = (None, None) if key is None else jax.random.split(key)
        x, state = self.features(x, state, key=k1)
        x = self.avgpool(x)
        x = nn.flatten_chw(x)
        x, state = self.classifier(x, state, key=k2)
        return debatch(x, single), state


def _vgg(cfg, batch_norm, torch_weights, **kwargs):
    model = VGG(cfg, batch_norm, **kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)


def vgg11(torch_weights: Optional[str] = None, **kwargs: Any):
    return _vgg("A", False, torch_weights, **kwargs)


def vgg11_bn(torch_weights: Optional[str] = None, **kwargs: Any):
    return _vgg("A", True, torch_weights, **kwargs)


def vgg13(torch_weights: Optional[str] = None, **kwargs: Any):
    return _vgg("B", False, torch_weights, **kwargs)


def vgg13_bn(torch_weights: Optional[str] = None, **kwargs: Any):
    return _vgg("B", True, torch_weights, **kwargs)


def vgg16(torch_weights: Optional[str] = None, **kwargs: Any):
    return _vgg("D", False, torch_weights, **kwargs)


def vgg16_bn(torch_weights: Optional[str] = None, **kwargs: Any):
    return _vgg("D", True, torch_weights, **kwargs)


def vgg19(torch_weights: Optional[str] = None, **kwargs: Any):
    return _vgg("E", False, torch_weights, **kwargs)


def vgg19_bn(torch_weights: Optional[str] = None, **kwargs: Any):
    return _vgg("E", True, torch_weights, **kwargs)
