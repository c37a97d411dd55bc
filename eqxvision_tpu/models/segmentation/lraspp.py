"""Lite R-ASPP with MobileNetV3-Large backbone (reference segmentation/
lraspp.py:15-175)."""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ...core.module import Module, static
from ...core.state import State, init_state
from ... import nn
from ...experimental import intermediate_layer_getter
from ..classification.mobilenetv3 import mobilenet_v3_large
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights
from ._utils import resize_bilinear


class LRASPPHead(Module):
    """reference lraspp.py:71-119 / torchvision LRASPPHead."""

    __stateful__ = True

    cbr: nn.Sequential
    scale: nn.Sequential
    low_classifier: nn.Conv2d
    high_classifier: nn.Conv2d

    def __init__(self, low_channels, high_channels, num_classes, inter_channels=128, *, key):
        keys = jax.random.split(key, 4)
        self.cbr = nn.Sequential(
            [
                nn.Conv2d(high_channels, inter_channels, 1, use_bias=False, key=keys[0]),
                nn.BatchNorm(inter_channels),
                nn.Lambda(nn.relu),
            ]
        )
        self.scale = nn.Sequential(
            [
                nn.AdaptiveAvgPool2d(1),
                nn.Conv2d(high_channels, inter_channels, 1, use_bias=False, key=keys[1]),
                nn.Lambda(nn.sigmoid),
            ]
        )
        self.low_classifier = nn.Conv2d(low_channels, num_classes, 1, key=keys[2])
        self.high_classifier = nn.Conv2d(inter_channels, num_classes, 1, key=keys[3])

    def __call__(self, low, high, state, *, key=None):
        x, state = self.cbr(high, state)
        s, state = self.scale(high, state)
        x = x * s
        x = resize_bilinear(x, low.shape[1], low.shape[2])
        return self.low_classifier(low) + self.high_classifier(x), state


class LRASPP(Module):
    """reference lraspp.py:15-68 (not a _SimpleSegmentationModel)."""

    __stateful__ = True

    backbone: Module  # IntermediateLayerGetter tapping [low, high]
    classifier: LRASPPHead

    def __init__(self, backbone, low_channels, high_channels, num_classes=21, inter_channels=128, *, key=None):
        key = default_key(key)
        self.backbone = backbone
        self.classifier = LRASPPHead(low_channels, high_channels, num_classes, inter_channels, key=key)

    def __call__(self, x: jax.Array, state: State = None, *, key=None):
        x, single = ensure_nhwc(x)
        (_, taps), state = self.backbone(x, state, key=key)
        low, high = taps[0], taps[1]
        out, state = self.classifier(low, high, state, key=key)
        out = resize_bilinear(out, x.shape[1], x.shape[2])
        return debatch(out, single), state


def lraspp_mobilenet_v3_large(
    num_classes: Optional[int] = 21,
    backbone: Optional[Module] = None,
    intermediate_layers: Optional[Callable] = None,
    torch_weights: Optional[str] = None,
    *,
    key: Optional[jax.Array] = None,
):
    """LR-ASPP factory (reference lraspp.py:122-175); returns
    (model, state). Default: dilated MobileNetV3-Large backbone, taps at
    feature indices [4, 16]."""
    key = default_key(key)
    if num_classes is None:
        num_classes = 21
    if backbone is None:
        backbone = mobilenet_v3_large(dilated=True)
    if isinstance(backbone, tuple):
        backbone = backbone[0]
    if intermediate_layers is None:
        intermediate_layers = lambda m: [4, 16]  # noqa: E731

    features = backbone.features
    num_channels = [features.layers[i].out_channels for i in intermediate_layers(features)]
    wrapped = intermediate_layer_getter(features, intermediate_layers)
    model = LRASPP(wrapped, num_channels[0], num_channels[1], num_classes=num_classes, key=key)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)
