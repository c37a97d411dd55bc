"""DeepLabV3 semantic segmentation (reference segmentation/
deeplabv3.py:18-227): ASPP with atrous rates 12/24/36 + global pooling
branch."""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ...core.module import Module
from ... import nn
from ._utils import _SimpleSegmentationModel, resize_bilinear
from .fcn import FCNHead, _build_simple_seg


class DeepLabV3(_SimpleSegmentationModel):
    """reference deeplabv3.py:18-21."""


class ASPPConv(nn.Sequential):
    def __init__(self, in_channels, out_channels, dilation, *, key):
        super().__init__(
            [
                nn.Conv2d(in_channels, out_channels, 3, padding=dilation, dilation=dilation, use_bias=False, key=key),
                nn.BatchNorm(out_channels),
                nn.Lambda(nn.relu),
            ]
        )


class ASPPPooling(Module):
    """Global-average-pool branch, upsampled back (reference
    deeplabv3.py:57-76)."""

    __stateful__ = True

    conv: nn.Conv2d
    bn: nn.BatchNorm

    def __init__(self, in_channels, out_channels, *, key):
        self.conv = nn.Conv2d(in_channels, out_channels, 1, use_bias=False, key=key)
        self.bn = nn.BatchNorm(out_channels)

    def __call__(self, x, state, *, key=None):
        n, h, w, c = x.shape
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = self.conv(s)
        s, state = self.bn(s, state)
        s = nn.relu(s)
        return jnp.broadcast_to(s, (n, h, w, s.shape[-1])), state


class ASPP(Module):
    """reference deeplabv3.py:38-135."""

    __stateful__ = True

    convs: tuple
    project: nn.Sequential

    def __init__(self, in_channels: int, atrous_rates: Sequence[int], out_channels: int = 256, *, key):
        keys = jax.random.split(key, len(atrous_rates) + 3)
        branches = [
            nn.Sequential(
                [
                    nn.Conv2d(in_channels, out_channels, 1, use_bias=False, key=keys[0]),
                    nn.BatchNorm(out_channels),
                    nn.Lambda(nn.relu),
                ]
            )
        ]
        for i, rate in enumerate(atrous_rates):
            branches.append(ASPPConv(in_channels, out_channels, rate, key=keys[i + 1]))
        branches.append(ASPPPooling(in_channels, out_channels, key=keys[-2]))
        self.convs = tuple(branches)
        self.project = nn.Sequential(
            [
                nn.Conv2d(len(branches) * out_channels, out_channels, 1, use_bias=False, key=keys[-1]),
                nn.BatchNorm(out_channels),
                nn.Lambda(nn.relu),
                nn.Dropout(0.5),
            ]
        )

    def __call__(self, x, state, *, key=None):
        keys = [None] * (len(self.convs) + 1) if key is None else list(jax.random.split(key, len(self.convs) + 1))
        outs = []
        for branch, k in zip(self.convs, keys[:-1]):
            y, state = branch(x, state, key=k)
            outs.append(y)
        return self.project(jnp.concatenate(outs, axis=-1), state, key=keys[-1])


class DeepLabHead(nn.Sequential):
    """ASPP -> conv3x3+BN+ReLU -> conv1x1 (reference deeplabv3.py:24-35)."""

    def __init__(self, in_channels: int, out_channels: int, *, key):
        k1, k2, k3 = jax.random.split(key, 3)
        super().__init__(
            [
                ASPP(in_channels, [12, 24, 36], key=k1),
                nn.Conv2d(256, 256, 3, padding=1, use_bias=False, key=k2),
                nn.BatchNorm(256),
                nn.Lambda(nn.relu),
                nn.Conv2d(256, out_channels, 1, key=k3),
            ]
        )


def deeplabv3(
    num_classes: Optional[int] = 21,
    backbone: Optional[Module] = None,
    intermediate_layers: Optional[Callable] = None,
    classifier_module: Optional[Callable] = None,
    classifier_in_channels: int = 2048,
    aux_in_channels: Optional[int] = None,
    silence_layers: Optional[Callable] = None,
    torch_weights: Optional[str] = None,
    *,
    key: Optional[jax.Array] = None,
):
    """DeepLabV3 factory (reference deeplabv3.py:138-227); returns
    (model, state). Aux head (when aux_in_channels given) is an FCNHead,
    as in torchvision."""
    return _build_simple_seg(
        DeepLabV3, DeepLabHead, num_classes, backbone, intermediate_layers,
        classifier_module, classifier_in_channels, aux_in_channels,
        silence_layers, torch_weights, key, aux_module=FCNHead,
    )
