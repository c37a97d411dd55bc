"""ResNet / ResNeXt / Wide-ResNet family, NHWC batched.

Capability parity with reference eqxvision/models/classification/
resnet.py:15-511 and torchvision.models.resnet. Supports
``replace_stride_with_dilation`` (needed by the segmentation backbones,
reference resnet.py:193,232-240) and the groups/width knobs behind
ResNeXt and Wide-ResNet. v1.5 stride placement: the stride lives on the
3x3 conv of the bottleneck (reference resnet.py:95-162).
"""
from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple, Type, Union

import jax

from ...core.module import Module, static
from ...core.state import State, init_state
from ... import nn
from ...weights.urls import CLASSIFICATION_URLS
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights


def _conv3x3(cin, cout, stride=1, groups=1, dilation=1, *, key):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=dilation, groups=groups, dilation=dilation, use_bias=False, key=key)


def _conv1x1(cin, cout, stride=1, *, key):
    return nn.Conv2d(cin, cout, 1, stride=stride, use_bias=False, key=key)


class BasicBlock(Module):
    __stateful__ = True
    expansion = 1

    conv1: nn.Conv2d
    bn1: Module
    conv2: nn.Conv2d
    bn2: Module
    downsample: Optional[nn.Sequential]

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1, base_width=64, dilation=1, norm_layer=nn.BatchNorm, *, key):
        if groups != 1 or base_width != 64:
            raise ValueError("BasicBlock only supports groups=1 and base_width=64")
        if dilation > 1:
            raise NotImplementedError("Dilation > 1 not supported in BasicBlock")
        k1, k2 = jax.random.split(key)
        self.conv1 = _conv3x3(inplanes, planes, stride, key=k1)
        self.bn1 = norm_layer(planes)
        self.conv2 = _conv3x3(planes, planes, key=k2)
        self.bn2 = norm_layer(planes)
        self.downsample = downsample

    def __call__(self, x, state, *, key=None):
        identity = x
        out = self.conv1(x)
        out, state = self.bn1(out, state)
        out = nn.relu(out)
        out = self.conv2(out)
        out, state = self.bn2(out, state)
        if self.downsample is not None:
            identity, state = self.downsample(x, state)
        return nn.relu(out + identity), state


class Bottleneck(Module):
    __stateful__ = True
    expansion = 4

    conv1: nn.Conv2d
    bn1: Module
    conv2: nn.Conv2d
    bn2: Module
    conv3: nn.Conv2d
    bn3: Module
    downsample: Optional[nn.Sequential]

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1, base_width=64, dilation=1, norm_layer=nn.BatchNorm, *, key):
        width = int(planes * (base_width / 64.0)) * groups
        k1, k2, k3 = jax.random.split(key, 3)
        self.conv1 = _conv1x1(inplanes, width, key=k1)
        self.bn1 = norm_layer(width)
        self.conv2 = _conv3x3(width, width, stride, groups, dilation, key=k2)
        self.bn2 = norm_layer(width)
        self.conv3 = _conv1x1(width, planes * self.expansion, key=k3)
        self.bn3 = norm_layer(planes * self.expansion)
        self.downsample = downsample

    def __call__(self, x, state, *, key=None):
        identity = x
        out = self.conv1(x)
        out, state = self.bn1(out, state)
        out = nn.relu(out)
        out = self.conv2(out)
        out, state = self.bn2(out, state)
        out = nn.relu(out)
        out = self.conv3(out)
        out, state = self.bn3(out, state)
        if self.downsample is not None:
            identity, state = self.downsample(x, state)
        return nn.relu(out + identity), state


class ResNet(Module):
    __stateful__ = True

    conv1: nn.Conv2d
    bn1: Module
    maxpool: nn.MaxPool2d
    layer1: nn.Sequential
    layer2: nn.Sequential
    layer3: nn.Sequential
    layer4: nn.Sequential
    avgpool: nn.AdaptiveAvgPool2d
    fc: Module

    def __init__(
        self,
        block: Union[Type[BasicBlock], Type[Bottleneck]],
        layers: List[int],
        num_classes: int = 1000,
        groups: int = 1,
        width_per_group: int = 64,
        replace_stride_with_dilation: Optional[List[bool]] = None,
        norm_layer: Callable = nn.BatchNorm,
        *,
        key: Optional[jax.Array] = None,
    ):
        key = default_key(key)
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        if len(replace_stride_with_dilation) != 3:
            raise ValueError("replace_stride_with_dilation should have 3 elements")
        self._inplanes = 64
        self._dilation = 1
        self._groups = groups
        self._base_width = width_per_group
        self._norm_layer = norm_layer

        keys = jax.random.split(key, 6)
        self.conv1 = nn.Conv2d(3, self._inplanes, 7, stride=2, padding=3, use_bias=False, key=keys[0])
        self.bn1 = norm_layer(self._inplanes)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0], key=keys[1])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2, dilate=replace_stride_with_dilation[0], key=keys[2])
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2, dilate=replace_stride_with_dilation[1], key=keys[3])
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2, dilate=replace_stride_with_dilation[2], key=keys[4])
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes, key=keys[5])
        # construction-only scratch attributes are not fields and must go
        del self._inplanes, self._dilation, self._groups, self._base_width, self._norm_layer

    def _make_layer(self, block, planes, blocks, stride=1, dilate=False, *, key):
        norm_layer = self._norm_layer
        previous_dilation = self._dilation
        if dilate:
            self._dilation *= stride
            stride = 1
        keys = jax.random.split(key, blocks + 1)
        downsample = None
        if stride != 1 or self._inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                [
                    _conv1x1(self._inplanes, planes * block.expansion, stride, key=keys[blocks]),
                    norm_layer(planes * block.expansion),
                ]
            )
        layers = [
            block(
                self._inplanes, planes, stride, downsample, self._groups,
                self._base_width, previous_dilation, norm_layer, key=keys[0],
            )
        ]
        self._inplanes = planes * block.expansion
        for i in range(1, blocks):
            layers.append(
                block(
                    self._inplanes, planes, groups=self._groups,
                    base_width=self._base_width, dilation=self._dilation,
                    norm_layer=norm_layer, key=keys[i],
                )
            )
        return nn.Sequential(layers)

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        x, single = ensure_nhwc(x)
        x = self.conv1(x)
        x, state = self.bn1(x, state)
        x = nn.relu(x)
        x = self.maxpool(x)
        x, state = self.layer1(x, state)
        x, state = self.layer2(x, state)
        x, state = self.layer3(x, state)
        x, state = self.layer4(x, state)
        x = self.avgpool(x)
        x = nn.flatten_chw(x)
        x = self.fc(x)
        return debatch(x, single), state


def _resnet(block, layers, torch_weights, **kwargs) -> Tuple[ResNet, State]:
    model = ResNet(block, layers, **kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)


def resnet18(torch_weights: Optional[str] = None, **kwargs: Any):
    """ResNet-18 (reference resnet.py:366-378); returns (model, state)."""
    return _resnet(BasicBlock, [2, 2, 2, 2], torch_weights, **kwargs)


def resnet34(torch_weights: Optional[str] = None, **kwargs: Any):
    return _resnet(BasicBlock, [3, 4, 6, 3], torch_weights, **kwargs)


def resnet50(torch_weights: Optional[str] = None, **kwargs: Any):
    return _resnet(Bottleneck, [3, 4, 6, 3], torch_weights, **kwargs)


def resnet101(torch_weights: Optional[str] = None, **kwargs: Any):
    return _resnet(Bottleneck, [3, 4, 23, 3], torch_weights, **kwargs)


def resnet152(torch_weights: Optional[str] = None, **kwargs: Any):
    return _resnet(Bottleneck, [3, 8, 36, 3], torch_weights, **kwargs)


def resnext50_32x4d(torch_weights: Optional[str] = None, **kwargs: Any):
    kwargs.setdefault("groups", 32)
    kwargs.setdefault("width_per_group", 4)
    return _resnet(Bottleneck, [3, 4, 6, 3], torch_weights, **kwargs)


def resnext101_32x8d(torch_weights: Optional[str] = None, **kwargs: Any):
    kwargs.setdefault("groups", 32)
    kwargs.setdefault("width_per_group", 8)
    return _resnet(Bottleneck, [3, 4, 23, 3], torch_weights, **kwargs)


def wide_resnet50_2(torch_weights: Optional[str] = None, **kwargs: Any):
    kwargs.setdefault("width_per_group", 128)
    return _resnet(Bottleneck, [3, 4, 6, 3], torch_weights, **kwargs)


def wide_resnet101_2(torch_weights: Optional[str] = None, **kwargs: Any):
    kwargs.setdefault("width_per_group", 128)
    return _resnet(Bottleneck, [3, 4, 23, 3], torch_weights, **kwargs)
