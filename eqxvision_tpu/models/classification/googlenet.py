"""GoogLeNet (Inception v1), NHWC batched.

Capability parity with reference eqxvision/models/classification/
googlenet.py:15-335 and torchvision.models.googlenet, including the
torchvision quirks pretrained weights depend on: the "5x5" inception
branch actually uses 3x3 convs, BasicConv2d's BN uses eps=1e-3, and
``transform_input`` re-normalizes ImageNet-normalized inputs to the
0.5/0.5 scheme the original training used. The reference's PRNG
over-indexing bug (reference googlenet.py:127,166,173, SURVEY.md §8.2)
does not arise here: keys are split per consumer.

Field declaration order mirrors torchvision registration order —
aux1/aux2 sit between inception5b and fc in the checkpoint.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ...core.module import Module, static
from ...core.state import State, init_state
from ... import nn
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights


class BasicConv2d(Module):
    __stateful__ = True

    conv: nn.Conv2d
    bn: nn.BatchNorm

    def __init__(self, in_channels, out_channels, *, key, **conv_kwargs):
        self.conv = nn.Conv2d(in_channels, out_channels, use_bias=False, key=key, **conv_kwargs)
        self.bn = nn.BatchNorm(out_channels, eps=1e-3)

    def __call__(self, x, state, *, key=None):
        x, state = self.bn(self.conv(x), state)
        return nn.relu(x), state


class _Inception(Module):
    __stateful__ = True

    branch1: BasicConv2d
    branch2: nn.Sequential
    branch3: nn.Sequential
    branch4: nn.Sequential

    def __init__(self, in_channels, ch1x1, ch3x3red, ch3x3, ch5x5red, ch5x5, pool_proj, *, key):
        keys = jax.random.split(key, 6)
        self.branch1 = BasicConv2d(in_channels, ch1x1, kernel_size=1, key=keys[0])
        self.branch2 = nn.Sequential(
            [
                BasicConv2d(in_channels, ch3x3red, kernel_size=1, key=keys[1]),
                BasicConv2d(ch3x3red, ch3x3, kernel_size=3, padding=1, key=keys[2]),
            ]
        )
        # torchvision quirk: named 5x5, actually 3x3 (pretrained weights
        # have this shape)
        self.branch3 = nn.Sequential(
            [
                BasicConv2d(in_channels, ch5x5red, kernel_size=1, key=keys[3]),
                BasicConv2d(ch5x5red, ch5x5, kernel_size=3, padding=1, key=keys[4]),
            ]
        )
        self.branch4 = nn.Sequential(
            [
                nn.MaxPool2d(3, 1, 1, use_ceil=True),
                BasicConv2d(in_channels, pool_proj, kernel_size=1, key=keys[5]),
            ]
        )

    def __call__(self, x, state, *, key=None):
        b1, state = self.branch1(x, state)
        b2, state = self.branch2(x, state)
        b3, state = self.branch3(x, state)
        b4, state = self.branch4(x, state)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1), state


class InceptionAux(Module):
    __stateful__ = True

    conv: BasicConv2d
    fc1: nn.Linear
    fc2: nn.Linear
    dropout: nn.Dropout

    def __init__(self, in_channels, num_classes, dropout: float = 0.7, *, key):
        k1, k2, k3 = jax.random.split(key, 3)
        self.conv = BasicConv2d(in_channels, 128, kernel_size=1, key=k1)
        self.fc1 = nn.Linear(2048, 1024, key=k2)
        self.fc2 = nn.Linear(1024, num_classes, key=k3)
        self.dropout = nn.Dropout(dropout)

    def __call__(self, x, state, *, key=None):
        x = nn.adaptive_avg_pool2d(x, (4, 4))
        x, state = self.conv(x, state)
        x = nn.flatten_chw(x)
        x = nn.relu(self.fc1(x))
        x = self.dropout(x, key=key)
        return self.fc2(x), state


class GoogLeNet(Module):
    __stateful__ = True

    conv1: BasicConv2d
    maxpool1: nn.MaxPool2d
    conv2: BasicConv2d
    conv3: BasicConv2d
    maxpool2: nn.MaxPool2d
    inception3a: _Inception
    inception3b: _Inception
    maxpool3: nn.MaxPool2d
    inception4a: _Inception
    inception4b: _Inception
    inception4c: _Inception
    inception4d: _Inception
    inception4e: _Inception
    maxpool4: nn.MaxPool2d
    inception5a: _Inception
    inception5b: _Inception
    aux1: Optional[InceptionAux]
    aux2: Optional[InceptionAux]
    dropout: nn.Dropout
    fc: nn.Linear
    aux_logits: bool = static()
    transform_input: bool = static()
    inference: bool = static()

    def __init__(
        self,
        num_classes: int = 1000,
        aux_logits: bool = True,
        transform_input: bool = False,
        dropout: float = 0.2,
        dropout_aux: float = 0.7,
        *,
        key: Optional[jax.Array] = None,
    ):
        key = default_key(key)
        keys = jax.random.split(key, 18)
        self.aux_logits = bool(aux_logits)
        self.transform_input = bool(transform_input)
        self.inference = False

        self.conv1 = BasicConv2d(3, 64, kernel_size=7, stride=2, padding=3, key=keys[0])
        self.maxpool1 = nn.MaxPool2d(3, 2, use_ceil=True)
        self.conv2 = BasicConv2d(64, 64, kernel_size=1, key=keys[1])
        self.conv3 = BasicConv2d(64, 192, kernel_size=3, padding=1, key=keys[2])
        self.maxpool2 = nn.MaxPool2d(3, 2, use_ceil=True)
        self.inception3a = _Inception(192, 64, 96, 128, 16, 32, 32, key=keys[3])
        self.inception3b = _Inception(256, 128, 128, 192, 32, 96, 64, key=keys[4])
        self.maxpool3 = nn.MaxPool2d(3, 2, use_ceil=True)
        self.inception4a = _Inception(480, 192, 96, 208, 16, 48, 64, key=keys[5])
        self.inception4b = _Inception(512, 160, 112, 224, 24, 64, 64, key=keys[6])
        self.inception4c = _Inception(512, 128, 128, 256, 24, 64, 64, key=keys[7])
        self.inception4d = _Inception(512, 112, 144, 288, 32, 64, 64, key=keys[8])
        self.inception4e = _Inception(528, 256, 160, 320, 32, 128, 128, key=keys[9])
        self.maxpool4 = nn.MaxPool2d(2, 2, use_ceil=True)
        self.inception5a = _Inception(832, 256, 160, 320, 32, 128, 128, key=keys[10])
        self.inception5b = _Inception(832, 384, 192, 384, 48, 128, 128, key=keys[11])
        if aux_logits:
            self.aux1 = InceptionAux(512, num_classes, dropout_aux, key=keys[12])
            self.aux2 = InceptionAux(528, num_classes, dropout_aux, key=keys[13])
        else:
            self.aux1 = None
            self.aux2 = None
        self.dropout = nn.Dropout(dropout)
        self.fc = nn.Linear(1024, num_classes, key=keys[14])

    def _transform_input(self, x):
        # channels-last: x[..., c]
        ch0 = x[..., 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
        ch1 = x[..., 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
        ch2 = x[..., 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
        return jnp.stack([ch0, ch1, ch2], axis=-1)

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        x, single = ensure_nhwc(x)
        if self.transform_input:
            x = self._transform_input(x)
        k_aux1, k_aux2, k_drop = (
            (None, None, None) if key is None else jax.random.split(key, 3)
        )
        x, state = self.conv1(x, state)
        x = self.maxpool1(x)
        x, state = self.conv2(x, state)
        x, state = self.conv3(x, state)
        x = self.maxpool2(x)
        x, state = self.inception3a(x, state)
        x, state = self.inception3b(x, state)
        x = self.maxpool3(x)
        x, state = self.inception4a(x, state)
        aux1 = None
        if self.aux1 is not None and not self.inference:
            aux1, state = self.aux1(x, state, key=k_aux1)
        x, state = self.inception4b(x, state)
        x, state = self.inception4c(x, state)
        x, state = self.inception4d(x, state)
        aux2 = None
        if self.aux2 is not None and not self.inference:
            aux2, state = self.aux2(x, state, key=k_aux2)
        x, state = self.inception4e(x, state)
        x = self.maxpool4(x)
        x, state = self.inception5a(x, state)
        x, state = self.inception5b(x, state)
        x = nn.adaptive_avg_pool2d(x, (1, 1))
        x = nn.flatten_chw(x)
        x = self.dropout(x, key=k_drop)
        logits = self.fc(x)
        if self.inference or not self.aux_logits:
            return debatch(logits, single), state
        return debatch((logits, aux2, aux1), single), state


def googlenet(torch_weights: Optional[str] = None, **kwargs: Any):
    """GoogLeNet factory (reference googlenet.py:313-335); returns
    (model, state).

    When loading torchvision weights the model must be built with aux
    branches (the checkpoint contains them) and ``transform_input=True``
    (torchvision sets it for pretrained) — both default on here when
    ``torch_weights`` is given, matching the reference's aux dance
    (reference googlenet.py:323-332).
    """
    if torch_weights is not None:
        kwargs.setdefault("aux_logits", True)
        kwargs.setdefault("transform_input", True)
    model = GoogLeNet(**kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)
