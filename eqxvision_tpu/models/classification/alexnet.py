"""AlexNet (one-weird-trick variant), NHWC batched.

Capability parity with reference eqxvision/models/classification/
alexnet.py:14-103 and torchvision.models.alexnet. Unlike the reference
— whose pretrained classifier diverges after adaptive pooling so its
parity test covers only the conv trunk (reference tests/test_alexnet.py:23)
— the NHWC adaptive pool + CHW-ordered flatten here reproduces
torchvision's classifier input exactly, so full-logit parity holds.
"""
from __future__ import annotations

from typing import Any, Optional

import jax

from ...core.module import Module, static
from ...core.state import State, init_state
from ... import nn
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights


class AlexNet(Module):
    __stateful__ = True

    features: nn.Sequential
    avgpool: nn.AdaptiveAvgPool2d
    classifier: nn.Sequential

    def __init__(self, num_classes: int = 1000, dropout: float = 0.5, *, key: Optional[jax.Array] = None):
        key = default_key(key)
        keys = jax.random.split(key, 8)
        self.features = nn.Sequential(
            [
                nn.Conv2d(3, 64, 11, stride=4, padding=2, key=keys[0]),
                nn.Lambda(nn.relu),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(64, 192, 5, padding=2, key=keys[1]),
                nn.Lambda(nn.relu),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(192, 384, 3, padding=1, key=keys[2]),
                nn.Lambda(nn.relu),
                nn.Conv2d(384, 256, 3, padding=1, key=keys[3]),
                nn.Lambda(nn.relu),
                nn.Conv2d(256, 256, 3, padding=1, key=keys[4]),
                nn.Lambda(nn.relu),
                nn.MaxPool2d(3, 2),
            ]
        )
        self.avgpool = nn.AdaptiveAvgPool2d((6, 6))
        self.classifier = nn.Sequential(
            [
                nn.Dropout(dropout),
                nn.Linear(256 * 6 * 6, 4096, key=keys[5]),
                nn.Lambda(nn.relu),
                nn.Dropout(dropout),
                nn.Linear(4096, 4096, key=keys[6]),
                nn.Lambda(nn.relu),
                nn.Linear(4096, num_classes, key=keys[7]),
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


def alexnet(torch_weights: Optional[str] = None, **kwargs: Any):
    """Build AlexNet; returns ``(model, state)``.

    - ``torch_weights``: path/URL of a torchvision checkpoint
      (``CLASSIFICATION_URLS['alexnet']``).
    """
    model = AlexNet(**kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)
