"""Generic segmentation wrapper (reference segmentation/_utils.py:10-60).

``__call__`` returns ``((aux_or_None, out), state)`` with both maps
bilinearly upsampled to the input resolution (align_corners=False /
half-pixel-centers semantics, matching torch F.interpolate and the
reference's jax.image.resize usage at _utils.py:51-52).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Module
from ...core.state import State
from .._common import debatch, ensure_nhwc


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """NHWC bilinear resize, half-pixel centers (torch align_corners=False)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, height, width, c), method="bilinear")


class _SimpleSegmentationModel(Module):
    __stateful__ = True

    backbone: Module  # an IntermediateLayerGetter
    classifier: Module
    aux_classifier: Optional[Module]

    def __init__(self, backbone, classifier, aux_classifier=None):
        self.backbone = backbone
        self.classifier = classifier
        self.aux_classifier = aux_classifier

    def __call__(self, x: jax.Array, state: State = None, *, key=None):
        x, single = ensure_nhwc(x)
        keys = [None] * 3 if key is None else list(jax.random.split(key, 3))
        (_, xs), state = self.backbone(x, state, key=keys[0])

        out, state = self.classifier(xs[-1], state, key=keys[1])
        out = resize_bilinear(out, x.shape[1], x.shape[2])

        if self.aux_classifier is not None:
            aux, state = self.aux_classifier(xs[0], state, key=keys[2])
            aux = resize_bilinear(aux, x.shape[1], x.shape[2])
            return debatch((aux, out), single), state
        return debatch((None, out), single), state
