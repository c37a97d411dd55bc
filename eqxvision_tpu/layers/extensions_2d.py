"""LayerNorm2d / Linear2d — trivial in NHWC.

The reference needed reshape/vmap gymnastics to apply channelwise
LayerNorm and positionwise Linear to CHW maps (reference
layers/extensions_2d.py:9-50). In NHWC both are just "operate on the
last axis", which is exactly what nn.LayerNorm / nn.Linear already do —
these subclasses exist to keep the reference's vocabulary (and give the
importer distinct types to map ConvNeXt checkpoints onto).
"""
from __future__ import annotations

from ..nn.linear import Linear
from ..nn.norm import LayerNorm


class LayerNorm2d(LayerNorm):
    """Channelwise LayerNorm over NHWC maps: LayerNorm on axis -1."""


class Linear2d(Linear):
    """Per-position (1x1-conv-equivalent) Linear over NHWC maps."""
