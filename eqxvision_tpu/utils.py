"""Utility surface mirroring reference eqxvision/utils.py.

``load_torch_weights`` and the URL registries live in ``weights/`` and
are re-exported here so reference-style imports keep working:

    from eqxvision_tpu.utils import load_torch_weights, CLASSIFICATION_URLS
"""
from __future__ import annotations


def _make_divisible(v: float, divisor: int = 8, min_value: int = None) -> int:
    """TF-slim channel rounding used by all mobile nets (reference
    utils.py:104-117): round to nearest multiple of ``divisor``, never
    going below 90% of the original value."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


from .weights.urls import CLASSIFICATION_URLS, SEGMENTATION_URLS  # noqa: E402
from .weights.torch_import import load_torch_weights  # noqa: E402

__all__ = [
    "_make_divisible",
    "CLASSIFICATION_URLS",
    "SEGMENTATION_URLS",
    "load_torch_weights",
]
