"""Activation functions (exact torch semantics) and the Lambda wrapper.

All are plain functions usable directly or wrapped in ``Lambda`` for use
inside ``Sequential`` (the reference wrapped them as ``nn.Lambda(jnn.relu)``
etc., e.g. reference alexnet.py:42-58).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.module import Module, static

relu = jax.nn.relu
relu6 = jax.nn.relu6
sigmoid = jax.nn.sigmoid
silu = jax.nn.silu
tanh = jnp.tanh


def gelu(x):
    """Exact (erf) GELU — torch.nn.GELU default. jax.nn.gelu defaults to
    the tanh approximation, which breaks 1e-4 logit parity for ViT/Swin/
    ConvNeXt, so the erf form is written out explicitly. NOT
    ``jax.nn.gelu(x, approximate=False)``: its lowering measured +14 ms
    on ViT-B/16 b256 (+1.2 ms/layer) vs this formula on identical f32
    inputs (scripts/ablate_vit5.py follow-up bisect); the math is
    bit-identical (0.5x and /2 are exact power-of-two scalings)."""
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))


def hard_swish(x):
    """x * relu6(x + 3) / 6 — torch.nn.Hardswish."""
    return x * jax.nn.relu6(x + 3.0) * (1.0 / 6.0)


def hard_sigmoid(x):
    """relu6(x + 3) / 6 — torch.nn.Hardsigmoid."""
    return jax.nn.relu6(x + 3.0) * (1.0 / 6.0)


class Lambda(Module):
    """Wrap a pure function as a layer. ``fn`` is static (hashed by jit)."""

    fn: Callable = static()

    def __init__(self, fn: Callable):
        self.fn = fn

    def __call__(self, x, *, key=None):
        return self.fn(x)


class Identity(Module):
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, x, *, key=None):
        return x
