"""Parameter initializers.

Defaults match PyTorch's layer initializers so from-scratch training of
imported architectures behaves like torchvision (the reference inherited
equinox's inits instead; pretrained parity is unaffected either way
because ``torch_weights=`` overwrites everything).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform(key, shape, fan_in: int, *, a: float = math.sqrt(5.0), dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_(a=sqrt(5)) — the Conv2d/Linear
    weight default: U(-b, b) with b = sqrt(6 / ((1 + a^2) * fan_in))."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def uniform_fan_in(key, shape, fan_in: int, *, dtype=jnp.float32):
    """torch bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_normal(key, shape, fan, *, nonlinearity: str = "relu", dtype=jnp.float32):
    gain = math.sqrt(2.0) if nonlinearity == "relu" else 1.0
    std = gain / math.sqrt(fan)
    return std * jax.random.normal(key, shape, dtype)


def trunc_normal(key, shape, *, std: float = 0.02, mean: float = 0.0, lower: float = -2.0, upper: float = 2.0, dtype=jnp.float32):
    """Truncated normal (timm-style, std 0.02 for ViT tokens/pos-embed).

    Note the reference's Swin v1 relative-position-bias init passed
    ``lower=2, upper=2`` producing a degenerate constant (reference
    swin.py:304-312, SURVEY.md §8.3); this implementation uses proper
    bounds.
    """
    x = jax.random.truncated_normal(key, lower, upper, shape, dtype)
    return x * std + mean


def normal(key, shape, *, std: float = 0.01, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
