"""Dropout (inverted scaling, torch semantics)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.module import Module, static


class Dropout(Module):
    p: float = static()
    inference: bool = static()

    def __init__(self, p: float = 0.5, inference: bool = False, **_):
        self.p = float(p)
        self.inference = bool(inference)

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        if self.inference or self.p == 0.0:
            return x
        if key is None:
            raise RuntimeError(
                "Dropout requires `key` when not in inference mode "
                "(call tree_inference(model, True) for eval)."
            )
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
