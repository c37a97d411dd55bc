"""Stochastic depth (DropPath) on batched NHWC inputs.

Reference: layers/drop_path.py:8-61 operated per-sample under vmap;
here the mask is drawn for the whole batch at once:

- ``mode="global"``: one Bernoulli per *sample* — mask (N, 1, ..., 1).
  This is torchvision's ``StochasticDepth(mode="row")``, the semantics
  every torchvision checkpoint was trained with.
- ``mode="local"`` / ``"per_channel"``: per (sample, channel) mask
  (N, 1, ..., C). Note the reference passed ``mode="per_channel"`` in
  EfficientNet (reference efficientnet.py:177) which silently aliased
  "local" (SURVEY.md §8.6); our EfficientNet uses "global" to match
  torchvision training semantics instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.module import Module, static


class DropPath(Module):
    p: float = static()
    inference: bool = static()
    mode: str = static()

    def __init__(self, p: float = 0.0, inference: bool = False, mode: str = "global", **_):
        self.p = float(p)
        self.inference = bool(inference)
        self.mode = str(mode)

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        if self.inference or self.p == 0.0:
            return x
        if key is None:
            raise RuntimeError(
                "DropPath requires `key` when not in inference mode."
            )
        keep = 1.0 - self.p
        if self.mode == "global":
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        else:
            shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        mask = jax.random.bernoulli(key, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
