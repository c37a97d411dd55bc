"""Dense layer. Weight stored (in_features, out_features) so the forward
is a plain ``x @ w`` — the MXU-friendly orientation (torch stores
(out, in) and transposes at run time; the importer transposes once at
load instead)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core import init
from ..core.module import Module, static


class Linear(Module):
    weight: jax.Array  # (in_features, out_features)
    bias: Optional[jax.Array]
    in_features: int = static()
    out_features: int = static()

    def __init__(self, in_features: int, out_features: int, use_bias: bool = True, *, key: jax.Array, dtype=jnp.float32):
        self.in_features = int(in_features)
        self.out_features = int(out_features)
        wkey, bkey = jax.random.split(key)
        self.weight = init.kaiming_uniform(wkey, (in_features, out_features), in_features, dtype=dtype)
        self.bias = init.uniform_fan_in(bkey, (out_features,), in_features, dtype=dtype) if use_bias else None

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        return self.preactivation(x).astype(x.dtype)

    def preactivation(self, x: jax.Array) -> jax.Array:
        """The f32 accumulator (dot + bias) BEFORE the output-dtype cast.

        Nonlinearities applied to this value fuse into the matmul's
        epilogue; applying them after the bf16 cast instead breaks XLA's
        output fusion and forces an extra HBM round-trip of the full
        hidden tensor — measured +14 ms on ViT-B/16 b256 (+1.2 ms/layer,
        one extra read+write of the 310 MB fc1 output per block;
        scripts/ablate_vit5.py step 4a/4b isolation).
        """
        from ..core.precision import accum_dtype

        acc = accum_dtype()
        y = jnp.dot(x, self.weight.astype(x.dtype), preferred_element_type=acc)
        if self.bias is not None:
            y = y + self.bias.astype(acc if acc is not None else y.dtype)
        return y
