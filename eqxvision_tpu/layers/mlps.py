"""Transformer/Mixer MLP projection (reference layers/mlps.py:12-66)."""
from __future__ import annotations

from typing import Callable, Optional, Type

import jax

from ..core.module import Module
from ..nn.activations import Lambda, gelu
from ..nn.dropout import Dropout
from ..nn.linear import Linear


class MlpProjection(Module):
    fc1: Linear
    act: Lambda
    drop1: Dropout
    fc2: Linear
    drop2: Dropout

    def __init__(
        self,
        in_features: int,
        hidden_features: Optional[int] = None,
        out_features: Optional[int] = None,
        act_layer: Callable = gelu,
        drop: float = 0.0,
        lin_layer: Type[Linear] = Linear,
        *,
        key: jax.Array,
    ):
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        k1, k2 = jax.random.split(key)
        self.fc1 = lin_layer(in_features, hidden_features, key=k1)
        self.act = Lambda(act_layer)
        self.drop1 = Dropout(drop)
        self.fc2 = lin_layer(hidden_features, out_features, key=k2)
        self.drop2 = Dropout(drop)

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        k1, k2 = (None, None) if key is None else jax.random.split(key)
        if hasattr(self.fc1, "preactivation"):
            # activation on the f32 accumulator fuses into the matmul
            # epilogue (nn/linear.py preactivation — +14 ms on ViT-B/16
            # b256 if applied post-cast instead); duck-typed so
            # quantize.QuantLinear keeps the fusion
            h = self.act(self.fc1.preactivation(x)).astype(x.dtype)
        else:
            h = self.act(self.fc1(x))
        x = self.drop1(h, key=k1)
        x = self.fc2(x)
        return self.drop2(x, key=k2)
