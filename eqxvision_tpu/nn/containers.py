"""Sequential container threading functional state and PRNG keys."""
from __future__ import annotations

from typing import Sequence

import jax

from ..core.module import Module
from ..core.state import State


class Sequential(Module):
    """Applies layers in order.

    Stateful layers/submodels (``__stateful__ = True``) are called as
    ``x, state = layer(x, state, key=k)``; pure layers as
    ``x = layer(x, key=k)``. When a key is given it is split once per
    layer so stochastic layers are decorrelated.
    """

    __stateful__ = True

    layers: tuple

    def __init__(self, layers: Sequence):
        self.layers = tuple(layers)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return Sequential(self.layers[i])
        return self.layers[i]

    def __len__(self):
        return len(self.layers)

    def __iter__(self):
        return iter(self.layers)

    def __call__(self, x, state: State = None, *, key=None):
        keys = (
            jax.random.split(key, len(self.layers)) if key is not None else [None] * len(self.layers)
        )
        for layer, k in zip(self.layers, keys):
            if getattr(type(layer), "__stateful__", False):
                x, state = layer(x, state, key=k)
            else:
                x = layer(x, key=k)
        return x, state
