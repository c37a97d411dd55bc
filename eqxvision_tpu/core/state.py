"""Explicit functional state for stateful layers (BatchNorm running stats).

The reference stored BatchNorm running statistics in
``eqx.experimental.StateIndex`` leaves mutated through a side channel
(reference eqxvision/utils.py:203-218) — an API that no longer exists in
modern equinox (SURVEY.md §8.11). Here state is a first-class value:

    model = resnet50()
    state = init_state(model)                  # {index: (mean, var)}
    logits, state = model(x, state)            # training: stats updated
    model_inf = tree_inference(model, True)
    logits, _ = model_inf(x, state)            # eval: running stats read

``State`` is a plain dict pytree keyed by per-layer integer indices
assigned at construction time, so it jits/shards/serialises like any
other pytree.
"""
from __future__ import annotations

import itertools
from typing import Any, Dict

from .module import Module, iter_modules

# Global monotonically increasing id for stateful layers. Assigned at
# module construction (always outside jit), so trace-safety is not a
# concern; state dicts are built per-model by walking that model.
_state_counter = itertools.count()

State = Dict[int, Any]


def next_state_index() -> int:
    return next(_state_counter)


class StatefulLayer(Module):
    """Mixin marker: layers with running state (index field required)."""

    __stateful__ = True

    def initial_state(self) -> Any:  # pragma: no cover - abstract
        raise NotImplementedError


def init_state(model: Any) -> State:
    """Walk the model and collect each stateful layer's initial state."""
    state: State = {}
    for m in iter_modules(model):
        if isinstance(m, StatefulLayer):
            state[m.index] = m.initial_state()
    return state
