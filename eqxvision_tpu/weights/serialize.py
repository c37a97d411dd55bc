"""Native save/load for (model, state) pairs.

The reference had no save path at all (SURVEY.md §5 checkpoint/resume:
users fell back to equinox serialisation). Here: a single ``.npz`` holds
every array leaf of the model plus the BN running stats, keyed by pytree
path — portable, inspectable, no pickle.

State keying: running statistics are stored under the *structural path*
of their stateful layer (``s:.layer1[0].bn1:0``), NOT the process-global
construction counter that indexes the in-memory ``State`` dict. Counter
values depend on how many stateful models were built earlier in the
process, so a checkpoint written by one process would silently miss
every state entry when loaded into a template built at a different
counter offset. Path keys are invariant; a missing stored entry is an
error, never a silent fallback to the template's init stats.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from ..core.module import iter_modules_with_path
from ..core.state import State, StatefulLayer


def _flatten_with_paths(tree: Any):
    leaves, _ = jtu.tree_flatten_with_path(tree)
    return [(jtu.keystr(path), leaf) for path, leaf in leaves]


def _state_paths(model: Any) -> Dict[int, str]:
    """Map each stateful layer's State-dict index to its structural path."""
    mapping: Dict[int, str] = {}
    for path, m in iter_modules_with_path(model):
        if isinstance(m, StatefulLayer):
            mapping[m.index] = path
    return mapping


def state_to_paths(model: Any, state: State) -> Dict[str, Any]:
    """Re-key a State dict from construction-counter indices to paths."""
    paths = _state_paths(model)
    return {paths[idx]: val for idx, val in state.items()}


def state_from_paths(model: Any, by_path: Dict[str, Any]) -> State:
    """Inverse of ``state_to_paths`` for a same-structured model."""
    paths = _state_paths(model)
    missing = [p for p in paths.values() if p not in by_path]
    if missing:
        raise KeyError(f"restored state is missing entries for layers at {missing}")
    return {idx: by_path[p] for idx, p in paths.items()}


def save_model(path: str, model: Any, state: Optional[State] = None) -> None:
    arrays = {}
    for key, leaf in _flatten_with_paths(model):
        if isinstance(leaf, (jax.Array, np.ndarray)):
            arrays["m:" + key] = np.asarray(leaf)
    if state:
        paths = _state_paths(model)
        for idx, val in state.items():
            if idx not in paths:
                raise KeyError(
                    f"state index {idx} has no stateful layer in the model; "
                    "save_model must be called with the model the state belongs to"
                )
            for j, arr in enumerate(jtu.tree_leaves(val)):
                arrays[f"s:{paths[idx]}:{j}"] = np.asarray(arr)
    np.savez(path, **arrays)


def load_model(path: str, model: Any, state: Optional[State] = None) -> Tuple[Any, State]:
    """Load arrays saved by ``save_model`` into same-structured model/state.

    ``model``/``state`` are templates (e.g. a fresh factory call). Raises
    if the checkpoint lacks a state entry the template expects — silent
    init-stat fallback was the round-1 bug this replaces (ADVICE.md r1).
    """
    with np.load(path) as data:
        stored = dict(data.items())

    def fill(keypath, leaf):
        key = "m:" + jtu.keystr(keypath)
        if isinstance(leaf, (jax.Array, np.ndarray)) and key in stored:
            arr = stored[key]
            if arr.shape != leaf.shape:
                raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {leaf.shape}")
            return jnp.asarray(arr, leaf.dtype)
        return leaf

    model = jtu.tree_map_with_path(fill, model)
    new_state: State = {}
    if state is not None:
        has_stored_state = any(k.startswith("s:") for k in stored)
        paths = _state_paths(model)
        for idx, val in state.items():
            leaves, treedef = jtu.tree_flatten(val)
            spath = paths.get(idx)
            keys = [f"s:{spath}:{j}" for j in range(len(leaves))]
            if has_stored_state:
                missing = [k for k in keys if k not in stored]
                if spath is None or missing:
                    raise KeyError(
                        f"checkpoint {path!r} is missing state entries "
                        f"{missing or idx} for stateful layer at {spath!r}"
                    )
                new_leaves = [jnp.asarray(stored[k]) for k in keys]
            else:
                new_leaves = leaves  # checkpoint saved without state
            new_state[idx] = jtu.tree_unflatten(treedef, new_leaves)
    return model, new_state
