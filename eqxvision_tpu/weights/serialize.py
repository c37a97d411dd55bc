"""Native save/load for (model, state) pairs.

The reference had no save path at all (SURVEY.md §5 checkpoint/resume:
users fell back to equinox serialisation). Here: a single ``.npz`` holds
every array leaf of the model plus the BN running stats, keyed by pytree
path — portable, inspectable, no pickle.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from ..core.state import State


def _flatten_with_paths(tree: Any):
    leaves, _ = jtu.tree_flatten_with_path(tree)
    return [(jtu.keystr(path), leaf) for path, leaf in leaves]


def save_model(path: str, model: Any, state: Optional[State] = None) -> None:
    arrays = {}
    for key, leaf in _flatten_with_paths(model):
        if isinstance(leaf, (jax.Array, np.ndarray)):
            arrays["m:" + key] = np.asarray(leaf)
    if state:
        for idx, val in state.items():
            for j, arr in enumerate(jtu.tree_leaves(val)):
                arrays[f"s:{idx}:{j}"] = np.asarray(arr)
    np.savez(path, **arrays)


def load_model(path: str, model: Any, state: Optional[State] = None) -> Tuple[Any, State]:
    """Load arrays saved by ``save_model`` into same-structured model/state."""
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
        for idx, val in state.items():
            leaves, treedef = jtu.tree_flatten(val)
            new_leaves = [
                jnp.asarray(stored[f"s:{idx}:{j}"]) if f"s:{idx}:{j}" in stored else leaf
                for j, leaf in enumerate(leaves)
            ]
            new_state[idx] = jtu.tree_unflatten(treedef, new_leaves)
    return model, new_state
