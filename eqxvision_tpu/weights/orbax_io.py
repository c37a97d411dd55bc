"""Orbax checkpointing for (model, state, opt_state) — sharding-aware.

The npz path (serialize.py) is for single-host portability; this path
handles multi-chip training checkpoints: orbax records each array's
sharding and restores onto the same (or a compatible) mesh without
gathering to host. The reference had no save path at all (SURVEY.md §5
checkpoint/resume).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _require():
    if not _HAS_ORBAX:
        raise RuntimeError("orbax-checkpoint is not installed")


def save_checkpoint(path: str, model: Any, state: Any = None, opt_state: Any = None) -> None:
    """Save a training checkpoint (async-capable orbax StandardSave).

    BN state is re-keyed from construction-counter indices to structural
    paths (see serialize.py) so a checkpoint restores into templates
    built at any counter offset.
    """
    _require()
    from .serialize import state_to_paths

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "model": model,
                "state": state_to_paths(model, state) if state else {},
                "opt_state": opt_state,
            },
            force=True,
        )


def load_checkpoint(path: str, model: Any, state: Any = None, opt_state: Any = None) -> Tuple[Any, Any, Any]:
    """Restore into same-structured (model, state, opt_state) templates,
    preserving each leaf's current sharding."""
    _require()
    from .serialize import state_from_paths, state_to_paths

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            path,
            {
                "model": model,
                "state": state_to_paths(model, state) if state else {},
                "opt_state": opt_state,
            },
        )
    state_out = state_from_paths(restored["model"], restored["state"]) if state else restored["state"]
    return restored["model"], state_out, restored["opt_state"]
