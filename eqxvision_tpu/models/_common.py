"""Shared model plumbing.

Input contract: models natively take batched NHWC ``(N, H, W, C)``.
For drop-in compatibility with the reference's per-sample convention
(unbatched ``(C, H, W)`` + optional vmap, reference README.md:37-46),
a 3-D input is interpreted as one CHW sample: transposed, batched,
and the output unbatched again.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.state import State
from ..weights.torch_import import load_torch_weights


def ensure_nhwc(x: jax.Array) -> Tuple[jax.Array, bool]:
    """Accept (N,H,W,C) or a single (C,H,W) sample; return NHWC + flag."""
    if x.ndim == 3:
        return jnp.transpose(x, (1, 2, 0))[None], True
    if x.ndim != 4:
        raise ValueError(f"expected (N,H,W,C) or (C,H,W) input, got shape {x.shape}")
    return x, False


def debatch(out, was_single: bool):
    if not was_single:
        return out
    if isinstance(out, tuple):
        return tuple(debatch(o, True) for o in out)
    return None if out is None else out[0]


def maybe_load_torch_weights(model, state: State, torch_weights: Optional[str], **kw):
    """Factory tail: route ``torch_weights=`` through the importer
    (reference contract: every factory accepts a path or URL,
    reference alexnet.py:92-103)."""
    if torch_weights is not None:
        model, state = load_torch_weights(model, torch_weights, state, **kw)
    return model, state


def default_key(key: Optional[jax.Array]) -> jax.Array:
    """Reference behavior: omitted key means deterministic PRNGKey(0)
    (reference SURVEY.md §2.3)."""
    return jax.random.PRNGKey(0) if key is None else key
