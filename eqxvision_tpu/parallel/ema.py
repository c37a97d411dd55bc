"""Exponential moving average of model parameters.

The reference has no EMA (its training shape is one optax step in a
test, reference tests/test_grads.py:32-66), but the checkpoints it
imports were trained WITH it — torchvision's EfficientNet/ViT/Swin
recipes all average weights (torchvision references the timm ModelEma
recipe). For training on TPU the EMA is a pure pytree map that jit
fuses into the step — no host sync, no copies beyond one shadow pytree
(sharded like the params, so under a mesh the update is fully local).

    ema = ema_init(model)
    model, ..., = step(...)
    ema = ema_update(ema, model, decay=0.9999)      # inside jit
    eval_model = ema_params(ema, model)             # swap for eval

``ema_update`` also accepts ``step`` for timm-style warmup
(``decay * (1+step)/(10+step)``) so early training isn't frozen by a
near-1 decay.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def _is_inexact(x: Any) -> bool:
    return isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.inexact)


def ema_init(model: Any) -> Any:
    """Shadow pytree: a copy of every inexact array leaf, ``None``
    elsewhere (static fields / integer buffers are not averaged).

    Leaves are real copies, not aliases: the jitted train step donates
    the model buffers (make_train_step ``donate=True``), and an aliased
    shadow would be invalidated by the first step."""
    return jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True) if _is_inexact(x) else None, model
    )


def ema_update(
    ema: Any, model: Any, decay: float = 0.9999, step: Optional[jax.Array] = None
) -> Any:
    """One EMA step: ``ema = decay * ema + (1-decay) * param``.

    With ``step`` given, the effective decay ramps in as
    ``decay * (1 + step) / (10 + step)`` (timm ModelEmaV2 warmup).
    Pure function of pytrees — call it inside the jitted train step.
    """
    d = jnp.asarray(decay, jnp.float32)
    if step is not None:
        s = jnp.asarray(step, jnp.float32)
        d = d * (1.0 + s) / (10.0 + s)

    def upd(e, p):
        if e is None or not _is_inexact(p):
            return None
        pf = p.astype(jnp.float32)
        return (e.astype(jnp.float32) * d + pf * (1.0 - d)).astype(e.dtype)

    return jax.tree_util.tree_map(upd, ema, model, is_leaf=lambda x: x is None)


def ema_params(ema: Any, model: Any) -> Any:
    """Rebuild a full model pytree with EMA values in place of the
    averaged leaves (non-averaged leaves come from ``model``)."""
    return jax.tree_util.tree_map(
        lambda e, p: p if e is None else e, ema, model, is_leaf=lambda x: x is None
    )
