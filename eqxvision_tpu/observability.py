"""Tracing / profiling / NaN-guard utilities.

The reference had none of these (SURVEY.md §5: tracing absent, race
detection structurally unnecessary, metrics nearly nil). Here:

- ``trace(logdir)``: context manager around ``jax.profiler`` for
  TensorBoard-viewable device traces of benchmark/eval loops;
- ``annotate(name)``: named trace span (shows up in the profile);
- ``checked_call``: wraps a model call with ``jax.experimental.checkify``
  float checks so NaN/Inf in any intermediate raises with a location
  instead of silently propagating into the logits.
"""
from __future__ import annotations

import contextlib
from typing import Any, Optional

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def trace(logdir: str = "/tmp/eqxtpu_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def checked_call(model, x, state=None, *, key: Optional[jax.Array] = None) -> Any:
    """Run ``model(x, state)`` under checkify float/NaN checks.

    Returns the model output; raises ``checkify.JaxRuntimeError`` with
    the failing primitive's location on NaN/Inf.
    """

    def fn(m, xx, ss):
        return m(xx, ss, key=key)

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    err, out = jax.jit(checked)(model, x, state)
    err.throw()
    return out
