"""Trace-time accumulation-precision control.

Layers bind their matmul/conv primitives with
``preferred_element_type=accum_dtype()`` — f32 by default, which makes
bf16 inference accumulate and emit f32 (fused epilogues consume the f32
accumulator, CLAUDE.md gelu finding). Under MIXED-PRECISION TRAINING
that f32 output preference breaks conv differentiation: the transpose
rule feeds the f32 cotangent back into a conv against bf16 primals and
JAX rejects the dtype mix. ``accum_dtype(None)`` scoped around the
train step's forward+backward drops the preference — TPU MXU still
accumulates bf16 convs/matmuls in f32 internally; only the OUTPUT
rounds to bf16, which is standard mixed-precision behavior.

This is trace-time Python state (a context manager around traced
calls), not a runtime value: every primitive bound inside the scope
records the preference in its jaxpr params, so transpose rules applied
later see a consistent choice.
"""
from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax.numpy as jnp

_STATE = threading.local()


def accum_dtype():
    """The preferred_element_type layers should bind right now."""
    return getattr(_STATE, "dtype", jnp.float32)


@contextlib.contextmanager
def accum_precision(dtype: Optional[jnp.dtype]):
    """Scope a different accumulation OUTPUT preference (None = let the
    output follow the input dtype; MXU-internal accumulation stays f32
    for bf16 inputs either way).

    The state is thread-local (concurrent traces from other threads see
    the f32 default), but within a thread it is ambient trace-time
    state: any UNRELATED function first-traced while a scope is open
    (e.g. an inference jit first called inside a mixed-precision train
    step's trace window) bakes the scoped preference into its jaxpr.
    Trace such functions outside the scope, or re-jit them.
    """
    old = getattr(_STATE, "dtype", jnp.float32)
    _STATE.dtype = dtype
    try:
        yield
    finally:
        _STATE.dtype = old
