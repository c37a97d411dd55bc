"""Filtered transforms: partition/combine and filter_{jit,grad}.

In this framework model pytree leaves are (by design) exactly the
trainable parameters, so plain ``jax.jit`` / ``jax.grad`` work on models
directly. These helpers exist for API parity with the reference's usage
patterns (``eqx.filter_jit`` / ``eqx.filter_value_and_grad``, reference
README.md:37-46, tests/test_grads.py:34-47) and for user code that mixes
arrays with arbitrary Python values in one tree.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import jax.tree_util as jtu


def is_array(x: Any) -> bool:
    return isinstance(x, (jax.Array, np.ndarray))


def is_inexact_array(x: Any) -> bool:
    return is_array(x) and jnp.issubdtype(x.dtype, jnp.inexact)


class _Missing:
    __slots__ = ()

    def __repr__(self) -> str:
        return "--"


# Registered as an *empty* pytree node: jit flattens sentinels away, so
# the "arrays" half of a partition is a valid jit argument while the
# treedef still records where the missing slots were for combine().
jtu.register_pytree_node(
    _Missing,
    lambda m: ((), None),
    lambda aux, children: _missing,
)

_missing = _Missing()


def partition(tree: Any, filter_fn: Callable[[Any], bool] = is_array):
    """Split a pytree into (matching, rest); non-matching slots hold a
    sentinel so the two halves can be recombined with ``combine``."""
    matching = jtu.tree_map(lambda x: x if filter_fn(x) else _missing, tree)
    rest = jtu.tree_map(lambda x: _missing if filter_fn(x) else x, tree)
    return matching, rest


def combine(*trees: Any) -> Any:
    def pick(*vals: Any) -> Any:
        for v in vals:
            if not isinstance(v, _Missing):
                return v
        return _missing

    return jtu.tree_map(pick, *trees, is_leaf=lambda x: isinstance(x, _Missing))


class _HashableTree:
    """Wrap an arbitrary pytree-of-statics so jit can hash it."""

    __slots__ = ("value", "_hash")

    def __init__(self, value: Any):
        self.value = value
        leaves, treedef = jtu.tree_flatten(value, is_leaf=lambda x: isinstance(x, _Missing))
        try:
            self._hash = hash((treedef, tuple(leaves)))
        except TypeError:
            self._hash = hash(treedef)

    def __hash__(self) -> int:
        return self._hash

    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, _HashableTree):
            return False
        la, ta = jtu.tree_flatten(self.value, is_leaf=lambda x: isinstance(x, _Missing))
        lb, tb = jtu.tree_flatten(other.value, is_leaf=lambda x: isinstance(x, _Missing))
        if ta != tb or len(la) != len(lb):
            return False
        try:
            return all(a == b for a, b in zip(la, lb))
        except Exception:
            return all(a is b for a, b in zip(la, lb))


def filter_jit(fn: Callable = None, **jit_kwargs: Any) -> Callable:
    """jit that traces array leaves and treats everything else as static."""
    if fn is None:
        return functools.partial(filter_jit, **jit_kwargs)

    @functools.partial(jax.jit, static_argnums=1, **jit_kwargs)
    def inner(arrays, static):
        args, kwargs = combine(arrays, static.value)
        return fn(*args, **kwargs)

    @functools.wraps(fn)
    def wrapper(*args: Any, **kwargs: Any):
        arrays, rest = partition((args, kwargs), is_array)
        return inner(arrays, _HashableTree(rest))

    return wrapper


def filter_value_and_grad(fn: Callable = None, *, has_aux: bool = False) -> Callable:
    """value_and_grad w.r.t. the inexact-array leaves of the first arg."""
    if fn is None:
        return functools.partial(filter_value_and_grad, has_aux=has_aux)

    @functools.wraps(fn)
    def wrapper(model: Any, *args: Any, **kwargs: Any):
        diff, rest = partition(model, is_inexact_array)

        def inner(diff_part, *a: Any, **kw: Any):
            return fn(combine(diff_part, rest), *a, **kw)

        value, grad = jax.value_and_grad(inner, has_aux=has_aux)(diff, *args, **kwargs)
        return value, grad

    return wrapper


def filter_grad(fn: Callable = None, *, has_aux: bool = False) -> Callable:
    if fn is None:
        return functools.partial(filter_grad, has_aux=has_aux)
    vag = filter_value_and_grad(fn, has_aux=has_aux)

    @functools.wraps(fn)
    def wrapper(*args: Any, **kwargs: Any):
        value, grad = vag(*args, **kwargs)
        if has_aux:
            return grad, value[1]
        return grad

    return wrapper


def cast_inexact(tree: Any, dtype: Any) -> Any:
    """Cast every floating-point array leaf (params/state) to ``dtype``
    — e.g. bf16 for TPU inference; matmul/conv accumulation stays f32
    via preferred_element_type in the layers."""

    def cast(x: Any) -> Any:
        if is_inexact_array(x):
            return x.astype(dtype)
        return x

    return jtu.tree_map(cast, tree)


def apply_updates(model: Any, updates: Any) -> Any:
    """``model + updates`` over matching array leaves (optax convention);
    ``None`` updates leave the leaf untouched."""

    def add(u: Any, p: Any) -> Any:
        return p if u is None else p + u

    return jtu.tree_map(add, updates, model, is_leaf=lambda x: x is None)
