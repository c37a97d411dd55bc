"""Minimal pytree module system.

Every neural-net component is a ``Module``: a Python class whose instances
are JAX pytrees. Fields are declared with class-level type annotations
(dataclass style). Fields holding arrays / sub-modules are pytree
*children*; fields marked ``static()`` are part of the treedef (they are
hashed by ``jax.jit`` and must be hashable — use tuples, not lists).

This plays the role equinox's ``eqx.Module`` plays for the reference
(reference models subclass ``eqx.Module`` throughout, e.g. reference
eqxvision/models/classification/alexnet.py:14), but is ~150 lines, owned
by this repo, and designed so that **model pytree leaves are exactly the
trainable parameters**: all configuration is static, and BatchNorm
running statistics live in a separate ``State`` (see state.py). That
makes ``jax.jit``/``jax.grad``/``optax`` work directly on models with no
filtering required in the common path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, TypeVar

import jax.tree_util as jtu

_STATIC_KEY = "__eqxtpu_static__"

M = TypeVar("M", bound="Module")


def static(default: Any = dataclasses.MISSING, *, default_factory: Any = dataclasses.MISSING, **kwargs: Any):
    """Declare a static (treedef / non-leaf) field on a Module."""
    metadata = dict(kwargs.pop("metadata", None) or {})
    metadata[_STATIC_KEY] = True
    if default_factory is not dataclasses.MISSING:
        return dataclasses.field(default_factory=default_factory, metadata=metadata, **kwargs)
    if default is not dataclasses.MISSING:
        return dataclasses.field(default=default, metadata=metadata, **kwargs)
    return dataclasses.field(metadata=metadata, **kwargs)


def field(default: Any = dataclasses.MISSING, *, default_factory: Any = dataclasses.MISSING, **kwargs: Any):
    """Declare a dynamic (pytree child) field on a Module."""
    if default_factory is not dataclasses.MISSING:
        return dataclasses.field(default_factory=default_factory, **kwargs)
    if default is not dataclasses.MISSING:
        return dataclasses.field(default=default, **kwargs)
    return dataclasses.field(**kwargs)


class Module:
    """Base class: subclasses become dataclasses registered as pytrees.

    A user-defined ``__init__`` in the class body takes precedence over
    the dataclass-generated one (``dataclasses`` never overwrites methods
    defined in the class body), so complex modules can build their
    sub-layers from a PRNG key imperatively.

    Class attributes understood by the framework:
      ``__stateful__``: True if ``__call__`` has signature
          ``(x, state, *, key=None) -> (y, state)`` (containers, models,
          BatchNorm). False for pure layers ``(x, *, key=None) -> y``.
    """

    __stateful__: bool = False

    def __init_subclass__(cls, **kwargs: Any):
        super().__init_subclass__(**kwargs)
        # init=False: __init__ must be user-defined (or inherited from a
        # parent Module). Letting dataclass generate one would *shadow*
        # an inherited custom __init__ on subclasses with no body of
        # their own (e.g. LayerNorm2d(LayerNorm)).
        dataclasses.dataclass(cls, eq=False, repr=False, init=False)
        fields = dataclasses.fields(cls)
        data_fields = tuple(f.name for f in fields if not f.metadata.get(_STATIC_KEY))
        static_fields = tuple(f.name for f in fields if f.metadata.get(_STATIC_KEY))
        cls.__data_fields__ = data_fields
        cls.__static_fields__ = static_fields

        def flatten_with_keys(obj: Module):
            children = tuple(
                (jtu.GetAttrKey(name), getattr(obj, name)) for name in data_fields
            )
            aux = tuple(getattr(obj, name) for name in static_fields)
            return children, aux

        def flatten(obj: Module):
            children = tuple(getattr(obj, name) for name in data_fields)
            aux = tuple(getattr(obj, name) for name in static_fields)
            return children, aux

        def unflatten(aux: tuple, children: tuple) -> Module:
            obj = object.__new__(cls)
            for name, value in zip(data_fields, children):
                object.__setattr__(obj, name, value)
            for name, value in zip(static_fields, aux):
                object.__setattr__(obj, name, value)
            return obj

        jtu.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)

    def __repr__(self) -> str:  # concise, non-recursive into arrays
        parts = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name, None)
            if hasattr(v, "shape") and hasattr(v, "dtype"):
                parts.append(f"{f.name}={v.dtype}{list(v.shape)}")
            elif isinstance(v, Module):
                parts.append(f"{f.name}={type(v).__name__}(...)")
            elif isinstance(v, (tuple, list)) and len(v) > 4:
                parts.append(f"{f.name}=<{len(v)} items>")
            else:
                parts.append(f"{f.name}={v!r}")
        return f"{type(self).__name__}({', '.join(parts)})"


def replace(module: M, **changes: Any) -> M:
    """Out-of-place field replacement (works for static and data fields)."""
    cls = type(module)
    obj = object.__new__(cls)
    for f in dataclasses.fields(cls):
        object.__setattr__(obj, f.name, changes.pop(f.name, getattr(module, f.name)))
    if changes:
        raise TypeError(f"{cls.__name__} has no fields {sorted(changes)}")
    return obj


def _map_module_tree(fn: Callable[[Any], Any], node: Any) -> Any:
    """Recursively rebuild a tree of Modules/containers, applying ``fn``
    to each Module *after* recursing into its children. Non-module leaves
    are returned untouched."""
    if isinstance(node, Module):
        changes = {}
        for f in dataclasses.fields(node):
            old = getattr(node, f.name)
            new = _map_module_tree(fn, old)
            if new is not old:
                changes[f.name] = new
        rebuilt = replace(node, **changes) if changes else node
        return fn(rebuilt)
    if isinstance(node, tuple):
        new = tuple(_map_module_tree(fn, x) for x in node)
        return new if any(a is not b for a, b in zip(new, node)) else node
    if isinstance(node, list):
        return [_map_module_tree(fn, x) for x in node]
    if isinstance(node, dict):
        return {k: _map_module_tree(fn, v) for k, v in node.items()}
    return node


def tree_inference(model: M, value: bool = True) -> M:
    """Return a copy of ``model`` with every ``inference: bool`` field set.

    Replaces the reference's ``eqx.tree_inference`` switch (reference
    README.md:64): flips Dropout / DropPath / BatchNorm between train and
    eval behavior. ``inference`` is a static field, so flipping it
    triggers (correctly) a fresh trace under jit.
    """

    def fn(m: Module) -> Module:
        if "inference" in getattr(m, "__static_fields__", ()) and isinstance(
            getattr(m, "inference", None), bool
        ):
            return replace(m, inference=value)
        return m

    return _map_module_tree(fn, model)


def iter_modules(node: Any):
    """Yield every Module in the tree, parents before children, in field
    declaration order. This order is the contract the torch-weight
    importer relies on (see weights/torch_import.py)."""
    if isinstance(node, Module):
        yield node
        for name in type(node).__data_fields__:
            yield from iter_modules(getattr(node, name))
    elif isinstance(node, (tuple, list)):
        for x in node:
            yield from iter_modules(x)
    elif isinstance(node, dict):
        for k in node:
            yield from iter_modules(node[k])


def iter_modules_with_path(node: Any, path: str = ""):
    """Like ``iter_modules`` but yields ``(path, module)`` pairs, where
    ``path`` is a stable attribute/index path from the root (e.g.
    ``.layer1[0].bn1``). Used to key checkpoint state by structural
    position instead of construction-order counters (which vary with
    process history — see weights/serialize.py)."""
    if isinstance(node, Module):
        yield path, node
        for name in type(node).__data_fields__:
            yield from iter_modules_with_path(getattr(node, name), f"{path}.{name}")
    elif isinstance(node, (tuple, list)):
        for i, x in enumerate(node):
            yield from iter_modules_with_path(x, f"{path}[{i}]")
    elif isinstance(node, dict):
        for k in node:
            yield from iter_modules_with_path(node[k], f"{path}[{k!r}]")


_SENTINEL = object()


def tree_at(where: Callable, pytree: Any, replace_values: Any = _SENTINEL, *, replace_fn: Callable = None):
    """Out-of-place surgery: ``tree_at(lambda m: m.fc, model, Identity())``.

    A pragmatic equivalent of the reference's ``eqx.tree_at`` usage
    (e.g. reference eqxvision/models/segmentation/deeplabv3.py:210 swaps
    a backbone's classifier head for Identity). ``where`` selects one
    node or a list/tuple of nodes *by object identity*; those nodes must
    be unique objects within the tree.
    """
    targets = where(pytree)
    if isinstance(targets, (list, tuple)):
        targets = list(targets)
        if replace_values is _SENTINEL:
            replacements = [replace_fn(t) for t in targets]
        else:
            replacements = list(replace_values)
            if len(replacements) != len(targets):
                raise ValueError("number of replacements != number of targets")
    else:
        if replace_values is _SENTINEL:
            replacements = [replace_fn(targets)]
        else:
            replacements = [replace_values]
        targets = [targets]

    target_ids = {id(t): i for i, t in enumerate(targets)}
    found = set()

    def go(node: Any) -> Any:
        if id(node) in target_ids:
            found.add(id(node))
            return replacements[target_ids[id(node)]]
        if isinstance(node, Module):
            changes = {}
            for f in dataclasses.fields(node):
                old = getattr(node, f.name)
                new = go(old)
                if new is not old:
                    changes[f.name] = new
            return replace(node, **changes) if changes else node
        if isinstance(node, tuple):
            new = tuple(go(x) for x in node)
            return new if any(a is not b for a, b in zip(new, node)) else node
        if isinstance(node, list):
            return [go(x) for x in node]
        if isinstance(node, dict):
            return {k: go(v) for k, v in node.items()}
        return node

    out = go(pytree)
    if len(found) != len(targets):
        raise ValueError(
            f"tree_at: only found {len(found)} of {len(targets)} target nodes in tree"
        )
    return out
