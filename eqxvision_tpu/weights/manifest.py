"""Checkpoint-consumption manifests.

The torch importer is positional (reference utils.py:132-134: attribute
declaration order must mirror torchvision's field order), so "the model
imports its twin's state_dict" can mask a shared misreading of the
architecture. A *manifest* pins the contract externally: the ordered
list of (suffix, torch-shape) tensors the importer will demand, which
can be diffed against the (name, shape) sequence of torchvision's real
published state_dict (vendored under tests/manifests/, regenerable with
scripts/gen_manifests.py wherever torchvision is installed).

``expected_consumption`` mirrors ``import_torch_weights``'s visit order
exactly; ``synthetic_state_dict`` round-trips through the real importer
so the two cannot drift silently (tests/test_manifests.py).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from ..core.module import Module
from ..nn.conv import Conv2d
from ..nn.linear import Linear
from ..nn.norm import BatchNorm, GroupNorm, LayerNorm

import jax
import jax.numpy as jnp

Entry = Dict[str, Any]  # {"suffix": str|None, "shape": tuple (torch layout)}


def expected_consumption(model: Any) -> List[Entry]:
    """Ordered (suffix, torch-shape) stream the importer will consume.

    Shapes are in torch's serialization layout (Conv2d OIHW, Linear
    (out, in)); ``suffix`` None marks a raw parameter consumed by
    positional reshape (cls_token, pos_embed, ...).
    """
    out: List[Entry] = []

    def visit(node: Any) -> None:
        if isinstance(node, Conv2d):
            h, w, i, o = node.weight.shape  # HWIO -> OIHW
            out.append({"suffix": "weight", "shape": (o, i, h, w)})
            if node.bias is not None:
                out.append({"suffix": "bias", "shape": tuple(node.bias.shape)})
            return
        if isinstance(node, Linear):
            i, o = node.weight.shape  # (in, out) -> (out, in)
            out.append({"suffix": "weight", "shape": (o, i)})
            if node.bias is not None:
                out.append({"suffix": "bias", "shape": tuple(node.bias.shape)})
            return
        if isinstance(node, BatchNorm):
            c = node.num_features
            if node.weight is not None:
                out.append({"suffix": "weight", "shape": (c,)})
                out.append({"suffix": "bias", "shape": (c,)})
            out.append({"suffix": "running_mean", "shape": (c,)})
            out.append({"suffix": "running_var", "shape": (c,)})
            return
        if isinstance(node, (LayerNorm, GroupNorm)):
            if node.weight is not None:
                out.append({"suffix": "weight", "shape": tuple(node.weight.shape)})
                out.append({"suffix": "bias", "shape": tuple(node.bias.shape)})
            return
        if isinstance(node, Module):
            for fname in type(node).__data_fields__:
                visit(getattr(node, fname))
            return
        if isinstance(node, (tuple, list)):
            for x in node:
                visit(x)
            return
        if isinstance(node, dict):
            for k in node:
                visit(node[k])
            return
        if isinstance(node, (jax.Array, np.ndarray)) and jnp.issubdtype(
            jnp.asarray(node).dtype, jnp.inexact
        ):
            out.append({"suffix": None, "shape": tuple(np.shape(node))})

    visit(model)
    return out


def synthetic_state_dict(model: Any, seed: int = 0) -> Dict[str, np.ndarray]:
    """A fake torch state_dict exactly matching the expected stream —
    feeding it to ``import_torch_weights(strict=True)`` validates that
    ``expected_consumption`` and the importer agree tensor-for-tensor."""
    rng = np.random.RandomState(seed)
    sd: Dict[str, np.ndarray] = {}
    for i, e in enumerate(expected_consumption(model)):
        suffix = e["suffix"] or "param"
        sd[f"t{i}.{suffix}"] = rng.randn(*e["shape"]).astype(np.float32)
    return sd


def check_against_manifest(model: Any, manifest: List[Tuple[str, List[int]]]) -> None:
    """Assert the model's consumption stream matches a vendored manifest
    of torchvision's real state_dict: same length, and for each position
    the same name-suffix (where the importer pins one) and same
    torch-layout shape. ``num_batches_tracked`` entries must be stripped
    from the manifest first (the importer always drops them).

    Raises AssertionError with the first diverging position.
    """
    stream = expected_consumption(model)
    if len(stream) != len(manifest):
        raise AssertionError(
            f"stream length {len(stream)} != manifest length {len(manifest)}"
        )
    for pos, (e, (name, shape)) in enumerate(zip(stream, manifest)):
        mshape = tuple(shape)
        msuffix = name.split(".")[-1]
        if e["suffix"] is not None and msuffix != e["suffix"]:
            raise AssertionError(
                f"position {pos}: model expects suffix {e['suffix']!r}, "
                f"torchvision tensor is {name!r}"
            )
        if e["suffix"] is None:
            # raw-parameter leaves import by reshape; compare sizes
            if int(np.prod(mshape)) != int(np.prod(e["shape"])):
                raise AssertionError(
                    f"position {pos}: raw param size {np.prod(e['shape'])} "
                    f"!= torchvision {name!r} {mshape}"
                )
        elif mshape != tuple(e["shape"]):
            raise AssertionError(
                f"position {pos}: model expects shape {e['shape']} for "
                f"{name!r}, torchvision has {mshape}"
            )
