"""Fold inference-mode BatchNorm into the preceding convolution.

Inference BN is a per-channel affine: y = x * g + b with
g = weight / sqrt(var + eps), b = bias - mean * g. When a Conv2d
directly precedes it, the affine folds into the conv weights/bias and
the BN disappears from the graph entirely (SURVEY.md §7 design note 2:
"inference folds BN into conv weights at load time").

Folding is structural: the tree is walked and a Conv2d+BatchNorm pair is
folded when they are (a) adjacent in a Sequential, (b) conv*/bn* field
pairs on the same block (ResNet-style), or (c) a ConvNormActivation.
Remaining (un-paired) BNs are left to run from state as usual.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp

from ..core.module import Module, replace
from ..core.state import State
from ..nn.containers import Sequential
from ..nn.conv import Conv2d
from ..nn.norm import BatchNorm


class FoldedBatchNorm(Module):
    """Stateful-signature pass-through left where a folded BN lived (so
    block code like ``out, state = self.bn1(out, state)`` still works)."""

    __stateful__ = True

    def __init__(self):
        pass

    def __call__(self, x, state=None, *, key=None):
        return x, state


def _affine(bn: BatchNorm, state: State) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mean, var = state[bn.index]
    g = jnp.reciprocal(jnp.sqrt(var + bn.eps))
    if bn.weight is not None:
        g = g * bn.weight.astype(jnp.float32)
    b = -mean * g
    if bn.bias is not None:
        b = b + bn.bias.astype(jnp.float32)
    return g, b


def _fold_into_conv(conv: Conv2d, bn: BatchNorm, state: State) -> Conv2d:
    g, b = _affine(bn, state)
    w = conv.weight.astype(jnp.float32) * g  # HWIO: scale output channels
    bias = b if conv.bias is None else conv.bias.astype(jnp.float32) * g + b
    return replace(conv, weight=w.astype(conv.weight.dtype), bias=bias.astype(jnp.float32).astype(conv.weight.dtype))


def fold_batchnorm(model: Any, state: State) -> Any:
    """Return a copy of ``model`` with foldable inference BNs absorbed
    into their convs (BNs replaced by Identity). The model must be in
    inference mode; ``state`` must hold the running statistics."""

    def go(node: Any) -> Any:
        if isinstance(node, Sequential):
            layers = [go(l) for l in node.layers]
            out = []
            i = 0
            while i < len(layers):
                cur = layers[i]
                nxt = layers[i + 1] if i + 1 < len(layers) else None
                if (
                    isinstance(cur, Conv2d)
                    and isinstance(nxt, BatchNorm)
                    and nxt.inference
                    and nxt.index in state
                ):
                    out.append(_fold_into_conv(cur, nxt, state))
                    i += 2
                else:
                    out.append(cur)
                    i += 1
            return replace(node, layers=tuple(out))
        if isinstance(node, Module):
            changes = {}
            fields = list(type(node).__data_fields__)
            # named conv*/bn* pairs on the same block (resnet, googlenet)
            for f in fields:
                child = getattr(node, f)
                changes[f] = go(child)
            for f in fields:
                child = changes[f]
                if not isinstance(child, Conv2d):
                    continue
                bn_name = f.replace("conv", "bn") if "conv" in f else None
                if f == "conv":
                    bn_name = "bn"
                if bn_name and bn_name in fields:
                    bn = changes[bn_name]
                    if isinstance(bn, BatchNorm) and bn.inference and bn.index in state:
                        changes[f] = _fold_into_conv(child, bn, state)
                        changes[bn_name] = FoldedBatchNorm()
            # ConvNormActivation-style: fields literally named conv/norm
            if "conv" in fields and "norm" in fields:
                conv, norm = changes["conv"], changes["norm"]
                if isinstance(conv, Conv2d) and isinstance(norm, BatchNorm) and norm.inference and norm.index in state:
                    changes["conv"] = _fold_into_conv(conv, norm, state)
                    changes["norm"] = None if _field_optional(node, "norm") else FoldedBatchNorm()
            real_changes = {
                f: v for f, v in changes.items() if v is not getattr(node, f)
            }
            return replace(node, **real_changes) if real_changes else node
        if isinstance(node, tuple):
            return tuple(go(x) for x in node)
        if isinstance(node, list):
            return [go(x) for x in node]
        if isinstance(node, dict):
            return {k: go(v) for k, v in node.items()}
        return node

    return go(model)


def _field_optional(node: Module, name: str) -> bool:
    for f in dataclasses.fields(node):
        if f.name == name:
            return "Optional" in str(f.type) or getattr(node, name) is None
    return False
