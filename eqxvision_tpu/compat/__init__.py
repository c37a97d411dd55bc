"""Reference-compatibility shim.

The reference's quickstart (reference README.md:37-46) is:

    import equinox as eqx
    import eqxvision.models as models
    net = models.alexnet(torch_weights=...)
    forward = eqx.filter_jit(lambda model, x, keys:
        jax.vmap(model, axis_name="batch")(x, key=keys))
    out = forward(net, images, keys)          # images: (N, 3, H, W)

This module lets that pattern run against the TPU-native core with two
mechanical substitutions — ``eqxvision.models`` -> ``eqxvision_tpu.compat``
and ``equinox`` -> ``eqxvision_tpu.compat`` (equinox is not required):

- every factory here returns ONE object (a ``CompatModel`` bundling the
  core model with its BatchNorm state) whose ``__call__`` takes a single
  (C, H, W) sample plus a ``key`` kwarg, exactly like the reference's
  per-sample contract;
- ``filter_jit`` / ``filter_grad`` / ``tree_inference`` / ``tree_at``
  are re-exported from the core;
- ``axis_name`` is accepted and ignored: batched BatchNorm needs no
  collective axis names (nn/norm.py).

The compat layer is **inference-only for BatchNorm models**: under the
reference's ``jax.vmap(model, axis_name="batch")`` pattern each BN would
see a batch of one (the reference pmean'd statistics across the vmap
axis), and the per-call state update is discarded, so training through
the shim would silently diverge (ADVICE.md r1). ``CompatModel`` raises
at trace time if a training-mode BatchNorm is reached; call
``tree_inference(net, True)`` first, or use the native batched
``(model, state)`` API for training.

New code should prefer the batched NHWC core API directly.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax

from ..core.filters import filter_grad, filter_jit, filter_value_and_grad, partition, combine, apply_updates
from ..core.module import Module, tree_at, tree_inference
from ..core.state import State
from .. import models as _models
from ..models.registry import _REGISTRY
from ..utils import CLASSIFICATION_URLS, SEGMENTATION_URLS, load_torch_weights, _make_divisible


class CompatModel(Module):
    """Bundles (core model, state) into one reference-style callable.

    Per-sample contract: ``model(x_chw, key=k)`` with ``x`` of shape
    (C, H, W); batch via ``jax.vmap(model)(imgs, key=keys)``. The
    bundled state rides along as pytree leaves, so the object jits,
    vmaps, and serialises as a single tree.
    """

    __stateful__ = False

    core: Module
    state: State

    def __init__(self, core: Module, state: State):
        self.core = core
        self.state = state

    def __call__(self, x: jax.Array, *, key: Optional[jax.Array] = None):
        from ..core.module import iter_modules
        from ..nn.norm import BatchNorm

        # Training-mode BN through the per-sample shim is wrong twice
        # over: each BN sees batch-of-1 statistics (the reference
        # pmean'd across the vmap axis) and the updated running stats
        # are discarded. Static-field check, so it fires at trace time.
        for m in iter_modules(self.core):
            if isinstance(m, BatchNorm) and not m.inference:
                raise ValueError(
                    "CompatModel is inference-only for BatchNorm models: "
                    "call tree_inference(net, True) first, or train via "
                    "the native batched (model, state) API — see "
                    "docs/migration.md#training-batchnorm-models for the "
                    "exact recipe (the reference's vmap(axis_name='batch') "
                    "pattern mutated running stats through an impure side "
                    "channel this functional core deliberately has no "
                    "equivalent of)."
                )
        out, _ = self.core(x, self.state, key=key)
        return out


def _compat_factory(name: str, fn):
    @functools.wraps(fn)
    def factory(*args: Any, **kwargs: Any) -> CompatModel:
        model, state = fn(*args, **kwargs)
        return CompatModel(model, state)

    factory.__doc__ = (
        f"Reference-compatible {name}: returns a single CompatModel "
        f"(see eqxvision_tpu.models.{name} for the (model, state) core API)."
    )
    return factory


for _name, _fn in _REGISTRY.items():
    globals()[_name] = _compat_factory(_name, _fn)

# Model classes, importable like the reference's
# ``from eqxvision.models import ResNet`` (reference
# models/__init__.py:1-106 exports classes alongside factories; used
# for isinstance checks and subclassing). These are the core batched
# classes — a CompatModel wraps one as its ``.core``.
_MODEL_CLASSES = [
    "AlexNet", "ConvNeXt", "DeepLabV3", "DenseNet", "EfficientNet",
    "FCN", "GoogLeNet", "LRASPP", "MobileNetV2", "MobileNetV3",
    "RegNet", "ResNet", "ShuffleNetV2", "SqueezeNet", "SwinTransformer",
    "VGG", "VisionTransformer",
]
for _cls in _MODEL_CLASSES:
    globals()[_cls] = getattr(_models, _cls)


def tree_serialise_leaves(path, model) -> None:
    """equinox-style serialisation alias over weights.save_model
    (reference users fell back to eqx.tree_serialise_leaves,
    SURVEY.md §5 checkpoint/resume)."""
    from ..weights.serialize import save_model

    save_model(path, model)


def tree_deserialise_leaves(path, like):
    from ..weights.serialize import load_model

    model, _ = load_model(path, like)
    return model

__all__ = sorted(_REGISTRY) + _MODEL_CLASSES + [
    "CompatModel",
    "filter_jit",
    "filter_grad",
    "filter_value_and_grad",
    "tree_at",
    "tree_inference",
    "partition",
    "combine",
    "apply_updates",
    "load_torch_weights",
    "CLASSIFICATION_URLS",
    "SEGMENTATION_URLS",
    "_make_divisible",
]
