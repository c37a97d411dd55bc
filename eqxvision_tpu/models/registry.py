"""Model registry: ``create_model("resnet50", pretrained=True)``.

The reference had no registry (configuration was pure Python factory
calls, SURVEY.md §5 config); this thin layer adds discoverability and a
single pretrained entry point over the same ~60 factories.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List

from ..weights.urls import CLASSIFICATION_URLS, SEGMENTATION_URLS
from . import classification as C
from . import segmentation as S

_REGISTRY: Dict[str, Callable] = {}
_PRETRAINED_KEYS: Dict[str, str] = {
    # registry name -> URL-registry key where they differ
    "shufflenet_v2_x0_5": "shufflenetv2_x0.5",
    "shufflenet_v2_x1_0": "shufflenetv2_x1.0",
    "vit_small": "vit_small_patch16_224_dino",
    "vit_base": "vit_base_patch16_224_dino",
    "fcn": "fcn_resnet50",
    "deeplabv3": "deeplabv3_resnet50",
    "lraspp_mobilenet_v3_large": "lraspp_mobilenetv3_large",
}


# Exported lowercase callables that are utilities, not model factories.
_NON_FACTORIES = {"resize_pos_embed"}


def _register_all():
    for mod in (C, S):
        for name in dir(mod):
            obj = getattr(mod, name)
            if (
                callable(obj)
                and not name[0].isupper()
                and not name.startswith("_")
                and name not in _NON_FACTORIES
            ):
                _REGISTRY[name] = obj


_register_all()


def list_models() -> List[str]:
    return sorted(_REGISTRY)


def create_model(name: str, pretrained: bool = False, **kwargs: Any):
    """Build a model by name; returns ``(model, state)``.

    ``pretrained=True`` resolves the torchvision/DINO checkpoint URL
    from the registries (reference utils.py:20-101) and imports it.
    """
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name!r}; see list_models()")
    if pretrained and "torch_weights" not in kwargs:
        key = _PRETRAINED_KEYS.get(name, name)
        url = CLASSIFICATION_URLS.get(key) or SEGMENTATION_URLS.get(key)
        if url is None:
            raise ValueError(f"no pretrained weights registered for {name!r}")
        kwargs["torch_weights"] = url
        if "dino" in key:
            # DINO checkpoints are headless (reference vit.py:254-258
            # feature-extractor mode); importing into a 1000-class head
            # would fail with "checkpoint exhausted" (ADVICE.md r1).
            kwargs.setdefault("num_classes", 0)
    return _REGISTRY[name](**kwargs)
