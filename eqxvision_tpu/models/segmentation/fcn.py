"""FCN semantic segmentation (reference segmentation/fcn.py:15-120)."""
from __future__ import annotations

from typing import Callable, Optional

import jax

from ...core.module import Module, tree_at
from ...core.state import init_state
from ... import nn
from ...experimental import intermediate_layer_getter
from ..classification import resnet
from .._common import default_key, maybe_load_torch_weights
from ._utils import _SimpleSegmentationModel


class FCN(_SimpleSegmentationModel):
    """Fully Convolutional Network."""


class FCNHead(nn.Sequential):
    """conv3x3 -> BN -> ReLU -> Dropout(0.1) -> conv1x1 (reference
    fcn.py:19-34, matching torchvision FCNHead)."""

    def __init__(self, in_channels: int, out_channels: int, *, key: jax.Array):
        k1, k2 = jax.random.split(key)
        inter_channels = in_channels // 4
        super().__init__(
            [
                nn.Conv2d(in_channels, inter_channels, 3, padding=1, use_bias=False, key=k1),
                nn.BatchNorm(inter_channels),
                nn.Lambda(nn.relu),
                nn.Dropout(0.1),
                nn.Conv2d(inter_channels, out_channels, 1, key=k2),
            ]
        )


def _build_simple_seg(
    model_cls,
    head_cls,
    num_classes,
    backbone,
    intermediate_layers,
    classifier_module,
    classifier_in_channels,
    aux_in_channels,
    silence_layers,
    torch_weights,
    key,
    aux_module: Optional[Callable] = None,
):
    """Shared builder implementing the reference's factory contract
    (reference fcn.py:37-120, deeplabv3.py:138-227)."""
    key = default_key(key)
    keys = jax.random.split(key, 2)
    if classifier_module is None:
        classifier_module = head_cls
    if aux_module is None:
        aux_module = FCNHead
    if backbone is None:
        backbone = resnet.resnet50(replace_stride_with_dilation=[False, True, True])
    if isinstance(backbone, tuple):  # (model, state) from our factories
        backbone = backbone[0]
    if intermediate_layers is None:
        intermediate_layers = lambda m: [m.layer3, m.layer4]  # noqa: E731

    num_layers = len(intermediate_layers(backbone))
    if aux_in_channels is not None and num_layers != 2:
        raise ValueError(
            "aux_in_channels requires the intermediate_layers to return exactly "
            "2 layers corresponding to aux and final."
        )
    if aux_in_channels is None and num_layers != 1:
        raise ValueError(
            f"With no aux_in_channels, the aux layer is disabled. Received "
            f"{num_layers} from intermediate_layers, expected number of layers is 1."
        )
    if silence_layers is None:
        silence_layers = lambda m: m.fc  # noqa: E731
    backbone = tree_at(silence_layers, backbone, replace_fn=lambda _: nn.Identity())
    backbone = intermediate_layer_getter(backbone, intermediate_layers)

    classifier = classifier_module(in_channels=classifier_in_channels, out_channels=num_classes, key=keys[0])
    aux_classifier = (
        aux_module(in_channels=aux_in_channels, out_channels=num_classes, key=keys[1])
        if aux_in_channels is not None
        else None
    )
    model = model_cls(backbone, classifier, aux_classifier)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)


def fcn(
    num_classes: Optional[int] = 21,
    backbone: Optional[Module] = None,
    intermediate_layers: Optional[Callable] = None,
    classifier_module: Optional[Callable] = None,
    classifier_in_channels: int = 2048,
    aux_in_channels: Optional[int] = None,
    silence_layers: Optional[Callable] = None,
    torch_weights: Optional[str] = None,
    *,
    key: Optional[jax.Array] = None,
):
    """FCN factory (reference fcn.py:37-120); returns (model, state).

    Default backbone: dilated ResNet-50 with layer3/layer4 taps.
    """
    return _build_simple_seg(
        FCN, FCNHead, num_classes, backbone, intermediate_layers,
        classifier_module, classifier_in_channels, aux_in_channels,
        silence_layers, torch_weights, key,
    )
