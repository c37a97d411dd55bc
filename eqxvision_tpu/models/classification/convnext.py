"""ConvNeXt Tiny/Small/Base/Large, NHWC batched.

Capability parity with reference eqxvision/models/classification/
convnext.py:16-324 and torchvision.models.convnext. torchvision's
CNBlock permutes NCHW->NHWC around its LayerNorm/Linear core; our
activations already live in NHWC, so the block is literally
dwconv7x7 -> LN -> Linear -> GELU -> Linear with zero layout changes —
the layout the TPU wants end to end.

Importer note: ``layer_scale`` is a direct Parameter of CNBlock, and
torch state_dicts emit a module's own parameters before its children,
so it is declared as the *first* field.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ...core.module import Module, static
from ...core.state import State, init_state
from ... import nn
from ...layers import DropPath, LayerNorm2d
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights


@dataclass
class _CNBlockConfig:
    """reference convnext.py:74-92"""

    input_channels: int
    out_channels: Optional[int]
    num_layers: int


class CNBlock(Module):
    """reference convnext.py:16-71."""

    layer_scale: jax.Array  # first: direct parameter precedes children in torch order
    dwconv: nn.Conv2d
    norm: nn.LayerNorm
    pwconv1: nn.Linear
    pwconv2: nn.Linear
    stochastic_depth: DropPath

    def __init__(self, dim, layer_scale: float, stochastic_depth_prob: float, *, key):
        k1, k2, k3 = jax.random.split(key, 3)
        self.layer_scale = jnp.full((dim,), layer_scale, jnp.float32)
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim, use_bias=True, key=k1)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim, key=k2)
        self.pwconv2 = nn.Linear(4 * dim, dim, key=k3)
        self.stochastic_depth = DropPath(stochastic_depth_prob, mode="global")

    def __call__(self, x, *, key=None):
        out = self.dwconv(x)
        out = self.norm(out)
        # gelu on the f32 accumulator fuses into the matmul epilogue
        # (nn/linear.py preactivation docstring; +14 ms on ViT if not)
        out = nn.gelu(self.pwconv1.preactivation(out)).astype(out.dtype)
        out = self.pwconv2(out)
        out = out * self.layer_scale.astype(out.dtype)
        return x + self.stochastic_depth(out, key=key)


class ConvNeXt(Module):
    __stateful__ = True

    features: nn.Sequential
    classifier_norm: LayerNorm2d
    classifier_fc: nn.Linear

    def __init__(
        self,
        block_setting: Sequence[_CNBlockConfig],
        stochastic_depth_prob: float = 0.0,
        layer_scale: float = 1e-6,
        num_classes: int = 1000,
        *,
        key: Optional[jax.Array] = None,
    ):
        key = default_key(key)
        total_blocks = sum(c.num_layers for c in block_setting)
        keys = jax.random.split(key, total_blocks + len(block_setting) + 3)
        ki = 0
        firstconv_output = block_setting[0].input_channels
        layers = [
            nn.Sequential(  # stem: 4x4/4 "patchify" conv + LN
                [
                    nn.Conv2d(3, firstconv_output, 4, stride=4, use_bias=True, key=keys[ki]),
                    LayerNorm2d(firstconv_output, eps=1e-6),
                ]
            )
        ]
        ki += 1
        stage_block_id = 0
        for cnf in block_setting:
            stage = []
            for _ in range(cnf.num_layers):
                sd_prob = stochastic_depth_prob * stage_block_id / (total_blocks - 1.0)
                stage.append(CNBlock(cnf.input_channels, layer_scale, sd_prob, key=keys[ki]))
                ki += 1
                stage_block_id += 1
            layers.append(nn.Sequential(stage))
            if cnf.out_channels is not None:
                layers.append(
                    nn.Sequential(  # downsampling: LN + 2x2/2 conv
                        [
                            LayerNorm2d(cnf.input_channels, eps=1e-6),
                            nn.Conv2d(cnf.input_channels, cnf.out_channels, 2, stride=2, key=keys[ki]),
                        ]
                    )
                )
                ki += 1
        self.features = nn.Sequential(layers)
        lastconv_output = block_setting[-1].out_channels or block_setting[-1].input_channels
        self.classifier_norm = LayerNorm2d(lastconv_output, eps=1e-6)
        self.classifier_fc = nn.Linear(lastconv_output, num_classes, key=keys[-1])

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        x, single = ensure_nhwc(x)
        x, state = self.features(x, state, key=key)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # avgpool to (N,1,1,C)
        x = self.classifier_norm(x)
        x = self.classifier_fc(x.reshape(x.shape[0], -1))
        return debatch(x, single), state


def _convnext(block_setting, sd_prob, torch_weights, **kwargs):
    kwargs.setdefault("stochastic_depth_prob", sd_prob)
    model = ConvNeXt(block_setting, **kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights)


def convnext_tiny(torch_weights: Optional[str] = None, **kwargs: Any):
    setting = [
        _CNBlockConfig(96, 192, 3),
        _CNBlockConfig(192, 384, 3),
        _CNBlockConfig(384, 768, 9),
        _CNBlockConfig(768, None, 3),
    ]
    return _convnext(setting, 0.1, torch_weights, **kwargs)


def convnext_small(torch_weights: Optional[str] = None, **kwargs: Any):
    setting = [
        _CNBlockConfig(96, 192, 3),
        _CNBlockConfig(192, 384, 3),
        _CNBlockConfig(384, 768, 27),
        _CNBlockConfig(768, None, 3),
    ]
    return _convnext(setting, 0.4, torch_weights, **kwargs)


def convnext_base(torch_weights: Optional[str] = None, **kwargs: Any):
    setting = [
        _CNBlockConfig(128, 256, 3),
        _CNBlockConfig(256, 512, 3),
        _CNBlockConfig(512, 1024, 27),
        _CNBlockConfig(1024, None, 3),
    ]
    return _convnext(setting, 0.5, torch_weights, **kwargs)


def convnext_large(torch_weights: Optional[str] = None, **kwargs: Any):
    setting = [
        _CNBlockConfig(192, 384, 3),
        _CNBlockConfig(384, 768, 3),
        _CNBlockConfig(768, 1536, 27),
        _CNBlockConfig(1536, None, 3),
    ]
    return _convnext(setting, 0.5, torch_weights, **kwargs)
