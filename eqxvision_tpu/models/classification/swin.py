"""Swin Transformer v1 + v2, NHWC batched.

Capability parity with reference eqxvision/models/classification/
swin.py:17-946 and torchvision.models.swin_transformer, with the
reference's limitations lifted: dynamic input padding (SURVEY.md §8.9)
and a properly random (std 0.02) v1 relative-position-bias init
(SURVEY.md §8.3). The attention core lives in
ops/window_attention.py and runs the fused Pallas kernel on TPU.

Importer field-order notes (torch emits direct params before children):
v1 attention: relative_position_bias_table, qkv, proj
    (relative_position_index buffer is skipped and recomputed);
v2 attention: logit_scale, qkv, proj, cpb_mlp
    (relative_coords_table buffer skipped and recomputed).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core import init
from ...core.module import Module, static
from ...core.state import State, init_state
from ... import nn
from ...layers import DropPath, MlpProjection
from ...ops import window_attention as wa
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights

SWIN_SKIP_PATTERNS = (r"relative_position_index", r"relative_coords_table", r"attn_mask")


class _PatchMerging(Module):
    """v1: concat 2x2 neighbors -> LN(4C) -> Linear(4C, 2C) (reference
    swin.py:46-66)."""

    reduction: nn.Linear
    norm: nn.LayerNorm

    def __init__(self, dim: int, *, key):
        self.reduction = nn.Linear(4 * dim, 2 * dim, use_bias=False, key=key)
        self.norm = nn.LayerNorm(4 * dim)

    @staticmethod
    def _merge(x):
        n, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        return jnp.concatenate([x0, x1, x2, x3], axis=-1)

    def __call__(self, x, *, key=None):
        x = self._merge(x)
        return self.reduction(self.norm(x))


class _PatchMergingV2(Module):
    """v2: concat -> Linear(4C, 2C) -> LN(2C) (reference swin.py:69-87)."""

    reduction: nn.Linear
    norm: nn.LayerNorm

    def __init__(self, dim: int, *, key):
        self.reduction = nn.Linear(4 * dim, 2 * dim, use_bias=False, key=key)
        self.norm = nn.LayerNorm(2 * dim)

    def __call__(self, x, *, key=None):
        x = _PatchMerging._merge(x)
        return self.norm(self.reduction(x))


class _ShiftedWindowAttention(Module):
    """v1 (reference swin.py:258-366)."""

    relative_position_bias_table: jax.Array
    qkv: nn.Linear
    proj: nn.Linear
    window_size: Tuple[int, int] = static()
    shift_size: Tuple[int, int] = static()
    num_heads: int = static()
    attention_dropout: float = static()
    dropout: float = static()
    inference: bool = static()

    def __init__(self, dim, window_size, shift_size, num_heads, qkv_bias=True, proj_bias=True, attention_dropout=0.0, dropout=0.0, *, key):
        k1, k2, k3 = jax.random.split(key, 3)
        self.window_size = tuple(window_size)
        self.shift_size = tuple(shift_size)
        self.num_heads = num_heads
        self.attention_dropout = float(attention_dropout)
        self.dropout = float(dropout)
        self.inference = False
        wh, ww = self.window_size
        # std-0.02 trunc normal (the reference's init was degenerate,
        # SURVEY.md §8.3)
        self.relative_position_bias_table = init.trunc_normal(
            k3, ((2 * wh - 1) * (2 * ww - 1), num_heads), std=0.02
        )
        self.qkv = nn.Linear(dim, dim * 3, use_bias=qkv_bias, key=k1)
        self.proj = nn.Linear(dim, dim, use_bias=proj_bias, key=k2)

    def _relative_position_bias(self):
        wh, ww = self.window_size
        idx = wa.relative_position_index(wh, ww)  # numpy (L, L), trace-constant
        bias = self.relative_position_bias_table[idx.reshape(-1)]
        L = wh * ww
        bias = bias.reshape(L, L, -1)
        return jnp.transpose(bias, (2, 0, 1))[None]  # (1, heads, L, L)

    def get_relative_position_bias(self):
        """Public accessor, reference swin.py:337."""
        return self._relative_position_bias()

    def __call__(self, x, *, key=None):
        return wa.shifted_window_attention(
            x,
            self.qkv.weight,
            self.proj.weight,
            self._relative_position_bias(),
            self.window_size,
            self.num_heads,
            self.shift_size,
            qkv_bias=self.qkv.bias,
            proj_bias=self.proj.bias,
            attention_dropout=self.attention_dropout,
            dropout=self.dropout,
            inference=self.inference,
            key=key,
        )


class _ShiftedWindowAttentionV2(Module):
    """v2: cosine attention + log-CPB MLP bias (reference swin.py:369-522)."""

    logit_scale: jax.Array
    qkv: nn.Linear
    proj: nn.Linear
    cpb_mlp: nn.Sequential
    window_size: Tuple[int, int] = static()
    shift_size: Tuple[int, int] = static()
    num_heads: int = static()
    attention_dropout: float = static()
    dropout: float = static()
    inference: bool = static()

    def __init__(self, dim, window_size, shift_size, num_heads, qkv_bias=True, proj_bias=True, attention_dropout=0.0, dropout=0.0, *, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        self.window_size = tuple(window_size)
        self.shift_size = tuple(shift_size)
        self.num_heads = num_heads
        self.attention_dropout = float(attention_dropout)
        self.dropout = float(dropout)
        self.inference = False
        self.logit_scale = jnp.log(10.0 * jnp.ones((num_heads, 1, 1)))
        self.qkv = nn.Linear(dim, dim * 3, use_bias=qkv_bias, key=k1)
        self.proj = nn.Linear(dim, dim, use_bias=proj_bias, key=k2)
        self.cpb_mlp = nn.Sequential(
            [
                nn.Linear(2, 512, key=k3),
                nn.Lambda(nn.relu),
                nn.Linear(512, num_heads, use_bias=False, key=k4),
            ]
        )

    def _relative_position_bias(self):
        wh, ww = self.window_size
        table = jnp.asarray(wa.relative_coords_table(wh, ww))  # (1, 2wh-1, 2ww-1, 2)
        cpb, _ = self.cpb_mlp(table.reshape(-1, 2))  # ((2wh-1)(2ww-1), heads)
        idx = wa.relative_position_index(wh, ww)
        bias = cpb[idx.reshape(-1)]
        L = wh * ww
        bias = bias.reshape(L, L, -1)
        bias = jnp.transpose(bias, (2, 0, 1))[None]
        return 16.0 * jax.nn.sigmoid(bias)

    def get_relative_position_bias(self):
        """Public accessor, reference swin.py:486."""
        return self._relative_position_bias()

    def __call__(self, x, *, key=None):
        return wa.shifted_window_attention(
            x,
            self.qkv.weight,
            self.proj.weight,
            self._relative_position_bias(),
            self.window_size,
            self.num_heads,
            self.shift_size,
            qkv_bias=self.qkv.bias,
            proj_bias=self.proj.bias,
            logit_scale=self.logit_scale,
            attention_dropout=self.attention_dropout,
            dropout=self.dropout,
            inference=self.inference,
            key=key,
        )


class _SwinTransformerBlock(Module):
    """v1 pre-norm block (reference swin.py:525-583)."""

    norm1: nn.LayerNorm
    attn: Module
    stochastic_depth: DropPath
    norm2: nn.LayerNorm
    mlp: MlpProjection
    remat: bool = static()

    def __init__(self, dim, num_heads, window_size, shift_size, mlp_ratio=4.0, dropout=0.0, attention_dropout=0.0, stochastic_depth_prob=0.0, attn_layer=_ShiftedWindowAttention, remat=False, *, key):
        k1, k2 = jax.random.split(key)
        self.remat = bool(remat)
        self.norm1 = nn.LayerNorm(dim)
        self.attn = attn_layer(dim, window_size, shift_size, num_heads, attention_dropout=attention_dropout, dropout=dropout, key=k1)
        self.stochastic_depth = DropPath(stochastic_depth_prob, mode="global")
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MlpProjection(dim, int(dim * mlp_ratio), dim, nn.gelu, dropout, key=k2)

    def _regularizers_inert(self):
        """The fused path computes no dropout/droppath; require every
        regularizer to be provably inert (inference flag OR p == 0), not
        just the attention module's flag — inconsistent per-submodule
        inference flags must fall back to the composed path rather than
        silently skip an active regularizer (ADVICE.md r2)."""
        regs = (self.stochastic_depth, self.mlp.drop1, self.mlp.drop2)
        return all(r.inference or r.p == 0.0 for r in regs)

    def _can_fuse(self):
        """Whole-block Pallas fusion: v1 attention, inference (no
        dropout/droppath sampling), gelu MLP, and the block's weights
        fit in VMEM (ops/window_attention.py:fused_swin_block_supported).
        """
        import os

        a = self.attn
        return (
            type(a) is _ShiftedWindowAttention
            and a.inference
            and self._regularizers_inert()
            and self.mlp.act.fn is nn.gelu
            and wa._swin_use_pallas(0, 0)
            and os.environ.get("EQXVISION_TPU_SWIN_FUSED_BLOCK") != "0"
            and wa.fused_swin_block_supported(
                a.qkv.weight.shape[0],
                self.mlp.fc1.weight.shape[1],
                a.num_heads,
                a.window_size[0] * a.window_size[1],
            )
        )

    def __call__(self, x, *, key=None):
        if self._can_fuse():
            a = self.attn
            return wa.fused_swin_block_v1(
                x,
                norm1_w=self.norm1.weight, norm1_b=self.norm1.bias,
                qkv_weight=a.qkv.weight, qkv_bias=a.qkv.bias,
                proj_weight=a.proj.weight, proj_bias=a.proj.bias,
                relative_position_bias=a._relative_position_bias(),
                norm2_w=self.norm2.weight, norm2_b=self.norm2.bias,
                fc1_weight=self.mlp.fc1.weight, fc1_bias=self.mlp.fc1.bias,
                fc2_weight=self.mlp.fc2.weight, fc2_bias=self.mlp.fc2.bias,
                window_size=a.window_size, shift_size=a.shift_size,
                num_heads=a.num_heads, eps=self.norm1.eps,
            )
        keys = [None] * 4 if key is None else list(jax.random.split(key, 4))

        def body(blk, t):
            t = t + blk.stochastic_depth(blk.attn(blk.norm1(t), key=keys[0]), key=keys[1])
            return t + blk.stochastic_depth(blk.mlp(blk.norm2(t), key=keys[2]), key=keys[3])

        if self.remat:
            # per-block activation recompute (same rationale as
            # VisionTransformer.remat_blocks)
            return jax.checkpoint(body)(self, x)
        return body(self, x)


class _SwinTransformerBlockV2(_SwinTransformerBlock):
    """v2 post-norm residuals (reference swin.py:586-635)."""

    def _can_fuse(self):
        """Whole-block fusion for v2: post-norm + cosine attention run
        in the same kernel (ops/window_attention.py:_swin_block_kernel
        with postnorm/cosine); the in-kernel per-head normalize needs
        sublane-aligned L (v2's 8x8 windows give L=64)."""
        import os

        a = self.attn
        return (
            type(a) is _ShiftedWindowAttentionV2
            and a.inference
            and self._regularizers_inert()
            and self.mlp.act.fn is nn.gelu
            and (a.window_size[0] * a.window_size[1]) % 8 == 0
            and wa._swin_use_pallas(0, 0)
            and os.environ.get("EQXVISION_TPU_SWIN_FUSED_BLOCK") != "0"
            and os.environ.get("EQXVISION_TPU_SWIN_FUSED_BLOCK_V2") != "0"
            and wa.fused_swin_block_supported(
                a.qkv.weight.shape[0],
                self.mlp.fc1.weight.shape[1],
                a.num_heads,
                a.window_size[0] * a.window_size[1],
            )
        )

    def __call__(self, x, *, key=None):
        if self._can_fuse():
            a = self.attn
            qkv_bias = a.qkv.bias
            if qkv_bias is not None:
                # v2: k has no bias (torchvision zeroes the middle third
                # each forward, reference swin.py:369-522)
                c = a.qkv.weight.shape[0]
                qkv_bias = qkv_bias.at[c : 2 * c].set(0.0)
            return wa.fused_swin_block_v2(
                x,
                logit_scale=a.logit_scale,
                norm1_w=self.norm1.weight, norm1_b=self.norm1.bias,
                qkv_weight=a.qkv.weight, qkv_bias=qkv_bias,
                proj_weight=a.proj.weight, proj_bias=a.proj.bias,
                relative_position_bias=a._relative_position_bias(),
                norm2_w=self.norm2.weight, norm2_b=self.norm2.bias,
                fc1_weight=self.mlp.fc1.weight, fc1_bias=self.mlp.fc1.bias,
                fc2_weight=self.mlp.fc2.weight, fc2_bias=self.mlp.fc2.bias,
                window_size=a.window_size, shift_size=a.shift_size,
                num_heads=a.num_heads, eps=self.norm1.eps,
            )
        keys = [None] * 4 if key is None else list(jax.random.split(key, 4))

        def body(blk, t):
            t = t + blk.stochastic_depth(blk.norm1(blk.attn(t, key=keys[0])), key=keys[1])
            return t + blk.stochastic_depth(blk.norm2(blk.mlp(t, key=keys[2])), key=keys[3])

        if self.remat:
            return jax.checkpoint(body)(self, x)
        return body(self, x)


class SwinTransformer(Module):
    """reference swin.py:638-772."""

    __stateful__ = True

    features: nn.Sequential
    norm: nn.LayerNorm
    head: nn.Linear

    def __init__(
        self,
        patch_size: Tuple[int, int],
        embed_dim: int,
        depths: Tuple[int, ...],
        num_heads: Tuple[int, ...],
        window_size: Tuple[int, int],
        mlp_ratio: float = 4.0,
        dropout: float = 0.0,
        attention_dropout: float = 0.0,
        stochastic_depth_prob: float = 0.1,
        num_classes: int = 1000,
        block: Optional[Callable] = None,
        downsample_layer: Callable = _PatchMerging,
        remat_blocks: bool = False,
        *,
        key: Optional[jax.Array] = None,
    ):
        key = default_key(key)
        if block is None:
            block = _SwinTransformerBlock
        total_blocks = sum(depths)
        keys = jax.random.split(key, total_blocks + len(depths) + 3)
        ki = 0

        layers: List[Any] = [
            nn.Sequential(
                [
                    nn.Conv2d(3, embed_dim, patch_size, stride=patch_size, key=keys[ki]),
                    nn.LayerNorm(embed_dim),
                ]
            )
        ]
        ki += 1
        stage_block_id = 0
        for i_stage, depth in enumerate(depths):
            dim = embed_dim * 2**i_stage
            stage = []
            for i_layer in range(depth):
                sd_prob = stochastic_depth_prob * float(stage_block_id) / (total_blocks - 1)
                stage.append(
                    block(
                        dim,
                        num_heads[i_stage],
                        window_size=window_size,
                        shift_size=[0 if i_layer % 2 == 0 else w // 2 for w in window_size],
                        mlp_ratio=mlp_ratio,
                        dropout=dropout,
                        attention_dropout=attention_dropout,
                        stochastic_depth_prob=sd_prob,
                        remat=remat_blocks,
                        key=keys[ki],
                    )
                )
                ki += 1
                stage_block_id += 1
            layers.append(nn.Sequential(stage))
            if i_stage < len(depths) - 1:
                layers.append(downsample_layer(dim, key=keys[ki]))
                ki += 1
        self.features = nn.Sequential(layers)
        num_features = embed_dim * 2 ** (len(depths) - 1)
        self.norm = nn.LayerNorm(num_features)
        self.head = nn.Linear(num_features, num_classes, key=keys[-1])

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        x, single = ensure_nhwc(x)
        x, state = self.features(x, state, key=key)
        x = self.norm(x)
        x = jnp.mean(x, axis=(1, 2))
        x = self.head(x)
        return debatch(x, single), state


def _swin(torch_weights, **kwargs):
    model = SwinTransformer(**kwargs)
    state = init_state(model)
    return maybe_load_torch_weights(model, state, torch_weights, skip_patterns=SWIN_SKIP_PATTERNS)


def swin_t(torch_weights: Optional[str] = None, **kwargs: Any):
    kwargs.setdefault("patch_size", (4, 4))
    kwargs.setdefault("embed_dim", 96)
    kwargs.setdefault("depths", (2, 2, 6, 2))
    kwargs.setdefault("num_heads", (3, 6, 12, 24))
    kwargs.setdefault("window_size", (7, 7))
    kwargs.setdefault("stochastic_depth_prob", 0.2)
    return _swin(torch_weights, **kwargs)


def swin_s(torch_weights: Optional[str] = None, **kwargs: Any):
    kwargs.setdefault("patch_size", (4, 4))
    kwargs.setdefault("embed_dim", 96)
    kwargs.setdefault("depths", (2, 2, 18, 2))
    kwargs.setdefault("num_heads", (3, 6, 12, 24))
    kwargs.setdefault("window_size", (7, 7))
    kwargs.setdefault("stochastic_depth_prob", 0.3)
    return _swin(torch_weights, **kwargs)


def swin_b(torch_weights: Optional[str] = None, **kwargs: Any):
    kwargs.setdefault("patch_size", (4, 4))
    kwargs.setdefault("embed_dim", 128)
    kwargs.setdefault("depths", (2, 2, 18, 2))
    kwargs.setdefault("num_heads", (4, 8, 16, 32))
    kwargs.setdefault("window_size", (7, 7))
    kwargs.setdefault("stochastic_depth_prob", 0.5)
    return _swin(torch_weights, **kwargs)


def _swin_v2(torch_weights, **kwargs):
    kwargs.setdefault("block", functools.partial(_SwinTransformerBlockV2, attn_layer=_ShiftedWindowAttentionV2))
    kwargs.setdefault("downsample_layer", _PatchMergingV2)
    return _swin(torch_weights, **kwargs)


def swin_v2_t(torch_weights: Optional[str] = None, **kwargs: Any):
    kwargs.setdefault("patch_size", (4, 4))
    kwargs.setdefault("embed_dim", 96)
    kwargs.setdefault("depths", (2, 2, 6, 2))
    kwargs.setdefault("num_heads", (3, 6, 12, 24))
    kwargs.setdefault("window_size", (8, 8))
    kwargs.setdefault("stochastic_depth_prob", 0.2)
    return _swin_v2(torch_weights, **kwargs)


def swin_v2_s(torch_weights: Optional[str] = None, **kwargs: Any):
    kwargs.setdefault("patch_size", (4, 4))
    kwargs.setdefault("embed_dim", 96)
    kwargs.setdefault("depths", (2, 2, 18, 2))
    kwargs.setdefault("num_heads", (3, 6, 12, 24))
    kwargs.setdefault("window_size", (8, 8))
    kwargs.setdefault("stochastic_depth_prob", 0.3)
    return _swin_v2(torch_weights, **kwargs)


def swin_v2_b(torch_weights: Optional[str] = None, **kwargs: Any):
    kwargs.setdefault("patch_size", (4, 4))
    kwargs.setdefault("embed_dim", 128)
    kwargs.setdefault("depths", (2, 2, 18, 2))
    kwargs.setdefault("num_heads", (4, 8, 16, 32))
    kwargs.setdefault("window_size", (8, 8))
    kwargs.setdefault("stochastic_depth_prob", 0.5)
    return _swin_v2(torch_weights, **kwargs)
