"""Vision Transformer (DINO-style), NHWC batched.

Capability parity with reference eqxvision/models/classification/
vit.py:15-404: fused-qkv multi-head attention, learnable cls_token /
pos_embed (trunc-normal std 0.02), DropPath per block, ``num_classes=0``
feature-extractor mode, and the attention-map extraction API
(``get_last_self_attention``, reference vit.py:275-292) preserved even
though the main path runs a fused Pallas attention kernel — extraction
uses the probability-materialising path by construction.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core import init
from ...core.module import Module, static
from ...core.state import State, init_state
from ... import nn
from ...layers import DropPath, MlpProjection, PatchEmbed
from ...ops.attention import attention, attention_reference, fused_qkv_attention
from .._common import debatch, default_key, ensure_nhwc, maybe_load_torch_weights


class _VitAttention(Module):
    """Fused-qkv MHA (reference vit.py:15-76). ``__call__`` uses the
    fused kernel; ``attention_probs`` materialises the softmax map for
    the extraction API."""

    qkv: nn.Linear
    proj: nn.Linear
    attn_drop: nn.Dropout
    proj_drop: nn.Dropout
    num_heads: int = static()
    scale: float = static()

    def __init__(self, dim, num_heads=8, qkv_bias=False, qk_scale=None, attn_drop=0.0, proj_drop=0.0, *, key):
        k1, k2 = jax.random.split(key)
        self.num_heads = num_heads
        head_dim = dim // num_heads
        # reference vit.py:49: qk_scale overrides the default 1/sqrt(Dh)
        # (DINO factories never set it, but it is part of the ctor API)
        self.scale = qk_scale or head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, use_bias=qkv_bias, key=k1)
        self.proj = nn.Linear(dim, dim, key=k2)
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj_drop = nn.Dropout(proj_drop)

    def _qkv(self, x):
        n, l, d = x.shape
        qkv = self.qkv(x).reshape(n, l, 3, self.num_heads, d // self.num_heads)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, N, H, L, Dh)
        return qkv[0], qkv[1], qkv[2]

    def attention_probs(self, x):
        """(N, H, L, L) post-softmax attention (pre-dropout)."""
        q, k, v = self._qkv(x)
        s = jnp.einsum("nhld,nhmd->nhlm", q, k, preferred_element_type=jnp.float32) * self.scale
        return jax.nn.softmax(s, axis=-1)

    def __call__(self, x, *, key=None):
        n, l, d = x.shape
        k1, k2 = (None, None) if key is None else jax.random.split(key)
        if self.attn_drop.p > 0.0 and not self.attn_drop.inference:
            # training with attention dropout requires materialised probs
            q, k, v = self._qkv(x)
            s = jnp.einsum("nhld,nhmd->nhlm", q, k, preferred_element_type=jnp.float32) * self.scale
            p = jax.nn.softmax(s, axis=-1)
            p = self.attn_drop(p.astype(x.dtype), key=k1)
            out = jnp.einsum("nhlm,nhmd->nhld", p, v)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(n, l, d)
        else:
            # fused path: qkv projection output feeds the kernel in its
            # natural (N, L, 3D) layout — zero transposes around it
            out = fused_qkv_attention(self.qkv(x), self.num_heads, self.scale)
        out = self.proj(out)
        return self.proj_drop(out, key=k2)


class _VitBlock(Module):
    """Pre-norm transformer block (reference vit.py:79-157)."""

    norm1: nn.LayerNorm
    attn: _VitAttention
    drop_path: DropPath
    norm2: nn.LayerNorm
    mlp: MlpProjection

    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False, qk_scale=None, drop=0.0, attn_drop=0.0, drop_path=0.0, *, key):
        k1, k2 = jax.random.split(key)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _VitAttention(dim, num_heads, qkv_bias, qk_scale, attn_drop, drop, key=k1)
        self.drop_path = DropPath(drop_path, mode="global")
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MlpProjection(dim, int(dim * mlp_ratio), dim, nn.gelu, drop, key=k2)

    def __call__(self, x, *, key=None):
        keys = [None] * 4 if key is None else list(jax.random.split(key, 4))
        x = x + self.drop_path(self.attn(self.norm1(x), key=keys[0]), key=keys[1])
        x = x + self.drop_path(self.mlp(self.norm2(x), key=keys[2]), key=keys[3])
        return x


class VisionTransformer(Module):
    """reference vit.py:160-292."""

    cls_token: jax.Array
    pos_embed: jax.Array
    patch_embed: PatchEmbed
    pos_drop: nn.Dropout
    blocks: Tuple[_VitBlock, ...]
    norm: nn.LayerNorm
    head: Module
    embed_dim: int = static()
    inference: bool = static()
    remat_blocks: bool = static()

    def __init__(
        self,
        img_size: int = 224,
        patch_size: int = 16,
        in_chans: int = 3,
        num_classes: int = 1000,
        embed_dim: int = 768,
        depth: int = 12,
        num_heads: int = 12,
        mlp_ratio: float = 4.0,
        qkv_bias: bool = True,
        qk_scale: Optional[float] = None,
        drop_rate: float = 0.0,
        attn_drop_rate: float = 0.0,
        drop_path_rate: float = 0.0,
        remat_blocks: bool = False,
        *,
        key: Optional[jax.Array] = None,
    ):
        key = default_key(key)
        keys = jax.random.split(key, depth + 4)
        self.embed_dim = embed_dim
        self.inference = False
        self.remat_blocks = bool(remat_blocks)
        self.patch_embed = PatchEmbed(img_size, patch_size, in_chans, embed_dim, key=keys[0])
        num_patches = self.patch_embed.num_patches
        self.cls_token = init.trunc_normal(keys[1], (1, 1, embed_dim), std=0.02)
        self.pos_embed = init.trunc_normal(keys[2], (1, num_patches + 1, embed_dim), std=0.02)
        self.pos_drop = nn.Dropout(drop_rate)
        # pure-Python stochastic-depth schedule (== linspace(0, rate, depth));
        # jnp here would make the constructor untraceable (float(tracer)
        # raises under eval_shape/jit-abstract builds)
        dpr = [drop_path_rate * i / max(depth - 1, 1) for i in range(depth)]
        self.blocks = tuple(
            _VitBlock(embed_dim, num_heads, mlp_ratio, qkv_bias, qk_scale, drop_rate, attn_drop_rate, dpr[i], key=keys[3 + i])
            for i in range(depth)
        )
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)
        self.head = nn.Linear(embed_dim, num_classes, key=keys[-1]) if num_classes > 0 else nn.Identity()

    def _prepare_tokens(self, x, key=None):
        x = self.patch_embed(x)  # (N, L, D)
        n = x.shape[0]
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        return self.pos_drop(x, key=key)

    def features(self, x, *, key=None):
        """cls-token embedding (DINO feature extraction)."""
        x, single = ensure_nhwc(x)
        keys = [None] * (len(self.blocks) + 1) if key is None else list(jax.random.split(key, len(self.blocks) + 1))
        x = self._prepare_tokens(x, keys[0])
        for blk, k in zip(self.blocks, keys[1:]):
            if self.remat_blocks:
                # per-block jax.checkpoint: activations inside each
                # block are recomputed during the backward, so training
                # peak memory is one block's internals + the N boundary
                # residuals (whole-model checkpoint would replay the
                # full forward at the same peak). ~4x batch headroom at
                # bf16 (scripts/bench_train.py).
                x = jax.checkpoint(lambda b, t, k_: b(t, key=k_))(blk, x, k)
            else:
                x = blk(x, key=k)
        x = self.norm(x)
        return debatch(x[:, 0], single)

    def __call__(self, x: jax.Array, state: State = None, *, key: Optional[jax.Array] = None):
        feats = self.features(x, key=key)
        return self.head(feats), state

    def get_last_self_attention(self, x, state: State = None, *, key=None):
        """Return the last block's attention map (1-sample: (H, L+1, L+1);
        batched: (N, H, L+1, L+1)). Inference-mode only, like the
        reference (reference vit.py:281-284)."""
        if not self.inference:
            raise ValueError(
                "set the model to inference mode (tree_inference) before "
                "extracting attention maps"
            )
        x, single = ensure_nhwc(x)
        x = self._prepare_tokens(x)
        for blk in self.blocks[:-1]:
            x = blk(x)
        last = self.blocks[-1]
        probs = last.attn.attention_probs(last.norm1(x))
        return debatch(probs, single)


def resize_pos_embed(model: VisionTransformer, img_size, *, method: str = "bicubic") -> VisionTransformer:
    """Adapt a ViT to a new input resolution, out-of-place.

    The grid part of ``pos_embed`` is 2D-interpolated to the new patch
    grid (the DINO/timm fine-tuning convention; bicubic by default) and
    ``PatchEmbed``'s size contract is updated. The reference cannot do
    this — its PatchEmbed rejects any non-construction size (reference
    eqxvision/layers/patch_embed.py:73-77) and DINO users fall back to
    the original facebookresearch/dino ``interpolate_pos_encoding``.
    Here it is a pure pytree transform: patch-projection and block
    weights are shared with the input model (the interpolated pos_embed
    is the only new array), so fine-tuning at 384 after loading 224
    checkpoints is one call:

        model, state = vit_base(torch_weights=url)
        model = resize_pos_embed(model, 384)
    """
    from ...core.module import replace

    pe = model.patch_embed
    img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
    new_grid = (img_size[0] // pe.patch_size[0], img_size[1] // pe.patch_size[1])
    if img_size == pe.img_size:
        return model
    gh, gw = pe.grid_size
    nh, nw = new_grid
    d = model.pos_embed.shape[-1]
    cls_pe = model.pos_embed[:, :1]
    grid_pe = model.pos_embed[:, 1:].reshape(1, gh, gw, d).astype(jnp.float32)
    grid_pe = jax.image.resize(grid_pe, (1, nh, nw, d), method=method)
    new_pe = jnp.concatenate(
        [cls_pe, grid_pe.reshape(1, nh * nw, d).astype(model.pos_embed.dtype)], axis=1
    )
    new_patch_embed = replace(
        pe, img_size=img_size, grid_size=new_grid, num_patches=nh * nw
    )
    return replace(model, patch_embed=new_patch_embed, pos_embed=new_pe)


def _vit(torch_weights, **kwargs):
    model = VisionTransformer(**kwargs)
    state = init_state(model)
    # DINO checkpoints have no classifier head when num_classes == 0.
    return maybe_load_torch_weights(model, state, torch_weights)


def vit_tiny(torch_weights: Optional[str] = None, patch_size: int = 16, **kwargs: Any):
    kwargs.setdefault("embed_dim", 192)
    kwargs.setdefault("depth", 12)
    kwargs.setdefault("num_heads", 3)
    return _vit(torch_weights, patch_size=patch_size, **kwargs)


def vit_small(torch_weights: Optional[str] = None, patch_size: int = 16, **kwargs: Any):
    kwargs.setdefault("embed_dim", 384)
    kwargs.setdefault("depth", 12)
    kwargs.setdefault("num_heads", 6)
    return _vit(torch_weights, patch_size=patch_size, **kwargs)


def vit_base(torch_weights: Optional[str] = None, patch_size: int = 16, **kwargs: Any):
    kwargs.setdefault("embed_dim", 768)
    kwargs.setdefault("depth", 12)
    kwargs.setdefault("num_heads", 12)
    return _vit(torch_weights, patch_size=patch_size, **kwargs)
