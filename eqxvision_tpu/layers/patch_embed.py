"""Image-to-patch embedding (reference layers/patch_embed.py:11-84).

Batched NHWC: strided Conv2d projection, then (N, H', W', D) is
flattened row-major to (N, L, D) — identical token order to timm/torch's
``proj(x).flatten(2).transpose(1, 2)``.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax

from ..core.module import Module, static
from ..nn.activations import Identity
from ..nn.conv import Conv2d


class PatchEmbed(Module):
    proj: Conv2d
    norm: Module
    img_size: tuple = static()
    patch_size: tuple = static()
    grid_size: tuple = static()
    num_patches: int = static()
    flatten: bool = static()

    def __init__(
        self,
        img_size: int = 224,
        patch_size: int = 16,
        in_chans: int = 3,
        embed_dim: int = 768,
        norm_layer: Optional[Callable] = None,
        flatten: bool = True,
        *,
        key: jax.Array,
    ):
        img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        patch_size = (patch_size, patch_size) if isinstance(patch_size, int) else tuple(patch_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.grid_size = (img_size[0] // patch_size[0], img_size[1] // patch_size[1])
        self.num_patches = self.grid_size[0] * self.grid_size[1]
        self.flatten = bool(flatten)
        self.proj = Conv2d(in_chans, embed_dim, patch_size, stride=patch_size, key=key)
        self.norm = norm_layer(embed_dim) if norm_layer else Identity()

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        n, h, w, c = x.shape
        if (h, w) != self.img_size:
            raise ValueError(
                f"Input image size ({h}x{w}) doesn't match PatchEmbed "
                f"size {self.img_size}."
            )
        x = self.proj(x)  # (N, H', W', D)
        if self.flatten:
            x = x.reshape(n, -1, x.shape[-1])  # (N, L, D), row-major HW
        return self.norm(x)
