"""On-device image preprocessing (SURVEY.md §7 phase 6).

The reference delegated all preprocessing to torchvision transforms on
the host (reference tests/conftest.py:20-41: Resize -> CenterCrop-less
-> ToTensor -> Normalize). Here the uint8-to-normalized pipeline runs
on the TPU as one fused XLA computation: ship raw uint8 NHWC bytes to
the device (3x less PCIe/host traffic than f32) and do
resize/center-crop/normalize there.

Semantics match the torchvision eval transform:
- ``resize``: bilinear, antialiased on downscale (PIL/torchvision
  Resize semantics), shorter side -> ``size``;
- ``center_crop``;
- ``normalize``: (x/255 - mean) / std with ImageNet defaults.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_shorter_side(x: jax.Array, size: int, *, antialias: bool = True) -> jax.Array:
    """NHWC resize so the shorter side equals ``size`` (aspect kept)."""
    n, h, w, c = x.shape
    if h <= w:
        oh, ow = size, max(int(round(w * size / h)), 1)
    else:
        oh, ow = max(int(round(h * size / w)), 1), size
    xf = x.astype(jnp.float32)
    return jax.image.resize(xf, (n, oh, ow, c), method="bilinear", antialias=antialias)


def center_crop(x: jax.Array, crop_h: int, crop_w: Optional[int] = None) -> jax.Array:
    if crop_w is None:
        crop_w = crop_h
    n, h, w, c = x.shape
    top = (h - crop_h) // 2
    left = (w - crop_w) // 2
    return x[:, top : top + crop_h, left : left + crop_w, :]


def five_crop(x: jax.Array, crop_h: int, crop_w: Optional[int] = None) -> jax.Array:
    """``(N,H,W,C) -> (5,N,ch,cw,C)``: four corners + center, in
    torchvision ``functional.five_crop`` order (tl, tr, bl, br,
    center). Static shapes — the classic multi-crop eval protocol;
    fold the leading axis into the batch for one model call."""
    if crop_w is None:
        crop_w = crop_h
    n, h, w, c = x.shape
    if crop_h > h or crop_w > w:
        raise ValueError(f"crop ({crop_h},{crop_w}) larger than image ({h},{w})")
    tl = x[:, :crop_h, :crop_w]
    tr = x[:, :crop_h, w - crop_w :]
    bl = x[:, h - crop_h :, :crop_w]
    br = x[:, h - crop_h :, w - crop_w :]
    return jnp.stack([tl, tr, bl, br, center_crop(x, crop_h, crop_w)], axis=0)


def ten_crop(
    x: jax.Array,
    crop_h: int,
    crop_w: Optional[int] = None,
    *,
    vertical_flip: bool = False,
) -> jax.Array:
    """``(N,H,W,C) -> (10,N,ch,cw,C)``: :func:`five_crop` of the image
    followed by the five crops of its flip (horizontal by default),
    matching torchvision ``functional.ten_crop``."""
    flipped = x[:, ::-1] if vertical_flip else x[:, :, ::-1]
    return jnp.concatenate(
        [five_crop(x, crop_h, crop_w), five_crop(flipped, crop_h, crop_w)], axis=0
    )


def normalize(
    x: jax.Array,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    *,
    scale: float = 1.0 / 255.0,
) -> jax.Array:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x.astype(jnp.float32) * scale - mean) / std


def imagenet_eval_pipeline(
    images_uint8: jax.Array,
    *,
    resize_size: int = 256,
    crop_size: int = 224,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    dtype=jnp.float32,
) -> jax.Array:
    """uint8 NHWC -> normalized NHWC, all on device, jit-friendly.

    Standard ImageNet eval: resize shorter side to 256 (bilinear,
    antialias), center-crop 224, normalize.
    """
    x = resize_shorter_side(images_uint8, resize_size)
    x = center_crop(x, crop_size)
    return normalize(x, mean, std).astype(dtype)
