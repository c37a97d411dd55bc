"""On-device training augmentations (batched, jit-friendly, key-driven).

The reference has no augmentation code of its own: its training recipe
delegates to host-side torchvision transforms — the Transfer_Learning
tutorial trains with ``RandomResizedCrop(224) + RandomHorizontalFlip +
ToTensor + Normalize`` (reference docs/getting_started/
Transfer_Learning.ipynb, train_transform cell) and the eval transform
lives in its test fixtures (reference tests/conftest.py:20-41). Here
the training-side transforms run **on the TPU** as part of the jitted
step, mirroring ops/preprocessing.py's split for eval: the host ships
raw uint8 NHWC canvases (3x less PCIe/host traffic than f32) and every
random crop/flip/jitter executes as fused XLA ops under the same
``jax.random`` key discipline as the models.

Design notes (TPU-first):
- Everything is **batched** over NHWC and differentiable-free; per-image
  randomness comes from one key split per op. Static output shapes
  (jit) — random crops are realised as per-image *affine bilinear
  sampling* (gathers), not dynamic slices.
- ``random_resized_crop`` draws one (area, log-ratio) sample per image
  and clamps the box to the frame, instead of torchvision's Python-loop
  10-attempt rejection sampler (data-dependent control flow doesn't
  jit); the clamped single draw is the standard accelerator-native
  formulation (big_vision / scenic pipelines do the same). Resize is
  bilinear without antialias (training-pipeline convention).
- The deterministic color ops (``adjust_brightness/contrast/saturation/
  hue``) match ``torchvision.transforms.functional`` float-tensor
  semantics (verified by parity tests in tests/test_augment.py);
  ``color_jitter`` applies them in a fixed documented order with
  per-image factor draws (torchvision randomises the order per call —
  a 4!-way ``lax.switch`` is not worth the trace size).
- ``mixup`` / ``cutmix`` follow the timm/"Bag of Tricks" convention:
  one Beta(alpha, alpha) lambda per batch, partner via a batch
  permutation; cutmix corrects lambda to the exact pasted-area
  fraction.

All ops take and return float images in [0, 1] unless noted; use
``ops.normalize`` afterwards (the pipelines below do).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .preprocessing import IMAGENET_MEAN, IMAGENET_STD, normalize

# --------------------------------------------------------------------
# deterministic color ops (torchvision functional semantics)
# --------------------------------------------------------------------

# ITU-R 601 luma weights, as torchvision rgb_to_grayscale uses.
_GRAY_W = (0.2989, 0.587, 0.114)


def _grayscale(x: jax.Array) -> jax.Array:
    """(..., 3) RGB -> (..., 1) luma."""
    w = jnp.asarray(_GRAY_W, x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def _blend(a: jax.Array, b: jax.Array, factor: jax.Array) -> jax.Array:
    """torchvision _blend: factor*a + (1-factor)*b, clamped to [0, 1]."""
    factor = jnp.asarray(factor, a.dtype)
    while factor.ndim < a.ndim:  # broadcast per-image factors (N,) -> (N,1,1,1)
        factor = factor[..., None]
    return jnp.clip(a * factor + b * (1.0 - factor), 0.0, 1.0)


def adjust_brightness(x: jax.Array, factor) -> jax.Array:
    """Scale toward black; ``factor`` scalar or per-image ``(N,)``."""
    return _blend(x, jnp.zeros((), x.dtype), factor)


def adjust_contrast(x: jax.Array, factor) -> jax.Array:
    """Blend with the per-image mean of the grayscale image."""
    mean = jnp.mean(_grayscale(x), axis=(-3, -2, -1), keepdims=True)
    return _blend(x, mean, factor)


def adjust_saturation(x: jax.Array, factor) -> jax.Array:
    """Blend with the grayscale image (factor 0 = grayscale)."""
    return _blend(x, _grayscale(x), factor)


def _rgb_to_hsv(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(maxc == 0, ones, maxc)
    cr_div = jnp.where(cr == 0, ones, cr)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    h = jnp.where(
        r == maxc,
        bc - gc,
        jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(cr == 0, jnp.zeros_like(h), h)
    return h, s, v


def _hsv_to_rgb(h: jax.Array, s: jax.Array, v: jax.Array) -> jax.Array:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(x: jax.Array, factor) -> jax.Array:
    """Shift hue by ``factor`` in [-0.5, 0.5] turns (torchvision
    adjust_hue float semantics: RGB -> HSV, h += factor mod 1, -> RGB)."""
    factor = jnp.asarray(factor, x.dtype)
    while factor.ndim < x.ndim - 1:  # (N,) -> (N,1,1) to match h
        factor = factor[..., None]
    h, s, v = _rgb_to_hsv(x)
    h = (h + factor) % 1.0
    return _hsv_to_rgb(h, s, v).astype(x.dtype)


# --------------------------------------------------------------------
# random geometric / photometric ops
# --------------------------------------------------------------------


def random_hflip(key: jax.Array, x: jax.Array, p: float = 0.5) -> jax.Array:
    """Per-image horizontal flip with probability ``p`` (NHWC)."""
    flip = jax.random.bernoulli(key, p, (x.shape[0],))
    return jnp.where(flip[:, None, None, None], jnp.flip(x, axis=2), x)


def _bilinear_sample_one(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample ``img (H, W, C)`` at the grid ``ys (S,) x xs (S,)`` with
    bilinear interpolation (edge-clamped), returning (S, S, C)."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    # 4 gathered corner grids, blended by the outer-product weights
    top = img[y0i[:, None], x0i[None, :]] * (1 - wx)[None, :, None] + img[
        y0i[:, None], x1i[None, :]
    ] * wx[None, :, None]
    bot = img[y1i[:, None], x0i[None, :]] * (1 - wx)[None, :, None] + img[
        y1i[:, None], x1i[None, :]
    ] * wx[None, :, None]
    return top * (1 - wy)[:, None, None] + bot * wy[:, None, None]


def random_resized_crop(
    key: jax.Array,
    x: jax.Array,
    size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> jax.Array:
    """Batched RandomResizedCrop: per-image random area/aspect box,
    bilinear-resized to ``(size, size)``.

    TPU-native replacement for the torchvision transform the reference's
    Transfer_Learning tutorial uses on the host. Sampling: area fraction
    ~ U(scale), aspect ~ exp(U(log ratio)); the box is clamped into the
    frame (single draw — see module docstring). Returns float32 in the
    input's value range.
    """
    n, h, w, _ = x.shape
    k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)
    area = jax.random.uniform(k_area, (n,), minval=scale[0], maxval=scale[1]) * (h * w)
    log_r = jax.random.uniform(
        k_ratio, (n,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    r = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * r), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / r), 1.0, h)
    top = jax.random.uniform(k_top, (n,)) * (h - ch)
    left = jax.random.uniform(k_left, (n,)) * (w - cw)

    grid = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size  # pixel centers

    def sample(img, t, l, bh, bw):
        ys = t + grid * bh - 0.5
        xs = l + grid * bw - 0.5
        return _bilinear_sample_one(img.astype(jnp.float32), ys, xs)

    return jax.vmap(sample)(x, top, left, ch, cw)


def color_jitter(
    key: jax.Array,
    x: jax.Array,
    brightness: float = 0.0,
    contrast: float = 0.0,
    saturation: float = 0.0,
    hue: float = 0.0,
) -> jax.Array:
    """Per-image random color jitter; factor ranges follow torchvision
    ColorJitter scalars (brightness/contrast/saturation f ~ U(max(0,
    1-v), 1+v); hue ~ U(-v, v), v <= 0.5). Fixed apply order
    brightness -> contrast -> saturation -> hue (see module docstring)."""
    n = x.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    if brightness:
        f = jax.random.uniform(
            kb, (n,), minval=max(0.0, 1 - brightness), maxval=1 + brightness
        )
        x = adjust_brightness(x, f)
    if contrast:
        f = jax.random.uniform(
            kc, (n,), minval=max(0.0, 1 - contrast), maxval=1 + contrast
        )
        x = adjust_contrast(x, f)
    if saturation:
        f = jax.random.uniform(
            ks, (n,), minval=max(0.0, 1 - saturation), maxval=1 + saturation
        )
        x = adjust_saturation(x, f)
    if hue:
        f = jax.random.uniform(kh, (n,), minval=-hue, maxval=hue)
        x = adjust_hue(x, f)
    return x


def random_erasing(
    key: jax.Array,
    x: jax.Array,
    p: float = 0.5,
    scale: Tuple[float, float] = (0.02, 0.33),
    ratio: Tuple[float, float] = (0.3, 3.3),
    value: float = 0.0,
) -> jax.Array:
    """Per-image random rectangle erase (Zhong et al. 2017; torchvision
    RandomErasing semantics, single clamped draw). The rectangle is
    realised as a coordinate mask — static shapes, jit-friendly."""
    n, h, w, _ = x.shape
    k_apply, k_area, k_ratio, k_top, k_left = jax.random.split(key, 5)
    apply = jax.random.bernoulli(k_apply, p, (n,))
    area = jax.random.uniform(k_area, (n,), minval=scale[0], maxval=scale[1]) * (h * w)
    r = jnp.exp(
        jax.random.uniform(k_ratio, (n,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    )
    ew = jnp.clip(jnp.sqrt(area * r), 1.0, w)
    eh = jnp.clip(jnp.sqrt(area / r), 1.0, h)
    top = jax.random.uniform(k_top, (n,)) * (h - eh)
    left = jax.random.uniform(k_left, (n,)) * (w - ew)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]  # (1, H, 1)
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # (1, 1, W)
    inside = (
        (yy >= top[:, None, None])
        & (yy < (top + eh)[:, None, None])
        & (xx >= left[:, None, None])
        & (xx < (left + ew)[:, None, None])
    )
    mask = (inside & apply[:, None, None])[..., None]
    return jnp.where(mask, jnp.asarray(value, x.dtype), x)


# --------------------------------------------------------------------
# batch-mixing augmentations
# --------------------------------------------------------------------


def mixup(
    key: jax.Array, x: jax.Array, y: jax.Array, alpha: float = 0.2
) -> Tuple[jax.Array, jax.Array]:
    """Mixup (Zhang et al. 2018): one lambda ~ Beta(alpha, alpha) per
    batch, partner by batch permutation. ``y`` must be soft labels
    ``(N, num_classes)`` (use :func:`smooth_labels`)."""
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha)
    perm = jax.random.permutation(k_perm, x.shape[0])
    xm = lam * x + (1.0 - lam) * x[perm]
    ym = lam * y + (1.0 - lam) * y[perm]
    return xm, ym


def cutmix(
    key: jax.Array, x: jax.Array, y: jax.Array, alpha: float = 1.0
) -> Tuple[jax.Array, jax.Array]:
    """CutMix (Yun et al. 2019): paste a partner's random rectangle;
    labels mixed by the exact pasted-area fraction (after clipping)."""
    n, h, w, _ = x.shape
    k_lam, k_perm, k_cy, k_cx = jax.random.split(key, 4)
    lam = jax.random.beta(k_lam, alpha, alpha)
    perm = jax.random.permutation(k_perm, n)
    cut = jnp.sqrt(1.0 - lam)
    ch, cw = h * cut, w * cut
    cy = jax.random.uniform(k_cy) * h
    cx = jax.random.uniform(k_cx) * w
    y0, y1 = jnp.clip(cy - ch / 2, 0, h), jnp.clip(cy + ch / 2, 0, h)
    x0, x1 = jnp.clip(cx - cw / 2, 0, w), jnp.clip(cx + cw / 2, 0, w)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    inside = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))[None, ..., None]
    xm = jnp.where(inside, x[perm], x)
    # label fraction from the RASTERIZED mask, not the continuous box —
    # exact agreement between pixels pasted and label mass moved
    lam_exact = 1.0 - jnp.mean(inside.astype(jnp.float32))
    ym = lam_exact * y + (1.0 - lam_exact) * y[perm]
    return xm, ym


def smooth_labels(labels: jax.Array, num_classes: int, smoothing: float = 0.0) -> jax.Array:
    """Integer labels ``(N,)`` -> soft targets ``(N, C)`` with label
    smoothing (on = 1 - s + s/C, off = s/C)."""
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


# --------------------------------------------------------------------
# end-to-end training pipeline
# --------------------------------------------------------------------


def imagenet_train_pipeline(
    key: jax.Array,
    images_uint8: jax.Array,
    *,
    size: int = 224,
    scale: Tuple[float, float] = (0.08, 1.0),
    hflip: float = 0.5,
    jitter: Optional[Tuple[float, float, float, float]] = None,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    dtype=jnp.float32,
) -> jax.Array:
    """uint8 NHWC canvases -> augmented normalized NHWC, all on device.

    The training-side twin of ``ops.imagenet_eval_pipeline`` and the
    TPU-native equivalent of the reference tutorial's host-side
    ``RandomResizedCrop(224) + RandomHorizontalFlip + ToTensor +
    Normalize`` (reference docs/getting_started/Transfer_Learning.ipynb).
    ``jitter=(b, c, s, h)`` optionally inserts color_jitter between the
    flip and normalization.
    """
    k_crop, k_flip, k_jit = jax.random.split(key, 3)
    x = random_resized_crop(k_crop, images_uint8, size, scale=scale) / 255.0
    if hflip:
        x = random_hflip(k_flip, x, hflip)
    if jitter is not None:
        x = color_jitter(k_jit, x, *jitter)
    return normalize(x, mean, std, scale=1.0).astype(dtype)
