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

import math
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


def random_vflip(key: jax.Array, x: jax.Array, p: float = 0.5) -> jax.Array:
    """Per-image vertical flip with probability ``p`` (NHWC;
    torchvision ``RandomVerticalFlip``)."""
    flip = jax.random.bernoulli(key, p, (x.shape[0],))
    return jnp.where(flip[:, None, None, None], jnp.flip(x, axis=1), x)


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
# PIL-style point ops (torchvision functional semantics, [0,1] floats)
# --------------------------------------------------------------------


def invert(x: jax.Array) -> jax.Array:
    return 1.0 - x


def solarize(x: jax.Array, threshold) -> jax.Array:
    """Invert pixels at or above ``threshold`` (scalar or per-image (N,))."""
    t = jnp.asarray(threshold, x.dtype)
    while t.ndim < x.ndim:
        t = t[..., None]
    return jnp.where(x >= t, 1.0 - x, x)


def posterize(x: jax.Array, bits) -> jax.Array:
    """Keep the top ``bits`` bits of each (8-bit-quantized) channel;
    ``bits`` scalar or per-image (N,) integer in [0, 8]."""
    b = jnp.asarray(bits, jnp.int32)
    while b.ndim < x.ndim:
        b = b[..., None]
    q = jnp.clip((x * 255.0).astype(jnp.int32), 0, 255)
    mask = (0xFF << (8 - b)) & 0xFF
    return ((q & mask).astype(x.dtype)) / 255.0


def autocontrast(x: jax.Array) -> jax.Array:
    """Per-image, per-channel linear stretch of the value range to
    [0, 1] (identity for constant channels — PIL semantics)."""
    lo = jnp.min(x, axis=(-3, -2), keepdims=True)
    hi = jnp.max(x, axis=(-3, -2), keepdims=True)
    span = hi - lo
    out = (x - lo) / jnp.where(span == 0, jnp.ones_like(span), span)
    return jnp.where(span == 0, x, jnp.clip(out, 0.0, 1.0))


def equalize(x: jax.Array) -> jax.Array:
    """Per-image, per-channel histogram equalization on the 8-bit
    quantization, matching the PIL/torchvision LUT algorithm
    (cumsum + step//2, floor-divided by step; identity when step==0)."""
    q = jnp.clip((x * 255.0).astype(jnp.int32), 0, 255)

    def chan(qc):  # (H, W) int32
        hist = jnp.zeros((256,), jnp.int32).at[qc.reshape(-1)].add(1)
        # PIL step: (total - last nonzero bin's count) // 255. The last
        # nonzero bin is hist[max value present].
        maxv = jnp.max(qc)
        step = (qc.size - hist[maxv]) // 255
        lut = (jnp.cumsum(hist) + step // 2) // jnp.maximum(step, 1)
        lut = jnp.clip(jnp.concatenate([jnp.zeros((1,), lut.dtype), lut])[:-1], 0, 255)
        out = lut[qc]
        return jnp.where(step == 0, qc, out)

    eq = jax.vmap(jax.vmap(chan, in_axes=-1, out_axes=-1))(q)
    return eq.astype(x.dtype) / 255.0


def sharpness(x: jax.Array, factor) -> jax.Array:
    """Blend with a 3x3 smoothed image (PIL SMOOTH kernel: center 5,
    edges 1, /13; borders untouched — torchvision adjust_sharpness)."""
    kernel = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    c = x.shape[-1]
    k = jnp.zeros((3, 3, c, c), x.dtype).at[:, :, jnp.arange(c), jnp.arange(c)].set(
        kernel[..., None].astype(x.dtype)
    )
    sm = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    # PIL leaves the 1-pixel border unsmoothed
    sm = sm.at[:, 0, :, :].set(x[:, 0]).at[:, -1, :, :].set(x[:, -1])
    sm = sm.at[:, :, 0, :].set(x[:, :, 0]).at[:, :, -1, :].set(x[:, :, -1])
    return _blend(x, sm, factor)


# --------------------------------------------------------------------
# affine warps (inverse-map bilinear, zero fill — torchvision affine)
# --------------------------------------------------------------------


def _warp_one(img: jax.Array, yy: jax.Array, xx: jax.Array, fill: float) -> jax.Array:
    """Sample ``img (H, W, C)`` at the full coordinate grids ``yy/xx
    (Ho, Wo)``; out-of-frame samples get ``fill``."""
    h, w = img.shape[0], img.shape[1]
    valid = (yy >= -0.5) & (yy <= h - 0.5) & (xx >= -0.5) & (xx <= w - 0.5)
    y0 = jnp.clip(jnp.floor(yy), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xx), 0, w - 1)
    wy = jnp.clip(yy - y0, 0.0, 1.0)[..., None]
    wx = jnp.clip(xx - x0, 0.0, 1.0)[..., None]
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    y1i, x1i = jnp.minimum(y0i + 1, h - 1), jnp.minimum(x0i + 1, w - 1)
    top = img[y0i, x0i] * (1 - wx) + img[y0i, x1i] * wx
    bot = img[y1i, x0i] * (1 - wx) + img[y1i, x1i] * wx
    out = top * (1 - wy) + bot * wy
    return jnp.where(valid[..., None], out, jnp.asarray(fill, img.dtype))


def affine(
    x: jax.Array,
    *,
    angle=0.0,
    translate=(0.0, 0.0),
    shear=(0.0, 0.0),
    scale=1.0,
    fill: float = 0.0,
) -> jax.Array:
    """Batched affine warp about the image center (torchvision
    ``F.affine`` conventions: ``angle`` degrees counter-clockwise,
    ``translate`` = (tx, ty) pixels, ``shear`` = (sx, sy) degrees,
    bilinear, zero ``fill``). Every parameter may be a scalar or a
    per-image ``(N,)`` array."""
    n, h, w, _ = x.shape

    def bcast(v):
        v = jnp.asarray(v, jnp.float32)
        return jnp.broadcast_to(v, (n,))

    # y points DOWN in image coordinates, so a visually counter-
    # clockwise rotation (torchvision's positive angle) is a negative
    # mathematical angle
    ang = -jnp.deg2rad(bcast(angle))
    sx = jnp.deg2rad(bcast(shear[0]))
    sy = jnp.deg2rad(bcast(shear[1]))
    tx, ty = bcast(translate[0]), bcast(translate[1])
    sc = bcast(scale)
    # torchvision forward matrix: RotateScale @ Shear; we build the
    # same matrix then invert it for inverse mapping (output -> input)
    a = sc * jnp.cos(ang + sy) / jnp.cos(sy)
    b = -sc * (jnp.cos(ang + sy) * jnp.tan(sx) / jnp.cos(sy) + jnp.sin(ang))
    c = sc * jnp.sin(ang + sy) / jnp.cos(sy)
    d = -sc * (jnp.sin(ang + sy) * jnp.tan(sx) / jnp.cos(sy) - jnp.cos(ang))
    det = a * d - b * c
    ia, ib, ic, id_ = d / det, -b / det, -c / det, a / det
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    gy = jnp.broadcast_to(ys[:, None], (h, w))
    gx = jnp.broadcast_to(xs[None, :], (h, w))

    def one(img, ia_, ib_, ic_, id__, tx_, ty_):
        ox = gx - tx_
        oy = gy - ty_
        src_x = ia_ * ox + ib_ * oy + cx
        src_y = ic_ * ox + id__ * oy + cy
        return _warp_one(img, src_y, src_x, fill)

    return jax.vmap(one)(x, ia, ib, ic, id_, tx, ty)


def rotate(x: jax.Array, angle, fill: float = 0.0) -> jax.Array:
    return affine(x, angle=angle, fill=fill)


# --------------------------------------------------------------------
# RandAugment (torchvision op set and magnitude schedule)
# --------------------------------------------------------------------

_RA_NUM_BINS_DEFAULT = 31


def rand_augment(
    key: jax.Array,
    x: jax.Array,
    num_ops: int = 2,
    magnitude: int = 9,
    num_bins: int = _RA_NUM_BINS_DEFAULT,
    fill: float = 0.0,
) -> jax.Array:
    """RandAugment (Cubuk et al. 2020) with torchvision's 14-op table
    and magnitude schedule, batched on device.

    Per image and per op slot an op index is drawn uniformly; signed
    magnitudes flip sign with p=0.5. Branching is realised as
    compute-all-ops + per-image select (a data-dependent ``lax.switch``
    under vmap lowers to the same thing) — ~14x the FLOPs of one op,
    which is still negligible next to the model step; the win is that
    augmentation stays inside the jitted graph, with no host round trip.
    Expects float images in [0, 1].
    """
    n, h, w, _ = x.shape
    m = magnitude
    lin = lambda hi: float(hi) * m / max(num_bins - 1, 1)
    shear_deg = math.degrees(math.atan(lin(0.3)))
    trans_x = lin(150.0 / 331.0) * w
    trans_y = lin(150.0 / 331.0) * h
    rot_deg = lin(30.0)
    color_mag = lin(0.9)
    post_bits = 8 - int(round(4.0 * m / max(num_bins - 1, 1)))
    solar_t = 1.0 - m / max(num_bins - 1, 1)

    def apply_all(xi, sign):
        f_pos = 1.0 + sign * color_mag
        return [
            xi,  # identity
            affine(xi, shear=(sign * shear_deg, 0.0), fill=fill),
            affine(xi, shear=(0.0, sign * shear_deg), fill=fill),
            affine(xi, translate=(sign * trans_x, 0.0), fill=fill),
            affine(xi, translate=(0.0, sign * trans_y), fill=fill),
            affine(xi, angle=sign * rot_deg, fill=fill),
            adjust_brightness(xi, f_pos),
            adjust_saturation(xi, f_pos),  # "Color"
            adjust_contrast(xi, f_pos),
            sharpness(xi, f_pos),
            posterize(xi, post_bits),
            solarize(xi, solar_t),
            autocontrast(xi),
            equalize(xi),
        ]

    for k in jax.random.split(key, num_ops):
        k_op, k_sign = jax.random.split(k)
        op_idx = jax.random.randint(k_op, (n,), 0, 14)
        sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (n,)), 1.0, -1.0)
        cands = jnp.stack(apply_all(x, sign), axis=0)
        x = jnp.take_along_axis(
            cands, op_idx[None, :, None, None, None], axis=0
        )[0]
    return x


def trivial_augment_wide(
    key: jax.Array, x: jax.Array, num_bins: int = 31, fill: float = 0.0
) -> jax.Array:
    """TrivialAugmentWide (Müller & Hutter 2021; torchvision op set):
    ONE uniformly drawn op per image at a uniformly drawn magnitude
    bin (torchvision draws the bin index uniformly in [0, num_bins)).
    On-device via the same compute-all + select scheme as
    :func:`rand_augment`. Wide ranges: shear 0.99, translate 32 px,
    rotate 135 deg, color 0.99, posterize down to 2 bits."""
    n, h, w, _ = x.shape
    k_op, k_sign, k_mag = jax.random.split(key, 3)
    op_idx = jax.random.randint(k_op, (n,), 0, 14)
    sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (n,)), 1.0, -1.0)
    bins = jax.random.randint(k_mag, (n,), 0, num_bins)
    u = bins.astype(jnp.float32) / max(num_bins - 1, 1)  # per-image fraction
    s = sign * u
    f_color = 1.0 + s * 0.99
    shear_deg = jnp.rad2deg(jnp.arctan(s * 0.99))
    post_bits = 8 - jnp.round(u * 6.0).astype(jnp.int32)
    cands = jnp.stack(
        [
            x,
            affine(x, shear=(shear_deg, 0.0), fill=fill),
            affine(x, shear=(0.0, shear_deg), fill=fill),
            affine(x, translate=(s * 32.0, 0.0), fill=fill),
            affine(x, translate=(0.0, s * 32.0), fill=fill),
            affine(x, angle=s * 135.0, fill=fill),
            adjust_brightness(x, f_color),
            adjust_saturation(x, f_color),
            adjust_contrast(x, f_color),
            sharpness(x, f_color),
            posterize(x, post_bits),
            solarize(x, 1.0 - u),
            autocontrast(x),
            equalize(x),
        ],
        axis=0,
    )
    return jnp.take_along_axis(cands, op_idx[None, :, None, None, None], axis=0)[0]


def augmix(
    key: jax.Array,
    x: jax.Array,
    severity: int = 3,
    mixture_width: int = 3,
    chain_depth: int = -1,
    alpha: float = 1.0,
    all_ops: bool = True,
    fill: float = 0.0,
) -> jax.Array:
    """AugMix (Hendrycks et al. 2020), torchvision semantics, batched on
    device: ``mixture_width`` independent augmentation chains (each
    ``chain_depth`` ops deep; -1 draws depth in {1,2,3} per image) are
    convexly mixed with Dirichlet(alpha) weights, then blended with the
    original image by a Beta(alpha, alpha) weight. Per-op magnitude bin
    is drawn uniformly in [0, severity) of torchvision's 10-bin scale
    (so severity=3 -> fractions {0, .1, .2}); signed ops flip with
    p=0.5. ``all_ops=False`` drops the four color ops, matching
    torchvision. Chains use the compute-all + per-image select scheme
    of :func:`rand_augment`; the identity slot realizes per-image chain
    depths without dynamic control flow. Expects floats in [0, 1];
    output is the same convex hull, so bounds are preserved."""
    n, h, w, _ = x.shape
    pmax = 10.0  # torchvision _PARAMETER_MAX
    k_m, k_w, key = jax.random.split(key, 3)
    m = jax.random.beta(k_m, alpha, alpha, (n,))  # weight of the original
    dir_w = jax.random.dirichlet(k_w, jnp.full((mixture_width,), jnp.float32(alpha)), (n,))
    num_ops = 13 if all_ops else 9
    steps = chain_depth if chain_depth > 0 else 3

    def apply_all(xi, sign, u):
        su = sign * u
        cands = [
            xi,  # identity slot: steps past this image's chain depth
            affine(xi, shear=(jnp.rad2deg(jnp.arctan(su * 0.3)), 0.0), fill=fill),
            affine(xi, shear=(0.0, jnp.rad2deg(jnp.arctan(su * 0.3))), fill=fill),
            affine(xi, translate=(su * (w / 3.0), 0.0), fill=fill),
            affine(xi, translate=(0.0, su * (h / 3.0)), fill=fill),
            affine(xi, angle=su * 30.0, fill=fill),
            posterize(xi, 4 - jnp.round(u * 4.0).astype(jnp.int32)),
            solarize(xi, 1.0 - u),
            autocontrast(xi),
            equalize(xi),
        ]
        if all_ops:
            f = 1.0 + su * 0.9
            cands += [
                adjust_brightness(xi, f),
                adjust_saturation(xi, f),  # "Color"
                adjust_contrast(xi, f),
                sharpness(xi, f),
            ]
        return cands

    mix = m[:, None, None, None] * x
    for i in range(mixture_width):
        ki = jax.random.fold_in(key, i)
        k_d, ki = jax.random.split(ki)
        depth = jax.random.randint(k_d, (n,), 1, 4)
        aug = x
        for s in range(steps):
            k_op, k_sign, k_mag = jax.random.split(jax.random.fold_in(ki, s), 3)
            op_idx = jax.random.randint(k_op, (n,), 1, 1 + num_ops)
            if chain_depth <= 0:
                op_idx = jnp.where(s < depth, op_idx, 0)
            sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (n,)), 1.0, -1.0)
            u = jax.random.randint(k_mag, (n,), 0, severity).astype(jnp.float32) / pmax
            cands = jnp.stack(apply_all(aug, sign, u), axis=0)
            aug = jnp.take_along_axis(cands, op_idx[None, :, None, None, None], axis=0)[0]
        mix = mix + ((1.0 - m) * dir_w[:, i])[:, None, None, None] * aug
    return mix.astype(x.dtype)


# --------------------------------------------------------------------
# AutoAugment (learned per-dataset policies)
# --------------------------------------------------------------------

# Op-name -> candidate-slot for the compute-all + select scheme below.
# Slot 0 is the identity (realises "op not applied" draws).
_AA_OPS = {
    "ShearX": 1,
    "ShearY": 2,
    "TranslateX": 3,
    "TranslateY": 4,
    "Rotate": 5,
    "Brightness": 6,
    "Color": 7,
    "Contrast": 8,
    "Sharpness": 9,
    "Posterize": 10,
    "Solarize": 11,
    "AutoContrast": 12,
    "Equalize": 13,
    "Invert": 14,
}

# The canonical AutoAugment ImageNet policy (Cubuk et al. 2019, Table 9;
# the same 25 sub-policies torchvision's AutoAugmentPolicy.IMAGENET uses).
# Each sub-policy is two (op, probability, magnitude-bin-of-10) stages;
# None = the op takes no magnitude.
IMAGENET_AUTO_AUGMENT_POLICY: Tuple = (
    (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
    (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Equalize", 0.4, None), ("Rotate", 0.8, 8)),
    (("Solarize", 0.6, 3), ("Equalize", 0.6, None)),
    (("Posterize", 0.8, 5), ("Equalize", 1.0, None)),
    (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
    (("Equalize", 0.6, None), ("Posterize", 0.4, 6)),
    (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
    (("Rotate", 0.4, 9), ("Equalize", 0.6, None)),
    (("Equalize", 0.0, None), ("Equalize", 0.8, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
    (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
    (("Sharpness", 0.4, 7), ("Invert", 0.6, None)),
    (("ShearX", 0.6, 5), ("Equalize", 1.0, None)),
    (("Color", 0.4, 0), ("Equalize", 0.6, None)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
)


def auto_augment(
    key: jax.Array,
    x: jax.Array,
    policy: Sequence = IMAGENET_AUTO_AUGMENT_POLICY,
    fill: float = 0.0,
) -> jax.Array:
    """AutoAugment (Cubuk et al. 2019), torchvision semantics, batched
    on device: each image draws one sub-policy uniformly from
    ``policy``; each of the sub-policy's two (op, p, magnitude-bin)
    stages fires independently with probability p. Magnitude bins are
    torchvision's 10-bin AutoAugment space (shear 0.3, translate
    150/331 of the side, rotate 30 deg, color 0.9, posterize
    ``8 - round(4*bin/9)`` bits, solarize threshold ``1 - bin/9``);
    signed ops flip with p=0.5. Branching uses the compute-all +
    per-image select scheme of :func:`rand_augment` (15 slots; slot 0
    identity realises "did not fire").

    Only the ImageNet policy ships built-in (the models here are
    ImageNet models); pass the torchvision CIFAR10/SVHN tables — or a
    learned custom one — as ``policy`` using the same
    ``((op, p, bin), (op, p, bin))`` schema to switch datasets.
    Expects floats in [0, 1]; output stays in [0, 1].
    """
    n, h, w, _ = x.shape
    n_pol = len(policy)
    # Static per-(policy, stage) tables -> device constants.
    op_tab = jnp.array(
        [[_AA_OPS[st[0]] for st in sp] for sp in policy], jnp.int32
    )
    p_tab = jnp.array([[st[1] for st in sp] for sp in policy], jnp.float32)
    u_tab = jnp.array(
        [[(st[2] or 0) / 9.0 for st in sp] for sp in policy], jnp.float32
    )

    k_pol, key = jax.random.split(key)
    pol = jax.random.randint(k_pol, (n,), 0, n_pol)

    for s in range(2):
        k_fire, k_sign = jax.random.split(jax.random.fold_in(key, s))
        fire = jax.random.uniform(k_fire, (n,)) < p_tab[pol, s]
        op_idx = jnp.where(fire, op_tab[pol, s], 0)
        u = u_tab[pol, s]
        su = jnp.where(jax.random.bernoulli(k_sign, 0.5, (n,)), u, -u)
        f_color = 1.0 + su * 0.9
        shear_deg = jnp.rad2deg(jnp.arctan(su * 0.3))
        cands = jnp.stack(
            [
                x,
                affine(x, shear=(shear_deg, 0.0), fill=fill),
                affine(x, shear=(0.0, shear_deg), fill=fill),
                affine(x, translate=(su * (150.0 / 331.0) * w, 0.0), fill=fill),
                affine(x, translate=(0.0, su * (150.0 / 331.0) * h), fill=fill),
                affine(x, angle=su * 30.0, fill=fill),
                adjust_brightness(x, f_color),
                adjust_saturation(x, f_color),  # "Color"
                adjust_contrast(x, f_color),
                sharpness(x, f_color),
                posterize(x, 8 - jnp.round(u * 4.0).astype(jnp.int32)),
                solarize(x, 1.0 - u),
                autocontrast(x),
                equalize(x),
                invert(x),
            ],
            axis=0,
        )
        x = jnp.take_along_axis(cands, op_idx[None, :, None, None, None], axis=0)[0]
    return x


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
    auto_augment_policy: Optional[str] = None,
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
    flip and normalization; ``auto_augment_policy`` in {"autoaugment",
    "randaugment", "trivialaugmentwide", "augmix"} inserts the named
    auto-augmentation there instead (timm recipe slot; mutually
    exclusive with ``jitter``).
    """
    k_crop, k_flip, k_jit = jax.random.split(key, 3)
    x = random_resized_crop(k_crop, images_uint8, size, scale=scale) / 255.0
    if hflip:
        x = random_hflip(k_flip, x, hflip)
    if jitter is not None and auto_augment_policy is not None:
        raise ValueError("pass either jitter= or auto_augment_policy=, not both")
    if jitter is not None:
        x = color_jitter(k_jit, x, *jitter)
    elif auto_augment_policy is not None:
        aa = {
            "autoaugment": auto_augment,
            "randaugment": rand_augment,
            "trivialaugmentwide": trivial_augment_wide,
            "augmix": augmix,
        }
        x = aa[auto_augment_policy](k_jit, x)
    return normalize(x, mean, std, scale=1.0).astype(dtype)
