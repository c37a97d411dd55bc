"""Pooling layers (NHWC), with exact torch padding/ceil_mode semantics.

ceil_mode matters for GoogLeNet parity (reference googlenet.py:78 uses
``use_ceil=True`` maxpools; SURVEY.md §7 lists pool arithmetic among the
hard parity items). torch's rule: output size is ceil((in + 2p - eff_k)/s)+1,
but a window whose start lies entirely in the right/bottom padding is
dropped.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from ..core.module import Module, static


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def _pool_padding(in_size: int, k: int, s: int, p: int, d: int, ceil_mode: bool) -> Tuple[int, int]:
    """Return (pad_lo, pad_hi) implementing torch pooling geometry."""
    ek = (k - 1) * d + 1  # effective kernel extent
    if ceil_mode:
        out = math.ceil((in_size + 2 * p - ek) / s) + 1
        if (out - 1) * s >= in_size + p:  # last window fully in padding: drop
            out -= 1
    else:
        out = math.floor((in_size + 2 * p - ek) / s) + 1
    needed = (out - 1) * s + ek
    pad_hi = max(needed - in_size - p, 0)
    return (p, pad_hi)


class MaxPool2d(Module):
    kernel_size: Tuple[int, int] = static()
    stride: Tuple[int, int] = static()
    padding: Tuple[int, int] = static()
    dilation: Tuple[int, int] = static()
    use_ceil: bool = static()

    def __init__(self, kernel_size, stride=None, padding=0, dilation=1, use_ceil: bool = False, ceil_mode: bool = None, **_):
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride if stride is not None else kernel_size)
        self.padding = _pair(padding)
        self.dilation = _pair(dilation)
        self.use_ceil = bool(use_ceil if ceil_mode is None else ceil_mode)

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        (kh, kw), (sh, sw) = self.kernel_size, self.stride
        (ph, pw), (dh, dw) = self.padding, self.dilation
        pad_h = _pool_padding(x.shape[1], kh, sh, ph, dh, self.use_ceil)
        pad_w = _pool_padding(x.shape[2], kw, sw, pw, dw, self.use_ceil)
        # init value must be a Python scalar so JAX recognises the max
        # monoid (an Array init value breaks reverse-mode autodiff).
        neg_inf = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
        return lax.reduce_window(
            x,
            neg_inf,
            lax.max,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding=((0, 0), pad_h, pad_w, (0, 0)),
            window_dilation=(1, dh, dw, 1),
        )


class AvgPool2d(Module):
    """count_include_pad=True semantics (torch default)."""

    kernel_size: Tuple[int, int] = static()
    stride: Tuple[int, int] = static()
    padding: Tuple[int, int] = static()
    use_ceil: bool = static()

    def __init__(self, kernel_size, stride=None, padding=0, use_ceil: bool = False, ceil_mode: bool = None, **_):
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride if stride is not None else kernel_size)
        self.padding = _pair(padding)
        self.use_ceil = bool(use_ceil if ceil_mode is None else ceil_mode)

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        (kh, kw), (sh, sw), (ph, pw) = self.kernel_size, self.stride, self.padding
        pad_h = _pool_padding(x.shape[1], kh, sh, ph, 1, self.use_ceil)
        pad_w = _pool_padding(x.shape[2], kw, sw, pw, 1, self.use_ceil)
        summed = lax.reduce_window(
            x.astype(jnp.float32),
            0.0,
            lax.add,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding=((0, 0), pad_h, pad_w, (0, 0)),
        )
        if self.use_ceil and (pad_h[1] > ph or pad_w[1] > pw):
            # torch's ceil_mode divisor counts only positions inside
            # input + declared padding, not the extra ceil padding.
            ones = jnp.ones((1, x.shape[1] + 2 * ph, x.shape[2] + 2 * pw, 1), jnp.float32)
            counts = lax.reduce_window(
                ones,
                jnp.float32(0),
                lax.add,
                window_dimensions=(1, kh, kw, 1),
                window_strides=(1, sh, sw, 1),
                padding=((0, 0), (0, pad_h[1] - ph), (0, pad_w[1] - pw), (0, 0)),
            )
            y = summed / counts
        else:
            y = summed / (kh * kw)
        return y.astype(x.dtype)


def adaptive_avg_pool2d(x: jax.Array, output_size: Tuple[int, int]) -> jax.Array:
    """torch.nn.AdaptiveAvgPool2d on NHWC input.

    Per output index i over an axis of size S with O bins:
    window = [floor(i*S/O), ceil((i+1)*S/O)). Uniform case reduces to a
    reshape-mean (fast path XLA fuses fully).
    """
    oh, ow = output_size
    n, h, w, c = x.shape
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        return jnp.mean(x.reshape(n, oh, kh, ow, kw, c), axis=(2, 4))
    xf = x.astype(jnp.float32)
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, math.ceil((i + 1) * h / oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, math.ceil((j + 1) * w / ow)
            cols.append(jnp.mean(xf[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1).astype(x.dtype)


class AdaptiveAvgPool2d(Module):
    output_size: Tuple[int, int] = static()

    def __init__(self, output_size, **_):
        self.output_size = _pair(output_size)

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        return adaptive_avg_pool2d(x, self.output_size)


class AdaptiveMaxPool2d(Module):
    output_size: Tuple[int, int] = static()

    def __init__(self, output_size, **_):
        self.output_size = _pair(output_size)

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        oh, ow = self.output_size
        n, h, w, c = x.shape
        if h % oh == 0 and w % ow == 0:
            kh, kw = h // oh, w // ow
            return jnp.max(x.reshape(n, oh, kh, ow, kw, c), axis=(2, 4))
        rows = []
        for i in range(oh):
            h0, h1 = (i * h) // oh, math.ceil((i + 1) * h / oh)
            cols = []
            for j in range(ow):
                w0, w1 = (j * w) // ow, math.ceil((j + 1) * w / ow)
                cols.append(jnp.max(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
            rows.append(jnp.stack(cols, axis=1))
        return jnp.stack(rows, axis=1)
