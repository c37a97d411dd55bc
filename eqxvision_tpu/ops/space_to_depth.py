"""Space-to-depth acceleration for RGB stem convolutions.

A stride-2 conv on a 3-channel input contracts only k*k*3 values per
MXU pass while the hardware's lane dimension holds 128 — the v5e runs
ResNet-50's 7x7/2 stem at ~7.5 TFLOP/s (measured: 4.0 ms of a 9.4 ms
b128 forward). Rewriting the conv in space-to-depth form quadruples the
contraction depth and quarters the spatial extent:

    o[p,q,f] = sum_{u,v,c} w[u,v,c,f] x[2p+u-P, 2q+v-P, c]
             = sum_{m,n,(a,b,c)} w2[m,n,(a,b,c),f] x2[p+m, q+n, (a,b,c)]

with x2[i,j,(a,b,c)] = xp[2i+a, 2j+b, c] (xp = x left-padded by P) and
w2[m,n,(a,b,c)] = wpad[2m+a, 2n+b, c] (w right-padded to even taps).
The transform is exact (no approximation); weights stay stored in
standard HWIO form so checkpoint import is unaffected.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def applicable(in_channels: int, stride: Tuple[int, int], kernel: Tuple[int, int], padding) -> bool:
    (sh, sw) = stride
    if (sh, sw) != (2, 2) or in_channels > 4:
        return False
    (ph0, ph1), (pw0, pw1) = padding
    return ph0 == ph1 and pw0 == pw1


def conv2d_stride2_s2d(
    x: jax.Array,  # (N, H, W, C) with small C
    weight: jax.Array,  # (kh, kw, C, F) HWIO
    bias: Optional[jax.Array],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
) -> jax.Array:
    n, h, w, c = x.shape
    kh, kw, _, f = weight.shape
    ph = padding[0][0]
    pw = padding[1][0]
    out_h = (h + 2 * ph - kh) // 2 + 1
    out_w = (w + 2 * pw - kw) // 2 + 1

    keh = (kh + 1) // 2 * 2  # even tap counts
    kew = (kw + 1) // 2 * 2
    wp = jnp.pad(weight, ((0, keh - kh), (0, kew - kw), (0, 0), (0, 0)))
    w2 = wp.reshape(keh // 2, 2, kew // 2, 2, c, f)
    w2 = jnp.transpose(w2, (0, 2, 1, 3, 4, 5)).reshape(keh // 2, kew // 2, 4 * c, f)

    # input: left-pad by P; right-pad so the s2d length covers the last
    # window and is even
    need_h = 2 * (out_h - 1) + keh
    need_w = 2 * (out_w - 1) + kew
    rh = max(need_h - (h + ph), 0)
    rw = max(need_w - (w + pw), 0)
    if (h + ph + rh) % 2:
        rh += 1
    if (w + pw + rw) % 2:
        rw += 1
    xp = jnp.pad(x, ((0, 0), (ph, rh), (pw, rw), (0, 0)))
    hp, wp_ = xp.shape[1], xp.shape[2]
    x2 = xp.reshape(n, hp // 2, 2, wp_ // 2, 2, c)
    x2 = jnp.transpose(x2, (0, 1, 3, 2, 4, 5)).reshape(n, hp // 2, wp_ // 2, 4 * c)

    y = lax.conv_general_dilated(
        x2,
        w2.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y[:, :out_h, :out_w, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
