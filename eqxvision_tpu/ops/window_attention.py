"""Shifted window attention (Swin v1/v2), batched NHWC, functional core.

Equivalent capability to reference eqxvision/models/classification/
swin.py:90-255 (cyclic shift, window partition, relative position bias,
9-region shift mask, v2 cosine attention with clamped logit scale and
log-CPB bias) — with two upgrades the reference lacked:

- **dynamic padding**: inputs need not be multiples of the window size
  (reference warned and failed, swin.py:109-112,787-790; torchvision
  pads, and so do we — same arithmetic);
- the inner softmax(QK+bias)V runs through the fused Pallas attention
  kernel on TPU (ops/attention.py), with the window bias+mask passed
  compactly as an (nW*heads, L, L) bias the kernel re-reads per batch.

All shift masks / relative-position indices are computed with numpy at
trace time from static shapes, so they fold into compile-time constants
— no buffers to store, import, or shard.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .attention import (
    attention,
    packed_window_attention,
    window_qkv_attention,
    _use_pallas as _swin_use_pallas,
)

Array = jax.Array


@functools.lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww, wh*ww) indices into the (2wh-1)(2ww-1) bias table."""
    coords_h = np.arange(wh)
    coords_w = np.arange(ww)
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"))  # (2, wh, ww)
    coords_flat = coords.reshape(2, -1)
    relative = coords_flat[:, :, None] - coords_flat[:, None, :]  # (2, L, L)
    relative = relative.transpose(1, 2, 0).astype(np.int64)
    relative[:, :, 0] += wh - 1
    relative[:, :, 1] += ww - 1
    relative[:, :, 0] *= 2 * ww - 1
    return relative.sum(-1)  # (L, L)


@functools.lru_cache(maxsize=None)
def relative_coords_table(wh: int, ww: int) -> np.ndarray:
    """Swin v2 log-spaced continuous coords, (1, 2wh-1, 2ww-1, 2)."""
    rh = np.arange(-(wh - 1), wh, dtype=np.float32)
    rw = np.arange(-(ww - 1), ww, dtype=np.float32)
    table = np.stack(np.meshgrid(rh, rw, indexing="ij"))
    table = table.transpose(1, 2, 0)[None]  # (1, 2wh-1, 2ww-1, 2)
    table[:, :, :, 0] /= wh - 1
    table[:, :, :, 1] /= ww - 1
    table *= 8
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / 3.0
    return table


@functools.lru_cache(maxsize=None)
def _shift_attention_mask(pad_h: int, pad_w: int, wh: int, ww: int, sh: int, sw: int) -> np.ndarray:
    """(nW, L, L) additive mask: -100 between different shift regions
    (reference swin.py:176-223 built the same 9-region mask)."""
    img_mask = np.zeros((pad_h, pad_w), np.float32)
    h_slices = ((0, pad_h - wh), (pad_h - wh, pad_h - sh), (pad_h - sh, pad_h))
    w_slices = ((0, pad_w - ww), (pad_w - ww, pad_w - sw), (pad_w - sw, pad_w))
    count = 0
    for h0, h1 in h_slices:
        for w0, w1 in w_slices:
            img_mask[h0:h1, w0:w1] = count
            count += 1
    mask = img_mask.reshape(pad_h // wh, wh, pad_w // ww, ww)
    mask = mask.transpose(0, 2, 1, 3).reshape(-1, wh * ww)  # (nW, L)
    attn_mask = mask[:, None, :] - mask[:, :, None]
    return np.where(attn_mask == 0, 0.0, -100.0).astype(np.float32)


def window_partition(x: Array, wh: int, ww: int) -> Array:
    """(N, H, W, C) -> (N, nW, wh*ww, C); H, W multiples of window."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // wh, wh, w // ww, ww, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, (h // wh) * (w // ww), wh * ww, c)


def window_unpartition(x: Array, h: int, w: int, wh: int, ww: int) -> Array:
    n = x.shape[0]
    c = x.shape[-1]
    x = x.reshape(n, h // wh, w // ww, wh, ww, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h, w, c)


def shifted_window_attention(
    x: Array,
    qkv_weight: Array,  # (C, 3C) — ours is (in, out)
    proj_weight: Array,  # (C, C)
    relative_position_bias: Array,  # (1, heads, L, L)
    window_size: Tuple[int, int],
    num_heads: int,
    shift_size: Tuple[int, int],
    qkv_bias: Optional[Array] = None,
    proj_bias: Optional[Array] = None,
    logit_scale: Optional[Array] = None,  # v2: (heads, 1, 1)
    attention_dropout: float = 0.0,
    dropout: float = 0.0,
    inference: bool = True,
    key: Optional[Array] = None,
) -> Array:
    """Batched NHWC shifted-window attention, torchvision semantics."""
    n, h, w, c = x.shape
    wh, ww = window_size
    pad_b = (wh - h % wh) % wh
    pad_r = (ww - w % ww) % ww
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    ph, pw = h + pad_b, w + pad_r
    sh, sw = shift_size
    if wh >= ph:
        sh = 0
    if ww >= pw:
        sw = 0
    shifted = sh > 0 or sw > 0

    if shifted:
        x = jnp.roll(x, (-sh, -sw), axis=(1, 2))

    xw = window_partition(x, wh, ww)  # (N, nW, L, C)
    n_windows, L = xw.shape[1], wh * ww

    L = wh * ww
    use_packed = (
        _swin_use_pallas(L, c // num_heads)
        and logit_scale is None
        and not (attention_dropout > 0.0 and not inference)
        and os.environ.get("EQXVISION_TPU_SWIN_PACKED") != "0"
    )
    if use_packed:
        # Head-packed Pallas path (the measured Swin win, see
        # ops/attention.py:_packed_window_kernel). The qkv projection
        # weight's output sections are zero-padded to Cp = round_up(C,
        # 128) lanes so q/k/v are exact lane-tile slices in the kernel,
        # and the proj weight is row-padded to consume the kernel's
        # padded output with no slicing.
        cp = -(-c // 128) * 128
        wq, wk, wv = jnp.split(qkv_weight.astype(x.dtype), 3, axis=1)
        zc = ((0, 0), (0, cp - c))
        wqkv_p = jnp.concatenate(
            [jnp.pad(wq, zc), jnp.pad(wk, zc), jnp.pad(wv, zc)], axis=1
        )  # (C, 3*Cp)
        qkvp = xw @ wqkv_p
        if qkv_bias is not None:
            bq, bk, bv = jnp.split(qkv_bias, 3)
            zb = (0, cp - c)
            qkvp = qkvp + jnp.concatenate(
                [jnp.pad(bq, zb), jnp.pad(bk, zb), jnp.pad(bv, zb)]
            ).astype(x.dtype)
        bias_hll = relative_position_bias.reshape(num_heads, L, L)[None]  # (1, H, L, L)
        if shifted:
            mask = jnp.asarray(_shift_attention_mask(ph, pw, wh, ww, sh, sw))
            bias_hll = bias_hll + mask[:, None]  # (nW, H, L, L)
        bias_packed = jnp.transpose(bias_hll, (0, 2, 1, 3)).reshape(
            bias_hll.shape[0], L, num_heads * L
        )
        scale = (c // num_heads) ** -0.5
        outp = packed_window_attention(qkvp, bias_packed, num_heads, c, scale)
        projp = jnp.pad(proj_weight.astype(x.dtype), ((0, cp - c), (0, 0)))
        out = outp @ projp
        if proj_bias is not None:
            out = out + proj_bias.astype(x.dtype)
        if dropout > 0.0 and not inference:
            keep = 1.0 - dropout
            out = jnp.where(jax.random.bernoulli(key, keep, out.shape), out / keep, 0.0)
        x = window_unpartition(out, ph, pw, wh, ww)
        if shifted:
            x = jnp.roll(x, (sh, sw), axis=(1, 2))
        return x[:, :h, :w, :]

    if logit_scale is not None and qkv_bias is not None:
        # v2: k has no bias (reference swin.py:369-522 zeroed v-bias slot;
        # torchvision zeroes the middle third each forward)
        qkv_bias = qkv_bias.at[c : 2 * c].set(0.0)
    qkv = xw @ qkv_weight.astype(x.dtype)
    if qkv_bias is not None:
        qkv = qkv + qkv_bias.astype(x.dtype)

    use_window_kernel = os.environ.get("EQXVISION_TPU_SWIN_QKV_KERNEL") == "1"
    if use_window_kernel and logit_scale is None and not (attention_dropout > 0.0 and not inference):
        # Windowed fused-qkv kernel — measured SLOWER than the grouped
        # attention path on v5e (swin_t b128: 1124 vs 1713 img/s; the
        # per-window x per-head lane slices of a 288-lane row each cost
        # a VMEM relayout, unlike ViT's 2304-lane rows where the same
        # trick wins big). Kept behind an env flag for future Mosaic
        # versions.
        scale = (c // num_heads) ** -0.5
        bias2 = relative_position_bias.reshape(1, num_heads, L, L)
        if shifted:
            mask = jnp.asarray(_shift_attention_mask(ph, pw, wh, ww, sh, sw))
            bias2 = bias2 + mask[:, None, :, :]  # (nW, heads, L, L)
        out = window_qkv_attention(qkv, bias2, num_heads, scale)
        out = out @ proj_weight.astype(x.dtype)
        if proj_bias is not None:
            out = out + proj_bias.astype(x.dtype)
        if dropout > 0.0 and not inference:
            keep = 1.0 - dropout
            out = jnp.where(jax.random.bernoulli(key, keep, out.shape), out / keep, 0.0)
        x = window_unpartition(out, ph, pw, wh, ww)
        if shifted:
            x = jnp.roll(x, (sh, sw), axis=(1, 2))
        return x[:, :h, :w, :]

    qkv = qkv.reshape(n, n_windows, L, 3, num_heads, c // num_heads)
    qkv = jnp.transpose(qkv, (3, 0, 1, 4, 2, 5))  # (3, N, nW, heads, L, Dh)
    q, k, v = qkv[0], qkv[1], qkv[2]

    if logit_scale is not None:
        # v2 cosine attention
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        scale_val = jnp.exp(jnp.minimum(logit_scale, jnp.log(100.0))).reshape(num_heads, 1, 1)
        q = q * scale_val.astype(q.dtype)
        scale = 1.0
    else:
        scale = (c // num_heads) ** -0.5

    # bias: relative position (1, heads, L, L) [+ shift mask (nW, 1, L, L)]
    bias = relative_position_bias.reshape(1, 1, num_heads, L, L)
    if shifted:
        mask = jnp.asarray(_shift_attention_mask(ph, pw, wh, ww, sh, sw))  # (nW, L, L)
        bias = bias + mask[None, :, None, :, :]
    bias = jnp.broadcast_to(bias, (1, n_windows, num_heads, L, L))

    if attention_dropout > 0.0 and not inference:
        s = jnp.einsum("bwhld,bwhmd->bwhlm", q, k, preferred_element_type=jnp.float32) * scale
        s = s + bias.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        kd, key = jax.random.split(key)
        keep = 1.0 - attention_dropout
        p = jnp.where(jax.random.bernoulli(kd, keep, p.shape), p / keep, 0.0)
        out = jnp.einsum("bwhlm,bwhmd->bwhld", p, v)
    else:
        # XLA batched-GEMM attention: at Swin's window shapes XLA fuses
        # the surrounding head transposes and beats every Pallas
        # formulation tried (swin_t b128: XLA 2142 img/s vs grouped
        # kernel 1713 vs windowed-qkv kernel 1124; see attention.py for
        # the kernels and their measured notes).
        from .attention import attention_reference

        out = attention_reference(q, k, v, bias=bias, scale=scale)

    out = jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(n, n_windows, L, c)
    out = out @ proj_weight.astype(x.dtype)
    if proj_bias is not None:
        out = out + proj_bias.astype(x.dtype)
    if dropout > 0.0 and not inference:
        keep = 1.0 - dropout
        out = jnp.where(jax.random.bernoulli(key, keep, out.shape), out / keep, 0.0)

    x = window_unpartition(out, ph, pw, wh, ww)
    if shifted:
        x = jnp.roll(x, (sh, sw), axis=(1, 2))
    return x[:, :h, :w, :]
