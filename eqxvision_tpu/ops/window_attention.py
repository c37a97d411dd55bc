"""Shifted window attention (Swin v1/v2), batched NHWC, functional core.

Equivalent capability to reference eqxvision/models/classification/
swin.py:90-255 (cyclic shift, window partition, relative position bias,
9-region shift mask, v2 cosine attention with clamped logit scale and
log-CPB bias) — with two upgrades the reference lacked:

- **dynamic padding**: inputs need not be multiples of the window size
  (reference warned and failed, swin.py:109-112,787-790; torchvision
  pads, and so do we — same arithmetic);
- on TPU both v1 softmax(QK+bias)V and v2 cosine attention run through
  the head-packed Pallas kernel (ops/attention.py:
  packed_window_attention; swin_t b128 2811 -> 4363 img/s over the XLA
  formulation, swin_v2_t 256² 1982 -> 3601 with the in-kernel q/k
  normalize), or the whole-block fused kernel below where the block's
  weights fit in VMEM (swin_t 4688, swin_v2_t 4085 end state).

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
    _kernel_default_precision,
    _per_head_row_max,
    _prefold_bias_packed,
    _segment_softmax,
    _swin_softmax_mode,
    _use_pallas as _swin_use_pallas,
)

Array = jax.Array


# --------------------------------------------------------------------------
# Whole-block fused kernel (v1, inference): LN1 + qkv + packed window
# attention + proj + residual + LN2 + MLP + residual in ONE Pallas program
# per window group. Swin stages are memory-bound (CLAUDE.md per-half
# profile), so every avoided HBM round trip is throughput; measured on v5e
# b128 vs the packed-attention + XLA-MLP composition (scripts/ablate_swin3/
# 4.py): stage1 attn-half 3.9 -> 2.9 ms and the MLP round trips on top.
# The same fusion LOSES for ViT (matmul-bound, scripts/ablate_vit4.py) —
# this is Swin-shape specific.
# --------------------------------------------------------------------------


def _erf_f32(x):
    # Mosaic has no erf lowering (NotImplementedError: erf); use the
    # Abramowitz & Stegun 7.1.26 rational approximation, max abs error
    # 1.5e-7 — far below bf16 resolution of the surrounding activations
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_f32(x):
    # exact-erf gelu via the in-kernel erf approximation above
    return 0.5 * x * (1.0 + _erf_f32(x * (2.0**-0.5)))


@_kernel_default_precision
def _swin_block_kernel(
    *refs,
    num_heads, head_dim, cp, scale, bias_per_window, eps, gb, gw, postnorm, cosine,
    compact=False, softmax="perhead",
):
    """Gb images x Gw windows per program. ``postnorm``/``cosine``
    select Swin-v2 semantics: residuals are ``x + LN(sublayer(x))``
    (reference swin.py:586-635) and q/k are per-head L2-normalized in
    VMEM with the clamped logit scale riding in as a per-lane vector
    (gs_ref), exactly like ops/attention.py:_packed_window_kernel.

    ``compact`` keeps the softmax e/p tensors and the residual chain in
    the input dtype (bf16) instead of f32: ~0.4% relative rounding on
    the probabilities — at the resolution of the bf16 output — in
    exchange for roughly half the per-window VMEM, which buys a 2x
    bigger window/image group and halves the per-program dispatch count
    (the round-2 v2_t stage1 was 512 dispatch-bound programs/block,
    VERDICT r2 #2)."""
    if cosine:
        (x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
         g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
         bias_ref, gs_ref, seg_ref, o_ref) = refs
    else:
        (x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
         g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
         bias_ref, seg_ref, o_ref) = refs
        gs_ref = None
    _, _, L, c = x_ref.shape
    g = gb * gw
    xw = x_ref[...].reshape(g, L, c)
    dt = xw.dtype

    def ln_f32(tf, gamma, beta):
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean((tf - mu) ** 2, axis=-1, keepdims=True)
        y = (tf - mu) * jax.lax.rsqrt(var + eps)
        return y * gamma[0].astype(jnp.float32) + beta[0].astype(jnp.float32)

    # (G,L,K)@(K,N) helper: ONE flattened (G*L,K) matmul when L is
    # sublane-tile aligned (v2's L=64) — the per-window M=L loop runs
    # the MXU at a fraction of roofline and was the real stage1 bound
    # (scripts/ablate_swin7.py: halving the dispatch count left the
    # time unchanged); Mosaic can't flatten when L is unaligned (v1's
    # L=49, CLAUDE.md gotcha), so those keep the loop.
    sublane = 16 if dt == jnp.bfloat16 else 8
    aligned = L % sublane == 0

    def bmm(t, w):
        if aligned:
            # 3D x 2D contraction: Mosaic flattens (G,L,K)->(G*L,K)
            # itself (legal because L is sublane-aligned)
            return jax.lax.dot_general(
                t, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        return jnp.stack(
            [jnp.dot(t[i], w, preferred_element_type=jnp.float32) for i in range(g)]
        )

    # ---- attention half
    xf = xw.astype(jnp.float32)
    attn_in = xw if postnorm else ln_f32(xf, g1_ref, b1_ref).astype(dt)
    qkv = bmm(attn_in, wqkv_ref[...]).astype(dt)
    qkv = qkv + bqkv_ref[0].astype(dt)
    q = qkv[:, :, 0:cp]
    k = qkv[:, :, cp : 2 * cp]
    v = qkv[:, :, 2 * cp : 3 * cp]
    if cosine:
        li = jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 1)
        hseg = ((li // head_dim) == (lj // head_dim)).astype(jnp.float32)

        def headnorm(t):
            tf = t.astype(jnp.float32)
            sums = jax.lax.dot_general(
                tf * tf, hseg, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return tf * jax.lax.rsqrt(jnp.maximum(sums, 1e-24))

        q = (headnorm(q) * gs_ref[...][None]).astype(dt)
        k = headnorm(k).astype(dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cp), 2)
    kb_parts, vb_parts = [], []
    for h in range(num_heads):
        m = ((lane >= h * head_dim) & (lane < (h + 1) * head_dim)).astype(dt)
        kb_parts.append(k * m)
        vb_parts.append(v * m)
    kb = jnp.concatenate(kb_parts, axis=1)
    vb = jnp.concatenate(vb_parts, axis=1)
    s = jax.lax.dot_general(
        q, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    if bias_per_window:
        hl = s.shape[-1]
        s = (s.reshape(gb, gw, L, hl) + bias_ref[...][None]).reshape(g, L, hl)
    else:
        s = s + bias_ref[0][None]
    if softmax == "quarter":
        # H-independent quarter-power segment softmax, same formulation
        # as the packed kernel's aligned-L path (ops/attention.py:
        # _segment_softmax; NaN-safe to a 349-log-unit cross-head gap).
        # seg_ref arrives in the compute dtype under ``compact`` so the
        # two segment matmuls run bf16.
        p = _segment_softmax(s, seg_ref[...]).astype(dt)
    else:
        # "global" relies on the HOST having prefolded the per-segment
        # bias max (_prefold_bias_packed) — NaN-safe up to a ~88-unit
        # qk row spread with the guarded denominator degrading to zero
        # beyond; "perhead" is the exact-but-H-VPU-pass round-3 loop.
        if softmax == "perhead":
            m = _per_head_row_max(s, num_heads, L)
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
        sm = s - m
        if compact:
            # bf16 e/p: seg_ref arrives in dt so the segment-sum matmul
            # has uniform input dtype (f32 accumulation keeps the
            # denominator exact-ish); 1/denom rounds to dt — ~0.4%
            # relative on p, the bf16 output's own resolution
            e = jnp.exp(sm.astype(dt))
            denom = jax.lax.dot_general(
                e, seg_ref[...], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            p = e * (1.0 / jnp.maximum(denom, 1e-37)).astype(dt)
        else:
            e = jnp.exp(sm)
            denom = jax.lax.dot_general(
                e, seg_ref[...], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            p = (e / jnp.maximum(denom, 1e-37)).astype(dt)
    attn = jax.lax.dot_general(
        p, vb, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dt)
    proj = bmm(attn, wproj_ref[...]) + bproj_ref[0].astype(jnp.float32)  # f32 (g, L, c)
    if compact:
        # residual chain in dt (matches the composed bf16 path's adds)
        h1 = xw + (ln_f32(proj, g1_ref, b1_ref) if postnorm else proj).astype(dt)
        h1f = None
    else:
        h1f = xf + (ln_f32(proj, g1_ref, b1_ref) if postnorm else proj)
        h1 = h1f.astype(dt)

    # ---- MLP half
    if postnorm:
        mlp_in = h1
    elif compact:
        mlp_in = ln_f32(h1.astype(jnp.float32), g2_ref, b2_ref).astype(dt)
    else:
        mlp_in = ln_f32(h1f, g2_ref, b2_ref).astype(dt)
    hmid = _gelu_f32(bmm(mlp_in, wfc1_ref[...]) + bfc1_ref[0].astype(jnp.float32)).astype(dt)
    mlp = bmm(hmid, wfc2_ref[...]) + bfc2_ref[0].astype(jnp.float32)
    if compact:
        out = h1 + (ln_f32(mlp, g2_ref, b2_ref) if postnorm else mlp).astype(dt)
    else:
        out = h1f + (ln_f32(mlp, g2_ref, b2_ref) if postnorm else mlp)
    o_ref[...] = out.reshape(o_ref.shape).astype(o_ref.dtype)


def _pad_qkv_weight(qkv_weight: Array, qkv_bias: Optional[Array], c: int, cp: int, dtype):
    wq, wk, wv = jnp.split(qkv_weight.astype(dtype), 3, axis=1)
    zc = ((0, 0), (0, cp - c))
    wqkv_p = jnp.concatenate([jnp.pad(wq, zc), jnp.pad(wk, zc), jnp.pad(wv, zc)], axis=1)
    if qkv_bias is not None:
        bq, bk, bv = jnp.split(qkv_bias, 3)
        zb = (0, cp - c)
        bqkv_p = jnp.concatenate([jnp.pad(bq, zb), jnp.pad(bk, zb), jnp.pad(bv, zb)]).astype(dtype)
    else:
        bqkv_p = jnp.zeros((3 * cp,), dtype)
    return wqkv_p, bqkv_p


def _pack_bias(relative_position_bias: Array, ph, pw, wh, ww, sh, sw, num_heads, L, shifted):
    bias_hll = relative_position_bias.reshape(num_heads, L, L)[None]
    if shifted:
        mask = jnp.asarray(_shift_attention_mask(ph, pw, wh, ww, sh, sw))
        bias_hll = bias_hll + mask[:, None]
    return jnp.transpose(bias_hll, (0, 2, 1, 3)).reshape(bias_hll.shape[0], L, num_heads * L)


def fused_swin_block_supported(c: int, hidden: int, num_heads: int, L: int, itemsize: int = 2) -> bool:
    """Measured dispatch policy (v5e, swin_t b128 per-stage prefix
    timing, /tmp-style toggle run recorded in CLAUDE.md): whole-block
    fusion wins at C=96 (stage1 13.0 -> 10.9 ms), is neutral at C=192,
    and LOSES at C=384 (7.5 -> 9.1 ms) — at wide channels the per-window
    M=49 in-kernel matmuls underutilize the MXU while the MLP FLOPs
    dominate, exactly the regime where XLA's batched-token matmuls are
    already at roofline (same reason the ViT block fusion lost,
    scripts/ablate_vit4.py). Also requires the block's weights + segment
    matrix to fit in VMEM (stage4 C=768 wouldn't anyway).

    Deep-variant confirmation (scripts/ablate_swin12.py, r5 on-chip
    in-process A/B; kernel-vs-XLA logit parity checked first, incl. the
    previously unexercised H=32 v2_b stage4, max|dlogit| <= 5e-3 f32):
    disabling this gate's fused blocks costs +5.5% time on swin_s b128
    (44.2 ms default), +10.5% on swin_v2_s b128 (55.1 ms), +9.0% on
    swin_v2_b b64 256^2 (40.7 ms); disabling the packed kernels costs
    +47.2% / +40.6% / +23.5% respectively; softmax=unsafe saves <=0.3%
    on all three, i.e. NaN-safety stays free at depth. The -T-tuned
    policy ships unchanged for the deeper variants."""
    if c > 192:
        return False
    HL = num_heads * L
    weights_bytes = (c * 3 * (-(-c // 128) * 128) + (-(-c // 128) * 128) * c + 2 * c * hidden) * itemsize
    seg_bytes = HL * HL * 4
    act_bytes = L * (c * 3 + 4 * (-(-c // 128) * 128) + hidden) * 4 + 4 * L * HL * 4 + 2 * HL * (-(-c // 128) * 128) * itemsize
    return weights_bytes + seg_bytes + act_bytes < 11 * 1024 * 1024


def fused_swin_block_v1(x: Array, **kw) -> Array:
    """One Swin v1 block (pre-norm, inference) as a single fused Pallas
    pass over window groups. Semantics match
    ``x + proj(attn(LN1(x))); x + fc2(gelu(fc1(LN2(x))))`` with
    torchvision's shifted-window attention (reference swin.py:525-583);
    interpret-mode parity is tested against the composed module in
    tests/test_ops.py. Inference only (no dropout/droppath sampling) —
    callers gate on ``inference``.
    """
    return _fused_swin_block(x, logit_scale=None, postnorm=False, **kw)


def fused_swin_block_v2(x: Array, *, logit_scale, **kw) -> Array:
    """One Swin v2 block (post-norm residuals + cosine attention,
    reference swin.py:586-635) as a single fused Pallas pass:
    ``x + LN1(proj(cosattn(x))); x + LN2(fc2(gelu(fc1(x))))`` with the
    per-head q/k normalization done in VMEM (see _swin_block_kernel).
    The k-bias is zeroed by the CALLER (torchvision zeroes the middle
    third each forward). Inference only."""
    return _fused_swin_block(x, logit_scale=logit_scale, postnorm=True, **kw)


def _fused_swin_block(
    x: Array,
    *,
    norm1_w, norm1_b, qkv_weight, qkv_bias, proj_weight, proj_bias,
    relative_position_bias, norm2_w, norm2_b,
    fc1_weight, fc1_bias, fc2_weight, fc2_bias,
    window_size, shift_size, num_heads, eps: float = 1e-5,
    logit_scale=None, postnorm: bool = False,
) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools as _ft

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
    nw, L = xw.shape[1], wh * ww
    cp = -(-c // 128) * 128
    HL = num_heads * L
    hd = c // num_heads
    scale = hd**-0.5

    cosine = logit_scale is not None
    if cosine:
        scale = 1.0
    wqkv_p, bqkv_p = _pad_qkv_weight(qkv_weight, qkv_bias, c, cp, x.dtype)
    wproj_p = jnp.pad(proj_weight.astype(x.dtype), ((0, cp - c), (0, 0)))
    bproj = (proj_bias if proj_bias is not None else jnp.zeros((c,))).astype(jnp.float32)
    bias_packed = _pack_bias(relative_position_bias, ph, pw, wh, ww, sh, sw, num_heads, L, shifted)
    # Softmax policy (EQXVISION_TPU_SWIN_SOFTMAX; measured in-process on
    # v5e b128, scripts/ablate_swin10.py). The whole-block kernel only
    # runs C<=192 stages, i.e. H<=6, which flips the packed kernel's
    # aligned-L preference: the quarter-power _segment_softmax (two
    # extra segment matmuls, H-independent) LOSES to the per-head
    # masked-max loop at H=3/6 (v2 stage1 6.547 vs 5.912 ms/block,
    # stage2 3.423 vs 3.284; swin_v2_t e2e 33.94 vs 32.56 ms), while
    # v1's bias-max prefold + global row max is FREE (stage1 5.739 ms
    # vs 5.858 unsafe / 6.438 perhead; swin_t e2e 27.17 ms == the
    # round-2 NaN-unsafe 27.16, recovering the round-3 -8% regression).
    # The prefold bound only covers the raw qk spread (~88 log-units),
    # which v2's clamped-logit-scale cosine scores (±100/head) can
    # exceed — cosine therefore keeps the exact per-head max, at ~1%
    # e2e vs unsafe (32.56 vs 32.24 ms).
    mode = _swin_softmax_mode()
    if mode == "perhead":
        softmax = "perhead"
    elif mode == "unsafe":
        softmax = "global"
    elif mode == "quarter" and L % 16 == 0:
        softmax = "quarter"
    elif cosine:
        softmax = "perhead"
    else:
        softmax = "global"
        bias_packed = _prefold_bias_packed(bias_packed, num_heads, L)
    bias_per_window = bias_packed.shape[0] == nw and nw > 1
    seg = jnp.asarray(
        (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 0) // L)
        == (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 1) // L),
        jnp.float32,
    )
    hidden = fc1_weight.shape[1]

    itemsize = x.dtype.itemsize
    weights_bytes = (c * 3 * cp + cp * c + c * hidden * 2) * itemsize + HL * HL * 4
    # compact mode: bf16 softmax e/p (so the segment-sum matmul runs on
    # the bf16 MXU path instead of f32) and residual adds in the input
    # dtype. Same-process A/B (scripts/ablate_swin7.py, swin_v2_t 256²
    # b128): compact 31.23 ms (4099 img/s) vs 32.10 (3988) — default
    # ON for bf16 inputs with sublane-aligned L (v2's 64; v1's L=49
    # can't flatten the bf16 (g, L, HL) segment dot — Mosaic
    # "unsupported shape cast", the CLAUDE.md reshape gotcha — and
    # keeps the f32 path). EQXVISION_TPU_SWIN_BLOCK_COMPACT=0 reverts.
    # Bigger-group configs compact was built to enable measured neutral
    # (gw16gb2/gw32gb1 within noise; gw32gb2 exceeds scoped VMEM):
    # stage1 is bound by in-kernel serial VPU+small-matmul work, not
    # dispatch (ablate_swin7/8).
    compact = (
        itemsize == 2
        and L % 16 == 0
        and os.environ.get("EQXVISION_TPU_SWIN_BLOCK_COMPACT", "1") == "1"
    )

    def act_bytes(g):
        if softmax == "quarter":
            # _segment_softmax live set (matches the packed kernel's
            # charge): ~6 f32 (g, L, HL) temps + 2 compute-dtype casts
            score = L * HL * (6 * 4 + 2 * itemsize)
        elif compact:
            score = L * HL * (8 + 2 * itemsize)
        else:
            score = 4 * L * HL * 4
        resid = L * c * (2 * itemsize if compact else 8)
        return g * (
            L * (c * 3 + 3 * cp + cp + hidden) * max(itemsize, 2)
            + score
            + resid
            + 2 * HL * cp * itemsize
            + (2 * L * cp * 4 if cosine else 0)
        )

    gw_cap = int(os.environ.get("EQXVISION_TPU_SWIN_GW", "0"))
    gb_force = int(os.environ.get("EQXVISION_TPU_SWIN_GB", "0"))
    gw = 1
    for g in range(min(nw, gw_cap or 16), 1, -1):  # any divisor (dynamic padding can give odd nW)
        if nw % g == 0 and (g == gw_cap or weights_bytes + act_bytes(g) < 11 * 1024 * 1024):
            gw = g
            break
    gb = 1
    if gb_force:
        # explicit override wins in BOTH directions (a 4-before-2 loop
        # would silently ignore a forced smaller group whenever the
        # larger one fits the budget)
        if n % gb_force == 0:
            gb = gb_force
    else:
        for g in (4, 2):
            if n % g == 0 and weights_bytes + act_bytes(gw * g) < 15 * 1024 * 1024:
                gb = g
                break
    # Grid: window-groups OUTER, images INNER — the bias/seg blocks keep
    # the same index across the inner loop so the pipeline skips
    # re-fetching them (same fix as _packed_window_attention).
    if bias_per_window:
        bspec = pl.BlockSpec((gw, L, HL), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    else:
        bspec = pl.BlockSpec((1, L, HL), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, j, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((gb, gw, L, c), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
        const((1, c)), const((1, c)),
        const((c, 3 * cp)), const((1, 3 * cp)),
        const((cp, c)), const((1, c)),
        const((1, c)), const((1, c)),
        const((c, hidden)), const((1, hidden)),
        const((hidden, c)), const((1, c)),
        bspec,
    ]
    args = [
        xw,
        norm1_w.astype(x.dtype)[None], norm1_b.astype(x.dtype)[None],
        wqkv_p, bqkv_p[None],
        wproj_p, bproj[None],
        norm2_w.astype(x.dtype)[None], norm2_b.astype(x.dtype)[None],
        fc1_weight.astype(x.dtype), fc1_bias.astype(jnp.float32)[None],
        fc2_weight.astype(x.dtype), fc2_bias.astype(jnp.float32)[None],
        bias_packed.astype(jnp.float32),
    ]
    if cosine:
        gs = jnp.exp(jnp.minimum(logit_scale, jnp.log(100.0))).reshape(num_heads)
        gs_lanes = jnp.repeat(gs.astype(jnp.float32), hd, total_repeat_length=c)
        args.append(jnp.pad(gs_lanes, (0, cp - c))[None])
        in_specs.append(const((1, cp)))
    in_specs.append(const((HL, HL)))
    args.append(seg.astype(x.dtype) if compact else seg)
    out = pl.pallas_call(
        _ft.partial(
            _swin_block_kernel,
            num_heads=num_heads, head_dim=hd, cp=cp, scale=scale,
            bias_per_window=bias_per_window, eps=eps,
            gb=gb, gw=gw, postnorm=postnorm, cosine=cosine, compact=compact,
            softmax=softmax,
        ),
        out_shape=jax.ShapeDtypeStruct((n, nw, L, c), x.dtype),
        grid=(nw // gw, n // gb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gb, gw, L, c), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * nw * L * (c * 3 * cp + HL * (2 * cp + HL) + cp * c + 2 * c * hidden),
            bytes_accessed=n * nw * L * c * itemsize * 2,
            transcendentals=n * nw * L * (HL + hidden),
        ),
    )(*args)

    y = window_unpartition(out, ph, pw, wh, ww)
    if shifted:
        y = jnp.roll(y, (sh, sw), axis=(1, 2))
    return y[:, :h, :w, :]


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
    # v2 (cosine) runs through the packed kernel too, with the per-head
    # q/k L2 normalization done INSIDE the kernel (the round-2 attempt
    # normalized in XLA — two extra HBM passes over the full qkv tensor
    # — and grouped only along nW=49's divisors: 53.0 ms vs 47.6 XLA;
    # the in-kernel normalize + image-grouped dispatch flip it to a
    # win). The in-kernel normalize needs sublane-aligned L for its
    # (g, L, Cp) x (Cp, Cp) f32 dot (Mosaic reshape rule, CLAUDE.md).
    use_packed = (
        _swin_use_pallas(L, c // num_heads)
        and not (attention_dropout > 0.0 and not inference)
        and os.environ.get("EQXVISION_TPU_SWIN_PACKED") != "0"
        and (
            logit_scale is None
            or (L % 8 == 0 and os.environ.get("EQXVISION_TPU_SWIN_PACKED_V2") != "0")
        )
    )
    if use_packed:
        # Head-packed Pallas path (the measured Swin win, see
        # ops/attention.py:_packed_window_kernel). The qkv projection
        # weight's output sections are zero-padded to Cp = round_up(C,
        # 128) lanes so q/k/v are exact lane-tile slices in the kernel,
        # and the proj weight is row-padded to consume the kernel's
        # padded output with no slicing. v2's cosine attention reuses the
        # same kernel: q/k are L2-normalized per head in XLA (cheap
        # elementwise passes) with the clamped logit scale folded into q,
        # then the kernel runs with scale=1.
        cp = -(-c // 128) * 128
        if logit_scale is not None and qkv_bias is not None:
            # v2: k has no bias (reference swin.py:369-522; torchvision
            # zeroes the middle third each forward)
            qkv_bias = qkv_bias.at[c : 2 * c].set(0.0)
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
        if logit_scale is not None:
            # v2 cosine: the clamped logit scale rides into the kernel,
            # which normalizes q/k per head in VMEM (no HBM passes)
            cosine_gs = jnp.exp(jnp.minimum(logit_scale, jnp.log(100.0))).reshape(num_heads)
            scale = 1.0
        else:
            cosine_gs = None
            scale = (c // num_heads) ** -0.5
        bias_hll = relative_position_bias.reshape(num_heads, L, L)[None]  # (1, H, L, L)
        if shifted:
            mask = jnp.asarray(_shift_attention_mask(ph, pw, wh, ww, sh, sw))
            bias_hll = bias_hll + mask[:, None]  # (nW, H, L, L)
        bias_packed = jnp.transpose(bias_hll, (0, 2, 1, 3)).reshape(
            bias_hll.shape[0], L, num_heads * L
        )
        outp = packed_window_attention(qkvp, bias_packed, num_heads, c, scale, cosine_gs=cosine_gs)
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
        # XLA batched-GEMM attention — the fallback when the packed
        # kernel can't run (CPU, v2 cosine path, train-mode attention
        # dropout). Round-1 note: XLA beat the first two Pallas
        # formulations (swin_t b128: XLA 2142 img/s vs grouped kernel
        # 1713 vs windowed-qkv 1124); the round-2 head-packed kernel
        # above beats XLA (4363 img/s; attention.py has the numbers).
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
