"""Fused multi-head attention for vision transformers.

The reference computed attention as separate jnp matmuls per sample
under vmap (reference vit.py:62-76). Here the hot path is a Pallas TPU
kernel that keeps the whole (padded) score matrix in VMEM and fuses
QK^T -> bias -> softmax -> PV into one pass with f32 accumulation.
Vision sequence lengths are tiny (ViT-B/16: 197 tokens; Swin windows:
49-64 tokens), so a single-block fused kernel per (batch, head) is the
right shape — flash-style online softmax tiling would only add overhead
(SURVEY.md §5 long-context: blockwise attention so it stays in VMEM).

``attention()`` dispatches: Pallas on TPU, pure-XLA reference elsewhere
(or when ``EQXVISION_TPU_NO_PALLAS=1``). Both paths are numerically
equivalent (tested in tests/test_ops_attention.py) and both support an
additive bias (Swin's relative-position bias + shift mask).
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_pallas(n: int = 0, dh: int = 0) -> bool:
    """Dispatch policy, measured on TPU v5e (bench.py):

    the kernels win only when they consume the surrounding ops' natural
    layouts (fused_qkv_attention: ViT-B/16 3026 vs 2196 img/s). On
    standalone contiguous q/k/v the grouped kernel beats XLA (ViT shape
    2.28 vs 5.28 ms), but IN CONTEXT XLA fuses the head transposes into
    its batched GEMMs while an opaque kernel forces materialisation —
    Swin via attention() measured 1713 (kernel) vs 2142 (XLA) img/s.
    Swin's round-2 fix is packed_window_attention (below): tile-aligned
    layouts by construction, swin_t 2811 -> 4363 img/s over the XLA
    path. Disable kernels everywhere with EQXVISION_TPU_NO_PALLAS=1.
    """
    if os.environ.get("EQXVISION_TPU_NO_PALLAS") == "1":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Plain-XLA scaled dot-product attention.

    q,k,v: (..., N, Dh); bias broadcastable to (..., N, N).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("...nd,...md->...nm", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...nm,...md->...nd", p.astype(q.dtype), v, preferred_element_type=jnp.float32).astype(q.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_compute(q, k, v, bias, *, scale: float, n_valid: int, bias_repeat: int = 1):
    """Fused softmax(q k^T * scale + bias) v for a (G, Np, Dh) group.

    Grouping amortises per-program overhead (G=1 at ViT-B shapes left
    ~3072 programs of ~1us dispatch each dominating the runtime)."""
    g, npad, dh = q.shape
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # (G, Np, Np)
    if bias is not None:
        bias = bias.astype(jnp.float32)  # (G//bias_repeat, Np, Np)
        if bias_repeat > 1:
            s = s.reshape(bias_repeat, bias.shape[0], npad, npad) + bias[None]
            s = s.reshape(g, npad, npad)
        else:
            s = s + bias
    if n_valid < npad:
        col = jax.lax.broadcasted_iota(jnp.int32, (g, npad, npad), 2)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    return jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _kernel_default_precision(fn):
    """Pallas kernel bodies trace under the caller's ambient
    ``jax_default_matmul_precision``; HIGHEST makes Mosaic reject bf16
    dots outright ("Bad lhs type" compile failure — found via the
    on-TPU parity suite, whose conftest pins HIGHEST for the CPU
    golden tests). The kernels manage precision explicitly
    (``preferred_element_type=f32`` accumulation), so pin DEFAULT for
    every op they trace regardless of ambient config."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("default"):
            return fn(*args, **kwargs)

    return wrapped


@_kernel_default_precision
def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, n_valid: int, bias_repeat: int = 1):
    bias = bias_ref[...] if bias_ref is not None else None
    o = _attn_compute(
        q_ref[...], k_ref[...], v_ref[...], bias,
        scale=scale, n_valid=n_valid, bias_repeat=bias_repeat,
    )
    o_ref[...] = o.astype(o_ref.dtype)


def _attention_pallas(q, k, v, bias, scale):
    """q,k,v: (B, N, Dh) flattened over batch*heads.

    bias: (Bb, N, N) or None, with B % Bb == 0 — the kernel re-reads the
    same bias block for every batch repeat instead of materialising a
    per-batch copy in HBM (Swin's window bias is shared across the
    batch: (nW*heads, L, L) vs B = batch*nW*heads).

    The win over XLA at vision shapes is avoiding HBM materialisation of
    the (B, N, N) f32 logits between the two matmuls — attention FLOPs
    are negligible (K = Dh <= 64), it's all memory traffic. N is padded
    only to sublane granularity (8/16), not 128: Mosaic pads lanes
    internally and padded key columns are masked to -inf.
    """
    b, n, dh = q.shape
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    npad = max(_round_up(n, sublane), sublane)
    dpad = dh
    bb = bias.shape[0] if bias is not None else b

    # Group size G: amortise per-program dispatch overhead (G=1 at
    # ViT-B/16 b256 means 3072 ~1us programs dominating), bounded by
    # VMEM for the (G, Np, Np-lanes) f32 logits; must divide b, and
    # divide-or-be-a-multiple-of the bias batch so each program reads
    # one contiguous bias block.
    lane_pad = _round_up(npad, 128)
    vmem_budget = 8 * 1024 * 1024
    G = 1
    for g in (32, 16, 8, 4, 2):
        if b % g:
            continue
        if bias is not None and (bb % g and g % bb):
            continue
        if g * npad * lane_pad * 4 + 4 * g * npad * max(dpad, 128) * 2 > vmem_budget:
            continue
        G = g
        break
    gb = min(G, bb) if bias is not None else G

    def pad(x, target_n, target_d):
        return jnp.pad(x, ((0, 0), (0, target_n - x.shape[1]), (0, target_d - x.shape[2])))

    qp, kp, vp = pad(q, npad, dpad), pad(k, npad, dpad), pad(v, npad, dpad)
    in_specs = [
        pl.BlockSpec((G, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if bias is not None and b % bb == 0:
        # 2D grid: bias block outer, batch-repeat inner. The inner loop
        # keeps the same bias block index, so Mosaic's pipeline skips
        # re-fetching it — without this, bias reads double the HBM
        # traffic at Swin shapes (bias is as big as a qkv slice).
        r = b // bb
        bp = jnp.pad(bias, ((0, 0), (0, npad - n), (0, npad - n)))
        q4 = qp.reshape(r, bb, npad, dpad)
        k4 = kp.reshape(r, bb, npad, dpad)
        v4 = vp.reshape(r, bb, npad, dpad)
        spec4 = pl.BlockSpec((1, gb, npad, dpad), lambda j, i: (i, j, 0, 0), memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((gb, npad, npad), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM)

        @_kernel_default_precision
        def kernel4(q_ref, k_ref, v_ref, b_ref, o_ref):
            o = _attn_compute(
                q_ref[0], k_ref[0], v_ref[0], b_ref[...], scale=scale, n_valid=n
            )
            o_ref[0] = o.astype(o_ref.dtype)

        out = pl.pallas_call(
            kernel4,
            out_shape=jax.ShapeDtypeStruct((r, bb, npad, dpad), q.dtype),
            grid=(bb // gb, r),
            in_specs=[spec4, spec4, spec4, bspec],
            out_specs=spec4,
            cost_estimate=pl.CostEstimate(
                flops=4 * b * npad * npad * dpad,
                bytes_accessed=b * npad * dpad * 4 * 4,
                transcendentals=b * npad * npad,
            ),
        )(q4, k4, v4, bp)
        return out.reshape(b, npad, dpad)[:, :n, :dh]

    if bias is not None:
        bp = jnp.pad(bias, ((0, 0), (0, npad - n), (0, npad - n)))
        nb_blocks = max(bb // gb, 1)
        in_specs.append(
            pl.BlockSpec(
                (gb, npad, npad),
                lambda i, _nb=nb_blocks: (i % _nb, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bp)
        kernel = functools.partial(_attn_kernel, scale=scale, n_valid=n, bias_repeat=G // gb)
    else:

        def kernel(q_ref, k_ref, v_ref, o_ref):
            _attn_kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale, n_valid=n)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, npad, dpad), q.dtype),
        grid=(b // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * npad * npad * dpad,
            bytes_accessed=b * npad * dpad * 4 * 4,
            transcendentals=b * npad * npad,
        ),
    )(*args)
    return out[:, :n, :dh]


@_kernel_default_precision
def _qkv_attn_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int, scale: float):
    """A group of G batch rows: qkv_ref (G, L, 3*H*Dh) -> o_ref (G, L, H*Dh).

    Consumes the fused qkv projection's natural layout and writes the
    proj input's natural layout, so the surrounding matmuls need zero
    transposes or padding copies (XLA fuses its attention into the
    neighbouring layout ops; an opaque kernel must do the same by
    construction). Head slices are 64-lane-aligned static slices;
    Mosaic's internal tile padding keeps logical shapes exact, so no
    validity masking is needed. Rows are grouped per program (batched
    dot_general over G) to amortise the ~5us program dispatch."""
    rows = qkv_ref[...]  # (G, L, 3D)
    d = num_heads * head_dim
    for h in range(num_heads):
        q = rows[:, :, h * head_dim : (h + 1) * head_dim]
        k = rows[:, :, d + h * head_dim : d + (h + 1) * head_dim]
        v = rows[:, :, 2 * d + h * head_dim : 2 * d + (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # (G, L, L)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * head_dim : (h + 1) * head_dim] = o.astype(o_ref.dtype)


@_kernel_default_precision
def _qkv_attn_kernel_pair(qkv_ref, o_ref, *, num_heads: int, head_dim: int, scale: float):
    """Pair-packed variant of _qkv_attn_kernel for head_dim=64: process
    heads two at a time so every q/k/v slice is a 128-lane tile (the
    single-head path slices at 64-lane offsets — half of them mid-tile,
    each costing a VMEM relayout; the same failure mode the Swin packed
    kernel fixed). The two heads sharing a 128-lane slab stay separate
    via lane masks on q (scores) and v (output): contracting the full
    128 lanes of ``q*mask_lo @ k2^T`` is exact because the masked-out
    head's lanes contribute zero. 2x score/PV matmul FLOPs vs the true
    computation — attention FLOPs are negligible at vision shapes, the
    kernel is memory/relayout-bound."""
    rows = qkv_ref[...]  # (G, L, 3D)
    d = num_heads * head_dim
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * head_dim), 2)
    mlo = (lane < head_dim).astype(rows.dtype)
    mhi = (lane >= head_dim).astype(rows.dtype)

    def halfattn(qm, k2, v2, vmask):
        s = jax.lax.dot_general(
            qm, k2, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # (G, L, L)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(rows.dtype)
        return jax.lax.dot_general(
            p, v2 * vmask, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    for hp in range(num_heads // 2):
        w = 2 * head_dim
        q2 = rows[:, :, hp * w : (hp + 1) * w]
        k2 = rows[:, :, d + hp * w : d + (hp + 1) * w]
        v2 = rows[:, :, 2 * d + hp * w : 2 * d + (hp + 1) * w]
        o = halfattn(q2 * mlo, k2, v2, mlo) + halfattn(q2 * mhi, k2, v2, mhi)
        o_ref[:, :, hp * w : (hp + 1) * w] = o.astype(o_ref.dtype)
    if num_heads % 2:
        h = num_heads - 1
        q = rows[:, :, h * head_dim : (h + 1) * head_dim]
        k = rows[:, :, d + h * head_dim : d + (h + 1) * head_dim]
        v = rows[:, :, 2 * d + h * head_dim : 2 * d + (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(rows.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o_ref[:, :, h * head_dim : (h + 1) * head_dim] = o.astype(o_ref.dtype)


def _fused_qkv_reference(qkv: jax.Array, num_heads: int, scale: float) -> jax.Array:
    b, l, three_d = qkv.shape
    d = three_d // 3
    head_dim = d // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return jnp.transpose(t.reshape(b, l, num_heads, head_dim), (0, 2, 1, 3))

    o = attention_reference(heads(q), heads(k), heads(v), None, scale)
    return jnp.transpose(o, (0, 2, 1, 3)).reshape(b, l, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fused_qkv_attention(qkv: jax.Array, num_heads: int, scale: float) -> jax.Array:
    b, l, three_d = qkv.shape
    d = three_d // 3
    head_dim = d // num_heads
    if not _use_pallas(l, head_dim):
        return _fused_qkv_reference(qkv, num_heads, scale)
    g = 1
    for cand in (4, 2):
        if b % cand == 0 and cand * l * (3 * d + d) * qkv.dtype.itemsize + cand * l * l * 4 < 7 * 1024 * 1024:
            g = cand
            break
    # pair-packed default ON at head_dim=64: e2e vit_b16 b256 measured
    # 3933/3935 vs 3877/3873 img/s across two A/B reps (ablate_vit6.py)
    pair = head_dim == 64 and num_heads >= 2 and os.environ.get("EQXVISION_TPU_VIT_PAIR") != "0"
    kernel = _qkv_attn_kernel_pair if pair else _qkv_attn_kernel
    return pl.pallas_call(
        functools.partial(kernel, num_heads=num_heads, head_dim=head_dim, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
        grid=(b // g,),
        in_specs=[pl.BlockSpec((g, l, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * l * l * head_dim,
            bytes_accessed=b * l * (3 * d + d) * 2,
            transcendentals=b * num_heads * l * l,
        ),
    )(qkv)


def _fused_qkv_fwd(qkv, num_heads, scale):
    return _fused_qkv_attention(qkv, num_heads, scale), qkv


def _fused_qkv_bwd(num_heads, scale, qkv, g):
    # backward through the XLA reference (kernels need no AD rule;
    # training throughput is XLA-level, fine for fine-tuning)
    _, vjp = jax.vjp(lambda t: _fused_qkv_reference(t, num_heads, scale), qkv)
    return vjp(g)


_fused_qkv_attention.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


def fused_qkv_attention(qkv: jax.Array, num_heads: int, scale: Optional[float] = None) -> jax.Array:
    """Multi-head attention directly on a fused qkv projection.

    qkv: (B, L, 3*D) laid out [q_heads | k_heads | v_heads] (the torch
    ``nn.Linear(dim, 3*dim)`` convention). Returns (B, L, D) ready for
    the output projection. On TPU this is a single Pallas kernel per
    batch row consuming/producing the projections' natural layouts —
    measured 2.36 ms for a full ViT-B/16 b256 attention layer vs 5.38 ms
    for the best XLA formulation. Differentiable (reference-path VJP).
    """
    d = qkv.shape[-1] // 3
    head_dim = d // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    return _fused_qkv_attention(qkv, num_heads, scale)


def _attention_flat_reference(q, k, v, bias, scale):
    """XLA reference over flattened (B, N, Dh) with compact (Bb, N, N)
    bias broadcast over B // Bb repeats."""
    if bias is None:
        return attention_reference(q, k, v, None, scale)
    b, n, dh = q.shape
    bb = bias.shape[0]
    r = b // bb
    out = attention_reference(
        q.reshape(r, bb, n, dh), k.reshape(r, bb, n, dh), v.reshape(r, bb, n, dh),
        bias[None], scale,
    )
    return out.reshape(b, n, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attn_flat_nobias(q, k, v, scale):
    return _attention_pallas(q, k, v, None, scale)


_attn_flat_nobias.defvjp(
    lambda q, k, v, scale: (_attn_flat_nobias(q, k, v, scale), (q, k, v)),
    lambda scale, res, g: jax.vjp(
        lambda q, k, v: _attention_flat_reference(q, k, v, None, scale), *res
    )[1](g),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attn_flat_bias(q, k, v, bias, scale):
    return _attention_pallas(q, k, v, bias, scale)


_attn_flat_bias.defvjp(
    lambda q, k, v, bias, scale: (_attn_flat_bias(q, k, v, bias, scale), (q, k, v, bias)),
    lambda scale, res, g: jax.vjp(
        lambda q, k, v, bias: _attention_flat_reference(q, k, v, bias, scale), *res
    )[1](g),
)


@_kernel_default_precision
def _window_qkv_kernel(qkv_ref, bias_ref, o_ref, *, num_heads: int, head_dim: int, scale: float, bias_per_window: bool):
    """A group of Gw windows of one image: qkv_ref (1, Gw, L, 3*H*Dh),
    bias_ref (Gw|1, H, L, L), o_ref (1, Gw, L, H*Dh)."""
    gw = qkv_ref.shape[1]
    d = num_heads * head_dim
    for w in range(gw):
        row = qkv_ref[0, w]  # (L, 3D)
        bw = w if bias_per_window else 0
        for h in range(num_heads):
            q = row[:, h * head_dim : (h + 1) * head_dim]
            k = row[:, d + h * head_dim : d + (h + 1) * head_dim]
            v = row[:, 2 * d + h * head_dim : 2 * d + (h + 1) * head_dim]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            s = s + bias_ref[bw, h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            o_ref[0, w, :, h * head_dim : (h + 1) * head_dim] = o.astype(o_ref.dtype)


def _window_qkv_reference(qkv, bias, num_heads, scale):
    b, nw, l, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return jnp.transpose(t.reshape(b, nw, l, num_heads, hd), (0, 1, 3, 2, 4))

    o = attention_reference(heads(q), heads(k), heads(v), bias[None], scale)
    return jnp.transpose(o, (0, 1, 3, 2, 4)).reshape(b, nw, l, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _window_qkv_attention(qkv, bias, num_heads, scale):
    b, nw, l, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    if not _use_pallas(l, hd):
        return _window_qkv_reference(qkv, bias, num_heads, scale)
    bias_per_window = bias.shape[0] == nw and nw > 1
    # group windows per program to amortise ~5us dispatch; bias grouped
    # alongside when per-window
    gw = 1
    for g in (16, 8, 4, 2):
        if nw % g == 0 and g * l * three_d * qkv.dtype.itemsize < 4 * 1024 * 1024:
            gw = g
            break
    bias_f32 = bias.astype(jnp.float32)
    if bias_per_window:
        bspec = pl.BlockSpec(
            (gw,) + bias.shape[1:], lambda i, j: (j, 0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        bspec = pl.BlockSpec(
            (1,) + bias.shape[1:], lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
        )
    return pl.pallas_call(
        functools.partial(
            _window_qkv_kernel, num_heads=num_heads, head_dim=hd, scale=scale,
            bias_per_window=bias_per_window,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nw, l, d), qkv.dtype),
        grid=(b, nw // gw),
        in_specs=[
            pl.BlockSpec((1, gw, l, three_d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            bspec,
        ],
        out_specs=pl.BlockSpec((1, gw, l, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nw * num_heads * l * l * hd,
            bytes_accessed=b * nw * l * 4 * d * qkv.dtype.itemsize,
            transcendentals=b * nw * num_heads * l * l,
        ),
    )(qkv, bias_f32)


_window_qkv_attention.defvjp(
    lambda qkv, bias, nh, sc: (_window_qkv_attention(qkv, bias, nh, sc), (qkv, bias)),
    lambda nh, sc, res, g: jax.vjp(
        lambda qkv, bias: _window_qkv_reference(qkv, bias, nh, sc), *res
    )[1](g),
)


def window_qkv_attention(qkv: jax.Array, bias: jax.Array, num_heads: int, scale: float) -> jax.Array:
    """Windowed multi-head attention on fused qkv windows (Swin).

    qkv: (B, nW, L, 3*D); bias: (nW | 1, heads, L, L) additive
    (relative-position bias [+ shift mask]). Returns (B, nW, L, D) —
    same natural layouts as the surrounding projections, so no
    transposes materialise around the kernel. Differentiable.
    """
    return _window_qkv_attention(qkv, bias, num_heads, scale)


def _swin_softmax_mode() -> str:
    """Packed-window softmax policy (in-process A/B knob):

    - ``safe`` (default): NaN-safe at the measured-minimal cost. Aligned
      L uses the quarter-power _segment_softmax; unaligned L (v1's 49)
      prefolds the per-(window, row, head) bias max into the packed bias
      OUTSIDE the kernel (_prefold_bias_packed) so the kernel's plain
      global row max is safe — see _prefold_bias_packed for the bound.
    - ``perhead``: the round-3 formulation (f32 masked per-head row max
      loop for unaligned L) — exact per-head shift, H VPU-pass cost;
      measured -8% e2e on swin_t (VERDICT r3 weak #1).
    - ``unsafe``: plain global row max with no prefold (the round-2
      formulation) — the speed floor; NaNs when a head's whole segment
      sits > ~88 log-units below the row max (ADVICE r2).
    """
    return os.environ.get("EQXVISION_TPU_SWIN_SOFTMAX", "safe")


def _prefold_bias_packed(bias_packed, num_heads: int, L: int):
    """Subtract each (window, row, head)-segment's max from the packed
    bias (nW|1, L, H*L) so every segment's bias is <= 0 and attains 0.

    Softmax is invariant to a per-row-per-head additive constant, so
    this is exact (values AND gradients). It moves the NaN-safety
    burden off the in-kernel max: with bias <= 0 per segment, the
    global row max m satisfies s_hj <= m for all heads (no overflow)
    and each head's bias-argmax element j* has
    s_hj* - m >= -(row spread of the qk term) — the -100 shift mask
    and the cross-head bias spread (the reachable v1 NaN drivers,
    ADVICE r2) drop out entirely. A head only underflows to the guarded
    zero when its qk scores sit > ~88 f32-exp log-units below the row's
    qk max, far outside trained-checkpoint range (|qk·scale| is a few
    units post-LN; v2's clamped-logit-scale regime uses the
    quarter-power path instead). One tiny XLA max+subtract over the
    (nW, L, H, L) bias — ~0.5 MB at the largest Swin stage, fused into
    the bias build.
    """
    nwb = bias_packed.shape[0]
    b4 = bias_packed.reshape(nwb, L, num_heads, L)
    m = jnp.max(b4, axis=-1, keepdims=True)
    return (b4 - m).reshape(bias_packed.shape)


def _per_head_row_max(s, num_heads: int, L: int):
    """Per-head (segment) row max of packed scores s (G, L, H*L).

    The packed layout concatenates all heads' key columns into one row;
    softmax is PER HEAD, so the max must be per segment. A global row
    max is wrong in the underflow regime: a head whose scores sit more
    than ~88 log-units (f32 exp underflow) below the row max has
    exp == 0 across its whole segment, making the segment-sum
    denominator 0 and the output NaN. Reachable for trained Swin-v2
    checkpoints (per-head logit scale clamps at 100, CPB bias spans
    ±16) and approachable for v1's -100 shift mask + inter-head spread
    (ADVICE.md r2). H masked maxes over lane-iota segments — VPU
    elementwise, no relayout (segment boundaries at L-multiples are not
    lane-tile aligned, so slicing/reshaping would relayout).

    Formulation chosen by in-process A/B at swin_t's stage4 shape
    (H=24, L=49, b128; scripts/ablate_swin9.py): f32 where/max loop
    0.619 ms vs bf16 mask-FMA 0.790 (bf16 VPU elementwise is SLOWER on
    v5e) vs quarter-power-with-f32-matmuls 0.735 vs the NaN-unsafe
    global max 0.394 — i.e. the correctness cost is ~0.2 ms/stage.
    (bf16 where-select/where-accumulate forms crash Mosaic outright:
    "tpu_compile_helper exit 1".)

    Round 4: no longer the default for v1 — the host-side bias-max
    prefold (_prefold_bias_packed) makes the plain global row max safe
    at zero cost (scripts/ablate_swin10.py). This loop remains the
    default ONLY inside the whole-block kernel's v2 cosine path, where
    H<=6 makes it cheaper than the quarter-power's two extra segment
    matmuls (5.912 vs 6.547 ms/block at v2 stage1), and reachable
    everywhere via EQXVISION_TPU_SWIN_SOFTMAX=perhead.
    """
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (1, 1, num_heads * L), 2) // L
    m_seg = jnp.zeros_like(s)
    for h in range(num_heads):
        mask = lane_h == h
        mh = jnp.max(jnp.where(mask, s, jnp.float32(-1e30)), axis=-1, keepdims=True)
        m_seg = m_seg + jnp.where(mask, mh, 0.0)
    return m_seg


def _segment_softmax(s, seg):
    """Per-head softmax of packed scores s (G, L, H*L) with a GLOBAL
    row max and quarter-power two-stage normalization.

    Plain global-max softmax NaNs when a head's whole segment sits
    >~88 log-units (f32 exp underflow) below the row max — reachable
    for trained Swin-v2 cosine checkpoints (ADVICE r2: logit scale
    clamps at 100, CPB bias spans ±16, worst cross-head spread 232).
    The exact fix (per-head masked row maxes, _per_head_row_max) costs
    ~4 VPU passes per head — measured -8% e2e on swin_t whose stage4
    has H=24. This variant is H-independent: compute
    e4 = exp((s - m_row)/4), normalize per segment (seg matmul), then
    p = r^4 / seg_sum(r^4). Mathematically identical to per-head-max
    softmax (the per-segment normalization cancels the global shift and
    any d1 rounding — p = r^4/sum(r^4) is invariant to the first
    normalizer), with ~4x f32 rounding on p. Underflow: an element
    flushes only when s < m_row - 349 (4x the f32/bf16 exp range,
    minus flush-to-zero at subnormals), so per-head error is bounded by
    exp(gap - 349) where gap = m_row - m_head: exact (< 1e-50) for
    gap <= 230, the REACHABLE worst case being 232 (logit-scale clamp
    100 + CPB bias 16 on both sides); degrades gracefully to zero
    output (never NaN, via the max(denom, 1e-37) guards) for
    adversarial gaps beyond ~349. Cost vs global-max: one extra
    segment matmul + ~4 elementwise passes, regardless of H.

    The two segment matmuls run in ``seg``'s dtype (bf16 on the model
    path — pass seg in bf16; f32 MXU matmuls are 8x slower and cost
    ~1.7 ms/fwd on swin_t's H=12/24 stages). bf16 rounding of d1
    cancels exactly (see above); bf16 rounding of r^4/d4 scales each
    segment's probabilities by a common factor within 0.4% — at the
    bf16 output's own resolution. bf16 shares f32's exponent range, so
    the underflow thresholds are unchanged.
    """
    cd = seg.dtype
    # guard must be a NORMAL f32: 1e-38 is subnormal and flushes to zero
    # under the TPU's FTZ, turning max(d, guard) into max(d, 0) and
    # resurrecting the 0/0 NaN in the >349-log-unit adversarial regime
    # (ADVICE r3). 1e-37 > 1.1755e-38 (min normal) keeps the
    # degrade-to-zero claim true under FTZ.
    guard = jnp.float32(1e-37)
    m_row = jnp.max(s, axis=-1, keepdims=True)
    e4 = jnp.exp((s - m_row) * 0.25)
    d1 = jax.lax.dot_general(
        e4.astype(cd), seg, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    r = e4 / jnp.maximum(d1, guard)
    r2 = r * r
    r4 = r2 * r2
    d4 = jax.lax.dot_general(
        r4.astype(cd), seg, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return r4 / jnp.maximum(d4, guard)


@_kernel_default_precision
def _packed_window_kernel(*refs, num_heads, head_dim, cp, scale, bias_per_window, gb, gw, cosine, softmax="auto"):
    """Gb images x Gw windows: qkv_ref (Gb, Gw, L, 3*Cp) with [q|k|v]
    each padded to Cp = round_up(C, 128) lanes; bias_ref (Gw|1, L, H*L)
    f32; [gs_ref (1, Cp) f32 per-lane head logit scale, cosine only];
    seg_ref (H*L, H*L) f32 block-diagonal ones; o_ref (Gb, Gw, L, Cp).

    Layout strategy (the fix for the round-1 windowed kernel's loss —
    1124 img/s vs 2142 XLA — whose 32-lane per-head slices of 288-lane
    rows each cost a VMEM relayout):

    - q/k/v are exact 128-lane-tile slices (Cp-aligned): no relayout;
    - ALL heads' scores come from ONE batched matmul per window:
      S (L, H*L) = q @ Kb^T where Kb (H*L, Cp) stacks H head-masked
      copies of k along sublanes (VPU masked copies, no transpose) —
      contracting the full Cp lanes is exact because other heads' (and
      pad) lanes are zero;
    - per-head softmax must NOT use a plain global row max over a raw
      bias (it underflows far-below heads to a 0/0 NaN, ADVICE r2):
      aligned L uses the quarter-power _segment_softmax (H-independent,
      bf16 segment matmuls; wins at this kernel's H=12/24 stages,
      ablate_swin9 --v2), unaligned L (v1's 49) the round-4 formulation
      — the HOST prefolds each segment's bias max
      (_prefold_bias_packed, exact by shift invariance) so the global
      row max is safe and costs nothing (swin_t e2e 27.17 ms vs 29.45
      with the round-3 per-head loop, == 27.16 unsafe;
      scripts/ablate_swin10.py) + a guarded segment-sum denominator;
    - O = P @ Vb with Vb head-masked like Kb; out lanes [0, C) are the
      heads' outputs re-summed into place, pad lanes stay zero, so the
      (Cp-row-padded) proj matmul consumes this layout directly.

    Swin v2 cosine attention (``cosine=True``) normalizes q/k per head
    IN the kernel: per-row per-head sum-of-squares via one matmul with
    the (Cp, Cp) head-block-diagonal ones matrix (built from iota, so no
    extra operand), rsqrt, multiply — the clamped logit scale rides in
    as a per-lane vector folded into q. Doing this in VMEM is the fix
    for the round-2 v2 loss (53.0 vs 47.6 ms XLA), where the XLA-side
    normalize cost two extra HBM passes over the full qkv tensor.

    Measured on v5e b128 (scripts/ablate_swin2.py, qkv matmul + attention
    core, XLA vs this kernel): stage1 (C=96, nW=64) 11.2 -> 4.6 ms;
    stage2 (C=192, nW=16) 4.5 -> 2.0 ms; stage3 (C=384, nW=4) 1.0 ->
    0.65 ms; stage4 (C=768, nW=1) parity.
    """
    if cosine:
        qkv_ref, bias_ref, gs_ref, seg_ref, o_ref = refs
    else:
        qkv_ref, bias_ref, seg_ref, o_ref = refs
        gs_ref = None
    _, _, L, _ = qkv_ref.shape
    g = gb * gw
    rows = qkv_ref[...].reshape(g, L, 3 * cp)
    q = rows[:, :, 0:cp]
    k = rows[:, :, cp : 2 * cp]
    v = rows[:, :, 2 * cp : 3 * cp]
    if cosine:
        # per-head L2 normalize: head-block-diagonal ones matmul gives
        # each lane its head's sum of squares (pad lanes are zero, so
        # their rsqrt blowup multiplies 0). Masked-VPU-sum variants
        # measured noise-to-loss in-process (scripts/ablate_swin8.py
        # msumnorm/msumboth: 3.93/4.59 vs 3.87 ms matmul) — keep the
        # matmul form.
        li = jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 1)
        hseg = ((li // head_dim) == (lj // head_dim)).astype(jnp.float32)

        def headnorm(t):
            tf = t.astype(jnp.float32)
            sums = jax.lax.dot_general(
                tf * tf, hseg, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return tf * jax.lax.rsqrt(jnp.maximum(sums, 1e-24))

        q = (headnorm(q) * gs_ref[...][None]).astype(rows.dtype)
        k = headnorm(k).astype(rows.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cp), 2)
    kb_parts = []
    vb_parts = []
    for h in range(num_heads):
        m = ((lane >= h * head_dim) & (lane < (h + 1) * head_dim)).astype(rows.dtype)
        kb_parts.append(k * m)
        vb_parts.append(v * m)
    kb = jnp.concatenate(kb_parts, axis=1)  # (G, H*L, Cp)
    vb = jnp.concatenate(vb_parts, axis=1)
    s = jax.lax.dot_general(
        q, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # (G, L, H*L)
    if bias_per_window:
        hl = s.shape[-1]
        s = (s.reshape(gb, gw, L, hl) + bias_ref[...][None]).reshape(g, L, hl)
    else:
        s = s + bias_ref[0][None]
    if softmax == "auto":
        softmax = "quarter" if L % 16 == 0 else "perhead"
    if softmax == "quarter":
        # quarter-power segment softmax: H-independent, bf16 segment
        # matmuls (seg arrives in rows dtype from the host)
        p = _segment_softmax(s, seg_ref[...]).astype(rows.dtype)
    else:
        # unaligned L (v1's 49) can't flatten a bf16 (G, L, HL) dot
        # (Mosaic shape-cast limit) so the quarter-power's second
        # matmul would run f32 (~1.7 ms/fwd on swin_t). Default
        # ("global"): the host prefolded the per-segment bias max
        # (_prefold_bias_packed), so the plain global row max is
        # NaN-safe up to a ~88-log-unit qk row spread and the guarded
        # denominator degrades to zero beyond — at the unsafe
        # formulation's cost. "perhead" keeps the exact f32 masked
        # per-head max loop (H VPU passes, the round-3 path).
        if softmax == "perhead":
            m = _per_head_row_max(s, num_heads, L)
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jax.lax.dot_general(
            e, seg_ref[...], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = (e / jnp.maximum(denom, 1e-37)).astype(rows.dtype)
    o = jax.lax.dot_general(
        p, vb, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] = o.reshape(o_ref.shape).astype(o_ref.dtype)


def _packed_window_reference(qkvp, bias_packed, cosine_gs, num_heads, c, scale):
    """XLA reference for the packed layout: slice the Cp-padded q/k/v
    sections, run plain attention, return the Cp-padded output.
    cosine_gs (num_heads,) f32 selects Swin-v2 cosine attention: q/k
    L2-normalized per head, q scaled by the clamped logit scale."""
    b, nw, L, three_cp = qkvp.shape
    cp = three_cp // 3
    hd = c // num_heads
    q = qkvp[..., 0:c]
    k = qkvp[..., cp : cp + c]
    v = qkvp[..., 2 * cp : 2 * cp + c]

    def heads(t):
        return jnp.transpose(t.reshape(b, nw, L, num_heads, hd), (0, 1, 3, 2, 4))

    q, k, v = heads(q), heads(k), heads(v)
    if cosine_gs is not None:
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
        kf = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
        q = (qf * cosine_gs.reshape(num_heads, 1, 1)).astype(q.dtype)
        k = kf.astype(k.dtype)
    # bias_packed (nW|1, L, H*L) -> (nW|1, H, L, L)
    bias = jnp.transpose(bias_packed.reshape(bias_packed.shape[0], L, num_heads, L), (0, 2, 1, 3))
    o = attention_reference(q, k, v, bias[None], scale)
    o = jnp.transpose(o, (0, 1, 3, 2, 4)).reshape(b, nw, L, c)
    return jnp.pad(o, ((0, 0), (0, 0), (0, 0), (0, cp - c)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _packed_window_attention(qkvp, bias_packed, cosine_gs, num_heads, c, scale):
    b, nw, L, three_cp = qkvp.shape
    cp = three_cp // 3
    hd = c // num_heads
    if not _use_pallas(L, hd):
        return _packed_window_reference(qkvp, bias_packed, cosine_gs, num_heads, c, scale)
    HL = num_heads * L
    cosine = cosine_gs is not None
    bias_per_window = bias_packed.shape[0] == nw and nw > 1
    # softmax policy (see _swin_softmax_mode): aligned L -> quarter-power;
    # unaligned L -> host-prefolded bias + in-kernel global row max
    # (default), or the exact per-head max loop under "perhead"
    mode = _swin_softmax_mode()
    if L % 16 == 0:
        softmax = "quarter"
    elif mode == "perhead":
        softmax = "perhead"
    else:
        softmax = "global"
        if mode != "unsafe":
            bias_packed = _prefold_bias_packed(bias_packed, num_heads, L)
    # seg rides in the qkv dtype when the kernel takes the aligned-L
    # quarter-power path (bf16 segment matmuls); f32 otherwise
    seg = jnp.asarray(
        (
            (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 0) // L)
            == (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 1) // L)
        ),
        qkvp.dtype if softmax == "quarter" else jnp.float32,
    )
    # Group Gw windows x Gb images per program. Gw is capped by nW's
    # divisors (v2's nW=49 only allows 7), so batching over images is
    # what keeps programs off the ~5us dispatch floor (v2_t stage1:
    # 896 -> 224 programs) while bounding VMEM. The grid is
    # (window-groups, image-groups) with images INNERMOST so the
    # per-window bias/seg blocks keep the same index across the inner
    # loop and Mosaic's pipeline skips re-fetching them (the round-2
    # packed kernel had windows innermost, re-fetching the bias every
    # program: ~0.5 GB of redundant HBM traffic per Swin-T forward).
    item = qkvp.dtype.itemsize

    def act_bytes(g):
        # softmax temps per path: aligned L runs _segment_softmax
        # (s/e4/d1/r/r4/d4 f32 live peaks + two compute-dtype casts),
        # unaligned L the masked per-head max (s/m_seg/e/denom/p f32)
        soft = L * HL * (6 * 4 + 2 * item) if softmax == "quarter" else 5 * L * HL * 4
        per = (
            L * 3 * cp * item  # qkv rows
            + 2 * HL * cp * item  # kb/vb stacks
            + soft
            + L * cp * item  # out
            + (2 * L * cp * 4 if cosine else 0)  # f32 normalize temps
        )
        return g * per

    gw = 1
    for g in range(min(nw, 16), 1, -1):  # any divisor (Swin v2 has nW=49)
        if nw % g == 0 and act_bytes(g) + HL * HL * 4 < 10 * 1024 * 1024:
            gw = g
            break
    # 14.5MB (vs the ~16MB scoped-VMEM hard limit): with the softmax
    # temps charged above, every DEFAULT-path benchmarked stage keeps
    # its tuned (gw, gb) — swin_t s3 (4,2)/s4 (1,1), v2_t 256² s3
    # (2,2)/s4 (1,1), swin_b/v2_b, v2-at-224² s3 (4,1) — while shapes
    # near the limit (e.g. packed v2_t s1 with whole-block disabled,
    # est. 18.3MB at gb=2 under the old 4-temp charge) now back off
    # instead of risking an undiagnosable Mosaic scoped-VMEM failure
    gb = 1
    for g in (8, 4, 2):
        if b % g == 0 and act_bytes(gw * g) + HL * HL * 4 < int(14.5 * 1024 * 1024):
            gb = g
            break
    if bias_per_window:
        bspec = pl.BlockSpec((gw, L, HL), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    else:
        bspec = pl.BlockSpec((1, L, HL), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM)
    qkv_spec = pl.BlockSpec((gb, gw, L, three_cp), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, bspec]
    args = [qkvp, bias_packed.astype(jnp.float32)]
    if cosine:
        gs_lanes = jnp.repeat(cosine_gs.astype(jnp.float32).reshape(num_heads), hd, total_repeat_length=c)
        gs_lanes = jnp.pad(gs_lanes, (0, cp - c))[None]  # (1, Cp)
        in_specs.append(pl.BlockSpec((1, cp), lambda i, j: (0, 0), memory_space=pltpu.VMEM))
        args.append(gs_lanes)
    in_specs.append(pl.BlockSpec((HL, HL), lambda i, j: (0, 0), memory_space=pltpu.VMEM))
    args.append(seg)
    return pl.pallas_call(
        functools.partial(
            _packed_window_kernel,
            num_heads=num_heads, head_dim=hd, cp=cp, scale=scale,
            bias_per_window=bias_per_window, gb=gb, gw=gw, cosine=cosine,
            softmax=softmax,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nw, L, cp), qkvp.dtype),
        grid=(nw // gw, b // gb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gb, gw, L, cp), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nw * L * HL * (2 * cp + HL),
            bytes_accessed=b * nw * L * 4 * cp * item,
            transcendentals=b * nw * L * HL,
        ),
    )(*args)


_packed_window_attention.defvjp(
    lambda qkvp, bias, gs, nh, c, sc: (_packed_window_attention(qkvp, bias, gs, nh, c, sc), (qkvp, bias, gs)),
    lambda nh, c, sc, res, g: jax.vjp(
        lambda qkvp, bias, gs: _packed_window_reference(qkvp, bias, gs, nh, c, sc), *res
    )[1](g),
)


def packed_window_attention(
    qkvp: jax.Array,
    bias_packed: jax.Array,
    num_heads: int,
    c: int,
    scale: float,
    cosine_gs: Optional[jax.Array] = None,
) -> jax.Array:
    """Head-packed windowed attention on lane-padded fused qkv (Swin).

    qkvp: (B, nW, L, 3*Cp), Cp = round_up(C, 128), sections [q|k|v] each
    zero-padded to Cp lanes (pad the projection WEIGHT columns so this
    layout falls straight out of the qkv matmul). bias_packed:
    (nW or 1, L, H*L) f32 — relative-position bias [+ shift mask]
    rearranged per-row. cosine_gs: (num_heads,) f32 clamped logit scale
    — selects Swin-v2 cosine attention with the per-head q/k L2
    normalization done inside the kernel (pass scale=1.0). Returns
    (B, nW, L, Cp) with pad lanes zero, so a Cp-row-padded proj weight
    consumes it with no slicing. Differentiable (reference-path VJP).
    See _packed_window_kernel for the layout rationale and measured
    wins.
    """
    return _packed_window_attention(qkvp, bias_packed, cosine_gs, num_heads, c, scale)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Fused scaled dot-product attention (differentiable).

    q, k, v: (..., N, Dh) with any number of leading batch dims.
    bias: optional, broadcastable to (..., N, N).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if not _use_pallas(q.shape[-2], q.shape[-1]):
        return attention_reference(q, k, v, bias, scale)
    lead = q.shape[:-2]
    n, dh = q.shape[-2:]
    b = math.prod(lead) if lead else 1
    qf = q.reshape(b, n, dh)
    kf = k.reshape(b, n, dh)
    vf = v.reshape(b, n, dh)
    bf = None
    if bias is not None:
        # Exploit suffix broadcasting: if bias's lead dims equal a
        # suffix of q's lead dims (up to leading 1s), keep it compact
        # and let the kernel index it modulo its batch.
        blead = bias.shape[:-2]
        while blead and blead[0] == 1:
            bias = bias[0]
            blead = bias.shape[:-2]
        if blead == lead[len(lead) - len(blead):]:
            bf = bias.reshape(-1, n, n) if blead else bias.reshape(1, n, n)
        else:
            bf = jnp.broadcast_to(bias, lead + (n, n)).reshape(b, n, n)
    if bf is None:
        out = _attn_flat_nobias(qf, kf, vf, scale)
    else:
        out = _attn_flat_bias(qf, kf, vf, bf, scale)
    return out.reshape(*lead, n, dh)
