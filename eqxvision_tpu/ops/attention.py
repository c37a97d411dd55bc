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

    The single-block kernel pads N up to 128 and Dh up to the 128-lane
    tile, so at vision-transformer shapes (ViT: N=197, Dh=64; Swin:
    L=49, Dh=32) it burns 2-4x the MXU work of XLA's batched-GEMM
    attention and loses (ViT-B/16 b256: 1599 img/s kernel vs 2196 XLA).
    Until a head-packed tiled kernel lands, the kernel is used only
    where its padding is free (Dh >= 128 and N a multiple of 128), or
    when forced with EQXVISION_TPU_FORCE_PALLAS=1.
    """
    if os.environ.get("EQXVISION_TPU_NO_PALLAS") == "1":
        return False
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
    if not on_tpu:
        return False
    if os.environ.get("EQXVISION_TPU_FORCE_PALLAS") == "1":
        return True
    return dh >= 128 and n % 128 == 0


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


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, n_valid: int):
    # One (batch*head) slice: q,k,v are (Np, Dh) blocks in VMEM.
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)
    npad = q.shape[0]
    if n_valid < npad:
        col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


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

    def pad(x, target_n, target_d):
        return jnp.pad(x, ((0, 0), (0, target_n - x.shape[1]), (0, target_d - x.shape[2])))

    qp, kp, vp = pad(q, npad, dpad), pad(k, npad, dpad), pad(v, npad, dpad)
    in_specs = [
        pl.BlockSpec((1, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if bias is not None:
        bb = bias.shape[0]
        bp = jnp.pad(bias, ((0, 0), (0, npad - n), (0, npad - n)))
        in_specs.append(
            pl.BlockSpec((1, npad, npad), lambda i, _bb=bb: (i % _bb, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(bp)
        kernel = functools.partial(_attn_kernel, scale=scale, n_valid=n)
    else:

        def kernel(q_ref, k_ref, v_ref, o_ref):
            _attn_kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale, n_valid=n)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, npad, dpad), q.dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, npad, dpad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * npad * npad * dpad,
            bytes_accessed=b * npad * dpad * 4 * 4,
            transcendentals=b * npad * npad,
        ),
    )(*args)
    return out[:, :n, :dh]


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Fused scaled dot-product attention.

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
    out = _attention_pallas(qf, kf, vf, bf, scale)
    return out.reshape(*lead, n, dh)
