"""Round-2 Swin ablation #3: fuse LN1 + qkv matmul + packed attention
(+ optionally proj) into one kernel, vs the committed two-matmul +
packed-kernel formulation.

Swin stages 1-2 are memory-bound (CLAUDE.md), so eliminating the qkv
(3*Cp lanes) and attention-out (Cp lanes) HBM round trips should win
even though in-kernel matmuls run below XLA's 174 TF/s (the reason the
same fusion LOST for ViT, scripts/ablate_vit4.py).

Run: python scripts/ablate_swin3.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eqxvision_tpu.ops.attention import packed_window_attention

B = 128


def log(*a):
    print(*a, flush=True)


_sum = jax.jit(lambda t: jnp.sum(t, dtype=jnp.float32))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(fn, x, iters=10, reps=3):
    y = fn(x)
    _sync(y)

    def run(n):
        t0 = time.perf_counter()
        xi = x
        for _ in range(n):
            xi = fn(xi)
        _sync(xi)
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(reps))
    tn = min(run(iters + 1) for _ in range(2))
    return (tn - t1) / iters


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fused_half_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                       bias_ref, seg_ref, o_ref, *, num_heads, head_dim, cp, scale,
                       bias_per_window, with_proj):
    _, g, L, c = x_ref.shape
    xw = x_ref[0]
    # LN1 in f32 over the C lanes
    xf = xw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    ln = ln * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    ln = ln.astype(xw.dtype)
    # qkv projection: per-window 2D dots (a 3Dx2D contraction would make
    # Mosaic reshape (G,L,C)->(G*L,C), unsupported for L=49)
    wq = wqkv_ref[...]
    qkv = jnp.stack(
        [jnp.dot(ln[i], wq, preferred_element_type=jnp.float32) for i in range(g)]
    ).astype(xw.dtype)
    qkv = qkv + bqkv_ref[0].astype(xw.dtype)
    q = qkv[:, :, 0:cp]
    k = qkv[:, :, cp : 2 * cp]
    v = qkv[:, :, 2 * cp : 3 * cp]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cp), 2)
    kb_parts, vb_parts = [], []
    for h in range(num_heads):
        m = ((lane >= h * head_dim) & (lane < (h + 1) * head_dim)).astype(xw.dtype)
        kb_parts.append(k * m)
        vb_parts.append(v * m)
    kb = jnp.concatenate(kb_parts, axis=1)
    vb = jnp.concatenate(vb_parts, axis=1)
    s = jax.lax.dot_general(
        q, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[...] if bias_per_window else s + bias_ref[0][None]
    m_row = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m_row)
    denom = jax.lax.dot_general(
        e, seg_ref[...], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = (e / denom).astype(xw.dtype)
    o = jax.lax.dot_general(
        p, vb, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(xw.dtype)
    if with_proj:
        # proj: per-window (L, Cp) @ (Cp, C), residual add with x
        wp = wproj_ref[...]
        out = jnp.stack(
            [jnp.dot(o[i], wp, preferred_element_type=jnp.float32) for i in range(g)]
        )
        out = out + bproj_ref[0].astype(jnp.float32) + xw.astype(jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)
    else:
        o_ref[0] = o


def fused_attn_half(x_windows, ln_g, ln_b, wqkv_p, bqkv_p, wproj_p, bproj, bias_packed,
                    num_heads, c, scale, with_proj=True):
    """x_windows: (B, nW, L, C). Returns (B, nW, L, C) = x + proj(attn(LN(x)))
    when with_proj, else (B, nW, L, Cp) attention output."""
    b, nw, L, _ = x_windows.shape
    cp = wqkv_p.shape[1] // 3
    hd = c // num_heads
    HL = num_heads * L
    bias_per_window = bias_packed.shape[0] == nw and nw > 1
    seg = jnp.asarray(
        (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 0) // L)
        == (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 1) // L),
        jnp.float32,
    )
    gw = 1
    for g in (16, 8, 4, 2):
        if nw % g == 0 and g * (
            L * (c + 3 * cp + cp) * 2 + 2 * HL * cp * 2 + 4 * L * HL * 4
        ) + HL * HL * 4 + (c * 3 * cp + cp * c) * 2 < 11 * 1024 * 1024:
            gw = g
            break
    if bias_per_window:
        bspec = pl.BlockSpec((gw, L, HL), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM)
    else:
        bspec = pl.BlockSpec((1, L, HL), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    out_c = c if with_proj else cp
    return pl.pallas_call(
        functools.partial(
            _fused_half_kernel, num_heads=num_heads, head_dim=hd, cp=cp, scale=scale,
            bias_per_window=bias_per_window, with_proj=with_proj,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nw, L, out_c), x_windows.dtype),
        grid=(b, nw // gw),
        in_specs=[
            pl.BlockSpec((1, gw, L, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            const2((1, c)),
            const2((1, c)),
            const2((c, 3 * cp)),
            const2((1, 3 * cp)),
            const2((cp, c)),
            const2((1, c)),
            bspec,
            const2((HL, HL)),
        ],
        out_specs=pl.BlockSpec((1, gw, L, out_c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nw * L * (c * 3 * cp + HL * (2 * cp + HL) + cp * c),
            bytes_accessed=b * nw * L * c * 2 * 2,
            transcendentals=b * nw * L * HL,
        ),
    )(x_windows, ln_g[None], ln_b[None], wqkv_p, bqkv_p[None], wproj_p, bproj[None],
      bias_packed.astype(jnp.float32), seg)


def bench_stage(c, h, nw_side, shifted):
    L = 49
    nw = nw_side * nw_side
    cp = _round_up(c, 128)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, nw, L, c).astype(np.float32) * 0.5).astype(jnp.bfloat16)
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    bqkv = jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    wproj = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    bproj = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    g_ln = jnp.ones((c,), jnp.bfloat16)
    b_ln = jnp.zeros((c,), jnp.bfloat16)
    bias_np = rng.randn(nw if shifted else 1, h, L, L).astype(np.float32)
    bias_packed = jnp.transpose(jnp.asarray(bias_np), (0, 2, 1, 3)).reshape(
        bias_np.shape[0], L, h * L
    )
    scale = (c // h) ** -0.5

    # committed formulation: LN + padded qkv matmul + packed kernel + proj
    wq, wk, wv = jnp.split(wqkv, 3, axis=-1)
    padw = lambda w: jnp.pad(w, ((0, 0), (0, cp - c)))
    wqkv_p = jnp.concatenate([padw(wq), padw(wk), padw(wv)], axis=-1)
    bq, bk, bv = jnp.split(bqkv, 3)
    padb = lambda b_: jnp.pad(b_, (0, cp - c))
    bqkv_p = jnp.concatenate([padb(bq), padb(bk), padb(bv)])
    wproj_p = jnp.pad(wproj, ((0, cp - c), (0, 0)))

    def ln(t):
        tf = t.astype(jnp.float32)
        mu = tf.mean(-1, keepdims=True)
        va = ((tf - mu) ** 2).mean(-1, keepdims=True)
        return ((tf - mu) * jax.lax.rsqrt(va + 1e-5)).astype(t.dtype)

    @jax.jit
    def committed(xw):
        q = ln(xw) @ wqkv_p + bqkv_p
        out = packed_window_attention(q, bias_packed, h, c, scale)
        return xw + out @ wproj_p + bproj

    t = timeit_ch(committed, x, iters=10)
    log(f"  committed LN+qkv+kernel+proj (c={c}, nW={nw}, shifted={shifted}): {t*1e3:.3f} ms")

    @jax.jit
    def fused(xw):
        return fused_attn_half(xw, g_ln, b_ln, wqkv_p, bqkv_p, wproj_p, bproj,
                               bias_packed, h, c, scale, with_proj=True)

    # correctness vs committed
    ref = committed(x)
    got = fused(x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    t = timeit_ch(fused, x, iters=10)
    log(f"  fused whole-half kernel                       : {t*1e3:.3f} ms  (max err vs committed {err:.1e})")


def main():
    log(f"device: {jax.devices()[0]}")
    for (c, h, nw_side) in [(96, 3, 8), (192, 6, 4), (384, 12, 2)]:
        for shifted in (False, True):
            bench_stage(c, h, nw_side, shifted)


if __name__ == "__main__":
    main()
