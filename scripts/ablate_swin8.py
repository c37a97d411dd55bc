"""Whole-block v2 kernel internals: where do stage1's 5.5 ms/block go?

Local variant kernels on exact stage1 shapes (B=128, nW=64, L=64, C=96,
H=3, cosine+postnorm) with pieces disabled one at a time:
  full        current kernel
  noseg       denominator via per-head masked VPU sums (no HLxHL matmul)
  nonorm      cosine headnorm skipped (bound on its cost; wrong numerics)
  globalmax   global row max (wrong numerics; bound on per-head max cost)
  noattn      scores/PV skipped entirely, MLP only (floor of the rest)
  mlponly     qkv+attention replaced by copy; LN+MLP+residuals remain

Run: python scripts/ablate_swin8.py
"""
import functools as ft
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, nW, L, C, H = 128, 64, 64, 96, 3
cp = 128
HL = H * L
hd = C // H
hidden = 4 * C
gw, gb = 16, 1
eps = 1e-5

_sum = jax.jit(lambda t: jnp.sum(t[:1, :1, :1].astype(jnp.float32)))
def _sync(t): return float(np.asarray(_sum(t)))
def timeit_ch(fn, x, iters=10, reps=3):
    y = fn(x); _sync(y)
    def run(n):
        t0 = time.perf_counter(); xi = x
        for _ in range(n): xi = fn(xi)
        _sync(xi); return time.perf_counter() - t0
    run(1)
    t1 = min(run(1) for _ in range(reps))
    tn = min(run(iters + 1) for _ in range(2))
    return (tn - t1) / iters


def kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, g1_ref, b1_ref,
           g2_ref, b2_ref, w1_ref, bb1_ref, w2_ref, bb2_ref, bias_ref,
           gs_ref, seg_ref, o_ref, *, variant):
    g = gb * gw
    xw = x_ref[...].reshape(g, L, C)
    dt = xw.dtype

    def ln(tf, ga, be):
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean((tf - mu) ** 2, axis=-1, keepdims=True)
        return (tf - mu) * jax.lax.rsqrt(var + eps) * ga[0].astype(jnp.float32) + be[0].astype(jnp.float32)

    def bmm(t, w):
        return jax.lax.dot_general(t, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    xf = xw.astype(jnp.float32)
    if variant == "mlponly":
        h1 = xw
        h1f = xf
    else:
        qkv = (bmm(xw, wqkv_ref[...]) ).astype(dt) + bqkv_ref[0].astype(dt)
        q = qkv[:, :, 0:cp]
        k = qkv[:, :, cp:2 * cp]
        v = qkv[:, :, 2 * cp:3 * cp]
        if variant != "nonorm":
            if variant in ("msumnorm", "msumboth"):
                lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cp), 2) // hd
                def headnorm(t):
                    tf = t.astype(jnp.float32)
                    sq = tf * tf
                    sums = jnp.zeros_like(tf)
                    for h in range(H):
                        mask = lane_c == h
                        sh = jnp.sum(jnp.where(mask, sq, 0.0), axis=-1, keepdims=True)
                        sums = sums + jnp.where(mask, sh, 0.0)
                    return tf * jax.lax.rsqrt(jnp.maximum(sums, 1e-24))
            else:
                li = jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 0)
                lj = jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 1)
                hseg = ((li // hd) == (lj // hd)).astype(jnp.float32)
                def headnorm(t):
                    tf = t.astype(jnp.float32)
                    sums = bmm(tf * tf, hseg)
                    return tf * jax.lax.rsqrt(jnp.maximum(sums, 1e-24))
            q = (headnorm(q) * gs_ref[...][None]).astype(dt)
            k = headnorm(k).astype(dt)
        if variant == "noattn":
            attn = v
        else:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cp), 2)
            kbp, vbp = [], []
            for h in range(H):
                m = ((lane >= h * hd) & (lane < (h + 1) * hd)).astype(dt)
                kbp.append(k * m)
                vbp.append(v * m)
            kb = jnp.concatenate(kbp, axis=1)
            vb = jnp.concatenate(vbp, axis=1)
            s = jax.lax.dot_general(q, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            s = s + bias_ref[...][None].reshape(1, L, HL) if bias_ref.shape[0] == 1 else s
            lane_h = jax.lax.broadcasted_iota(jnp.int32, (1, 1, HL), 2) // L
            if variant == "globalmax":
                m_seg = jnp.max(s, axis=-1, keepdims=True)
            else:
                m_seg = jnp.zeros_like(s)
                for h in range(H):
                    mask = lane_h == h
                    mh = jnp.max(jnp.where(mask, s, jnp.float32(-1e30)), axis=-1, keepdims=True)
                    m_seg = m_seg + jnp.where(mask, mh, 0.0)
            e = jnp.exp(s - m_seg)
            if variant in ("noseg", "msumboth"):
                denom = jnp.zeros_like(e)
                for h in range(H):
                    mask = lane_h == h
                    dh = jnp.sum(jnp.where(mask, e, 0.0), axis=-1, keepdims=True)
                    denom = denom + jnp.where(mask, dh, 1.0)
            else:
                denom = jax.lax.dot_general(e, seg_ref[...], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            p = (e / denom).astype(dt)
            attn = jax.lax.dot_general(p, vb, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32).astype(dt)
        proj = bmm(attn, wproj_ref[...]) + bproj_ref[0].astype(jnp.float32)
        h1f = xf + ln(proj, g1_ref, b1_ref)
        h1 = h1f.astype(dt)

    hm = jax.nn.sigmoid(1.702 * bmm(h1, w1_ref[...]))  # cheap gelu-ish stand-in, cost-equivalent
    hm = (hm + bb1_ref[0].astype(jnp.float32)).astype(dt)
    mlp = bmm(hm, w2_ref[...]) + bb2_ref[0].astype(jnp.float32)
    out = h1f + ln(mlp, g2_ref, b2_ref)
    o_ref[...] = out.reshape(o_ref.shape).astype(o_ref.dtype)


def run_variant(variant):
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, nW, L, C) * 0.5, dt)
    wqkv = jnp.asarray(rng.randn(C, 3 * cp) * 0.05, dt)
    bqkv = jnp.asarray(rng.randn(1, 3 * cp) * 0.05, dt)
    wproj = jnp.asarray(rng.randn(cp, C) * 0.05, dt)
    bproj = jnp.asarray(rng.randn(1, C) * 0.05, jnp.float32)
    g1 = jnp.ones((1, C), dt); b1 = jnp.zeros((1, C), dt)
    g2 = jnp.ones((1, C), dt); b2 = jnp.zeros((1, C), dt)
    w1 = jnp.asarray(rng.randn(C, hidden) * 0.05, dt)
    bb1 = jnp.asarray(rng.randn(1, hidden) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(hidden, C) * 0.05, dt)
    bb2 = jnp.asarray(rng.randn(1, C) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(1, L, HL), jnp.float32)
    gs = jnp.asarray(np.abs(rng.randn(1, cp)) + 1.0, jnp.float32)
    seg = jnp.asarray(
        (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 0) // L)
        == (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 1) // L), jnp.float32)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, j, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        ft.partial(kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct((B, nW, L, C), dt),
        grid=(nW // gw, B // gb),
        in_specs=[
            pl.BlockSpec((gb, gw, L, C), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
            const((C, 3 * cp)), const((1, 3 * cp)), const((cp, C)), const((1, C)),
            const((1, C)), const((1, C)), const((1, C)), const((1, C)),
            const((C, hidden)), const((1, hidden)), const((hidden, C)), const((1, C)),
            const((1, L, HL)), const((1, cp)), const((HL, HL)),
        ],
        out_specs=pl.BlockSpec((gb, gw, L, C), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
    )

    @jax.jit
    def step(xb):
        o = f(xb, wqkv, bqkv, wproj, bproj, g1, b1, g2, b2, w1, bb1, w2, bb2, bias, gs, seg)
        return xb + (jnp.sum(o[:1, :1, :1]) * 0).astype(xb.dtype)

    try:
        t = timeit_ch(step, x, iters=10)
        print(f"{variant:10s}: {t*1e3:7.3f} ms/block-equivalent", flush=True)
    except Exception as e:
        print(f"{variant:10s}: FAIL {str(e)[:120]}", flush=True)


import sys as _sys
variants = _sys.argv[1:] or ["full", "noseg", "msumnorm", "msumboth", "nonorm", "globalmax", "noattn", "mlponly"]
for v in variants:
    run_variant(v)
