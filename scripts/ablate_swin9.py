"""Packed-kernel softmax variants, in-process A/B (round 3).

The ADVICE r2 NaN fix (per-head softmax max) regressed swin_t ~8%
across processes; process noise is +-1.5%, so this measures the packed
window-attention kernel alone at swin_t's stage3/4 shapes (L=49,
H=12 nW=4 / H=24 nW=1, b128) with each softmax formulation:

  global    plain global row max (r2 baseline; NaN-unsafe)
  f32max    f32 where/max per-head loop (first r3 fix)
  fma16     bf16 mask-FMA per-head loop
  quarter   quarter-power two-stage normalization (f32 seg matmuls;
            bf16 matmuls impossible at L=49 — Mosaic shape-cast)

Run: python scripts/ablate_swin9.py
"""
import functools as ft
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128

_sum = jax.jit(lambda t: jnp.sum(t[:1, :1, :1].astype(jnp.float32)))
def _sync(t): return float(np.asarray(_sum(t)))
def timeit_ch(fn, x, iters=20, reps=3):
    y = fn(x); _sync(y)
    def run(n):
        t0 = time.perf_counter(); xi = x
        for _ in range(n): xi = fn(xi)
        _sync(xi); return time.perf_counter() - t0
    run(1)
    t1 = min(run(1) for _ in range(reps))
    tn = min(run(iters + 1) for _ in range(2))
    return (tn - t1) / iters


def run_case(H, nW, C, variant, L=49):
    cp = -(-C // 128) * 128
    HL = H * L
    hd = C // H
    gw = 1
    for g in (16, 8, 4, 2):
        if nW % g == 0:
            gw = g
            break
    gb = 1
    for g in (8, 4, 2):
        if B % g == 0 and gb == 1 and g * gw * L * 3 * cp * 2 < 4 * 1024 * 1024:
            gb = g

    def kernel(qkv_ref, bias_ref, seg_ref, o_ref):
        g = gb * gw
        rows = qkv_ref[...].reshape(g, L, 3 * cp)
        q = rows[:, :, 0:cp]
        k = rows[:, :, cp:2 * cp]
        v = rows[:, :, 2 * cp:3 * cp]
        dt = rows.dtype
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cp), 2)
        kbp, vbp = [], []
        for h in range(H):
            m = ((lane >= h * hd) & (lane < (h + 1) * hd)).astype(dt)
            kbp.append(k * m)
            vbp.append(v * m)
        kb = jnp.concatenate(kbp, axis=1)
        vb = jnp.concatenate(vbp, axis=1)
        s = jax.lax.dot_general(q, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32) * (hd ** -0.5)
        s = s + bias_ref[0][None]
        lane_h = jax.lax.broadcasted_iota(jnp.int32, (1, 1, HL), 2) // L
        if variant == "global":
            m_seg = jnp.max(s, axis=-1, keepdims=True)
        elif variant == "f32max":
            m_seg = jnp.zeros_like(s)
            for h in range(H):
                mask = lane_h == h
                mh = jnp.max(jnp.where(mask, s, jnp.float32(-1e30)), axis=-1, keepdims=True)
                m_seg = m_seg + jnp.where(mask, mh, 0.0)
        elif variant == "fma16":
            s16 = s.astype(jnp.bfloat16)
            big = jnp.asarray(1e30, jnp.bfloat16)
            m_seg = jnp.zeros_like(s)
            for h in range(H):
                m16 = (lane_h == h).astype(jnp.bfloat16)
                t = s16 * m16 + (m16 - 1) * big
                mh = jnp.max(t, axis=-1, keepdims=True).astype(jnp.float32)
                m_seg = m_seg + mh * (lane_h == h).astype(jnp.float32)
        if variant in ("quarter", "quarter16"):
            m_row = jnp.max(s, axis=-1, keepdims=True)
            e4 = jnp.exp((s - m_row) * 0.25)
            cd2 = seg_ref.dtype
            d1 = jax.lax.dot_general(e4.astype(cd2), seg_ref[...], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            r = e4 / jnp.maximum(d1, 1e-38)
            r4 = (r * r) ** 2
            d4 = jax.lax.dot_general(r4.astype(cd2), seg_ref[...], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            p = (r4 / jnp.maximum(d4, 1e-38)).astype(dt)
        else:
            e = jnp.exp(s - m_seg)
            denom = jax.lax.dot_general(e, seg_ref[...], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            p = (e / denom).astype(dt)
        o = jax.lax.dot_general(p, vb, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        o_ref[...] = o.reshape(o_ref.shape).astype(o_ref.dtype)

    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, nW, L, 3 * cp) * 0.3, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(1, L, HL), jnp.float32)
    seg = jnp.asarray(
        (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 0) // L)
        == (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 1) // L),
        jnp.bfloat16 if variant == "quarter16" else jnp.float32)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nW, L, cp), jnp.bfloat16),
        grid=(nW // gw, B // gb),
        in_specs=[
            pl.BlockSpec((gb, gw, L, 3 * cp), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, HL), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HL, HL), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, gw, L, cp), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
    )

    @jax.jit
    def step(xb):
        o = f(xb, bias, seg)
        return xb + (jnp.sum(o[:1, :1, :1]) * 0).astype(xb.dtype)

    try:
        t = timeit_ch(step, qkv, iters=20)
        print(f"H={H:2d} nW={nW} {variant:8s}: {t*1e3:7.3f} ms", flush=True)
    except Exception as e:
        print(f"H={H:2d} nW={nW} {variant:8s}: FAIL {str(e)[:100]}", flush=True)


import sys as _s
if "--v2" in _s.argv:
    for H, nW, C in ((12, 16, 384), (24, 4, 768)):  # v2 256^2 stage3/4: L=64
        for v in ("global", "f32max", "quarter", "quarter16"):
            run_case(H, nW, C, v, L=64)
else:
    for H, nW, C in ((12, 4, 384), (24, 1, 768)):
        for v in ("global", "f32max", "fma16", "quarter"):
            run_case(H, nW, C, v)
