"""Round-2 Swin ablation #4: L-padded (49->64) whole-block fused kernel.

The ablate_swin3 whole-block kernel loses at C>=384 because its
qkv/proj/MLP matmuls run as per-window loops with M=49 (Mosaic rejects
the (G,L,C)->(G*L,C) shape cast for L=49 bf16). Padding windows to
L=64 tokens makes that reshape a LEGAL tile-aligned shape cast, so the
dense matmuls run flattened with M=G*64 (full MXU) — in-VMEM cost is
unchanged (Mosaic pads 49->64 sublanes internally anyway). Pad key
columns are masked with -1e9 in the packed bias; pad query rows produce
garbage that the final slice discards.

Run: python scripts/ablate_swin4.py
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

from eqxvision_tpu.ops import window_attention as wa

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


def _flat_block_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                       g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                       bias_ref, seg_ref, o_ref, *,
                       num_heads, head_dim, cp, scale, bias_per_window, eps, Lp):
    _, g, _, c = x_ref.shape
    xw = x_ref[0]  # (G, Lp, C)
    flat = xw.reshape(g * Lp, c)

    def ln(t, gamma, beta):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean((tf - mu) ** 2, axis=-1, keepdims=True)
        y = (tf - mu) * jax.lax.rsqrt(var + eps)
        return (y * gamma[0].astype(jnp.float32) + beta[0].astype(jnp.float32)).astype(t.dtype)

    ln1 = ln(flat, g1_ref, b1_ref)
    qkv_flat = jnp.dot(ln1, wqkv_ref[...], preferred_element_type=jnp.float32).astype(xw.dtype)
    qkv_flat = qkv_flat + bqkv_ref[0].astype(xw.dtype)
    qkv = qkv_flat.reshape(g, Lp, 3 * cp)
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
    attn = jax.lax.dot_general(
        p, vb, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(xw.dtype)
    attn_flat = attn.reshape(g * Lp, cp)
    h1 = (
        flat.astype(jnp.float32)
        + jnp.dot(attn_flat, wproj_ref[...], preferred_element_type=jnp.float32)
        + bproj_ref[0].astype(jnp.float32)
    ).astype(xw.dtype)
    ln2 = ln(h1, g2_ref, b2_ref)
    hid = wa._gelu_f32(
        jnp.dot(ln2, wfc1_ref[...], preferred_element_type=jnp.float32)
        + bfc1_ref[0].astype(jnp.float32)
    ).astype(xw.dtype)
    out = (
        h1.astype(jnp.float32)
        + jnp.dot(hid, wfc2_ref[...], preferred_element_type=jnp.float32)
        + bfc2_ref[0].astype(jnp.float32)
    )
    o_ref[0] = out.reshape(g, Lp, c).astype(o_ref.dtype)


def flat_fused_block(xw_padded, params, bias_packed_padded, num_heads, c, scale, eps=1e-5, vmem_budget=11):
    """xw_padded: (B, nW, Lp, C) with pad token rows zeroed;
    bias_packed_padded: (nW|1, Lp, H*Lp) with pad key cols at -1e9."""
    (g1, b1, wqkv_p, bqkv_p, wproj_p, bproj, g2, b2, w1, bf1, w2, bf2) = params
    b, nw, Lp, _ = xw_padded.shape
    cp = wqkv_p.shape[1] // 3
    hd = c // num_heads
    HL = num_heads * Lp
    hidden = w1.shape[1]
    bias_per_window = bias_packed_padded.shape[0] == nw and nw > 1
    seg = jnp.asarray(
        (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 0) // Lp)
        == (jax.lax.broadcasted_iota(jnp.int32, (HL, HL), 1) // Lp),
        jnp.float32,
    )
    itemsize = xw_padded.dtype.itemsize
    weights_bytes = (c * 3 * cp + cp * c + 2 * c * hidden) * itemsize + HL * HL * 4
    gw = 1
    for g in (32, 16, 8, 4, 2):
        act_bytes = g * Lp * (
            (c * 3 + 3 * cp + cp + hidden) * max(itemsize, 2) + 4 * HL * 4
        ) + g * 2 * HL * cp * itemsize
        if nw % g == 0 and weights_bytes + act_bytes < vmem_budget * 1024 * 1024:
            gw = g
            break
    if bias_per_window:
        bspec = pl.BlockSpec((gw, Lp, HL), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM)
    else:
        bspec = pl.BlockSpec((1, Lp, HL), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, j, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _flat_block_kernel, num_heads=num_heads, head_dim=hd, cp=cp, scale=scale,
            bias_per_window=bias_per_window, eps=eps, Lp=Lp,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nw, Lp, c), xw_padded.dtype),
        grid=(b, nw // gw),
        in_specs=[
            pl.BlockSpec((1, gw, Lp, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            const((1, c)), const((1, c)),
            const((c, 3 * cp)), const((1, 3 * cp)),
            const((cp, c)), const((1, c)),
            const((1, c)), const((1, c)),
            const((c, hidden)), const((1, hidden)),
            const((hidden, c)), const((1, c)),
            bspec,
            const((HL, HL)),
        ],
        out_specs=pl.BlockSpec((1, gw, Lp, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nw * Lp * (c * 3 * cp + HL * (2 * cp + HL) + cp * c + 2 * c * hidden),
            bytes_accessed=b * nw * Lp * c * itemsize * 2,
            transcendentals=b * nw * Lp * (HL + hidden),
        ),
    )(
        xw_padded,
        g1[None], b1[None], wqkv_p, bqkv_p[None], wproj_p, bproj[None],
        g2[None], b2[None], w1, bf1[None], w2, bf2[None],
        bias_packed_padded.astype(jnp.float32), seg,
    )


def make_params(c, cp, hidden, rng, dtype):
    wqkv = rng.randn(c, 3 * c).astype(np.float32) * 0.05
    bqkv = rng.randn(3 * c).astype(np.float32) * 0.05
    wq, wk, wv = np.split(wqkv, 3, axis=1)
    padw = lambda w: np.pad(w, ((0, 0), (0, cp - c)))
    wqkv_p = jnp.asarray(np.concatenate([padw(wq), padw(wk), padw(wv)], axis=1)).astype(dtype)
    bq, bk, bv = np.split(bqkv, 3)
    padb = lambda b_: np.pad(b_, (0, cp - c))
    bqkv_p = jnp.asarray(np.concatenate([padb(bq), padb(bk), padb(bv)])).astype(dtype)
    wproj = rng.randn(c, c).astype(np.float32) * 0.05
    wproj_p = jnp.asarray(np.pad(wproj, ((0, cp - c), (0, 0)))).astype(dtype)
    bproj = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05)
    w1 = jnp.asarray(rng.randn(c, hidden).astype(np.float32) * 0.05).astype(dtype)
    bf1 = jnp.asarray(rng.randn(hidden).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(hidden, c).astype(np.float32) * 0.05).astype(dtype)
    bf2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05)
    g1 = jnp.ones((c,), dtype)
    b1 = jnp.zeros((c,), dtype)
    return (g1, b1, wqkv_p, bqkv_p, wproj_p, bproj, g1, b1, w1, bf1, w2, bf2), jnp.asarray(wqkv).astype(dtype), jnp.asarray(bqkv).astype(dtype), jnp.asarray(wproj).astype(dtype), bproj


def bench_stage(c, h, nw_side, shifted):
    L, Lp = 49, 64
    nw = nw_side * nw_side
    cp = _round_up(c, 128)
    hidden = 4 * c
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, nw, L, c).astype(np.float32) * 0.5).astype(jnp.bfloat16)
    params, wqkv, bqkv, wproj, bproj = make_params(c, cp, hidden, rng, jnp.bfloat16)
    (g1, b1, wqkv_p, bqkv_p, wproj_p, _, g2, b2, w1, bf1, w2, bf2) = params
    bias_np = rng.randn(nw if shifted else 1, h, L, L).astype(np.float32)
    # packed, padded bias: (nW|1, Lp, H*Lp), pad key cols -1e9
    bias_pad = np.full((bias_np.shape[0], h, Lp, Lp), -1e9, np.float32)
    bias_pad[:, :, :L, :L] = bias_np
    bias_pad[:, :, L:, :] = 0.0  # pad query rows: anything finite
    bias_pad[:, :, L:, L:] = 0.0
    bias_pad[:, :, :L, L:] = -1e9
    bias_packed_padded = jnp.asarray(np.transpose(bias_pad, (0, 2, 1, 3)).reshape(bias_np.shape[0], Lp, h * Lp))
    bias_packed = jnp.asarray(np.transpose(bias_np, (0, 2, 1, 3)).reshape(bias_np.shape[0], L, h * L))
    scale = (c // h) ** -0.5

    # committed baseline at block level: packed attention kernel + XLA
    # LN/MLP on windowed inputs
    from eqxvision_tpu.ops.attention import packed_window_attention

    def lnf(t):
        tf = t.astype(jnp.float32)
        mu = tf.mean(-1, keepdims=True)
        va = ((tf - mu) ** 2).mean(-1, keepdims=True)
        return ((tf - mu) * jax.lax.rsqrt(va + 1e-5)).astype(t.dtype)

    def gelu(t):
        return (0.5 * t.astype(jnp.float32) * (1.0 + jax.lax.erf(t.astype(jnp.float32) * 2.0**-0.5))).astype(t.dtype)

    @jax.jit
    def composed(xw):
        q = lnf(xw) @ wqkv_p + bqkv_p
        att = packed_window_attention(q, bias_packed, h, c, scale)
        h1 = xw + att @ wproj_p + bproj.astype(xw.dtype)
        return h1 + (gelu(lnf(h1) @ w1 + bf1.astype(xw.dtype)) @ w2 + bf2.astype(xw.dtype))

    t = timeit_ch(composed, x, iters=10)
    log(f"  composed packed+XLA block (c={c}, nW={nw}, shifted={shifted}): {t*1e3:.3f} ms")

    xpad = jnp.pad(x, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))

    @jax.jit
    def flat(xp):
        out = flat_fused_block(xp, params, bias_packed_padded, h, c, scale)
        return out

    ref = composed(x)
    got = flat(xpad)[:, :, :L, :]
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    t = timeit_ch(flat, xpad, iters=10)
    log(f"  L64-flat fused block                          : {t*1e3:.3f} ms  (max err vs composed {err:.1e})")


def main():
    log(f"device: {jax.devices()[0]}")
    for (c, h, nw_side) in [(96, 3, 8), (192, 6, 4), (384, 12, 2), (768, 24, 1)]:
        for shifted in (False, True):
            bench_stage(c, h, nw_side, shifted)


if __name__ == "__main__":
    main()
