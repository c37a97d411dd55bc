"""Round-2 ViT ablation part 3: whole-block variants, 12-layer chains.

Variants (all b256, bf16, chained x->x):
  A. current block (XLA + fused_qkv pallas kernel)  x12
  B. pure-XLA block (no pallas anywhere)            x12
  C. fused-halves block (attn_fused g=1 + mlp_fused r=3152) x12
  D. lax.scan over 12 stacked layers, current block
  E. lax.scan over 12 stacked layers, fused halves
  plus: fused_qkv kernel standalone, LN standalone.

Run: python scripts/ablate_vit4.py
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

B, L, D, H, F = 256, 197, 768, 12, 3072
EPS = 1e-6
SCALE = (D // H) ** -0.5
R_TOT = B * L


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


def _erf_poly(x):
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return s * y


def gelu_kernel(x):
    return 0.5 * x * (1.0 + _erf_poly(x * (2.0**-0.5)))


def gelu_f32(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0**-0.5)))


def ln(x, w, b):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, -1, keepdims=True)
    return ((xc * jax.lax.rsqrt(var + EPS)) * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def make_layer_weights(key):
    ks = jax.random.split(key, 4)
    s = 0.02
    return {
        "ln1w": jnp.ones((D,), jnp.bfloat16), "ln1b": jnp.zeros((D,), jnp.bfloat16),
        "wqkv": (jax.random.normal(ks[0], (D, 3 * D)) * s).astype(jnp.bfloat16),
        "bqkv": jnp.zeros((3 * D,), jnp.bfloat16),
        "wproj": (jax.random.normal(ks[1], (D, D)) * s).astype(jnp.bfloat16),
        "bproj": jnp.zeros((D,), jnp.bfloat16),
        "ln2w": jnp.ones((D,), jnp.bfloat16), "ln2b": jnp.zeros((D,), jnp.bfloat16),
        "w1": (jax.random.normal(ks[2], (D, F)) * s).astype(jnp.bfloat16),
        "b1": jnp.zeros((F,), jnp.bfloat16),
        "w2": (jax.random.normal(ks[3], (F, D)) * s).astype(jnp.bfloat16),
        "b2": jnp.zeros((D,), jnp.bfloat16),
    }


# ---------------- block variants ----------------

def attn_half_current(x, w):
    from eqxvision_tpu.ops.attention import fused_qkv_attention

    y = ln(x, w["ln1w"], w["ln1b"])
    qkv = (jnp.dot(y, w["wqkv"], preferred_element_type=jnp.float32)
           + w["bqkv"].astype(jnp.float32)).astype(x.dtype)
    o = fused_qkv_attention(qkv, H, SCALE)
    o = jnp.dot(o, w["wproj"], preferred_element_type=jnp.float32) + w["bproj"].astype(jnp.float32)
    return (x.astype(jnp.float32) + o).astype(x.dtype)


def attn_half_xla(x, w):
    y = ln(x, w["ln1w"], w["ln1b"])
    qkv = (jnp.dot(y, w["wqkv"], preferred_element_type=jnp.float32)
           + w["bqkv"].astype(jnp.float32)).astype(x.dtype)
    n = x.shape[0]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return jnp.transpose(t.reshape(n, L, H, D // H), (0, 2, 1, 3))

    q, k, v = heads(q), heads(k), heads(v)
    s = jnp.einsum("nhld,nhmd->nhlm", q, k, preferred_element_type=jnp.float32) * SCALE
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("nhlm,nhmd->nhld", p, v, preferred_element_type=jnp.float32).astype(x.dtype)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(n, L, D)
    o = jnp.dot(o, w["wproj"], preferred_element_type=jnp.float32) + w["bproj"].astype(jnp.float32)
    return (x.astype(jnp.float32) + o).astype(x.dtype)


def mlp_half_xla(x, w):
    y = ln(x, w["ln2w"], w["ln2b"])
    h = jnp.dot(y, w["w1"], preferred_element_type=jnp.float32) + w["b1"].astype(jnp.float32)
    h = gelu_f32(h).astype(x.dtype)
    o = jnp.dot(h, w["w2"], preferred_element_type=jnp.float32) + w["b2"].astype(jnp.float32)
    return (x.astype(jnp.float32) + o).astype(x.dtype)


# fused attn-half kernel (from ablate_vit2, g=1)
def _attn_kernel(x_ref, lnw, lnb, wqkv, bqkv, wproj, bproj, o_ref, *, eps, heads, scale):
    x = x_ref[...]
    g, l, d = x.shape
    hd = d // heads
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, -1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps)) * lnw[...].astype(jnp.float32) + lnb[...].astype(jnp.float32)
    y = y.astype(x.dtype)
    qkv = jax.lax.dot_general(y, wqkv[...], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv[...].astype(jnp.float32)).astype(x.dtype)
    outs = []
    for h in range(heads):
        q = qkv[:, :, h * hd : (h + 1) * hd]
        k = qkv[:, :, d + h * hd : d + (h + 1) * hd]
        v = qkv[:, :, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, -1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, -1, keepdims=True)).astype(x.dtype)
        oh = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        outs.append(oh.astype(x.dtype))
    o = jnp.concatenate(outs, axis=-1)
    out = jax.lax.dot_general(o, wproj[...], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out = out + bproj[...].astype(jnp.float32) + xf
    o_ref[...] = out.astype(o_ref.dtype)


def attn_half_fused(x, w, g=1):
    b, l, d = x.shape
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, eps=EPS, heads=H, scale=SCALE),
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((1, d)), full((1, d)), full((d, 3 * d)), full((1, 3 * d)), full((d, d)), full((1, d)),
        ],
        out_specs=pl.BlockSpec((g, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * d * 4 * d + 4 * b * H * l * l * (d // H),
            bytes_accessed=2 * b * l * d * 2 + 4 * d * d * 2,
            transcendentals=b * H * l * l,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w["ln1w"].reshape(1, d), w["ln1b"].reshape(1, d), w["wqkv"], w["bqkv"].reshape(1, 3 * d),
      w["wproj"], w["bproj"].reshape(1, d))


def _mlp_kernel(x_ref, lnw_r, lnb_r, w1_r, b1_r, w2_r, b2_r, o_ref, *, fchunks):
    xx = x_ref[...]
    xf = xx.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, -1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + EPS)) * lnw_r[...].astype(jnp.float32) + lnb_r[...].astype(jnp.float32)
    y = y.astype(xx.dtype)
    f = w1_r.shape[-1]
    c = f // fchunks
    acc = xf
    for i in range(fchunks):
        h = jnp.dot(y, w1_r[:, i * c : (i + 1) * c], preferred_element_type=jnp.float32)
        h = h + b1_r[0, i * c : (i + 1) * c].astype(jnp.float32)
        h = gelu_kernel(h).astype(xx.dtype)
        acc = acc + jnp.dot(h, w2_r[i * c : (i + 1) * c, :], preferred_element_type=jnp.float32)
    acc = acc + b2_r[...].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def mlp_half_fused(x, w, r=3152, fchunks=1):
    b, l, d = x.shape
    x2 = x.reshape(b * l, d)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, fchunks=fchunks),
        out_shape=jax.ShapeDtypeStruct((b * l, d), x.dtype),
        grid=(b * l // r,),
        in_specs=[
            pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((1, d)), full((1, d)), full((d, F)), full((1, F)), full((F, d)), full((1, d)),
        ],
        out_specs=pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * l * d * F, bytes_accessed=2 * b * l * d * 2 + 2 * d * F * 2,
            transcendentals=b * l * F,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x2, w["ln2w"].reshape(1, d), w["ln2b"].reshape(1, d), w["w1"], w["b1"].reshape(1, F),
      w["w2"], w["b2"].reshape(1, d))
    return out.reshape(b, l, d)


def main():
    log(f"device: {jax.devices()[0]}")
    ws = [make_layer_weights(jax.random.PRNGKey(i)) for i in range(12)]
    x = (jax.random.normal(jax.random.PRNGKey(99), (B, L, D)) * 0.5).astype(jnp.bfloat16)

    def chain12(block):
        def f(xx):
            for w in ws:
                xx = block(xx, w)
            return xx
        return jax.jit(f)

    # correctness cross-check of fused block vs current
    cur = attn_half_current(x[:4], ws[0])
    fus = attn_half_fused(x[:4], ws[0])
    log(f"attn fused maxerr: {float(jnp.max(jnp.abs(cur.astype(jnp.float32)-fus.astype(jnp.float32)))):.4f}")
    curm = mlp_half_xla(x[:4], ws[0])
    fusm = mlp_half_fused(x[:4].reshape(4, L, D), ws[0], r=788 if (4*L) % 788 == 0 else 197, fchunks=1)
    log(f"mlp fused maxerr: {float(jnp.max(jnp.abs(curm.astype(jnp.float32)-fusm.astype(jnp.float32)))):.4f}")

    variants = {
        "A current (pallas qkv)": lambda xx, w: mlp_half_xla(attn_half_current(xx, w), w),
        "B pure XLA": lambda xx, w: mlp_half_xla(attn_half_xla(xx, w), w),
        "C fused halves": lambda xx, w: mlp_half_fused(attn_half_fused(xx, w), w),
        "C2 fused attn + xla mlp": lambda xx, w: mlp_half_xla(attn_half_fused(xx, w), w),
        "C3 pallas qkv + fused mlp": lambda xx, w: mlp_half_fused(attn_half_current(xx, w), w),
    }
    for name, blk in variants.items():
        try:
            t = timeit_ch(chain12(blk), x, iters=10)
            log(f"{name}: {t*1e3:.2f} ms/12  ({B/(t):.0f} eff img/s blocks-only)")
        except Exception as e:
            log(f"{name}: FAILED {str(e)[:140]}")

    # scan over stacked weights
    wstack = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *ws)

    def scan_current(xx):
        def body(c, w):
            return mlp_half_xla(attn_half_current(c, w), w), None
        y, _ = jax.lax.scan(body, xx, wstack)
        return y

    def scan_fused(xx):
        def body(c, w):
            return mlp_half_fused(attn_half_fused(c, w), w), None
        y, _ = jax.lax.scan(body, xx, wstack)
        return y

    for name, f in (("D scan current", scan_current), ("E scan fused", scan_fused)):
        try:
            t = timeit_ch(jax.jit(f), x, iters=10)
            log(f"{name}: {t*1e3:.2f} ms/12")
        except Exception as e:
            log(f"{name}: FAILED {str(e)[:140]}")

    # standalone kernels
    from eqxvision_tpu.ops.attention import fused_qkv_attention

    qkv = (jax.random.normal(jax.random.PRNGKey(5), (B, L, 3 * D)) * 0.3).astype(jnp.bfloat16)

    @jax.jit
    def k_only(qq):
        o = fused_qkv_attention(qq, H, SCALE)
        return jnp.concatenate([o, o, o], axis=-1) * 0 + qq  # keep shape

    t = timeit_ch(k_only, qkv, iters=10)
    log(f"fused_qkv kernel standalone (incl concat overhead): {t*1e3:.3f} ms")

    x2 = x.reshape(R_TOT, D)
    lnw = jnp.ones((D,), jnp.bfloat16)
    lnb = jnp.zeros((D,), jnp.bfloat16)
    t = timeit_ch(jax.jit(lambda xx: ln(xx, lnw, lnb)), x2, iters=20)
    log(f"LN standalone flat: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
