"""Round-2 ViT ablation: prototype fused block-half kernels vs XLA.

Measures on-chip (b256, bf16):
  1. current full vit_base
  2. MLP half (LN+fc1+gelu+fc2+residual): XLA vs fused kernel (G sweep)
  3. attention half (LN+qkv+attn+proj+residual): current vs fused kernel

Run: python scripts/ablate_vit2.py
"""
import functools
import math
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


def log(*a):
    print(*a, flush=True)


_sum = jax.jit(lambda t: jnp.sum(t, dtype=jnp.float32))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit(fn, x, iters=20, reps=3):
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


def gelu_f32(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0**-0.5)))


def _erf_poly(x):
    """Abramowitz&Stegun 7.1.26 rational approx, |err| <= 1.5e-7 —
    far below bf16 resolution. Pallas TPU has no erf lowering."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return s * y


def gelu_kernel(x):
    return 0.5 * x * (1.0 + _erf_poly(x * (2.0**-0.5)))


def make_weights(key):
    ks = jax.random.split(key, 10)
    s = 0.02
    w = {
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
    return w


def ln(x, w, b):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, -1, keepdims=True)
    return ((xc * jax.lax.rsqrt(var + EPS)) * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


# ---------------- MLP half ----------------

def mlp_xla(x, w):
    y = ln(x, w["ln2w"], w["ln2b"])
    h = jnp.dot(y, w["w1"], preferred_element_type=jnp.float32) + w["b1"].astype(jnp.float32)
    h = gelu_f32(h).astype(x.dtype)
    o = jnp.dot(h, w["w2"], preferred_element_type=jnp.float32) + w["b2"].astype(jnp.float32)
    return (x.astype(jnp.float32) + o).astype(x.dtype)


def _mlp_kernel(x_ref, lnw, lnb, w1, b1, w2, b2, o_ref, *, eps, fchunks):
    x = x_ref[...]  # (G, L, D)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, -1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps)) * lnw[...].astype(jnp.float32) + lnb[...].astype(jnp.float32)
    y = y.astype(x.dtype)
    f = w1.shape[-1]
    c = f // fchunks
    acc = xf
    for i in range(fchunks):
        h = jax.lax.dot_general(y, w1[:, i * c : (i + 1) * c], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = h + b1[0, i * c : (i + 1) * c].astype(jnp.float32)
        h = gelu_kernel(h).astype(x.dtype)
        acc = acc + jax.lax.dot_general(h, w2[i * c : (i + 1) * c, :], (((2,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    acc = acc + b2[...].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def mlp_fused(x, w, g, fchunks):
    b, l, d = x.shape
    f = w["w1"].shape[-1]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_kernel, eps=EPS, fchunks=fchunks),
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((1, d)), full((1, d)), full((d, f)), full((1, f)), full((f, d)), full((1, d)),
        ],
        out_specs=pl.BlockSpec((g, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * l * d * f, bytes_accessed=2 * b * l * d * 2 + 2 * d * f * 2,
            transcendentals=b * l * f,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, w["ln2w"].reshape(1, d), w["ln2b"].reshape(1, d), w["w1"], w["b1"].reshape(1, f),
      w["w2"], w["b2"].reshape(1, d))


# ---------------- attention half ----------------

def attn_xla_current(x, w):
    from eqxvision_tpu.ops.attention import fused_qkv_attention

    y = ln(x, w["ln1w"], w["ln1b"])
    qkv = jnp.dot(y, w["wqkv"], preferred_element_type=jnp.float32) + w["bqkv"].astype(jnp.float32)
    o = fused_qkv_attention(qkv.astype(x.dtype), H, SCALE)
    o = jnp.dot(o, w["wproj"], preferred_element_type=jnp.float32) + w["bproj"].astype(jnp.float32)
    return (x.astype(jnp.float32) + o).astype(x.dtype)


def _attn_kernel(x_ref, lnw, lnb, wqkv, bqkv, wproj, bproj, o_ref, *, eps, heads, scale):
    x = x_ref[...]  # (G, L, D)
    g, l, d = x.shape
    hd = d // heads
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, -1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps)) * lnw[...].astype(jnp.float32) + lnb[...].astype(jnp.float32)
    y = y.astype(x.dtype)
    qkv = jax.lax.dot_general(y, wqkv[...], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv[...].astype(jnp.float32)).astype(x.dtype)  # (G, L, 3D)
    outs = []
    for h in range(heads):
        q = qkv[:, :, h * hd : (h + 1) * hd]
        k = qkv[:, :, d + h * hd : d + (h + 1) * hd]
        v = qkv[:, :, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, -1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, -1, keepdims=True)).astype(x.dtype)
        oh = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        outs.append(oh.astype(x.dtype))
    o = jnp.concatenate(outs, axis=-1)
    out = jax.lax.dot_general(o, wproj[...], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + bproj[...].astype(jnp.float32) + xf
    o_ref[...] = out.astype(o_ref.dtype)


def attn_fused(x, w, g):
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, w["ln1w"].reshape(1, d), w["ln1b"].reshape(1, d), w["wqkv"], w["bqkv"].reshape(1, 3 * d),
      w["wproj"], w["bproj"].reshape(1, d))


def main():
    log(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    w = make_weights(key)
    x = (jax.random.normal(jax.random.PRNGKey(1), (B, L, D)) * 0.5).astype(jnp.bfloat16)

    # 0. full current model
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model

    model, state = create_model("vit_base")
    model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
    img = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def fwd(xb):
        logits, _ = model(xb, state)
        return xb + (jnp.sum(logits) * 0).astype(xb.dtype)

    t = timeit(fwd, img, iters=10)
    log(f"full vit_base b{B}: {t*1e3:.2f} ms  ({B/t:.0f} img/s)")

    # 1. MLP half
    f_xla = jax.jit(lambda xx: mlp_xla(xx, w))
    t = timeit(f_xla, x)
    log(f"mlp XLA: {t*1e3:.3f} ms/layer ({t*12*1e3:.1f} ms/12)")
    for g in (1, 2, 4):
        for fc in (1, 2, 4):
            try:
                f_k = jax.jit(lambda xx, g=g, fc=fc: mlp_fused(xx, w, g, fc))
                # correctness first
                ref = f_xla(x[: 2 * g])
                got = mlp_fused(x[: 2 * g], w, g, fc)
                err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
                t = timeit(f_k, x)
                log(f"mlp fused g={g} fc={fc}: {t*1e3:.3f} ms/layer ({t*12*1e3:.1f} ms/12)  maxerr={err:.4f}")
            except Exception as e:
                log(f"mlp fused g={g} fc={fc}: FAILED {str(e)[:160]}")

    # 2. attention half
    f_cur = jax.jit(lambda xx: attn_xla_current(xx, w))
    t = timeit(f_cur, x)
    log(f"attn current (LN+qkv+kernel+proj): {t*1e3:.3f} ms/layer ({t*12*1e3:.1f} ms/12)")
    for g in (1, 2, 4, 8):
        try:
            f_k = jax.jit(lambda xx, g=g: attn_fused(xx, w, g))
            ref = f_cur(x[: 2 * g])
            got = attn_fused(x[: 2 * g], w, g)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
            t = timeit(f_k, x)
            log(f"attn fused g={g}: {t*1e3:.3f} ms/layer ({t*12*1e3:.1f} ms/12)  maxerr={err:.4f}")
        except Exception as e:
            log(f"attn fused g={g}: FAILED {str(e)[:160]}")


if __name__ == "__main__":
    main()
