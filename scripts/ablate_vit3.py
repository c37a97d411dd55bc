"""Round-2 ViT ablation part 2: matmul ceilings, row-flattened fused
MLP kernel, and the embed/head "rest" cost.

Run: python scripts/ablate_vit3.py
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
R_TOT = B * L  # 50432 rows
EPS = 1e-6


def log(*a):
    print(*a, flush=True)


_sum = jax.jit(lambda t: jnp.sum(t, dtype=jnp.float32))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(fn, x, iters=20, reps=3):
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


def main():
    log(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    w1 = (jax.random.normal(ks[0], (D, F)) * 0.02).astype(jnp.bfloat16)
    w2 = (jax.random.normal(ks[1], (F, D)) * 0.02).astype(jnp.bfloat16)
    wqkv = (jax.random.normal(ks[2], (D, 3 * D)) * 0.02).astype(jnp.bfloat16)
    lnw = jnp.ones((D,), jnp.bfloat16)
    lnb = jnp.zeros((D,), jnp.bfloat16)
    b1 = jnp.zeros((F,), jnp.bfloat16)
    b2 = jnp.zeros((D,), jnp.bfloat16)
    x2 = (jax.random.normal(ks[3], (R_TOT, D)) * 0.5).astype(jnp.bfloat16)

    # ---- pure matmul ceilings (chained x->y->shape-preserving) ----
    def mm_roundtrip(xx):  # (R, D) -> (R, F) -> (R, D): fc1+fc2 without gelu
        h = jnp.dot(xx, w1, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    t = timeit_ch(jax.jit(mm_roundtrip), x2, iters=20)
    fl = 2 * R_TOT * D * F * 2
    log(f"fc1+fc2 matmuls only: {t*1e3:.3f} ms  {fl/t/1e12:.1f} TFLOP/s")

    def mm_qkv(xx):  # (R, D) -> (R, 3D) -> back via slice sum trick
        h = jnp.dot(xx, wqkv, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return h[:, :D] + h[:, D : 2 * D] + h[:, 2 * D :]

    t = timeit_ch(jax.jit(mm_qkv), x2, iters=20)
    log(f"qkv matmul (+slice-add): {t*1e3:.3f} ms  {2*R_TOT*D*3*D/t/1e12:.1f} TFLOP/s")

    # ---- XLA mlp half on flat rows ----
    def mlp_xla(xx):
        y = ln(xx, lnw, lnb)
        h = jnp.dot(y, w1, preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
        h = gelu_f32(h).astype(xx.dtype)
        o = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
        return (xx.astype(jnp.float32) + o).astype(xx.dtype)

    f_xla = jax.jit(mlp_xla)
    t = timeit_ch(f_xla, x2)
    log(f"mlp XLA flat: {t*1e3:.3f} ms/layer")

    # ---- row-flattened fused MLP kernel ----
    def _mlp_kernel(x_ref, lnw_r, lnb_r, w1_r, b1_r, w2_r, b2_r, o_ref, *, fchunks):
        xx = x_ref[...]  # (R, D)
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

    def mlp_fused(xx, r, fchunks):
        rows = xx.shape[0]
        full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_mlp_kernel, fchunks=fchunks),
            out_shape=jax.ShapeDtypeStruct((rows, D), xx.dtype),
            grid=(rows // r,),
            in_specs=[
                pl.BlockSpec((r, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                full((1, D)), full((1, D)), full((D, F)), full((1, F)), full((F, D)), full((1, D)),
            ],
            out_specs=pl.BlockSpec((r, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=4 * rows * D * F, bytes_accessed=2 * rows * D * 2 + 2 * D * F * 2,
                transcendentals=rows * F,
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(xx, lnw.reshape(1, D), lnb.reshape(1, D), w1, b1.reshape(1, F), w2, b2.reshape(1, D))

    ref = f_xla(x2[:3152])
    for r in (394, 788, 1576, 3152):
        for fc in (1, 2, 4):
            try:
                got = mlp_fused(x2[:3152], 394 if r > 3152 else min(r, 3152), fc)
                err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
                f_k = jax.jit(lambda xx, r=r, fc=fc: mlp_fused(xx, r, fc))
                t = timeit_ch(f_k, x2)
                log(f"mlp fused flat r={r} fc={fc}: {t*1e3:.3f} ms/layer  maxerr={err:.4f}")
            except Exception as e:
                log(f"mlp fused flat r={r} fc={fc}: FAILED {str(e)[:120]}")

    # ---- the 'rest': embed + head sections of the real model ----
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model

    model, state = create_model("vit_base")
    model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
    img = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def embed_only(xb):
        t = model._prepare_tokens(xb)
        # keep shape: return something image-shaped
        return xb + (jnp.sum(t) * 0).astype(xb.dtype)

    t = timeit_ch(embed_only, img, iters=20)
    log(f"embed (patch+cls+pos): {t*1e3:.3f} ms")

    tok = (jax.random.normal(ks[4], (B, L, D)) * 0.5).astype(jnp.bfloat16)

    @jax.jit
    def tail_only(tt):
        y = model.norm(tt)
        logits = model.head(y[:, 0])
        return tt + (jnp.sum(logits) * 0).astype(tt.dtype)

    t = timeit_ch(tail_only, tok, iters=20)
    log(f"tail (final LN + head): {t*1e3:.3f} ms")

    @jax.jit
    def blocks_only(tt):
        xx = tt
        for blk in model.blocks:
            xx = blk(xx)
        return xx

    t = timeit_ch(blocks_only, tok, iters=10)
    log(f"12 blocks only: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
