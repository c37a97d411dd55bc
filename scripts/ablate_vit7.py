"""ViT-B/16 b256 non-matmul decomposition (VERDICT r3 #7).

Round-3 state: 64.87 ms e2e vs a ~51 ms pure-matmul floor at the
measured 174 TF/s XLA ceiling — ~14 ms unaccounted across the
attention kernel, LayerNorms, and embedding. This times each piece IN
ISOLATION (precompiled jits on realistic shapes, chained min-of-repeat
differencing) the way ablate_resnet2.py closed ResNet-50, so the gap
becomes a table instead of a guess.

Pieces per block (x12): LN1, qkv matmul (768->2304), fused attention
kernel (pair-packed), proj (768->768), LN2, fc1+gelu (768->3072),
fc2 (3072->768), residual adds. Plus patch-embed(+cls/pos) and the
final LN+head.

Run: python scripts/ablate_vit7.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, L, D, HID = 256, 197, 768, 3072
HEADS = 12

_sum = jax.jit(lambda t: jnp.sum(t[..., :1].astype(jnp.float32)))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(fn, x, iters=30, reps=3):
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


def chainable(f):
    """Wrap op f(x)->y as x->x' with a data dependency, preserving shape."""

    @jax.jit
    def g(x):
        y = f(x)
        return x + (jnp.sum(y[..., :1] if y.ndim else y) * 0).astype(x.dtype)

    return g


def main():
    _sync(jnp.ones((8, 8)))
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    xt = jnp.asarray(rng.randn(B, L, D) * 0.5, jnp.bfloat16)
    img = jnp.asarray(rng.randn(B, 224, 224, 3) * 0.5, jnp.bfloat16)

    from eqxvision_tpu import nn
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.ops.attention import fused_qkv_attention
    from eqxvision_tpu.ops.layernorm import layer_norm

    model, state = create_model("vit_base")
    model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
    blk = model.blocks[0]

    results = {}

    def rec(name, per_call_ms, count):
        results[name] = (per_call_ms, count)
        print(f"{name:18s}: {per_call_ms:7.4f} ms x{count:2d} = {per_call_ms*count:7.3f} ms", flush=True)

    # full model e2e
    @jax.jit
    def fwd(xb):
        out, _ = model(xb, state)
        return xb + (jnp.sum(out[:1]) * 0).astype(xb.dtype)

    t_e2e = timeit_ch(fwd, img, iters=15) * 1e3
    print(f"e2e: {t_e2e:.3f} ms", flush=True)

    # pieces
    w_qkv = blk.attn.qkv.weight
    b_qkv = blk.attn.qkv.bias
    w_proj = blk.attn.proj.weight
    b_proj = blk.attn.proj.bias
    w1, b1 = blk.mlp.fc1.weight, blk.mlp.fc1.bias
    w2, b2 = blk.mlp.fc2.weight, blk.mlp.fc2.bias
    g1, be1 = blk.norm1.weight, blk.norm1.bias

    rec("ln", timeit_ch(chainable(lambda x: layer_norm(x, g1, be1, 1e-6)), xt) * 1e3, 25)
    rec("qkv_matmul", timeit_ch(chainable(lambda x: x @ w_qkv + b_qkv.astype(x.dtype)), xt) * 1e3, 12)
    qkv = jnp.asarray(rng.randn(B, L, 3 * D) * 0.5, jnp.bfloat16)
    rec("attn_kernel", timeit_ch(chainable(lambda q: fused_qkv_attention(q, HEADS, (D // HEADS) ** -0.5)), qkv) * 1e3, 12)
    rec("proj", timeit_ch(chainable(lambda x: x @ w_proj + b_proj.astype(x.dtype)), xt) * 1e3, 12)

    def mlp_half(x):
        pre = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
        h = (0.5 * pre * (1.0 + jax.lax.erf(pre * (2.0 ** -0.5)))).astype(x.dtype)
        return h @ w2 + b2.astype(x.dtype)

    rec("mlp(fc1+gelu+fc2)", timeit_ch(chainable(mlp_half), xt) * 1e3, 12)
    rec("residual_add", timeit_ch(chainable(lambda x: x + x), xt) * 1e3, 24)

    @jax.jit
    def embed(im):
        y = model._prepare_tokens(im)
        return im + (jnp.sum(y[..., :1]) * 0).astype(im.dtype)

    rec("patch_embed+pos", timeit_ch(embed, img, iters=20) * 1e3, 1)

    head_w = model.head.weight
    feats = jnp.asarray(rng.randn(B, D) * 0.5, jnp.bfloat16)
    rec("head", timeit_ch(chainable(lambda x: x @ head_w), feats) * 1e3, 1)

    total = sum(ms * n for ms, n in results.values())
    print(f"\nsum of isolated pieces: {total:.3f} ms vs e2e {t_e2e:.3f} ms "
          f"({total/t_e2e:.2%}; isolation omits inter-op overlap/fusion)", flush=True)
    # matmul-floor accounting: qkv+proj+mlp+head are the MXU terms
    mm = sum(results[k][0] * results[k][1] for k in ("qkv_matmul", "proj", "mlp(fc1+gelu+fc2)", "head"))
    print(f"matmul terms: {mm:.3f} ms; attention kernel: "
          f"{results['attn_kernel'][0]*12:.3f} ms; LN: {results['ln'][0]*25:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
