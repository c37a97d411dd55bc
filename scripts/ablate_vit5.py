"""Round-2 ViT ablation part 4: find the ~13ms gap between the real
model (79.4 ms) and embed(1.1)+equivalent-blocks(64.3)+tail(0.6).

Times, all clean (no concurrent load):
  1. real model full
  2. real model blocks-only (token input)
  3. equivalent hand block chain using THE REAL WEIGHTS
  4. piece swaps: real attn half + hand mlp half, and vice versa
  5. hand chain + real embed + real tail composed
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, L, D, H, F = 256, 197, 768, 12, 3072
EPS = 1e-6
SCALE = (D // H) ** -0.5


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


def ln(x, w, b):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, -1, keepdims=True)
    return ((xc * jax.lax.rsqrt(var + EPS)) * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def gelu_f32(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0**-0.5)))


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.ops.attention import fused_qkv_attention

    log(f"device: {jax.devices()[0]}")
    model, state = create_model("vit_base")
    model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
    img = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)
    tok = (jax.random.normal(jax.random.PRNGKey(4), (B, L, D)) * 0.5).astype(jnp.bfloat16)

    @jax.jit
    def full(xb):
        logits, _ = model(xb, state)
        return xb + (jnp.sum(logits) * 0).astype(xb.dtype)

    t = timeit_ch(full, img, iters=10)
    log(f"1. real model full: {t*1e3:.2f} ms")

    @jax.jit
    def blocks_real(tt):
        xx = tt
        for blk in model.blocks:
            xx = blk(xx)
        return xx

    t = timeit_ch(blocks_real, tok, iters=10)
    log(f"2. real blocks x12: {t*1e3:.2f} ms")

    # hand chain with the real weights
    def attn_half_hand(x, blk):
        y = ln(x, blk.norm1.weight, blk.norm1.bias)
        a = blk.attn
        qkv = (jnp.dot(y, a.qkv.weight, preferred_element_type=jnp.float32)
               + a.qkv.bias.astype(jnp.float32)).astype(x.dtype)
        o = fused_qkv_attention(qkv, H, SCALE)
        o = jnp.dot(o, a.proj.weight, preferred_element_type=jnp.float32) + a.proj.bias.astype(jnp.float32)
        return (x.astype(jnp.float32) + o).astype(x.dtype)

    def mlp_half_hand(x, blk):
        y = ln(x, blk.norm2.weight, blk.norm2.bias)
        m = blk.mlp
        h = jnp.dot(y, m.fc1.weight, preferred_element_type=jnp.float32) + m.fc1.bias.astype(jnp.float32)
        h = gelu_f32(h).astype(x.dtype)
        o = jnp.dot(h, m.fc2.weight, preferred_element_type=jnp.float32) + m.fc2.bias.astype(jnp.float32)
        return (x.astype(jnp.float32) + o).astype(x.dtype)

    @jax.jit
    def blocks_hand(tt):
        xx = tt
        for blk in model.blocks:
            xx = mlp_half_hand(attn_half_hand(xx, blk), blk)
        return xx

    t = timeit_ch(blocks_hand, tok, iters=10)
    log(f"3. hand blocks x12 (real weights): {t*1e3:.2f} ms")
    err = float(jnp.max(jnp.abs(blocks_real(tok).astype(jnp.float32) - blocks_hand(tok).astype(jnp.float32))))
    log(f"   hand-vs-real maxerr: {err:.4f}")

    @jax.jit
    def blocks_swap_a(tt):  # real attn half, hand mlp half
        xx = tt
        for blk in model.blocks:
            xx = xx + blk.drop_path(blk.attn(blk.norm1(xx)))
            xx = mlp_half_hand(xx, blk)
        return xx

    t = timeit_ch(blocks_swap_a, tok, iters=10)
    log(f"4a. real-attn + hand-mlp: {t*1e3:.2f} ms")

    @jax.jit
    def blocks_swap_b(tt):  # hand attn half, real mlp half
        xx = tt
        for blk in model.blocks:
            xx = attn_half_hand(xx, blk)
            xx = xx + blk.drop_path(blk.mlp(blk.norm2(xx)))
        return xx

    t = timeit_ch(blocks_swap_b, tok, iters=10)
    log(f"4b. hand-attn + real-mlp: {t*1e3:.2f} ms")

    @jax.jit
    def full_hand(xb):
        tt = model._prepare_tokens(xb)
        xx = tt
        for blk in model.blocks:
            xx = mlp_half_hand(attn_half_hand(xx, blk), blk)
        y = model.norm(xx)
        logits = model.head(y[:, 0])
        return xb + (jnp.sum(logits) * 0).astype(xb.dtype)

    t = timeit_ch(full_hand, img, iters=10)
    log(f"5. real embed + hand blocks + real tail: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
