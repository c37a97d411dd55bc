"""Round-2 Swin-T ablation: per-stage and per-piece timing at b128.

Run: python scripts/ablate_swin.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

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


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.ops import window_attention as wa

    log(f"device: {jax.devices()[0]}")
    model, state = create_model("swin_t")
    model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
    img = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def full(xb):
        logits, _ = model(xb, state)
        return xb + (jnp.sum(logits) * 0).astype(xb.dtype)

    t = timeit_ch(full, img, iters=10)
    log(f"full swin_t b{B}: {t*1e3:.2f} ms ({B/t:.0f} img/s)")

    # features is a Sequential of [embed, stage1, merge, stage2, merge,
    # stage3, merge, stage4]; inspect layout
    feats = model.features
    log(f"features layers: {[type(l).__name__ for l in feats.layers]}")

    # time cumulative prefixes to get per-layer costs
    xs = {}
    cur = img
    for i, layer in enumerate(feats.layers):
        @jax.jit
        def upto(xb, i=i):
            xx = xb
            for l in feats.layers[: i + 1]:
                xx = l(xx)
                if isinstance(xx, tuple):
                    xx = xx[0]
            return xb + (jnp.sum(xx) * 0).astype(xb.dtype)

        t = timeit_ch(upto, img, iters=10)
        log(f"prefix 0..{i} ({type(layer).__name__}): {t*1e3:.2f} ms")

    # per-piece of one block per stage
    with jax.default_matmul_precision("default"):
        emb = jax.jit(lambda xb: feats.layers[0](xb)[0])(img)
    emb = jax.block_until_ready(emb)

    stage_inputs = {1: emb}
    cur = emb
    for i in (1, 2, 3, 4, 5, 6, 7):
        cur = jax.block_until_ready(jax.jit(lambda xx, i=i: feats.layers[i](xx)[0] if getattr(type(feats.layers[i]), "__stateful__", False) else feats.layers[i](xx))(cur))
        if i == 2:
            stage_inputs[3] = cur
        elif i == 4:
            stage_inputs[5] = cur
        elif i == 6:
            stage_inputs[7] = cur

    for si, xin in stage_inputs.items():
        stage = feats.layers[si]
        blk = stage.layers[0]
        shifted_blk = stage.layers[1]
        log(f"stage layer {si}: input {xin.shape}")

        @jax.jit
        def attn_only(xx, blk=blk):
            return xx + 0 * blk.attn(blk.norm1(xx))

        t = timeit_ch(attn_only, xin, iters=10)
        log(f"  attn half (LN+swa, unshifted): {t*1e3:.3f} ms")

        @jax.jit
        def attn_only_s(xx, blk=shifted_blk):
            return xx + 0 * blk.attn(blk.norm1(xx))

        t = timeit_ch(attn_only_s, xin, iters=10)
        log(f"  attn half (LN+swa, shifted): {t*1e3:.3f} ms")

        @jax.jit
        def mlp_only(xx, blk=blk):
            return xx + 0 * blk.mlp(blk.norm2(xx))

        t = timeit_ch(mlp_only, xin, iters=10)
        log(f"  mlp half: {t*1e3:.3f} ms")

    # window partition/unpartition round trip only
    @jax.jit
    def part_only(xx):
        w = wa.window_partition(xx, 7, 7)
        return wa.window_unpartition(w, xx.shape[1], xx.shape[2], 7, 7)

    t = timeit_ch(part_only, emb, iters=20)
    log(f"partition+unpartition roundtrip: {t*1e3:.3f} ms")

    # qkv matmul at stage1 shape
    a = feats.layers[1].layers[0].attn
    qkvw = a.qkv.weight
    c = emb.shape[-1]

    @jax.jit
    def qkv_only(xx):
        w = wa.window_partition(xx, 7, 7)
        qkv = w @ qkvw.astype(xx.dtype)
        return xx + 0 * wa.window_unpartition(qkv[..., :c], xx.shape[1], xx.shape[2], 7, 7)

    t = timeit_ch(qkv_only, emb, iters=10)
    log(f"partition+qkv matmul(+slice unpartition): {t*1e3:.3f} ms")

    # attention core at stage1 shape (windows pre-made)
    xw = wa.window_partition(emb, 7, 7)
    qkv_full = jax.block_until_ready(jax.jit(lambda w: w @ qkvw.astype(w.dtype) + a.qkv.bias.astype(w.dtype))(xw))
    nW, L = xw.shape[1], 49
    heads = 3
    bias = jnp.zeros((1, nW, heads, L, L), jnp.float32)

    from eqxvision_tpu.ops.attention import attention_reference

    @jax.jit
    def attncore(qkv):
        n = qkv.shape[0]
        q3 = qkv.reshape(n, nW, L, 3, heads, c // heads)
        q3 = jnp.transpose(q3, (3, 0, 1, 4, 2, 5))
        q, k, v = q3[0], q3[1], q3[2]
        out = attention_reference(q, k, v, bias=bias, scale=(c // heads) ** -0.5)
        out = jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(n, nW, L, c)
        return qkv + 0 * jnp.concatenate([out, out, out], axis=-1)

    t = timeit_ch(attncore, qkv_full, iters=10)
    log(f"attention core (reshape+ref+reshape): {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
