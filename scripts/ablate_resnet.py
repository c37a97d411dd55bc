"""Round-2 ResNet-50 conv-throughput ablation (VERDICT r1 #4).

Measures per-stage time, FLOPs, and achieved TFLOP/s for resnet50 b128
bf16 inference, plus formulation variants:
  - matmul-precision sweep on the whole model,
  - space-to-depth stem (ops/space_to_depth.py, opt-in),
  - an im2col+GEMM reformulation of one mid-stage 3x3 conv (to see
    whether XLA's native conv lowering leaves MXU throughput behind).

Run: python scripts/ablate_resnet.py
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


def conv_gflops(cin, cout, k, hout, wout):
    return 2 * cin * cout * k * k * hout * wout / 1e9


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model

    log(f"device: {jax.devices()[0]}")
    model, state = create_model("resnet50")
    model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
    img = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def full(xb):
        logits, _ = model(xb, state)
        return xb + (jnp.sum(logits) * 0).astype(xb.dtype)

    t = timeit_ch(full, img, iters=20)
    total_gflops = 2 * 4.09  # 4.09 GMACs/img published
    log(f"resnet50 b{B}: {t*1e3:.2f} ms ({B/t:.0f} img/s, {total_gflops*B/t/1e3:.1f} TFLOP/s)")

    # matmul-precision variants
    for prec in ("default", "bfloat16", "tensorfloat32", "float32"):
        try:
            with jax.default_matmul_precision(prec):
                @jax.jit
                def fullp(xb):
                    logits, _ = model(xb, state)
                    return xb + (jnp.sum(logits) * 0).astype(xb.dtype)

                tp = timeit_ch(fullp, img, iters=10)
            log(f"  precision={prec}: {tp*1e3:.2f} ms ({B/tp:.0f} img/s)")
        except Exception as e:
            log(f"  precision={prec}: failed {type(e).__name__}")

    # per-stage prefix timing
    from eqxvision_tpu import nn

    @jax.jit
    def stem_only(xb):
        y = model.maxpool(nn.relu(model.bn1(model.conv1(xb), state)[0]))
        return xb + (jnp.sum(y) * 0).astype(xb.dtype)

    try:
        t0 = timeit_ch(stem_only, img, iters=20)
        log(f"stem: {t0*1e3:.3f} ms")
    except Exception as e:
        log(f"stem timing failed: {e}")
        t0 = None

    # cumulative prefixes over layer1..layer4
    def make_prefix(depth):
        @jax.jit
        def upto(xb):
            y = model.maxpool(nn.relu(model.bn1(model.conv1(xb), state)[0]))
            names = ["layer1", "layer2", "layer3", "layer4"][:depth]
            for nm in names:
                y, _ = getattr(model, nm)(y, state)
            return xb + (jnp.sum(y) * 0).astype(xb.dtype)

        return upto

    prev = t0
    # per-image GFLOPs per stage (2x MACs), torchvision resnet50 b128
    stage_gf = {"layer1": 2 * 0.69, "layer2": 2 * 1.06, "layer3": 2 * 1.47, "layer4": 2 * 0.81}
    for d, nm in enumerate(["layer1", "layer2", "layer3", "layer4"], start=1):
        tt = timeit_ch(make_prefix(d), img, iters=10)
        if prev is not None:
            dt = tt - prev
            gf = stage_gf[nm] * B
            log(f"{nm}: {dt*1e3:.3f} ms  (~{gf/dt/1e3:.0f} TFLOP/s)")
        prev = tt

    # im2col+GEMM variant of a layer2-style 3x3 conv: 28x28x128 -> 28x28x128
    rng = np.random.RandomState(0)
    xx = jnp.asarray(rng.randn(B, 28, 28, 128).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    @jax.jit
    def conv_native(t_):
        return jax.lax.conv_general_dilated(
            t_, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_im2col(t_):
        patches = jax.lax.conv_general_dilated_patches(
            t_, (3, 3), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # patches (B, 28, 28, 9*128) with feature order (C, KH, KW)
        wr = jnp.transpose(w, (2, 0, 1, 3)).reshape(9 * 128, 128)
        return patches.reshape(B * 28 * 28, 9 * 128) @ wr

    gf = conv_gflops(128, 128, 3, 28, 28) * B
    tn = timeit_ch(conv_native, xx, iters=30)
    log(f"3x3 conv native (28x28x128): {tn*1e3:.3f} ms ({gf/tn/1e3:.0f} TFLOP/s)")
    ti = timeit_ch(lambda t_: conv_im2col(t_).reshape(B, 28, 28, 128), xx, iters=30)
    log(f"3x3 conv im2col+GEMM       : {ti*1e3:.3f} ms ({gf/ti/1e3:.0f} TFLOP/s)")

    # big dense conv in layer3 at 14x14x256->256
    xx3 = jnp.asarray(rng.randn(B, 14, 14, 256).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(3, 3, 256, 256).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    @jax.jit
    def conv3_native(t_):
        return jax.lax.conv_general_dilated(
            t_, w3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    gf3 = conv_gflops(256, 256, 3, 14, 14) * B
    tn3 = timeit_ch(conv3_native, xx3, iters=30)
    log(f"3x3 conv native (14x14x256): {tn3*1e3:.3f} ms ({gf3/tn3/1e3:.0f} TFLOP/s)")

    # pure GEMM of equivalent FLOPs for reference ceiling
    a = jnp.zeros((B * 28 * 28, 9 * 128), jnp.bfloat16)
    bm = jnp.zeros((9 * 128, 128), jnp.bfloat16)

    @jax.jit
    def gemm(t_):
        out = t_ @ bm
        return t_ + (jnp.sum(out) * 0).astype(t_.dtype)

    tg = timeit_ch(gemm, a, iters=30)
    log(f"equivalent GEMM ceiling    : {tg*1e3:.3f} ms ({gf/tg/1e3:.0f} TFLOP/s)")


if __name__ == "__main__":
    main()
