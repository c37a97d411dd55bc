"""Swin softmax-policy A/B, round 4 (VERDICT r3 next-steps #1/#3).

Round 3 shipped NaN-safe softmax (per-head masked max) in BOTH window
kernels and the official bench regressed swin_t 4722 -> 4277 img/s
(+2.8 ms) — the kernel-only ablation (ablate_swin9.py, packed kernel at
stage3/4 shapes, ~0.2 ms/stage) never isolated the WHOLE-BLOCK kernel
at stage1/2 shapes, where the per-head loop runs inside 512
serial-VPU-bound programs per block.

Round-4 fix under test (EQXVISION_TPU_SWIN_SOFTMAX, read at trace time
so one process A/Bs all modes):

  safe     (new default) unaligned L=49: host-side per-segment bias-max
           prefold (_prefold_bias_packed; exact — softmax shift
           invariance) + in-kernel GLOBAL row max + guarded denominator;
           aligned L=64: quarter-power _segment_softmax in the
           whole-block kernel too (it previously ran the per-head loop,
           VERDICT r3 weak #2).
  perhead  the round-3 formulation (regressed).
  unsafe   the round-2 global max, no prefold (speed floor; NaNs
           adversarially).

Measures (in-process, chained min-of-repeats):
  1. full swin_t b128 224^2 and swin_v2_t b128 256^2 forward per mode;
  2. one isolated whole-block kernel call per stage1/2 shape per mode
     (the unaccounted term in VERDICT r3 weak #1).

Run: python scripts/ablate_swin10.py [--models-only|--blocks-only]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.core.filters import cast_inexact
from eqxvision_tpu.models import create_model

MODES = ("unsafe", "perhead", "safe")

_sum = jax.jit(lambda t: jnp.sum(t[..., :1].astype(jnp.float32)))


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


def bench_model(name, batch, size):
    model, state = create_model(name)
    model = tree_inference(model, True)
    model = cast_inexact(model, jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(batch, size, size, 3) * 0.5, jnp.bfloat16)
    for mode in MODES:
        os.environ["EQXVISION_TPU_SWIN_SOFTMAX"] = mode

        @jax.jit
        def fwd(xb, _m=model, _s=state):
            out, _ = _m(xb, _s)
            return xb + (jnp.sum(out[:1]) * 0).astype(xb.dtype)

        t = timeit_ch(fwd, x, iters=15)
        print(f"{name} b{batch} {mode:8s}: {t*1e3:7.3f} ms  {batch/t:7.1f} img/s", flush=True)
    os.environ["EQXVISION_TPU_SWIN_SOFTMAX"] = "safe"


def bench_block(tag, cls, c, heads, win, shift, hw, batch, kw):
    from eqxvision_tpu.models.classification import swin as S

    blk = tree_inference(
        cls(c, heads, window_size=win, shift_size=(shift, shift), key=jax.random.PRNGKey(0), **kw),
        True,
    )
    blk = cast_inexact(blk, jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(1).randn(batch, hw, hw, c) * 0.5, jnp.bfloat16)
    for mode in MODES:
        os.environ["EQXVISION_TPU_SWIN_SOFTMAX"] = mode

        @jax.jit
        def fwd(xb, _b=blk):
            out = _b(xb)
            return xb + (jnp.sum(out[:1, :1, :1]) * 0).astype(xb.dtype)

        try:
            t = timeit_ch(fwd, x, iters=20)
            print(f"{tag} C={c:3d} H={heads} hw={hw} sh={shift} {mode:8s}: {t*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"{tag} C={c:3d} H={heads} hw={hw} sh={shift} {mode:8s}: FAIL {str(e)[:120]}", flush=True)
    os.environ["EQXVISION_TPU_SWIN_SOFTMAX"] = "safe"


def main():
    from eqxvision_tpu.models.classification.swin import (
        _ShiftedWindowAttentionV2,
        _SwinTransformerBlock,
        _SwinTransformerBlockV2,
    )

    # probe: a trivial jit first (tunnel-wedge guard, CLAUDE.md)
    _sync(jnp.ones((8, 8)))
    print(f"backend: {jax.default_backend()}", flush=True)

    if "--blocks-only" not in sys.argv:
        bench_model("swin_t", 128, 224)
        bench_model("swin_v2_t", 128, 256)
    if "--models-only" not in sys.argv:
        b = 128
        # v1 stage1/2 (whole-block kernel shapes), shifted (bias per window)
        for c, h, hw in ((96, 3, 56), (192, 6, 28)):
            bench_block("v1blk", _SwinTransformerBlock, c, h, (7, 7), 3, hw, b, {})
        # v2 stage1/2 at 256^2
        for c, h, hw in ((96, 3, 64), (192, 6, 32)):
            bench_block(
                "v2blk", _SwinTransformerBlockV2, c, h, (8, 8), 4, hw, b,
                {"attn_layer": _ShiftedWindowAttentionV2},
            )
        # v1/v2 stage3 (packed kernel, no whole-block): L=49 unaligned path
        for c, h, hw in ((384, 12, 14),):
            bench_block("v1blk", _SwinTransformerBlock, c, h, (7, 7), 3, hw, b, {})
        for c, h, hw in ((384, 12, 16),):
            bench_block(
                "v2blk", _SwinTransformerBlockV2, c, h, (8, 8), 4, hw, b,
                {"attn_layer": _ShiftedWindowAttentionV2},
            )


if __name__ == "__main__":
    main()
