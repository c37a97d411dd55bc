"""Does XLA reach the v5e int8 MXU rate (2x bf16 peak) on dot_general?

v5e peak: ~197 TFLOP/s bf16, ~394 TOPS int8. bench.py's measured XLA
bf16 ceiling is 174 TF/s (50432x768x3072). If an int8 x int8 -> int32
dot with a fused dequant epilogue runs near 2x, a dynamic-activation
int8 path (quantize per batch on device) becomes a shippable serving
lever for matmul-bound configs (ViT-B/16 is 96% of its bf16 matmul
floor — only a faster matmul rate moves it). quantize.py's existing
int8 path is weight-only (weights dequantized to bf16 before the dot;
wins only when weight-READ-bound, i.e. small batch).

Shapes: the ViT-B/16 b256 fc1 GEMM (M=50432 tokens, K=768, N=3072).

Variants (all chained through a bf16 carry so every iteration's input
depends on the previous output; t1-vs-tn differencing per hbm_bw.py):
  bf16          y = x @ w                      (the 174 TF/s reference)
  int8_cast     xq = x.astype(int8) dot wq, dequant epilogue
                (cast-only quantize: lower bound on quantize cost)
  int8_dyn      per-tensor dynamic scale: amax -> scale -> round ->
                dot -> y * (sx*sw) (the real serving recipe)
  int8_dyn_pc   as int8_dyn but per-output-channel weight scales
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

M, K, N = 50432, 768, 3072
FLOPS = 2 * M * K * N

_sum = jax.jit(lambda t: jnp.sum(t[:8, :8].astype(jnp.float32)))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_fori(fn, x, n_short=20):
    """In-graph lax.fori_loop chains, long-vs-short differenced: ONE
    dispatch per chain, so per-call host/tunnel dispatch (100-400 us,
    2x process-to-process drift — CLAUDE.md r4) cancels exactly. The
    first Python-loop version of this script read an impossible 807
    TF/s for the bf16 arm under a degraded tunnel."""
    n_long = 3 * n_short
    loops = {}
    for n in (n_short, n_long):
        loops[n] = jax.jit(
            lambda x0, _n=n: jax.lax.fori_loop(0, _n, lambda i, xi: fn(xi), x0)
        )
        _sync(loops[n](x))  # compile

    def run(n):
        t0 = time.perf_counter()
        _sync(loops[n](x))
        return time.perf_counter() - t0

    for n in (n_short, n_long):
        run(n)
    shorts = [run(n_short) for _ in range(3)]
    longs = [run(n_long) for _ in range(3)]
    return (min(longs) - min(shorts)) / (n_long - n_short)


def main():
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x0 = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.bfloat16)
    wq = jnp.round(w.astype(jnp.float32) * 127.0 / 3.0).clip(-127, 127).astype(jnp.int8)
    sw = jnp.float32(3.0 / 127.0)
    sw_pc = jnp.full((N,), 3.0 / 127.0, jnp.float32)

    # every variant folds ALL of y back into the carry: consuming only a
    # slice lets XLA dead-code-eliminate the unread output columns of
    # the dot itself (the first run of this script "measured" 501 TF/s
    # bf16 — 1/4 of the contraction had been DCE'd away)
    def fold(x, y):
        g = (y[:, :K] + y[:, K:2 * K] + y[:, 2 * K:3 * K] + y[:, 3 * K:])
        return (x + g.astype(jnp.bfloat16) * jnp.bfloat16(1e-4)).astype(jnp.bfloat16)

    def f_bf16(x):
        y = x @ w
        return fold(x, y)

    def f_int8_cast(x):
        xq = x.astype(jnp.int8)  # cast-only quantize (no scale search)
        y32 = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        y = y32.astype(jnp.float32) * sw
        return fold(x, y)

    def f_int8_dyn(x):
        sx = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
        xq = jnp.round(x.astype(jnp.float32) / sx).clip(-127, 127).astype(jnp.int8)
        y32 = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        y = y32.astype(jnp.float32) * (sx * sw)
        return fold(x, y)

    def f_int8_dyn_pc(x):
        sx = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
        xq = jnp.round(x.astype(jnp.float32) / sx).clip(-127, 127).astype(jnp.int8)
        y32 = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        y = y32.astype(jnp.float32) * (sx * sw_pc)[None, :]
        return fold(x, y)

    print(f"dot {M}x{K}x{N}: {FLOPS/1e9:.0f} GFLOP/iter", flush=True)
    for name, fn in [("bf16", f_bf16), ("int8_cast", f_int8_cast),
                     ("int8_dyn", f_int8_dyn), ("int8_dyn_pc", f_int8_dyn_pc)]:
        t = timeit_fori(fn, x0)
        print(f"{name:12s}: {t*1e3:7.3f} ms  {FLOPS/t/1e12:6.1f} TFLOP-equiv/s",
              flush=True)


if __name__ == "__main__":
    main()
