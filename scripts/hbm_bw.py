"""Measure achievable HBM bandwidth on the attached TPU chip.

VERDICT r1 item: the depthwise+SE roofline argument in docs/design.md
compared against NOMINAL HBM bandwidth; this measures the achievable
number so the memory-bound claims (MobileNetV3 51k img/s,
EfficientNet-B0 24.4k) are anchored to a measured ceiling.

Three kernels, all timed with the min-of-repeats chained harness
(single-run timings are noise on the tunneled platform):
  copy   : y = x            (R+W, 2 bytes/elem moved per byte of tensor)
  scale  : y = 2*x          (R+W)
  triad  : y = a*x + b      (R+W, classic STREAM shape)
and a bf16->f32 cast (asymmetric R/W) for the epilogue-cast pattern.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_sum = jax.jit(lambda t: jnp.sum(t[:8, :8].astype(jnp.float32)))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(fn, x, iters=30, reps=3):
    fn = jax.jit(fn)
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
    n_mb = 512  # 512 MiB tensor: far beyond VMEM/caches
    n = n_mb * 1024 * 1024 // 2  # bf16 elems
    rows = 1 << 14
    x = jnp.ones((rows, n // rows), jnp.bfloat16)
    bytes_rw = 2 * x.size * 2  # read + write

    t = timeit_ch(lambda t_: t_ + jnp.bfloat16(0) * t_[0, 0], x, iters=20)
    print(f"copy+eps ({n_mb} MiB bf16): {t*1e3:.3f} ms -> {bytes_rw/t/1e9:.0f} GB/s", flush=True)

    t = timeit_ch(lambda t_: t_ * jnp.bfloat16(1.0000001), x, iters=20)
    print(f"scale    ({n_mb} MiB bf16): {t*1e3:.3f} ms -> {bytes_rw/t/1e9:.0f} GB/s", flush=True)

    t = timeit_ch(lambda t_: t_ * jnp.bfloat16(1.0000001) + jnp.bfloat16(1e-8), x, iters=20)
    print(f"triad    ({n_mb} MiB bf16): {t*1e3:.3f} ms -> {bytes_rw/t/1e9:.0f} GB/s", flush=True)

    xf = x.astype(jnp.float32)  # 1 GiB f32
    bytes_rw_f = 2 * xf.size * 4
    t = timeit_ch(lambda t_: t_ * jnp.float32(1.0000001), xf, iters=10)
    print(f"scale    (1 GiB f32)     : {t*1e3:.3f} ms -> {bytes_rw_f/t/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
