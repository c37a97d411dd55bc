"""Round-2 ViT ablation part 6: pair-packed attention kernel A/B.

The default _qkv_attn_kernel slices q/k/v per head at 64-lane offsets —
half of those slices start mid-tile (128-lane tiles) and cost VMEM
relayouts (the failure mode the Swin packed kernel fixed). The pair
variant (_qkv_attn_kernel_pair, EQXVISION_TPU_VIT_PAIR=1) processes two
heads per 128-lane slab with lane-masked matmuls (2x score/PV FLOPs,
which are negligible at L=197/Dh=64).

Runs (one process, fresh jit per case):
  A. isolated kernel, default path, (256, 197, 3*768) bf16
  B. isolated kernel, pair path
  C. vit_base b256 end-to-end, default (prior: 3.87k img/s / 66.2 ms)
  D. vit_base b256 end-to-end, pair
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["EQXTPU_BENCH_SKIP_BASELINE"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

import bench


_sum = jax.jit(lambda t: jnp.sum(t, dtype=jnp.float32))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(make_fn, x, iters=20, reps=3):
    fn = jax.jit(make_fn)
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
    import importlib

    A = importlib.import_module("eqxvision_tpu.ops.attention")

    B, L, D, H = 256, 197, 768, 12
    scale = (D // H) ** -0.5
    qkv = jnp.asarray(np.random.default_rng(0).standard_normal((B, L, 3 * D)), jnp.bfloat16)

    def chain(kernel_env):
        def f(t):
            os.environ_marker = kernel_env  # noqa — trace-time only
            o = A._fused_qkv_attention(t[:, :, : 3 * D], H, scale)
            return jnp.concatenate([o, o, o], axis=-1).astype(t.dtype)

        return f

    os.environ.pop("EQXVISION_TPU_VIT_PAIR", None)
    t = timeit_ch(chain("off"), qkv, iters=20)
    print(f"A. isolated kernel default: {t*1e3:.3f} ms", flush=True)

    os.environ["EQXVISION_TPU_VIT_PAIR"] = "1"
    t = timeit_ch(chain("on"), qkv, iters=20)
    print(f"B. isolated kernel pair   : {t*1e3:.3f} ms", flush=True)

    os.environ.pop("EQXVISION_TPU_VIT_PAIR", None)
    print("== C. vit_base b256, default (prior 3.87k img/s) ==", flush=True)
    print(bench.bench_one("vit_b16"), flush=True)

    os.environ["EQXVISION_TPU_VIT_PAIR"] = "1"
    print("== D. vit_base b256, pair kernel ==", flush=True)
    print(bench.bench_one("vit_b16"), flush=True)
    os.environ.pop("EQXVISION_TPU_VIT_PAIR", None)


if __name__ == "__main__":
    main()
