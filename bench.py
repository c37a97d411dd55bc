"""Benchmark: ResNet-50 batch-128 inference images/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": R}

``vs_baseline`` compares against a faithful emulation of the
*reference's* execution model on the same chip: per-sample (C,H,W)
modules vmapped over the batch in float32 (reference README.md:37-46)
— i.e. the speedup of this framework's batched NHWC bf16 design over
porting the reference as-is. The reference itself publishes no
throughput numbers (SURVEY.md §6), so its own design run on identical
hardware is the honest baseline.

Timing methodology: on this environment's tunneled TPU platform,
``block_until_ready`` does not synchronize, so completion is forced by
a pre-compiled scalar reduction + host transfer, and dispatch/sync
overhead is removed by differencing a 1-iteration run against an
N-iteration chained run (each iteration's input depends on the previous
output, so the device must execute them all).

Env knobs: EQXTPU_BENCH_BATCH (128), EQXTPU_BENCH_ITERS (20),
EQXTPU_BENCH_SKIP_BASELINE=1.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_sum = jax.jit(lambda t: jnp.sum(t, dtype=jnp.float32))


def _sync(t) -> float:
    return float(np.asarray(_sum(t)))


def time_chained(fwd_chain, m, s, x, iters: int) -> float:
    """Seconds per iteration of fwd_chain, overhead-corrected."""
    logits, xc = fwd_chain(m, s, x)  # compile
    _sync(logits)

    def run(n):
        t0 = time.perf_counter()
        xi = x
        logits = None
        for _ in range(n):
            logits, xi = fwd_chain(m, s, xi)
        _sync(logits)
        return time.perf_counter() - t0

    run(1)  # warm sync path
    t1 = run(1)
    tn = run(iters + 1)
    return (tn - t1) / iters


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models.classification.resnet import resnet50

    batch = int(os.environ.get("EQXTPU_BENCH_BATCH", "128"))
    iters = int(os.environ.get("EQXTPU_BENCH_ITERS", "20"))
    log(f"bench: resnet50 b{batch} on {jax.devices()[0]}")

    model, state = resnet50()
    model = tree_inference(model, True)

    # ---- ours: batched NHWC, bf16 params/activations, f32 accumulation
    model_bf16 = cast_inexact(model, jnp.bfloat16)
    x = jnp.zeros((batch, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def fwd_chain(m, s, xb):
        logits, _ = m(xb, s)
        xn = xb + (jnp.sum(logits) * 0).astype(xb.dtype)
        return logits, xn

    t = time_chained(fwd_chain, model_bf16, state, x, iters)
    ours = batch / t
    log(f"ours: {ours:.1f} img/s ({t*1e3:.2f} ms/batch)")

    # ---- baseline: reference execution model (per-sample CHW vmap, f32)
    vs = 0.0
    if os.environ.get("EQXTPU_BENCH_SKIP_BASELINE") != "1":
        try:
            x_chw = jnp.zeros((batch, 3, 224, 224), jnp.float32)

            @jax.jit
            def fwd_ref_chain(m, s, xb):
                def single(img):
                    logits, _ = m(img, s)  # (C,H,W) compat path
                    return logits

                logits = jax.vmap(single)(xb)
                xn = xb + (jnp.sum(logits) * 0).astype(xb.dtype)
                return logits, xn

            t_ref = time_chained(fwd_ref_chain, model, state, x_chw, max(iters // 2, 5))
            base = batch / t_ref
            log(f"reference-style baseline: {base:.1f} img/s ({t_ref*1e3:.2f} ms/batch)")
            vs = ours / base
        except Exception as e:  # pragma: no cover
            log(f"baseline emulation failed: {e}")

    print(
        json.dumps(
            {
                "metric": "resnet50_b224_bf16_inference",
                "value": round(ours, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
