"""Benchmark: model inference images/sec on one TPU chip.

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
output, so the device must execute every step).

Env knobs:
  EQXTPU_BENCH_MODEL   resnet50 (default) | vit_b16 | mobilenet_v3_large | ...
  EQXTPU_BENCH_BATCH   batch size (default per-model: 128 / 256)
  EQXTPU_BENCH_ITERS   timed iterations (20)
  EQXTPU_BENCH_SKIP_BASELINE=1
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
    logits, _ = fwd_chain(m, s, x)  # compile
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
    # min-of-repeats differencing: the sync/transfer overhead is ~30ms
    # with multi-ms jitter on the tunneled platform, so single runs of
    # small workloads are noise-dominated.
    t1 = min(run(1) for _ in range(3))
    tn = min(run(iters + 1) for _ in range(2))
    return (tn - t1) / iters


# model name -> (factory path, default batch, image size, fwd GFLOPs/img)
_CONFIGS = {
    "resnet50": ("resnet50", 128, 224, 4.09),
    "resnet18": ("resnet18", 256, 224, 1.81),
    "vit_b16": ("vit_base", 256, 224, 17.6),
    "mobilenet_v3_large": ("mobilenet_v3_large", 256, 224, 0.22),
    "efficientnet_b0": ("efficientnet_b0", 256, 224, 0.39),
    "convnext_tiny": ("convnext_tiny", 128, 224, 4.46),
    "swin_t": ("swin_t", 128, 224, 4.49),
}


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model

    name = os.environ.get("EQXTPU_BENCH_MODEL", "resnet50")
    factory, default_batch, size, gflops = _CONFIGS[name]
    batch = int(os.environ.get("EQXTPU_BENCH_BATCH", str(default_batch)))
    iters = int(os.environ.get("EQXTPU_BENCH_ITERS", "20"))
    log(f"bench: {name} b{batch} on {jax.devices()[0]}")

    model, state = create_model(factory)
    model = tree_inference(model, True)

    # ---- ours: batched NHWC, bf16 params/activations, f32 accumulation
    model_bf16 = cast_inexact(model, jnp.bfloat16)
    x = jnp.zeros((batch, size, size, 3), jnp.bfloat16)

    @jax.jit
    def fwd_chain(m, s, xb):
        logits, _ = m(xb, s)
        xn = xb + (jnp.sum(logits) * 0).astype(xb.dtype)
        return logits, xn

    t = time_chained(fwd_chain, model_bf16, state, x, iters)
    ours = batch / t
    log(f"ours: {ours:.1f} img/s ({t*1e3:.2f} ms/batch, "
        f"{gflops * ours / 1e3:.1f} TFLOP/s)")

    # ---- baseline: reference execution model (per-sample CHW vmap, f32)
    vs = 0.0
    if os.environ.get("EQXTPU_BENCH_SKIP_BASELINE") != "1":
        try:
            x_chw = jnp.zeros((batch, 3, size, size), jnp.float32)

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
                "metric": f"{name}_b{batch}_bf16_inference",
                "value": round(ours, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
