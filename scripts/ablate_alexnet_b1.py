"""AlexNet batch-1 latency decomposition (round 4).

The interim r4 sweep (with the >=50ms chain sizing rule but host-side
Python chaining) timed the bf16 NHWC path LOSING to the f32 CHW-vmap
baseline emulation at batch 1: 0.63 vs 0.46 ms. At b1 the model is
dominated by reading the ~59M classifier params, so bf16 (half the
bytes) should win — this isolates where the extra latency comes from:
dtype, layout, or a specific segment (features vs classifier).
Resolution: the loss was per-call dispatch overhead, not the model —
see bench.py time_chained's in-graph fori_loop rule and
docs/design.md's benchmark-timing section.

  python scripts/ablate_alexnet_b1.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


_sum = jax.jit(lambda t: jnp.sum(t, dtype=jnp.float32))


def sync(t):
    return float(np.asarray(_sum(t)))


def time_small(fwd, m, s, x, label):
    """Long/short chain differencing (bench.py sizing rule)."""
    out, _ = fwd(m, s, x)
    sync(out)

    def run(n):
        t0 = time.perf_counter()
        xi = x
        o = None
        for _ in range(n):
            o, xi = fwd(m, s, xi)
        sync(o)
        return time.perf_counter() - t0

    run(1)
    est = max(run(30) / 30, 1e-7)
    n_short = max(30, int(0.05 / est) + 1)
    n_long = 3 * n_short
    shorts = [run(n_short) for _ in range(3)]
    longs = [run(n_long) for _ in range(3)]
    per = (min(longs) - min(shorts)) / (n_long - n_short)
    print(f"{label:42s}: {per*1e6:8.1f} us/iter  (chains {n_short}/{n_long})", flush=True)
    return per


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model

    model, state = create_model("alexnet")
    model = tree_inference(model, True)
    model_bf16 = cast_inexact(model, jnp.bfloat16)

    def chain(out, xb):
        return out, xb + (jnp.sum(out) * 0).astype(xb.dtype)

    # 1. current bench path: bf16 NHWC batched
    @jax.jit
    def f_bf16(m, s, xb):
        out, _ = m(xb, s)
        return chain(out, xb)

    # 2. f32 NHWC batched
    @jax.jit
    def f_f32(m, s, xb):
        out, _ = m(xb, s)
        return chain(out, xb)

    # 3. f32 CHW vmap (the baseline emulation)
    @jax.jit
    def f_ref(m, s, xb):
        out = jax.vmap(lambda img: m(img, s)[0])(xb)
        return chain(out, xb)

    # 4. bf16 CHW vmap
    x_bf = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    x_f32 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    x_chw = jnp.zeros((1, 3, 224, 224), jnp.float32)
    x_chw_bf = jnp.zeros((1, 3, 224, 224), jnp.bfloat16)

    time_small(f_bf16, model_bf16, state, x_bf, "bf16 NHWC batched (bench path)")
    time_small(f_f32, model, state, x_f32, "f32 NHWC batched")
    time_small(f_ref, model, state, x_chw, "f32 CHW vmap (baseline emulation)")
    time_small(f_ref, model_bf16, state, x_chw_bf, "bf16 CHW vmap")

    # 5. segment split: features+pool vs classifier, bf16 and f32
    xf_bf = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    xf_f32 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    xc_bf = jnp.zeros((1, 9216), jnp.bfloat16)
    xc_f32 = jnp.zeros((1, 9216), jnp.float32)

    from eqxvision_tpu import nn as tnn

    @jax.jit
    def feat(m, s, xb):
        out, _ = m.features(xb, s)
        out = tnn.flatten_chw(m.avgpool(out))
        return chain(out, xb)

    @jax.jit
    def clf(m, s, xb):
        out, _ = m.classifier(xb, s)
        return chain(out, xb)

    time_small(feat, model_bf16, state, xf_bf, "bf16 features+pool only")
    time_small(feat, model, state, xf_f32, "f32 features+pool only")
    time_small(clf, model_bf16, state, xc_bf, "bf16 classifier only")
    time_small(clf, model, state, xc_f32, "f32 classifier only")


if __name__ == "__main__":
    main()
