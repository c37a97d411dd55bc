"""Training-step decomposition on the attached chip (round 3).

Splits the mixed-precision train step (parallel/train.py:make_train_step)
into measurable pieces so the train-step number gets a derived ceiling
like the inference configs (docs/design.md):

  1. inference fwd        — the anchor (BN frozen stats, no loss)
  2. train-mode fwd       — + batch-stat BN and loss (no grad)
  3. value_and_grad       — + backward (no optimizer)
  4. full step            — + adam update

bwd = (3) - (2); opt = (4) - (3). The composable bounds:
  - bwd FLOPs ~ 2x fwd (dgrad + wgrad each re-run the conv mix), so
    bwd_bound ~ 2 * inference_fwd for a matmul-bound model;
  - adam floor = 7 passes over the f32 param bytes (read p/m/v/g,
    write p/m/v) at the measured 627 GB/s STREAM bandwidth.

  python scripts/ablate_train_step.py [resnet50|vit_base|swin_t] [batch]
"""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


_sum = jax.jit(lambda t: jnp.sum(t, dtype=jnp.float32))


def sync(t):
    return float(np.asarray(_sum(t)))


def timeit(run, iters=10, reps=3):
    """run(n) executes n chained iterations and syncs; min-of-reps
    differencing per CLAUDE.md (axon sync ~30ms jitter)."""
    run(1)
    t1 = min(run(1) for _ in range(reps))
    tn = min(run(iters + 1) for _ in range(reps))
    return (tn - t1) / iters


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.parallel.train import make_train_step, softmax_cross_entropy

    name = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cdt = jnp.bfloat16

    model, state = create_model(name, num_classes=1000)
    params_bytes = sum(
        p.size * 4 for p in jax.tree_util.tree_leaves(model) if hasattr(p, "size")
    )
    x = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    y = jnp.zeros((batch,), jnp.int32)
    key = jax.random.PRNGKey(0)

    # ---- 1. inference fwd (bf16 model, frozen BN)
    im = cast_inexact(tree_inference(model, True), cdt)

    @jax.jit
    def infer(m, s, x):
        out, _ = m(x.astype(cdt), s)
        return out

    def run_infer(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = infer(im, state, x)
        sync(o)
        return time.perf_counter() - t0

    t_inf = timeit(run_infer)
    print(f"{name} b{batch} bf16:")
    print(f"  1. inference fwd      : {t_inf*1e3:7.2f} ms")

    # ---- 2. train-mode fwd only (batch-stat BN + loss, mixed-precision cast)
    from eqxvision_tpu.core.precision import accum_precision

    @jax.jit
    def train_fwd(m, s, x, y, key):
        with accum_precision(None):
            mc = cast_inexact(m, cdt)
            logits, ns = mc(x.astype(cdt), s, key=key)
            if isinstance(logits, tuple):
                logits = logits[0]
            return softmax_cross_entropy(logits.astype(jnp.float32), y), ns

    def run_fwd(n):
        t0 = time.perf_counter()
        l = None
        for _ in range(n):
            l, _ = train_fwd(model, state, x, y, key)
        sync(l)
        return time.perf_counter() - t0

    t_fwd = timeit(run_fwd)
    print(f"  2. train fwd (+BN stats+loss): {t_fwd*1e3:7.2f} ms")

    # ---- 3. value_and_grad (no optimizer)
    @jax.jit
    def grad_step(m, s, x, y, key):
        def compute(m_):
            with accum_precision(None):
                mc = cast_inexact(m_, cdt)
                logits, ns = mc(x.astype(cdt), s, key=key)
                if isinstance(logits, tuple):
                    logits = logits[0]
                return softmax_cross_entropy(logits.astype(jnp.float32), y), ns

        with accum_precision(None):
            (loss, ns), grads = jax.value_and_grad(compute, has_aux=True)(m)
        return loss, grads

    def run_grad(n):
        t0 = time.perf_counter()
        l = None
        for _ in range(n):
            l, _ = grad_step(model, state, x, y, key)
        sync(l)
        return time.perf_counter() - t0

    t_grad = timeit(run_grad)
    print(f"  3. fwd+bwd            : {t_grad*1e3:7.2f} ms   (bwd = {1e3*(t_grad-t_fwd):.2f})")

    # ---- 4. full step (fwd+bwd+adam); carry the triple so steps chain
    opt = optax.adam(1e-4)
    opt_state = opt.init(jax.tree_util.tree_map(lambda p: p, model))
    step = make_train_step(opt, donate=False, compute_dtype=cdt)
    m0, s0, o0 = model, state, opt_state
    m0, s0, o0, _ = step(m0, s0, o0, x, y, key)

    def run_step(n):
        mm, ss, oo = m0, s0, o0
        t0 = time.perf_counter()
        l = None
        for _ in range(n):
            mm, ss, oo, l = step(mm, ss, oo, x, y, key)
        sync(l)
        return time.perf_counter() - t0

    t_step = timeit(run_step)
    print(f"  4. full step (+adam)  : {t_step*1e3:7.2f} ms   (opt = {1e3*(t_step-t_grad):.2f})")

    adam_floor = 7 * params_bytes / 627e9
    print(f"\n  params {params_bytes/1e6:.0f} MB f32; adam traffic floor {adam_floor*1e3:.2f} ms @627 GB/s")
    print(f"  bwd/inference-fwd ratio: {(t_grad-t_fwd)/t_inf:.2f} (bound ~2.0 for matmul-bound)")
    bn_over = t_fwd - t_inf
    print(f"  train-fwd overhead vs inference: {bn_over*1e3:.2f} ms (BN stats + loss + cast)")
    ceiling = t_inf * 3 + bn_over + adam_floor
    print(
        f"  composed ceiling ~ {ceiling*1e3:.2f} ms -> {batch/ceiling:.0f} img/s"
        f"  (measured {batch/t_step:.0f} = {100*ceiling/t_step:.0f}% of ceiling)"
    )


if __name__ == "__main__":
    main()
