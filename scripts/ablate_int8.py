"""Weight-only int8 A/B on the latency-bound serving config (round 4).

alexnet b1 device latency is dominated by reading the ~59M classifier
params (docs/design.md bench-timing section: classifier 124 us of the
244 us total in bf16). int8 storage halves that stream again; this
times the quantized model against bf16 with the same in-graph
fori_loop methodology as bench.py, plus the isolated classifier matvec.

  python scripts/ablate_int8.py
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


def time_loop(fwd, m, s, x, label):
    """bench.py's in-graph chain differencing (one dispatch per chain)."""
    out, _ = fwd(m, s, x)
    sync(out)

    def host_run(n):
        t0 = time.perf_counter()
        xi = x
        o = None
        for _ in range(n):
            o, xi = fwd(m, s, xi)
        sync(o)
        return time.perf_counter() - t0

    host_run(1)
    est = max(host_run(30) / 30, 1e-7)
    n_short = max(30, int(0.05 / est) + 1)
    n_long = 3 * n_short

    def make_loop(n):
        @jax.jit
        def loop(mm, ss, x0):
            def body(_, xi):
                return fwd(mm, ss, xi)[1]
            return jax.lax.fori_loop(0, n, body, x0)
        return loop

    loops = {n: make_loop(n) for n in (n_short, n_long)}

    def run(n):
        t0 = time.perf_counter()
        sync(loops[n](m, s, x))
        return time.perf_counter() - t0

    for n in (n_short, n_long):
        run(n)
    shorts = [run(n_short) for _ in range(3)]
    longs = [run(n_long) for _ in range(3)]
    per = (min(longs) - min(shorts)) / (n_long - n_short)
    print(f"{label:46s}: {per*1e6:8.1f} us/iter", flush=True)
    return per


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.quantize import quantize_weights_int8

    model, state = create_model("alexnet")
    model = tree_inference(model, True)
    bf16 = cast_inexact(model, jnp.bfloat16)
    # quantize from the f32 master weights, activations in bf16
    q = quantize_weights_int8(bf16)

    def chain(out, xb):
        return out, xb + (jnp.sum(out) * 0).astype(xb.dtype)

    @jax.jit
    def fwd(m, s, xb):
        out, _ = m(xb, s)
        return chain(out, xb)

    x = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    t_bf = time_loop(fwd, bf16, state, x, "alexnet b1 bf16 (serving default)")
    t_q = time_loop(fwd, q, state, x, "alexnet b1 int8 weights")
    print(f"speedup: {t_bf / t_q:.3f}x", flush=True)

    # isolated classifier matvec
    @jax.jit
    def clf(m, s, xb):
        out, _ = m.classifier(xb, s)
        return chain(out, xb)

    xc = jnp.zeros((1, 9216), jnp.bfloat16)
    tc_bf = time_loop(clf, bf16, state, xc, "classifier matvec bf16")
    tc_q = time_loop(clf, q, state, xc, "classifier matvec int8")
    print(f"classifier speedup: {tc_bf / tc_q:.3f}x", flush=True)

    # numerical sanity on-chip: quantized vs bf16 logits
    kx = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3)).astype(jnp.bfloat16)
    a, _ = jax.jit(lambda m, s, v: m(v, s))(bf16, state, kx)
    b, _ = jax.jit(lambda m, s, v: m(v, s))(q, state, kx)
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    print(f"max|diff|/std: {np.abs(a - b).max() / (a.std() + 1e-8):.4f}", flush=True)


if __name__ == "__main__":
    main()
