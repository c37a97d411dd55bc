"""w8a8 e2e A/B on ViT-B/16 b256 and the isolated MLP stack.

NOTE (r5): the micro (scripts/ablate_int8_act.py) already refuted the
premise — XLA's int8 dot runs at bf16 rate on v5e (1.764 vs 1.670 ms
on the fc1 GEMM), not the 2x MXU int8 peak, so this e2e can only lose
a few percent. Kept for reproduction if a future XLA/libtpu picks up
the int8 MXU path; expected-win accounting below still applies then
(fc1+fc2 = 2/3 of ViT matmul FLOPs; attention qkv/proj ride the packed
Pallas kernel and stay bf16 via the dequantizing .weight property).
Parity is checked before timing.

Run: python scripts/ablate_int8_vit.py   (TPU; ~4 min)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = 256
_sum = jax.jit(lambda t: jnp.sum(t[..., :1].astype(jnp.float32)))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(fn, x, iters=15, reps=3):
    _sync(fn(x))

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
    _sync(jnp.ones((8, 8)))
    print(f"backend: {jax.default_backend()}", flush=True)

    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.quantize import quantize_dynamic_int8

    model, state = create_model("vit_base")
    model = tree_inference(model, True)
    model_bf = cast_inexact(model, jnp.bfloat16)
    q = quantize_dynamic_int8(model_bf)  # int8 from the bf16 serving weights
    img = jnp.asarray(np.random.RandomState(0).randn(B, 224, 224, 3) * 0.5, jnp.bfloat16)

    # parity before timing (models as traced args: tunnel 413 limit)
    pfwd = jax.jit(lambda m, xb: m(xb, state)[0])
    ref = np.asarray(pfwd(model_bf, img[:8]), np.float32)
    got = np.asarray(pfwd(q, img[:8]), np.float32)
    d = float(np.max(np.abs(got - ref)))
    print(f"w8a8 parity: max |dlogit| = {d:.3e} "
          f"(logit std {np.std(ref):.3f}, b8 bf16)", flush=True)

    def build(m):
        @jax.jit
        def fwd_m(_m, xb):
            out, _ = _m(xb, state)
            return xb + (jnp.sum(out[:1]) * 0).astype(xb.dtype)

        return lambda xb: fwd_m(m, xb)

    f_bf, f_q = build(model_bf), build(q)
    for rep in range(3):
        a = timeit_ch(f_bf, img) * 1e3
        b = timeit_ch(f_q, img) * 1e3
        print(f"vit rep{rep}: bf16 {a:7.3f} ms | w8a8 {b:7.3f} ms | "
              f"delta {a - b:+6.3f} ms ({(a - b) / a * 100:+.2f}%)", flush=True)

    # isolated MLP half: fc1 -> gelu -> fc2 over the b256 token stream,
    # 12 layers worth of shapes in one (50432, 768) slab
    from eqxvision_tpu import nn

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    fc1 = cast_inexact(nn.Linear(768, 3072, key=k1), jnp.bfloat16)
    fc2 = cast_inexact(nn.Linear(3072, 768, key=k2), jnp.bfloat16)
    q1, q2 = quantize_dynamic_int8(fc1), quantize_dynamic_int8(fc2)
    toks = jnp.asarray(np.random.RandomState(1).randn(50432, 768) * 0.5, jnp.bfloat16)

    def mlp(a, b):
        @jax.jit
        def f(_a, _b, t):
            h = jax.nn.gelu(_a.preactivation(t), approximate=False)
            o = _b(h.astype(t.dtype))
            return t + o * jnp.bfloat16(1e-3)

        return lambda t: f(a, b, t)

    m_bf, m_q = mlp(fc1, fc2), mlp(q1, q2)
    for rep in range(3):
        a = timeit_ch(m_bf, toks, iters=25) * 1e3
        b = timeit_ch(m_q, toks, iters=25) * 1e3
        print(f"mlp rep{rep}: bf16 {a:7.3f} ms | w8a8 {b:7.3f} ms | "
              f"delta {a - b:+6.3f} ms ({(a - b) / a * 100:+.2f}%)", flush=True)


if __name__ == "__main__":
    main()
