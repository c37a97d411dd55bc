"""Round-4 follow-up A/B (after ablate_swin10.py fixed the policy):

1. confirm the shipped policy at model level: swin_t (prefold+global in
   both kernels) and swin_v2_t (per-head max in the whole-block kernel,
   quarter-power in the packed kernel);
2. VERDICT r3 #3's untried variant: swin_v2_t with the whole-block
   kernel DISABLED (EQXVISION_TPU_SWIN_FUSED_BLOCK_V2=0) so stage1/2
   fall back to the packed attention kernel + XLA MLP (which uses the
   quarter-power softmax at aligned L).

Run: python scripts/ablate_swin11.py
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

_sum = jax.jit(lambda t: jnp.sum(t[..., :1].astype(jnp.float32)))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(fn, x, iters=15, reps=3):
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


def bench_model(name, batch, size, tag, env):
    model, state = create_model(name)
    model = tree_inference(model, True)
    model = cast_inexact(model, jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(batch, size, size, 3) * 0.5, jnp.bfloat16)
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        @jax.jit
        def fwd(xb, _m=model, _s=state):
            out, _ = _m(xb, _s)
            return xb + (jnp.sum(out[:1]) * 0).astype(xb.dtype)

        t = timeit_ch(fwd, x)
        print(f"{name} b{batch} {tag:24s}: {t*1e3:7.3f} ms  {batch/t:7.1f} img/s", flush=True)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    _sync(jnp.ones((8, 8)))
    print(f"backend: {jax.default_backend()}", flush=True)
    bench_model("swin_t", 128, 224, "safe(shipped)", {})
    bench_model("swin_v2_t", 128, 256, "safe(shipped)", {})
    bench_model("swin_v2_t", 128, 256, "safe+no-whole-block", {"EQXVISION_TPU_SWIN_FUSED_BLOCK_V2": "0"})
    # repeat shipped v2 for in-process noise floor
    bench_model("swin_v2_t", 128, 256, "safe(shipped) rep2", {})


if __name__ == "__main__":
    main()
