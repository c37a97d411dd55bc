"""Per-stage prefix profile of swin_v2_t 256x256 b128 (post r2b kernels).

Run: python scripts/ablate_swin6.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

B = 128
_sum = jax.jit(lambda t: jnp.sum(t[:2, :2].astype(jnp.float32)) if t.ndim >= 2 else jnp.sum(t.astype(jnp.float32)))
def _sync(t): return float(np.asarray(_sum(t)))
def timeit_ch(fn, x, iters=10, reps=3):
    y = fn(x); _sync(y)
    def run(n):
        t0 = time.perf_counter(); xi = x
        for _ in range(n): xi = fn(xi)
        _sync(xi); return time.perf_counter() - t0
    run(1)
    t1 = min(run(1) for _ in range(reps))
    tn = min(run(iters + 1) for _ in range(2))
    return (tn - t1) / iters

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.core.filters import cast_inexact
from eqxvision_tpu.models import create_model

model, state = create_model("swin_v2_t")
model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
img = jnp.zeros((B, 256, 256, 3), jnp.bfloat16)
feats = model.features
prev = None
for i in range(len(feats.layers)):
    @jax.jit
    def upto(xb, i=i):
        xx = xb
        for l in feats.layers[: i + 1]:
            xx = l(xx)
            if isinstance(xx, tuple):
                xx = xx[0]
        return xb + (jnp.sum(xx[:1, :1]) * 0).astype(xb.dtype)
    tt = timeit_ch(upto, img, iters=10)
    d = tt - prev if prev is not None else tt
    print(f"prefix 0..{i}: {tt*1e3:.2f} ms (+{d*1e3:.2f})", flush=True)
    prev = tt
