"""vs_baseline decomposition (VERDICT r2 weak #5): how much of the
bench.py headline ratio is batched-NHWC design vs bf16-vs-f32 dtype?

Runs resnet50 b128 three ways:
  ours          batched NHWC, bf16
  baseline-f32  per-sample CHW vmap, f32 (the bench.py emulation)
  baseline-bf16 the same emulation with bf16 params/activations

Run: python scripts/ablate_baseline_dtype.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

B = 128
_sum = jax.jit(lambda t: jnp.sum(t[:1, :2].astype(jnp.float32)))
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

model, state = create_model("resnet50")
model = tree_inference(model, True)
model16 = cast_inexact(model, jnp.bfloat16)

x_nhwc = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)
@jax.jit
def ours(xb):
    out, _ = model16(xb, state)
    return xb + (jnp.sum(out[:1, :2]) * 0).astype(xb.dtype)
t_ours = timeit_ch(ours, x_nhwc, iters=20)
print(f"ours (NHWC batched bf16): {t_ours*1e3:.2f} ms  {B/t_ours:.0f} img/s", flush=True)

for label, m, dt in (("baseline-f32", model, jnp.float32), ("baseline-bf16", model16, jnp.bfloat16)):
    x_chw = jnp.zeros((B, 3, 224, 224), dt)
    @jax.jit
    def ref(xb, m=m):
        def single(img):
            out, _ = m(img, state)
            return out
        out = jax.vmap(single)(xb)
        return xb + (jnp.sum(out[:1, :2]) * 0).astype(xb.dtype)
    t = timeit_ch(ref, x_chw, iters=10)
    print(f"{label} (per-sample CHW vmap): {t*1e3:.2f} ms  {B/t:.0f} img/s  (ours {t/t_ours:.2f}x)", flush=True)
