"""Round-3 sweep: swin_v2_t stage1 dispatch-bound fix (VERDICT r2 #2).

The whole-block v2 kernel was VMEM-capped at gw=16 windows/program ->
512 programs/block at ~5us dispatch each (scripts/ablate_swin6.py).
Candidates: compact mode (bf16 softmax/residual temps, halves per-window
VMEM) x forced group sizes (gw, gb). Env knobs are read at trace time,
so one process re-jits per config (no TPU process churn).

Run: python scripts/ablate_swin7.py
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

CONFIGS = [
    ("r2-baseline", {}),
    ("compact", {"EQXVISION_TPU_SWIN_BLOCK_COMPACT": "1"}),
    ("compact gw16 gb2", {"EQXVISION_TPU_SWIN_BLOCK_COMPACT": "1", "EQXVISION_TPU_SWIN_GW": "16", "EQXVISION_TPU_SWIN_GB": "2"}),
    ("compact gw32 gb1", {"EQXVISION_TPU_SWIN_BLOCK_COMPACT": "1", "EQXVISION_TPU_SWIN_GW": "32", "EQXVISION_TPU_SWIN_GB": "1"}),
    ("compact gw32 gb2", {"EQXVISION_TPU_SWIN_BLOCK_COMPACT": "1", "EQXVISION_TPU_SWIN_GW": "32", "EQXVISION_TPU_SWIN_GB": "2"}),
    ("nocompact gw16 gb2", {"EQXVISION_TPU_SWIN_GW": "16", "EQXVISION_TPU_SWIN_GB": "2"}),
]

KNOBS = ("EQXVISION_TPU_SWIN_BLOCK_COMPACT", "EQXVISION_TPU_SWIN_GW", "EQXVISION_TPU_SWIN_GB")

for label, env in CONFIGS:
    for k in KNOBS:
        os.environ.pop(k, None)
    os.environ.update(env)

    def stage1(xb):
        xx = xb
        for l in feats.layers[:2]:
            xx = l(xx)
            if isinstance(xx, tuple):
                xx = xx[0]
        return xb + (jnp.sum(xx[:1, :1]) * 0).astype(xb.dtype)

    def full(xb):
        out, _ = model(xb, state)
        return xb + (jnp.sum(out[:1, :2]) * 0).astype(xb.dtype)

    forced = "EQXVISION_TPU_SWIN_GW" in env
    try:
        t1 = timeit_ch(jax.jit(stage1), img, iters=10)
        line = f"{label:24s} stem+stage1 {t1*1e3:6.2f} ms"
        if not forced:  # forced groups would mis-size stage2's kernel
            tf = timeit_ch(jax.jit(full), img, iters=10)
            line += f"   full {tf*1e3:6.2f} ms  ({B/tf:.0f} img/s)"
        print(line, flush=True)
    except Exception as ex:  # scoped-vmem OOM etc.
        print(f"{label:24s} FAILED: {str(ex)[:160]}", flush=True)
