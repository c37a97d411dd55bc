"""ResNet-50 stem A/B (round 3): the stem is the only piece above its
roofline bound (1.157 ms measured vs 0.80 memory / 0.17 flop bound,
scripts/ablate_resnet2.py). Variants, isolated, b128 bf16:

  current   conv7x7/2 (+folded BN+relu) + maxpool3x3/2
  s2d       space-to-depth rewrite of the conv (ops/space_to_depth.py)
  f32acc    conv with f32 accum output (current default) vs bf16 out

Run: python scripts/ablate_stem.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

B = 128
_sum = jax.jit(lambda t: jnp.sum(t[:1, :1].astype(jnp.float32)))
def _sync(t): return float(np.asarray(_sum(t)))
def timeit_ch(fn, x, iters=20, reps=3):
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
from eqxvision_tpu.ops.space_to_depth import conv2d_stride2_s2d
from eqxvision_tpu import nn

model, state = create_model("resnet50")
model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
img = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)
wconv = model.conv1.weight  # (7,7,3,64) HWIO bf16

@jax.jit
def stem_current(xb):
    y = model.maxpool(nn.relu(model.bn1(model.conv1(xb), state)[0]))
    return xb + (jnp.sum(y[:1, :1]) * 0).astype(xb.dtype)

@jax.jit
def stem_s2d(xb):
    y = conv2d_stride2_s2d(xb, wconv, None, ((3, 3), (3, 3)))
    y, _ = model.bn1(y.astype(xb.dtype), state)
    y = model.maxpool(nn.relu(y))
    return xb + (jnp.sum(y[:1, :1]) * 0).astype(xb.dtype)

@jax.jit
def stem_conv_only(xb):
    y = model.conv1(xb)
    return xb + (jnp.sum(y[:1, :1]) * 0).astype(xb.dtype)

@jax.jit
def stem_pool_only(xb):
    # feed a resident 112^2 map: isolates the maxpool cost
    y = model.maxpool(xb)
    return xb + (jnp.sum(y[:1, :1]) * 0).astype(xb.dtype)

for label, fn, x in (
    ("current conv+bn+relu+pool", stem_current, img),
    ("s2d conv+bn+relu+pool", stem_s2d, img),
    ("conv only", stem_conv_only, img),
    ("pool only (112^2x64 in)", stem_pool_only, jnp.zeros((B, 112, 112, 64), jnp.bfloat16)),
):
    try:
        t = timeit_ch(fn, x, iters=20)
        print(f"{label:28s}: {t*1e3:7.3f} ms", flush=True)
    except Exception as e:
        print(f"{label:28s}: FAIL {str(e)[:100]}", flush=True)
