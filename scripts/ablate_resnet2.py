"""Round-3: ResNet-50 derived whole-model ceiling (VERDICT r2 #1).

Times each stage in ISOLATION (stage input resident on device; output
reduced to a scalar) — prefix differencing can hide pipeline overlap —
and composes a per-stage roofline from two measured anchors:
  - 174 TFLOP/s: the chip's measured XLA bf16 matmul ceiling
    (50432x768x3072, scripts/ablate_vit2.py round 2),
  - 627 GB/s: STREAM-scale measured HBM bandwidth (scripts/hbm_bw.py).
Per-stage bound = max(FLOP time, minimal-traffic time); model ceiling =
sum of stage bounds. The minimal-traffic model counts each activation
map exactly one HBM write + one read per consumer (convs can't keep
56-resolution b128 maps in 16MB VMEM), with conv+BN+act and
residual-add fused (XLA does both, docs/design.md).

Run: python scripts/ablate_resnet2.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

B = 128
_sum = jax.jit(lambda t: jnp.sum(t[:1, :1].astype(jnp.float32)) if t.ndim >= 2 else jnp.sum(t.astype(jnp.float32)))
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
from eqxvision_tpu import nn

model, state = create_model("resnet50")
model = cast_inexact(tree_inference(model, True), jnp.bfloat16)

MB = 1024 * 1024
MATMUL_TFS = 174e12
HBM_BS = 627e9

def mb(h, c):  # bf16 activation map bytes at b128
    return B * h * h * c * 2

def bottleneck_traffic(h_in, c_in, c_mid, c_out, stride, downsample):
    """bytes: each map one write + one read per consumer; conv+BN+act
    and residual-add fused."""
    h = h_in // stride
    t = mb(h_in, c_in)            # read in (conv1)
    t += mb(h_in, c_mid) * 2      # conv1 out w + r  (conv2 consumes at h_in, stride in conv2)
    t += mb(h, c_mid) * 2         # conv2 out w + r
    t += mb(h, c_out)             # conv3(+res) out w
    if downsample:
        t += mb(h_in, c_in)       # ds conv reads in
        t += mb(h, c_out) * 2     # ds out w + r (residual add)
    else:
        t += mb(h_in, c_in)       # identity read (residual add)
    return t

def stage_spec(name):
    # (h_in, c_in, c_mid, c_out, stride, blocks)
    return {
        "layer1": (56, 64, 64, 256, 1, 3),
        "layer2": (56, 256, 128, 512, 2, 4),
        "layer3": (28, 512, 256, 1024, 2, 6),
        "layer4": (14, 1024, 512, 2048, 2, 3),
    }[name]

def stage_bounds(name):
    h_in, c_in, c_mid, c_out, stride, blocks = stage_spec(name)
    traffic = flops = 0.0
    hi, ci = h_in, c_in
    for b in range(blocks):
        s = stride if b == 0 else 1
        ds = b == 0
        traffic += bottleneck_traffic(hi, ci, c_mid, c_out, s, ds)
        h = hi // s
        flops += 2 * B * (hi * hi * ci * c_mid          # conv1 1x1 (stride in conv2)
                          + h * h * c_mid * c_mid * 9    # conv2 3x3
                          + h * h * c_mid * c_out)       # conv3 1x1
        if ds:
            flops += 2 * B * h * h * ci * c_out
        hi, ci = h, c_out
    return flops, traffic

log = lambda *a: print(*a, flush=True)
log(f"device: {jax.devices()[0]}")

# ---- isolated stage timings
stem_in = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)
@jax.jit
def stem(xb):
    y = model.maxpool(nn.relu(model.bn1(model.conv1(xb), state)[0]))
    return xb + (jnp.sum(y[:1, :1]) * 0).astype(xb.dtype)
t_stem = timeit_ch(stem, stem_in, iters=20)
# stem bound: read img + write conv1 out + (pool) read + write
stem_traffic = mb(224, 3) * 0.75 + mb(112, 64) * 2 + mb(56, 64)  # 224x224x3 has 3 ch: exact below
stem_traffic = B * 224 * 224 * 3 * 2 + mb(112, 64) * 2 + mb(56, 64)
stem_flops = 2 * B * 112 * 112 * 3 * 64 * 49
log(f"stem: {t_stem*1e3:.3f} ms | mem bound {stem_traffic/HBM_BS*1e3:.3f} ms | flop bound {stem_flops/MATMUL_TFS*1e3:.3f} ms")

total_meas, total_bound = t_stem, max(stem_traffic / HBM_BS, stem_flops / MATMUL_TFS)
shapes = {"layer1": (56, 64), "layer2": (56, 256), "layer3": (28, 512), "layer4": (14, 1024)}
for nm in ("layer1", "layer2", "layer3", "layer4"):
    h, c = shapes[nm]
    xin = jnp.zeros((B, h, h, c), jnp.bfloat16)
    layer = getattr(model, nm)
    @jax.jit
    def run_stage(xb, layer=layer):
        y, _ = layer(xb, state)
        return xb + (jnp.sum(y[:1, :1]) * 0).astype(xb.dtype)
    t = timeit_ch(run_stage, xin, iters=20)
    fl, tr = stage_bounds(nm)
    fb, mbound = fl / MATMUL_TFS, tr / HBM_BS
    bound = max(fb, mbound)
    log(f"{nm}: {t*1e3:.3f} ms | flop {fb*1e3:.3f} ms ({fl/1e9/B:.2f} GF/img) | mem {mbound*1e3:.3f} ms ({tr/MB:.0f} MB) | bound {bound*1e3:.3f} ms | {t/bound:.2f}x")
    total_meas += t
    total_bound += bound

# head: avgpool + fc
xin4 = jnp.zeros((B, 7, 7, 2048), jnp.bfloat16)
@jax.jit
def head(xb):
    y = model.fc(jnp.mean(xb, axis=(1, 2)))
    return xb + (jnp.sum(y[:1, :1]) * 0).astype(xb.dtype)
t_head = timeit_ch(head, xin4, iters=20)
log(f"head: {t_head*1e3:.3f} ms")
total_meas += t_head
total_bound += mb(7, 2048) / HBM_BS

img = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)
@jax.jit
def full(xb):
    logits, _ = model(xb, state)
    return xb + (jnp.sum(logits[:1, :2]) * 0).astype(xb.dtype)
t_full = timeit_ch(full, img, iters=20)
log(f"full model: {t_full*1e3:.3f} ms ({B/t_full:.0f} img/s)")
log(f"sum of isolated stages: {total_meas*1e3:.3f} ms")
log(f"derived ceiling (sum of per-stage max(flop,mem) bounds): {total_bound*1e3:.3f} ms "
    f"= {B/total_bound:.0f} img/s; model at {total_bound/t_full*100:.0f}% of ceiling")
