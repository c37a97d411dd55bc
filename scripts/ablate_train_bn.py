"""Training-mode BN forward cost (VERDICT r2 #4).

Inference BN folds into conv weights (ops/fold_bn.py) -> each conv
output is written once, fused with affine+relu. Train-mode BN must
materialize the conv output y, reduce it for batch stats, then read it
again to normalize: at minimum +1 write +2 reads of every conv output
tensor vs inference. This script:

  1. measures resnet50 b64 forward in inference vs train mode (the
     CLAUDE.md 4.74 vs 8.13 ms gap),
  2. computes the extra-traffic floor from the exact conv-output bytes
     at the measured 627 GB/s HBM bandwidth,
  3. A/Bs a two-pass XLA restructure (single fused stats+normalize
     consumer) against the default BatchNorm lowering on one stage-sized
     tensor to see whether XLA leaves fusions on the table.

If (1) ~= inference + (2), train-mode BN is at its memory floor and a
fused conv+batch-stat Pallas kernel cannot win without changing the
statistics (documented negative result). Otherwise the gap is the
kernel opportunity.

Run: python scripts/ablate_train_bn.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

B = 64
HBM_BS = 627e9
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

log = lambda *a: print(*a, flush=True)
log(f"device: {jax.devices()[0]}")

model_t, state = create_model("resnet50")
model_t = cast_inexact(model_t, jnp.bfloat16)           # train mode
model_i = tree_inference(model_t, True)                  # inference mode
img = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)

@jax.jit
def fwd_inf(xb):
    out, _ = model_i(xb, state)
    return xb + (jnp.sum(out[:1, :2]) * 0).astype(xb.dtype)

@jax.jit
def fwd_train(xb):
    out, _ = model_t(xb, state)
    return xb + (jnp.sum(out[:1, :2]) * 0).astype(xb.dtype)

t_inf = timeit_ch(fwd_inf, img, iters=20)
t_trn = timeit_ch(fwd_train, img, iters=20)
log(f"inference fwd: {t_inf*1e3:.2f} ms   train-mode fwd: {t_trn*1e3:.2f} ms   gap {(t_trn-t_inf)*1e3:.2f} ms")

# exact conv-output bytes (bf16) for resnet50 at b64
def conv_out_bytes():
    total = 0
    def add(h, c):  # one conv output map
        nonlocal total
        total += B * h * h * c * 2
    add(112, 64)  # stem
    specs = [(56, 64, 256, 3, True), (28, 128, 512, 4, True), (14, 256, 1024, 6, True), (7, 512, 2048, 3, True)]
    for h, cmid, cout, blocks, ds in specs:
        for b in range(blocks):
            hin = h * 2 if b == 0 and h != 56 else h
            add(hin if b == 0 and h != 56 else h, cmid)  # conv1 out (pre-stride for b0)
            add(h, cmid)  # conv2 out
            add(h, cout)  # conv3 out
            if b == 0:
                add(h, cout)  # downsample out
    return total

extra = 3 * conv_out_bytes()  # +1 write +2 reads per conv output
log(f"conv-output bytes/fwd: {conv_out_bytes()/1e9:.2f} GB; extra-traffic floor "
    f"(+1W+2R at 627 GB/s): {extra/HBM_BS*1e3:.2f} ms")
log(f"measured gap / floor = {(t_trn-t_inf)/(extra/HBM_BS):.2f}x")

# micro A/B: default BN lowering vs hand-fused two-pass on a layer1-sized tensor
x = jnp.zeros((B, 56, 56, 256), jnp.bfloat16)
gamma = jnp.ones((256,), jnp.float32); beta = jnp.zeros((256,), jnp.float32)

@jax.jit
def bn_default(t):
    tf = t.astype(jnp.float32)
    mu = jnp.mean(tf, axis=(0, 1, 2))
    var = jnp.mean((tf - mu) ** 2, axis=(0, 1, 2))
    y = (tf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    return t + (jnp.sum(y[:1, :1, :1]) * 0).astype(t.dtype)

@jax.jit
def bn_sumsq(t):
    tf = t.astype(jnp.float32)
    s1 = jnp.sum(tf, axis=(0, 1, 2))
    s2 = jnp.sum(tf * tf, axis=(0, 1, 2))
    n = t.shape[0] * t.shape[1] * t.shape[2]
    mu = s1 / n
    var = s2 / n - mu * mu
    y = tf * (jax.lax.rsqrt(var + 1e-5) * gamma) + (beta - mu * jax.lax.rsqrt(var + 1e-5) * gamma)
    return t + (jnp.sum(y[:1, :1, :1]) * 0).astype(t.dtype)

map_bytes = x.nbytes
for label, fn in (("two-pass mean/var (default-style)", bn_default), ("one-pass sum/sumsq stats", bn_sumsq)):
    t = timeit_ch(fn, x, iters=30)
    log(f"{label}: {t*1e3:.3f} ms  ({map_bytes*3/t/1e9:.0f} GB/s effective at 1W+2R... map {map_bytes/1e6:.0f} MB)")
