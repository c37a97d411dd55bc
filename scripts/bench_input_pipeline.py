"""Device-side input-pipeline measurement at b256 (VERDICT r2 #6,
SURVEY §7 hard part 5).

Measures, on the real chip, for vit_b16 b256 and resnet50 b128:
  A. compute-only: resident bf16 batches -> model           (bench.py's number)
  B. synchronous:  per step, host uint8 -> device_put ->
                   imagenet_eval_pipeline -> model          (no overlap)
  C. overlapped:   the same with data.device_prefetch(2)    (transfer rides DMA
                   behind compute; preprocessing stays fused on device)
plus the raw host->device uint8 transfer rate, and a stated host-decode
bound for this 1-core host.

Run: python scripts/bench_input_pipeline.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.core.filters import cast_inexact
from eqxvision_tpu.models import create_model
from eqxvision_tpu.ops.preprocessing import imagenet_eval_pipeline
from eqxvision_tpu.data import device_prefetch

_sum = jax.jit(lambda t: jnp.sum(t[:1, :2].astype(jnp.float32)))
def _sync(t): return float(np.asarray(_sum(t)))
log = lambda *a: print(*a, flush=True)
log(f"device: {jax.devices()[0]}")

STEPS = 16

for name, B, size in (("vit_base", 256, 224), ("resnet50", 128, 224)):
    model, state = create_model(name) if name != "vit_base" else create_model(name, num_classes=1000)
    model = cast_inexact(tree_inference(model, True), jnp.bfloat16)

    @jax.jit
    def step_pre(u8):
        x = imagenet_eval_pipeline(u8, resize_size=256, crop_size=size, dtype=jnp.bfloat16)
        out, _ = model(x, state)
        return out

    @jax.jit
    def step_plain(x):
        out, _ = model(x, state)
        return out

    # A. compute-only (resident bf16)
    x_res = jnp.zeros((B, size, size, 3), jnp.bfloat16)
    _sync(step_plain(x_res))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        o = step_plain(x_res)
    _sync(o)
    tA = (time.perf_counter() - t0) / STEPS

    # host uint8 batches (256-canvas, what the threaded loader yields)
    host_batches = [np.random.randint(0, 255, (B, 256, 256, 3), np.uint8) for _ in range(4)]

    # raw transfer rate
    xb = jax.device_put(host_batches[0]); _sync(xb[:, :, :, :1].astype(jnp.float32).sum(axis=(1, 2))[None])
    t0 = time.perf_counter()
    for i in range(STEPS):
        xb = jax.device_put(host_batches[i % 4])
    _sync(xb[:, :, :, :1].astype(jnp.float32).sum(axis=(1, 2))[None])
    tX = (time.perf_counter() - t0) / STEPS
    mbytes = host_batches[0].nbytes / 1e6

    # B. synchronous host->device + on-device preprocess + model
    _sync(step_pre(jax.device_put(host_batches[0])))
    t0 = time.perf_counter()
    for i in range(STEPS):
        o = step_pre(jax.device_put(host_batches[i % 4]))
    _sync(o)
    tB = (time.perf_counter() - t0) / STEPS

    # C. overlapped via device_prefetch
    def gen(n):
        for i in range(n):
            yield (host_batches[i % 4],)
    it = device_prefetch(gen(STEPS + 2), 2)
    (first,) = next(it)
    _sync(step_pre(first))
    t0 = time.perf_counter()
    for (u8,) in it:
        o = step_pre(u8)
    _sync(o)
    tC = (time.perf_counter() - t0) / (STEPS + 1)

    log(f"{name} b{B}:")
    log(f"  A compute-only            : {tA*1e3:7.2f} ms/batch  ({B/tA:7.0f} img/s)")
    log(f"  raw uint8 H->D transfer   : {tX*1e3:7.2f} ms/batch  ({mbytes/tX/1e3:.1f} GB/s, {mbytes:.0f} MB)")
    log(f"  B sync transfer+prep+model: {tB*1e3:7.2f} ms/batch  ({B/tB:7.0f} img/s)")
    log(f"  C prefetch-overlapped     : {tC*1e3:7.2f} ms/batch  ({B/tC:7.0f} img/s)")
    log(f"  device-side pipeline overhead: sync +{(tB-tA)*1e3:.2f} ms, overlapped +{(tC-tA)*1e3:.2f} ms")
