"""Training-step throughput on the attached chip.

The reference has no trainer (SURVEY.md §3.3 — its canonical step lives
in a test); ours is parallel/train.py:make_train_step. This measures
full fwd+bwd+adam step throughput (f32 params, the reference's training
precision) and merges the numbers into BENCH_DETAILS.json under
"train_*" keys.

  python scripts/bench_train.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_sum = jax.jit(lambda t: jnp.sum(t, dtype=jnp.float32))


def _sync(t):
    return float(np.asarray(_sum(t)))


CONFIGS = [
    # name, factory, batch, size, iters, compute_dtype, remat
    ("train_resnet50_b64", "resnet50", 64, 224, 10, None, False),
    ("train_vit_b16_b64", "vit_base", 64, 224, 10, None, False),
    ("train_resnet50_b64_bf16", "resnet50", 64, 224, 10, "bfloat16", False),
    ("train_vit_b16_b64_bf16", "vit_base", 64, 224, 10, "bfloat16", False),
    ("train_swin_t_b64_bf16", "swin_t", 64, 224, 10, "bfloat16", False),
    # batch scaling: larger per-chip batches amortize the fixed adam /
    # cast / BN-stat cost (r4)
    ("train_resnet50_b128_bf16", "resnet50", 128, 224, 10, "bfloat16", False),
    ("train_resnet50_b256_bf16", "resnet50", 256, 224, 10, "bfloat16", False),
    # per-block remat: activation recompute buys the 4x batch at bf16
    # (whole-model jax.checkpoint OOMs at b256 — it replays the full
    # forward at the same peak; remat_blocks checkpoints per block)
    ("train_vit_b16_b256_bf16_remat", "vit_base", 256, 224, 10, "bfloat16", "blocks"),
]


def main():
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.parallel.train import make_train_step

    results = {}
    for name, factory, batch, size, iters, cdt, remat in CONFIGS:
        try:
            kwargs = {"remat_blocks": True} if remat == "blocks" else {}
            model, state = create_model(factory, num_classes=1000, **kwargs)
            opt = optax.adam(1e-4)
            # model pytree leaves == trainable params (repo convention)
            opt_state = opt.init(jax.tree_util.tree_map(lambda p: p, model))
            step = make_train_step(
                opt, donate=False,
                compute_dtype=None if cdt is None else jnp.bfloat16,
                remat=remat is True,
            )
            x = jnp.zeros((batch, size, size, 3), jnp.float32)
            y = jnp.zeros((batch,), jnp.int32)
            key = jax.random.PRNGKey(0)

            m, s, o = model, state, opt_state
            m, s, o, loss = step(m, s, o, x, y, key)
            _sync(loss)

            def run(n):
                mm, ss, oo = m, s, o
                t0 = time.perf_counter()
                ls = None
                for _ in range(n):
                    mm, ss, oo, ls = step(mm, ss, oo, x, y, key)
                _sync(ls)
                return time.perf_counter() - t0

            run(1)
            t1 = min(run(1) for _ in range(3))
            tn = min(run(iters + 1) for _ in range(2))
            t = (tn - t1) / iters
            results[name] = {
                "images_per_sec_per_chip": round(batch / t, 1),
                "ms_per_step": round(t * 1e3, 2),
                "batch": batch,
                "size": size,
                "precision": cdt or "f32",
                "remat": remat,
            }
            log(f"{name}: {batch / t:.1f} img/s ({t*1e3:.2f} ms/step)")
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            log(f"{name}: FAILED {e}")

    out_path = os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAILS.json")
    merged = {"device": str(jax.devices()[0]), "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.setdefault("results", {}).update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
