"""Round-2 ConvNeXt-T profile: where do the 20.3 ms/batch go?

Block structure (models/classification/convnext.py): dwconv7x7 -> LN ->
pw Linear C->4C -> gelu -> pw Linear 4C->C -> layer_scale -> residual.
Stages at 56²x96 / 28²x192 / 14²x384 / 7²x768, depths (3,3,9,3).

Run: python scripts/ablate_convnext.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = 128


def log(*a):
    print(*a, flush=True)


_sum = jax.jit(lambda t: jnp.sum(t, dtype=jnp.float32))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(fn, x, iters=10, reps=3):
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


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model

    log(f"device: {jax.devices()[0]}")
    model, state = create_model("convnext_tiny")
    model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
    img = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def full(xb):
        logits, _ = model(xb, state)
        return xb + (jnp.sum(logits) * 0).astype(xb.dtype)

    t = timeit_ch(full, img, iters=10)
    log(f"convnext_tiny b{B}: {t*1e3:.2f} ms ({B/t:.0f} img/s)")

    feats = model.features
    log(f"features layers: {[type(l).__name__ for l in feats.layers]}")

    def call(layer, xx):
        out = layer(xx)
        return out[0] if isinstance(out, tuple) else out

    prev = None
    for i, layer in enumerate(feats.layers):
        @jax.jit
        def upto(xb, i=i):
            xx = xb
            for l in feats.layers[: i + 1]:
                xx = call(l, xx)
            return xb + (jnp.sum(xx) * 0).astype(xb.dtype)

        tt = timeit_ch(upto, img, iters=10)
        d = tt - prev if prev is not None else tt
        log(f"prefix 0..{i} ({type(layer).__name__}): {tt*1e3:.2f} ms (+{d*1e3:.2f})")
        prev = tt

    # per-piece of one stage-1 block
    emb = jax.block_until_ready(jax.jit(lambda xb: call(feats.layers[0], xb))(img))
    stage1 = feats.layers[1]
    blk = stage1.layers[0]
    log(f"stage1 block: {type(blk).__name__}, fields: {[f for f in blk.__dataclass_fields__]}, input {emb.shape}")

    names = list(blk.__dataclass_fields__)
    # find the sub-ops generically
    @jax.jit
    def block_once(xx):
        return xx + 0 * call(blk, xx)

    t = timeit_ch(block_once, emb, iters=10)
    log(f"one stage1 block: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
