"""ViT-B/16 b256 MARGINAL decomposition (VERDICT r3 #7, second pass).

ablate_vit7.py's standalone-piece isolation over-counts badly (sum =
167% of e2e): every sub-ms piece pays ~0.3 ms of chain glue (a full
extra pass over the (256,197,768) carrier) and loses the fusion
context XLA gives it in the real graph. This measures each term as a
GRAPH DIFFERENCE instead: time the full forward vs the forward with
one piece replaced by (nearly) free identity during trace —
the marginal cost includes exactly the fusion/overlap the piece has in
situ, which is the number that says whether attacking it can pay.

Stubs (trace-time monkeypatches):
  no_attn  fused_qkv_attention -> qkv[:, :, :D] slice
  no_ln    ops.layernorm.layer_norm -> identity (25 LNs)
  no_gelu  activation -> identity on the f32 preactivation

Run: python scripts/ablate_vit8.py
"""
import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = 256

_sum = jax.jit(lambda t: jnp.sum(t[..., :1].astype(jnp.float32)))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(fn, x, iters=15, reps=3):
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
    _sync(jnp.ones((8, 8)))
    print(f"backend: {jax.default_backend()}", flush=True)

    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model
    import eqxvision_tpu.models.classification.vit as V
    import eqxvision_tpu.ops.layernorm as LN
    import eqxvision_tpu.nn as N

    model, state = create_model("vit_base")
    model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
    img = jnp.asarray(np.random.RandomState(0).randn(B, 224, 224, 3) * 0.5, jnp.bfloat16)

    def build(patches):
        ctxs = []
        m = model
        if "attn" in patches:
            ctxs.append(mock.patch.object(
                V, "fused_qkv_attention",
                lambda qkv, h, s: qkv[:, :, : qkv.shape[-1] // 3],
            ))
            # keep grads/jit happy: patch during trace only
        if "ln" in patches:
            ctxs.append(mock.patch.object(LN, "layer_norm", lambda x, w, b, eps: x))
        if "gelu" in patches:
            # Lambda captures the fn at construction -> swap via tree_at
            from eqxvision_tpu.core import tree_at
            from eqxvision_tpu.nn.activations import Lambda

            m = tree_at(
                lambda mm: [b.mlp.act for b in mm.blocks], m,
                [Lambda(lambda x: x)] * len(m.blocks),
            )

        from contextlib import ExitStack

        @jax.jit
        def fwd(xb, _m=m):
            with ExitStack() as st:
                for c in ctxs:
                    st.enter_context(c)
                out, _ = _m(xb, state)
            return xb + (jnp.sum(out[:1]) * 0).astype(xb.dtype)

        return fwd

    base = timeit_ch(build(()), img) * 1e3
    print(f"full        : {base:7.3f} ms", flush=True)
    for tag in ("attn", "ln", "gelu"):
        t = timeit_ch(build((tag,)), img) * 1e3
        print(f"no_{tag:9s}: {t:7.3f} ms   marginal {base - t:6.3f} ms", flush=True)
    # analytic matmul floor at the measured 174 TF/s XLA ceiling
    L, D, HID = 197, 768, 3072
    flops = 2 * B * L * (D * 3 * D + D * D + 2 * D * HID) * 12 + 2 * B * D * 1000
    print(f"matmul floor @174TF/s: {flops / 174e12 * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
