"""On-hardware kernel-vs-XLA parity check (real TPU, random inputs).

Interpret-mode tests pin kernel numerics on CPU; this runs the real
Mosaic-compiled kernels against the XLA paths on-chip. Measured
2026-08-17 (b8, random N(0,1) inputs, bf16): swin_v2_t max-delta
0.012 / argmax 8/8; swin_t 0.008 / 8/8; vit_base 0.020 / 7/8 —
all at bf16 accumulation-order scale (random-init logits are
near-uniform, so ~0.01 deltas can flip an argmax).

Run: python scripts/hw_kernel_parity.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.core.filters import cast_inexact
from eqxvision_tpu.models import create_model

rng = np.random.default_rng(0)

for name, size in (("swin_v2_t", 256), ("swin_t", 224), ("vit_base", 224)):
    model, state = create_model(name)
    model = cast_inexact(tree_inference(model, True), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((8, size, size, 3)), jnp.bfloat16)

    @jax.jit
    def f_kernel(xb):
        out, _ = model(xb, state)
        return out

    with_k = np.asarray(f_kernel(x).astype(jnp.float32))

    os.environ["EQXVISION_TPU_NO_PALLAS"] = "1"
    @jax.jit
    def f_xla(xb):
        out, _ = model(xb, state)
        return out
    no_k = np.asarray(f_xla(x).astype(jnp.float32))
    os.environ.pop("EQXVISION_TPU_NO_PALLAS", None)

    err = np.abs(with_k - no_k).max()
    agree = (with_k.argmax(-1) == no_k.argmax(-1)).mean()
    print(f"{name}: max|kernel-xla| = {err:.5f}, argmax agreement = {agree:.3f}", flush=True)
