"""ConvNeXt fused MLP-half kernel prototype A/B.

ablate_convnext.py: stage1 blocks cost 2.67 ms each (b128, 56²x96) —
the naive unfused HBM traffic (~1.4 GB/block / 627 GB/s measured
= 2.2 ms), i.e. XLA materializes LN, the 4C intermediate, and the
scale/residual chain. The fused kernel computes
``xres + layer_scale * fc2(gelu(fc1(LN(xdw))))`` per Mb-row block with
one read of (xdw, xres) and one write — token-parallel, so Mb is a free
choice (power-of-two row blocks).

Run: python scripts/ablate_convnext2.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128


def log(*a):
    print(*a, flush=True)


_sum = jax.jit(lambda t: jnp.sum(t[:4, :4].astype(jnp.float32)))


def _sync(t):
    return float(np.asarray(_sum(t)))


def timeit_ch(fn, x, iters=20, reps=3):
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


def _erf_f32(x):
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_f32(x):
    return 0.5 * x * (1.0 + _erf_f32(x * (2.0**-0.5)))


def _cn_mlp_kernel(xdw_ref, xres_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, o_ref, *, eps):
    xf = xdw_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps) * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    h = jnp.dot(ln.astype(o_ref.dtype), w1_ref[...], preferred_element_type=jnp.float32)
    h = _gelu_f32(h + b1_ref[0].astype(jnp.float32)).astype(o_ref.dtype)
    out = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out = (out + b2_ref[0].astype(jnp.float32)) * ls_ref[0].astype(jnp.float32)
    o_ref[...] = (xres_ref[...].astype(jnp.float32) + out).astype(o_ref.dtype)


def cn_mlp_fused(xdw, xres, gamma, beta, w1, b1, w2, b2, ls, eps=1e-6, mb=None):
    n, h, w, c = xdw.shape
    m = n * h * w
    hidden = w1.shape[1]
    if mb is None:
        mb = m & (-m)  # largest power-of-two divisor of m
        while mb * (2 * c + hidden) * 2 + mb * hidden * 4 > 9 * 1024 * 1024 and mb > 8:
            mb //= 2
        while mb * 2 * (2 * c + hidden) * 2 + mb * 2 * hidden * 4 < 9 * 1024 * 1024 and m % (mb * 2) == 0:
            mb *= 2
    assert m % mb == 0, (m, mb)
    x2 = xdw.reshape(m, c)
    r2 = xres.reshape(m, c)
    row = lambda i: (i, 0)
    const2 = lambda s: pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_cn_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m, c), xdw.dtype),
        grid=(m // mb,),
        in_specs=[
            pl.BlockSpec((mb, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, c), row, memory_space=pltpu.VMEM),
            const2((1, c)), const2((1, c)),
            const2((c, hidden)), const2((1, hidden)),
            const2((hidden, c)), const2((1, c)),
            const2((1, c)),
        ],
        out_specs=pl.BlockSpec((mb, c), row, memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * c * hidden,
            bytes_accessed=3 * m * c * xdw.dtype.itemsize,
            transcendentals=m * hidden,
        ),
    )(
        x2, r2,
        gamma.astype(xdw.dtype)[None], beta.astype(xdw.dtype)[None],
        w1.astype(xdw.dtype), b1.astype(jnp.float32)[None],
        w2.astype(xdw.dtype), b2.astype(jnp.float32)[None],
        ls.astype(jnp.float32)[None],
    )
    return out.reshape(n, h, w, c)


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu import nn

    log(f"device: {jax.devices()[0]}")
    model, state = create_model("convnext_tiny")
    model = cast_inexact(tree_inference(model, True), jnp.bfloat16)

    feats = model.features
    stage_inputs = {1: jnp.ones((B, 56, 56, 96), jnp.bfloat16) * 0.1,
                    3: jnp.ones((B, 28, 28, 192), jnp.bfloat16) * 0.1,
                    5: jnp.ones((B, 14, 14, 384), jnp.bfloat16) * 0.1,
                    7: jnp.ones((B, 7, 7, 768), jnp.bfloat16) * 0.1}

    for li, x in stage_inputs.items():
        stage = feats.layers[li]
        blk = stage.layers[0]

        def block_xla(t, blk=blk):
            return blk(t)

        def block_fused(t, blk=blk):
            dw = blk.dwconv(t)
            return cn_mlp_fused(
                dw, t, blk.norm.weight, blk.norm.bias,
                blk.pwconv1.weight, blk.pwconv1.bias,
                blk.pwconv2.weight, blk.pwconv2.bias,
                blk.layer_scale, eps=blk.norm.eps,
            )

        # parity
        a = jax.jit(block_xla)(x)
        b = jax.jit(block_fused)(x)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        tx = timeit_ch(jax.jit(block_xla), x, iters=20)
        tf = timeit_ch(jax.jit(block_fused), x, iters=20)
        c = x.shape[-1]
        log(f"stage C={c}: XLA {tx*1e3:.3f} ms, fused {tf*1e3:.3f} ms "
            f"({tx/tf:.2f}x), maxerr {err:.5f}")


if __name__ == "__main__":
    main()
