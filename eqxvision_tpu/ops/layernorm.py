"""Pallas LayerNorm (last-axis) kernel.

XLA's lowering of LayerNorm at transformer shapes runs ~180 GB/s
effective on v5e (measured: 1.26 ms for (50432, 768) bf16 — ~5 HBM
passes worth); ViT-B/16 has 25 LayerNorms, making LN the largest
non-matmul cost after the attention kernel landed. This kernel does the
canonical single-pass-per-block form: load a row block once, compute
E[x], E[x^2] in f32, normalize, scale/shift, write once.

Differentiable via a reference-path VJP.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_pallas() -> bool:
    if os.environ.get("EQXVISION_TPU_NO_PALLAS") == "1":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def layer_norm_reference(x, weight, bias, eps: float):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)  # (R, D)
    d = xf.shape[-1]
    mean = jnp.sum(xf, axis=-1, keepdims=True) * (1.0 / d)
    xc = xf - mean
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) * (1.0 / d)
    y = xc * jax.lax.rsqrt(var + eps)
    if w_ref is not None:
        y = y * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _pick_rows(rows: int, d: int, itemsize: int) -> int:
    # Large 8-aligned blocks dividing rows: per-program overhead is
    # ~4-6us on v5e, so small blocks are dispatch-bound (measured: a
    # pallas copy at (256, 768)-blocks runs 128 GB/s vs 1087 GB/s at
    # (1576, 768)). Target ~2.5MB input blocks.
    budget = int(2.5 * 1024 * 1024) // max(d * itemsize, 1)
    r = min(rows, max(budget, 8)) // 8 * 8
    while r >= 8:
        if rows % r == 0:
            return r
        r -= 8
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm(x, weight, bias, eps):
    rows = math.prod(x.shape[:-1])
    d = x.shape[-1]
    r = _pick_rows(rows, d, x.dtype.itemsize)
    if r == 0:
        return layer_norm_reference(x, weight, bias, eps)
    x2 = x.reshape(rows, d)
    has_affine = weight is not None
    args = [x2]
    in_specs = [pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    if has_affine:
        args += [weight.reshape(1, d), bias.reshape(1, d)]
        in_specs += [
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        kernel = functools.partial(_ln_kernel, eps=eps)
    else:

        def kernel(x_ref, o_ref):
            _ln_kernel(x_ref, None, None, o_ref, eps=eps)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid=(rows // r,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * d,
            bytes_accessed=2 * rows * d * x.dtype.itemsize,
            transcendentals=rows,
        ),
    )(*args)
    return out.reshape(x.shape)


def _ln_fwd(x, weight, bias, eps):
    return _layer_norm(x, weight, bias, eps), (x, weight, bias)


def _ln_bwd(eps, res, g):
    x, weight, bias = res
    _, vjp = jax.vjp(lambda xx, ww, bb: layer_norm_reference(xx, ww, bb, eps), x, weight, bias)
    return vjp(g)


_layer_norm.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(x, weight: Optional[jax.Array], bias: Optional[jax.Array], eps: float = 1e-5):
    """Last-axis LayerNorm.

    Status: the Pallas kernel does NOT currently beat XLA here —
    measured on v5e at (50432, 768) bf16: XLA 1.46 ms, kernel 1.46 ms
    (small blocks are ~5us/program dispatch-bound; large blocks lose
    pipelining to the f32 intermediates). Both run ~105 GB/s, ~10x off
    the copy bandwidth; the cross-lane reduction is the shared limit.
    The kernel stays available behind EQXVISION_TPU_LN_PALLAS=1 for
    future Mosaic improvements; default is XLA.
    """
    if (
        os.environ.get("EQXVISION_TPU_LN_PALLAS") != "1"
        or not _use_pallas()
        or x.shape[-1] % 128 != 0
    ):
        return layer_norm_reference(x, weight, bias, eps)
    return _layer_norm(x, weight, bias, eps)
