"""Weight-only int8 quantization for serving.

The reference has no quantization path (pure-Python f32 modules,
SURVEY.md §2). On TPU the case for weight-only int8 is bandwidth:
latency-bound serving shapes (small batch) are dominated by streaming
the weight matrices from HBM — alexnet b1's 0.24 ms is ~50% classifier
param reads (docs/design.md, bench timing section) — and int8 halves
that traffic again vs bf16 while keeping activations and accumulation
in the measured bf16/f32 serving configuration (the MXU accumulates
f32 regardless; only the weight *storage* narrows).

Scheme: per-output-channel symmetric int8 (the standard weight-only
recipe — scales commute through the contraction, so dequantization is
a cheap per-column multiply of the small OUTPUT tile, and the weight
read stays an int8 -> compute-dtype convert that XLA fuses into the
matmul's operand load; no zero-points, no activation calibration).
Per-channel max-abs scaling bounds elementwise weight error by
``scale/2 = max|w_col| / 254``.

Inference-only, opt-in (like ``ops.fold_bn``): apply after
``tree_inference`` / weight loading, before jit or AOT export —
``export_inference`` of a quantized model bakes int8 constants, so the
serving artifact also shrinks ~4x vs f32. Composes with Linear-backed
layers (Linear2d, MlpProjection heads) via tree recursion. Modules
that read a Linear's ``.weight``/``.bias`` directly instead of calling
it — Swin's window attention and whole-block fused kernels
(models/classification/swin.py:122,188,260-266) — keep working through
:attr:`QuantLinear.weight`, a dequantizing property: the weight stays
int8 in HBM and the per-column rescale happens on-device at use time
(ADVICE r4: the previous version crashed every swin/swin_v2 model
under ``--int8`` because QuantLinear had no ``.weight``).

Measured on-chip (v5e, scripts/ablate_int8.py, r5, in-graph fori-loop
chain timing): alexnet b1 serving 251.7 -> 172.7 us/iter (**1.46x**)
vs bf16 weights; the isolated 9216x4096 classifier matvec 142.5 ->
90.0 us (1.58x) — consistent with the weight-read-bound model. Logit
perturbation max|diff| = 1.2% of the logit std (b1, random input).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .core.module import Module, _map_module_tree, static
from .nn.conv import Conv2d
from .nn.linear import Linear


class QuantLinear(Module):
    """Drop-in inference replacement for ``nn.Linear`` with int8 weight
    storage and per-output-channel f32 scales."""

    qweight: jax.Array  # int8, (in_features, out_features)
    scale: jax.Array  # f32, (out_features,)
    bias: Optional[jax.Array]
    in_features: int = static()
    out_features: int = static()

    def __init__(self, qweight, scale, bias, in_features, out_features):
        self.qweight = qweight
        self.scale = scale
        self.bias = bias
        self.in_features = int(in_features)
        self.out_features = int(out_features)

    @property
    def weight(self) -> jax.Array:
        """Dequantized weight ``(in_features, out_features)``.

        For callers that consume the matrix directly instead of calling
        the layer (Swin's packed/fused attention kernels pad and pack
        ``qkv.weight``/``proj.weight``/``fc1``/``fc2``): the stored
        tensor stays int8; this materializes ``q * s`` on device at
        trace time, which XLA fuses into the consumer's operand load.
        """
        return self.qweight.astype(self.scale.dtype) * self.scale

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        return self.preactivation(x).astype(x.dtype)

    def preactivation(self, x: jax.Array) -> jax.Array:
        """f32 accumulator before the output cast (same epilogue-fusion
        contract as nn.Linear.preactivation). The per-column scale is
        applied to the accumulator, NOT the weight: (x @ (q * s)) ==
        (x @ q) * s for per-output-channel s, and the right-hand form
        keeps the weight read a bare int8 -> x.dtype convert."""
        from .core.precision import accum_dtype

        acc = accum_dtype()
        y = jnp.dot(x, self.qweight.astype(x.dtype), preferred_element_type=acc)
        y = y * self.scale.astype(y.dtype)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y


class QuantConv2d(Module):
    """Drop-in inference replacement for ``nn.Conv2d`` with int8 HWIO
    weight storage and per-output-channel f32 scales (convolution is
    linear per output channel, so the scale commutes to the
    accumulator exactly as in :class:`QuantLinear`)."""

    qweight: jax.Array  # int8, (kh, kw, in/groups, out)
    scale: jax.Array  # f32, (out,)
    bias: Optional[jax.Array]
    stride: Any = static()
    padding: Any = static()
    dilation: Any = static()
    groups: int = static()

    def __init__(self, qweight, scale, bias, stride, padding, dilation, groups):
        self.qweight = qweight
        self.scale = scale
        self.bias = bias
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = int(groups)

    @property
    def weight(self) -> jax.Array:
        """Dequantized HWIO weight (see :attr:`QuantLinear.weight`)."""
        return self.qweight.astype(self.scale.dtype) * self.scale

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        from .core.precision import accum_dtype

        acc = accum_dtype()
        y = jax.lax.conv_general_dilated(
            x,
            self.qweight.astype(x.dtype),
            window_strides=self.stride,
            padding=self.padding,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=acc,
        )
        y = y * self.scale.astype(y.dtype)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y.astype(x.dtype)


def quantize_conv2d(conv: Conv2d) -> QuantConv2d:
    """Per-output-channel symmetric int8 quantization of one Conv2d."""
    w = conv.weight.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0  # (out,)
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantConv2d(
        q, scale, conv.bias, conv.stride, conv.padding, conv.dilation, conv.groups
    )


def quantize_linear(lin: Linear) -> QuantLinear:
    """Per-output-channel symmetric int8 quantization of one Linear."""
    w = lin.weight.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0  # (out,)
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantLinear(q, scale, lin.bias, lin.in_features, lin.out_features)


class DynActInt8Linear(Module):
    """w8a8 inference Linear: int8 weights AND dynamically-quantized
    int8 activations, so the matmul itself runs on the MXU's int8 path
    (v5e: ~394 TOPS peak, 2x bf16).

    Recipe (per-token dynamic symmetric quantization, the standard w8a8
    serving scheme): each call computes a per-row max-abs scale of the
    activation, rounds to int8, runs an int8 x int8 -> int32
    ``dot_general``, and rescales the accumulator by the outer product
    of row scales and the per-output-channel weight scales — exact
    commutation, so the only approximation is the two roundings.

    Measured on-chip (v5e, scripts/ablate_int8_act.py, r5, in-graph
    fori-chain timing on the ViT fc1 GEMM 50432x768x3072): XLA's
    int8 x int8 -> int32 dot runs at the SAME rate as bf16, not the
    2x MXU int8 peak — bf16 1.670 ms (142 TF/s with the consumer
    epilogue) vs int8_dyn 1.764 ms (x1.06), int8 cast-only 1.814,
    per-channel 1.886. So w8a8 buys ~4x artifact shrink at ~6% compute
    cost but NO speedup; the serving throughput lever remains
    weight-only int8 (:class:`QuantLinear`, 1.46x on weight-read-bound
    shapes) and this class stays opt-in for size/experimentation.
    """

    qweight: jax.Array  # int8, (in_features, out_features)
    scale: jax.Array  # f32, (out_features,)
    bias: Optional[jax.Array]
    in_features: int = static()
    out_features: int = static()

    def __init__(self, qweight, scale, bias, in_features, out_features):
        self.qweight = qweight
        self.scale = scale
        self.bias = bias
        self.in_features = int(in_features)
        self.out_features = int(out_features)

    @property
    def weight(self) -> jax.Array:
        """Dequantized weight (see :attr:`QuantLinear.weight`); direct
        ``.weight`` consumers (Swin's packed kernels) take the bf16
        path, not the int8 dot."""
        return self.qweight.astype(self.scale.dtype) * self.scale

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        return self.preactivation(x).astype(x.dtype)

    def preactivation(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # per row
        sx = jnp.where(sx == 0, 1.0, sx)
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y32 = jax.lax.dot_general(
            xq,
            self.qweight,
            (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y32.astype(jnp.float32) * (sx * self.scale)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y


def quantize_dynamic_int8(
    model: Any,
    *,
    predicate: Optional[Callable[[Any], bool]] = None,
) -> Any:
    """Replace (selected) ``nn.Linear`` layers with w8a8
    :class:`DynActInt8Linear` (int8 weights + per-token dynamic int8
    activations). Inference-only, opt-in, same usage contract as
    :func:`quantize_weights_int8`; ``eval_imagenet.py --int8-act``
    wires it into the eval CLI."""

    def fn(m: Module) -> Module:
        if isinstance(m, Linear) and (predicate is None or predicate(m)):
            lin = quantize_linear(m)
            return DynActInt8Linear(
                lin.qweight, lin.scale, lin.bias, m.in_features, m.out_features
            )
        return m

    return _map_module_tree(fn, model)


def quantize_weights_int8(
    model: Any,
    *,
    convs: bool = False,
    predicate: Optional[Callable[[Any], bool]] = None,
) -> Any:
    """Return a copy of ``model`` with (selected) ``nn.Linear`` — and,
    with ``convs=True``, ``nn.Conv2d`` — layers replaced by int8
    :class:`QuantLinear` / :class:`QuantConv2d`.

    ``predicate(layer) -> bool`` narrows the selection (default: all).
    E.g. quantize only bandwidth-relevant layers:
    ``lambda l: l.weight.size >= 1 << 20``.

    Linears are the latency lever (weight-read-bound serving shapes);
    ``convs=True`` additionally shrinks conv-heavy AOT artifacts ~4x vs
    f32 (apply BEFORE ops.fold_bn is unavailable — fold BN first, then
    quantize, so the folded affine lands in the quantized weights).
    """

    def fn(m: Module) -> Module:
        if isinstance(m, Linear) and (predicate is None or predicate(m)):
            return quantize_linear(m)
        if convs and isinstance(m, Conv2d) and (predicate is None or predicate(m)):
            return quantize_conv2d(m)
        return m

    return _map_module_tree(fn, model)
