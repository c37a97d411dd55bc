"""Normalization layers.

BatchNorm here is the load-bearing redesign vs the reference: the
reference computed batch statistics with a ``lax.pmean`` over a vmap/pmap
``axis_name="batch"`` and mutated running stats through
``eqx.experimental`` side channels (reference conv_norm_activation.py:80,
utils.py:203-218). With batched NHWC inputs, batch statistics are plain
reductions over (N, H, W); when the batch axis is sharded over a device
mesh XLA lowers the reduction to an ICI psum automatically — no axis
names, no plumbing. Running stats thread through an explicit ``State``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.module import Module, static
from ..core.state import StatefulLayer, next_state_index


class BatchNorm(StatefulLayer):
    """torch.nn.BatchNorm2d/1d-compatible batch normalization.

    Training: normalizes with biased batch variance; running stats are
    updated as ``running = (1 - momentum) * running + momentum * batch``
    with *unbiased* batch variance (exact torch semantics).
    Inference (``inference=True``): normalizes with running stats.
    """

    weight: Optional[jax.Array]
    bias: Optional[jax.Array]
    num_features: int = static()
    eps: float = static()
    momentum: float = static()
    index: int = static()
    inference: bool = static()

    def __init__(
        self,
        num_features: int,
        eps: float = 1e-5,
        momentum: float = 0.1,
        affine: bool = True,
        inference: bool = False,
        *,
        dtype=jnp.float32,
        # accepted-and-ignored for reference API compatibility:
        axis_name: str = None,
        key=None,
    ):
        self.num_features = int(num_features)
        self.eps = float(eps)
        self.momentum = float(momentum)
        self.index = next_state_index()
        self.inference = bool(inference)
        self.weight = jnp.ones((num_features,), dtype) if affine else None
        self.bias = jnp.zeros((num_features,), dtype) if affine else None

    def initial_state(self):
        return (
            jnp.zeros((self.num_features,), jnp.float32),
            jnp.ones((self.num_features,), jnp.float32),
        )

    def __call__(self, x: jax.Array, state, *, key=None):
        # channels-last: reduce over every axis except the last.
        reduce_axes = tuple(range(x.ndim - 1))
        if self.inference:
            if state is None or self.index not in state:
                raise ValueError(
                    "BatchNorm in inference mode requires a State holding its "
                    "running statistics (use init_state(model) or load weights)."
                )
            mean, var = state[self.index]
        else:
            xf = x.astype(jnp.float32)
            # one-pass sum/sumsq statistics: jnp.var's two-pass
            # E[(x-mean)^2] re-reads x after the mean reduction —
            # measured 1.077 vs 0.735 ms for stats+normalize on a
            # layer1-sized map (scripts/ablate_train_bn.py). The
            # E[x^2]-E[x]^2 cancellation (ADVICE r3: ~24% relative var
            # error at |mean|/std~1000) is removed by accumulating
            # around the batch's own first element as a per-channel
            # shift: variance is shift-invariant (exact in values and
            # gradients — the s-dependence cancels analytically, hence
            # the stop_gradient), |x0 - mean| is O(std) for ANY channel
            # so the mean_s^2 term stays at the benign scale, and the
            # broadcast-subtract fuses into the two reduction reads (no
            # extra HBM traffic). var is clamped >= 0 either way.
            n_elems = 1
            for a in reduce_axes:
                n_elems *= x.shape[a]
            shift = jax.lax.stop_gradient(xf[(0,) * (x.ndim - 1)])
            xs = xf - shift
            s1 = jnp.sum(xs, axis=reduce_axes)
            s2 = jnp.sum(xs * xs, axis=reduce_axes)
            mean_s = s1 / n_elems
            var = jnp.maximum(s2 / n_elems - mean_s * mean_s, 0.0)
            mean = mean_s + shift
            if state is not None:
                unbiased = var * (n_elems / max(n_elems - 1, 1))
                old_mean, old_var = state.get(self.index, self.initial_state())
                m = self.momentum
                state = dict(state)
                state[self.index] = (
                    (1 - m) * old_mean + m * mean,
                    (1 - m) * old_var + m * unbiased,
                )
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps)
        scale = inv if self.weight is None else inv * self.weight.astype(jnp.float32)
        shift = -mean.astype(jnp.float32) * scale
        if self.bias is not None:
            shift = shift + self.bias.astype(jnp.float32)
        y = x.astype(jnp.float32) * scale + shift
        return y.astype(x.dtype), state


class LayerNorm(Module):
    """torch.nn.LayerNorm over the trailing ``shape`` dims."""

    weight: Optional[jax.Array]
    bias: Optional[jax.Array]
    shape: Tuple[int, ...] = static()
    eps: float = static()

    def __init__(self, shape: Union[int, Sequence[int]], eps: float = 1e-5, elementwise_affine: bool = True, *, dtype=jnp.float32, key=None):
        if isinstance(shape, int):
            shape = (shape,)
        self.shape = tuple(int(s) for s in shape)
        self.eps = float(eps)
        self.weight = jnp.ones(self.shape, dtype) if elementwise_affine else None
        self.bias = jnp.zeros(self.shape, dtype) if elementwise_affine else None

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        if len(self.shape) == 1:
            # hot path: last-axis LN through the Pallas kernel on TPU
            from ..ops.layernorm import layer_norm

            return layer_norm(x, self.weight, self.bias, self.eps)
        axes = tuple(range(x.ndim - len(self.shape), x.ndim))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.weight is not None:
            y = y * self.weight.astype(jnp.float32) + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)


class GroupNorm(Module):
    weight: Optional[jax.Array]
    bias: Optional[jax.Array]
    num_groups: int = static()
    num_channels: int = static()
    eps: float = static()

    def __init__(self, num_groups: int, num_channels: int, eps: float = 1e-5, affine: bool = True, *, dtype=jnp.float32, key=None):
        if num_channels % num_groups:
            raise ValueError("num_channels must divide num_groups")
        self.num_groups = int(num_groups)
        self.num_channels = int(num_channels)
        self.eps = float(eps)
        self.weight = jnp.ones((num_channels,), dtype) if affine else None
        self.bias = jnp.zeros((num_channels,), dtype) if affine else None

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        # x: (..., C) channels-last; normalize per group over spatial+group.
        orig_shape = x.shape
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(orig_shape[0], -1, g, self.num_channels // g)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(orig_shape)
        if self.weight is not None:
            y = y * self.weight.astype(jnp.float32) + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)
