"""Flatten NHWC feature maps in CHW order.

Classifier heads imported from torchvision flatten (C, H, W) features in
channel-major order before the first Linear. Since our activations are
NHWC, a raw reshape would permute the flattened input (e.g. AlexNet's
9216-dim classifier input) relative to the checkpoint's Linear weight.
This layer transposes to NCHW first so imported Linear weights apply
unchanged. The transpose is tiny (post-pool maps, e.g. 6x6x256) and
fuses into the following matmul's layout assignment under XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.module import Module


def flatten_chw(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, C*H*W) flattened in torch CHW order."""
    n = x.shape[0]
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)


class FlattenCHW(Module):
    def __init__(self, **_):
        pass

    def __call__(self, x: jax.Array, *, key=None) -> jax.Array:
        return flatten_chw(x)
