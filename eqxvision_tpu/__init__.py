"""eqxvision_tpu — a TPU-native computer-vision model framework.

A from-scratch rebuild of the capabilities of `paganpasta/eqxvision`
(reference: /root/reference) designed TPU-first:

- **Batched NHWC by construction.** Every model consumes ``(N, H, W, C)``
  arrays (TPU's preferred layout) instead of the reference's per-sample
  ``(C, H, W)`` + ``jax.vmap(..., axis_name="batch")`` contract
  (reference README.md:37-46). Batch statistics for BatchNorm are plain
  reductions over the batch axis, which XLA turns into ICI collectives
  automatically when the batch is sharded over a `jax.sharding.Mesh`.
- **Functional state.** BatchNorm running statistics live in an explicit
  ``State`` mapping threaded through calls — no mutation-at-a-distance
  (the reference used `eqx.experimental.StateIndex` side channels,
  reference utils.py:203-218).
- **Pallas kernels** for the fusion-limited hot paths (fused attention,
  window attention, depthwise+SE) and XLA for everything it already does
  at roofline (large dense convs).
- **torch checkpoint import** preserved: every factory accepts
  ``torch_weights=`` and bit-matches torchvision pretrained accuracy
  (reference utils.py:120-219), but mapping is module-type-aware rather
  than blind positional zipping.
"""

__version__ = "0.1.0"

from . import core, data, export, nn, layers, models, ops, parallel, quantize, utils, experimental, observability
from .core import (
    Module,
    State,
    field,
    static,
    tree_at,
    tree_inference,
    filter_jit,
    filter_grad,
    filter_value_and_grad,
    partition,
    combine,
    is_array,
)
