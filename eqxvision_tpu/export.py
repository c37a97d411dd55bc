"""Ahead-of-time export of inference graphs for serving.

The reference has no deployment path at all (SURVEY.md §2.4/§5 null
inventory — it is a library of modules the user jits themselves). A
production TPU serving stack wants the opposite: a **self-contained,
weight-baked, pre-lowered artifact** that a serving binary can load and
run without Python model code, built once at release time. This module
provides that on top of ``jax.export`` (StableHLO serialization):

- :func:`export_inference` — lower ``model(x, state)`` at a fixed
  batch/size into a :class:`jax.export.Exported` whose HLO constants
  hold the weights (the artifact is the checkpoint; no separate weight
  file, no pytree reconstruction at serve time).
- :func:`save_exported` / :func:`load_exported` — byte-level round trip.
  The deserialized object's ``.call`` is jittable on the target
  platform and recompiles never (static shapes, the TPU-first rule).

TPU-first notes: exports default to the standard serving precision
(bf16 params/activations, f32 accumulation — the same configuration
bench.py measures); shapes are static so XLA tiles every matmul/conv
onto the MXU with no dynamic-shape fallbacks; cross-platform export
(`platforms=["tpu"]`) lets a CPU release host produce TPU artifacts.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .core import tree_inference
from .core.filters import cast_inexact
from .core.state import State


def _inference_fn(model: Any, state: State, dtype, preprocess_fn=None):
    """Close model+state over a pure ``f(x) -> logits`` for export.

    Closing over (rather than passing as arguments) bakes every weight
    into the lowered module as a constant — the serialized artifact is
    fully self-contained. ``preprocess_fn`` runs first (inside the
    artifact), so a uint8 input placeholder reaches the first conv as
    properly normalized floats, not raw bytes (ADVICE r4).
    """
    model = tree_inference(model, True)
    if dtype is not None:
        model = cast_inexact(model, dtype)

    def fn(x):
        if preprocess_fn is not None:
            x = preprocess_fn(x)
        if dtype is not None and jnp.issubdtype(x.dtype, jnp.inexact):
            x = x.astype(dtype)
        out, _ = model(x, state)
        if isinstance(out, tuple):  # segmentation: (aux, out)
            out = out[-1]
        return out

    return fn


def export_inference(
    model: Any,
    state: State,
    batch: int,
    size: int,
    *,
    channels: int = 3,
    dtype: Optional[Any] = jnp.bfloat16,
    input_dtype: Optional[Any] = None,
    preprocess_fn: Optional[Any] = None,
    platforms: Optional[Sequence[str]] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
) -> jax_export.Exported:
    """Lower one inference configuration to a serving artifact.

    Args:
      model, state: a built ``(model, state)`` pair (any train/eval
        mode — inference mode is forced).
      batch, size: the static serving shape ``(batch, size, size, C)``.
      dtype: compute dtype the weights/activations are cast to
        (default bf16, the measured serving configuration; pass
        ``None`` to keep the model's own dtypes, e.g. f32 parity
        exports).
      input_dtype: dtype of the serving input placeholder (defaults to
        ``dtype`` or f32). Pass ``jnp.uint8`` together with a
        ``preprocess_fn`` for a graph that starts at decoded bytes.
      preprocess_fn: optional ``x -> x`` stage baked in FRONT of the
        model (runs on the raw placeholder before any dtype cast) —
        e.g. ``lambda x: ops.normalize(ops.center_crop(x / 255., size))``
        composed from ops/preprocessing. Without it a uint8 input
        would reach the first conv as raw 0-255 bytes (ADVICE r4).
      platforms: lowering platforms (e.g. ``["tpu"]``) — enables
        cross-platform export from a CPU release host; default is the
        current backend.
      mesh: multi-chip serving — shard the batch over ``mesh``'s
        ``data_axis`` (weights replicate as baked constants; XLA
        inserts the ICI collectives). ``batch`` is the GLOBAL batch and
        must divide by the axis size. The loading process recreates a
        same-shape mesh to call the artifact (the Exported records the
        shardings).

    Returns a ``jax.export.Exported``; ``.serialize()`` yields the
    portable bytes, ``.call(x)`` runs it in-process.
    """
    fn = _inference_fn(model, state, dtype, preprocess_fn)
    in_dtype = input_dtype or dtype or jnp.float32
    spec = jax.ShapeDtypeStruct((batch, size, size, channels), in_dtype)
    if mesh is not None:
        sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(data_axis)
        )
        jitted = jax.jit(fn, in_shardings=(sharding,), out_shardings=sharding)
    else:
        jitted = jax.jit(fn)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    return jax_export.export(jitted, **kwargs)(spec)


def save_exported(exported: jax_export.Exported, path: str) -> None:
    """Write the serialized artifact to ``path``."""
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str) -> jax_export.Exported:
    """Load an artifact; ``.call(x)`` is jittable on the target."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
