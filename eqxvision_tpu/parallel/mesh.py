"""Device mesh + sharding helpers.

The reference's entire multi-device story was "users may pmap with
axis_name='batch'" (SURVEY.md §2.5). Here parallelism is first-class
and idiomatic JAX: build a ``jax.sharding.Mesh``, annotate batch and
parameter shardings with ``NamedSharding``, and let XLA insert the ICI
collectives (psum for sharded-batch BN statistics and tensor-parallel
contractions, all-gathers for replication).

Axes convention:
- ``data``: batch axis (DP). Always present.
- ``model``: tensor-parallel axis (TP) for wide transformer layers.
"""
from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1, *, devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over the available chips: ('data', 'model') axes."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"data({data}) * model({model}) != device count ({n})")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def shard_batch(x: Any, mesh: Mesh) -> Any:
    """Shard the leading (batch) axis of every array over 'data'."""

    def put(a):
        spec = P("data", *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jtu.tree_map(put, x)


def replicate(tree: Any, mesh: Mesh) -> Any:
    def put(a):
        if not isinstance(a, (jax.Array, np.ndarray)):
            return a
        return jax.device_put(a, NamedSharding(mesh, P()))

    return jtu.tree_map(put, tree)


# ---------------------------------------------------------------------------
# Tensor-parallel parameter sharding (Megatron-style for transformer MLP /
# attention: column-parallel first matmul, row-parallel second; XLA adds
# the psum after the row-parallel contraction automatically).

_TP_RULES: Tuple[Tuple[str, Tuple], ...] = (
    # (path regex, partition spec for weight leaves)
    (r"\.attn.*\.qkv.*weight", (None, "model")),
    (r"\.attn.*\.qkv.*bias", ("model",)),
    (r"\.attn.*\.proj.*weight", ("model", None)),
    (r"\.mlp\.fc1.*weight", (None, "model")),
    (r"\.mlp\.fc1.*bias", ("model",)),
    (r"\.mlp\.fc2.*weight", ("model", None)),
    (r"\.pwconv1.*weight", (None, "model")),
    (r"\.pwconv1.*bias", ("model",)),
    (r"\.pwconv2.*weight", ("model", None)),
)


def tp_spec_for_path(path: str, leaf: Any) -> P:
    for pattern, spec in _TP_RULES:
        if re.search(pattern, path):
            if len(spec) == leaf.ndim:
                return P(*spec)
    return P()  # replicate


def shard_params_tp(model: Any, mesh: Mesh) -> Any:
    """Place a model's params: TP rules for transformer blocks, replicate
    the rest. No-op (pure replication) when mesh has model axis size 1."""

    def put(path, leaf):
        if not isinstance(leaf, (jax.Array, np.ndarray)):
            return leaf
        spec = tp_spec_for_path(jtu.keystr(path), leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jtu.tree_map_with_path(put, model)


def param_shardings(model: Any, mesh: Mesh):
    """Pytree of NamedShardings matching shard_params_tp placement (for
    jit in_shardings/out_shardings)."""

    def spec(path, leaf):
        if not isinstance(leaf, (jax.Array, np.ndarray)):
            return None
        return NamedSharding(mesh, tp_spec_for_path(jtu.keystr(path), leaf))

    return jtu.tree_map_with_path(spec, model)
