"""PyTorch checkpoint importer.

Plays the role of reference eqxvision/utils.py:120-219
(``load_torch_weights``) but is **module-type-aware** instead of blindly
zipping flattened leaves positionally: the model tree is walked in field
declaration order (which, as in the reference, mirrors torchvision's
module registration order — reference utils.py:132-134), and each
param-bearing module consumes its checkpoint tensors with the correct
layout transform:

    torch Conv2d  (O, I/g, kh, kw)  -> HWIO   transpose (2, 3, 1, 0)
    torch Linear  (out, in)         -> (in, out)  transpose
    BatchNorm     weight/bias       -> params; running_* -> State
    LayerNorm / raw tensors         -> as-is (size-checked reshape)

Tensor *names* are verified against the consuming module type, so an
ordering mismatch fails loudly with both names instead of silently
mis-assigning weights (the failure mode behind the reference's VGG and
GoogLeNet accuracy regressions, SURVEY.md §8.1-8.2).
"""
from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..core.module import Module, replace
from ..core.state import State
from ..nn.conv import Conv2d
from ..nn.linear import Linear
from ..nn.norm import BatchNorm, GroupNorm, LayerNorm

_CACHE_DIR = os.environ.get("EQXVISION_TPU_CACHE", "/tmp/.eqxvision_tpu")

# also accept the reference's cache dir so previously fetched
# checkpoints are reused (reference utils.py:17)
_LEGACY_CACHE_DIRS = ("/tmp/.eqx",)


def resolve_torch_checkpoint(torch_weights: str) -> str:
    """Return a local path for ``torch_weights`` (path or URL), using the
    cache and downloading only when necessary."""
    if os.path.exists(torch_weights):
        return torch_weights
    fname = os.path.basename(torch_weights)
    for d in (_CACHE_DIR,) + _LEGACY_CACHE_DIRS:
        cached = os.path.join(d, fname)
        if os.path.exists(cached):
            logging.info("using cached checkpoint %s", cached)
            return cached
    import time

    import torch

    os.makedirs(_CACHE_DIR, exist_ok=True)
    dest = os.path.join(_CACHE_DIR, fname)
    # retryable fetch (SURVEY.md §5 failure-detection scope): transient
    # network errors back off and retry; partial files are not cached.
    last_err = None
    for attempt in range(3):
        try:
            tmp = dest + ".partial"
            torch.hub.download_url_to_file(torch_weights, tmp)
            os.replace(tmp, dest)
            return dest
        except Exception as e:  # pragma: no cover - network path
            last_err = e
            logging.warning("checkpoint fetch failed (attempt %d): %s", attempt + 1, e)
            time.sleep(2.0 * (attempt + 1))
    raise RuntimeError(f"failed to fetch {torch_weights}: {last_err}")


def load_torch_state_dict(torch_weights: str, *, allow_pickle: bool = False) -> Dict[str, np.ndarray]:
    """Load a checkpoint into an ordered name->ndarray dict.

    ``weights_only=True`` by default: all torchvision/DINO state dicts
    load as plain tensors, and full unpickling of a user-supplied URL is
    arbitrary code execution (ADVICE.md r1). Pass ``allow_pickle=True``
    only for trusted non-state-dict checkpoints.
    """
    import torch

    path = resolve_torch_checkpoint(torch_weights)
    obj = torch.load(path, map_location="cpu", weights_only=not allow_pickle)
    # unwrap common nesting conventions
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    out: Dict[str, np.ndarray] = {}
    for name, tensor in obj.items():
        if hasattr(tensor, "detach"):
            out[name] = tensor.detach().cpu().numpy()
    return out


class _TensorStream:
    def __init__(self, items: Iterable[Tuple[str, np.ndarray]]):
        self._items: List[Tuple[str, np.ndarray]] = list(items)
        self._pos = 0

    def take(self, expect_suffix: Optional[Sequence[str]], context: str) -> Tuple[str, np.ndarray]:
        if self._pos >= len(self._items):
            raise ValueError(
                f"torch checkpoint exhausted while importing {context} "
                f"(consumed all {len(self._items)} tensors)"
            )
        name, arr = self._items[self._pos]
        if expect_suffix is not None and not any(
            name.split(".")[-1] == s for s in expect_suffix
        ):
            raise ValueError(
                f"import order mismatch at checkpoint tensor '{name}' "
                f"(shape {tuple(arr.shape)}): model expected one of "
                f"{list(expect_suffix)} for {context}"
            )
        self._pos += 1
        return name, arr

    def remaining(self) -> List[str]:
        return [n for n, _ in self._items[self._pos :]]


def _check(cond: bool, msg: str):
    if not cond:
        raise ValueError(msg)


def import_torch_weights(
    model: Any,
    state_dict: Dict[str, np.ndarray],
    state: Optional[State] = None,
    *,
    skip_patterns: Sequence[str] = (),
    strict: bool = True,
    dtype=None,
) -> Tuple[Any, State]:
    """Import an ordered torch ``state_dict`` into ``(model, state)``.

    ``skip_patterns``: regexes for checkpoint entries to drop entirely
    (non-parameter buffers such as Swin's ``relative_position_index`` /
    ``attn_mask``; ``num_batches_tracked`` is always dropped).
    """
    skip_res = [re.compile(p) for p in tuple(skip_patterns) + (r"num_batches_tracked",)]
    stream = _TensorStream(
        (n, a) for n, a in state_dict.items() if not any(r.search(n) for r in skip_res)
    )
    new_state: State = dict(state) if state else {}

    def cast(a: np.ndarray, like: jax.Array) -> jax.Array:
        target = dtype or like.dtype
        return jnp.asarray(a, dtype=target)

    def visit(node: Any, path: str) -> Any:
        if isinstance(node, Conv2d):
            name, w = stream.take(("weight",), f"{path} (Conv2d weight)")
            w = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
            _check(
                w.shape == node.weight.shape,
                f"Conv2d weight shape mismatch at {path}: checkpoint '{name}' "
                f"{w.shape} vs model {node.weight.shape}",
            )
            changes = {"weight": cast(w, node.weight)}
            if node.bias is not None:
                bname, b = stream.take(("bias",), f"{path} (Conv2d bias)")
                _check(b.shape == node.bias.shape, f"Conv2d bias mismatch at {path} ('{bname}')")
                changes["bias"] = cast(b, node.bias)
            return replace(node, **changes)

        if isinstance(node, Linear):
            name, w = stream.take(("weight",), f"{path} (Linear weight)")
            w = np.transpose(w)  # (out, in) -> (in, out)
            _check(
                w.shape == node.weight.shape,
                f"Linear weight shape mismatch at {path}: checkpoint '{name}' "
                f"{w.shape} (transposed) vs model {node.weight.shape}",
            )
            changes = {"weight": cast(w, node.weight)}
            if node.bias is not None:
                bname, b = stream.take(("bias",), f"{path} (Linear bias)")
                _check(b.shape == node.bias.shape, f"Linear bias mismatch at {path} ('{bname}')")
                changes["bias"] = cast(b, node.bias)
            return replace(node, **changes)

        if isinstance(node, BatchNorm):
            changes = {}
            if node.weight is not None:
                _, w = stream.take(("weight",), f"{path} (BatchNorm weight)")
                _, b = stream.take(("bias",), f"{path} (BatchNorm bias)")
                changes = {"weight": cast(w, node.weight), "bias": cast(b, node.bias)}
            _, rm = stream.take(("running_mean",), f"{path} (BatchNorm running_mean)")
            _, rv = stream.take(("running_var",), f"{path} (BatchNorm running_var)")
            new_state[node.index] = (
                jnp.asarray(rm, jnp.float32),
                jnp.asarray(rv, jnp.float32),
            )
            return replace(node, **changes) if changes else node

        if isinstance(node, (LayerNorm, GroupNorm)):
            if node.weight is None:
                return node
            _, w = stream.take(("weight",), f"{path} (norm weight)")
            _, b = stream.take(("bias",), f"{path} (norm bias)")
            _check(w.shape == node.weight.shape, f"norm weight mismatch at {path}")
            return replace(node, weight=cast(w, node.weight), bias=cast(b, node.bias))

        if isinstance(node, Module):
            changes = {}
            for fname in type(node).__data_fields__:
                old = getattr(node, fname)
                new = visit(old, f"{path}.{fname}")
                if new is not old:
                    changes[fname] = new
            return replace(node, **changes) if changes else node

        if isinstance(node, tuple):
            return tuple(visit(x, f"{path}[{i}]") for i, x in enumerate(node))
        if isinstance(node, list):
            return [visit(x, f"{path}[{i}]") for i, x in enumerate(node)]
        if isinstance(node, dict):
            return {k: visit(v, f"{path}[{k!r}]") for k, v in node.items()}

        if isinstance(node, (jax.Array, np.ndarray)) and jnp.issubdtype(
            jnp.asarray(node).dtype, jnp.inexact
        ):
            # raw parameter leaf (cls_token, pos_embed, layer_scale, ...)
            name, w = stream.take(None, f"{path} (raw parameter)")
            _check(
                w.size == node.size,
                f"parameter size mismatch at {path}: checkpoint '{name}' "
                f"{w.shape} vs model {node.shape}",
            )
            return cast(np.reshape(w, node.shape), node)

        return node

    model = visit(model, "model")
    leftovers = stream.remaining()
    if strict and leftovers:
        raise ValueError(
            f"{len(leftovers)} checkpoint tensors were not consumed: "
            f"{leftovers[:8]}{'...' if len(leftovers) > 8 else ''}"
        )
    return model, new_state


def load_torch_weights(
    model: Any,
    torch_weights: str,
    state: Optional[State] = None,
    *,
    skip_patterns: Sequence[str] = (),
    strict: bool = True,
) -> Tuple[Any, State]:
    """Load torchvision-format pretrained weights into ``(model, state)``.

    Reference-compatible entry point (reference utils.py:120-219); the
    factory kwarg ``torch_weights=`` on every model routes through here.
    Returns the updated model *and* the State holding BN running stats
    (the reference smuggled those through ``eqx.experimental``
    side-channel mutation instead).
    """
    if torch_weights is None:
        raise ValueError("torch_weights parameter cannot be empty!")
    sd = load_torch_state_dict(torch_weights)
    return import_torch_weights(
        model, sd, state, skip_patterns=skip_patterns, strict=strict
    )
