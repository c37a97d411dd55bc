"""Jit-stability guards (VERDICT r4 missing #2).

The reference treats exactly-one-trace across repeated calls as a
correctness property (reference tests/test_models/test_vit.py:11-35,
55-60: a nonlocal counter inside the jitted fn asserts no silent
recompilation). With custom static-field hashing in core/module.py a
retrace bug would cost minutes per step through the TPU tunnel, so the
same guards are pinned here for the native batched API, the
single-sample compat vmap pattern, and the stateful-BN path — plus a
registry-wide sweep that every model's pytree treedef (which embeds the
static fields) is hashable, the property jit's cache keys rely on.
"""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.models import create_model
from eqxvision_tpu.models.registry import list_models


def _counting_forward():
    """A jitted forward whose Python body counts traces."""
    traces = {"n": 0}

    @jax.jit
    def fwd(m, s, x):
        traces["n"] += 1
        out, _ = m(x, s)
        if isinstance(out, tuple):
            out = out[-1]
        return out

    return fwd, traces


@pytest.mark.parametrize("name,size", [("resnet50", 64), ("vit_tiny", 224), ("swin_t", 96)])
def test_exactly_one_trace_batched(name, size):
    model, state = create_model(name)
    model = tree_inference(model, True)
    fwd, traces = _counting_forward()
    x1 = jnp.zeros((2, size, size, 3))
    x2 = jnp.ones((2, size, size, 3))
    y1 = fwd(model, state, x1)
    y2 = fwd(model, state, x2)
    assert traces["n"] == 1, f"{name}: retraced on identical shapes/statics"
    # not constant-folded: different inputs give different logits
    assert not jnp.allclose(y1, y2)
    # a new shape legitimately retraces exactly once more
    fwd(model, state, jnp.zeros((4, size, size, 3)))
    assert traces["n"] == 2


def test_exactly_one_trace_compat_vmap():
    """The reference's own usage shape: per-sample CHW under vmap
    (reference README.md:37-46) must also be trace-stable."""
    model, state = create_model("resnet18")
    model = tree_inference(model, True)
    traces = {"n": 0}

    @jax.jit
    def fwd(m, s, xb):
        traces["n"] += 1

        def single(img):
            out, _ = m(img, s)
            return out

        return jax.vmap(single)(xb)

    fwd(model, state, jnp.zeros((2, 3, 64, 64)))
    fwd(model, state, jnp.ones((2, 3, 64, 64)))
    assert traces["n"] == 1


def test_tree_inference_flip_retraces_once():
    """inference is a static field: flipping it must retrace exactly
    once (correct behavior change), then stay stable."""
    model, state = create_model("resnet18")
    fwd, traces = _counting_forward()
    x = jnp.zeros((2, 64, 64, 3))
    infer = tree_inference(model, True)
    fwd(infer, state, x)
    fwd(infer, state, x)
    assert traces["n"] == 1
    train = tree_inference(model, False)
    fwd(train, state, x)
    assert traces["n"] == 2
    fwd(infer, state, x)  # back to the cached inference entry
    assert traces["n"] == 2


@pytest.mark.parametrize("name", list_models())
def test_registry_model_statics_are_hashable(name):
    """Every registry model must build (abstractly — no weight
    materialisation, so the 100M+-param variants stay cheap) with a
    hashable treedef: jit's cache key hashes the treedef, which embeds
    every static field, so one unhashable static (e.g. a list) anywhere
    means silent-retrace-forever."""
    kwargs = {}
    if name in ("fcn", "deeplabv3"):
        kwargs = dict(aux_in_channels=1024)
    pair = jax.eval_shape(lambda: create_model(name, **kwargs))
    td = jtu.tree_structure(pair)
    assert isinstance(hash(td), int)
    # the treedef compares/hashes stably for the same model instance
    # (what jit's cache key sees across calls). Cross-BUILD equality is
    # intentionally NOT asserted: stateful layers get construction-unique
    # state indices (core/state.py:_state_counter, same semantics as
    # equinox StateIndex), so a rebuilt model is a different cache entry
    # by design — trace stability for a given instance is pinned by the
    # trace-count tests above.
    assert td == jtu.tree_structure(pair) and hash(td) == hash(jtu.tree_structure(pair))
