"""Core module-system tests: pytree semantics, static fields, surgery,
filtered transforms."""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

import eqxvision_tpu as ev
from eqxvision_tpu.core import (
    Module,
    static,
    replace,
    tree_at,
    tree_inference,
    partition,
    combine,
    filter_jit,
    filter_value_and_grad,
    init_state,
)
from eqxvision_tpu import nn


class Affine(Module):
    w: jax.Array
    b: jax.Array
    name: str = static(default="affine")

    def __init__(self, w, b, name="affine"):
        self.w = w
        self.b = b
        self.name = name

    def __call__(self, x):
        return self.w * x + self.b


def test_module_is_pytree():
    m = Affine(jnp.ones(3), jnp.zeros(3))
    leaves = jtu.tree_leaves(m)
    assert len(leaves) == 2  # name is static, not a leaf
    m2 = jtu.tree_map(lambda x: x * 2, m)
    assert isinstance(m2, Affine)
    assert m2.name == "affine"
    np.testing.assert_allclose(m2.w, 2 * np.ones(3))


def test_static_field_in_treedef():
    m1 = Affine(jnp.ones(3), jnp.zeros(3), name="a")
    m2 = Affine(jnp.ones(3), jnp.zeros(3), name="b")
    assert jtu.tree_structure(m1) != jtu.tree_structure(m2)


def test_jit_on_module_directly():
    m = Affine(jnp.full(3, 2.0), jnp.ones(3))
    traces = []

    @jax.jit
    def f(m, x):
        traces.append(1)
        return m(x)

    y = f(m, jnp.arange(3.0))
    np.testing.assert_allclose(y, 2 * np.arange(3.0) + 1)
    f(m, jnp.arange(3.0))
    m2 = jtu.tree_map(lambda x: x + 1, m)
    f(m2, jnp.arange(3.0))  # same structure: no retrace
    assert len(traces) == 1


def test_replace_and_tree_at():
    m = Affine(jnp.ones(3), jnp.zeros(3))
    m2 = replace(m, b=jnp.full(3, 5.0))
    np.testing.assert_allclose(m2.b, 5.0)
    np.testing.assert_allclose(m.b, 0.0)

    seq = nn.Sequential([Affine(jnp.ones(1), jnp.zeros(1)), Affine(jnp.full(1, 3.0), jnp.zeros(1))])
    seq2 = tree_at(lambda s: s.layers[1], seq, nn.Identity())
    assert isinstance(seq2.layers[1], nn.Identity)
    assert isinstance(seq.layers[1], Affine)


def test_tree_inference_flips_dropout_and_bn():
    key = jax.random.PRNGKey(0)
    model = nn.Sequential([
        nn.Conv2d(3, 4, 3, padding=1, key=key),
        nn.BatchNorm(4),
        nn.Dropout(0.5),
    ])
    assert model.layers[1].inference is False
    inf = tree_inference(model, True)
    assert inf.layers[1].inference is True
    assert inf.layers[2].inference is True
    # original untouched
    assert model.layers[2].inference is False


def test_init_state_and_bn_roundtrip():
    key = jax.random.PRNGKey(0)
    model = nn.Sequential([nn.Conv2d(3, 4, 3, padding=1, key=key), nn.BatchNorm(4)])
    state = init_state(model)
    assert len(state) == 1
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    y, state2 = model(x, state)
    assert y.shape == (2, 8, 8, 4)
    (idx,) = state2.keys()
    rm, rv = state2[idx]
    assert not np.allclose(rm, 0)  # running stats moved


def test_partition_combine_filter_jit():
    tree = {"a": jnp.ones(2), "b": "static-string", "c": 3}
    arrs, rest = partition(tree)
    assert rest["b"] == "static-string"
    merged = combine(arrs, rest)
    assert merged["b"] == "static-string"
    np.testing.assert_allclose(merged["a"], 1.0)

    @filter_jit
    def f(t, scale):
        return t["a"] * scale + t["c"]

    np.testing.assert_allclose(f(tree, 2.0), 2 * np.ones(2) + 3)


def test_filter_value_and_grad():
    m = Affine(jnp.full(3, 2.0), jnp.zeros(3))

    @filter_value_and_grad
    def loss(m, x):
        return jnp.sum(m(x) ** 2)

    value, grads = loss(m, jnp.ones(3))
    assert np.isfinite(value)
    assert grads.w.shape == (3,)
    np.testing.assert_allclose(grads.w, 2 * 2.0 * np.ones(3) * 1.0)


def test_tree_at_missing_target_raises():
    m = Affine(jnp.ones(3), jnp.zeros(3))
    other = jnp.zeros(7)
    with pytest.raises(ValueError):
        tree_at(lambda _: other, m, jnp.ones(7))
