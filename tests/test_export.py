"""AOT export (eqxvision_tpu/export.py).

The reference has no deployment path (SURVEY.md §2.4/§5 null
inventory); these tests pin the serving-artifact contract: weight-baked
StableHLO, byte round trip, numerical parity with the in-process model,
and jit-stability of the deserialized callable.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.export import export_inference, load_exported, save_exported
from eqxvision_tpu.models import create_model


@pytest.fixture(scope="module")
def small_model():
    # squeezenet1_1: the smallest zoo model (~1.2M params) — keeps the
    # weight-baked artifact and 1-core CPU compile time reasonable.
    model, state = create_model("squeezenet1_1", num_classes=10)
    return model, state


def test_export_round_trip_parity(small_model, tmp_path):
    model, state = small_model
    batch, size = 2, 96
    # f32 export (dtype=None): must match the eager inference forward
    # bit-for-bit — same graph, same platform.
    exp = export_inference(model, state, batch, size, dtype=None)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, size, size, 3), jnp.float32)

    infer = tree_inference(model, True)
    want, _ = infer(x, state)

    got = exp.call(x)
    assert got.shape == (batch, 10)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    # byte round trip: the artifact alone (no model pytree) reproduces it
    path = os.path.join(tmp_path, "squeezenet.stablehlo")
    save_exported(exp, path)
    assert os.path.getsize(path) > 0
    loaded = load_exported(path)
    got2 = loaded.call(x)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), atol=0, rtol=0)


def test_export_bf16_serving_config(small_model):
    model, state = small_model
    exp = export_inference(model, state, 2, 96)  # default bf16
    x = jnp.ones((2, 96, 96, 3), jnp.bfloat16)
    out = exp.call(x)
    assert out.shape == (2, 10)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_export_is_weight_baked(small_model):
    model, state = small_model
    exp = export_inference(model, state, 1, 96, dtype=None)
    # the only runtime input is the image placeholder — weights are
    # constants inside the module, not call arguments
    assert len(exp.in_avals) == 1
    assert exp.in_avals[0].shape == (1, 96, 96, 3)
    # serialized artifact carries the weights: it must be at least as
    # large as the f32 param bytes it bakes in
    param_bytes = sum(
        p.size * p.dtype.itemsize
        for p in jax.tree_util.tree_leaves(model)
        if hasattr(p, "size")
    )
    assert len(exp.serialize()) > 0.5 * param_bytes


def test_export_sharded_data_parallel(small_model):
    # multi-chip serving: batch sharded over the 8-device mesh, weights
    # replicated as baked constants; round-trips and matches unsharded
    model, state = small_model
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    exp = export_inference(model, state, 16, 96, dtype=None, mesh=mesh)
    blob = exp.serialize()
    loaded = jax.export.deserialize(blob)

    x = jax.random.normal(jax.random.PRNGKey(3), (16, 96, 96, 3), jnp.float32)
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    got = loaded.call(jax.device_put(x, sharding))
    assert got.sharding.is_equivalent_to(sharding, got.ndim)

    ref = export_inference(model, state, 16, 96, dtype=None).call(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_export_static_shape_rejects_other_batch(small_model):
    model, state = small_model
    exp = export_inference(model, state, 2, 96, dtype=None)
    bad = jnp.zeros((3, 96, 96, 3), jnp.float32)
    with pytest.raises(Exception):
        exp.call(bad)


def test_export_uint8_with_baked_preprocess(small_model):
    # uint8 serving entry: preprocess_fn runs INSIDE the artifact, so
    # the placeholder is decoded bytes and the first conv still sees
    # normalized floats (ADVICE r4: without the hook, following the
    # input_dtype doc fed raw 0-255 bytes to the model).
    from eqxvision_tpu.ops.preprocessing import normalize

    model, state = small_model
    pre = normalize  # uint8 -> /255 -> ImageNet mean/std, on device
    exp = export_inference(
        model, state, 2, 96, dtype=None,
        input_dtype=jnp.uint8, preprocess_fn=pre,
    )
    x8 = jax.random.randint(jax.random.PRNGKey(3), (2, 96, 96, 3), 0, 256, jnp.uint8)
    got = exp.call(x8)

    infer = tree_inference(model, True)
    want, _ = infer(pre(x8), state)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
