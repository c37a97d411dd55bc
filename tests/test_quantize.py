"""Weight-only int8 quantization (eqxvision_tpu/quantize.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eqxvision_tpu import nn
from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.core.module import iter_modules
from eqxvision_tpu.models import create_model
from eqxvision_tpu.quantize import QuantLinear, quantize_linear, quantize_weights_int8


def test_quantize_linear_error_bound():
    lin = nn.Linear(64, 32, key=jax.random.PRNGKey(0))
    q = quantize_linear(lin)
    assert q.qweight.dtype == jnp.int8
    deq = q.qweight.astype(jnp.float32) * q.scale
    # symmetric per-column max-abs: elementwise error <= scale/2
    err = np.abs(np.asarray(deq - lin.weight))
    bound = np.asarray(q.scale) / 2 + 1e-8
    assert (err <= bound[None, :]).all()


def test_quant_linear_output_close():
    key = jax.random.PRNGKey(1)
    lin = nn.Linear(512, 128, key=key)
    q = quantize_linear(lin)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 512), jnp.float32)
    want = lin(x)
    got = q(x)
    # weight-only int8 noise is ~0.5% of the output RMS at this width
    scale = float(np.std(np.asarray(want))) + 1e-8
    assert float(np.max(np.abs(np.asarray(got - want)))) < 0.05 * scale


def test_zero_column_safe():
    lin = nn.Linear(8, 4, use_bias=False, key=jax.random.PRNGKey(0))
    lin_zero = jax.tree_util.tree_map(lambda w: w * 0, lin)
    q = quantize_linear(lin_zero)
    out = q(jnp.ones((2, 8)))
    assert not np.isnan(np.asarray(out)).any()
    assert (np.asarray(out) == 0).all()


def test_transform_swaps_all_linears_alexnet():
    model, state = create_model("alexnet", num_classes=10)
    model = tree_inference(model, True)
    n_lin = sum(isinstance(m, nn.Linear) for m in iter_modules(model))
    assert n_lin == 3
    qmodel = quantize_weights_int8(model)
    assert sum(isinstance(m, nn.Linear) for m in iter_modules(qmodel)) == 0
    assert sum(isinstance(m, QuantLinear) for m in iter_modules(qmodel)) == 3

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 96, 96, 3), jnp.float32)
    want, _ = jax.jit(model.__call__)(x, state)
    got, _ = jax.jit(qmodel.__call__)(x, state)
    scale = float(np.std(np.asarray(want))) + 1e-8
    assert float(np.max(np.abs(np.asarray(got - want)))) < 0.1 * scale


def test_predicate_narrows_selection():
    model, _ = create_model("alexnet", num_classes=10)
    qmodel = quantize_weights_int8(
        model, predicate=lambda l: l.in_features * l.out_features >= 4096 * 4096
    )
    kinds = [type(m).__name__ for m in iter_modules(qmodel) if isinstance(m, (nn.Linear, QuantLinear))]
    # 9216x4096 and 4096x4096 quantized; 4096x10 head kept exact
    assert kinds.count("QuantLinear") == 2 and kinds.count("Linear") == 1


def test_quantized_export_artifact_shrinks(tmp_path):
    # composes with AOT export: int8 constants make the artifact ~4x
    # smaller than the f32 export of the same Linear-heavy model
    from eqxvision_tpu.export import export_inference

    model, state = create_model("alexnet", num_classes=10)
    model = tree_inference(model, True)
    exp_f32 = export_inference(model, state, 1, 96, dtype=None)
    exp_int8 = export_inference(quantize_weights_int8(model), state, 1, 96, dtype=None)
    assert len(exp_int8.serialize()) < 0.4 * len(exp_f32.serialize())


def test_quantize_conv2d_error_bound_and_output():
    from eqxvision_tpu.quantize import quantize_conv2d

    conv = nn.Conv2d(8, 16, 3, padding=1, key=jax.random.PRNGKey(5))
    q = quantize_conv2d(conv)
    assert q.qweight.dtype == jnp.int8
    deq = q.qweight.astype(jnp.float32) * q.scale
    err = np.abs(np.asarray(deq - conv.weight))
    bound = np.asarray(q.scale) / 2 + 1e-8
    assert (err <= bound[None, None, None, :]).all()

    x = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 8), jnp.float32)
    want, got = conv(x), q(x)
    scale = float(np.std(np.asarray(want))) + 1e-8
    assert float(np.max(np.abs(np.asarray(got - want)))) < 0.05 * scale


def test_quantize_convs_after_bn_fold_resnet18():
    # the documented conv-model flow: fold BN first, then quantize, so
    # the folded affine lands inside the quantized weights
    from eqxvision_tpu.ops.fold_bn import fold_batchnorm
    from eqxvision_tpu.quantize import QuantConv2d

    model, state = create_model("resnet18", num_classes=10)
    model = tree_inference(model, True)
    folded = fold_batchnorm(model, state)
    qmodel = quantize_weights_int8(folded, convs=True)
    assert sum(isinstance(m, nn.Conv2d) for m in iter_modules(qmodel)) == 0
    assert sum(isinstance(m, QuantConv2d) for m in iter_modules(qmodel)) == 20

    x = jax.random.normal(jax.random.PRNGKey(7), (1, 64, 64, 3), jnp.float32)
    want, _ = jax.jit(folded.__call__)(x, state)
    got, _ = jax.jit(qmodel.__call__)(x, state)
    scale = float(np.std(np.asarray(want))) + 1e-8
    assert float(np.max(np.abs(np.asarray(got - want)))) < 0.15 * scale


def test_quantized_swin_runs_and_is_close():
    # ADVICE r4 (medium): swin's window attention and whole-block fused
    # kernels read qkv/proj/fc1/fc2 ``.weight`` directly
    # (models/classification/swin.py:122,188,260-266); before the
    # dequantizing QuantLinear.weight property this crashed at trace
    # with AttributeError for every swin/swin_v2 model under --int8.
    model, state = create_model("swin_t", num_classes=10)
    model = tree_inference(model, True)
    qmodel = quantize_weights_int8(model)
    assert sum(isinstance(m, nn.Linear) for m in iter_modules(qmodel)) == 0

    x = jax.random.normal(jax.random.PRNGKey(8), (1, 224, 224, 3), jnp.float32)
    want, _ = jax.jit(model.__call__)(x, state)
    got, _ = jax.jit(qmodel.__call__)(x, state)
    scale = float(np.std(np.asarray(want))) + 1e-8
    assert float(np.max(np.abs(np.asarray(got - want)))) < 0.15 * scale


def test_quantized_swin_v2_traces():
    # v2 reads the same fields through the cosine-attention path; a
    # shape-only lower() catches the AttributeError class without the
    # cost of executing a second full swin forward on one CPU core.
    model, state = create_model("swin_v2_t", num_classes=10)
    model = tree_inference(model, True)
    qmodel = quantize_weights_int8(model)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    jax.jit(qmodel.__call__).lower(x, state)


def test_mlp_projection_duck_typed_fusion_path():
    from eqxvision_tpu.layers import MlpProjection

    mlp = MlpProjection(64, 128, 64, key=jax.random.PRNGKey(3))
    qmlp = quantize_weights_int8(mlp)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 64), jnp.float32)
    want = mlp(x)
    got = qmlp(x)
    scale = float(np.std(np.asarray(want))) + 1e-8
    assert float(np.max(np.abs(np.asarray(got - want)))) < 0.1 * scale


def test_dyn_act_int8_linear_output_close():
    # w8a8: both operands rounded; per-token act scales + per-column
    # weight scales keep relative error ~1% at this width
    from eqxvision_tpu.quantize import DynActInt8Linear, quantize_dynamic_int8

    lin = nn.Linear(512, 128, key=jax.random.PRNGKey(3))
    q = quantize_dynamic_int8(lin)
    assert isinstance(q, DynActInt8Linear)
    assert q.qweight.dtype == jnp.int8
    x = jax.random.normal(jax.random.PRNGKey(4), (6, 512), jnp.float32)
    want, got = lin(x), q(x)
    scale = float(np.std(np.asarray(want))) + 1e-8
    assert float(np.max(np.abs(np.asarray(got - want)))) < 0.08 * scale
    # the dot really is int8 x int8 -> int32 (no f32 fallback hidden
    # inside the transform): the lowered StableHLO must contain an
    # i8 x i8 dot_general producing i32
    hlo = jax.jit(q.__call__).lower(x).as_text()
    assert "xi8>, tensor" in hlo and "xi8>) -> tensor" in hlo and "xi32>" in hlo


def test_dyn_act_int8_vit_runs_and_is_close():
    from eqxvision_tpu.quantize import DynActInt8Linear, quantize_dynamic_int8

    model, state = create_model("vit_tiny", num_classes=10, img_size=64)
    model = tree_inference(model, True)
    qmodel = quantize_dynamic_int8(model)
    assert sum(isinstance(m, DynActInt8Linear) for m in iter_modules(qmodel)) > 0
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 64, 64, 3), jnp.float32)
    want, _ = jax.jit(model.__call__)(x, state)
    got, _ = jax.jit(qmodel.__call__)(x, state)
    scale = float(np.std(np.asarray(want))) + 1e-8
    assert float(np.max(np.abs(np.asarray(got - want)))) < 0.25 * scale
