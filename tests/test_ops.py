"""Ops tests: fused attention (incl. the Pallas kernel in interpreter
mode), window attention helpers, preprocessing pipeline, compat shim,
serialization."""
import os

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from eqxvision_tpu.ops.attention import attention, attention_reference, _attention_pallas
from eqxvision_tpu.ops.preprocessing import imagenet_eval_pipeline
from eqxvision_tpu.ops.window_attention import window_partition, window_unpartition


def rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


def test_attention_reference_matches_torch_sdpa():
    q, k, v = rand(2, 4, 17, 8, seed=1), rand(2, 4, 17, 8, seed=2), rand(2, 4, 17, 8, seed=3)
    ref = TF.scaled_dot_product_attention(
        torch.from_numpy(np.asarray(q)), torch.from_numpy(np.asarray(k)), torch.from_numpy(np.asarray(v))
    ).numpy()
    ours = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_pallas_kernel_matches_reference_interpret():
    """Run the actual Pallas kernel in interpreter mode on CPU and check
    padding/masking against the XLA reference."""
    from unittest import mock
    import jax.experimental.pallas as pl

    q, k, v = rand(6, 49, 32, seed=1), rand(6, 49, 32, seed=2), rand(6, 49, 32, seed=3)
    bias = rand(3, 49, 49, seed=4)  # broadcast batch: 6 % 3 == 0
    with mock.patch.object(pl, "pallas_call", functools_partial_interpret(pl.pallas_call)):
        out = _attention_pallas(q, k, v, bias, scale=0.17)
    ref = attention_reference(
        q.reshape(2, 3, 49, 32), k.reshape(2, 3, 49, 32), v.reshape(2, 3, 49, 32),
        bias[None], scale=0.17,
    ).reshape(6, 49, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def functools_partial_interpret(orig):
    import functools

    def wrapper(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    return wrapper


def test_window_partition_roundtrip():
    x = rand(2, 14, 21, 5)
    w = window_partition(x, 7, 7)
    assert w.shape == (2, 6, 49, 5)
    back = window_unpartition(w, 14, 21, 7, 7)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_preprocessing_matches_torch_semantics():
    """resize(shorter->256, bilinear antialias) + center-crop + normalize
    vs the same ops done with torch (F.interpolate antialias=True)."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(1, 300, 400, 3), dtype=np.uint8)
    out = imagenet_eval_pipeline(jnp.asarray(img))
    assert out.shape == (1, 224, 224, 3)

    t = torch.from_numpy(img.astype(np.float32)).permute(0, 3, 1, 2)
    t = TF.interpolate(t, size=(256, 341), mode="bilinear", antialias=True)
    top, left = (256 - 224) // 2, (341 - 224) // 2
    t = t[:, :, top : top + 224, left : left + 224] / 255.0
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    t = ((t - mean) / std).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), t, atol=2e-2)
    # bulk agreement (interp kernels differ slightly at edges)
    assert np.mean(np.abs(np.asarray(out) - t)) < 2e-3


def test_five_and_ten_crop():
    """Corner/center crops in torchvision functional.five_crop order
    (tl, tr, bl, br, center); ten_crop appends the h-flipped five."""
    from eqxvision_tpu import ops

    x = jnp.arange(2 * 8 * 10 * 3, dtype=jnp.float32).reshape(2, 8, 10, 3)
    five = ops.five_crop(x, 4, 6)
    assert five.shape == (5, 2, 4, 6, 3)
    xa = np.asarray(x)
    np.testing.assert_array_equal(np.asarray(five[0]), xa[:, :4, :6])
    np.testing.assert_array_equal(np.asarray(five[1]), xa[:, :4, 4:])
    np.testing.assert_array_equal(np.asarray(five[2]), xa[:, 4:, :6])
    np.testing.assert_array_equal(np.asarray(five[3]), xa[:, 4:, 4:])
    np.testing.assert_array_equal(np.asarray(five[4]), xa[:, 2:6, 2:8])
    ten = ops.ten_crop(x, 4, 6)
    assert ten.shape == (10, 2, 4, 6, 3)
    np.testing.assert_array_equal(np.asarray(ten[:5]), np.asarray(five))
    np.testing.assert_array_equal(
        np.asarray(ten[5]), xa[:, :, ::-1][:, :4, :6]
    )
    with pytest.raises(ValueError):
        ops.five_crop(x, 9)


def test_compat_shim_reference_pattern():
    """The reference quickstart pattern runs against the compat layer
    (reference README.md:37-46)."""
    from eqxvision_tpu import compat as eqx

    net = eqx.resnet18(num_classes=5)
    net = eqx.tree_inference(net, True)
    forward = eqx.filter_jit(
        lambda model, x, keys: jax.vmap(model)(x, key=keys)
    )
    imgs = jnp.zeros((4, 3, 64, 64))
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    out = forward(net, imgs, keys)
    assert out.shape == (4, 5)


def test_compat_exports_full_reference_surface():
    """Every public name the reference exports is importable from the
    compat shim: 91 factories+classes (reference models/__init__.py:
    1-106), 7 layers (layers/__init__.py:1-6), the experimental feature-
    extraction names (experimental.py), and the utils registry surface
    (utils.py:20-117)."""
    from eqxvision_tpu import compat, experimental, layers, utils

    classes = [
        "AlexNet", "ConvNeXt", "DeepLabV3", "DenseNet", "EfficientNet",
        "FCN", "GoogLeNet", "LRASPP", "MobileNetV2", "MobileNetV3",
        "RegNet", "ResNet", "ShuffleNetV2", "SqueezeNet",
        "SwinTransformer", "VGG", "VisionTransformer",
    ]
    from eqxvision_tpu.models.registry import list_models

    for name in classes + list_models():
        assert hasattr(compat, name), name
    for name in ["ConvNormActivation", "DropPath", "LayerNorm2d",
                 "Linear2d", "MlpProjection", "PatchEmbed",
                 "SqueezeExcitation"]:
        assert hasattr(layers, name), name
    for name in ["AuxData", "IntermediateLayerGetter",
                 "IntermediateWrapper", "intermediate_layer_getter"]:
        assert hasattr(experimental, name), name
    for name in ["load_torch_weights", "CLASSIFICATION_URLS",
                 "SEGMENTATION_URLS", "_make_divisible"]:
        assert hasattr(utils, name), name
    # classes exposed by compat are the real core classes
    from eqxvision_tpu.models import ResNet

    assert compat.ResNet is ResNet


def test_save_load_roundtrip(tmp_path):
    """State roundtrips by structural path, not construction counter.

    The load template is built AFTER an unrelated stateful model, so its
    State-dict indices differ from the saved model's — the round-1
    counter-keyed scheme silently reset BN stats here (ADVICE.md r1).
    Running stats are advanced past init first so a silent reset would
    change the eval output and fail the comparison.
    """
    from eqxvision_tpu.models.classification.resnet import resnet18
    from eqxvision_tpu.models.classification.squeezenet import squeezenet1_1
    from eqxvision_tpu.weights import load_model, save_model

    model, state = resnet18(num_classes=3)
    # Advance BN running stats away from init with one training-mode call.
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 64, 64, 3))
    _, state = model(x, state, key=jax.random.PRNGKey(8))
    path = str(tmp_path / "ckpt.npz")
    save_model(path, model, state)

    squeezenet1_1(num_classes=2)  # offset the global state counter
    model2, state2 = resnet18(num_classes=3, key=jax.random.PRNGKey(42))
    assert set(state2) != set(state)  # indices really do differ
    model2, state2 = load_model(path, model2, state2)
    from eqxvision_tpu.core import tree_inference

    y1, _ = tree_inference(model, True)(x[:1], state)
    y2, _ = tree_inference(model2, True)(x[:1], state2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_orbax_roundtrip_counter_offset(tmp_path):
    """Orbax checkpoints restore state across counter offsets (path keys)."""
    pytest.importorskip("orbax.checkpoint")
    from eqxvision_tpu.models.classification.resnet import resnet18
    from eqxvision_tpu.models.classification.squeezenet import squeezenet1_1
    from eqxvision_tpu.weights.orbax_io import load_checkpoint, save_checkpoint

    model, state = resnet18(num_classes=3)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 64, 64, 3))
    _, state = model(x, state, key=jax.random.PRNGKey(8))
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint(path, model, state)

    squeezenet1_1(num_classes=2)  # offset the global state counter
    model2, state2 = resnet18(num_classes=3, key=jax.random.PRNGKey(42))
    model2, state2, _ = load_checkpoint(path, model2, state2)
    from eqxvision_tpu.core import tree_inference

    y1, _ = tree_inference(model, True)(x[:1], state)
    y2, _ = tree_inference(model2, True)(x[:1], state2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_load_missing_state_raises(tmp_path):
    """A checkpoint with state must cover every template stateful layer."""
    from eqxvision_tpu.models.classification.resnet import resnet18
    from eqxvision_tpu.weights import load_model, save_model

    model, state = resnet18(num_classes=3)
    partial = dict(state)
    partial.pop(sorted(partial)[0])
    path = str(tmp_path / "partial.npz")
    save_model(path, model, partial)
    model2, state2 = resnet18(num_classes=3)
    with pytest.raises(KeyError):
        load_model(path, model2, state2)


def test_registry_create_model():
    from eqxvision_tpu.models import create_model, list_models

    assert "resnet50" in list_models() and "deeplabv3" in list_models()
    model, state = create_model("squeezenet1_1", num_classes=4)
    from eqxvision_tpu.core import tree_inference

    y, _ = tree_inference(model, True)(jnp.zeros((1, 224, 224, 3)), state)
    assert y.shape == (1, 4)


def test_checked_call_catches_nan():
    from eqxvision_tpu import nn as evnn
    from eqxvision_tpu.observability import checked_call
    from jax.experimental import checkify

    lin = evnn.Linear(4, 4, key=jax.random.PRNGKey(0))
    model = evnn.Sequential([lin, evnn.Lambda(lambda t: jnp.log(t))])
    bad = jnp.full((2, 4), -1.0)  # log of negative -> NaN
    with pytest.raises(checkify.JaxRuntimeError):
        checked_call(model, bad, {})
    # clean model passes
    (y, _) = checked_call(evnn.Sequential([lin]), jnp.full((2, 4), 10.0), {})
    assert y.shape == (2, 4)


def test_importer_rejects_misordered_state_dict():
    """The importer must fail loudly on ordering mismatches (the silent
    failure mode behind the reference's VGG regression, SURVEY.md §8.1)."""
    from eqxvision_tpu import nn as evnn
    from eqxvision_tpu.weights.torch_import import import_torch_weights

    model = evnn.Sequential([
        evnn.Conv2d(3, 4, 3, key=jax.random.PRNGKey(0)),
        evnn.BatchNorm(4),
    ])
    state = {model.layers[1].index: model.layers[1].initial_state()}
    good = {
        "conv.weight": np.zeros((4, 3, 3, 3), np.float32),
        "conv.bias": np.zeros((4,), np.float32),
        "bn.weight": np.ones((4,), np.float32),
        "bn.bias": np.zeros((4,), np.float32),
        "bn.running_mean": np.zeros((4,), np.float32),
        "bn.running_var": np.ones((4,), np.float32),
        "bn.num_batches_tracked": np.zeros((), np.int64),
    }
    m2, s2 = import_torch_weights(model, good, state)
    assert float(jnp.sum(m2.layers[0].weight)) == 0.0

    # wrong order: bn before conv -> name verification trips
    bad = dict(list(good.items())[2:] + list(good.items())[:2])
    with pytest.raises(ValueError):
        import_torch_weights(model, bad, state)

    # wrong shape -> loud error
    bad2 = dict(good)
    bad2["conv.weight"] = np.zeros((4, 3, 5, 5), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_torch_weights(model, bad2, state)

    # leftover tensors -> strict error
    extra = dict(good)
    extra["zzz.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        import_torch_weights(model, extra, state)


def test_window_qkv_kernel_matches_reference_interpret():
    """Swin's windowed fused-qkv kernel (interpret mode) vs XLA
    reference, both bias layouts."""
    from unittest import mock
    import importlib
    import jax.experimental.pallas as pl

    A = importlib.import_module("eqxvision_tpu.ops.attention")
    qkv = rand(2, 8, 49, 3 * 96, seed=1)
    with mock.patch.object(pl, "pallas_call", functools_partial_interpret(pl.pallas_call)), mock.patch.object(
        A, "_use_pallas", lambda *a: True
    ):
        for bias_shape in ((8, 3, 49, 49), (1, 3, 49, 49)):
            bias = rand(*bias_shape, seed=2)
            out = A._window_qkv_attention(qkv, bias, 3, 0.18)
            ref = A._window_qkv_reference(qkv, bias, 3, 0.18)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_window_kernel_matches_reference_interpret():
    """Swin's head-packed window kernel (interpret mode) vs the XLA
    reference, per-window and shared bias layouts, both a 128-padded
    (C=96) and an already-aligned (C=384... here 128) channel count."""
    from unittest import mock
    import importlib
    import jax.experimental.pallas as pl

    A = importlib.import_module("eqxvision_tpu.ops.attention")
    with mock.patch.object(pl, "pallas_call", functools_partial_interpret(pl.pallas_call)), mock.patch.object(
        A, "_use_pallas", lambda *a: True
    ):
        for c, heads, nw, bias_nw in ((96, 3, 8, 8), (96, 3, 8, 1), (128, 4, 2, 1)):
            cp = -(-c // 128) * 128
            L = 49
            qkv = rand(2, nw, L, 3 * c, seed=c + nw)
            q, k, v = np.split(np.asarray(qkv), 3, axis=-1)
            padw = [(0, 0)] * 3 + [(0, cp - c)]
            qkvp = jnp.asarray(
                np.concatenate(
                    [np.pad(q, padw), np.pad(k, padw), np.pad(v, padw)], axis=-1
                )
            )
            bias = rand(bias_nw, heads, L, L, seed=3)
            bias_packed = jnp.transpose(bias, (0, 2, 1, 3)).reshape(bias_nw, L, heads * L)
            scale = (c // heads) ** -0.5
            out = A._packed_window_attention(qkvp, bias_packed, None, heads, c, scale)
            ref = A._packed_window_reference(qkvp, bias_packed, None, heads, c, scale)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
            # and the reference's own math vs the plain window reference
            ref2 = A._window_qkv_reference(qkv, bias, heads, scale)
            np.testing.assert_allclose(
                np.asarray(ref[..., :c]), np.asarray(ref2), atol=2e-5
            )
            # v2 cosine variant: in-kernel per-head normalize + logit scale
            gs = jnp.asarray(np.linspace(3.0, 9.0, heads), jnp.float32)
            outc = A._packed_window_attention(qkvp, bias_packed, gs, heads, c, 1.0)
            refc = A._packed_window_reference(qkvp, bias_packed, gs, heads, c, 1.0)
            np.testing.assert_allclose(np.asarray(outc), np.asarray(refc), atol=2e-5)


def test_packed_window_kernel_cross_head_underflow():
    """Regression for ADVICE.md r2 (medium): the packed kernels used a
    GLOBAL row max across all heads' segments; a head whose scores sit
    >~88 log-units (f32 exp underflow) below the row max had exp == 0
    across its segment -> 0/0 NaN. Reachable for trained Swin-v2
    checkpoints (logit scale clamps at 100, CPB bias spans up to 16).
    Drives both the packed-attention kernel and the whole-block kernel
    with per-head constant bias offsets of -150/-300 (softmax within a
    head is shift-invariant, so the reference stays finite and equal to
    the zero-offset case; the packed kernel's quarter-power
    normalization is exact to 349 log-units of cross-head spread, vs
    88 for plain global-max softmax) and a clamped logit-scale cosine
    case."""
    from unittest import mock
    import importlib
    import jax.experimental.pallas as pl

    A = importlib.import_module("eqxvision_tpu.ops.attention")
    WA = importlib.import_module("eqxvision_tpu.ops.window_attention")
    c, heads, nw, L = 96, 3, 8, 49
    cp = 128
    qkv = rand(2, nw, L, 3 * c, seed=11)
    q, k, v = np.split(np.asarray(qkv), 3, axis=-1)
    padw = [(0, 0)] * 3 + [(0, cp - c)]
    qkvp = jnp.asarray(
        np.concatenate([np.pad(q, padw), np.pad(k, padw), np.pad(v, padw)], axis=-1)
    )
    bias = rand(nw, heads, L, L, seed=12)
    # per-head constant offsets put heads 1/2 far below head 0's row
    # max; -200 with the gs=100 cosine case below reproduces the
    # REACHABLE worst-case cross-head gap (~230 log-units: logit-scale
    # clamp 100 + CPB bias 16 on both sides) where plain global-max
    # softmax NaNs (threshold ~88) and the quarter-power normalization
    # is still exact (threshold ~349, ops/attention.py:_segment_softmax)
    offs = np.array([0.0, -100.0, -200.0], np.float32).reshape(1, heads, 1, 1)
    bias_off = bias + offs
    pack = lambda b: jnp.transpose(b, (0, 2, 1, 3)).reshape(nw, L, heads * L)
    scale = (c // heads) ** -0.5
    with mock.patch.object(pl, "pallas_call", functools_partial_interpret(pl.pallas_call)), mock.patch.object(
        A, "_use_pallas", lambda *a: True
    ):
        out = A._packed_window_attention(jnp.asarray(qkvp), pack(bias_off), None, heads, c, scale)
        assert np.isfinite(np.asarray(out)).all()
        ref = A._packed_window_attention(jnp.asarray(qkvp), pack(bias), None, heads, c, scale)
        # atol 1e-4: adding -300 to O(1) biases rounds s at the f32-eps-
        # at-300 level (~3e-5) before the shift cancels
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
        # cosine at the clamp: one head scaled 100x vs one at 0.01 plus
        # the bias offsets — the regime the advisor flagged
        gs = jnp.asarray([100.0, 0.01, 100.0], jnp.float32)
        outc = A._packed_window_attention(jnp.asarray(qkvp), pack(bias_off), gs, heads, c, 1.0)
        assert np.isfinite(np.asarray(outc)).all()
        refc = A._packed_window_reference(jnp.asarray(qkvp), pack(bias_off), gs, heads, c, 1.0)
        # atol 1e-4: the 100x logit scale amplifies f32 rounding in the
        # normalize/score path; still ~1e-4-level like the model parity bar
        np.testing.assert_allclose(np.asarray(outc), np.asarray(refc), atol=1e-4)

    # whole-block kernel: same failure mode at window_attention.py's
    # softmax; drive it through _fused_swin_block with a bias table
    # whose per-head columns carry the same extreme offsets
    from eqxvision_tpu.core import tree_at, tree_inference
    from eqxvision_tpu.models.classification.swin import _SwinTransformerBlock

    blk = tree_inference(
        _SwinTransformerBlock(96, 3, window_size=(7, 7), shift_size=(0, 0), key=jax.random.PRNGKey(0)),
        True,
    )
    table = blk.attn.relative_position_bias_table
    table_off = table + jnp.asarray(offs.reshape(1, heads))
    x = rand(2, 14, 14, 96, seed=13) * 0.5
    composed = tree_at(lambda b: b.attn.relative_position_bias_table, blk, table_off)(x)
    assert np.isfinite(np.asarray(composed)).all()
    with mock.patch.object(
        pl, "pallas_call", functools_partial_interpret(pl.pallas_call)
    ), mock.patch.object(A, "_use_pallas", lambda *a: True), mock.patch.object(
        WA, "_swin_use_pallas", lambda *a: True
    ):
        fused = tree_at(lambda b: b.attn.relative_position_bias_table, blk, table_off)(x)
    assert np.isfinite(np.asarray(fused)).all()
    np.testing.assert_allclose(np.asarray(fused), np.asarray(composed), atol=2e-5)


def test_packed_v2_cosine_attention_matches_xla():
    """Swin v2's cosine attention through the packed-kernel path
    (interpret mode, XLA-side per-head normalization + folded logit
    scale) vs the plain XLA path."""
    from unittest import mock
    import importlib
    import os
    import jax.experimental.pallas as pl

    A = importlib.import_module("eqxvision_tpu.ops.attention")
    WA = importlib.import_module("eqxvision_tpu.ops.window_attention")
    c, heads = 96, 3
    x = rand(2, 16, 16, c, seed=5) * 0.5
    qkv_w = rand(c, 3 * c, seed=6) * 0.1
    proj_w = rand(c, c, seed=7) * 0.1
    qkv_b = rand(3 * c, seed=8).reshape(-1) * 0.1
    proj_b = rand(c, seed=9).reshape(-1) * 0.1
    bias = rand(1, heads, 64, 64, seed=10)
    logit_scale = jnp.log(10.0 * jnp.ones((heads, 1, 1)))

    def run():
        return WA.shifted_window_attention(
            x, qkv_w, proj_w, bias, (8, 8), heads, (4, 4),
            qkv_bias=qkv_b, proj_bias=proj_b, logit_scale=logit_scale,
        )

    ref = run()  # CPU: packed path off (_use_pallas False)
    with mock.patch.object(
        pl, "pallas_call", functools_partial_interpret(pl.pallas_call)
    ), mock.patch.object(A, "_use_pallas", lambda *a: True), mock.patch.object(
        WA, "_swin_use_pallas", lambda *a: True
    ), mock.patch.dict(os.environ, {"EQXVISION_TPU_SWIN_PACKED_V2": "1"}):
        got = run()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_swin_block_matches_composed_interpret():
    """The whole-block Swin kernel (LN1+qkv+attention+proj+residual+
    LN2+MLP+residual in one Pallas program) vs the composed module path,
    interpret mode, shifted and unshifted."""
    from unittest import mock
    import importlib
    import jax.experimental.pallas as pl

    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.models.classification.swin import (
        _ShiftedWindowAttentionV2,
        _SwinTransformerBlock,
        _SwinTransformerBlockV2,
    )

    A = importlib.import_module("eqxvision_tpu.ops.attention")
    WA = importlib.import_module("eqxvision_tpu.ops.window_attention")
    cases = [
        (_SwinTransformerBlock, (7, 7), 0, 14, {}),
        (_SwinTransformerBlock, (7, 7), 3, 14, {}),
        (_SwinTransformerBlockV2, (8, 8), 0, 16, {"attn_layer": _ShiftedWindowAttentionV2}),
        (_SwinTransformerBlockV2, (8, 8), 4, 16, {"attn_layer": _ShiftedWindowAttentionV2}),
        # dynamic padding: non-multiple spatial sizes (10 -> pad 14, 12 -> pad 16)
        (_SwinTransformerBlock, (7, 7), 3, 10, {}),
        (_SwinTransformerBlockV2, (8, 8), 4, 12, {"attn_layer": _ShiftedWindowAttentionV2}),
    ]
    for cls, win, shift, hw, kw in cases:
        blk = tree_inference(
            cls(
                96, 3, window_size=win, shift_size=(shift, shift),
                key=jax.random.PRNGKey(shift), **kw,
            ),
            True,
        )
        x = rand(2, hw, hw, 96, seed=shift) * 0.5
        composed = blk(x)  # CPU: _can_fuse is False (no TPU backend)
        with mock.patch.object(
            pl, "pallas_call", functools_partial_interpret(pl.pallas_call)
        ), mock.patch.object(A, "_use_pallas", lambda *a: True), mock.patch.object(
            WA, "_swin_use_pallas", lambda *a: True
        ):
            assert blk._can_fuse()
            fused = blk(x)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(composed), atol=2e-5)


def test_fused_qkv_kernel_matches_reference_interpret():
    """ViT's default hot path on TPU (_qkv_attn_kernel) in interpret
    mode vs the XLA reference — previously only exercised on real
    hardware (ADVICE.md r1). Covers grouped (b%4==0) and ungrouped
    (odd b) program shapes."""
    from unittest import mock
    import importlib
    import jax.experimental.pallas as pl

    A = importlib.import_module("eqxvision_tpu.ops.attention")
    with mock.patch.object(pl, "pallas_call", functools_partial_interpret(pl.pallas_call)), mock.patch.object(
        A, "_use_pallas", lambda *a: True
    ):
        for b in (4, 3):
            qkv = rand(b, 197, 3 * 192, seed=b)
            out = A._fused_qkv_attention(qkv, 3, 0.125)
            ref = A._fused_qkv_reference(qkv, 3, 0.125)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        # pair-packed variant (head_dim=64; even and odd head counts)
        with mock.patch.dict("os.environ", {"EQXVISION_TPU_VIT_PAIR": "1"}):
            for heads in (4, 3):
                qkv = rand(2, 49, 3 * heads * 64, seed=heads)
                out = A._fused_qkv_attention(qkv, heads, 0.125)
                ref = A._fused_qkv_reference(qkv, heads, 0.125)
                np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("factory", ["resnet18", "mobilenet_v3_small", "vgg11_bn", "googlenet"])
def test_fold_batchnorm_preserves_logits(factory):
    """BN folding (inference BN absorbed into conv weights) must be a
    numerical no-op on the logits."""
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.nn.norm import BatchNorm
    from eqxvision_tpu.core.module import iter_modules
    from eqxvision_tpu.ops.fold_bn import fold_batchnorm

    model, state = create_model(factory, num_classes=5)
    # randomize running stats so folding actually moves numbers
    state = {
        k: (jnp.asarray(np.random.RandomState(k).randn(v[0].shape[0]) * 0.2, jnp.float32),
            jnp.asarray(1.0 + np.random.RandomState(k + 1).rand(v[1].shape[0]), jnp.float32))
        for k, v in state.items()
    }
    model = tree_inference(model, True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 96, 96, 3).astype(np.float32) * 0.3)
    ref, _ = model(x, state)
    folded = fold_batchnorm(model, state)
    n_bn_before = sum(isinstance(m, BatchNorm) for m in iter_modules(model))
    n_bn_after = sum(isinstance(m, BatchNorm) for m in iter_modules(folded))
    assert n_bn_after == 0, f"{factory}: {n_bn_after}/{n_bn_before} BNs left unfolded"
    out, _ = folded(x, {})
    if isinstance(ref, tuple):
        ref, out = ref[0], out[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)


def _randomize_layernorms(model, seed=0):
    """Give every LayerNorm a non-trivial affine so folding actually
    moves numbers — fresh-init gamma=1/beta=0 makes the fold a no-op
    and would let a transposed/wrong-axis fold pass the parity check."""
    from eqxvision_tpu.core.module import _map_module_tree, replace as mod_replace
    from eqxvision_tpu.nn.norm import LayerNorm

    rng = np.random.RandomState(seed)

    def fn(m):
        if isinstance(m, LayerNorm) and m.weight is not None:
            w = jnp.asarray(1.0 + 0.3 * rng.randn(*m.weight.shape), m.weight.dtype)
            b = jnp.asarray(0.2 * rng.randn(*m.bias.shape), m.bias.dtype)
            return mod_replace(m, weight=w, bias=b)
        return m

    return _map_module_tree(fn, model)


def test_fold_layernorm_preserves_vit_logits():
    """LN-affine folding (ops/fold_ln.py) must be a numerical no-op on
    ViT logits, remove every block LN affine, and fold the final norm
    into a Linear head (classification mode)."""
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.models.classification.vit import VisionTransformer
    from eqxvision_tpu.ops import fold_layernorm

    model = VisionTransformer(
        img_size=64, patch_size=16, embed_dim=96, depth=3, num_heads=3, num_classes=7
    )
    model = _randomize_layernorms(tree_inference(model, True), seed=11)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 64, 3).astype(np.float32) * 0.3)
    ref, _ = model(x, {})
    folded = fold_layernorm(model)
    for blk in folded.blocks:
        assert blk.norm1.weight is None and blk.norm2.weight is None
    assert folded.norm.weight is None
    out, _ = folded(x, {})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)
    # extraction API unchanged by the fold (same qkv products)
    p_ref = model.get_last_self_attention(x)
    p_new = folded.get_last_self_attention(x)
    np.testing.assert_allclose(np.asarray(p_new), np.asarray(p_ref), atol=1e-5)


def test_fold_layernorm_convnext_preserves_logits():
    """ConvNeXt fold: block norms -> pwconv1, padding-0 downsample LNs
    -> 2x2 conv (exact bias shift — no padded taps), classifier LN ->
    fc. The stem LN (follows its conv) must remain."""
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.ops import fold_layernorm

    model, state = create_model("convnext_tiny", num_classes=9)
    model = _randomize_layernorms(tree_inference(model, True), seed=12)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 64, 64, 3).astype(np.float32) * 0.3)
    ref, _ = model(x, state)
    folded = fold_layernorm(model)
    # stem LN intact; every block/downsample/classifier LN affine-free
    assert folded.features.layers[0].layers[1].weight is not None
    for blk in folded.features.layers[1].layers:
        assert blk.norm.weight is None
    assert folded.features.layers[2].layers[0].weight is None
    assert folded.classifier_norm.weight is None
    out, _ = folded(x, state)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_fold_layernorm_feature_mode_keeps_final_norm():
    """DINO feature mode (num_classes=0, Identity head): block norms
    fold, the final norm must be left intact — its affine output IS the
    returned feature."""
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.models.classification.vit import VisionTransformer
    from eqxvision_tpu.ops import fold_layernorm

    model = VisionTransformer(
        img_size=32, patch_size=16, embed_dim=96, depth=2, num_heads=3, num_classes=0
    )
    model = _randomize_layernorms(tree_inference(model, True), seed=13)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 32, 32, 3).astype(np.float32) * 0.3)
    ref, _ = model(x, {})
    folded = fold_layernorm(model)
    assert folded.norm.weight is not None
    out, _ = folded(x, {})
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_imagefolder_loader(tmp_path):
    from PIL import Image

    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(5):
            arr = (np.random.RandomState(i).rand(37, 53, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(d / f"{i}.png"))

    from eqxvision_tpu.data import ImageFolderLoader

    loader = ImageFolderLoader(str(tmp_path), batch_size=4, side=32, num_workers=2)
    assert loader.classes == ["cat", "dog"]
    batches = list(loader)
    assert len(batches) == 2  # 10 samples, drop ragged tail
    imgs, labels = batches[0]
    assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.uint8
    assert labels.dtype == np.int32
    all_labels = np.concatenate([b[1] for b in batches])
    assert set(all_labels.tolist()) == {0, 1}

    # device_prefetch: same stream, leaves on device, order preserved
    from eqxvision_tpu.data import device_prefetch

    pf = list(device_prefetch(loader, size=2))
    assert len(pf) == len(batches)
    for (a_img, a_lab), (b_img, b_lab) in zip(pf, batches):
        assert isinstance(a_img, jax.Array)
        np.testing.assert_array_equal(np.asarray(a_img), b_img)
        np.testing.assert_array_equal(np.asarray(a_lab), b_lab)


def test_eval_cli_end_to_end(tmp_path, monkeypatch):
    """scripts/eval_imagenet.py runs the full host-decode -> device
    preprocess -> model -> metrics pipeline on a synthetic ImageFolder."""
    import contextlib
    import importlib.util
    import io
    import json as _json
    import sys as _sys
    from PIL import Image

    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(4):
            arr = (np.random.RandomState(i).rand(80, 70, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(d / f"{i}.jpg"))

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts", "eval_imagenet.py"
    )
    spec = importlib.util.spec_from_file_location("eval_imagenet", script)
    mod = importlib.util.module_from_spec(spec)
    monkeypatch.setattr(
        _sys, "argv",
        ["eval_imagenet.py", "--model", "squeezenet1_1", "--data-dir", str(tmp_path),
         "--batch-size", "4", "--resize", "64", "--crop", "56", "--workers", "2"],
    )
    spec.loader.exec_module(mod)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod.main()
    out = buf.getvalue().strip().splitlines()
    summary = _json.loads(out[-1])
    assert summary["event"] == "summary" and summary["images"] == 8
    assert 0.0 <= summary["top1"] <= 1.0

    # serving config: --int8 (fold BN -> weight-only int8) end-to-end
    monkeypatch.setattr(
        _sys, "argv",
        ["eval_imagenet.py", "--model", "squeezenet1_1", "--data-dir", str(tmp_path),
         "--batch-size", "4", "--resize", "64", "--crop", "56", "--workers", "2",
         "--int8"],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod.main()
    summary = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["event"] == "summary" and summary["images"] == 8

    # multi-crop TTA path: --tta five_crop (crops folded into the batch)
    monkeypatch.setattr(
        _sys, "argv",
        ["eval_imagenet.py", "--model", "squeezenet1_1", "--data-dir", str(tmp_path),
         "--batch-size", "4", "--resize", "64", "--crop", "56", "--workers", "2",
         "--tta", "five_crop"],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod.main()
    summary = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["event"] == "summary" and summary["images"] == 8
    assert 0.0 <= summary["top1"] <= summary["top5"] <= 1.0
