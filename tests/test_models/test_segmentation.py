"""End-to-end segmentation parity vs torch twins: FCN, DeepLabV3,
LR-ASPP + the feature-extraction subsystem (SURVEY.md §2.3
segmentation table, §3.4 call stack)."""
import os
import sys

import numpy as np
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

import importlib

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.experimental import intermediate_layer_getter
from eqxvision_tpu.models.classification import resnet as _resnet

# import the submodules (the package re-exports functions with the same
# names, shadowing the module attributes)
_dl = importlib.import_module("eqxvision_tpu.models.segmentation.deeplabv3")
_fcn = importlib.import_module("eqxvision_tpu.models.segmentation.fcn")
_lraspp = importlib.import_module("eqxvision_tpu.models.segmentation.lraspp")
from eqxvision_tpu.models.segmentation._utils import resize_bilinear
from eqxvision_tpu.weights.torch_import import import_torch_weights

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import torch_refs4


def _import(tmodel, model, state):
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    return import_torch_weights(model, sd, state)


def test_resize_bilinear_matches_torch_interpolate():
    x = np.random.RandomState(0).randn(2, 5, 13, 17).astype(np.float32)
    ref = TF.interpolate(torch.from_numpy(x), size=(52, 68), mode="bilinear", align_corners=False).numpy()
    ours = resize_bilinear(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 52, 68)
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, atol=1e-5)


def test_intermediate_layer_getter_functional():
    model, state = _resnet.resnet18()
    wrapped = intermediate_layer_getter(model, lambda m: [m.layer2, m.layer4])
    model_inf = tree_inference(wrapped, True)
    x = jnp.zeros((1, 64, 64, 3))
    (final, taps), _ = model_inf(x, state)
    assert len(taps) == 2
    assert taps[0].shape == (1, 8, 8, 128)
    assert taps[1].shape == (1, 2, 2, 512)
    assert final.shape == (1, 1000)


def test_intermediate_layer_getter_concurrent_traces():
    """Reentrancy (VERDICT r4 weak #5): two getters tracing in separate
    threads must not interleave taps. The tap stack is a contextvar, so
    each thread's trace sees only its own collection."""
    import threading

    model, state = _resnet.resnet18()
    w24 = tree_inference(intermediate_layer_getter(model, lambda m: [m.layer2, m.layer4]), True)
    w13 = tree_inference(intermediate_layer_getter(model, lambda m: [m.layer1, m.layer3]), True)
    shapes = {}
    errs = []

    def run(name, wrapped, n_iters=3):
        try:
            x = jnp.zeros((1, 64, 64, 3))
            for _ in range(n_iters):
                # eval_shape traces without executing: pure interleaved
                # tracing, the failure mode for a module-global stack
                (f, taps), _ = jax.eval_shape(wrapped, x, state)
                shapes[name] = [t.shape for t in taps]
        except Exception as e:  # pragma: no cover
            errs.append((name, e))

    threads = [
        threading.Thread(target=run, args=("w24", w24)),
        threading.Thread(target=run, args=("w13", w13)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert shapes["w24"] == [(1, 8, 8, 128), (1, 2, 2, 512)]
    assert shapes["w13"] == [(1, 16, 16, 64), (1, 4, 4, 256)]


def seg_check(tmodel, build_ours, size=96, num_classes=7, atol=1e-4):
    torch.manual_seed(0)
    tmodel.eval()
    model, state = build_ours()
    model, state = _import(tmodel, model, state)
    model = tree_inference(model, True)
    x = np.random.RandomState(1).randn(1, 3, size, size).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x))
    out, _ = jax.jit(model.__call__)(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), state)
    return out, ref


def test_fcn_resnet50_parity():
    t = torch_refs4.TorchSimpleSeg(torch_refs4.TorchFCNHead, num_classes=7)
    out, ref = seg_check(
        t,
        lambda: _fcn.fcn(
            num_classes=7,
            intermediate_layers=lambda m: [m.layer3, m.layer4],
            aux_in_channels=1024,
        ),
    )
    (aux, main) = out
    np.testing.assert_allclose(np.transpose(np.asarray(main), (0, 3, 1, 2)), ref[1].numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.transpose(np.asarray(aux), (0, 3, 1, 2)), ref[0].numpy(), atol=1e-4, rtol=1e-4)


def test_deeplabv3_resnet50_parity():
    t = torch_refs4.TorchSimpleSeg(torch_refs4.TorchDeepLabHead, num_classes=7)
    out, ref = seg_check(
        t,
        lambda: _dl.deeplabv3(
            num_classes=7,
            intermediate_layers=lambda m: [m.layer3, m.layer4],
            aux_in_channels=1024,
        ),
    )
    (aux, main) = out
    np.testing.assert_allclose(np.transpose(np.asarray(main), (0, 3, 1, 2)), ref[1].numpy(), atol=1e-4, rtol=1e-4)


def test_lraspp_parity():
    t = torch_refs4.TorchLRASPP(num_classes=7)
    out, ref = seg_check(t, lambda: _lraspp.lraspp_mobilenet_v3_large(num_classes=7))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref.numpy(), atol=1e-4, rtol=1e-4)


def test_fcn_arity_validation():
    import pytest

    with pytest.raises(ValueError):
        _fcn.fcn(intermediate_layers=lambda m: [m.layer3, m.layer4], aux_in_channels=None)
    with pytest.raises(ValueError):
        _fcn.fcn(intermediate_layers=lambda m: [m.layer4], aux_in_channels=1024)
