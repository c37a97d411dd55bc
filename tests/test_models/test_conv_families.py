"""End-to-end parity vs torch twins: VGG, SqueezeNet, DenseNet,
GoogLeNet, ShuffleNetV2 (reference golden strategy, SURVEY.md §4)."""
import os
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

import importlib

from eqxvision_tpu.core import tree_inference

_densenet = importlib.import_module("eqxvision_tpu.models.classification.densenet")
_googlenet = importlib.import_module("eqxvision_tpu.models.classification.googlenet")
_shufflenet = importlib.import_module("eqxvision_tpu.models.classification.shufflenetv2")
_squeezenet = importlib.import_module("eqxvision_tpu.models.classification.squeezenet")
_vgg = importlib.import_module("eqxvision_tpu.models.classification.vgg")
from eqxvision_tpu.weights.torch_import import import_torch_weights

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import torch_refs


def check_parity(tmodel, build_ours, size=64, batch=2, atol=1e-4):
    torch.manual_seed(0)
    tmodel.eval()
    model, state = build_ours()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    model, state = import_torch_weights(model, sd, state)
    model = tree_inference(model, True)
    x = np.random.RandomState(0).randn(batch, 3, size, size).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    ours, _ = jax.jit(model.__call__)(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), state)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=atol, rtol=1e-4)


def test_vgg11_parity():
    check_parity(torch_refs.torch_vgg("A"), lambda: _vgg.vgg11(), size=64)


def test_vgg11_bn_parity():
    check_parity(torch_refs.torch_vgg("A", batch_norm=True), lambda: _vgg.vgg11_bn(), size=64)


def test_vgg11_parity_224():
    """Full eval geometry: 224 exercises the 7x7 adaptive-pool bins the
    64-px case collapses to 2x2 (VERDICT.md r1 weak #6 — the reference's
    actual eval resolution; its classifier bug lived exactly here)."""
    check_parity(torch_refs.torch_vgg("A"), lambda: _vgg.vgg11(), size=224, batch=1)


def test_squeezenet1_0_parity():
    check_parity(torch_refs.TorchSqueezeNet("1_0"), lambda: _squeezenet.squeezenet1_0(), size=224, batch=1)


def test_squeezenet1_1_parity():
    check_parity(torch_refs.TorchSqueezeNet("1_1"), lambda: _squeezenet.squeezenet1_1(), size=224, batch=1)


def test_densenet121_parity():
    check_parity(torch_refs.TorchDenseNet(), lambda: _densenet.densenet121(), size=64)


def test_googlenet_parity():
    check_parity(
        torch_refs.TorchGoogLeNet(transform_input=True),
        lambda: _googlenet.googlenet(aux_logits=True, transform_input=True),
        size=224,
        batch=1,
    )


def test_googlenet_train_returns_aux():
    model, state = _googlenet.googlenet(num_classes=5)
    x = jnp.zeros((2, 224, 224, 3))
    out, _ = model(x, state, key=jax.random.PRNGKey(0))
    logits, aux2, aux1 = out
    assert logits.shape == (2, 5) and aux2.shape == (2, 5) and aux1.shape == (2, 5)


def test_shufflenet_v2_x0_5_parity():
    check_parity(
        torch_refs.TorchShuffleNetV2((4, 8, 4), (24, 48, 96, 192, 1024)),
        lambda: _shufflenet.shufflenet_v2_x0_5(),
        size=64,
    )


def test_shufflenet_v2_x1_0_parity():
    check_parity(
        torch_refs.TorchShuffleNetV2((4, 8, 4), (24, 116, 232, 464, 1024)),
        lambda: _shufflenet.shufflenet_v2_x1_0(),
        size=64,
    )
