"""Golden regression: deterministic-init logits must match the stored
fixtures (regenerate with scripts/gen_goldens.py). CPU-only — TPU f32
rounding differs slightly."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.models import create_model

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# must match scripts/gen_goldens.py SEG_KWARGS
SEG_KWARGS = {
    "fcn": {"aux_in_channels": 1024},
    "deeplabv3": {"aux_in_channels": 1024},
}

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "cpu", reason="goldens are CPU-deterministic"
)


def _input(size):
    rng = np.random.RandomState(1234)
    x = rng.rand(1, size, size, 3).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return jnp.asarray((x - mean) / std)


def _golden_names():
    if not os.path.isdir(GOLDEN_DIR):
        return []
    return sorted(f[:-4] for f in os.listdir(GOLDEN_DIR) if f.endswith(".npz"))


@pytest.mark.parametrize("name", _golden_names())
def test_golden(name):
    data = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))
    model, state = create_model(name, **SEG_KWARGS.get(name, {}))
    model = tree_inference(model, True)
    out, _ = jax.jit(model.__call__)(_input(int(data["size"])), state)
    aux = None
    if isinstance(out, tuple):  # segmentation wrapper: (aux, out)
        aux, out = out
    if "seg_sub" in data:
        # dense map pinned as strided subsample + full-tensor checksums
        # (see scripts/gen_goldens.py)
        seg = np.asarray(out, np.float64)
        np.testing.assert_allclose(
            seg[:, ::8, ::8, :].astype(np.float32), data["seg_sub"], atol=2e-4, rtol=1e-4
        )
        np.testing.assert_allclose(np.sum(seg), data["seg_sum"], rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.sum(np.abs(seg)), data["seg_abssum"], rtol=1e-5)
        if "aux_sum" in data:
            np.testing.assert_allclose(
                np.sum(np.asarray(aux, np.float64)), data["aux_sum"], rtol=1e-5, atol=1e-3
            )
    else:
        np.testing.assert_allclose(np.asarray(out), data["logits"], atol=2e-4, rtol=1e-4)
