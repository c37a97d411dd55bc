"""Gradient smoke tests: one optimizer step per family, loss finite —
the reference's de-facto backward gate (reference tests/test_grads.py:
11-66), on the batched core API with BN state threading."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from eqxvision_tpu.models import create_model
from eqxvision_tpu.parallel import make_train_step

# full family sweep (the reference gates 17 factories, reference
# tests/test_grads.py:11-29); one per family plus structurally distinct
# variants (aux heads, BN-free classifiers, SE blocks, v2 fused-MBConv)
FACTORIES = [
    ("alexnet", {}),
    ("vgg11", {}),
    ("vgg11_bn", {}),
    ("resnet18", {}),
    ("densenet121", {}),
    ("googlenet", {"aux_logits": True}),
    ("squeezenet1_0", {}),
    ("shufflenet_v2_x0_5", {}),
    ("mobilenet_v2", {}),
    ("mobilenet_v3_small", {}),
    ("efficientnet_b0", {}),
    ("efficientnet_v2_s", {}),
    ("regnet_y_400mf", {}),
    ("convnext_tiny", {}),
    ("vit_tiny", {"img_size": 64}),
    ("swin_t", {}),
    ("swin_v2_t", {}),
]


@pytest.mark.parametrize("name,kwargs", FACTORIES, ids=[f[0] for f in FACTORIES])
def test_one_train_step_finite(name, kwargs):
    size = 64
    model, state = create_model(name, num_classes=3, **kwargs)
    opt = optax.adam(1e-4)
    opt_state = opt.init(jax.tree_util.tree_map(lambda x: x, model))
    step = make_train_step(opt, donate=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, size, size, 3)) * 0.1
    y = jnp.array([0, 1])
    model, state, opt_state, loss = step(model, state, opt_state, x, y, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), f"{name}: loss not finite"
