"""End-to-end parity: AlexNet + ResNet family vs torch twins.

Mirrors the reference's golden-parity strategy (SURVEY.md §4) but
offline: the torch twin's random state_dict is imported and full logits
must match at atol 1e-4 — the same tolerance the reference asserted
against torchvision goldens (reference tests/test_models/test_resnet.py:24).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import importlib

from eqxvision_tpu.core import tree_inference

_alexnet = importlib.import_module("eqxvision_tpu.models.classification.alexnet")
_resnet = importlib.import_module("eqxvision_tpu.models.classification.resnet")
from eqxvision_tpu.weights.torch_import import import_torch_weights

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import torch_refs


def _numpy_sd(tmodel):
    return {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}


def check_parity(tmodel, build_ours, size=64, batch=2, atol=1e-4):
    torch.manual_seed(0)
    tmodel.eval()
    model, state = build_ours()
    model, state = import_torch_weights(model, _numpy_sd(tmodel), state)
    model = tree_inference(model, True)

    x = np.random.RandomState(0).randn(batch, 3, size, size).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    ours, _ = jax.jit(model.__call__)(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), state)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=atol, rtol=1e-4)


def test_alexnet_full_logit_parity():
    check_parity(torch_refs.TorchAlexNet(), lambda: _alexnet.alexnet(), size=224, batch=1)


def test_resnet18_full_logit_parity():
    check_parity(torch_refs.torch_resnet18(), lambda: _resnet.resnet18(), size=96)


def test_resnet50_full_logit_parity():
    check_parity(torch_refs.torch_resnet50(), lambda: _resnet.resnet50(), size=96)


def test_resnext50_full_logit_parity():
    check_parity(
        torch_refs.torch_resnext50_32x4d(),
        lambda: _resnet.resnext50_32x4d(),
        size=96,
    )


def test_resnet_dilated_backbone_parity():
    """replace_stride_with_dilation — the segmentation backbone config
    (reference resnet.py:286-303)."""
    t = torch_refs.torch_resnet50(replace_stride_with_dilation=[False, True, True])
    check_parity(
        t,
        lambda: _resnet.resnet50(replace_stride_with_dilation=[False, True, True]),
        size=96,
    )


def test_resnet_single_sample_chw_compat():
    """Reference-style unbatched (C,H,W) input works (SURVEY.md §1.1)."""
    model, state = _resnet.resnet18()
    model = tree_inference(model, True)
    x = jnp.zeros((3, 64, 64))
    y, _ = model(x, state)
    assert y.shape == (1000,)


def test_resnet_train_step_not_nan():
    """Grad smoke in the reference's test_grads.py:32-66 shape."""
    import optax

    model, state = _resnet.resnet18(num_classes=3)
    opt = optax.adam(1e-3)
    opt_state = opt.init(jax.tree_util.tree_map(lambda x: x, model))

    @jax.jit
    def step(model, state, opt_state, x, y):
        def loss_fn(m):
            logits, new_state = m(x, state, key=jax.random.PRNGKey(0))
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean(), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(model)
        updates, opt_state = opt.update(grads, opt_state)
        model = optax.apply_updates(model, updates)
        return model, new_state, opt_state, loss

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3))
    y = jnp.array([0, 1, 2, 1])
    model, state, opt_state, loss = step(model, state, opt_state, x, y)
    assert np.isfinite(float(loss))


def test_compat_batchnorm_training_contract():
    """The compat shim's BN-training contract (VERDICT r3 missing #2 /
    next-step #4): training-mode BN through CompatModel raises at trace
    time with the documented migration pointer (the reference's
    vmap(axis_name="batch") + impure-StateIndex pattern, reference
    layers/conv_norm_activation.py:73-82, has no pure-functional
    equivalent), and the documented recipe — native batched training —
    updates running stats for the same weights."""
    import optax

    from eqxvision_tpu import compat

    net = compat.resnet18(num_classes=3)
    x = jnp.zeros((3, 64, 64))
    with pytest.raises(ValueError, match="migration.md#training-batchnorm-models"):
        net(x)
    # inference mode works per the contract
    net_inf = compat.tree_inference(net, True)
    y = net_inf(x)
    assert y.shape == (3,)

    # the documented recipe: native batched (model, state) training
    from eqxvision_tpu.parallel import make_train_step

    model, state = net.core, net.state
    opt = optax.sgd(1e-2)
    step = make_train_step(opt, donate=False)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    labels = jnp.array([0, 1, 2, 1])
    _, new_state, _, loss = step(model, state, opt.init(model), imgs, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # running stats actually moved (the thing the shim cannot do purely)
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for old, new in zip(jax.tree_util.tree_leaves(dict(state)), jax.tree_util.tree_leaves(dict(new_state)))
        for a, b in [(old, new)]
    )
    assert moved
