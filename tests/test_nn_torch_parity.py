"""Layer-level numerical parity against torch.nn.functional.

The reference proved parity with golden torchvision outputs fetched over
the network (SURVEY.md §4); this environment has no egress, so parity is
established layer-by-layer against torch's own CPU kernels at atol 1e-5
— a strictly stronger per-op check than end-to-end logits at 1e-4.
Inputs are NHWC on our side, NCHW on torch's; weights are converted with
the same transforms the checkpoint importer uses.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from eqxvision_tpu import nn
from eqxvision_tpu.core.module import replace

ATOL = 2e-5


def to_nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def from_nhwc(y: jnp.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


def rand(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil,groups",
    [
        (3, 8, 3, 1, 1, 1, 1),
        (3, 16, 7, 2, 3, 1, 1),
        (8, 8, 3, 1, 2, 2, 1),      # dilated
        (8, 8, 3, 1, 1, 1, 8),      # depthwise
        (8, 16, 1, 1, 0, 1, 4),     # grouped pointwise
        (3, 8, 11, 4, 2, 1, 1),     # alexnet stem geometry
        (3, 64, 7, 2, 3, 1, 1),     # resnet stem -> space-to-depth path
        (3, 24, 3, 2, 1, 1, 1),     # mobile stem -> space-to-depth path
        (3, 16, 5, 2, 2, 1, 1),     # even-padding stride-2 stem
    ],
)
def test_conv2d_matches_torch(cin, cout, k, stride, pad, dil, groups):
    x = rand(2, cin, 17, 19)
    w = rand(cout, cin // groups, k, k)
    b = rand(cout)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride, pad, dil, groups).numpy()

    conv = nn.Conv2d(cin, cout, k, stride, pad, dil, groups, key=jax.random.PRNGKey(0))
    conv = replace(
        conv,
        weight=jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        bias=jnp.asarray(b),
    )
    out = from_nhwc(conv(to_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=ATOL, rtol=1e-5)


@pytest.mark.parametrize(
    "k,stride,pad,ceil",
    [(3, 2, 0, False), (3, 2, 0, True), (3, 2, 1, True), (2, 2, 0, False), (3, 1, 1, False), (5, 3, 2, True)],
)
def test_maxpool_matches_torch(k, stride, pad, ceil):
    x = rand(2, 4, 21, 17)
    ref = F.max_pool2d(torch.from_numpy(x), k, stride, pad, ceil_mode=ceil).numpy()
    pool = nn.MaxPool2d(k, stride, pad, use_ceil=ceil)
    out = from_nhwc(pool(to_nhwc(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=ATOL)


@pytest.mark.parametrize(
    "k,stride,pad,ceil",
    [(2, 2, 0, False), (3, 2, 1, False), (3, 2, 1, True), (2, 2, 0, True)],
)
def test_avgpool_matches_torch(k, stride, pad, ceil):
    x = rand(2, 4, 21, 17)
    ref = F.avg_pool2d(torch.from_numpy(x), k, stride, pad, ceil_mode=ceil).numpy()
    pool = nn.AvgPool2d(k, stride, pad, use_ceil=ceil)
    out = from_nhwc(pool(to_nhwc(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=ATOL)


@pytest.mark.parametrize("insize,outsize", [(7, 7), (14, 7), (6, 6), (13, 6), (10, 1), (9, 4)])
def test_adaptive_avgpool_matches_torch(insize, outsize):
    x = rand(2, 5, insize, insize + 2)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), outsize).numpy()
    out = from_nhwc(nn.AdaptiveAvgPool2d(outsize)(to_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=ATOL)


def test_linear_matches_torch():
    x = rand(4, 37)
    w = rand(11, 37)
    b = rand(11)
    ref = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    lin = nn.Linear(37, 11, key=jax.random.PRNGKey(0))
    lin = replace(lin, weight=jnp.asarray(w.T), bias=jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(lin(jnp.asarray(x))), ref, atol=ATOL)


def test_batchnorm_train_and_eval_match_torch():
    c = 6
    x = rand(4, c, 9, 9)
    tbn = torch.nn.BatchNorm2d(c, eps=1e-3, momentum=0.05)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rand(c)))
        tbn.bias.copy_(torch.from_numpy(rand(c)))

    bn = nn.BatchNorm(c, eps=1e-3, momentum=0.05)
    bn = replace(bn, weight=jnp.asarray(tbn.weight.detach().numpy()), bias=jnp.asarray(tbn.bias.detach().numpy()))
    state = {bn.index: bn.initial_state()}

    # two training steps: outputs and running-stat evolution must match
    for step in range(2):
        xs = x + step
        tbn.train()
        ref = tbn(torch.from_numpy(xs)).detach().numpy()
        y, state = bn(to_nhwc(xs), state)
        np.testing.assert_allclose(from_nhwc(y), ref, atol=1e-4)

    rm, rv = state[bn.index]
    np.testing.assert_allclose(np.asarray(rm), tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rv), tbn.running_var.numpy(), atol=1e-5)

    # eval mode uses running stats
    tbn.eval()
    ref = tbn(torch.from_numpy(x)).detach().numpy()
    bn_inf = replace(bn, inference=True)
    y, _ = bn_inf(to_nhwc(x), state)
    np.testing.assert_allclose(from_nhwc(y), ref, atol=1e-4)


def test_layernorm_matches_torch():
    x = rand(3, 17, 29)
    tln = torch.nn.LayerNorm(29, eps=1e-6)
    with torch.no_grad():
        tln.weight.copy_(torch.from_numpy(rand(29)))
        tln.bias.copy_(torch.from_numpy(rand(29)))
    ref = tln(torch.from_numpy(x)).detach().numpy()
    ln = nn.LayerNorm(29, eps=1e-6)
    ln = replace(ln, weight=jnp.asarray(tln.weight.detach().numpy()), bias=jnp.asarray(tln.bias.detach().numpy()))
    np.testing.assert_allclose(np.asarray(ln(jnp.asarray(x))), ref, atol=ATOL)


def test_groupnorm_matches_torch():
    x = rand(2, 8, 5, 5)
    tgn = torch.nn.GroupNorm(4, 8, eps=1e-5)
    with torch.no_grad():
        tgn.weight.copy_(torch.from_numpy(rand(8)))
        tgn.bias.copy_(torch.from_numpy(rand(8)))
    ref = tgn(torch.from_numpy(x)).detach().numpy()
    gn = nn.GroupNorm(4, 8)
    gn = replace(gn, weight=jnp.asarray(tgn.weight.detach().numpy()), bias=jnp.asarray(tgn.bias.detach().numpy()))
    np.testing.assert_allclose(from_nhwc(gn(to_nhwc(x))), ref, atol=ATOL)


@pytest.mark.parametrize(
    "ours,theirs",
    [
        (nn.relu, F.relu),
        (nn.relu6, F.relu6),
        (nn.hard_swish, F.hardswish),
        (nn.hard_sigmoid, F.hardsigmoid),
        (nn.silu, F.silu),
        (nn.gelu, F.gelu),  # torch default = exact erf
        (nn.sigmoid, torch.sigmoid),
    ],
)
def test_activations_match_torch(ours, theirs):
    x = np.linspace(-6, 6, 101, dtype=np.float32)
    ref = theirs(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours(jnp.asarray(x))), ref, atol=1e-6)


def test_dropout_inference_and_scaling():
    x = jnp.ones((1000,))
    d = nn.Dropout(0.3)
    y = d(x, key=jax.random.PRNGKey(0))
    assert abs(float(jnp.mean(y)) - 1.0) < 0.1
    assert set(np.unique(np.asarray(y))) <= {0.0, np.float32(1 / 0.7)}
    d_inf = replace(d, inference=True)
    np.testing.assert_array_equal(np.asarray(d_inf(x)), np.asarray(x))
    with pytest.raises(RuntimeError):
        d(x)


def test_batchnorm_one_pass_large_mean_channel():
    """ADVICE r3 (low): the one-pass E[x^2]-E[x]^2 variance cancelled
    catastrophically (~24% relative var error) for near-constant
    channels with |mean|/std ~ 1000. The first-element shift
    (nn/norm.py) removes the cancellation without a second pass; this
    pins variance accuracy and torch parity in that regime."""
    c = 4
    rng = np.random.RandomState(0)
    # per-channel means 0, 10, -1000, 1000 with unit/tiny stds
    means = np.array([0.0, 10.0, -1000.0, 1000.0], np.float32)
    stds = np.array([1.0, 0.5, 1.0, 0.01], np.float32)
    x = (rng.randn(8, c, 7, 7).astype(np.float32) * stds.reshape(1, c, 1, 1)
         + means.reshape(1, c, 1, 1))

    tbn = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=1.0)
    tbn.train()
    ref = tbn(torch.from_numpy(x)).detach().numpy()

    # momentum=1.0 so the running var IS the unbiased batch variance
    # (an EMA unwrap would re-amplify f32 storage rounding of 0.9+eps)
    bn = nn.BatchNorm(c, eps=1e-5, momentum=1.0)
    state = {bn.index: bn.initial_state()}
    y, state = bn(to_nhwc(x), state)
    np.testing.assert_allclose(from_nhwc(y), ref, atol=5e-3)
    # running var against the exact (two-pass, f64) unbiased variance
    exact = x.astype(np.float64).transpose(1, 0, 2, 3).reshape(c, -1).var(axis=1, ddof=1)
    _, rv = state[bn.index]
    np.testing.assert_allclose(np.asarray(rv), exact, rtol=1e-3)
