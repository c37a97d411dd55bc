"""Layer-block unit tests, mirroring the reference's test_layers.py
strategy (SURVEY.md §4: shape + behavior checks)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.core.module import replace
from eqxvision_tpu import nn
from eqxvision_tpu.layers import (
    ConvNormActivation,
    DropPath,
    LayerNorm2d,
    Linear2d,
    MlpProjection,
    PatchEmbed,
    SqueezeExcitation,
)


def test_patch_embed_shapes():
    # reference tests/test_layers.py:9-17 — 224/16 -> 196 patches of 768
    pe = PatchEmbed(img_size=224, patch_size=16, embed_dim=768, key=jax.random.PRNGKey(0))
    out = pe(jnp.zeros((2, 224, 224, 3)))
    assert out.shape == (2, 196, 768)
    with pytest.raises(ValueError):
        pe(jnp.zeros((2, 256, 256, 3)))


def test_patch_embed_no_flatten():
    pe = PatchEmbed(img_size=32, patch_size=8, embed_dim=16, flatten=False, key=jax.random.PRNGKey(0))
    assert pe(jnp.zeros((1, 32, 32, 3))).shape == (1, 4, 4, 16)


def test_mlp_projection():
    mlp = MlpProjection(8, 32, 12, key=jax.random.PRNGKey(0))
    assert mlp(jnp.zeros((5, 8))).shape == (5, 12)
    # Linear2d variant operates positionwise on NHWC maps
    mlp2 = MlpProjection(8, 32, 12, lin_layer=Linear2d, key=jax.random.PRNGKey(0))
    assert mlp2(jnp.zeros((2, 4, 4, 8))).shape == (2, 4, 4, 12)


def test_drop_path_modes():
    # reference tests/test_layers.py:37-68
    x = jnp.ones((8, 4, 4, 3))
    dp = DropPath(p=1.0, mode="global")
    out = dp(x, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), 0.0)  # p=1 drops everything

    dp_inf = replace(dp, inference=True)
    np.testing.assert_array_equal(np.asarray(dp_inf(x)), np.asarray(x))

    dp0 = DropPath(p=0.0)
    np.testing.assert_array_equal(np.asarray(dp0(x)), np.asarray(x))

    with pytest.raises(RuntimeError):
        DropPath(p=0.5)(x)  # no key while training

    # global mode: whole samples survive or die together
    dp = DropPath(p=0.5, mode="global")
    out = np.asarray(dp(x, key=jax.random.PRNGKey(1)))
    per_sample = out.reshape(8, -1)
    for row in per_sample:
        assert np.all(row == 0) or np.all(row == row[0])

    # local mode: per (sample, channel)
    dp = DropPath(p=0.5, mode="local")
    out = np.asarray(dp(x, key=jax.random.PRNGKey(2)))
    per_chan = out.reshape(8, 16, 3)
    for s in range(8):
        for c in range(3):
            col = per_chan[s, :, c]
            assert np.all(col == 0) or np.all(col == col[0])


def test_squeeze_excitation_gates_channels():
    se = SqueezeExcitation(8, 2, key=jax.random.PRNGKey(0))
    x = jnp.ones((2, 5, 5, 8))
    out = se(x)
    assert out.shape == x.shape
    # gate in (0, 1) times input
    assert np.all(np.asarray(out) <= np.asarray(x) + 1e-6)


def test_conv_norm_activation_shapes_and_state():
    cna = ConvNormActivation(3, 16, kernel_size=3, stride=2, key=jax.random.PRNGKey(0))
    state = {cna.norm.index: cna.norm.initial_state()}
    y, state = cna(jnp.ones((2, 8, 8, 3)), state)
    assert y.shape == (2, 4, 4, 16)
    assert np.all(np.asarray(y) >= 0)  # relu applied
    # bias defaults off when a norm layer is present
    assert cna.conv.bias is None
    cna2 = ConvNormActivation(3, 16, norm_layer=None, key=jax.random.PRNGKey(0))
    assert cna2.conv.bias is not None


def test_layernorm2d_is_channelwise():
    ln = LayerNorm2d(6, eps=1e-6)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 3, 6))
    out = np.asarray(ln(x))
    # normalized over the channel axis at every position
    np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(-1), 1.0, atol=1e-2)
