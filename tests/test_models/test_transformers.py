"""End-to-end parity vs torch twins: ConvNeXt, ViT (DINO-style), Swin
v1/v2 — including Swin's dynamic-padding path on non-multiple inputs
(which the reference refused to handle, SURVEY.md §8.9)."""
import os
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.models.classification import convnext as _cnx
from eqxvision_tpu.models.classification import swin as _swin
from eqxvision_tpu.models.classification import vit as _vit
from eqxvision_tpu.weights.torch_import import import_torch_weights

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import torch_refs3


def check_parity(tmodel, build_ours, size=64, batch=2, atol=1e-4, skip=()):
    torch.manual_seed(0)
    tmodel.eval()
    model, state = build_ours()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    model, state = import_torch_weights(model, sd, state, skip_patterns=skip)
    model = tree_inference(model, True)
    x = np.random.RandomState(0).randn(batch, 3, size, size).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    ours, _ = jax.jit(model.__call__)(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), state)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=atol, rtol=1e-4)
    return model, state


def test_convnext_tiny_parity():
    setting = ((48, 96, 2), (96, 192, 2), (192, None, 2))
    ours_setting = [
        _cnx._CNBlockConfig(48, 96, 2),
        _cnx._CNBlockConfig(96, 192, 2),
        _cnx._CNBlockConfig(192, None, 2),
    ]
    check_parity(
        torch_refs3.TorchConvNeXtTwin(setting),
        lambda: (lambda m: (m, {}))(_cnx.ConvNeXt(ours_setting)),
        size=64,
    )


def test_vit_parity_and_attention_api():
    t = torch_refs3.TorchViT(img_size=64, patch=16, dim=192, depth=4, heads=3, num_classes=10)
    model, state = check_parity(
        t,
        lambda: (lambda m: (m, {}))(
            _vit.VisionTransformer(img_size=64, patch_size=16, embed_dim=192, depth=4, num_heads=3, num_classes=10)
        ),
        size=64,
    )
    # attention-map extraction API (reference vit.py:275-292)
    x = jnp.zeros((2, 64, 64, 3))
    probs = model.get_last_self_attention(x)
    assert probs.shape == (2, 3, 17, 17)  # 16 patches + cls
    np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), 1.0, atol=1e-5)


def test_vit_dino_feature_mode():
    """num_classes=0 -> feature extractor, DINO checkpoint shape."""
    t = torch_refs3.TorchViT(img_size=32, patch=16, dim=96, depth=2, heads=3, num_classes=0)
    check_parity(
        t,
        lambda: (lambda m: (m, {}))(
            _vit.VisionTransformer(img_size=32, patch_size=16, embed_dim=96, depth=2, num_heads=3, num_classes=0)
        ),
        size=32,
    )


def test_vit_dino_patch8_parity():
    """patch_size=8 import path (VERDICT r4 #9): weights/urls.py lists
    the DINO patch-8 checkpoints (vit_small/base_patch8_224_dino) and
    the vit factories accept patch_size=8, but no twin previously
    exercised the 8px pos-embed grid through the importer. 48px/8 ->
    6x6 grid, 37 tokens; feature mode = the DINO checkpoint shape."""
    t = torch_refs3.TorchViT(img_size=48, patch=8, dim=96, depth=2, heads=3, num_classes=0)
    model, state = check_parity(
        t,
        lambda: (lambda m: (m, {}))(
            _vit.VisionTransformer(img_size=48, patch_size=8, embed_dim=96, depth=2, num_heads=3, num_classes=0)
        ),
        size=48,
    )
    assert model.pos_embed.shape == (1, 37, 96)
    # attention-map extraction works on the 8px grid too
    probs = model.get_last_self_attention(jnp.zeros((1, 48, 48, 3)))
    assert probs.shape == (1, 3, 37, 37)


def test_vit_factory_patch8_builds_dino_grid():
    """vit_small(patch_size=8): the real DINO p8 shape — 784 patches +
    cls = 785 tokens at 224 (weights/urls.py vit_small_patch8_224_dino)."""
    model, _ = _vit.vit_small(patch_size=8)
    assert model.pos_embed.shape == (1, 785, 384)
    assert model.patch_embed.num_patches == 784


def _small_swin(v2):
    t = torch_refs3.TorchSwin(patch=4, dim=24, depths=(1, 1, 2), heads=(2, 4, 8), window=(7, 7), num_classes=11, v2=v2)
    block = None
    downsample = _swin._PatchMerging
    if v2:
        import functools

        block = functools.partial(_swin._SwinTransformerBlockV2, attn_layer=_swin._ShiftedWindowAttentionV2)
        downsample = _swin._PatchMergingV2
    ours = _swin.SwinTransformer(
        patch_size=(4, 4), embed_dim=24, depths=(1, 1, 2), num_heads=(2, 4, 8),
        window_size=(7, 7), num_classes=11, block=block, downsample_layer=downsample,
    )
    return t, ours


def test_swin_v1_parity_with_dynamic_padding():
    # 64/4 = 16 feature map, window 7 -> needs padding (reference failed here)
    t, ours = _small_swin(v2=False)
    check_parity(t, lambda: (ours, {}), size=64, skip=_swin.SWIN_SKIP_PATTERNS)


def test_swin_v2_parity():
    t, ours = _small_swin(v2=True)
    check_parity(t, lambda: (ours, {}), size=64, skip=_swin.SWIN_SKIP_PATTERNS)


def test_swin_t_factory_runs():
    model, state = _swin.swin_t(num_classes=7)
    model = tree_inference(model, True)
    y, _ = model(jnp.zeros((1, 224, 224, 3)), state)
    assert y.shape == (1, 7)


def _swin_v2_variant_parity(dim, heads, build):
    """Exact-variant swin_v2 twin (VERDICT r3 #5): the s/b manifests
    were derived in round 3 without a runnable torch cross-check of the
    full registration order (logit_scale -> buffers -> qkv/proj ->
    cpb_mlp per torchvision ShiftedWindowAttentionV2)."""
    t = torch_refs3.TorchSwin(
        patch=4, dim=dim, depths=(2, 2, 18, 2), heads=heads, window=(8, 8),
        num_classes=13, v2=True,
    )
    check_parity(t, lambda: build(num_classes=13), size=64, skip=_swin.SWIN_SKIP_PATTERNS)


def test_swin_v2_s_parity():
    _swin_v2_variant_parity(96, (3, 6, 12, 24), _swin.swin_v2_s)


def test_swin_v2_b_parity():
    _swin_v2_variant_parity(128, (4, 8, 16, 32), _swin.swin_v2_b)


def test_vit_resize_pos_embed():
    """resize_pos_embed adapts a ViT to a new resolution out-of-place
    (DINO/timm fine-tuning convention; the reference's PatchEmbed
    rejects non-construction sizes, reference layers/patch_embed.py:73-77)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.models import resize_pos_embed, vit_tiny

    model, state = vit_tiny(img_size=64, patch_size=16, num_classes=5)
    model = tree_inference(model, True)
    big = resize_pos_embed(model, 96)
    assert big.patch_embed.img_size == (96, 96)
    assert big.pos_embed.shape == (1, 1 + 6 * 6, 192)
    out, _ = big(jnp.zeros((2, 96, 96, 3), jnp.float32), state)
    assert out.shape == (2, 5)
    # identity when the size is unchanged (same object)
    assert resize_pos_embed(model, 64) is model
    # the original model is untouched and still runs at 64
    out64, _ = model(jnp.zeros((1, 64, 64, 3), jnp.float32), state)
    assert out64.shape == (1, 5)
    # grid interpolation matches a manual bicubic resize; cls row is kept
    pe = np.asarray(model.pos_embed)
    ref = jax.image.resize(
        jnp.asarray(pe[:, 1:].reshape(1, 4, 4, 192)), (1, 6, 6, 192), method="bicubic"
    ).reshape(1, 36, 192)
    assert np.allclose(np.asarray(big.pos_embed[:, 1:]), np.asarray(ref), atol=1e-6)
    assert np.allclose(np.asarray(big.pos_embed[:, :1]), pe[:, :1])
    # weights are shared, not copied: only pos_embed differs
    assert big.blocks[0].attn.qkv.weight is model.blocks[0].attn.qkv.weight
    # attention-map extraction still works at the new resolution
    probs = big.get_last_self_attention(jnp.zeros((1, 96, 96, 3), jnp.float32))
    assert probs.shape[-1] == 1 + 36
