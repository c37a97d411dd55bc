"""Mesh-sharded execution tests on the 8-device CPU-emulated mesh —
the multi-chip stand-in (SURVEY.md §4 rebuild plan)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from eqxvision_tpu.core import tree_inference
from eqxvision_tpu.models.classification import resnet as _resnet
from eqxvision_tpu.models.classification import vit as _vit
from eqxvision_tpu.parallel import (
    make_eval_step,
    make_mesh,
    make_train_step,
    replicate,
    shard_batch,
    shard_params_tp,
)

needs_multi = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_multi
def test_data_parallel_inference_matches_single_device():
    model, state = _resnet.resnet18(num_classes=13)
    model = tree_inference(model, True)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 64, 64, 3))

    ref, _ = jax.jit(model.__call__)(x, state)

    mesh = make_mesh(data=8)
    xs = shard_batch(x, mesh)
    ms = replicate(model, mesh)
    ss = replicate(state, mesh)
    out, _ = jax.jit(ms.__call__)(xs, ss)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


@needs_multi
def test_sharded_batchnorm_stats_are_global():
    """BN batch statistics must be identical whether the batch lives on
    one device or is sharded over 8 — the psum-under-the-hood property
    replacing the reference's axis_name='batch' pmean contract."""
    from eqxvision_tpu import nn

    bn = nn.BatchNorm(4)
    state = {bn.index: bn.initial_state()}
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 6, 6, 4))

    y_ref, st_ref = jax.jit(bn.__call__)(x, state)
    mesh = make_mesh(data=8)
    xs = shard_batch(x, mesh)
    y_sh, st_sh = jax.jit(bn.__call__)(xs, replicate(state, mesh))
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_sh[bn.index][0]), np.asarray(st_ref[bn.index][0]), atol=1e-6
    )


@needs_multi
def test_dp_tp_train_step_runs_and_matches_dp_only():
    """ViT train step on a (4 data x 2 model) mesh: TP-sharded qkv/mlp
    params, XLA-inserted collectives; loss must match the unsharded
    step."""
    model = _vit.VisionTransformer(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4, num_classes=5
    )
    state = {}
    opt = optax.sgd(0.1)
    opt_state = opt.init(jax.tree_util.tree_map(lambda x: x, model))
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3))
    y = jnp.arange(8) % 5
    key = jax.random.PRNGKey(3)

    step = make_train_step(opt, donate=False)
    _, _, _, loss_ref = step(model, state, opt_state, x, y, key)

    mesh = make_mesh(data=4, model=2)
    ms = shard_params_tp(model, mesh)
    os_ = shard_params_tp(opt_state, mesh)
    xs = shard_batch(x, mesh)
    ys = shard_batch(y, mesh)
    m2, s2, o2, loss_sh = step(ms, replicate(state, mesh), os_, xs, ys, key)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), atol=1e-5)
    # params stay sharded after the step
    qkv = m2.blocks[0].attn.qkv.weight
    assert len(qkv.sharding.device_set) == 8


@needs_multi
def test_dp_tp_swin_train_step_matches_dp_only():
    """Swin train step on a (4 data x 2 model) mesh: the TP rules also
    match Swin's attn.qkv / mlp.fc1-fc2 paths (parallel/mesh.py
    _TP_RULES); loss must match the unsharded step."""
    from eqxvision_tpu.models.classification.swin import SwinTransformer

    model = SwinTransformer(
        patch_size=(4, 4), embed_dim=32, depths=(1, 1), num_heads=(2, 4),
        window_size=(4, 4), num_classes=5, key=jax.random.PRNGKey(0),
    )
    state = {}
    opt = optax.sgd(0.1)
    opt_state = opt.init(jax.tree_util.tree_map(lambda x: x, model))
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3))
    y = jnp.arange(8) % 5
    key = jax.random.PRNGKey(3)

    step = make_train_step(opt, donate=False)
    _, _, _, loss_ref = step(model, state, opt_state, x, y, key)

    mesh = make_mesh(data=4, model=2)
    ms = shard_params_tp(model, mesh)
    os_ = shard_params_tp(opt_state, mesh)
    xs = shard_batch(x, mesh)
    ys = shard_batch(y, mesh)
    m2, _, _, loss_sh = step(ms, replicate(state, mesh), os_, xs, ys, key)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), atol=1e-5)
    qkv = m2.features.layers[1].layers[0].attn.qkv.weight
    assert len(qkv.sharding.device_set) == 8


@needs_multi
def test_eval_step_sharded():
    model, state = _resnet.resnet18(num_classes=10)
    model = tree_inference(model, True)
    mesh = make_mesh(data=8)
    x = shard_batch(jax.random.normal(jax.random.PRNGKey(0), (16, 64, 64, 3)), mesh)
    y = shard_batch(jnp.zeros(16, jnp.int32), mesh)
    t1, t5, n = make_eval_step()(replicate(model, mesh), replicate(state, mesh), x, y)
    assert int(n) == 16 and 0 <= int(t1) <= int(t5) <= 16


def test_mixed_precision_train_step():
    """compute_dtype=bf16: fwd/bwd in bf16, master params/grads/opt
    state stay f32, loss tracks the f32 step."""
    model = _vit.VisionTransformer(
        img_size=16, patch_size=16, embed_dim=32, depth=1, num_heads=2, num_classes=3
    )
    opt = optax.sgd(0.1)
    opt_state = opt.init(jax.tree_util.tree_map(lambda x: x, model))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    y = jnp.arange(4) % 3
    key = jax.random.PRNGKey(1)

    step32 = make_train_step(opt, donate=False)
    _, _, _, loss32 = step32(model, {}, opt_state, x, y, key)
    step16 = make_train_step(opt, donate=False, compute_dtype=jnp.bfloat16)
    m2, _, o2, loss16 = step16(model, {}, opt_state, x, y, key)

    assert m2.blocks[0].attn.qkv.weight.dtype == jnp.float32
    leaves = jax.tree_util.tree_leaves(o2)
    assert all(l.dtype != jnp.bfloat16 for l in leaves if hasattr(l, "dtype"))
    np.testing.assert_allclose(float(loss16), float(loss32), rtol=0.05)
    # updates actually happened
    assert not np.allclose(
        np.asarray(m2.blocks[0].attn.qkv.weight),
        np.asarray(model.blocks[0].attn.qkv.weight),
    )


def test_train_step_on_device_augment_fn():
    """augment_fn hook: uint8 batch -> on-device pipeline + mixup soft
    labels, all inside the jitted step; the default loss must accept
    the (N, C) targets and updates must happen."""
    from eqxvision_tpu import ops

    model = _vit.VisionTransformer(
        img_size=16, patch_size=16, embed_dim=32, depth=1, num_heads=2, num_classes=3
    )
    opt = optax.sgd(0.1)
    opt_state = opt.init(jax.tree_util.tree_map(lambda x: x, model))
    u8 = (jax.random.uniform(jax.random.PRNGKey(0), (4, 24, 24, 3)) * 255).astype(jnp.uint8)
    y = jnp.arange(4) % 3

    def aug(k, x, yy):
        k1, k2 = jax.random.split(k)
        xf = ops.imagenet_train_pipeline(k1, x, size=16)
        return ops.mixup(k2, xf, ops.smooth_labels(yy, 3, 0.1), alpha=0.2)

    step = make_train_step(opt, donate=False, augment_fn=aug)
    m2, _, _, loss = step(model, {}, opt_state, u8, y, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert not np.allclose(
        np.asarray(m2.blocks[0].attn.qkv.weight),
        np.asarray(model.blocks[0].attn.qkv.weight),
    )

    # same hook through the scan-epoch path (stacked integer labels)
    from eqxvision_tpu.parallel import make_scan_epoch

    epoch = make_scan_epoch(opt, augment_fn=aug)
    xs = jnp.stack([u8, u8])
    ys = jnp.stack([y, y])
    _, _, _, losses = epoch(model, {}, opt_state, xs, ys, jax.random.PRNGKey(2))
    assert losses.shape == (2,) and np.isfinite(np.asarray(losses)).all()


def test_eval_step_ten_crop_tta():
    """tta_fn folds the K crops into the batch and averages softmax;
    with a deterministic model, equal-crop inputs must reproduce the
    plain eval decision."""
    import functools

    from eqxvision_tpu import ops

    model, state = _resnet.resnet18(num_classes=7)
    model = tree_inference(model, True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 40, 3))
    y = jnp.array([1, 2])
    tta = functools.partial(ops.ten_crop, crop_h=32)
    t1, t5, n = make_eval_step(tta_fn=tta)(model, state, x, y)
    assert int(n) == 2 and 0 <= int(t1) <= int(t5) <= 2
    # constant-over-crops input: TTA must agree exactly with plain eval
    xc = jnp.broadcast_to(x[:, :1, :1, :], (2, 40, 40, 3))
    plain = make_eval_step()(model, state, ops.center_crop(xc, 32), y)
    tta_r = make_eval_step(tta_fn=tta)(model, state, xc, y)
    assert int(plain[0]) == int(tta_r[0]) and int(plain[1]) == int(tta_r[1])


def test_remat_train_step_matches():
    """remat=True (jax.checkpoint forward) must produce the identical
    loss and updates — it only changes the memory/recompute schedule."""
    model = _vit.VisionTransformer(
        img_size=16, patch_size=16, embed_dim=32, depth=1, num_heads=2, num_classes=3
    )
    opt = optax.sgd(0.1)
    opt_state = opt.init(jax.tree_util.tree_map(lambda x: x, model))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    y = jnp.arange(4) % 3
    key = jax.random.PRNGKey(1)

    m_a, _, _, loss_a = make_train_step(opt, donate=False)(model, {}, opt_state, x, y, key)
    m_b, _, _, loss_b = make_train_step(opt, donate=False, remat=True)(model, {}, opt_state, x, y, key)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m_a.blocks[0].attn.qkv.weight),
        np.asarray(m_b.blocks[0].attn.qkv.weight),
        atol=1e-6,
    )


@needs_multi
def test_mixed_precision_composes_with_dp_tp():
    """compute_dtype=bf16 under a (4 data x 2 model) mesh: sharded step
    runs and loss tracks the unsharded mixed-precision step."""
    model = _vit.VisionTransformer(
        img_size=32, patch_size=16, embed_dim=64, depth=1, num_heads=4, num_classes=5
    )
    opt = optax.sgd(0.1)
    opt_state = opt.init(jax.tree_util.tree_map(lambda x: x, model))
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3))
    y = jnp.arange(8) % 5
    key = jax.random.PRNGKey(3)
    step = make_train_step(opt, donate=False, compute_dtype=jnp.bfloat16)
    _, _, _, loss_ref = step(model, {}, opt_state, x, y, key)

    mesh = make_mesh(data=4, model=2)
    m2, _, _, loss_sh = step(
        shard_params_tp(model, mesh), replicate({}, mesh), shard_params_tp(opt_state, mesh),
        shard_batch(x, mesh), shard_batch(y, mesh), key,
    )
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-2)
    assert m2.blocks[0].attn.qkv.weight.dtype == jnp.float32


def test_remat_blocks_swin_and_vit_parity():
    """Model-level per-block remat (remat_blocks=True) is a pure
    memory/schedule change: forwards must be bit-identical."""
    from eqxvision_tpu.models.classification.swin import SwinTransformer

    kwargs = dict(
        patch_size=(4, 4), embed_dim=32, depths=(1, 1), num_heads=(2, 4),
        window_size=(4, 4), num_classes=3, stochastic_depth_prob=0.0,
        key=jax.random.PRNGKey(0),
    )
    s1 = SwinTransformer(**kwargs)
    s2 = SwinTransformer(remat_blocks=True, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    np.testing.assert_allclose(
        np.asarray(s1(x, {})[0]), np.asarray(s2(x, {})[0]), atol=1e-6
    )

    v1 = _vit.VisionTransformer(img_size=16, patch_size=16, embed_dim=32, depth=2, num_heads=2, num_classes=3)
    v2 = _vit.VisionTransformer(
        img_size=16, patch_size=16, embed_dim=32, depth=2, num_heads=2, num_classes=3, remat_blocks=True
    )
    xv = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    np.testing.assert_allclose(
        np.asarray(v1(xv, {})[0]), np.asarray(v2(xv, {})[0]), atol=1e-6
    )


@needs_multi
def test_dp_tp_convnext_train_step_matches_dp_only():
    """ConvNeXt dp x tp: the pwconv1/pwconv2 TP rules shard the block
    MLPs; loss must match the unsharded step."""
    from eqxvision_tpu.models.classification.convnext import ConvNeXt, _CNBlockConfig

    model, _ = ConvNeXt(
        [_CNBlockConfig(32, 64, 2)], num_classes=5, key=jax.random.PRNGKey(0)
    ), None
    state = {}
    opt = optax.sgd(0.1)
    opt_state = opt.init(jax.tree_util.tree_map(lambda x: x, model))
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3))
    y = jnp.arange(8) % 5
    key = jax.random.PRNGKey(3)
    step = make_train_step(opt, donate=False)
    _, _, _, loss_ref = step(model, state, opt_state, x, y, key)

    mesh = make_mesh(data=4, model=2)
    m2, _, _, loss_sh = step(
        shard_params_tp(model, mesh), replicate(state, mesh), shard_params_tp(opt_state, mesh),
        shard_batch(x, mesh), shard_batch(y, mesh), key,
    )
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), atol=1e-5)


def test_scan_epoch_runs_and_learns():
    """Compile-once lax.scan epoch: losses finite and decreasing on a
    separable toy problem."""
    from eqxvision_tpu.models.classification import vit as _vit
    from eqxvision_tpu.parallel import make_scan_epoch

    model = _vit.VisionTransformer(img_size=16, patch_size=16, embed_dim=32, depth=1, num_heads=2, num_classes=2)
    opt = optax.adam(1e-2)
    opt_state = opt.init(jax.tree_util.tree_map(lambda x: x, model))
    epoch = make_scan_epoch(opt)

    steps, batch = 8, 8
    key = jax.random.PRNGKey(0)
    ys = jax.random.bernoulli(key, 0.5, (steps, batch)).astype(jnp.int32)
    # class signal baked into channel mean
    xs = jax.random.normal(key, (steps, batch, 16, 16, 3)) * 0.1 + ys[..., None, None, None] * 1.0
    model, state, opt_state, losses = epoch(model, {}, opt_state, xs, ys, key)
    losses = np.asarray(losses)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@needs_multi
def test_augmentation_pipeline_shard_invariant():
    """On-device augmentation under data-parallel sharding: the jitted
    pipeline (crop+flip+jitter, and rand_augment) must produce the SAME
    values whether the uint8 batch lives on one device or is sharded
    over the mesh — the per-image randomness is a pure function of
    (key, batch index) — and the output must stay batch-sharded (no
    implicit all-gather feeding the train step)."""
    from eqxvision_tpu import ops

    u8 = jax.random.randint(jax.random.PRNGKey(3), (16, 48, 48, 3), 0, 256, jnp.uint8)
    key = jax.random.PRNGKey(7)

    def _pipe(k, im):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        x = ops.imagenet_train_pipeline(k1, im, size=32, jitter=(0.4, 0.4, 0.4, 0.1))
        x = ops.rand_augment(k2, x, num_ops=1)
        # clamp back to the [0,1] domain the auto-aug ops expect
        x = jnp.clip(x, 0.0, 1.0)
        x = ops.auto_augment(k3, x)
        return ops.augmix(k4, x, mixture_width=2, chain_depth=1)

    pipe = jax.jit(_pipe)
    ref = pipe(key, u8)

    mesh = make_mesh(data=8)
    u8s = shard_batch(u8, mesh)
    out = pipe(key, u8s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
    # output still sharded over the data axis, one shard per device
    assert len(out.sharding.device_set) == 8
