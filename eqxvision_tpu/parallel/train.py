"""Sharded training / evaluation steps.

The reference had no trainer; its canonical step lived in a test
(reference tests/test_grads.py:32-66, SURVEY.md §3.3). Here the same
pure-functional step is built once and jitted over a device mesh:
batch sharded on 'data', params placed by the TP rules (replicated when
the 'model' axis is 1). BatchNorm statistics are plain batch-axis
reductions, so under a sharded batch XLA lowers them to ICI psums —
data-parallel *synchronized* BN with zero axis-name plumbing.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.state import State


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean cross-entropy; accepts integer labels ``(N,)`` or soft
    targets ``(N, C)`` (mixup / cutmix / smooth_labels outputs)."""
    if labels.ndim == logits.ndim:
        return optax.softmax_cross_entropy(logits, labels).mean()
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(
    optimizer,
    loss_fn: Optional[Callable] = None,
    donate: bool = True,
    compute_dtype: Optional[Any] = None,
    remat: bool = False,
    augment_fn: Optional[Callable] = None,
):
    """Build a jitted ``step(model, state, opt_state, x, y, key)``.

    ``loss_fn(logits, y) -> scalar`` defaults to softmax cross-entropy
    (integer or soft labels). ``augment_fn(key, x, y) -> (x, y)`` runs
    ON DEVICE inside the jitted step, before the forward — compose
    ``ops.imagenet_train_pipeline`` / ``ops.mixup`` / ``ops.cutmix``
    here so the host ships raw uint8 batches and every augmentation
    fuses into the step (the reference's recipe does all of this on the
    host in torchvision, reference docs/getting_started/
    Transfer_Learning.ipynb). Augmentations that mix labels return soft
    ``(N, C)`` targets; the default loss handles both.
    Works on any mesh: shard/replicate the inputs before calling (see
    mesh.shard_batch / shard_params_tp); jit propagates the shardings.

    ``compute_dtype=jnp.bfloat16`` selects mixed-precision training (the
    production TPU recipe): master params, gradients, and optimizer
    state stay f32 while the forward/backward runs in bf16 — the cast
    sits inside the differentiated function, so each grad is the bf16
    backward's output accumulated back to the f32 leaf (matmul/conv
    accumulation is f32 throughout via preferred_element_type). The
    loss is computed from f32 logits. Measured on v5e b64: resnet50
    1153 -> 2274 img/s, vit_b16 706 -> 914 (scripts/bench_train.py).

    ``remat=True`` wraps the forward in ``jax.checkpoint``: activations
    are recomputed in the backward instead of saved — trades ~1/3 more
    FLOPs for O(sqrt) activation memory, the standard lever for larger
    per-chip batches (HBM is the usual TPU bottleneck).
    """
    if loss_fn is None:
        loss_fn = softmax_cross_entropy

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def step(model, state: State, opt_state, x, y, key):
        if augment_fn is not None:
            k_aug, key = jax.random.split(key)
            x, y = augment_fn(k_aug, x, y)

        def compute(m):
            xc = x
            if compute_dtype is not None:
                from ..core.filters import cast_inexact

                m = cast_inexact(m, compute_dtype)
                xc = x.astype(compute_dtype) if jnp.issubdtype(x.dtype, jnp.inexact) else x
            fwd = lambda m_, x_: m_(x_, state, key=key)
            if remat:
                fwd = jax.checkpoint(fwd)
            logits, new_state = fwd(m, xc)
            if isinstance(logits, tuple):  # GoogLeNet-style aux outputs
                main, *aux = logits
                loss = loss_fn(main.astype(jnp.float32), y)
                for a in aux:
                    if a is not None:
                        loss = loss + 0.3 * loss_fn(a.astype(jnp.float32), y)
                return loss, new_state
            return loss_fn(logits.astype(jnp.float32), y), new_state

        if compute_dtype is not None:
            from ..core.precision import accum_precision

            # scope the whole forward+backward trace: the f32 output
            # preference on conv breaks its transpose against bf16
            # primals (core/precision.py)
            with accum_precision(None):
                (loss, new_state), grads = jax.value_and_grad(compute, has_aux=True)(model)
        else:
            (loss, new_state), grads = jax.value_and_grad(compute, has_aux=True)(model)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, new_state, opt_state, loss

    return step


def make_scan_epoch(
    optimizer,
    loss_fn: Optional[Callable] = None,
    compute_dtype: Optional[Any] = None,
    augment_fn: Optional[Callable] = None,
):
    """Compile-once multi-step training: one jitted ``lax.scan`` over a
    stacked epoch of batches — removes per-step dispatch overhead, the
    idiomatic XLA loop (no Python control flow inside jit).
    ``compute_dtype`` selects mixed precision and ``augment_fn`` the
    on-device per-batch augmentation, exactly as in make_train_step.

    ``epoch(model, state, opt_state, xs, ys, key)`` with
    xs: (steps, N, H, W, C), ys: (steps, N) -> updated triple + (steps,)
    losses.
    """
    if loss_fn is None:
        loss_fn = softmax_cross_entropy

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def epoch(model, state: State, opt_state, xs, ys, key):
        keys = jax.random.split(key, xs.shape[0])

        def body(carry, batch):
            model, state, opt_state = carry
            x, y, k = batch
            if augment_fn is not None:
                k_aug, k = jax.random.split(k)
                x, y = augment_fn(k_aug, x, y)

            def compute(m):
                xc = x
                if compute_dtype is not None:
                    from ..core.filters import cast_inexact

                    m = cast_inexact(m, compute_dtype)
                    # same inexact guard as make_train_step: never cast
                    # integer/uint8 image batches (ADVICE.md r2)
                    xc = x.astype(compute_dtype) if jnp.issubdtype(x.dtype, jnp.inexact) else x
                logits, new_state = m(xc, state, key=k)
                if isinstance(logits, tuple):
                    logits = logits[0]
                return loss_fn(logits.astype(jnp.float32), y), new_state

            if compute_dtype is not None:
                from ..core.precision import accum_precision

                with accum_precision(None):
                    (loss, new_state), grads = jax.value_and_grad(compute, has_aux=True)(model)
            else:
                (loss, new_state), grads = jax.value_and_grad(compute, has_aux=True)(model)
            updates, opt_state = optimizer.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            return (model, new_state, opt_state), loss

        (model, state, opt_state), losses = jax.lax.scan(body, (model, state, opt_state), (xs, ys, keys))
        return model, state, opt_state, losses

    return epoch


def make_eval_step(tta_fn: Optional[Callable] = None):
    """Jitted ``eval_step(model, state, x, y) -> (top1_correct, top5_correct, n)``.

    ``tta_fn(x) -> (K, N, h, w, C)`` enables test-time augmentation
    (e.g. ``functools.partial(ops.ten_crop, crop_h=224)``): the K crops
    fold into the batch for ONE model call (keeps the matmuls large for
    the MXU) and the per-crop softmax probabilities are averaged before
    top-k — the classic multi-crop protocol."""

    @jax.jit
    def eval_step(model, state: State, x, y):
        if tta_fn is not None:
            crops = tta_fn(x)
            k, n = crops.shape[:2]
            logits, _ = model(crops.reshape(k * n, *crops.shape[2:]), state)
            # f32 softmax/mean regardless of the model's compute dtype,
            # matching scripts/eval_imagenet.py — bf16 crop averaging
            # can flip top-1/top-5 on near-tied classes (ADVICE r4).
            logits = logits.astype(jnp.float32)
            logits = jax.nn.softmax(logits, -1).reshape(k, n, -1).mean(0)
        else:
            logits, _ = model(x, state)
        top1 = (jnp.argmax(logits, -1) == y).sum()
        top5_preds = jax.lax.top_k(logits, 5)[1]
        top5 = (top5_preds == y[:, None]).any(-1).sum()
        return top1, top5, y.shape[0]

    return eval_step


def evaluate(model, state: State, batches, *, eval_step=None) -> Tuple[float, float]:
    """Aggregate top-1/top-5 over an iterable of (x, y) batches."""
    if eval_step is None:
        eval_step = make_eval_step()
    c1 = c5 = n = 0
    for x, y in batches:
        t1, t5, bn = eval_step(model, state, x, y)
        c1 += int(t1)
        c5 += int(t5)
        n += int(bn)
    return c1 / max(n, 1), c5 / max(n, 1)
