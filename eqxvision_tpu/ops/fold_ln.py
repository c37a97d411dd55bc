"""Fold LayerNorm affine parameters into adjacent Linear weights.

Inference-time exact algebra (same family as :mod:`ops.fold_bn`): a
pre-norm transformer applies ``Linear(LN(x))`` with
``LN(x) = g * xhat + b``, so

    LN(x) @ W + c  ==  xhat @ (g[:, None] * W) + (b @ W + c)

and the LN collapses to its affine-free form (``weight=None`` — the
Pallas LN kernel then skips the scale/shift VPU ops and the gamma/beta
VMEM loads entirely, ops/layernorm.py:_ln_kernel).

Applies to the pre-norm pattern only:

- ViT blocks (norm1 -> attn.qkv, norm2 -> mlp.fc1; reference
  vit.py:79-157) and the final norm -> head pair when the head is a
  Linear (classification mode).
- ConvNeXt (reference convnext.py:16-71): block norm -> pwconv1,
  downsample LayerNorm2d -> 2x2/2 conv (padding-0, so the folded bias
  shift is exact — every conv tap reads a real LN output, never a
  padded zero), and classifier_norm -> classifier_fc (the reshape
  between them is (N,1,1,C) -> (N,C) and commutes). The stem LN
  follows its conv and is left intact.

Swin is NOT folded: v1's whole-block fused kernel consumes gamma/beta
in-kernel at negligible cost (ops/window_attention.py), and v2 is
post-norm — the affine sits after the residual branch output where it
does not commute into a following contraction.

Opt-in, like every serving transform here: apply after weight loading
and ``tree_inference``, before jit/export.

Measured on-chip (v5e, scripts/ablate_vit9.py, r5, in-process A/B with
randomized affines; parity max|dlogit| 2.2e-4 ViT / 4.8e-7 ConvNeXt
under true-f32 matmuls): **perf-neutral**. ViT-B/16 b256 65.06 ->
64.88/64.97/65.05 ms over three reps (+0.08..0.27%, within the ±0.2 ms
block-noise band); ConvNeXt-T b128 20.04 -> 20.19 ms (-0.7%, folded
slightly SLOWER — the LN affine was already fused into XLA's normalize
pass, while folding perturbs the conv/matmul epilogue fusion). Per the
kernel-dispatch policy it therefore stays opt-in serving surgery (its
value is artifact composition — e.g. landing the affine inside int8
weight quantization — not latency), and is NOT wired into any default
path. The r4 3.8 ms ViT "LN marginal" is the normalize passes
themselves (HBM-bound), not the affine.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..core.module import Module, replace
from ..nn.linear import Linear
from ..nn.norm import LayerNorm


def _fold_pair(ln: LayerNorm, lin: Linear):
    """Return (affine-free LN, Linear with the affine folded in)."""
    if ln.weight is None:
        return ln, lin
    g = ln.weight.astype(jnp.float32)
    b = ln.bias.astype(jnp.float32)
    w = lin.weight.astype(jnp.float32)  # (in, out)
    new_w = (g[:, None] * w).astype(lin.weight.dtype)
    shift = b @ w
    if lin.bias is not None:
        new_b = (lin.bias.astype(jnp.float32) + shift).astype(lin.bias.dtype)
    else:
        new_b = shift.astype(lin.weight.dtype)
    ln2 = replace(ln, weight=None, bias=None)
    lin2 = replace(lin, weight=new_w, bias=new_b)
    return ln2, lin2


def _fold_pair_conv(ln: LayerNorm, conv):
    """Return (affine-free LN, padding-0 Conv2d with the affine folded in).

    ``conv(LN(x)) == conv'(xhat)`` with ``w'[h,w,i,o] = g[i] w[h,w,i,o]``
    and ``b'[o] = b_conv[o] + sum_{h,w,i} b_ln[i] w[h,w,i,o]``. Only
    exact when the conv never reads padding (a padded zero would have
    to contribute ``b_ln``, not 0) — asserted."""
    if ln.weight is None:
        return ln, conv
    if any(p != (0, 0) for p in conv.padding) or conv.groups != 1:
        raise ValueError("LN->conv fold requires padding-0, groups=1 conv")
    g = ln.weight.astype(jnp.float32)
    b = ln.bias.astype(jnp.float32)
    w = conv.weight.astype(jnp.float32)  # (kh, kw, I, O)
    new_w = (w * g[None, None, :, None]).astype(conv.weight.dtype)
    shift = jnp.einsum("hwio,i->o", w, b)
    if conv.bias is not None:
        new_b = (conv.bias.astype(jnp.float32) + shift).astype(conv.bias.dtype)
    else:
        new_b = shift.astype(conv.weight.dtype)
    ln2 = replace(ln, weight=None, bias=None)
    conv2 = replace(conv, weight=new_w, bias=new_b)
    return ln2, conv2


def _fold_convnext(model):
    from ..models.classification.convnext import CNBlock
    from ..nn.containers import Sequential
    from ..nn.conv import Conv2d

    def fold_stage(stage):
        if not isinstance(stage, Sequential):
            return stage
        ls = list(stage.layers)
        if all(isinstance(m, CNBlock) for m in ls):
            for i, blk in enumerate(ls):
                norm, pw1 = _fold_pair(blk.norm, blk.pwconv1)
                ls[i] = replace(blk, norm=norm, pwconv1=pw1)
        elif (
            len(ls) == 2
            and isinstance(ls[0], LayerNorm)
            and isinstance(ls[1], Conv2d)
        ):  # downsample: LN + 2x2/2 conv
            ls[0], ls[1] = _fold_pair_conv(ls[0], ls[1])
        return replace(stage, layers=tuple(ls))

    features = replace(
        model.features, layers=tuple(fold_stage(s) for s in model.features.layers)
    )
    model = replace(model, features=features)
    if isinstance(model.classifier_fc, Linear):
        norm, fc = _fold_pair(model.classifier_norm, model.classifier_fc)
        model = replace(model, classifier_norm=norm, classifier_fc=fc)
    return model


def fold_layernorm(model: Any) -> Any:
    """Fold every pre-norm LN affine of a ``VisionTransformer`` or
    ``ConvNeXt`` into the adjacent weights. Inference only (exact under
    identity DropPath/Dropout); returns a new model pytree."""
    from ..models.classification.convnext import ConvNeXt
    from ..models.classification.vit import VisionTransformer, _VitBlock

    if isinstance(model, ConvNeXt):
        return _fold_convnext(model)
    if not isinstance(model, VisionTransformer):
        raise TypeError(
            "fold_layernorm supports VisionTransformer and ConvNeXt "
            f"(pre-norm); got {type(model).__name__}. Swin is "
            "intentionally unsupported (see module docstring)."
        )

    def fold_block(blk: _VitBlock) -> _VitBlock:
        norm1, qkv = _fold_pair(blk.norm1, blk.attn.qkv)
        norm2, fc1 = _fold_pair(blk.norm2, blk.mlp.fc1)
        return replace(
            blk,
            norm1=norm1,
            attn=replace(blk.attn, qkv=qkv),
            norm2=norm2,
            mlp=replace(blk.mlp, fc1=fc1),
        )

    model = replace(model, blocks=tuple(fold_block(b) for b in model.blocks))
    if isinstance(model.head, Linear):
        norm, head = _fold_pair(model.norm, model.head)
        model = replace(model, norm=norm, head=head)
    return model
