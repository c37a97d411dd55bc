"""Fold LayerNorm affine parameters into adjacent Linear weights.

Inference-time exact algebra (same family as :mod:`ops.fold_bn`): a
pre-norm transformer applies ``Linear(LN(x))`` with
``LN(x) = g * xhat + b``, so

    LN(x) @ W + c  ==  xhat @ (g[:, None] * W) + (b @ W + c)

and the LN collapses to its affine-free form (``weight=None`` — the
Pallas LN kernel then skips the scale/shift VPU ops and the gamma/beta
VMEM loads entirely, ops/layernorm.py:_ln_kernel).

Applies to the pre-norm pattern only: ViT blocks (norm1 -> attn.qkv,
norm2 -> mlp.fc1; reference vit.py:79-157) and the final norm -> head
pair when the head is a Linear (classification mode). Swin is NOT
folded: v1's whole-block fused kernel consumes gamma/beta in-kernel at
negligible cost (ops/window_attention.py), and v2 is post-norm — the
affine sits after the residual branch output where it does not commute
into a following contraction.

Opt-in, like every serving transform here: apply after weight loading
and ``tree_inference``, before jit/export. Whether it also wins time
on-chip is decided by measurement (scripts/ablate_vit9.py A/Bs it
against the r4 3.8 ms ViT LN marginal; per the kernel-dispatch policy
it is only wired into a default path on a measured win, and the
numbers land in this docstring either way).
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


def fold_layernorm(model: Any) -> Any:
    """Fold every pre-norm LN affine of a ``VisionTransformer`` into the
    adjacent qkv/fc1/head weights. Inference only (exact under identity
    DropPath/Dropout); returns a new model pytree."""
    from ..models.classification.vit import VisionTransformer, _VitBlock

    if not isinstance(model, VisionTransformer):
        raise TypeError(
            "fold_layernorm supports VisionTransformer (pre-norm); got "
            f"{type(model).__name__}. Swin is intentionally unsupported "
            "(see module docstring)."
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
