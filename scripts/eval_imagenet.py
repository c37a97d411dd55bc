"""ImageNet-val evaluation CLI.

The reference had no eval loop, no CLI, and no metrics logging
(SURVEY.md §5, §2.6). This CLI runs: host threads decode JPEGs to fixed
uint8 canvases (eqxvision_tpu.data.ImageFolderLoader, prefetching),
batches ship to the device as uint8 (3x less transfer than f32), and
resize/center-crop/normalize run fused on-chip ahead of the model.

Usage:
  python scripts/eval_imagenet.py --model resnet50 --data-dir /path/to/val \
      [--pretrained] [--bf16] [--batch-size 128] [--limit N] \
      [--int8] [--int8-act] [--fold-ln] [--tta five_crop|ten_crop]

Emits one JSON line per batch and a final summary.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--pretrained", action="store_true")
    ap.add_argument("--torch-weights", default=None)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--resize", type=int, default=256)
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 (BN folded first; serving config)")
    ap.add_argument("--int8-act", action="store_true",
                    help="w8a8: int8 weights + per-token dynamic int8 "
                         "activations on Linears (quantize_dynamic_int8)")
    ap.add_argument("--fold-ln", action="store_true",
                    help="fold pre-norm LN affines into adjacent weights "
                         "(ViT; exact — ops.fold_layernorm)")
    ap.add_argument("--tta", choices=["five_crop", "ten_crop"], default=None,
                    help="multi-crop test-time augmentation (softmax-averaged)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.data import ImageFolderLoader
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.ops.preprocessing import imagenet_eval_pipeline

    kwargs = {}
    if args.torch_weights:
        kwargs["torch_weights"] = args.torch_weights
    model, state = create_model(args.model, pretrained=args.pretrained, **kwargs)
    model = tree_inference(model, True)
    if args.fold_ln:
        # fold in f32 BEFORE any bf16 cast so the folded products are
        # rounded once, not computed from already-rounded weights
        from eqxvision_tpu.ops import fold_layernorm

        model = fold_layernorm(model)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.bf16:
        model = cast_inexact(model, jnp.bfloat16)
    if args.int8:
        # serving configuration: fold BN so the affine lands in the
        # quantized weights, then weight-only int8 (docs/api/serving.md)
        from eqxvision_tpu.ops.fold_bn import fold_batchnorm
        from eqxvision_tpu.quantize import quantize_weights_int8

        model = quantize_weights_int8(fold_batchnorm(model, state), convs=True)
    if args.int8_act:
        from eqxvision_tpu.quantize import quantize_dynamic_int8

        model = quantize_dynamic_int8(model)

    if args.tta:
        from eqxvision_tpu.ops.preprocessing import (
            five_crop,
            normalize,
            resize_shorter_side,
            ten_crop,
        )

        crop_fn = five_crop if args.tta == "five_crop" else ten_crop

        @jax.jit
        def step(m, s, images_u8, labels):
            # classic multi-crop protocol: crops taken from the resized
            # frame (not the center crop); softmax averaged over crops
            x = normalize(resize_shorter_side(images_u8, args.resize)).astype(dtype)
            crops = crop_fn(x, args.crop)
            k, nb = crops.shape[:2]
            logits, _ = m(crops.reshape(k * nb, *crops.shape[2:]), s)
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
            probs = probs.reshape(k, nb, -1).mean(0)
            top1 = (jnp.argmax(probs, -1) == labels).sum()
            top5 = (jax.lax.top_k(probs, 5)[1] == labels[:, None]).any(-1).sum()
            return top1, top5

    else:

        @jax.jit
        def step(m, s, images_u8, labels):
            x = imagenet_eval_pipeline(
                images_u8, resize_size=args.resize, crop_size=args.crop, dtype=dtype
            )
            logits, _ = m(x, s)
            top1 = (jnp.argmax(logits, -1) == labels).sum()
            top5 = (jax.lax.top_k(logits, 5)[1] == labels[:, None]).any(-1).sum()
            return top1, top5

    loader = ImageFolderLoader(
        args.data_dir,
        batch_size=args.batch_size,
        side=args.resize,
        num_workers=args.workers,
        limit=args.limit or None,
    )
    c1 = c5 = n = 0
    t_start = time.time()
    for imgs, labels in loader:
        t1, t5 = step(model, state, jnp.asarray(imgs), jnp.asarray(labels))
        c1 += int(t1)
        c5 += int(t5)
        n += len(labels)
        print(
            json.dumps(
                {
                    "event": "batch",
                    "seen": n,
                    "top1": round(c1 / n, 5),
                    "top5": round(c5 / n, 5),
                    "imgs_per_sec": round(n / (time.time() - t_start), 1),
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "event": "summary",
                "model": args.model,
                "top1": round(c1 / max(n, 1), 5),
                "top5": round(c5 / max(n, 1), 5),
                "images": n,
                "elapsed_s": round(time.time() - t_start, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
