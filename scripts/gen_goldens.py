"""Regenerate golden regression fixtures (tests/goldens/*.npz).

The reference's golden fixtures were opaque network-fetched pickles
(SURVEY.md §4); here goldens are generated from this repo's own models
at deterministic init (PRNGKey(0)) on a fixed pseudo-image, stored as
inspectable .npz. They pin the numerics of every model family so
refactors (new kernels, layout changes) can't silently shift outputs.

Run on CPU for cross-platform determinism:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/gen_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

GOLDEN_MODELS = [
    # (name, image size) — one representative per family; all 18
    # reference families are pinned (VERDICT r4 #3: refactor drift was
    # previously unprotected for 8 of them), matching the reference's
    # 18-family golden dict (reference tests/conftest.py:49-102).
    ("alexnet", 96),
    ("resnet50", 96),
    ("vgg11_bn", 96),
    ("densenet121", 96),
    ("googlenet", 96),
    ("squeezenet1_0", 96),
    ("shufflenet_v2_x0_5", 96),
    ("mobilenet_v2", 96),
    ("mobilenet_v3_small", 96),
    ("efficientnet_b0", 96),
    ("efficientnet_v2_s", 96),
    ("regnet_y_400mf", 96),
    ("convnext_tiny", 96),
    ("vit_tiny", 224),
    ("swin_t", 96),
    ("swin_v2_t", 128),
    # segmentation heads: dense (1,H,W,21) outputs are pinned as a
    # strided spatial subsample + full-tensor checksums to keep the
    # .npz fixtures a few KB instead of ~800KB each
    ("fcn", 96),
    ("deeplabv3", 96),
    ("lraspp_mobilenet_v3_large", 96),
]

# fcn/deeplabv3 defaults tap layer3+layer4, which requires the aux head
# (the torchvision pretrained config); 1024 = dilated-R50 layer3 width.
SEG_KWARGS = {
    "fcn": {"aux_in_channels": 1024},
    "deeplabv3": {"aux_in_channels": 1024},
}


def make_input(size: int) -> jnp.ndarray:
    rng = np.random.RandomState(1234)
    x = rng.rand(1, size, size, 3).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return jnp.asarray((x - mean) / std)


def main():
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.models import create_model

    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    only = set(sys.argv[1:])  # optional name filter: regenerate a subset
    for name, size in GOLDEN_MODELS:
        if only and name not in only:
            continue
        model, state = create_model(name, **SEG_KWARGS.get(name, {}))
        model = tree_inference(model, True)
        out, _ = jax.jit(model.__call__)(make_input(size), state)
        path = os.path.join(out_dir, f"{name}.npz")
        aux = None
        if isinstance(out, tuple):  # segmentation wrapper: (aux, out)
            aux, out = out
        out = np.asarray(out, np.float64)
        if out.ndim == 4:  # dense seg map
            extra = {"aux_sum": np.sum(np.asarray(aux, np.float64))} if aux is not None else {}
            np.savez(
                path,
                seg_sub=out[:, ::8, ::8, :].astype(np.float32),
                seg_sum=np.sum(out),
                seg_abssum=np.sum(np.abs(out)),
                size=size,
                **extra,
            )
            print(f"{name}: seg sum={np.sum(out):.6f} -> {path}")
        else:
            np.savez(path, logits=out.astype(np.float32), size=size)
            print(f"{name}: logits[0,:3] = {out[0,:3]} -> {path}")


if __name__ == "__main__":
    main()
