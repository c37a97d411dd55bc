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
    # (name, image size) — one representative per family
    ("resnet50", 96),
    ("googlenet", 96),
    ("shufflenet_v2_x0_5", 96),
    ("mobilenet_v3_small", 96),
    ("efficientnet_b0", 96),
    ("regnet_y_400mf", 96),
    ("convnext_tiny", 96),
    ("vit_tiny", 224),
    ("swin_t", 96),
    ("swin_v2_t", 128),
]


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
    for name, size in GOLDEN_MODELS:
        model, state = create_model(name)
        model = tree_inference(model, True)
        logits, _ = jax.jit(model.__call__)(make_input(size), state)
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez(path, logits=np.asarray(logits), size=size)
        print(f"{name}: logits[0,:3] = {np.asarray(logits)[0,:3]} -> {path}")


if __name__ == "__main__":
    main()
