"""Checkpoint-consumption manifest tests (VERDICT.md r1 #7).

Two directions:
1. model vs torchvision manifest — the ordered (suffix, shape) stream
   the importer demands must match the vendored transcription of
   torchvision's real state_dict order (tests/manifests/*.json,
   regenerable against actual torchvision via scripts/gen_manifests.py).
2. manifest walker vs importer — a synthetic state_dict generated from
   ``expected_consumption`` must import strictly with zero leftovers,
   pinning the walker to the importer's actual behavior.
"""
import glob
import json
import os

import pytest

from eqxvision_tpu.models import create_model
from eqxvision_tpu.weights.manifest import (
    check_against_manifest,
    expected_consumption,
    synthetic_state_dict,
)
from eqxvision_tpu.weights.torch_import import import_torch_weights

MANIFEST_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "manifests")
MANIFESTS = sorted(glob.glob(os.path.join(MANIFEST_DIR, "*.json")))


@pytest.mark.parametrize("path", MANIFESTS, ids=[os.path.basename(p)[:-5] for p in MANIFESTS])
def test_model_matches_torchvision_manifest(path):
    with open(path) as f:
        doc = json.load(f)
    entries = [
        (n, s)
        for n, s in doc["entries"]
        if not n.endswith(
            ("num_batches_tracked", "relative_position_index", "relative_coords_table", "attn_mask")
        )
    ]
    model, _ = create_model(doc["model"], **doc.get("kwargs", {}))
    check_against_manifest(model, entries)


def test_every_registry_entry_has_a_manifest():
    """Coverage gate (VERDICT r2 #3): the import contract is pinned for
    ALL 74 registry entries, not a convenient subset."""
    from eqxvision_tpu.models.registry import list_models

    have = {os.path.basename(p)[:-5] for p in MANIFESTS}
    missing = [n for n in list_models() if n not in have]
    assert not missing, f"registry entries without manifests: {missing}"


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("alexnet", {}),
        ("resnet18", {}),
        ("mobilenet_v3_small", {}),
        ("swin_t", {}),
        ("vit_tiny", {}),
        ("convnext_tiny", {}),
    ],
)
def test_manifest_walker_agrees_with_importer(name, kwargs):
    model, state = create_model(name, **kwargs)
    sd = synthetic_state_dict(model)
    # swin: real checkpoints carry relative_position_index / attn_mask
    # buffers the importer skips; the synthetic dict has none.
    new_model, new_state = import_torch_weights(model, sd, state, strict=True)
    assert len(expected_consumption(model)) == len(sd)
