"""End-to-end smoke test of the training CLI (scripts/train_imagenet.py)
on the 8-device CPU mesh: synthetic uint8 data, on-device augmentation
(mixup+cutmix switch), EMA, orbax checkpoint + mid-schedule resume.

The reference's training story is a single optax step in a test
(reference tests/test_grads.py:32-66); this exercises the full composed
production loop instead.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_train_cli_synthetic_and_resume(tmp_path):
    import train_imagenet

    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt, exist_ok=True)
    common = [
        "--model", "squeezenet1_0",
        "--synthetic", "3",
        "--batch-size", "8",
        "--canvas", "56",
        "--crop", "48",
        "--num-classes", "7",
        "--warmup-epochs", "0",
        "--lr", "0.01",
        "--ema", "0.99",
        "--mixup", "0.2",
        "--cutmix", "1.0",
        "--log-every", "1",
        "--ckpt-dir", ckpt,
    ]
    final = train_imagenet.main(common + ["--epochs", "1"])
    assert final == 3
    with open(os.path.join(ckpt, "latest.json")) as f:
        assert json.load(f)["step"] == 3

    # resume picks up the saved step and trains only the second epoch
    final = train_imagenet.main(common + ["--epochs", "2", "--resume"])
    assert final == 6
    with open(os.path.join(ckpt, "latest.json")) as f:
        assert json.load(f)["step"] == 6
