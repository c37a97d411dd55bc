"""Multi-host eval seam (SURVEY.md §2.5 rebuild equivalent).

The integration test launches TWO real processes, each owning half the
devices of a distributed CPU backend, and checks both report identical
global accuracy equal to a single-process run over the same data.
"""
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_local_shard_padding_and_coverage():
    from eqxvision_tpu.parallel.multihost import local_shard

    items = list(range(10))
    s0 = local_shard(items, 0, 3)
    s1 = local_shard(items, 1, 3)
    s2 = local_shard(items, 2, 3)
    assert len(s0) == len(s1) == len(s2) == 4  # lockstep batch counts
    assert s0 + s1 + s2[:2] == items  # full coverage, order preserved
    assert s2 == [8, 9, 9, 9]  # tail padded by repetition
    assert local_shard(items, 0, 1) == items  # single-process no-op


def test_host_local_to_global_single_process():
    """With one process, assembly is just a device_put with sharding."""
    from eqxvision_tpu.parallel import make_mesh
    from eqxvision_tpu.parallel.multihost import host_local_to_global

    mesh = make_mesh(devices=jax.devices())
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = host_local_to_global(x, mesh)
    assert g.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(g), x)


@pytest.mark.slow
def test_multihost_two_process_eval():
    """Two real processes, 4 CPU devices each, one global 8-device mesh;
    both must print the same global top-1/top-5, matching a
    single-process reference over the identical dataset."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO

    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i)],
            env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        acc_lines = [ln for ln in out.splitlines() if ln.startswith("ACC ")]
        assert acc_lines, f"no ACC line in worker output:\n{out}\n{err}"
        outs.append(acc_lines[-1])
    assert outs[0] == outs[1], f"processes disagree: {outs}"

    # single-process reference over the same deterministic dataset
    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.models.classification.vit import VisionTransformer
    from eqxvision_tpu.parallel import evaluate

    model = VisionTransformer(
        img_size=32, patch_size=16, embed_dim=64, depth=1, num_heads=4,
        num_classes=5, key=jax.random.PRNGKey(0),
    )
    model = tree_inference(model, True)
    rng = np.random.RandomState(0)
    xs = rng.rand(32, 32, 32, 3).astype(np.float32)
    ys = rng.randint(0, 5, size=(32,)).astype(np.int32)
    batches = [(xs[i : i + 8], ys[i : i + 8]) for i in range(0, 32, 8)]
    top1, top5 = evaluate(model, {}, batches)
    assert outs[0] == f"ACC {top1:.6f} {top5:.6f}"
