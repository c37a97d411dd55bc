"""Test configuration.

The suite runs on CPU with 8 emulated devices
(``--xla_force_host_platform_device_count=8``) — the standard JAX
stand-in for a multi-chip TPU mesh, so sharding tests exercise real
collectives (SURVEY.md §4 rebuild plan). In this container a
sitecustomize registers the ``axon`` TPU platform before pytest starts,
so environment variables set here would be too late; instead, when the
TPU plugin is detected, we re-exec pytest once with a scrubbed
environment. Set ``EQXTPU_TEST_ON_TPU=1`` to run the suite on the real
chip instead.
"""
import math
import os
import sys


def _ensure_cpu_mesh():
    if os.environ.get("EQXTPU_TEST_REEXEC") == "1":
        return
    if os.environ.get("EQXTPU_TEST_ON_TPU") == "1":
        return
    if "jax" in sys.modules and not (
        os.environ.get("JAX_PLATFORMS") == "axon" or os.environ.get("PALLAS_AXON_POOL_IPS")
    ):
        return  # jax imported and not on the axon plugin: leave as-is
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip()
    env["EQXTPU_TEST_REEXEC"] = "1"
    try:
        os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
    except Exception:
        pass  # fall through: tests still run, possibly on TPU


_ensure_cpu_mesh()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# float32 matmuls at full precision: parity tests assert atol=1e-4
# against torch, which always accumulates f32.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def getkey():
    _key = [jax.random.PRNGKey(0)]

    def _get():
        _key[0], k = jax.random.split(_key[0])
        return k

    return _get


@pytest.fixture(scope="session")
def demo_image():
    """Deterministic pseudo-image batch, ImageNet-normalized scale."""

    def make(size: int = 224, batch: int = 1):
        rng = np.random.RandomState(0)
        x = rng.rand(batch, size, size, 3).astype(np.float32)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return jnp.asarray((x - mean) / std)

    return make
