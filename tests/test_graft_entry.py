"""Driver entry-point contract tests.

The driver runs ``python -c "import __graft_entry__ as g;
g.dryrun_multichip(8)"`` in whatever environment it happens to have
(on this host: the single-chip axon TPU tunnel). Round-1 shipped a
``dryrun_multichip`` that assumed 8 devices already existed and went
red (MULTICHIP_r01.json rc=1); these tests pin the self-bootstrapping
fix from both directions.
"""
import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_in_process():
    """With >=8 devices live (this suite's CPU mesh), runs in-process."""
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_from_single_device():
    """Exactly the driver's invocation, from a 1-device parent process.

    The parent subprocess is pinned to a single CPU device; the entry
    point must notice the shortfall and re-run itself on an 8-device
    emulated backend rather than raising a mesh-size error.
    """
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"


@pytest.mark.slow
def test_dryrun_multichip_never_imports_jax_with_tpu_env():
    """The driver's exact invocation under a wedged-TPU environment.

    Round-4 failure mode (MULTICHIP_r04 rc=124): with the axon tunnel
    wedged, ``import jax`` in the parent hangs on device discovery, so
    a module-scope jax import deadlocks before the CPU fallback can
    run. Simulate the wedge by poisoning jax import in the parent (a
    meta_path hook that raises — a hang would also be caught, as a
    timeout) while axon env markers are present; the entry point must
    route to the scrubbed CPU subprocess without touching jax and
    still exit 0. The spawned child is a fresh interpreter, so the
    hook does not propagate and real jax runs there.
    """
    poison = (
        "import sys\n"
        "class _BlockJax:\n"
        "    def find_spec(self, name, path=None, target=None):\n"
        "        if name == 'jax' or name.startswith('jax.'):\n"
        "            raise RuntimeError('WEDGE: parent imported jax: ' + name)\n"
        "        return None\n"
        "sys.meta_path.insert(0, _BlockJax())\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRYRUN_OK')\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("EQXTPU_TEST_REEXEC", None)
    # Unroutable TEST-NET address: marks "axon plugin present" without
    # a reachable TPU, exactly the wedge scenario.
    env["PALLAS_AXON_POOL_IPS"] = "198.51.100.1:1"
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [sys.executable, "-c", poison],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "DRYRUN_OK" in proc.stdout
    assert "WEDGE" not in proc.stdout + proc.stderr


def test_entry_compiles_single_chip():
    """The driver compile-checks entry() single-chip; pin it here too."""
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered.compile() is not None
