"""Test configuration.

Default: pin tests to the host CPU backend (8 virtual devices) so unit tests
don't round-trip through the TPU tunnel and multi-chip sharding logic is
exercised without TPU hardware.

On-hardware mode: ``pytest -m tpu`` (or FVVDP_TEST_TPU=1) skips the CPU pin
and runs the tests marked ``tpu`` — end-to-end JOD parity on the real chip
with the Pallas kernels engaged (see test_tpu_e2e.py).

Note: the environment force-registers the TPU ('axon') backend at interpreter
start (sitecustomize imports jax), which locks in the JAX_PLATFORMS read from
the launch environment — mutating os.environ afterwards has no effect.  The
config key itself must be updated post-import, or any jax.devices() call
initialises the TPU backend as a side effect (and *blocks* when the device
tunnel is wedged, which has happened — CPU tests must never depend on it).
"""
import os
import sys


def _tpu_mode() -> bool:
    if os.environ.get("FVVDP_TEST_TPU") == "1":
        return True
    argv = sys.argv
    for i, a in enumerate(argv):
        if a == "-m" and i + 1 < len(argv) and "tpu" in argv[i + 1]:
            return True
        if a.startswith("-m") and "tpu" in a[2:]:
            return True
    return False


TPU_MODE = _tpu_mode()

if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

if TPU_MODE:
    # A wedged device tunnel blocks forever inside PJRT client creation;
    # probe in a killable SUBPROCESS before the in-process suite touches the
    # backend, and bail out loudly instead of hanging the whole run.
    import subprocess
    probe = ("import jax, jax.numpy as jnp; "
             "jnp.ones(8).sum().block_until_ready(); "
             "print(jax.devices()[0].platform)")
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, text=True, timeout=120)
        ok = r.returncode == 0 and r.stdout.strip().splitlines()[-1] != "cpu"
        detail = (r.stderr.strip().splitlines() or ["no device"])[-1]
    except subprocess.TimeoutExpired:
        ok, detail = False, "backend init hung > 120s (wedged tunnel)"
    if not ok:
        raise SystemExit(f"TPU test mode requested but the device backend is "
                         f"unavailable: {detail}")

import jax  # noqa: E402

if not TPU_MODE:
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def cpu_subprocess_env(n_devices=None):
    """Environment for child processes that must stay CPU-only.

    Pins JAX_PLATFORMS and drops the sitecustomize gate that force-registers
    the TPU backend in-process — a wedged device tunnel must never hang a
    CPU test.  ``n_devices`` (re)sets the virtual CPU device count."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    if n_devices:
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if not f.startswith("--xla_force_host_platform_device_count")]
        flags.append(f"--xla_force_host_platform_device_count={n_devices}")
        env["XLA_FLAGS"] = " ".join(flags)
    return env


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: end-to-end parity tests that need real TPU hardware "
        "(run with `pytest -m tpu`)")
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running tests")


@pytest.fixture(scope="session")
def goldens():
    def load(name):
        path = os.path.join(GOLDEN_DIR, name + ".npz")
        if not os.path.isfile(path):
            pytest.skip(f"golden fixture {name} not generated")
        return np.load(path)
    return load
