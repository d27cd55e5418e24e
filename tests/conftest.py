"""Test environment: force JAX onto a virtual 8-device CPU mesh so the
multi-chip sharding paths run without TPU hardware.

The axon sitecustomize presets JAX_PLATFORMS=axon and pins the pool
topology at INTERPRETER START, so mutating os.environ here is too late —
with the preset in place a plain `pytest tests/` runs every jax-using
test against the shared tunnel (and blocks for hours during tunnel
outages). When the preset is detected, re-exec pytest once with the
corrected environment; PANGENE_TEST_ON_TPU=1 opts out."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import glob
import pathlib

import pytest

REF_C4 = "/root/reference/test/C4"
GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def c4_pafs():
    files = sorted(glob.glob(REF_C4 + "/*.paf.gz"))
    if not files:
        pytest.skip("reference C4 fixture not available")
    return files


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
    # Re-exec with the corrected environment when the axon preset is
    # detected (see module docstring). This runs BEFORE collection (no
    # test module has imported jax yet). Global capture must be suspended
    # first: the capture plugin has already dup2'd fd 1/2, and an execve'd
    # child would otherwise write its whole report into the dead parent's
    # capture tempfiles.
    needs_cpu = (os.environ.get("JAX_PLATFORMS", "cpu") != "cpu"
                 or "PALLAS_AXON_POOL_IPS" in os.environ)
    if (needs_cpu and os.environ.get("PANGENE_TEST_REEXEC") != "1"
            and os.environ.get("PANGENE_TEST_ON_TPU") != "1"):
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.suspend_global_capture(in_=True)
        env = dict(os.environ)
        env["PANGENE_TEST_REEXEC"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        args = list(config.invocation_params.args)
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest"] + args, env)
