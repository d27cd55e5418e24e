"""Test environment: force JAX onto a virtual 8-device CPU mesh so the
multi-chip sharding paths run without TPU hardware."""
import os

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
