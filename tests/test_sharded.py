"""Multi-device (8 virtual CPU) sharded-engine tests.

These run in subprocesses because the axon TPU sitecustomize pins the device
topology at interpreter start — a clean env is required for a CPU mesh.
"""
import os
import pathlib
import subprocess
import sys

import pytest

REPO = str(pathlib.Path(__file__).parent.parent)


def clean_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_sharded_engine_c4_parity(c4_pafs, golden_dir, tmp_path):
    out = tmp_path / "c4.gfa"
    with open(out, "w") as fp:
        subprocess.run(
            [sys.executable, "-m", "pangene_tpu.cli", "--engine", "sharded",
             *c4_pafs], stdout=fp, stderr=subprocess.DEVNULL,
            env=clean_env(), check=True, timeout=600)
    assert out.read_text() == (golden_dir / "C4.gfa").read_text()


@pytest.mark.slow
def test_dryrun_multichip_8():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "8"],
        env=clean_env(), capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


@pytest.mark.slow
def test_shard_count_independence(c4_pafs, tmp_path):
    """Output must be byte-identical for 1, 2 and 8 mesh devices: all
    cross-genome merges use exact integer sums with host-side +.499
    rounding, so shard count cannot leak into the graph (SURVEY hard
    part #4)."""
    outs = []
    for n_dev in (1, 2, 8):
        out = tmp_path / ("c4_%d.gfa" % n_dev)
        with open(out, "w") as fp:
            subprocess.run(
                [sys.executable, "-m", "pangene_tpu.cli", "--engine",
                 "sharded", "--devices", str(n_dev), *c4_pafs],
                stdout=fp, stderr=subprocess.DEVNULL,
                env=clean_env(), check=True, timeout=600)
        outs.append(out.read_text())
    assert outs[0] == outs[1] == outs[2]
    assert outs[0].startswith("S\t")
