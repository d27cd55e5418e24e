"""Two-process jax.distributed CPU simulation (SURVEY §4, VERDICT r1 #4).

Spawns two coordinator-connected processes, each owning 4 virtual CPU
devices; the sharded engine's global ('g',) mesh spans both processes, so
the psum / all_gather collectives inside the post-process reductions and
the device-resident round schedule actually cross a process boundary
(gloo). Both processes must produce the byte-identical GFA of a
single-process host run.
"""
import hashlib
import io
import os
import pathlib
import socket
import subprocess
import sys

import pytest

from pangene_tpu import pipeline, util
from pangene_tpu.options import PgOpt
from pangene_tpu.testing import synth_paf_files

ROOT = pathlib.Path(__file__).parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_procs(tmp_path, n_genome, seed, dev_counts, timeout=420,
               assert_devloop=False):
    """Host-engine reference + N coordinator-connected worker processes
    (process i owning dev_counts[i] virtual CPU devices); every rank's GFA
    md5 must equal the host run's."""
    corpus = tmp_path / "corpus"
    synth_paf_files(str(corpus), n_genome=n_genome, n_gene=120, n_iso=2,
                    seed=seed)

    files = sorted(str(p) for p in corpus.iterdir()
                   if str(p).endswith(".paf.gz"))
    util.verbose = 0
    out = io.StringIO()
    pipeline.run(PgOpt(engine="host"), files, out=out)
    want = hashlib.md5(out.getvalue().encode()).hexdigest()

    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PALLAS_AXON_POOL_IPS",)}
    env_base.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_COORDINATOR_ADDRESS": "127.0.0.1:%d" % port,
        "JAX_NUM_PROCESSES": str(len(dev_counts)),
        "PG_EXPECT_GLOBAL_DEVICES": str(sum(dev_counts)),
        "PYTHONPATH": str(ROOT),
    })
    if assert_devloop:
        env_base["PG_ASSERT_DEVLOOP"] = "1"
    prefix = str(tmp_path / "md5")
    procs = []
    for pid, n_dev in enumerate(dev_counts):
        env = dict(
            env_base, JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=%d" % n_dev)
        procs.append(subprocess.Popen(
            [sys.executable, str(ROOT / "tests/distributed_worker.py"),
             str(corpus), prefix],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    for pid in range(len(dev_counts)):
        got = open("%s.%d" % (prefix, pid)).read().strip()
        assert got == want, "process %d GFA md5 %s != host %s" \
            % (pid, got[:8], want[:8])


@pytest.mark.slow
def test_two_process_sharded_pipeline(tmp_path):
    _run_procs(tmp_path, n_genome=8, seed=9, dev_counts=[4, 4])


@pytest.mark.slow
def test_four_process_uneven_devices(tmp_path):
    """VERDICT r2 #9: four coordinator-connected processes owning UNEVEN
    virtual-device counts (1+3+2+5 = 11 global devices), so no
    process-count or equal-split assumption survives in the collectives;
    22 genomes pad to Gp=22 (2 per device) with ragged real loads. The
    device-resident schedule must engage on every rank (asserted) and all
    four ranks must emit the host run's byte-identical GFA."""
    _run_procs(tmp_path, n_genome=22, seed=17, dev_counts=[1, 3, 2, 5],
               timeout=900, assert_devloop=True)
