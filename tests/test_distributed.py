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


@pytest.mark.slow
def test_two_process_sharded_pipeline(tmp_path):
    corpus = tmp_path / "corpus"
    synth_paf_files(str(corpus), n_genome=8, n_gene=120, n_iso=2, seed=9)
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
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COORDINATOR_ADDRESS": "127.0.0.1:%d" % port,
        "JAX_NUM_PROCESSES": "2",
        "PYTHONPATH": str(ROOT),
    })
    prefix = str(tmp_path / "md5")
    procs = []
    for pid in range(2):
        env = dict(env_base, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(ROOT / "tests/distributed_worker.py"),
             str(corpus), prefix],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    for pid in range(2):
        got = open("%s.%d" % (prefix, pid)).read().strip()
        assert got == want, "process %d GFA md5 %s != host %s" \
            % (pid, got[:8], want[:8])
