"""Worker process for the multi-process jax.distributed CPU simulation
(SURVEY §4's multi-host prescription). Launched by test_distributed.py with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set; each
process owns the virtual CPU devices its XLA_FLAGS declares (counts may
differ per process — uneven-host simulation), the global ('g',) mesh spans
all of them, and cross-process collectives ride gloo.

Runs the FULL sharded pipeline (ingest, psum post-process reductions, the
device-resident round schedule) on the corpus dir in argv[1] and writes
md5(GFA) to argv[2].<process_id>. PG_EXPECT_GLOBAL_DEVICES asserts the
global device count; PG_ASSERT_DEVLOOP=1 asserts the device-resident
schedule actually engaged (no host fallback).
"""
import hashlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> int:
    corpus, out_prefix = sys.argv[1], sys.argv[2]
    from pangene_tpu.parallel.mesh import init_distributed
    init_distributed()
    n_proc = int(os.environ.get("JAX_NUM_PROCESSES", "2"))
    assert jax.process_count() == n_proc, jax.process_count()
    exp_dev = int(os.environ.get("PG_EXPECT_GLOBAL_DEVICES", "0"))
    if exp_dev:
        assert len(jax.devices()) == exp_dev, jax.devices()
    from pangene_tpu import pipeline, util
    from pangene_tpu.options import PgOpt
    util.verbose = 0
    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".paf.gz"))
    out = io.StringIO()
    pipeline.run(PgOpt(engine="sharded"), files, out=out)
    if os.environ.get("PG_ASSERT_DEVLOOP") == "1":
        from pangene_tpu.parallel import device_loop
        assert device_loop.LAST.get("engaged"), device_loop.LAST
    md5 = hashlib.md5(out.getvalue().encode()).hexdigest()
    with open("%s.%d" % (out_prefix, jax.process_index()), "w") as f:
        f.write(md5 + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
