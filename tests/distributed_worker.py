"""Worker process for the two-process jax.distributed CPU simulation
(SURVEY §4's multi-host prescription). Launched by test_distributed.py with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set; each
process owns 4 virtual CPU devices, the global ('g',) mesh spans 8 across
both processes, and cross-process collectives ride gloo.

Runs the FULL sharded pipeline (ingest, psum post-process reductions, the
device-resident round schedule) on the corpus dir in argv[1] and writes
md5(GFA) to argv[2].<process_id>.
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
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    from pangene_tpu import pipeline, util
    from pangene_tpu.options import PgOpt
    util.verbose = 0
    files = sorted(os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".paf.gz"))
    out = io.StringIO()
    pipeline.run(PgOpt(engine="sharded"), files, out=out)
    md5 = hashlib.md5(out.getvalue().encode()).hexdigest()
    with open("%s.%d" % (out_prefix, jax.process_index()), "w") as f:
        f.write(md5 + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
