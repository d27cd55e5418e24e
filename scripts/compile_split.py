#!/usr/bin/env python3
"""Settle the device-schedule compile-time question (VERDICT r3 #6/#9):
split the wall into trace/lower (host) vs backend compile, on both the
axon TPU plugin service and the local CPU backend for the SAME program.

If the TPU compile wall >> CPU compile wall for identical HLO, the time is
the remote plugin service / TPU codegen, not program size; if both are
slow, the program itself is the problem and the fused-slice bodies need
dedup. Appends a `compile_split` section to PERFORMANCE.md data (prints
JSON; the docs table is updated by hand from it).

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python3 scripts/compile_split.py [small]
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=1 \
    PYTHONPATH=/root/repo:$PYTHONPATH python3 scripts/compile_split.py small

Run BOTH invocations and compare: the corpus, shapes and traced program
are identical (n_devices=1 on both, same Cfg), only the backend differs.
The TPU invocation disables the persistent compile cache so the measured
wall is a true fresh compile.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SCALES = {"small": (32, 2000, 11)}


def main() -> int:
    scale = sys.argv[1] if len(sys.argv) > 1 else "small"
    n_genome, n_gene, seed = SCALES[scale]

    # a fresh compile must not be served from the persistent cache.
    # ops/device.py RE-ENABLES the cache at import (inside pipeline), so
    # disabling the jax config here is not enough — point the package's
    # cache dir at a throwaway so the measured wall is a true compile
    # even right after the gate populated the real cache for this shape.
    import tempfile as _tf
    os.environ["PANGENE_TPU_CACHE"] = _tf.mkdtemp(prefix="pg_nocache_")
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import jax
    jax.config.update("jax_compilation_cache_dir", None)

    from pangene_tpu import pipeline, util
    from pangene_tpu.options import PgOpt
    from pangene_tpu.parallel import device_loop
    from pangene_tpu.testing import synth_paf_files
    util.verbose = 0

    import tempfile
    cache = os.path.join(tempfile.gettempdir(), "pg_bench_%d_%d_%d"
                         % (n_genome, n_gene, seed))
    if not os.path.exists(os.path.join(cache, "done")):
        synth_paf_files(cache, n_genome=n_genome, n_gene=n_gene, n_iso=3,
                        seed=seed)
        open(os.path.join(cache, "done"), "w").write("ok")
    files = sorted(os.path.join(cache, f) for f in os.listdir(cache)
                   if f.endswith(".paf.gz"))

    # drive the pipeline up to the point where the schedule call is made,
    # by monkey-patching _schedule's jit wrapper to stop after capture
    captured = {}
    orig = device_loop._schedule

    def capture(*a, **kw):
        captured["args"] = a
        captured["kw"] = kw
        raise _Stop()

    class _Stop(Exception):
        pass

    device_loop._schedule = capture
    try:
        import io
        pipeline.run(PgOpt(engine="sharded", n_devices=1), files,
                     out=io.StringIO())
    except _Stop:
        pass
    finally:
        device_loop._schedule = orig
    assert "args" in captured, "schedule never reached (fallback?)"

    a, kw = captured["args"], captured["kw"]
    fn = orig.__wrapped__  # the unjitted schedule
    import functools
    jfn = jax.jit(functools.partial(fn, cfg=kw["cfg"], mesh=kw["mesh"]))

    t0 = time.monotonic()
    lowered = jfn.lower(*a)
    t1 = time.monotonic()
    compiled = lowered.compile()
    t2 = time.monotonic()
    hlo_bytes = len(lowered.as_text())
    out = {
        "backend": jax.default_backend(),
        "scale": scale,
        "trace_lower_s": round(t1 - t0, 2),
        "backend_compile_s": round(t2 - t1, 2),
        "stablehlo_text_bytes": hlo_bytes,
        "flops_estimate": compiled.cost_analysis().get("flops", None)
        if compiled.cost_analysis() else None,
    }
    print("COMPILE_SPLIT " + json.dumps(out))
    path = os.path.join(ROOT, "COMPILE_SPLIT_%s.json" % jax.default_backend())
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
