#!/usr/bin/env python3
"""End-to-end graph-build throughput benchmark.

Metric: PAF records/s for the full pipeline (parse -> filters -> 15-round
graph schedule -> GFA emission) on a deterministic 32-genome / ~131k-record
synthetic corpus, byte-checked against the reference binary's output hash.

vs_baseline compares against the reference C binary (lh3/pangene v1.1-r231,
gcc -O2, single thread) measured on the SAME corpus in this container:
131485 records / 1.469 s = 89,507 records/s. The reference is a tightly
optimized single-core C program; parity >1.0 at this (small) scale is the
multi-round goal — see BASELINE.md.

Prints one JSON line per measurement, the small-corpus HOST line LAST (the
driver parses the final line as the headline): first the device-resident
sharded engine on the real chip (when a TPU backend is present and
PANGENE_BENCH_SHARDED != 0), then the big-corpus host line (when its
1.3M-record corpus is already cached), then the headline. Every line
asserts the output md5 against the reference binary's GFA.
"""
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# corpora: (n_genome, n_gene, seed, reference-records/s measured in-container
# on the same corpus with the gcc -O2 reference build, expected output md5)
SCALES = {
    # 131,485 records; reference: 1.469 s
    "small": (32, 2000, 11, 89507.0, "4e077812357fa691683bea45c7831a8c"),
    # 1,314,156 records; reference: 20.34 s
    "big": (64, 10000, 7, 64609.0, "b988fc85e7633316be354ab315a0449c"),
}
SCALE = os.environ.get("PANGENE_BENCH_SCALE", "small")
N_GENOME, N_GENE, SEED, REF_RECORDS_PER_S, EXPECT_MD5 = SCALES[SCALE]


def main() -> None:
    from pangene_tpu import util
    util.verbose = 0
    from pangene_tpu.options import PgOpt
    from pangene_tpu.testing import synth_paf_files
    from pangene_tpu import pipeline

    cache = os.path.join(tempfile.gettempdir(),
                         "pg_bench_%d_%d_%d" % (N_GENOME, N_GENE, SEED))
    marker = os.path.join(cache, "done")
    if not os.path.exists(marker):
        files = synth_paf_files(cache, n_genome=N_GENOME, n_gene=N_GENE,
                                n_iso=3, seed=SEED)
        open(marker, "w").write("ok")
    files = sorted(os.path.join(cache, f) for f in os.listdir(cache)
                   if f.endswith(".paf.gz"))
    import gzip
    n_records = sum(sum(1 for _ in gzip.open(f)) for f in files)

    import hashlib

    def run_engine(engine, reps):
        dt = float("inf")
        for _ in range(reps):
            opt = PgOpt(engine=engine)
            out = io.StringIO()
            t0 = time.monotonic()
            pipeline.run(opt, files, out=out)
            dt = min(dt, time.monotonic() - t0)
            md5 = hashlib.md5(out.getvalue().encode()).hexdigest()
            if md5 != EXPECT_MD5:
                sys.stderr.write("BENCH OUTPUT MISMATCH (%s): %s != %s\n"
                                 % (engine, md5, EXPECT_MD5))
                sys.exit(1)
        return n_records / dt, md5

    def emit(engine, rate, md5):
        print(json.dumps({
            "metric": "paf_records_per_s_end_to_end",
            "value": round(rate, 1),
            "unit": "records/s (%d genomes, %d records, engine=%s, md5=%s)"
                    % (N_GENOME, n_records, engine, md5[:8]),
            "vs_baseline": round(rate / REF_RECORDS_PER_S, 4),
        }))

    engine = os.environ.get("PANGENE_BENCH_ENGINE", "host")
    # TPU line first (hash-asserted, single rep: the device-resident round
    # schedule on the real chip; timings vary with shared-chip contention —
    # see TPU_GATE.json); the HOST line last, which the driver parses as
    # the headline. PANGENE_BENCH_SHARDED=0 skips the TPU line.
    want_sharded = os.environ.get("PANGENE_BENCH_SHARDED", "auto")
    if engine == "host" and SCALE == "small" and want_sharded != "0":
        try:
            import jax
            has_tpu = jax.default_backend() != "cpu"
        except Exception:
            has_tpu = False
        if has_tpu or want_sharded == "1":
            # measured in a FRESH subprocess (jax does not survive fork)
            # with a timeout: the shared chip/tunnel has multi-minute
            # contention phases and a stuck device must not stall the
            # host headline. The child prints its own JSON line.
            budget = int(os.environ.get("PANGENE_BENCH_SHARDED_TIMEOUT",
                                        "1200"))
            import subprocess
            env = dict(os.environ, PANGENE_BENCH_ENGINE="sharded",
                       PANGENE_BENCH_SHARDED="0")
            try:
                r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                   env=env, timeout=budget,
                                   stdout=subprocess.PIPE)
                sys.stdout.write(r.stdout.decode())
                sys.stdout.flush()
            except subprocess.TimeoutExpired:
                sys.stderr.write("BENCH: sharded engine exceeded %ds "
                                 "(shared-chip contention); skipping its "
                                 "line\n" % budget)
    # big-corpus host line (the larger multipliers live at scale,
    # BASELINE.md): emitted when the 1.3M-record corpus is already cached
    # so the default run never pays its one-time generation
    if engine == "host" and SCALE == "small" \
            and os.environ.get("PANGENE_BENCH_BIG", "auto") != "0":
        big_cache = os.path.join(tempfile.gettempdir(), "pg_bench_64_10000_7")
        if os.path.exists(os.path.join(big_cache, "done")):
            import subprocess
            env = dict(os.environ, PANGENE_BENCH_SCALE="big",
                       PANGENE_BENCH_SHARDED="0", PANGENE_BENCH_BIG="0")
            try:
                r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                   env=env, timeout=300,
                                   stdout=subprocess.PIPE)
                sys.stdout.write(r.stdout.decode())
                sys.stdout.flush()
            except subprocess.TimeoutExpired:
                pass
    # best-of-N against shared-machine load noise (the reference baseline
    # was likewise measured unloaded); sharded uses best-of-2 (first rep
    # pays per-process trace + compile-cache load); big corpus runs once
    if SCALE == "small":
        reps = 5 if engine == "host" else 2
    else:
        reps = 1
    rate, md5 = run_engine(engine, reps)
    emit(engine, rate, md5)


if __name__ == "__main__":
    main()
