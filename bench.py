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

Prints exactly one JSON line.
"""
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_RECORDS_PER_S = 89507.0  # measured in-container, see module docstring
N_GENOME = 32
N_GENE = 2000
SEED = 11
# md5 of the reference binary's GFA on this exact corpus (measured in-container)
EXPECT_MD5 = "4e077812357fa691683bea45c7831a8c"


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

    engine = os.environ.get("PANGENE_BENCH_ENGINE", "host")
    opt = PgOpt(engine=engine)
    out = io.StringIO()
    t0 = time.monotonic()
    pipeline.run(opt, files, out=out)
    dt = time.monotonic() - t0

    import hashlib
    md5 = hashlib.md5(out.getvalue().encode()).hexdigest()
    if md5 != EXPECT_MD5:
        sys.stderr.write("BENCH OUTPUT MISMATCH: %s != %s\n"
                         % (md5, EXPECT_MD5))
        sys.exit(1)
    rate = n_records / dt
    print(json.dumps({
        "metric": "paf_records_per_s_end_to_end",
        "value": round(rate, 1),
        "unit": "records/s (32 genomes, %d records, engine=%s, md5=%s)"
                % (n_records, engine, md5[:8]),
        "vs_baseline": round(rate / REF_RECORDS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
