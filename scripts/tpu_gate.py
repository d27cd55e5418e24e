#!/usr/bin/env python3
"""TPU gate: run the device paths ON THE REAL CHIP and record the evidence.

One command (`sh scripts/tpu_gate.sh` or `python scripts/tpu_gate.py`),
ordered most-valuable-evidence-first (tunnel-up phases can be short;
TPU_GATE.json is merged with the existing artifact and dumped after
every section):
  1. BIG corpus (1.3M records) through the device-resident schedule,
     md5-pinned, best-of-reps with stage breakdown.
  2. Sharded + host engines on the 32-genome bench corpus.
  3. North star (3.9M records; opt-in PANGENE_TPU_NORTHSTAR=1).
  4. jax engine end-to-end on C4, byte-compared to the golden GFA.
  5. Mosaic-compiles the Pallas shadow-sweep kernel and fuzzes it
     against the scalar host oracle.

The suite's CPU runs cover exactness; this gate exists so the TPU claims
are a repeatable artifact, not session anecdotes (VERDICT r1 item 2).
"""
import hashlib
import io
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np


def _dump(out) -> None:
    """Write TPU_GATE.json NOW — each completed section's evidence must
    survive a later plugin crash (the experimental axon PJRT has
    segfaulted after hours of big-shape work; lesson of round 3)."""
    with open(os.path.join(ROOT, "TPU_GATE.json"), "w") as f:
        json.dump(out, f, indent=1)


def main() -> int:
    import jax
    out = {}
    try:   # MERGE into the existing artifact: a partial round-4 gate must
        # not destroy committed evidence from earlier rounds (sections are
        # overwritten as they are re-measured)
        out = json.load(open(os.path.join(ROOT, "TPU_GATE.json")))
        out.pop("ok", None)
    except Exception:
        pass
    out.setdefault("checks", {})
    out.setdefault("timings_s", {})
    out["device"] = str(jax.devices()[0])
    out["backend"] = jax.default_backend()
    if jax.default_backend() == "cpu":
        print(json.dumps({"error": "no TPU device; gate must run on the "
                          "axon chip", "backend": "cpu"}))
        return 1

    from pangene_tpu import pipeline, util
    from pangene_tpu.options import PgOpt
    from pangene_tpu.testing import synth_paf_files
    util.verbose = 0

    # Section order is most-valuable-evidence-first: tunnel-up phases can
    # be short, and TPU_GATE.json is dumped after every section. The big
    # corpus (VERDICT r3 #1's target) goes first, then small, north star,
    # and the legacy jax/pallas checks last.

    # ---- 1. BIG corpus (64 genomes / 1.3M records) through the device-
    # resident schedule on the real chip: the ~200MB upload that
    # segfaulted the axon plugin ships as chunked device_puts
    # (parallel/mesh._put_chunked). First-ever compile of the big shape
    # takes 10-45+ min through the tunnel; skip with PANGENE_TPU_BIG=0.
    import gzip
    import tempfile
    from pangene_tpu.parallel import device_loop
    if os.environ.get("PANGENE_TPU_BIG", "1") != "0":
        big = os.path.join(tempfile.gettempdir(), "pg_bench_64_10000_7")
        if not os.path.exists(os.path.join(big, "done")):
            synth_paf_files(big, n_genome=64, n_gene=10000, n_iso=3, seed=7)
            open(os.path.join(big, "done"), "w").write("ok")
        bfiles = sorted(os.path.join(big, f) for f in os.listdir(big)
                        if f.endswith(".paf.gz"))
        n_big = sum(sum(1 for _ in gzip.open(f)) for f in bfiles)
        util.verbose = 3   # stderr progress — locates any plugin crash
        best = None
        rep_walls = []     # ALL rep walls: median is the robust claim
        rep_stages = []    # per-rep host+device stage walls (VERDICT r4 #2)
        for rep in range(int(os.environ.get("PANGENE_TPU_BIG_REPS", "3"))):
            util.stage_stats.clear()
            t0 = time.monotonic()
            buf = io.StringIO()
            pipeline.run(PgOpt(engine="sharded"), bfiles, out=buf)
            dt = time.monotonic() - t0
            assert device_loop.LAST.get("engaged"), device_loop.LAST
            md5_big = hashlib.md5(buf.getvalue().encode()).hexdigest()
            assert md5_big == "b988fc85e7633316be354ab315a0449c", md5_big
            rep_walls.append(round(dt, 2))
            L = device_loop.LAST
            rep_stages.append({k: L[k] for k in (
                "pack_s", "upload_s", "run_s", "pull_s") if k in L}
                | {"host": dict(util.stage_stats)})
            if best is None or dt < best[0]:
                best = (dt, dict(device_loop.LAST, host_stages=dict(
                    util.stage_stats)))
            srt = sorted(rep_walls)
            med = srt[len(srt) // 2] if len(srt) % 2 else \
                round((srt[len(srt) // 2 - 1] + srt[len(srt) // 2]) / 2, 2)
            out["big_corpus_sharded"] = {
                "n_records": n_big, "s": round(best[0], 2),
                "end_to_end_best": round(best[0], 2),
                "end_to_end_median": med,
                "rep_walls_s": rep_walls,
                "rep_stages": rep_stages,
                "records_per_s": round(n_big / best[0], 1),
                "md5": md5_big[:8],
                "reps": rep + 1,
                "breakdown": best[1],
            }
            out["checks"]["big_corpus_sharded_md5"] = "identical (%s)" \
                % md5_big[:8]
            _dump(out)   # after EVERY rep (first rep pays the compile)
        util.verbose = 0

    # ---- 2. sharded + host engines on the small bench corpus ----
    cache = os.path.join(tempfile.gettempdir(), "pg_bench_32_2000_11")
    if not os.path.exists(os.path.join(cache, "done")):
        synth_paf_files(cache, n_genome=32, n_gene=2000, n_iso=3, seed=11)
        open(os.path.join(cache, "done"), "w").write("ok")
    files = sorted(os.path.join(cache, f) for f in os.listdir(cache)
                   if f.endswith(".paf.gz"))
    n_rec = sum(sum(1 for _ in gzip.open(f)) for f in files)
    md5s = {}
    for engine, reps in (("sharded", 2), ("host", 2)):
        dt = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            buf = io.StringIO()
            pipeline.run(PgOpt(engine=engine), files, out=buf)
            rep_dt = time.monotonic() - t0
            md5s[engine] = hashlib.md5(buf.getvalue().encode()).hexdigest()
            if engine == "sharded":
                assert device_loop.LAST.get("engaged"), device_loop.LAST
                if rep_dt < dt:
                    # stage breakdown of the BEST rep (VERDICT r2 item 4):
                    # host stages (parse/post/phase-1/emit) + the device
                    # loop's pack/upload/run/pull split; on axon,
                    # block_until_ready is a no-op so any deferred upload
                    # time is charged to run_s
                    out["breakdown_small"] = dict(
                        device_loop.LAST, host_stages=dict(util.stage_stats))
            dt = min(dt, rep_dt)
        out["timings_s"]["bench_small_" + engine] = round(dt, 2)
        out["checks"]["records_per_s_" + engine] = round(n_rec / dt, 1)
    out["timing_note"] = (
        "the axon chip + tunnel are SHARED: the same cached sharded program "
        "has measured 5.8 s (steady state), 27.7 s (fresh process) and "
        ">1600 s (contention) on the 131k-record corpus; timings here are "
        "best-of-2 within one process and inherit that variance")
    assert md5s["sharded"] == md5s["host"] \
        == "4e077812357fa691683bea45c7831a8c", md5s
    out["checks"]["sharded_vs_host_md5"] = "identical (%s)" \
        % md5s["host"][:8]
    out["n_records"] = n_rec
    _dump(out)

    # ---- 3. NORTH STAR (100 haplotypes x 19k genes / 3.9M records, the
    # paper's headline workload, tex/pangene.tex:558) through the device
    # schedule on the real chip (VERDICT r3 item 6). Opt-in: the ~300 MB
    # chunked upload + a fresh compile of the 39936-hit shape make this a
    # multi-hour first run. md5 pinned by NORTHSTAR_MESH_northstar.json. ----
    if os.environ.get("PANGENE_TPU_NORTHSTAR", "0") == "1":
        ns = os.path.join(tempfile.gettempdir(), "pg_bench_100_19000_42")
        if not os.path.exists(os.path.join(ns, "done")):
            synth_paf_files(ns, n_genome=100, n_gene=19000, n_iso=3,
                            seed=42)
            open(os.path.join(ns, "done"), "w").write("ok")
        nfiles = sorted(os.path.join(ns, f) for f in os.listdir(ns)
                        if f.endswith(".paf.gz"))
        n_ns = sum(sum(1 for _ in gzip.open(f)) for f in nfiles)
        util.verbose = 3
        # >= 2 reps ALWAYS: rep 1 of a fresh shape pays trace + backend
        # compile INSIDE the device-loop run_s (round 4's "1893 s
        # north-star blowup" was exactly that ~30 min compile counted as
        # run time); the warm rep is the honest number.
        ns_walls = []
        best_ns = None
        for rep in range(int(os.environ.get("PANGENE_TPU_NS_REPS", "2"))):
            util.stage_stats.clear()
            t0 = time.monotonic()
            buf = io.StringIO()
            pipeline.run(PgOpt(engine="sharded"), nfiles, out=buf)
            dt = time.monotonic() - t0
            assert device_loop.LAST.get("engaged"), device_loop.LAST
            md5_ns = hashlib.md5(buf.getvalue().encode()).hexdigest()
            assert md5_ns == "9eccc87817f4450bab1ae54a0dac331a", md5_ns
            ns_walls.append(round(dt, 2))
            if best_ns is None or dt < best_ns[0]:
                best_ns = (dt, dict(device_loop.LAST, host_stages=dict(
                    util.stage_stats)))
            out["northstar_sharded"] = {
                "n_records": n_ns, "s": round(best_ns[0], 2),
                "rep_walls_s": ns_walls,
                "records_per_s": round(n_ns / best_ns[0], 1),
                "md5": md5_ns[:8],
                "breakdown": best_ns[1],
            }
            out["checks"]["northstar_sharded_md5"] = "identical (%s)" \
                % md5_ns[:8]
            _dump(out)
        util.verbose = 0

    # ---- 4. jax engine on C4, byte-identical ----
    golden = open(os.path.join(ROOT, "tests/golden/C4.gfa")).read()
    import glob
    c4 = sorted(glob.glob("/root/reference/test/C4/*.paf.gz"))
    t0 = time.monotonic()
    buf = io.StringIO()
    pipeline.run(PgOpt(engine="jax"), c4, out=buf)
    assert buf.getvalue() == golden, "jax engine C4 mismatch"
    out["checks"]["jax_engine_c4"] = "byte-identical"
    out["timings_s"]["jax_c4"] = round(time.monotonic() - t0, 2)
    _dump(out)

    # ---- 5. Pallas kernel: Mosaic compile + fuzz vs scalar oracle ----
    from pangene_tpu.core.data import DataSet, Genome
    from pangene_tpu.ops import sweep
    from pangene_tpu.ops.device import band_width
    from pangene_tpu.ops.pallas_sweep import (dyadic_ratio,
                                              shadow_pallas_genome)
    from test_pallas import build_cols
    from test_device_engine import random_genome

    t0 = time.monotonic()
    n_fuzz = 0
    for seed in range(6):
        rng = np.random.default_rng(seed)
        opt = PgOpt()
        d, g = random_genome(rng, n_hits=150 + 30 * seed,
                             weak=(seed % 2 == 0))
        d2 = DataSet.new()
        d2.__dict__.update({k: v for k, v in d.__dict__.items()
                            if k != "genomes"})
        g2 = Genome(g.label, g.ctg_names, g.ctg_len, g.hits.copy(),
                    g.exon_os.copy(), g.exon_oe.copy())
        d2.genomes = [g2]
        sweep.shadow(opt, d, g, cal_dom_sc=False)   # oracle
        cols, K = build_cols(d2, g2)
        W = band_width(g2.hits.cid, np.asarray(g2.hits.cs),
                       np.asarray(g2.hits.ce))
        p, k = dyadic_ratio(opt.min_ov_ratio)
        marks, has, other, ov = shadow_pallas_genome(
            cols, K, W, g2.n_hit, False, p, k, interpret=False)
        h2 = g2.hits
        nonflt = h2.flt == 0
        evaluated = nonflt.copy()
        evaluated[0] = False
        got = np.where(evaluated, marks,
                       (h2.shadow != 0) | marks).astype(np.uint8)
        assert np.array_equal(got, g.hits.shadow), seed
        n_fuzz += 1
    out["checks"]["pallas_mosaic_fuzz"] = "%d kernel runs vs oracle" % n_fuzz
    out["timings_s"]["pallas_fuzz"] = round(time.monotonic() - t0, 2)

    out["ok"] = True
    with open(os.path.join(ROOT, "TPU_GATE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
