#!/usr/bin/env python3
"""End-to-end graph-build throughput benchmark.

Metric: PAF records/s for the full pipeline (parse -> filters -> 15-round
graph schedule -> GFA emission) on a deterministic 32-genome / ~131k-record
synthetic corpus, byte-checked against the reference binary's output hash.

vs_baseline is PAIRED: the reference C binary (lh3/pangene v1.1-r231,
gcc -O2, single thread) is built into /tmp (cached) and re-timed on the
SAME corpus in the SAME run, interleaved with our reps, so shared-machine
load hits both sides (VERDICT r2: a fixed constant under-reported the
ratio under load). If the reference can't be built, the constant measured
unloaded in-container (131,485 records / 1.469 s = 89,507 rec/s) is used
and flagged.

The driver keeps only the LAST printed JSON line, so everything rides on
it as extra fields: `ref_paired` (the in-run reference measurement),
`big` (64-genome / 1.3M-record host + paired ref, when its corpus is
cached), and `sharded_tpu` (the device-resident schedule on the real chip,
with the device-loop stage breakdown). Child measurements run in fresh
subprocesses (jax does not survive fork; the shared chip has multi-minute
contention phases and must not stall the headline).
"""
import io
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# corpora: (n_genome, n_gene, seed, fallback reference-records/s measured
# unloaded in-container with the gcc -O2 build, expected output md5)
SCALES = {
    # 131,485 records; reference: 1.469 s
    "small": (32, 2000, 11, 89507.0, "4e077812357fa691683bea45c7831a8c"),
    # 1,314,156 records; reference: 20.34 s
    "big": (64, 10000, 7, 64609.0, "b988fc85e7633316be354ab315a0449c"),
}
SCALE = os.environ.get("PANGENE_BENCH_SCALE", "small")
N_GENOME, N_GENE, SEED, REF_FALLBACK_RPS, EXPECT_MD5 = SCALES[SCALE]

REF_SRC = "/root/reference"
REF_BIN = "/tmp/refbuild/pangene"


def ensure_ref():
    """Build the reference binary into /tmp (cached); None if impossible."""
    if os.path.exists(REF_BIN):
        return REF_BIN
    if not os.path.isdir(REF_SRC):
        return None
    os.makedirs("/tmp/refbuild", exist_ok=True)
    for f in os.listdir(REF_SRC):
        if f.endswith((".c", ".h")) or f == "Makefile":
            shutil.copy(os.path.join(REF_SRC, f), "/tmp/refbuild/")
    r = subprocess.run(["make", "-C", "/tmp/refbuild", "-s"],
                       capture_output=True)
    return REF_BIN if r.returncode == 0 and os.path.exists(REF_BIN) else None


def time_ref_once(files, check_md5):
    """One timed reference run on `files`; returns (dt, md5|None, stages).

    stages come from the reference's own [M::func::wall*cpu] stderr lines
    (sys.c discipline): the last pg_read_paf timestamp is the parse-done
    wall, the last pg_graph_gen timestamp the graph-done wall (VERDICT r4
    item 5: stage walls for BOTH sides of the paired ratio)."""
    import hashlib
    import re
    t0 = time.monotonic()
    r = subprocess.run([REF_BIN] + files,
                       stdout=subprocess.PIPE if check_md5
                       else subprocess.DEVNULL,
                       stderr=subprocess.PIPE)
    dt = time.monotonic() - t0
    assert r.returncode == 0
    stages = {}
    for fn, key in (("pg_read_paf", "parse_done_s"),
                    ("pg_post_process", "post_done_s"),
                    ("pg_graph_gen", "graph_done_s")):
        ts = re.findall(r"\[M::%s::([0-9.]+)\*" % fn, r.stderr.decode())
        if ts:
            stages[key] = float(ts[-1])
    md5 = hashlib.md5(r.stdout).hexdigest() if check_md5 else None
    return dt, md5, stages


def wait_gate_idle(max_wait=900):
    """Never overlap the bench with a running chip-evidence script (gate/
    roundprof/utilization/compile_split): round 4's big host ratio collapse
    coincided with a gate re-run 7 minutes before the bench. Returns the
    number of seconds waited (>=max_wait means we gave up and proceeded)."""
    import glob as _glob
    names = ("tpu_gate.py", "tpu_roundprof.py", "tpu_utilization.py",
             "compile_split.py", "tpu_gate_watchdog.sh")

    def busy():
        for p in _glob.glob("/proc/[0-9]*/cmdline"):
            try:
                cmd = open(p, "rb").read().decode(errors="replace")
            except OSError:
                continue
            if any(n in cmd for n in names):
                return True
        return False

    waited = 0
    while waited < max_wait and busy():
        time.sleep(15)
        waited += 15
    return waited


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
        synth_paf_files(cache, n_genome=N_GENOME, n_gene=N_GENE,
                        n_iso=3, seed=SEED)
        open(marker, "w").write("ok")
    files = sorted(os.path.join(cache, f) for f in os.listdir(cache)
                   if f.endswith(".paf.gz"))
    import gzip
    n_records = sum(sum(1 for _ in gzip.open(f)) for f in files)

    import hashlib

    engine = os.environ.get("PANGENE_BENCH_ENGINE", "host")
    is_child = os.environ.get("PANGENE_BENCH_CHILD") == "1"

    def run_ours_once():
        opt = PgOpt(engine=engine)
        out = io.StringIO()
        util.stage_stats.clear()
        t0 = time.monotonic()
        pipeline.run(opt, files, out=out)
        dt = time.monotonic() - t0
        md5 = hashlib.md5(out.getvalue().encode()).hexdigest()
        if md5 != EXPECT_MD5:
            sys.stderr.write("BENCH OUTPUT MISMATCH (%s): %s != %s\n"
                             % (engine, md5, EXPECT_MD5))
            sys.exit(1)
        return dt, dict(util.stage_stats)

    # ---- measure ours, interleaved with the paired reference ----
    # best-of-N against shared-machine load noise; interleaving means any
    # load phase hits both sides of the ratio. sharded: best-of-2 (first
    # rep pays per-process trace + compile-cache load); big: 1 rep + 1 ref
    if SCALE == "small":
        reps, ref_reps = (5, 3) if engine == "host" else (2, 0)
    else:
        # big: 2x2 interleaved (VERDICT r4 item 5: one rep per side made
        # the ratio a phase lottery; report all walls so drift is visible).
        # The sharded engine is paired too — the TPU-vs-reference claim
        # should be driver-visible, not gate-only (VERDICT r4 item 2).
        reps, ref_reps = 2, 2
    ref_bin = ensure_ref() if (ref_reps and not
                               os.environ.get("PANGENE_BENCH_NOREF")) \
        else None
    gate_wait = wait_gate_idle() if not is_child and not \
        os.environ.get("PANGENE_BENCH_NOWAIT") else 0
    dt = float("inf")
    best_stages = {}
    our_walls = []
    ref_walls = []
    ref_dt = float("inf")
    ref_md5 = None
    ref_stages = {}
    for i in range(max(reps, ref_reps)):
        if i < reps:
            d, stg = run_ours_once()
            our_walls.append(round(d, 3))
            if d < dt:
                dt, best_stages = d, stg
        if ref_bin and i < ref_reps:
            rdt, rmd5, rstg = time_ref_once(files, check_md5=(i == 0))
            ref_walls.append(round(rdt, 3))
            if rdt < ref_dt:
                ref_dt, ref_stages = rdt, rstg
            if rmd5 is not None:
                ref_md5 = rmd5
                assert rmd5 == EXPECT_MD5, (
                    "reference output drifted: %s" % rmd5)
    rate = n_records / dt

    result = {
        "engine": engine, "scale": SCALE, "n_genomes": N_GENOME,
        "n_records": n_records, "s": round(dt, 3),
        "rep_walls_s": our_walls,
        "stage_walls_s": best_stages,
        "records_per_s": round(rate, 1), "md5": EXPECT_MD5[:8],
    }
    if gate_wait:
        result["waited_for_gate_s"] = gate_wait
    if ref_bin and ref_reps:
        result["ref_paired"] = {
            "records_per_s": round(n_records / ref_dt, 1),
            "s": round(ref_dt, 3), "reps": ref_reps,
            "rep_walls_s": ref_walls,
            "stage_walls_s": ref_stages,
            "md5_checked": ref_md5 == EXPECT_MD5,
        }
        result["vs_ref_paired"] = round(rate / (n_records / ref_dt), 4)
    if engine == "sharded":
        # compact breakdown (the driver keeps only the final JSON line
        # plus a short tail — every byte of the headline counts)
        from pangene_tpu.parallel import device_loop
        L = device_loop.LAST
        result["device_loop"] = {
            k: L[k] for k in ("engaged", "pack_s", "upload_s", "run_s",
                              "pull_s") if k in L}
        result["host_stages"] = dict(util.stage_stats)
    if is_child:
        print(json.dumps(result))
        return

    # ---- parent mode: collect child lines, then print ONE final line ----
    def child(env_extra, timeout):
        env = dict(os.environ, PANGENE_BENCH_CHILD="1", **env_extra)
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=timeout,
                               stdout=subprocess.PIPE)
            lines = [l for l in r.stdout.decode().splitlines() if l.strip()]
            return json.loads(lines[-1]) if lines else None
        except (subprocess.TimeoutExpired, ValueError):
            return None

    extras = {}
    big_cache = os.path.join(tempfile.gettempdir(), "pg_bench_64_10000_7")
    have_big = os.path.exists(os.path.join(big_cache, "done"))
    if engine == "host" and SCALE == "small" \
            and os.environ.get("PANGENE_BENCH_BIG", "auto") != "0" \
            and have_big:
        got = child({"PANGENE_BENCH_SCALE": "big",
                     "PANGENE_BENCH_SHARDED": "0"}, 900)
        if got:
            extras["big"] = got
    want_sharded = os.environ.get("PANGENE_BENCH_SHARDED", "auto")
    if engine == "host" and SCALE == "small" and want_sharded != "0":
        # backend detection in a BOUNDED subprocess: the axon client init
        # is unbounded in bad tunnel phases (measured >15 min) and must
        # never stall the headline host measurement
        try:
            has_tpu = subprocess.run(
                [sys.executable, "-c",
                 "import jax,sys;"
                 "sys.exit(0 if jax.default_backend()!='cpu' else 1)"],
                timeout=300, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL).returncode == 0
        except Exception:
            has_tpu = False
        if has_tpu or want_sharded == "1":
            budget = int(os.environ.get("PANGENE_BENCH_SHARDED_TIMEOUT",
                                        "1200"))
            # measure at BIG scale when its corpus is cached: that is the
            # scale where the device schedule beats the reference (the
            # paired ratio at small is latency-bound by design)
            senv = {"PANGENE_BENCH_ENGINE": "sharded"}
            if have_big:
                senv["PANGENE_BENCH_SCALE"] = "big"
            got = child(senv, budget)
            if got is None:
                # contention: report the last-known-good on-chip run from
                # the committed gate artifact instead of nothing
                lkg = {"skipped_live": "exceeded %ds (shared-chip "
                                       "contention)" % budget}
                try:
                    gate_path = os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "TPU_GATE.json")
                    gate = json.load(open(gate_path))
                    sec = gate.get("big_corpus_sharded") if have_big \
                        else None
                    if sec:
                        lkg["last_known_good"] = {
                            k: sec[k] for k in
                            ("s", "end_to_end_median", "rep_walls_s",
                             "md5", "reps", "n_records") if k in sec}
                    elif "bench_small_sharded" in gate.get("timings_s", {}):
                        lkg["last_known_good"] = {
                            "s": gate["timings_s"]["bench_small_sharded"],
                            "scale": "small"}
                    import datetime
                    lkg["recorded_utc"] = datetime.datetime.utcfromtimestamp(
                        os.path.getmtime(gate_path)).isoformat() + "Z"
                    lkg["source"] = "TPU_GATE.json"
                    # paired ratio from the big host leg's in-run reference
                    ref = extras.get("big", {}).get("ref_paired", {})
                    s = lkg.get("last_known_good", {}).get(
                        "end_to_end_median") or lkg.get(
                        "last_known_good", {}).get("s")
                    if ref.get("s") and s and have_big:
                        lkg["vs_ref_paired"] = round(ref["s"] / s, 4)
                        lkg["vs_ref_paired_note"] = (
                            "gate median vs this run's paired reference")
                except Exception:
                    pass
                extras["sharded_tpu"] = lkg
            else:
                extras["sharded_tpu"] = got

    if "ref_paired" in result:
        vs = result["vs_ref_paired"]
        baseline_kind = "ref_paired"
    else:
        vs = rate / REF_FALLBACK_RPS
        baseline_kind = "fixed_constant_unloaded"
    line = {
        "metric": "paf_records_per_s_end_to_end",
        "value": round(rate, 1),
        "unit": "records/s (%d genomes, %d records, engine=%s, md5=%s)"
                % (N_GENOME, n_records, engine, EXPECT_MD5[:8]),
        "vs_baseline": round(vs, 4),
        "baseline_kind": baseline_kind,
        "vs_fixed_baseline": round(rate / REF_FALLBACK_RPS, 4),
        "host_small": result,
    }
    line.update(extras)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
