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
    """One timed reference run on `files`; returns (dt, md5|None)."""
    import hashlib
    t0 = time.monotonic()
    if check_md5:
        r = subprocess.run([REF_BIN] + files, stdout=subprocess.PIPE,
                           stderr=subprocess.DEVNULL)
        dt = time.monotonic() - t0
        assert r.returncode == 0
        return dt, hashlib.md5(r.stdout).hexdigest()
    with open(os.devnull, "wb") as null:
        r = subprocess.run([REF_BIN] + files, stdout=null,
                           stderr=subprocess.DEVNULL)
    dt = time.monotonic() - t0
    assert r.returncode == 0
    return dt, None


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
        t0 = time.monotonic()
        pipeline.run(opt, files, out=out)
        dt = time.monotonic() - t0
        md5 = hashlib.md5(out.getvalue().encode()).hexdigest()
        if md5 != EXPECT_MD5:
            sys.stderr.write("BENCH OUTPUT MISMATCH (%s): %s != %s\n"
                             % (engine, md5, EXPECT_MD5))
            sys.exit(1)
        return dt

    # ---- measure ours, interleaved with the paired reference ----
    # best-of-N against shared-machine load noise; interleaving means any
    # load phase hits both sides of the ratio. sharded: best-of-2 (first
    # rep pays per-process trace + compile-cache load); big: 1 rep + 1 ref
    if SCALE == "small":
        reps, ref_reps = (5, 3) if engine == "host" else (2, 0)
    else:
        reps, ref_reps = 1, 1
    ref_bin = ensure_ref() if (engine == "host" and not
                               os.environ.get("PANGENE_BENCH_NOREF")) \
        else None
    dt = float("inf")
    ref_dt = float("inf")
    ref_md5 = None
    for i in range(max(reps, ref_reps)):
        if i < reps:
            dt = min(dt, run_ours_once())
        if ref_bin and i < ref_reps:
            rdt, rmd5 = time_ref_once(files, check_md5=(i == 0))
            ref_dt = min(ref_dt, rdt)
            if rmd5 is not None:
                ref_md5 = rmd5
                assert rmd5 == EXPECT_MD5, (
                    "reference output drifted: %s" % rmd5)
    rate = n_records / dt

    result = {
        "engine": engine, "scale": SCALE, "n_genomes": N_GENOME,
        "n_records": n_records, "s": round(dt, 3),
        "records_per_s": round(rate, 1), "md5": EXPECT_MD5[:8],
    }
    if ref_bin and ref_reps:
        result["ref_paired"] = {
            "records_per_s": round(n_records / ref_dt, 1),
            "s": round(ref_dt, 3), "reps": ref_reps,
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
            got = child({"PANGENE_BENCH_ENGINE": "sharded"}, budget)
            if got is None:
                extras["sharded_tpu"] = {
                    "skipped": "exceeded %ds (shared-chip contention)"
                               % budget}
            else:
                extras["sharded_tpu"] = got
    if engine == "host" and SCALE == "small" \
            and os.environ.get("PANGENE_BENCH_BIG", "auto") != "0":
        big_cache = os.path.join(tempfile.gettempdir(), "pg_bench_64_10000_7")
        if os.path.exists(os.path.join(big_cache, "done")):
            got = child({"PANGENE_BENCH_SCALE": "big",
                         "PANGENE_BENCH_SHARDED": "0"}, 600)
            if got:
                extras["big"] = got

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
