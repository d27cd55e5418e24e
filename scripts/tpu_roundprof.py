#!/usr/bin/env python3
"""Attribute the device-resident schedule's on-chip time to its round
blocks WITHOUT recompiling: do_branch / do_occ are runtime inputs, so
zeroing them (PANGENE_DEVLOOP_DISABLE) runs the SAME cached executable
with lax.cond skipping the block. Differences in the device-loop `run_s`
attribute time to {branch marking + weak propagation} vs {annealed
high-occ} vs {sweep + walk/merge} (the always-on remainder).

Run on the real chip:  PYTHONPATH=/root/repo:$PYTHONPATH \
    python scripts/tpu_roundprof.py [small|big]
Output md5 is NOT asserted for disabled variants (they are not the
reference schedule); the baseline variant is.
"""
import io
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SCALES = {"small": (32, 2000, 11), "big": (64, 10000, 7),
          "northstar": (100, 19000, 42)}
# 2 reps everywhere: rep 1 of a FRESH shape pays trace + backend compile
# INSIDE run_s (the lesson of the round-4 "1893 s north-star blowup" —
# it was ~30 min of compile counted as run time, not a scaling
# pathology); best-of-2 reports the warm executable.
REPS = {"small": 2, "big": 2, "northstar": 2}


def one_variant(scale, disable):
    """Run in a fresh subprocess (jax state) and return its device_loop
    LAST dict + wall."""
    code = """
import io, json, os, sys, time
sys.path.insert(0, %r)
from pangene_tpu import pipeline, util
from pangene_tpu.options import PgOpt
from pangene_tpu.parallel import device_loop
util.verbose = 0
import tempfile
n_genome, n_gene, seed = %r
cache = os.path.join(tempfile.gettempdir(),
                     "pg_bench_%%d_%%d_%%d" %% (n_genome, n_gene, seed))
files = sorted(os.path.join(cache, f) for f in os.listdir(cache)
               if f.endswith(".paf.gz"))
best = None
for _ in range(%r):   # first rep pays trace + executable load
    t0 = time.monotonic()
    buf = io.StringIO()
    pipeline.run(PgOpt(engine="sharded"), files, out=buf)
    w = time.monotonic() - t0
    if best is None or w < best[0]:
        best = (w, dict(device_loop.LAST))
assert best[1].get("engaged"), best[1]
print("RESULT " + json.dumps({"wall": round(best[0], 2), "last": best[1]}))
""" % (ROOT, SCALES[scale], REPS[scale])
    env = dict(os.environ)
    if disable:
        env["PANGENE_DEVLOOP_DISABLE"] = disable
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                       timeout=14400 if scale == "northstar" else 3600)
    for line in r.stdout.decode().splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError("variant %r failed rc=%d" % (disable, r.returncode))


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "small"
    # corpus must exist before the measuring subprocesses run
    import tempfile
    n_genome, n_gene, seed = SCALES[scale]
    cache = os.path.join(tempfile.gettempdir(),
                         "pg_bench_%d_%d_%d" % (n_genome, n_gene, seed))
    if not os.path.exists(os.path.join(cache, "done")):
        from pangene_tpu.testing import synth_paf_files
        synth_paf_files(cache, n_genome=n_genome, n_gene=n_gene, n_iso=3,
                        seed=seed)
        open(os.path.join(cache, "done"), "w").write("ok")
    out = {"scale": scale}
    # baseline has convergence skipping ACTIVE; "conv" defeats it (still
    # reference-exact — recomputing unchanged rounds is the r3 behavior);
    # the block disables run on top of no-skip so every round pays the
    # block and the delta attributes per-block cost.
    path = os.environ.get("PANGENE_ROUNDPROF_OUT", os.path.join(
        ROOT, "TPU_ROUNDPROF.json" if scale == "small"
        else "TPU_ROUNDPROF_%s.json" % scale))
    # order is most-diagnostic-first (the artifact is dumped after every
    # variant and a tunnel phase can end): walk/merge dominated the big-
    # shape chip attribution (5.65 of 9.0 s), so it follows no_skip.
    for name, dis in (("baseline", ""), ("no_skip", "conv"),
                      ("noskip_no_walk", "conv,walk"),
                      ("noskip_no_branch", "conv,branch"),
                      ("noskip_no_sweep", "conv,sweep"),
                      ("noskip_no_occ", "conv,occ")):
        got = one_variant(scale, dis)
        out[name] = {"wall": got["wall"],
                     "run_s": got["last"].get("run_s"),
                     "upload_s": got["last"].get("upload_s"),
                     "pull_s": got["last"].get("pull_s"),
                     "rounds_branch_run": got["last"].get("rounds_branch_run"),
                     "rounds_sweep_run": got["last"].get("rounds_sweep_run")}
        print(name, out[name], flush=True)
        with open(path, "w") as f:     # incremental: a plugin crash after
            json.dump(out, f, indent=1)  # N variants keeps N results
    base = out["no_skip"]["run_s"]
    out["attribution_s"] = {
        "skip_win": round(base - out["baseline"]["run_s"], 2),
        "branch_blocks": round(base - out["noskip_no_branch"]["run_s"], 2),
        "occ_blocks": round(base - out["noskip_no_occ"]["run_s"], 2),
        "sweep_blocks": round(base - out["noskip_no_sweep"]["run_s"], 2),
        "walk_merge_blocks": round(base - out["noskip_no_walk"]["run_s"], 2),
    }
    print(json.dumps(out, indent=1))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
