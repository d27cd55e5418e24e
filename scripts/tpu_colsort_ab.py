#!/usr/bin/env python3
"""Chip A/B for the round-5 device-side levers, big corpus:

  * columnsort lean merge (PANGENE_DEVLOOP_COLSORT=1: changes the HLO,
    variant rep 1 pays a fresh compile — excluded by best-of-reps)
  * indices_are_sorted segment lowering rides the same recompile
  * parallel chunked transfers (PANGENE_PARALLEL_TRANSFER=2: host-side
    only, no recompile)

Each variant runs in a fresh subprocess (jax state), 2 reps, best rep
kept with the device-loop stage split. Writes TPU_COLSORT_AB.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python3 scripts/tpu_colsort_ab.py
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CODE = """
import io, json, os, sys, time
sys.path.insert(0, %r)
from pangene_tpu import pipeline, util
from pangene_tpu.options import PgOpt
from pangene_tpu.parallel import device_loop
util.verbose = 0
import tempfile
cache = os.path.join(tempfile.gettempdir(), "pg_bench_64_10000_7")
files = sorted(os.path.join(cache, f) for f in os.listdir(cache)
               if f.endswith(".paf.gz"))
best = None
walls = []
for _ in range(2):
    t0 = time.monotonic()
    buf = io.StringIO()
    pipeline.run(PgOpt(engine="sharded"), files, out=buf)
    w = time.monotonic() - t0
    walls.append(round(w, 2))
    L = dict(device_loop.LAST)
    assert L.get("engaged"), L
    if best is None or L["run_s"] < best["run_s"]:
        best = {k: L[k] for k in ("pack_s", "upload_s", "run_s", "pull_s")}
        best["wall"] = round(w, 2)
import hashlib
best["md5"] = hashlib.md5(buf.getvalue().encode()).hexdigest()[:8]
best["walls"] = walls
print("RESULT " + json.dumps(best))
""" % (ROOT,)

VARIANTS = [
    ("baseline", {}),
    ("ptransfer2", {"PANGENE_PARALLEL_TRANSFER": "2"}),
    ("colsort", {"PANGENE_DEVLOOP_COLSORT": "1"}),
    ("colsort_ptransfer2", {"PANGENE_DEVLOOP_COLSORT": "1",
                            "PANGENE_PARALLEL_TRANSFER": "2"}),
]


def main() -> int:
    out = {}
    path = os.path.join(ROOT, "TPU_COLSORT_AB.json")
    for name, envx in VARIANTS:
        env = dict(os.environ, **envx)
        r = subprocess.run([sys.executable, "-c", CODE], env=env,
                           stdout=subprocess.PIPE,
                           stderr=subprocess.DEVNULL, timeout=7200)
        got = None
        for line in r.stdout.decode().splitlines():
            if line.startswith("RESULT "):
                got = json.loads(line[7:])
        if got is None:
            out[name] = {"error": "rc=%d" % r.returncode}
        else:
            assert got["md5"] == "b988fc85", got
            out[name] = got
        print(name, out[name], flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
