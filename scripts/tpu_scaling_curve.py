#!/usr/bin/env python3
"""TPU crossover curve (VERDICT r4 item 8): the sharded (device-resident)
engine vs the host engine vs the paired reference binary at three corpus
sizes — 131k / ~493k / 1.3M records — on the real chip, same program
family, warm persistent cache after the first compile per shape.

Turns "the TPU engine is for pod scale" into a measured crossover record
count: below it the host engine wins (the device loop is latency-bound),
above it the device schedule wins.

Writes TPU_GATE.json["scaling_curve"] incrementally (per point, per rep).

Usage (real chip): PYTHONPATH=/root/repo:$PYTHONPATH \
    python3 scripts/tpu_scaling_curve.py
"""
import hashlib
import io
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# (n_genome, n_gene, seed): small and big reuse the bench corpora (and the
# gate's warm compile cache); mid is generated once and cached in /tmp
POINTS = [("small", 32, 2000, 11),
          ("mid", 48, 5000, 13),
          ("big", 64, 10000, 7)]
REF_BIN = "/tmp/refbuild/pangene"


def ensure_ref():
    import shutil
    if os.path.exists(REF_BIN):
        return True
    if not os.path.isdir("/root/reference"):
        return False
    os.makedirs("/tmp/refbuild", exist_ok=True)
    for f in os.listdir("/root/reference"):
        if f.endswith((".c", ".h")) or f == "Makefile":
            shutil.copy(os.path.join("/root/reference", f), "/tmp/refbuild/")
    r = subprocess.run(["make", "-C", "/tmp/refbuild", "-s"],
                       capture_output=True)
    return r.returncode == 0 and os.path.exists(REF_BIN)


def main() -> int:
    import gzip
    import tempfile

    import jax
    assert jax.default_backend() != "cpu", "run on the axon chip"

    from pangene_tpu import pipeline, util
    from pangene_tpu.options import PgOpt
    from pangene_tpu.parallel import device_loop
    from pangene_tpu.testing import synth_paf_files
    util.verbose = 0

    gate_path = os.path.join(ROOT, "TPU_GATE.json")

    def dump(curve):
        try:
            gate = json.load(open(gate_path))
        except Exception:
            gate = {}
        gate["scaling_curve"] = curve
        with open(gate_path, "w") as f:
            json.dump(gate, f, indent=1)

    have_ref = ensure_ref()
    curve = {"points": {}, "note": (
        "interleaved sharded/host/reference reps per point; sharded rep 1 "
        "pays compile (excluded from best), md5 cross-checked across all "
        "three")}
    # resumable: completed points from an earlier (killed) run are kept,
    # and `argv[1:]` selects which points to (re)run — lets a short tunnel
    # window prioritize e.g. the big point without losing the small one
    try:
        curve["points"].update(
            json.load(open(gate_path))["scaling_curve"]["points"])
    except Exception:
        pass
    want = set(sys.argv[1:])
    points = [p for p in POINTS if not want or p[0] in want]
    for name, ngen, ngene, seed in points:
        cache = os.path.join(tempfile.gettempdir(),
                             "pg_bench_%d_%d_%d" % (ngen, ngene, seed))
        if not os.path.exists(os.path.join(cache, "done")):
            synth_paf_files(cache, n_genome=ngen, n_gene=ngene, n_iso=3,
                            seed=seed)
            open(os.path.join(cache, "done"), "w").write("ok")
        files = sorted(os.path.join(cache, f) for f in os.listdir(cache)
                       if f.endswith(".paf.gz"))
        n_rec = sum(sum(1 for _ in gzip.open(f)) for f in files)
        pt = {"n_records": n_rec, "n_genomes": ngen}
        md5s = {}
        walls = {"sharded": [], "host": [], "ref": []}
        for rep in range(3):
            for eng in ("sharded", "host"):
                t0 = time.monotonic()
                buf = io.StringIO()
                pipeline.run(PgOpt(engine=eng), files, out=buf)
                walls[eng].append(round(time.monotonic() - t0, 2))
                md5s[eng] = hashlib.md5(buf.getvalue().encode()).hexdigest()
                if eng == "sharded":
                    assert device_loop.LAST.get("engaged"), device_loop.LAST
                    pt["run_s_last"] = device_loop.LAST["run_s"]
            if have_ref and rep < 2:
                t0 = time.monotonic()
                r = subprocess.run([REF_BIN] + files, stdout=subprocess.PIPE,
                                   stderr=subprocess.DEVNULL)
                walls["ref"].append(round(time.monotonic() - t0, 2))
                md5s["ref"] = hashlib.md5(r.stdout).hexdigest()
            pt["rep_walls_s"] = walls
            # sharded rep 1 pays the fresh compile; best-of-warm
            pt["sharded_s"] = min(walls["sharded"][1:] or walls["sharded"])
            pt["host_s"] = min(walls["host"])
            if walls["ref"]:
                pt["ref_s"] = min(walls["ref"])
                pt["sharded_vs_ref"] = round(pt["ref_s"] / pt["sharded_s"], 3)
                pt["host_vs_ref"] = round(pt["ref_s"] / pt["host_s"], 3)
            assert len(set(md5s.values())) == 1, md5s
            pt["md5"] = md5s["host"][:8]
            curve["points"][name] = pt
            dump(curve)
            print(name, "rep", rep, pt, flush=True)
    # crossover: the record count where sharded_s first <= host_s
    xs = [(p["n_records"], p["sharded_s"], p["host_s"])
          for p in curve["points"].values()]
    xs.sort()
    cross = next((n for n, s, h in xs if s <= h), None)
    curve["crossover_records_sharded_beats_host"] = cross
    dump(curve)
    print(json.dumps(curve, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
