#!/usr/bin/env python3
"""Device-utilization number for the device-resident schedule (VERDICT r3
item 5: the busy-fraction / roofline "MFU analogue" for an integer,
memory-bound workload).

Runs the sharded pipeline once warm under jax.profiler.trace, parses the
chrome trace (the TPU device appears as its own pid; see round-3 notes:
pid 3 on this axon plugin), and reports:

  * busy_frac      — sum of device-op durations / device-loop run_s wall.
  * achieved GB/s  — bytes the round state demonstrably touches per round
                     (analytic lower bound from the static shapes: sweep
                     bit-planes + hit columns + the [Gp*2H] sort working
                     set times its ~log2 passes) over on-device time.
  * pct_of_memory_bound — achieved GB/s vs HBM peak (v5e ~819 GB/s).

The result is appended to TPU_GATE.json under "utilization".

Usage (real chip):
  PYTHONPATH=/root/repo:$PYTHONPATH python3 scripts/tpu_utilization.py [small|big]
"""
import glob
import gzip
import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SCALES = {"small": (32, 2000, 11), "big": (64, 10000, 7)}
HBM_PEAK_GBS = 819.0     # TPU v5e (v5 lite) HBM bandwidth


def analytic_bytes_per_round(shape, coord32):
    """Lower bound of bytes the schedule touches per executed round."""
    G, H, W, A = shape["Gp"], shape["H"], shape["W"], shape["A"]
    c = 4 if coord32 else 8
    planes = G * W * H              # u8 geometry planes, read once
    cols = G * H * (3 * 1 + 8 + c)  # flt/weak/shadow u8, pscore u64, coords
    sortN = G * 2 * H
    # lax.sort on TPU is a multi-pass merge: ~log2(N) passes over
    # (key i64 + 2 payloads), read+write
    sort_bytes = sortN * (8 + 8 + 4) * 2 * max(1, int(math.log2(max(sortN, 2))))
    seg = 6 * A * 8                 # segment reductions over the arc table
    return planes + cols + sort_bytes + seg


def main() -> int:
    scale = sys.argv[1] if len(sys.argv) > 1 else "small"
    n_genome, n_gene, seed = SCALES[scale]

    from pangene_tpu import pipeline, util
    from pangene_tpu.options import PgOpt
    from pangene_tpu.parallel import device_loop
    from pangene_tpu.testing import synth_paf_files
    import jax
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

    import io
    # warm run: compile + executable load outside the traced span
    pipeline.run(PgOpt(engine="sharded"), files, out=io.StringIO())
    assert device_loop.LAST.get("engaged"), device_loop.LAST

    tdir = tempfile.mkdtemp(prefix="pg_trace_")
    with jax.profiler.trace(tdir):
        pipeline.run(PgOpt(engine="sharded"), files, out=io.StringIO())
    last = dict(device_loop.LAST)
    assert last.get("engaged"), last

    # chrome trace: newest .trace.json.gz under tdir
    paths = sorted(glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    assert paths, "no trace written under %s" % tdir
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # device pids: process_name metadata containing "TPU"/"device"
    dev_pids = set()
    host_pids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "Device" in nm or "device" in nm:
                dev_pids.add(e["pid"])
            if "host" in nm.lower():
                host_pids.add(e["pid"])
    if not dev_pids:
        # fallback for unexpected plugin naming: any non-host pid that
        # carries complete events is a device lane
        dev_pids = {e["pid"] for e in ev
                    if e.get("ph") == "X"} - host_pids
    # busy time: per-pid UNION of complete-event intervals (a device core's
    # trace carries nested + parallel-lane spans; summing durations counted
    # overlap multiple times and produced busy_frac 3.5 — VERDICT r4 #3).
    # The union is a length of wall time in which >=1 device op ran, so
    # busy_frac = union / span is a true fraction in (0, 1].
    per_pid = {}
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            ts = float(e.get("ts", 0.0))
            per_pid.setdefault(e["pid"], []).append(
                (ts, ts + float(e.get("dur", 0.0))))

    def union_len(iv):
        iv.sort()
        tot = 0.0
        cur_s, cur_e = iv[0]
        for s, e in iv[1:]:
            if s > cur_e:
                tot += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        return tot + (cur_e - cur_s)

    busy_by_pid = {p: union_len(iv) for p, iv in per_pid.items()}
    busy_us = max(busy_by_pid.values()) if busy_by_pid else 0.0
    busy_s = busy_us / 1e6
    # span: first device-op start to last device-op end (the device-active
    # window of the traced pipeline run; host-only head/tail excluded)
    all_iv = [t for iv in per_pid.values() for t in iv]
    span_s = (max(e for _, e in all_iv) - min(s for s, _ in all_iv)) / 1e6 \
        if all_iv else 0.0

    run_s = last["run_s"]
    shape = last["shape"]
    rounds = last.get("rounds_sweep_run", shape["R"])
    bpr = analytic_bytes_per_round(shape, last.get("coord32", False))
    touched = bpr * max(rounds, 1)
    busy_frac = min(busy_s / span_s, 1.0) if span_s else 0.0
    achieved = touched / busy_s / 1e9 if busy_s else 0.0
    out = {
        "scale": scale,
        "run_s": run_s,
        "device_active_span_s": round(span_s, 3),
        "device_busy_s": round(busy_s, 3),
        "busy_frac": round(busy_frac, 3),
        "busy_frac_def": "union of device-op intervals / device-active "
                         "span (max across device pids)",
        # vs the device-loop wall: includes launch gaps + host glue
        # between executions (the span-based figure tautologically
        # approaches 1.0 when one lane's ops tile the trace)
        "busy_frac_of_run_s": round(min(busy_s / run_s, 1.0), 3)
        if run_s else 0.0,
        "device_pids": sorted(dev_pids),
        "analytic_bytes_per_round": bpr,
        "rounds_executed": rounds,
        "achieved_GBps_lower_bound": round(achieved, 1),
        "pct_of_memory_bound": round(100.0 * achieved / HBM_PEAK_GBS, 1),
        "hbm_peak_GBps": HBM_PEAK_GBS,
        "note": "bytes are an analytic LOWER bound on traffic (bit-planes"
                " + columns + ~log2 sort passes + arc-table reductions);"
                " real traffic is higher, so pct_of_memory_bound"
                " understates how memory-bound the schedule runs",
    }
    print("UTILIZATION " + json.dumps(out))
    gate_path = os.path.join(ROOT, "TPU_GATE.json")
    try:
        gate = json.load(open(gate_path))
    except Exception:
        gate = {}
    u = gate.get("utilization")
    if not isinstance(u, dict) or "scale" in u:
        u = {}   # drop the round-4 flat (and busy_frac>1) format
    u[scale] = out
    gate["utilization"] = u
    with open(gate_path, "w") as f:
        json.dump(gate, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
