#!/usr/bin/env python3
"""Mesh-scaling demonstration on the virtual CPU mesh (VERDICT r3 #7).

Runs a FIXED 64-genome corpus through the sharded engine at n_devices =
1, 2, 4, 8 on the 8-virtual-device CPU mesh and records the device-loop
stage walls per count, asserting byte-identity against the host engine at
every count. Writes MESH_SCALING.json.

What this can and cannot show on a 1-core box: all virtual devices share
one core, so wall time does NOT drop with device count. What it DOES
show: (a) the per-genome blocks really split — per-shard [Gl, H] shapes
shrink with the count (recorded), so constant total run_s across counts
means the sharded work is O(total) not O(devices * total); (b) the
replicated blocks (arc table, branch locality, merge) are duplicated per
device — their growth with count is visible as run_s inflation and is
reported as replicated_overhead; (c) any replicated-work bug (per-genome
work accidentally run on every shard) would show as run_s scaling with
device count. True ICI scaling needs real chips; the sharding layout this
validates is the one the driver's dryrun_multichip compiles.

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=/root/repo:$PYTHONPATH python3 scripts/mesh_scaling.py
"""
import hashlib
import io
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_GENOME, N_GENE, N_ISO, SEED = 64, 2000, 3, 11


def main() -> int:
    import jax
    assert jax.default_backend() == "cpu" and len(jax.devices()) >= 8, (
        "run under: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8")

    from pangene_tpu import pipeline, util
    from pangene_tpu.options import PgOpt
    from pangene_tpu.parallel import device_loop
    from pangene_tpu.testing import synth_paf_files
    util.verbose = 0

    import tempfile
    cache = os.path.join(tempfile.gettempdir(), "pg_bench_%d_%d_%d"
                         % (N_GENOME, N_GENE, SEED))
    if not os.path.exists(os.path.join(cache, "done")):
        synth_paf_files(cache, n_genome=N_GENOME, n_gene=N_GENE,
                        n_iso=N_ISO, seed=SEED)
        open(os.path.join(cache, "done"), "w").write("ok")
    files = sorted(os.path.join(cache, f) for f in os.listdir(cache)
                   if f.endswith(".paf.gz"))

    buf_h = io.StringIO()
    pipeline.run(PgOpt(engine="host"), files, out=buf_h)
    ref = buf_h.getvalue()
    out = {"n_genome": N_GENOME, "n_gene": N_GENE,
           "md5": hashlib.md5(ref.encode()).hexdigest(),
           "backend": "cpu-mesh-1core", "counts": {}}

    # reps INTERLEAVED across counts: the 1-core container's speed drifts
    # tens of % across the minutes a sequential sweep takes, which once
    # inverted the count-8 vs count-1 comparison. Pass 1 pays each
    # count's compile; passes 2-3 are warm and phase-paired.
    best = {}
    for rep in range(3):
        for nd in (1, 2, 4, 8):
            t0 = time.monotonic()
            buf = io.StringIO()
            pipeline.run(PgOpt(engine="sharded", n_devices=nd), files,
                         out=buf)
            w = time.monotonic() - t0
            assert device_loop.LAST.get("engaged"), device_loop.LAST
            assert buf.getvalue() == ref, "GFA mismatch at n_devices=%d" % nd
            last = dict(device_loop.LAST)
            if nd not in best or last["run_s"] < best[nd]["run_s"]:
                best[nd] = {"wall": round(w, 2), **{k: last[k] for k in
                            ("pack_s", "upload_s", "run_s", "pull_s",
                             "rounds_branch_run", "rounds_sweep_run")},
                            "G_per_shard": last["shape"]["Gp"] // nd,
                            "shard_merge": last.get("shard_merge")}
            out["counts"][nd] = best[nd]
            print(rep, nd, best[nd], flush=True)
        with open(os.path.join(ROOT, "MESH_SCALING.json"), "w") as f:
            json.dump(out, f, indent=1)

    r1 = out["counts"][1]["run_s"]
    r8 = out["counts"][8]["run_s"]
    # on one shared core, per-genome work is count-invariant; run_s growth
    # with count is the replicated-block duplication
    out["replicated_overhead_8dev"] = round((r8 - r1) / max(r1, 1e-9), 3)
    out["byte_identical_all_counts"] = True

    # ---- overhead decomposition at nd 1 vs 8 (interleaved, no_skip) ----
    # The 1-core proxy SERIALIZES the shards, so the bucket-exchange
    # merge (round 5) can never show as a win here: its total key-sort
    # work across shards is ~(1 + slack)/nd * nd = ~2.5N vs the single
    # N-key sort at nd=1, even though per-shard (= real-chip wall) work
    # drops ~nd/(1+slack)x. This section separates (a) that serialized
    # exchange work, (b) the XLA-CPU collective rendezvous floor
    # (measured with walk+branch both disabled: only the per-round [2]
    # convergence psum + loop plumbing remain), from (c) genuinely
    # replicated compute.
    dec = {}
    for rep in range(2):
        for nd in (1, 8):
            for dis in ("conv", "conv,walk", "conv,branch",
                        "conv,walk,branch"):
                os.environ["PANGENE_DEVLOOP_DISABLE"] = dis
                buf = io.StringIO()
                pipeline.run(PgOpt(engine="sharded", n_devices=nd), files,
                             out=buf)
                k = "nd%d_%s" % (nd, dis)
                dec[k] = min(dec.get(k, 1e9), device_loop.LAST["run_s"])
    os.environ.pop("PANGENE_DEVLOOP_DISABLE", None)
    out["decomposition_noskip"] = {k: round(v, 3) for k, v in dec.items()}
    out["sync_floor_8dev_s"] = round(
        dec["nd8_conv,walk,branch"] - dec["nd1_conv,walk,branch"], 3)
    out["walk_block_s"] = {
        "nd1": round(dec["nd1_conv,branch"] - dec["nd1_conv,walk,branch"], 3),
        "nd8_exchange": round(
            dec["nd8_conv,branch"] - dec["nd8_conv,walk,branch"], 3)}
    out["branch_block_s"] = {
        "nd1": round(dec["nd1_conv"] - dec["nd1_conv,branch"], 3),
        "nd8": round(dec["nd8_conv"] - dec["nd8_conv,branch"], 3)}
    out["note"] = (
        "run_s growth with count on ONE core = serialized per-shard work"
        " + emulated collective sync; the round-5 bucket-exchange merge"
        " cuts per-shard sort keys ~nd/(1+slack)x (the real-chip wall"
        " quantity) and total walk-block time vs the replicated form at"
        " nd=8, but adds ~1.5x total key-sort work vs nd=1 when"
        " serialized — the residual overhead here is that serialization"
        " plus sync_floor_8dev_s, not duplicated per-genome compute")
    with open(os.path.join(ROOT, "MESH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
