#!/usr/bin/env python3
"""North-star-shape proof of the device-resident schedule on the CPU mesh.

Runs the FULL sharded pipeline (parallel/device_loop.py engaged — asserted,
not assumed) on a large corpus over the 8-virtual-device CPU mesh and
byte-compares the GFA against the host engine. Writes NORTHSTAR_MESH.json
at the repo root with the static shape, stage breakdown and md5 evidence
(VERDICT r2 item 3: the device loop was previously unproven beyond
32 genomes x 2k genes).

Usage (env must be set BEFORE the interpreter starts; sitecustomize pins
the axon topology):

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=/root/repo:$PYTHONPATH \
    python3 scripts/northstar_mesh.py [big|northstar]

Scales: big = 64 genomes x 10k genes (~1.3M records, the bench big corpus);
northstar = 100 haplotypes x 19k genes (~3.9M records, the paper's headline
workload, tex/pangene.tex:558).
"""
import hashlib
import io
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SCALES = {
    "big": (64, 10000, 3, 7),
    "northstar": (100, 19000, 3, 42),
}


def main() -> int:
    scale = sys.argv[1] if len(sys.argv) > 1 else "big"
    n_genome, n_gene, n_iso, seed = SCALES[scale]

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
    cache = os.path.join(tempfile.gettempdir(),
                         "pg_bench_%d_%d_%d" % (n_genome, n_gene, seed))
    if not os.path.exists(os.path.join(cache, "done")):
        synth_paf_files(cache, n_genome=n_genome, n_gene=n_gene,
                        n_iso=n_iso, seed=seed)
        open(os.path.join(cache, "done"), "w").write("ok")
    files = sorted(os.path.join(cache, f) for f in os.listdir(cache)
                   if f.endswith(".paf.gz"))
    import gzip
    n_rec = sum(sum(1 for _ in gzip.open(f)) for f in files)

    out = {"scale": scale, "n_genome": n_genome, "n_gene": n_gene,
           "n_records": n_rec, "n_devices": len(jax.devices()),
           "backend": "cpu-mesh"}

    t0 = time.monotonic()
    buf_h = io.StringIO()
    pipeline.run(PgOpt(engine="host"), files, out=buf_h)
    out["host_s"] = round(time.monotonic() - t0, 2)
    md5 = hashlib.md5(buf_h.getvalue().encode()).hexdigest()
    out["md5"] = md5

    t0 = time.monotonic()
    buf_s = io.StringIO()
    pipeline.run(PgOpt(engine="sharded"), files, out=buf_s)
    out["sharded_s"] = round(time.monotonic() - t0, 2)

    assert device_loop.LAST.get("engaged"), (
        "device loop did NOT engage: %s" % device_loop.LAST)
    assert buf_s.getvalue() == buf_h.getvalue(), "sharded GFA != host GFA"
    out["device_loop"] = device_loop.LAST
    out["sharded_md5_equal"] = True
    out["n_S"] = buf_h.getvalue().count("S\t")
    out["n_L"] = buf_h.getvalue().count("\nL\t")
    with open(os.path.join(ROOT, "NORTHSTAR_MESH_%s.json" % scale), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
