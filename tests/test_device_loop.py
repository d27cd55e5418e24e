"""Device-resident schedule (parallel/device_loop.py) equivalence tests.

The whole phase-2+3 round loop — branch marking, weak propagation, annealed
high-occ filtering, arc regeneration with the two-level exact merge — runs
as ONE jitted program over the 8-virtual-device CPU mesh and must produce
byte-identical GFA to the host engine for every option set. The softfloat
predicates make this exact by construction; these tests are the
end-to-end proof.
"""
import io
import os

import pytest

from pangene_tpu import pipeline, util
from pangene_tpu.options import (PG_F_CHECK_STRAND, PG_F_FRAG_MODE,
                                 PG_F_ORI_FOR_BRANCH, PgOpt)
from pangene_tpu.testing import synth_paf_files


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("devloop")
    synth_paf_files(str(d), n_genome=10, n_gene=250, n_iso=3, seed=17)
    return sorted(str(p) for p in d.iterdir() if str(p).endswith(".paf.gz"))


def run(files, engine, **kw):
    util.verbose = 0
    opt = PgOpt(engine=engine)
    for k, v in kw.items():
        setattr(opt, k, v)
    out = io.StringIO()
    pipeline.run(opt, files, out=out)
    return out.getvalue()


def test_c4_devloop_bit_identical(c4_pafs, golden_dir):
    got = run(c4_pafs, "sharded")
    assert got == (golden_dir / "C4.gfa").read_text()


@pytest.mark.parametrize("kw", [
    {},
    {"min_ov_ratio": 0.3},
    {"max_avg_occ": 2, "max_degree": 4, "max_dist_loci": 1},
    {"branch_diff": 0.001, "branch_diff_cut": 0.1, "branch_diff_dist": 0.01},
    {"min_arc_cnt": 2},
    {"n_branch_flt": 0},
    {"n_branch_flt": 1},
    {"n_branch_flt": 3},
    {"local_dist": 100000, "local_count": 2},
    # combined: several softfloat predicates + capacity pressure at once
    {"min_ov_ratio": 0.3, "max_degree": 5, "branch_diff": 0.005,
     "branch_diff_dist": 0.02, "n_branch_flt": 7},
])
def test_devloop_matches_host(corpus, kw):
    assert run(corpus, "sharded", **kw) == run(corpus, "host", **kw)


@pytest.mark.parametrize("flag", [PG_F_CHECK_STRAND, PG_F_ORI_FOR_BRANCH,
                                  PG_F_FRAG_MODE])
def test_devloop_matches_host_flags(corpus, flag):
    kw = {"flag": PgOpt().flag | flag}
    assert run(corpus, "sharded", **kw) == run(corpus, "host", **kw)


def test_devloop_disabled_env_fallback(corpus, monkeypatch):
    """PANGENE_DEVICE_LOOP=0 forces the per-round sharded path; output is
    still byte-identical (shard-count independence of the exact merge)."""
    monkeypatch.setenv("PANGENE_DEVICE_LOOP", "0")
    assert run(corpus, "sharded") == run(corpus, "host")


def test_devloop_jb_fallback(corpus, monkeypatch):
    """The co-sorted lean-merge fallback (JB=0: key bits exhausted by
    2B+GB at huge S) stays byte-identical to the packed-row-index path."""
    monkeypatch.setenv("PANGENE_DEVLOOP_NO_JB", "1")
    from pangene_tpu.parallel import device_loop
    out = run(corpus, "sharded")
    assert device_loop.LAST.get("engaged")
    assert out == run(corpus, "host")


def test_devloop_verbose_del_logs(corpus, capsys):
    """verbose>=3 replays the #del lines and per-round counters from the
    pulled capture; content must equal the host path's stderr lines."""
    import re
    import sys

    def stderr_of(engine):
        util.verbose = 3
        opt = PgOpt(engine=engine, max_avg_occ=2, max_degree=4)
        out = io.StringIO()
        err = io.StringIO()
        old = sys.stderr
        sys.stderr = err
        try:
            pipeline.run(opt, corpus, out=out)
        finally:
            sys.stderr = old
            util.verbose = 0
        keep = [l for l in err.getvalue().splitlines()
                if l.startswith("#del") or "marked" in l or "filtered" in l
                or "round-" in l]
        # strip wall-clock timestamps
        return [re.sub(r"::[0-9.]+\*[0-9.]+", "", l) for l in keep], \
            out.getvalue()

    host_lines, host_out = stderr_of("host")
    dev_lines, dev_out = stderr_of("sharded")
    assert dev_out == host_out
    assert dev_lines == host_lines


@pytest.mark.parametrize("mode", ["walk", "flag"])
def test_c4_devloop_bed_modes(c4_pafs, golden_dir, mode):
    """--bed=walk/--bed=flag through the device loop: the BED dump reads
    the final flt/shadow/weak/pid_dom state the schedule pulled back."""
    from pangene_tpu.options import (PG_F_WRITE_BED_FLAG,
                                     PG_F_WRITE_BED_WALK)
    flag = PG_F_WRITE_BED_WALK if mode == "walk" else PG_F_WRITE_BED_FLAG
    got = run(c4_pafs, "sharded", flag=PgOpt().flag | flag)
    assert got == (golden_dir / ("C4.bed.%s" % mode)).read_text()


def test_devloop_capacity_fallback(corpus, monkeypatch):
    """An arc-capacity overflow must fall back to the host rounds with
    byte-identical output (PANGENE_DEVLOOP_MAX_A also serves as a device
    memory cap on huge graphs)."""
    want = run(corpus, "host")
    monkeypatch.setenv("PANGENE_DEVLOOP_MAX_A", "64")
    assert run(corpus, "sharded") == want


def test_devloop_shard_merge_replicated_identical(corpus, monkeypatch):
    """The bucket-exchange distributed merge (nd>2 default) and the
    replicated all_gather+sort form must be byte-identical; this pins the
    replicated form stays live and exact when the exchange is disabled."""
    want = run(corpus, "sharded")
    from pangene_tpu.parallel import device_loop
    assert device_loop.LAST.get("engaged")
    monkeypatch.setenv("PANGENE_DEVLOOP_SHARD_MERGE", "0")
    got = run(corpus, "sharded")
    assert device_loop.LAST.get("engaged")
    assert not device_loop.LAST.get("shard_merge")
    assert got == want


def test_devloop_a2a_capacity_overflow_fallback(corpus, monkeypatch):
    """A per-(src,dst) all_to_all chunk overflow must ride the existing
    overflow flag into the byte-exact host-rounds fallback. A slack tiny
    enough to underfit the real per-dest counts triggers it."""
    want = run(corpus, "host")
    monkeypatch.setenv("PANGENE_DEVLOOP_A2A_SLACK", "0.01")
    from pangene_tpu.parallel import device_loop
    got = run(corpus, "sharded")
    assert got == want
    assert not device_loop.LAST.get("engaged"), \
        "expected the a2a-capacity overflow fallback to trigger"


def test_devloop_colsort_identical(corpus, monkeypatch):
    """Columnsort-based lean merge (PANGENE_DEVLOOP_COLSORT=1) must be
    byte-identical — keys are distinct, so any correct sort yields the
    same order; this pins it end-to-end through the schedule."""
    want = run(corpus, "sharded")
    monkeypatch.setenv("PANGENE_DEVLOOP_COLSORT", "1")
    from pangene_tpu.parallel import device_loop
    got = run(corpus, "sharded")
    assert device_loop.LAST.get("engaged")
    assert got == want


def test_devloop_hit0_filtered_at_entry(corpus, monkeypatch):
    """Kept-row compaction's ev1 quirk: when a genome's ORIGINAL hit 0
    (first in cs order) is filtered in phase 1, the first row of the
    compacted plane is some later hit, which the reference DOES evaluate
    in the shadow sweep (overlap.c:101 loops from i=1 over the full
    array). This test pins the precondition — the fixture corpus really
    contains such a genome — so the byte-identity matrix above keeps
    covering the ev1 path if the corpus is ever regenerated."""
    import numpy as np
    from pangene_tpu.parallel import device_loop

    seen = {}
    orig = device_loop.graph_gen_device

    def spy(opt, q):
        seen["first_flt"] = [
            int(np.asarray(g.hits.flt)[0]) if g.n_hit else 0
            for g in q.d.genomes]
        return orig(opt, q)

    monkeypatch.setattr(device_loop, "graph_gen_device", spy)
    assert run(corpus, "sharded") == run(corpus, "host")
    assert any(f > 0 for f in seen["first_flt"]), \
        "fixture no longer exercises the ev1 (hit-0 filtered) path"
