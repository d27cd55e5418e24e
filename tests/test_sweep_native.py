"""Differential fuzz: native C sweeps (native/pgsweep.c) vs the scalar
reference-semantics oracle in ops/sweep.py. Same corpora as the vectorized
engine's fuzz so all three host engines are pinned to identical behavior."""
import numpy as np
import pytest

from pangene_tpu.options import PG_F_CHECK_STRAND, PgOpt
from pangene_tpu.ops import sweep, sweep_native

from test_device_engine import random_genome
from test_sweep_vec import clone

pytestmark = pytest.mark.skipif(not sweep_native.available(),
                                reason="no C compiler for pgsweep")


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("check_strand", [False, True])
def test_shadow_native_vs_oracle(seed, check_strand):
    rng = np.random.default_rng(seed)
    opt = PgOpt()
    if check_strand:
        opt.flag |= PG_F_CHECK_STRAND
    d, g = random_genome(rng, n_hits=120, weak=(seed % 2 == 0))
    d2, g2 = clone(d, g)
    n1 = sweep.shadow(opt, d, g, cal_dom_sc=True)
    n2 = sweep_native.shadow(opt, d2, g2, cal_dom_sc=True)
    assert n1 == n2
    for col in ("shadow", "pid_dom", "score_dom"):
        np.testing.assert_array_equal(g.hits.cols[col], g2.hits.cols[col],
                                      err_msg=col)


@pytest.mark.parametrize("seed", range(8))
def test_shadow_native_no_dom_sc(seed):
    rng = np.random.default_rng(100 + seed)
    opt = PgOpt()
    d, g = random_genome(rng, n_hits=150, weak=True)
    d2, g2 = clone(d, g)
    n1 = sweep.shadow(opt, d, g, cal_dom_sc=False)
    n2 = sweep_native.shadow(opt, d2, g2, cal_dom_sc=False)
    assert n1 == n2
    for col in ("shadow", "pid_dom", "score_dom"):
        np.testing.assert_array_equal(g.hits.cols[col], g2.hits.cols[col],
                                      err_msg=col)


@pytest.mark.parametrize("seed", range(8))
def test_ov_isoform_native_vs_oracle(seed):
    rng = np.random.default_rng(50 + seed)
    opt = PgOpt()
    d, g = random_genome(rng, n_hits=120)
    d2, g2 = clone(d, g)
    n1 = sweep.flt_ov_isoform(opt, d, g)
    n2 = sweep_native.flt_ov_isoform(opt, d2, g2)
    assert n1 == n2
    np.testing.assert_array_equal(g.hits.flt_iso_ov, g2.hits.flt_iso_ov)
    np.testing.assert_array_equal(g.hits.flt, g2.hits.flt)


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("frag", [False, True])
def test_n_local_native_vs_numpy(seed, frag):
    from pangene_tpu.ops import branch
    rng = np.random.default_rng(200 + seed)
    G, ng, P = 7, 60, 500
    opt = PgOpt()
    opt.local_dist = 1000
    opt.local_count = 3
    if frag:
        from pangene_tpu.options import PG_F_FRAG_MODE
        opt.flag |= PG_F_FRAG_MODE
    rep_pos = (rng.random((G, ng)) < 0.7,
               rng.integers(0, 3, (G, ng), dtype=np.int32),
               rng.integers(0, 40, (G, ng), dtype=np.int32),
               rng.integers(0, 20000, (G, ng), dtype=np.int64))
    g1 = rng.integers(0, ng, P, dtype=np.int64)
    g2 = rng.integers(0, ng, P, dtype=np.int64)
    got = sweep_native.n_local_batch(opt, rep_pos, g1, g2)
    # NumPy fallback path (dedupe+broadcast) from branch.py
    import importlib
    present, cid, rank, cm = rep_pos
    a, b = np.minimum(g1, g2), np.maximum(g1, g2)
    keys = a * np.int64(ng) + b
    uniq, inv = np.unique(keys, return_inverse=True)
    ua, ub = (uniq // ng).astype(np.int64), (uniq % ng).astype(np.int64)
    ok = present[:, ua] & present[:, ub]
    if not opt.frag_mode:
        ok &= cid[:, ua] == cid[:, ub]
    dd = np.abs(cm[:, ua] - cm[:, ub])
    cc = np.abs(rank[:, ua].astype(np.int64) - rank[:, ub].astype(np.int64))
    want = (ok & ((dd <= opt.local_dist) | (cc <= opt.local_count))) \
        .sum(axis=0, dtype=np.int32)[inv]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(6))
def test_mark_branch_native_vs_numpy(seed):
    """Full branching-arc pass: native C vs the NumPy ragged path on a
    random graph over random representative positions."""
    from pangene_tpu.graph.graphdata import ArcTable, Graph
    from pangene_tpu.ops import branch
    rng = np.random.default_rng(300 + seed)
    d, g0 = random_genome(rng, n_hits=150)
    d2, g2 = clone(d, g0)
    opt = PgOpt()
    opt.local_dist = 2000
    opt.local_count = 2

    def build_graph(dd):
        q = Graph(dd)
        ng = dd.n_gene
        q.seg_gid = np.arange(ng, dtype=np.int32)
        q.seg_n_dist_loci = np.zeros((ng, 2), np.int32)
        n_arc = 60
        v = rng.integers(0, ng * 2, n_arc).astype(np.uint64)
        w = rng.integers(0, ng * 2, n_arc).astype(np.uint64)
        x = np.unique((v << np.uint64(32)) | w)
        arcs = ArcTable.empty(len(x))
        arcs.x = x
        arcs.s1 = rng.integers(0, 50, len(x)).astype(np.int32)
        q.arcs = arcs
        return q

    rng_state = rng.bit_generator.state
    qa = build_graph(d)
    rng.bit_generator.state = rng_state
    qb = build_graph(d2)
    np.testing.assert_array_equal(qa.arcs.x, qb.arcs.x)

    n1 = branch.mark_branch_flt_arc(opt, qa)     # native (available)
    import pangene_tpu.ops.sweep_native as sn
    orig = sn.available
    sn.available = lambda: False
    try:
        n2 = branch.mark_branch_flt_arc(opt, qb)  # NumPy ragged path
    finally:
        sn.available = orig
    assert n1 == n2
    np.testing.assert_array_equal(qa.arcs.weak_br, qb.arcs.weak_br)
    np.testing.assert_array_equal(qa.seg_n_dist_loci, qb.seg_n_dist_loci)


@pytest.mark.parametrize("seed", range(5))
def test_gen_arc_native_vs_numpy(seed):
    """Native walk/dedupe/merge vs the NumPy path on a random multi-genome
    dataset: identical ArcTable and segment counters."""
    from pangene_tpu.graph.graphdata import Graph
    from pangene_tpu.ops import arcs as arcs_mod
    rng = np.random.default_rng(400 + seed)
    d, _ = random_genome(rng, n_hits=160)
    # add two more genomes over the same gene/protein tables
    from test_device_engine import random_genome as rg
    for extra_seed in (2, 3):
        rng2 = np.random.default_rng(400 + seed + 1000 * extra_seed)
        d_extra, g_extra = rg(rng2, n_hits=120)
        # remap onto d's tables: reuse pid space if compatible, else clip
        h = g_extra.hits
        h.set("pid", np.minimum(h.pid, np.int32(d.n_prot - 1)))
        d.genomes.append(g_extra)

    def build(dd, engine):
        import copy
        d2 = type(dd).new()
        d2.__dict__.update({k: v for k, v in dd.__dict__.items()
                            if k not in ("genomes",)})
        from pangene_tpu.core.data import Genome
        d2.genomes = [Genome(g.label, g.ctg_names, g.ctg_len, g.hits.copy(),
                             g.exon_os.copy(), g.exon_oe.copy())
                      for g in dd.genomes]
        q = Graph(d2)
        ng = d2.n_gene
        q.seg_gid = np.arange(ng, dtype=np.int32)
        q.gen_g2s()
        q.seg_n_dist_loci = np.zeros((ng, 2), np.int32)
        opt = PgOpt(engine=engine)
        arcs_mod.gen_arc_loop(opt, q)
        return q

    qa = build(d, "host")       # native
    qb = build(d, "host-vec")   # NumPy walk/dedupe/merge
    np.testing.assert_array_equal(qa.arcs.x, qb.arcs.x)
    np.testing.assert_array_equal(qa.arcs.n_genome, qb.arcs.n_genome)
    np.testing.assert_array_equal(qa.arcs.tot_cnt, qb.arcs.tot_cnt)
    np.testing.assert_array_equal(qa.arcs.avg_dist, qb.arcs.avg_dist)
    np.testing.assert_array_equal(qa.arcs.s1, qb.arcs.s1)
    np.testing.assert_array_equal(qa.arcs.s2, qb.arcs.s2)
    np.testing.assert_array_equal(qa.seg_n_genome, qb.seg_n_genome)
    np.testing.assert_array_equal(qa.seg_tot_cnt, qb.seg_tot_cnt)


@pytest.mark.parametrize("seed", range(4))
def test_merge_tree_vs_kway(seed):
    """The two global-merge strategies (pairwise tree with early
    aggregation / k-way heap) must agree exactly; dispatch picks by
    input size."""
    rng = np.random.default_rng(500 + seed)
    n_src = rng.integers(1, 9)
    per = []
    for s in range(n_src):
        k = int(rng.integers(0, 400))
        x = np.unique(rng.integers(0, 500, k).astype(np.uint64))
        n = rng.integers(1, 5, len(x)).astype(np.int32)
        dist = rng.integers(0, 10000, len(x)).astype(np.int32)
        s1 = rng.integers(0, 100, len(x)).astype(np.int32)
        s2 = rng.integers(0, 100, len(x)).astype(np.int32)
        per.append((x, n, dist, s1, s2))
    lib = sweep_native._get_lib()
    import numpy as _np
    offs = _np.zeros(len(per) + 1, _np.int64)
    for i, p in enumerate(per):
        offs[i + 1] = offs[i] + len(p[0])
    n_in = int(offs[-1])
    cat = [_np.concatenate([p[i] for p in per]) if n_in else
           _np.zeros(0, per[0][i].dtype if per else _np.uint64)
           for i in range(5)]
    outs = []
    for fn in (lib.pg_merge_arcs_tree, lib.pg_merge_arcs_kway):
        cap = max(n_in, 1)
        bufs = [_np.empty(cap, _np.uint64)] + \
               [_np.empty(cap, _np.int32) for _ in range(5)]
        m = fn(len(per), sweep_native._p(offs, _np.int64),
               sweep_native._p(cat[0], _np.uint64),
               sweep_native._p(cat[1], _np.int32),
               sweep_native._p(cat[2], _np.int32),
               sweep_native._p(cat[3], _np.int32),
               sweep_native._p(cat[4], _np.int32),
               *[sweep_native._p(b, b.dtype) for b in bufs])
        outs.append([b[:m].copy() for b in bufs])
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("seed", range(4))
def test_round_caches_across_monotone_rounds(seed):
    """Multi-ROUND differential fuzz of the native cache stack (hot table,
    pair-geometry byte cache, walk-pack, scratch reuse): run the fused
    round stage repeatedly on the same genome while flt/weak evolve
    MONOTONICALLY (flt only ever set, weak max-only — the invariants the
    caches rely on; see pgsweep.c:sweep_shadow_core contract) and g2s
    mutates arbitrarily, comparing every round's outputs against a fresh
    cold-cache computation on a cloned genome."""
    from pangene_tpu.ops.sort import cm_cycle_view, hit_sort
    rng = np.random.default_rng(900 + seed)
    opt = PgOpt()
    d, g = random_genome(rng, n_hits=200, weak=True)
    d2, g2 = clone(d, g)
    g.hits.set("pid_dom0", g.hits.pid_dom.copy())
    g2.hits.set("pid_dom0", g2.hits.pid_dom.copy())
    n_seg = d.n_gene
    # canonical cs order first (as after read_postpass), then TWO physical
    # round trips: ties in (cid, key) make the first trip land in a new
    # order state; the cycle stabilizes on the second (as in the real
    # round loop), after which the view (and walk-pack) engage
    for gg in (g, g2):
        hit_sort(gg, by_cm=False)
        for _ in range(2):
            hit_sort(gg, by_cm=True)
            hit_sort(gg, by_cm=False)
    for rnd in range(6):
        g2s = np.arange(n_seg, dtype=np.int32)
        if rnd >= 2:   # delete some segments, as the pruning rounds do
            dead = rng.integers(0, n_seg, 3)
            keep = np.ones(n_seg, bool)
            keep[dead] = False
            # remap like gen_g2s: surviving genes -> new dense ids
            g2s = np.full(n_seg, -1, np.int32)
            g2s[keep] = np.arange(int(keep.sum()), dtype=np.int32)
            # hits pointing at dead segments must be filtered first
            gid = np.asarray(d.prot_gid, np.int32)[g.hits.pid]
            hitdead = ~keep[gid]
            g.hits.flt[hitdead] = 1
            g2.hits.flt[hitdead] = 1
        view = cm_cycle_view(g)
        assert view is not None
        warm = sweep_native.round_genome(
            opt, d, g, g2s, False, n_seg, view, True)
        # cold: fresh clone each round -> no caches can serve
        d3, g3 = clone(d2, g2)
        g3.hits.flt[:] = g.hits.flt
        g3.hits.weak_br[:] = g.hits.weak_br
        # carry the warm genome's STALE sweep outputs: hit 0 and filtered
        # hits keep their old shadow/dominator values (reference quirk,
        # overlap.c:101-178), so the cold run must start from these
        g3.hits.shadow[:] = g.hits.shadow
        g3.hits.pid_dom[:] = g.hits.pid_dom
        g3.hits.score_dom[:] = g.hits.score_dom
        hit_sort(g3, by_cm=False)
        for _ in range(2):
            hit_sort(g3, by_cm=True)
            hit_sort(g3, by_cm=False)
        view3 = cm_cycle_view(g3)
        cold = sweep_native.round_genome(
            opt, d3, g3, g2s, False, n_seg, view3, True)
        for a, b, name in zip(warm, cold,
                              ("x", "n", "dist", "s1", "s2", "seg_cnt")):
            np.testing.assert_array_equal(a, b, err_msg="round %d %s"
                                          % (rnd, name))
        np.testing.assert_array_equal(g.hits.shadow, g3.hits.shadow,
                                      err_msg="round %d shadow" % rnd)
        # monotone evolution: set a few more flt, raise a few weak ranks
        newflt = rng.integers(0, len(g.hits), 4)
        g.hits.flt[newflt] = 1
        g2.hits.flt[newflt] = 1
        wi = rng.integers(0, len(g.hits), 4)
        g.hits.weak_br[wi] = np.maximum(g.hits.weak_br[wi], rng.integers(1, 3))
        g2.hits.weak_br[wi] = g.hits.weak_br[wi]
        if rnd == 3:
            # pure address churn: replace a column OBJECT with identical
            # values via set() — _ver bumps, every identity/version-keyed
            # cache (addresses, hot/geo/walk-pack, the prebuilt ctypes
            # argument vectors) must rebuild, and a stale cached address
            # would read a freed buffer
            g.hits.set("flt", np.asarray(g.hits.flt).copy())
            g.hits.set("weak_br", np.asarray(g.hits.weak_br).copy())
