"""Per-genome gene-walk arc extraction and the cross-genome arc merge.

Reference: pg_gen_arc (graph.c:87-177). Per genome, consecutive unfiltered
unshadowed hits on the same contig (in CDS-midpoint order) yield an arc
v->w plus its complement w^1->v^1; arcs are deduped per genome, then merged
across genomes with count / distance / score averaging.

TPU mapping: the per-genome walk is a segmented shift-compare over the
cm-sorted hit tensor; the per-genome dedupe is sort+segment-reduce; the
global merge is an all-gather over the genome mesh axis followed by a
sort-reduce. All averaging uses exact integer sums so the result is
independent of shard count, with the reference's +.499 double rounding
applied once at the end (graph.c:141, 170-172).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.data import DataSet, Genome
from ..graph.graphdata import ArcTable, Graph
from ..options import PgOpt
from . import dispatch as sweep
from .sort import cm_cycle_view, hit_sort


def get_score(g: Graph, h, i: int, use_ori: bool) -> int:
    """Arc endpoint score: score_ori unless dominated by a non-vertex gene
    (reference pg_get_score, graph.c:82-85)."""
    if use_ori or h.score_ori[i] > h.score_dom[i] or h.pid_dom0[i] < 0 \
            or g.g2s[g.d.prot_gid[h.pid_dom0[i]]] >= 0:
        return int(h.score_ori[i])
    return int(h.score_dom[i])


def walk_extract(g: Graph, gen: Genome, use_ori: bool, view=None
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Adjacency pairs from one genome's cm-sorted kept hits
    (graph.c:106-122). Returns (x, dist, s1, s2, sid_counts-compatible sids).

    view: optional cm-order index vector (ops/sort.cm_cycle_view); when
    given, the hit table is read through it instead of being physically
    cm-sorted."""
    h = gen.hits
    prot_gid = np.asarray(g.d.prot_gid, np.int32)
    if view is None:
        keep = (h.flt == 0) & (h.shadow == 0)
        ki = np.flatnonzero(keep)
    else:
        ki = view[np.flatnonzero((h.flt[view] == 0) & (h.shadow[view] == 0))]
    sid = g.g2s[prot_gid[h.pid[ki]]].astype(np.int64)
    assert (sid >= 0).all(), "kept hit maps to deleted segment"
    w = (sid << 1) | h.rev[ki].astype(np.int64)
    # scores (vectorized pg_get_score)
    dom_gid = prot_gid[np.clip(h.pid_dom0[ki], 0, None)]
    use_ori_vec = (use_ori
                   | (h.score_ori[ki] > h.score_dom[ki])
                   | (h.pid_dom0[ki] < 0)
                   | (g.g2s[dom_gid] >= 0))
    sc = np.where(use_ori_vec, h.score_ori[ki], h.score_dom[ki]).astype(np.int64)
    # adjacency: consecutive kept hits on the same contig
    if len(ki) == 0:
        z = np.zeros(0, np.uint64)
        zi = np.zeros(0, np.int32)
        return z, zi, zi, zi, sid
    same = h.cid[ki[1:]] == h.cid[ki[:-1]]
    v = w[:-1][same]
    ww = w[1:][same]
    dist = (h.cm[ki[1:]][same] - h.cm[ki[:-1]][same]).astype(np.int32)
    s1 = sc[:-1][same].astype(np.int32)
    s2 = sc[1:][same].astype(np.int32)
    # forward arc and its complement, interleaved like the reference append
    x_fwd = (v.astype(np.uint64) << np.uint64(32)) | ww.astype(np.uint64)
    x_rev = ((ww ^ 1).astype(np.uint64) << np.uint64(32)) | (v ^ 1).astype(np.uint64)
    x = np.empty(2 * len(v), np.uint64)
    x[0::2] = x_fwd
    x[1::2] = x_rev
    dist2 = np.repeat(dist, 2)
    s1_2 = np.empty(2 * len(v), np.int32)
    s2_2 = np.empty(2 * len(v), np.int32)
    s1_2[0::2] = s1
    s2_2[0::2] = s2
    s1_2[1::2] = s2
    s2_2[1::2] = s1
    return x, dist2, s1_2, s2_2, sid


def dedupe_genome(x: np.ndarray, dist: np.ndarray, s1: np.ndarray,
                  s2: np.ndarray) -> Tuple[np.ndarray, ...]:
    """Per-genome arc dedupe: group by x; n=count, dist=avg+.499, s=max
    (graph.c:127-145)."""
    if len(x) == 0:
        zi = np.zeros(0, np.int32)
        return x, zi, zi, zi, zi
    order = np.argsort(x, kind="stable")
    xs = x[order]
    uniq, start, cnt = np.unique(xs, return_index=True, return_counts=True)
    gidx = np.searchsorted(uniq, xs)
    dsum = np.zeros(len(uniq), np.uint64)
    np.add.at(dsum, gidx, dist[order].astype(np.int64).astype(np.uint64))
    m1 = np.zeros(len(uniq), np.int32)
    m2 = np.zeros(len(uniq), np.int32)
    np.maximum.at(m1, gidx, s1[order])
    np.maximum.at(m2, gidx, s2[order])
    avg = (dsum.astype(np.float64) / cnt + 0.499).astype(np.int64).astype(np.int32)
    return uniq, cnt.astype(np.int32), avg, m1, m2


def merge_arcs(per_genome: list) -> ArcTable:
    """Merge per-genome deduped arc lists (graph.c:151-175).

    Exact integer sums make the result shard-count independent; the
    genome-major concatenation order only matters for the stable sort, and
    groups are fully reduced so it does not affect output.
    """
    if not per_genome:
        return ArcTable.empty()
    x = np.concatenate([p[0] for p in per_genome])
    n = np.concatenate([p[1] for p in per_genome]).astype(np.int64)
    dist = np.concatenate([p[2] for p in per_genome]).astype(np.int64)
    s1 = np.concatenate([p[3] for p in per_genome]).astype(np.int64)
    s2 = np.concatenate([p[4] for p in per_genome]).astype(np.int64)
    if len(x) == 0:
        return ArcTable.empty()
    order = np.argsort(x, kind="stable")
    xs = x[order]
    uniq, start, cnt = np.unique(xs, return_index=True, return_counts=True)
    gidx = np.searchsorted(uniq, xs)
    nsum = np.zeros(len(uniq), np.int64)
    # (uint64)dist * n sign-extends int32 dist in the reference; real dists
    # are non-negative so plain int64 products are identical
    dsum = np.zeros(len(uniq), np.int64)
    s1sum = np.zeros(len(uniq), np.int64)
    s2sum = np.zeros(len(uniq), np.int64)
    np.add.at(nsum, gidx, n[order])
    np.add.at(dsum, gidx, dist[order] * n[order])
    np.add.at(s1sum, gidx, s1[order])
    np.add.at(s2sum, gidx, s2[order])
    out = ArcTable.empty(len(uniq))
    out.x = uniq
    out.n_genome = cnt.astype(np.int32)
    out.tot_cnt = nsum.astype(np.int32)
    out.avg_dist = (dsum.astype(np.float64) / nsum + 0.499).astype(np.int64).astype(np.int32)
    out.s1 = (s1sum.astype(np.float64) / cnt + 0.499).astype(np.int64).astype(np.int32)
    out.s2 = (s2sum.astype(np.float64) / cnt + 0.499).astype(np.int64).astype(np.int32)
    return out


def gen_arc(opt: PgOpt, g: Graph) -> None:
    """Full arc (re)generation pass over all genomes (pg_gen_arc, graph.c:87-177).

    engine == "sharded" runs the fused device round step over the genome
    mesh (parallel/stacked.py); otherwise a per-genome loop with the sweep
    engine picked by dispatch. Identical outputs either way.
    """
    if opt.engine == "sharded":
        from ..parallel.stacked import gen_arc_sharded
        gen_arc_sharded(opt, g)
        return
    gen_arc_loop(opt, g)


def gen_arc_loop(opt: PgOpt, g: Graph) -> None:
    """Per-genome-loop gen_arc: re-shadow, sort by cm, walk-extract,
    per-genome dedupe; then the global merge. Segment n_genome/tot_cnt
    counters are refreshed here. The walk/dedupe/merge run natively
    (pgsweep.c) when a compiler is available, else in NumPy — identical
    outputs (exact integer sums, one double +.499 rounding)."""
    d = g.d
    use_ori = opt.use_ori_for_branch
    g.seg_n_genome = np.zeros(g.n_seg, np.int32)
    g.seg_tot_cnt = np.zeros(g.n_seg, np.int32)
    from . import sweep_native
    native = opt.engine in ("host", "sharded") and sweep_native.available()
    g2s_b = g.g2s.tobytes() if (native and g.g2s is not None) else None
    any_recomputed = False
    per_genome = []
    for j, gen in enumerate(d.genomes):
        if native:
            # The per-genome shadow sweep and walk are pure functions of
            # (flt, weak_br, g2s): coordinates, scores and pid_dom0 are
            # frozen after ingest, and the sweep's in-place outputs
            # (shadow/pid_dom) are themselves determined by the same key.
            # Once the pruning rounds converge, most genomes' keys repeat,
            # so recomputation is skipped — outputs are bit-identical by
            # construction (the reference recomputes the same values).
            h = gen.hits
            fb = h.flt.tobytes()
            wb = h.weak_br.tobytes()
            memo = getattr(gen, "_arc_memo", None)
            if memo is not None and memo[0] == fb and memo[1] == wb \
                    and memo[2] == g2s_b and memo[3] == use_ori:
                x, n, dist, s1, s2, seg_cnt = memo[4]
            else:
                any_recomputed = True
                # shadow depends on (flt, weak_br) only — skip the sweep
                # when those repeat and just the g2s part of the key moved
                run_shadow = getattr(gen, "_shadow_memo", None) != (fb, wb)
                if run_shadow:
                    gen._shadow_memo = (fb, wb)
                view = cm_cycle_view(gen)
                if view is None:
                    if run_shadow:
                        sweep.shadow(opt, d, gen, cal_dom_sc=False)
                        run_shadow = False
                    hit_sort(gen, by_cm=True)
                x, n, dist, s1, s2, seg_cnt = sweep_native.round_genome(
                    opt, d, gen, g.g2s, use_ori, g.n_seg, view, run_shadow)
                if view is None:
                    hit_sort(gen, by_cm=False)
                gen._arc_memo = (fb, wb, g2s_b, use_ori,
                                 (x, n, dist, s1, s2, seg_cnt))
            if g.n_seg:
                g.seg_n_genome += (seg_cnt > 0).astype(np.int32)
                g.seg_tot_cnt += seg_cnt
            per_genome.append((x, n, dist, s1, s2))
            continue
        sweep.shadow(opt, d, gen, cal_dom_sc=False)
        view = cm_cycle_view(gen)
        if view is None:
            hit_sort(gen, by_cm=True)
        x, dist, s1, s2, sids = walk_extract(g, gen, use_ori, view=view)
        if view is None:
            hit_sort(gen, by_cm=False)
        if g.n_seg:
            cnts = np.bincount(sids, minlength=g.n_seg)
            g.seg_n_genome += (cnts > 0).astype(np.int32)
            g.seg_tot_cnt += cnts.astype(np.int32)
        per_genome.append(dedupe_genome(x, dist, s1, s2))
    if native:
        mm = getattr(g, "_merge_memo", None)
        if not any_recomputed and mm is not None and mm[0] == g2s_b \
                and mm[1] == use_ori:
            ox, ong, otot, oavg, os1, os2 = mm[2]
            out = ArcTable.empty(len(ox))
            out.x, out.n_genome, out.tot_cnt = ox, ong, otot
            out.avg_dist, out.s1, out.s2 = oavg, os1, os2
            g.arcs = out
            return
        ox, ong, otot, oavg, os1, os2 = sweep_native.merge_arcs_kway(
            per_genome)
        g._merge_memo = (g2s_b, use_ori, (ox, ong, otot, oavg, os1, os2))
        out = ArcTable.empty(len(ox))
        out.x, out.n_genome, out.tot_cnt = ox, ong, otot
        out.avg_dist, out.s1, out.s2 = oavg, os1, os2
        g.arcs = out
        return
    g.arcs = merge_arcs(per_genome)
