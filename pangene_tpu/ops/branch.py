"""Branching-arc demotion/cutting and weak-branch propagation onto hits.

Reference: branch.c. A vertex with >=2 out-arcs has its weaker arcs demoted
(weak_br=1) or cut (weak_br=2) based on relative score deficit and a
cross-genome locality test (pg_n_local): two genes are "local" in a genome
if their representative positions are on the same contig within local_dist
bp or local_count kept-hit ranks.

TPU mapping: representative positions form a [n_genome, n_gene] tensor
sharded over the genome axis; n_local for a batch of gene pairs is an
elementwise test + psum over that axis. The per-vertex greedy loci grouping
(branch.c:82-90) is O(degree^2) on a ~20k-arc graph and stays host-side.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.data import DataSet
from ..graph.graphdata import Graph
from ..options import PgOpt
from ..util import log_msg
from .sort import hit_sort


def gen_rep_pos(d: DataSet) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per genome, per gene: (cid, kept-rank, cm) of its last kept hit in
    cs-order (reference pg_gen_rep_pos, branch.c:6-29).

    Returns (present[G,n_gene] bool, cid_rank[G,n_gene] int64 = cid<<32|rank,
    cm[G,n_gene] int64).
    """
    G = d.n_genome
    ng = d.n_gene
    prot_gid = np.asarray(d.prot_gid, np.int32)
    present = np.zeros((G, ng), bool)
    cid_rank = np.zeros((G, ng), np.int64)
    cm = np.zeros((G, ng), np.int64)
    for j, gen in enumerate(d.genomes):
        h = gen.hits
        keep = np.flatnonzero((h.shadow == 0) & (h.flt == 0))
        if len(keep) == 0:
            continue
        gids = prot_gid[h.pid[keep]]
        ranks = np.arange(len(keep), dtype=np.int64)
        # last kept hit of each gene wins: take the final element of each
        # stable-sorted gid group (deterministic, unlike fancy-index overwrite)
        order = np.argsort(gids, kind="stable")
        gs = gids[order]
        last = order[np.flatnonzero(
            np.concatenate((gs[1:] != gs[:-1], [True])))]
        present[j, gids[last]] = True
        cid_rank[j, gids[last]] = (h.cid[keep[last]].astype(np.int64) << 32) \
            | ranks[last]
        cm[j, gids[last]] = h.cm[keep[last]]
    return present, cid_rank, cm


def n_local_batch(opt: PgOpt, present: np.ndarray, cid_rank: np.ndarray,
                  cm: np.ndarray, g1: np.ndarray, g2: np.ndarray) -> np.ndarray:
    """Vectorized pg_n_local (branch.c:31-46) for gene-pair batches.

    Sums over the genome axis; under sharding this is the psum reduction.
    """
    ok = present[:, g1] & present[:, g2]                    # [G, P]
    if not opt.frag_mode:
        ok &= (cid_rank[:, g1] >> 32) == (cid_rank[:, g2] >> 32)
    dd = cm[:, g1] - cm[:, g2]
    # (int32_t)a1->x - (int32_t)a2->x: low 32 bits of cid_rank as int32
    c1 = (cid_rank[:, g1] & 0xFFFFFFFF).astype(np.uint32).astype(np.int32)
    c2 = (cid_rank[:, g2] & 0xFFFFFFFF).astype(np.uint32).astype(np.int32)
    cc = c1.astype(np.int64) - c2.astype(np.int64)
    local = ok & (((dd >= -opt.local_dist) & (dd <= opt.local_dist))
                  | ((cc >= -opt.local_count) & (cc <= opt.local_count)))
    return local.sum(axis=0).astype(np.int32)


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated."""
    if len(counts) == 0:
        return np.zeros(0, np.int64)
    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    out -= np.repeat(offs, counts)
    return out


def mark_branch_flt_arc(opt: PgOpt, g: Graph) -> int:
    """Mark weak branching arcs and per-vertex distant-loci counts
    (reference pg_mark_branch_flt_arc, branch.c:48-106).

    Fully vectorized over vertices: per-source-vertex max scores via
    reduceat, weak candidates against max-score targets via one batched
    ragged cross-join locality test, and the greedy loci grouping done
    closed-form for degree 2 with a loop only over degree>=3 vertices.
    """
    d = g.d
    present, cid_rank, cm = gen_rep_pos(d)
    g.seg_n_dist_loci = np.zeros((g.n_seg, 2), np.int32)
    arcs = g.arcs
    n_arc = len(arcs)
    if n_arc == 0:
        log_msg("pg_mark_branch_flt_arc",
                "marked %d locally diverged branches and %d distantly "
                "diverged branches", 0, 0)
        return 0
    tgt_gid = g.seg_gid[(arcs.x & np.uint64(0xFFFFFFFF)).astype(np.int64) >> 1] \
        .astype(np.int64)
    src = (arcs.x >> np.uint64(32)).astype(np.int64)
    # contiguous per-source groups over the x-sorted arc table
    gstart = np.flatnonzero(np.concatenate(([True], src[1:] != src[:-1])))
    gcnt = np.diff(np.append(gstart, n_arc))
    gsrc = src[gstart]
    arc_grp = np.repeat(np.arange(len(gstart)), gcnt)
    s1 = arcs.s1.astype(np.int64)
    gmax = np.maximum.reduceat(np.maximum(s1, 0), gstart)
    gmax = np.maximum.reduceat(s1, gstart)
    gmax = np.maximum(gmax, 0)  # reference max starts from 0 (branch.c:61-65)
    big = gcnt >= 2             # only branching vertices are processed
    arc_active = big[arc_grp]
    with np.errstate(divide="ignore", invalid="ignore"):
        r = 1.0 - s1.astype(np.float64) / gmax[arc_grp].astype(np.float64)
    is_max = arc_active & (s1 == gmax[arc_grp])
    cand = np.flatnonzero(arc_active & (r > opt.branch_diff))
    # ragged cross-join: each candidate arc x every max-score arc of its group
    max_cnt_g = np.zeros(len(gstart), np.int64)
    np.add.at(max_cnt_g, arc_grp[is_max], 1)
    max_start_g = np.concatenate(([0], np.cumsum(max_cnt_g)[:-1]))
    max_arc_idx = np.flatnonzero(is_max)     # grouped by construction
    n_flt1 = n_flt2 = 0
    if len(cand):
        reps = max_cnt_g[arc_grp[cand]]
        cand_rep = np.repeat(cand, reps)
        within = _ragged_arange(reps)
        max_side = max_arc_idx[np.repeat(max_start_g[arc_grp[cand]], reps)
                               + within]
        nloc_pairs = n_local_batch(opt, present, cid_rank, cm,
                                   tgt_gid[max_side], tgt_gid[cand_rep])
        nloc = np.zeros(n_arc, np.int64)
        np.add.at(nloc, cand_rep, nloc_pairs.astype(np.int64))
        rc = r[cand]
        cut = ((nloc[cand] == 0) & (rc > opt.branch_diff_dist)) \
            | (rc > opt.branch_diff_cut)
        arcs.weak_br[cand[cut]] = 2
        arcs.weak_br[cand[~cut]] = 1
        n_flt2 = int(cut.sum())
        n_flt1 = int((~cut).sum())
    # distant-loci greedy grouping (branch.c:82-90)
    deg2 = np.flatnonzero(big & (gcnt == 2))
    if len(deg2):
        a0 = gstart[deg2]
        loc01 = n_local_batch(opt, present, cid_rank, cm,
                              tgt_gid[a0], tgt_gid[a0 + 1]) > 0
        v = gsrc[deg2]
        g.seg_n_dist_loci[v >> 1, v & 1] = np.where(loc01, 1, 2)
    deg3 = np.flatnonzero(gcnt >= 3)
    if len(deg3):
        p1 = []
        p2 = []
        for gi in deg3:
            s0, n = int(gstart[gi]), int(gcnt[gi])
            ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
            p1.append(tgt_gid[s0 + ii.ravel()])
            p2.append(tgt_gid[s0 + jj.ravel()])
        nl = n_local_batch(opt, present, cid_rank, cm,
                           np.concatenate(p1), np.concatenate(p2))
        off = 0
        for gi in deg3:
            n = int(gcnt[gi])
            pairloc = nl[off:off + n * n].reshape(n, n) > 0
            off += n * n
            grp = np.zeros(n, np.int32)
            n_group = 0
            for i in range(n):
                if grp[i] == 0:
                    n_group += 1
                    grp[i] = n_group
                tgt = np.flatnonzero(pairloc[i, i + 1:]
                                     & (grp[i + 1:] == 0)) + i + 1
                grp[tgt] = grp[i]
            v = int(gsrc[gi])
            g.seg_n_dist_loci[v >> 1, v & 1] = n_group
    log_msg("pg_mark_branch_flt_arc",
            "marked %d locally diverged branches and %d distantly diverged branches",
            n_flt1, n_flt2)
    return n_flt1 + n_flt2


def mark_branch_flt_hit(opt: PgOpt, g: Graph) -> int:
    """Propagate arc weak_br onto the incident hits of each genome walk
    (reference pg_mark_branch_flt_hit, branch.c:108-145).

    Vectorized: adjacent kept pairs in cm-order are looked up in the
    x-sorted arc table via searchsorted (both walk directions) and the arc
    weak_br is maxed onto the two incident hits.
    """
    d = g.d
    prot_gid = np.asarray(d.prot_gid, np.int32)
    arc_x = g.arcs.x
    arc_w = g.arcs.weak_br
    n_flt = 0
    for gen in d.genomes:
        h = gen.hits
        hit_sort(gen, by_cm=True)
        keep = np.flatnonzero((h.flt == 0) & (h.shadow == 0))
        if len(keep) >= 2 and len(arc_x):
            sid = g.g2s[prot_gid[h.pid[keep]]].astype(np.int64)
            w = (sid << 1) | h.rev[keep].astype(np.int64)
            same = h.cid[keep[1:]] == h.cid[keep[:-1]]
            v = w[:-1][same]
            ww = w[1:][same]
            vi = keep[:-1][same]          # hit index of the earlier hit
            ii = keep[1:][same]           # hit index of the later hit
            key_fwd = (v.astype(np.uint64) << np.uint64(32)) \
                | ww.astype(np.uint64)
            key_rev = ((ww ^ 1).astype(np.uint64) << np.uint64(32)) \
                | (v ^ 1).astype(np.uint64)
            for keys, tgt in ((key_fwd, vi), (key_rev, ii)):
                pos = np.searchsorted(arc_x, keys)
                posc = np.clip(pos, 0, len(arc_x) - 1)
                found = arc_x[posc] == keys
                wk = np.where(found, arc_w[posc], 0).astype(np.uint8)
                np.maximum.at(h.weak_br, tgt, wk)
        n_flt += int((h.weak_br != 0).sum())
        hit_sort(gen, by_cm=False)
    log_msg("pg_mark_branch_flt_hit", "marked %d diverged hits", n_flt)
    return n_flt
