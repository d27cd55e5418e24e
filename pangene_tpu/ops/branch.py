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


def mark_branch_flt_arc(opt: PgOpt, g: Graph) -> int:
    """Mark weak branching arcs and per-vertex distant-loci counts
    (reference pg_mark_branch_flt_arc, branch.c:48-106)."""
    d = g.d
    present, cid_rank, cm = gen_rep_pos(d)
    g.seg_n_dist_loci = np.zeros((g.n_seg, 2), np.int32)
    arcs = g.arcs
    tgt_gid = g.seg_gid[(arcs.x & np.uint64(0xFFFFFFFF)).astype(np.int64) >> 1]
    n_flt1 = n_flt2 = 0
    for v in range(g.n_seg * 2):
        s = int(g.idx_start[v])
        n = int(g.idx_cnt[v])
        if n < 2:
            continue
        sl = slice(s, s + n)
        s1 = arcs.s1[sl].astype(np.int64)
        max_s1 = max(0, int(s1.max()))
        gids = tgt_gid[sl].astype(np.int64)
        max_gid = gids[s1 == max_s1]
        # one batched locality matrix per vertex: rows = this vertex's arc
        # targets, cols = the max-score targets + pairwise grouping matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            r_all = 1.0 - s1.astype(np.float64) / np.float64(max_s1)
        weak_cand = np.flatnonzero(r_all > opt.branch_diff)
        if len(weak_cand):
            p1 = np.repeat(max_gid, len(weak_cand))
            p2 = np.tile(gids[weak_cand], len(max_gid))
            nloc = n_local_batch(opt, present, cid_rank, cm, p1, p2) \
                .reshape(len(max_gid), len(weak_cand)).sum(axis=0)
            for kk, k in enumerate(weak_cand):
                r = float(r_all[k])
                if (nloc[kk] == 0 and r > opt.branch_diff_dist) \
                        or r > opt.branch_diff_cut:
                    arcs.weak_br[s + k] = 2
                    n_flt2 += 1
                else:
                    arcs.weak_br[s + k] = 1
                    n_flt1 += 1
        # greedy distant-loci grouping (branch.c:82-90): arc j joins arc i's
        # group if their target genes co-occur locally in any genome
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        pairloc = n_local_batch(opt, present, cid_rank, cm,
                                gids[ii.ravel()], gids[jj.ravel()]
                                ).reshape(n, n) > 0
        grp = np.zeros(n, np.int32)
        n_group = 0
        for i in range(n):
            if grp[i] == 0:
                n_group += 1
                grp[i] = n_group
            for j2 in range(i + 1, n):
                if grp[j2] == 0 and pairloc[i, j2]:
                    grp[j2] = grp[i]
        g.seg_n_dist_loci[v >> 1, v & 1] = n_group
    log_msg("pg_mark_branch_flt_arc",
            "marked %d locally diverged branches and %d distantly diverged branches",
            n_flt1, n_flt2)
    return n_flt1 + n_flt2


def mark_branch_flt_hit(opt: PgOpt, g: Graph) -> int:
    """Propagate arc weak_br onto the incident hits of each genome walk
    (reference pg_mark_branch_flt_hit, branch.c:108-145)."""
    d = g.d
    prot_gid = np.asarray(d.prot_gid, np.int32)
    n_flt = 0
    for gen in d.genomes:
        h = gen.hits
        hit_sort(gen, by_cm=True)
        v = -1
        vi = -1
        for i in range(len(h)):
            if h.flt[i] or h.shadow[i]:
                continue
            sid = int(g.g2s[prot_gid[h.pid[i]]])
            if vi >= 0 and h.cid[i] != h.cid[vi]:
                v = -1
            w = (sid << 1) | int(h.rev[i])
            if v != -1:
                e = g.get_arc(v, w)
                if e >= 0 and g.arcs.weak_br[e]:
                    h.weak_br[vi] = max(h.weak_br[vi], g.arcs.weak_br[e])
                e = g.get_arc(w ^ 1, v ^ 1)
                if e >= 0 and g.arcs.weak_br[e]:
                    h.weak_br[i] = max(h.weak_br[i], g.arcs.weak_br[e])
            v, vi = w, i
        n_flt += int((h.weak_br != 0).sum())
        hit_sort(gen, by_cm=False)
    log_msg("pg_mark_branch_flt_hit", "marked %d diverged hits", n_flt)
    return n_flt
