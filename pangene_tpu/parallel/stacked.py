"""Genome-sharded stacked execution of the graph-round inner loop.

This is the scale path (SURVEY.md §2.4, §7 M6): all genomes' hit tables are
stacked into [G, H] padded device arrays sharded over the ('g',) mesh axis.
One jitted shard_map step fuses, per genome: the shadow sweep, the stable
(cid, cm) sort, the gene-walk adjacency extraction (segmented shift-compare)
and the per-genome arc dedupe (sort + segment reduce). Segment occurrence
counters are reduced across the genome axis with psum; per-genome deduped
arc lists return to the host for the exact global merge (all averaging in
IEEE f64 with the reference's +.499 rounding, graph.c:141,170-172 — TPU f64
is emulated and not bit-safe for that).

The host DataSet stays the source of truth: after each device round the host
applies the *same* stable permutations (cm then cs sort) to its tables, so
tie orders track the reference's physical re-sorts exactly.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.data import DataSet
from ..options import PgOpt
from ..ops import device as dev
from ..ops.device_engine import hash_u32_np
from ..ops.overlap import cds_len_all
from .mesh import make_mesh

KEY_B = 44  # composite sort key: cid << KEY_B | coord


# ---------------------------------------------------------------------------
# per-genome device step (vmapped over the local genome shard)
# ---------------------------------------------------------------------------

def _gather_exons(off, n_ex, cs, ex_os, ex_oe, K: int):
    kk = jnp.arange(K, dtype=jnp.int64)[None, :]
    idx = off.astype(jnp.int64)[:, None] + kk
    emask = kk < n_ex.astype(jnp.int64)[:, None]
    idxc = jnp.clip(idx, 0, ex_os.shape[0] - 1)
    abs_os = jnp.where(emask, ex_os[idxc].astype(jnp.int64) + cs[:, None], 0)
    abs_oe = jnp.where(emask, ex_oe[idxc].astype(jnp.int64) + cs[:, None], 0)
    return abs_os, abs_oe


def _genome_round(cols: Dict[str, jnp.ndarray], ex_os, ex_oe, g2s,
                  *, min_ov_ratio: float, W: int, K: int, check_strand: bool,
                  use_ori: bool, n_gene: int):
    H = cols["cid"].shape[0]
    valid = cols["valid"]
    iota = jnp.arange(H, dtype=jnp.int32)

    # 1. shadow sweep on the cs-sorted state
    abs_os, abs_oe = _gather_exons(cols["off_exon"], cols["n_exon"],
                                   cols["cs"], ex_os, ex_oe, K)
    sc = dev.SweepCols(
        valid=valid, cid=cols["cid"], cs=cols["cs"], ce=cols["ce"],
        flt=cols["flt"] != 0, rev=cols["rev"].astype(jnp.int32),
        rank=cols["rank"], gid=cols["gid"], pscore=cols["pscore"],
        weak_br=cols["weak_br"].astype(jnp.int32), cds_len=cols["cds_len"],
        ex_os=abs_os, ex_oe=abs_oe)
    marks, b_score, b_other, b_ov = dev.shadow_kernel(
        sc, min_ov_ratio, W=W, check_strand=check_strand)
    nonflt = cols["flt"] == 0
    evaluated = nonflt & (iota >= 1) & valid
    shadow = jnp.where(evaluated, marks, (cols["shadow"] != 0) | marks)
    shadow = shadow.astype(jnp.uint8)

    # 2. stable (cid, cm) sort
    key = (cols["cid"].astype(jnp.int64) << KEY_B) | cols["cm"]
    key = jnp.where(valid, key, jnp.int64(2**62))
    perm = jnp.argsort(key, stable=True)

    def g(name):
        return cols[name][perm]

    kept = (g("flt") == 0) & (shadow[perm] == 0) & valid[perm]
    sid = g2s[jnp.clip(g("gid"), 0, n_gene - 1)].astype(jnp.int64)
    w = (sid << 1) | g("rev").astype(jnp.int64)
    dom_gid = g("dom_gid")
    use_ori_vec = (use_ori
                   | (g("score_ori") > g("score_dom"))
                   | (dom_gid < 0)
                   | (g2s[jnp.clip(dom_gid, 0, n_gene - 1)] >= 0))
    scsel = jnp.where(use_ori_vec, g("score_ori"), g("score_dom")) \
        .astype(jnp.int64)
    cm_s = g("cm")
    cid_s = g("cid")

    # 3. walk: previous kept hit via inclusive running max of kept indices
    idxk = jnp.where(kept, iota, -1)
    run = lax.associative_scan(jnp.maximum, idxk)
    prev = jnp.concatenate([jnp.array([-1], jnp.int32), run[:-1]])
    prevc = jnp.clip(prev, 0, H - 1)
    pair_ok = kept & (prev >= 0) & (cid_s[prevc] == cid_s)
    v = w[prevc]
    dist = (cm_s - cm_s[prevc]).astype(jnp.int32).astype(jnp.int64)
    s1 = scsel[prevc]
    s2 = scsel
    x_fwd = (v.astype(jnp.uint64) << jnp.uint64(32)) | w.astype(jnp.uint64)
    x_rev = ((w ^ 1).astype(jnp.uint64) << jnp.uint64(32)) \
        | (v ^ 1).astype(jnp.uint64)
    ax = jnp.concatenate([x_fwd, x_rev])
    ad = jnp.concatenate([dist, dist])
    a1 = jnp.concatenate([s1, s2])
    a2 = jnp.concatenate([s2, s1])
    avalid = jnp.concatenate([pair_ok, pair_ok])

    # 4. per-genome dedupe: sort by x, segment-reduce
    akey = jnp.where(avalid, ax, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    aperm = jnp.argsort(akey, stable=True)
    xs = akey[aperm]
    vs = avalid[aperm]
    ds = jnp.where(vs, ad[aperm], 0)
    s1s = jnp.where(vs, a1[aperm], 0).astype(jnp.int32)
    s2s = jnp.where(vs, a2[aperm], 0).astype(jnp.int32)
    newgrp = jnp.concatenate([jnp.array([True]), xs[1:] != xs[:-1]])
    gidx = jnp.cumsum(newgrp) - 1
    n2 = xs.shape[0]
    cnt = jax.ops.segment_sum(vs.astype(jnp.int32), gidx, num_segments=n2)
    dsum = jax.ops.segment_sum(ds, gidx, num_segments=n2)
    m1 = jax.ops.segment_max(jnp.where(vs, s1s, jnp.int32(-2**31 + 1)),
                             gidx, num_segments=n2)
    m2 = jax.ops.segment_max(jnp.where(vs, s2s, jnp.int32(-2**31 + 1)),
                             gidx, num_segments=n2)
    uniq_x = jax.ops.segment_max(jnp.where(vs, xs, jnp.uint64(0)),
                                 gidx, num_segments=n2)

    # 5. seg occurrence counters (gene-indexed, psum'd by the caller)
    sidc = jnp.clip(sid, 0, n_gene - 1).astype(jnp.int32)
    cnts = jnp.zeros(n_gene, jnp.int32).at[sidc].add(
        kept.astype(jnp.int32), mode="drop")

    return (shadow, b_score, b_other, uniq_x, cnt, dsum, m1, m2, cnts)


# ---------------------------------------------------------------------------
# sharded step over the genome mesh axis
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("min_ov_ratio", "W", "K", "check_strand",
                                    "use_ori", "n_gene", "mesh"))
def round_step(cols, ex_os, ex_oe, g2s, *, min_ov_ratio, W, K, check_strand,
               use_ori, n_gene, mesh):
    """One graph-round device step over all genomes: [G, ...] sharded on 'g'."""
    def per_shard(cols_l, ex_os_l, ex_oe_l, g2s_r):
        fn = functools.partial(_genome_round, min_ov_ratio=min_ov_ratio,
                               W=W, K=K, check_strand=check_strand,
                               use_ori=use_ori, n_gene=n_gene)
        outs = jax.vmap(lambda c, eo, ee: fn(c, eo, ee, g2s_r)
                        )(cols_l, ex_os_l, ex_oe_l)
        (shadow, b_score, b_other, uniq_x, cnt, dsum, m1, m2, cnts) = outs
        tot_cnt = lax.psum(cnts.sum(0), "g")
        n_genome = lax.psum((cnts > 0).astype(jnp.int32).sum(0), "g")
        return (shadow, b_score, b_other, uniq_x, cnt, dsum, m1, m2,
                tot_cnt, n_genome)

    gs = P("g")
    rep = P()
    outs = shard_map(
        per_shard, mesh=mesh,
        in_specs=({k: gs for k in cols}, gs, gs, rep),
        out_specs=(gs, gs, gs, gs, gs, gs, gs, gs, rep, rep),
        check_rep=False,
    )(cols, ex_os, ex_oe, g2s)
    # pack per-genome outputs into ONE int64 plane and the replicated
    # reductions into one vector: device->host pulls are latency-bound
    # (~100ms each through the axon tunnel), so the round must cost two
    # transfers, not eleven
    (shadow, b_score, b_other, uniq_x, cnt, dsum, m1, m2,
     tot_cnt, n_genome) = outs
    big = jnp.concatenate([
        shadow.astype(jnp.int64),
        b_score.view(jnp.int64) if b_score.dtype == jnp.uint64
        else b_score.astype(jnp.int64),
        b_other.astype(jnp.int64),
        uniq_x.view(jnp.int64) if uniq_x.dtype == jnp.uint64
        else uniq_x.astype(jnp.int64),
        cnt.astype(jnp.int64), dsum.astype(jnp.int64),
        m1.astype(jnp.int64), m2.astype(jnp.int64)], axis=1)
    small = jnp.concatenate([
        tot_cnt.astype(jnp.int64).ravel(),
        n_genome.astype(jnp.int64).ravel()])
    return big, small


STACK_COLS_I32 = ("cid", "rank", "gid", "dom_gid", "score_ori", "score_dom",
                  "n_exon", "off_exon", "cds_len")
STACK_COLS_U8 = ("flt", "shadow", "rev", "weak_br")
STACK_COLS_I64 = ("cs", "ce", "cm")


def build_stacked(d: DataSet, H: int, E: int) -> Tuple[dict, np.ndarray, np.ndarray]:
    """Stack per-genome tables into padded [G, H] / [G, E] arrays."""
    G = d.n_genome
    prot_gid = np.asarray(d.prot_gid, np.int32)
    pref = np.asarray(d.gene_preferred, np.uint8)
    cols = {k: np.zeros((G, H), np.int32) for k in STACK_COLS_I32}
    cols.update({k: np.zeros((G, H), np.uint8) for k in STACK_COLS_U8})
    cols.update({k: np.zeros((G, H), np.int64) for k in STACK_COLS_I64})
    cols["pscore"] = np.zeros((G, H), np.uint64)
    cols["valid"] = np.zeros((G, H), bool)
    cols["cid"][:] = dev.PAD_CID
    cols["ce"][:] = -1
    cols["dom_gid"][:] = -1
    cols["cds_len"][:] = 1
    ex_os = np.zeros((G, E), np.int32)
    ex_oe = np.zeros((G, E), np.int32)
    for j, g in enumerate(d.genomes):
        h = g.hits
        n = len(h)
        cols["valid"][j, :n] = True
        gid = prot_gid[h.pid]
        for k in STACK_COLS_I32 + STACK_COLS_U8 + STACK_COLS_I64:
            if k == "gid":
                cols[k][j, :n] = gid
            elif k == "dom_gid":
                dg = np.where(h.pid_dom0 >= 0,
                              prot_gid[np.clip(h.pid_dom0, 0, None)], -1)
                cols[k][j, :n] = dg
            elif k == "cds_len":
                cols[k][j, :n] = cds_len_all(g)
            else:
                cols[k][j, :n] = h.cols[k]
        hashes = hash_u32_np(h.pid)
        cols["pscore"][j, :n] = (
            (h.score_adj.astype(np.int64).astype(np.uint64) << np.uint64(33))
            | (pref[gid].astype(np.uint64) << np.uint64(32))
            | hashes.astype(np.uint64))
        ne = len(g.exon_os)
        ex_os[j, :ne] = g.exon_os
        ex_oe[j, :ne] = g.exon_oe
    return cols, ex_os, ex_oe


_MUTABLE_COLS = ("flt", "shadow", "weak_br")


def _stack_mutable(d: DataSet, H: int, Gp: int) -> Dict[str, np.ndarray]:
    """Stack only the columns that change between pruning rounds."""
    out = {k: np.zeros((Gp, H), np.uint8) for k in _MUTABLE_COLS}
    for j, g in enumerate(d.genomes):
        h = g.hits
        n = len(h)
        for k in _MUTABLE_COLS:
            out[k][j, :n] = h.cols[k]
    return out


def gen_arc_sharded(opt: PgOpt, q) -> None:
    """Sharded pg_gen_arc: device round step + exact host merge.

    Byte-equivalent to ops/arcs.gen_arc; shard-count independent because all
    averaging happens on host from exact integer sums.

    Incremental device state: coordinates, scores, exon tables and packed
    score keys are frozen after ingest, so their stacked [G, H] device
    arrays are uploaded ONCE and reused across all ~17 rounds; only the
    three mutable flag columns (flt / shadow / weak_br) are re-stacked and
    re-uploaded per round. The cache is keyed on each genome's sort-state
    tag (ops/sort.py): a changed physical order invalidates it.
    """
    from ..ops import arcs as arcs_host
    from ..ops.sort import cm_cycle_view, hit_sort

    d = q.d
    mesh = make_mesh(opt.n_devices)
    G = d.n_genome
    tags = tuple(getattr(g, "_sort_cache", None) and g._sort_cache.state
                 for g in d.genomes)
    cache = getattr(q, "_stacked_dev_cache", None)
    if cache is not None and cache["tags"] == tags and cache["G"] == G:
        H, E, K, W, Gp = (cache[k] for k in ("H", "E", "K", "W", "Gp"))
        const_dev, ex_os_dev, ex_oe_dev = (
            cache["const"], cache["ex_os"], cache["ex_oe"])
    else:
        H = dev.next_pow2(max((g.n_hit for g in d.genomes), default=1))
        E = dev.next_pow2(max((len(g.exon_os) for g in d.genomes), default=1))
        K = dev.next_pow2(max((int(g.hits.n_exon.max(initial=1))
                               for g in d.genomes), default=1), lo=2)
        W = 1
        for g in d.genomes:
            if g.n_hit:
                W = max(W, dev.band_width(g.hits.cid, np.asarray(g.hits.cs),
                                          np.asarray(g.hits.ce)))
        W = dev.next_pow2(W, lo=2)
        W = min(W, H)
        Gp = ((G + mesh.devices.size - 1) // mesh.devices.size) \
            * mesh.devices.size
        cols, ex_os, ex_oe = build_stacked(d, H, E)
        if Gp != G:  # pad the genome axis
            for k in cols:
                pad = np.zeros((Gp - G,) + cols[k].shape[1:], cols[k].dtype)
                if k == "cid":
                    pad[:] = dev.PAD_CID
                cols[k] = np.concatenate([cols[k], pad])
            ex_os = np.concatenate([ex_os, np.zeros((Gp - G, E), np.int32)])
            ex_oe = np.concatenate([ex_oe, np.zeros((Gp - G, E), np.int32)])
        from .mesh import put_sharded
        const_dev = {k: put_sharded(v, mesh) for k, v in cols.items()
                     if k not in _MUTABLE_COLS}
        ex_os_dev = put_sharded(ex_os, mesh)
        ex_oe_dev = put_sharded(ex_oe, mesh)
        q._stacked_dev_cache = {
            "tags": tags, "G": G, "H": H, "E": E, "K": K, "W": W, "Gp": Gp,
            "const": const_dev, "ex_os": ex_os_dev, "ex_oe": ex_oe_dev}

    from .mesh import pull_global, put_sharded
    mut = _stack_mutable(d, H, Gp)
    cols_dev = dict(const_dev)
    cols_dev.update({k: put_sharded(v, mesh) for k, v in mut.items()})

    big_dev, small_dev = round_step(
        cols_dev, ex_os_dev, ex_oe_dev, jnp.asarray(q.g2s),
        min_ov_ratio=float(opt.min_ov_ratio),
        W=W, K=K, check_strand=opt.check_strand,
        use_ori=opt.use_ori_for_branch, n_gene=d.n_gene,
        mesh=mesh)
    big = pull_global(big_dev)       # ONE [G, 13H] pull
    small = np.asarray(small_dev)    # psum'd seg counters
    ng = d.n_gene
    tot_cnt = small[:ng]
    n_genome = small[ng:2 * ng]
    # abort-on-desync validation of the psum'd reductions (SURVEY §5): a
    # shard disagreeing on topology would corrupt these silently otherwise
    if len(n_genome) and (int(n_genome.max(initial=0)) > G
                          or int(n_genome.min(initial=0)) < 0
                          or int(tot_cnt.min(initial=0)) < 0):
        raise RuntimeError(
            "sharded reduction desync: per-gene genome counts outside "
            "[0, %d] — device shards disagree on the hit tables" % G)
    o = 0
    shadow = big[:, o:o + H]; o += H
    b_score = big[:, o:o + H].view(np.uint64); o += H
    b_other = big[:, o:o + H]; o += H
    A = 2 * H
    uniq_x = big[:, o:o + A].view(np.uint64); o += A
    cnt = big[:, o:o + A]; o += A
    dsum = big[:, o:o + A]; o += A
    m1 = big[:, o:o + A].astype(np.int32); o += A
    m2 = big[:, o:o + A].astype(np.int32); o += A

    # apply per-genome results to host tables + the same physical re-sorts
    per_genome = []
    for j, g in enumerate(d.genomes):
        h = g.hits
        n = len(h)
        nonflt = h.flt == 0
        h.set("shadow", shadow[j, :n])
        # pid_dom refresh like the reference final loop (dominator argmax)
        has_dom = nonflt & (b_score[j, :n] > 0)
        other = np.clip(b_other[j, :n], 0, max(n - 1, 0))
        pid_dom = np.where(nonflt, -1, h.pid_dom)
        pid_dom = np.where(has_dom, h.pid[other], pid_dom)
        h.set("pid_dom", pid_dom.astype(np.int32))
        # mirror the reference's physical cm->cs resort; once the round
        # trip is a known cycle it is the identity and can be skipped
        if cm_cycle_view(g) is None:
            hit_sort(g, by_cm=True)
            hit_sort(g, by_cm=False)
        sel = cnt[j] > 0
        per_genome.append((uniq_x[j][sel], cnt[j][sel].astype(np.int32),
                           (dsum[j][sel].astype(np.float64) / cnt[j][sel]
                            + 0.499).astype(np.int64).astype(np.int32),
                           m1[j][sel], m2[j][sel]))
    if q.n_seg:
        q.seg_tot_cnt = tot_cnt[:q.n_seg].astype(np.int32)
        q.seg_n_genome = n_genome[:q.n_seg].astype(np.int32)
    q.arcs = arcs_host.merge_arcs(per_genome)


# ---------------------------------------------------------------------------
# cross-genome reductions (post-process): psum'd id-indexed accumulators
# ---------------------------------------------------------------------------

def post_reductions_sharded(opt: PgOpt, d: DataSet):
    """Protein-keyed cross-genome reductions on the genome mesh, feeding
    pg_cap_score_dom / pg_flag_representative / pg_flag_pseudo_joint.
    Returns (mx, z, (c, s)) in the exact formats the host functions use;
    integer psums make the results bit-equal to the host loops."""
    mesh = make_mesh(opt.n_devices)
    G = d.n_genome
    H = dev.next_pow2(max((g.n_hit for g in d.genomes), default=1))
    Gp = ((G + mesh.devices.size - 1) // mesh.devices.size) \
        * mesh.devices.size
    n_prot = max(d.n_prot, 1)
    cols = {k: np.zeros((Gp, H), np.int32)
            for k in ("pid", "score_ori", "score_adj", "n_exon", "rank")}
    cols["flt"] = np.ones((Gp, H), np.uint8)
    cols["valid"] = np.zeros((Gp, H), bool)
    for j, g in enumerate(d.genomes):
        h = g.hits
        n = len(h)
        for k in ("pid", "score_ori", "score_adj", "n_exon", "rank"):
            cols[k][j, :n] = h.cols[k]
        cols["flt"][j, :n] = h.flt
        cols["valid"][j, :n] = True
    from .mesh import put_sharded
    outs = reduction_step(
        put_sharded(cols["pid"], mesh), put_sharded(cols["score_ori"], mesh),
        put_sharded(cols["score_adj"], mesh),
        put_sharded(cols["n_exon"], mesh),
        put_sharded(cols["rank"], mesh), put_sharded(cols["flt"], mesh),
        put_sharded(cols["valid"], mesh), n_prot=n_prot, mesh=mesh)
    packed = jnp.concatenate([o.astype(jnp.int64).ravel() for o in outs])
    arr = np.asarray(packed)           # one pull
    P_ = n_prot
    max_so = arr[:P_].astype(np.int32)
    cnt0, cnt1, sum0, sum1, rep_sum, rep_cnt = (
        arr[P_ * (1 + i):P_ * (2 + i)] for i in range(6))
    mx = max_so[:d.n_prot]
    z = ((rep_sum.astype(np.uint64) << np.uint64(32))
         + rep_cnt.astype(np.uint64))[:d.n_prot]
    c = np.stack([cnt0, cnt1], axis=1)[:d.n_prot]
    s = np.stack([sum0, sum1], axis=1)[:d.n_prot]
    return mx, z, (c, s)


@functools.partial(jax.jit, static_argnames=("n_prot", "mesh"))
def reduction_step(pid, score_ori, score_adj, n_exon, rank, flt, valid, *,
                   n_prot, mesh):
    """Sharded protein-keyed reductions feeding pg_cap_score_dom /
    pg_flag_representative / pg_flag_pseudo_joint (hit.c:148-247).

    Inputs are [G, H] sharded on 'g'; outputs are replicated [n_prot]
    tensors: max score_ori, (count, score sums) split single/multi-exon for
    rank-0 unfiltered hits, and representative (sum score_adj, count).
    """
    def per_shard(pid_l, so_l, sa_l, ne_l, rk_l, flt_l, va_l):
        pidc = jnp.clip(pid_l, 0, n_prot - 1).reshape(-1)
        va = va_l.reshape(-1)
        so = so_l.reshape(-1)
        sa = sa_l.reshape(-1).astype(jnp.int64)
        multi = (ne_l.reshape(-1) != 1)
        r0 = (rk_l.reshape(-1) == 0) & (flt_l.reshape(-1) == 0) & va
        max_so = jnp.zeros(n_prot, jnp.int32).at[pidc].max(
            jnp.where(va, so, 0), mode="drop")
        cnt0 = jnp.zeros(n_prot, jnp.int64).at[pidc].add(
            (r0 & ~multi).astype(jnp.int64), mode="drop")
        cnt1 = jnp.zeros(n_prot, jnp.int64).at[pidc].add(
            (r0 & multi).astype(jnp.int64), mode="drop")
        sum0 = jnp.zeros(n_prot, jnp.int64).at[pidc].add(
            jnp.where(r0 & ~multi, so.astype(jnp.int64), 0), mode="drop")
        sum1 = jnp.zeros(n_prot, jnp.int64).at[pidc].add(
            jnp.where(r0 & multi, so.astype(jnp.int64), 0), mode="drop")
        rep_sum = jnp.zeros(n_prot, jnp.int64).at[pidc].add(
            jnp.where(r0, sa, 0), mode="drop")
        rep_cnt = jnp.zeros(n_prot, jnp.int64).at[pidc].add(
            r0.astype(jnp.int64), mode="drop")
        outs = (max_so, cnt0, cnt1, sum0, sum1, rep_sum, rep_cnt)
        return tuple(lax.pmax(o, "g") if i == 0 else lax.psum(o, "g")
                     for i, o in enumerate(outs))

    gs = P("g")
    rep = P()
    return shard_map(per_shard, mesh=mesh,
                     in_specs=(gs,) * 7, out_specs=(rep,) * 7,
                     check_rep=False)(pid, score_ori, score_adj, n_exon,
                                      rank, flt, valid)
