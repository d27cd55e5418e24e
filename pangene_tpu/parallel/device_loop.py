"""Device-resident graph-round schedule: phases 2+3 of pg_graph_gen
(reference graph.c:280-322) as ONE jitted program on the genome mesh.

Motivation (measured): the per-round sharded step (parallel/stacked.py)
costs one [G, 13H] device->host plane per round, and the axon tunnel has a
~170 ms latency floor per transfer — 17 rounds were ~36x slower than the
host engine. This module removes EVERY per-round host sync: after the host
runs phase 1 (which also settles the physical sort order into its steady
cycle), the remaining (1 + n_branch_flt) rounds — branch marking
(branch.c:48-106), weak propagation (branch.c:108-145), weak/vertex
filtering, the annealed high-occurrence filter (graph.c:237-263) and arc
regeneration with the two-level exact-integer merge (graph.c:87-177) — run
inside a single lax.fori_loop under one shard_map, with lax.psum /
all_gather collectives across the 'g' axis. One upload, one compiled
program, one pull.

Bit-exactness:
  * Every in-loop IEEE-double expression of the reference runs through
    ops/softfloat (exact integer emulation): the per-genome dist average
    and merged s1/s2 averages ``(int)((double)S/n + .499)``
    (graph.c:141,170-172), the branch deficit ``1.0 - (double)s1/max``
    compared against -b/-y/-B (branch.c:72-78), and the shadow coverage
    gate (overlap.c:134-136, inside ops/device.shadow_kernel).
  * Physical hit order: the reference re-sorts every genome cm->cs each
    round; once that round trip is a cycle (ops/sort.py), the cs order is
    a fixed point and the cm order is a fixed gather view — both verified
    on host before entry (fallback to the host rounds otherwise).
  * Kept-row compaction: only flt==0 rows are uploaded (phase 1 filters
    ~half the hits, and flt is monotone — the reference skips flt rows on
    both sides of every evaluation), shrinking every [G, H] plane, the
    sweep band and the merge keys ~2x. Dropped rows keep their entry
    flt/shadow/weak_br/pid_dom on the host (the stale-flag quirks); the
    reference's "hit 0 is never evaluated" rule rides the ev1 plane
    (original-index >= 1) instead of the compacted row index.
  * Segment deletion keeps ORIGINAL seg ids behind an alive-mask; the
    reference's hard-compaction (graph.c:219-235) is order-preserving, so
    arc keys group and sort identically; ids are compacted once on the
    host after the loop.
  * Capacity overflows (arc table, branch window) set a flag and the host
    falls back to the reference-exact host rounds.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..options import PgOpt
from ..ops import device as dev
from ..ops import softfloat as sf
from ..util import log_msg
from .mesh import make_mesh

I64 = jnp.int64
SENT_I = (1 << 62) - 1                   # host-side value (no device pull)
KSENT_I = (1 << 62)
SENT = jnp.int64(SENT_I)                 # empty arc-table slot
KSENT = jnp.int64(KSENT_I)               # merge-sort key for invalid rows


# packed upload layout: the tunnel charges ~170ms latency per transfer, so
# the per-hit columns ship as FIVE stacked arrays instead of twenty.
# Coordinates (cs/ce/cm) ship as int32 whenever every value fits (true for
# any real assembly: contigs < 2^31 bp) — ~40% fewer upload bytes and
# half the integer width in the sweep's hot [H, K, K] block; an out-of-
# range coordinate falls back to the exact int64 variant of the program.
PACK_I32 = ("cid", "rank", "gid", "dom_gid", "score_ori", "score_dom",
            "cds_len", "n_exon", "off_exon", "pid", "pid_dom", "ordcm")
PACK_C = ("cs", "ce", "cm")      # int32 or int64 (coord32)
# ev1: original hit index >= 1 — the reference's "hit 0 is never the
# evaluated side of a shadow pair" rule (overlap.c:101 loop from i=1) must
# survive kept-row compaction, where the first KEPT row may not be the
# genome's original row 0
PACK_U8 = ("flt", "shadow", "weak_br", "valid", "rev", "ev1")


class Cfg(NamedTuple):
    """Static compile-time configuration of the device schedule."""
    H: int          # hit capacity per genome
    K: int          # exon capacity per hit
    W: int          # sweep band width
    S: int          # segment count at entry (original ids)
    A: int          # merged arc-table capacity
    D: int          # max arcs per oriented vertex (branch window)
    B: int          # bits of a packed vertex (sid<<1|rev < 2^B)
    GB: int         # bits of a genome index
    JB: int         # bits of a global pair-row index packed into the lean
                    # sort key (0 = disabled: 2B+GB+JB would exceed 62)
    n_gene: int
    R: int          # device rounds: 1 (phase 2) + n_branch_flt
    G_loc: int      # genomes per shard
    coord32: bool   # cs/ce/cm (and exon abs coords) carried as int32
    check_strand: bool
    use_ori: bool
    frag_mode: bool
    min_ov_ratio: float
    branch_diff: float
    branch_diff_dist: float
    branch_diff_cut: float
    local_dist: int
    local_count: int
    # nd > 1 only: per-round merge runs as a bucket-exchange distributed
    # sort (keys partitioned by out-vertex range) instead of the
    # replicated all_gather + full sort; 0 disables (A/B knob). Value is
    # the per-(src,dst) all_to_all chunk capacity (static); a dest count
    # above it sets the overflow flag -> exact host fallback.
    a2a_cap: int
    # columnsort column counts for the per-round lean merge sort (0 =
    # plain lax.sort): the same keys as 4-5 BATCHED lane sorts instead
    # of one 1D bitonic network (ops/device.colsort_i64 — bit-identical,
    # keys are distinct). colsort: the replicated N-key sort;
    # colsort_loc: the sharded path's NL-key local sort.
    colsort: int
    colsort_loc: int


def _seg_reduce(op, vals, seg_id, n):
    # every seg_id in the schedule is cumsum-derived (ascending):
    # indices_are_sorted lets XLA:TPU lower the scatter without the
    # unsorted-duplicate serialization path
    return op(vals, seg_id, num_segments=n, indices_are_sorted=True)


def _plus499_i32(S, n):
    return sf.plus499_trunc(S, jnp.maximum(n, 1)).astype(jnp.int32)


def _steady_cm_views(d):
    """Per genome: the cm-order index vector IF the cm->cs round trip from
    the current physical order is a cycle (no mutation); None otherwise."""
    views = []
    for g in d.genomes:
        h = g.hits
        n = len(h)
        if n == 0:
            views.append(np.zeros(0, np.int64))
            continue
        cid = np.asarray(h.cid)
        perm_cm = np.lexsort((np.asarray(h.cm), cid))
        back = np.lexsort((np.asarray(h.cs)[perm_cm], cid[perm_cm]))
        if not np.array_equal(perm_cm[back], np.arange(n)):
            return None
        views.append(perm_cm.astype(np.int64))
    return views


# ---------------------------------------------------------------------------
# the jitted schedule
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _schedule(blk_i32, blk_c, blk_ps, blk_u8, blk_ex, seg_gid, sid_of,
              arc0_vw, arc0_s1, seg_tot0, seg_ng0, occ_cut, deg_cut,
              loci_cut, do_branch, do_occ, do_sweep, do_walk, no_skip, *,
              cfg: Cfg, mesh):
    gs = P("g")
    rep = P()
    nd = mesh.devices.size

    def per_shard(blk_i32, blk_c, blk_ps, blk_u8, blk_ex, seg_gid, sid_of,
                  arc0_vw, arc0_s1, seg_tot0, seg_ng0, occ_cut, deg_cut,
                  loci_cut, do_branch, do_occ, do_sweep, do_walk,
                  no_skip):
        # blocks are packed with the column index LEADING so each slice is
        # a contiguous [Gl, H] buffer (a minor-dim stride would wreck every
        # downstream vector op on TPU)
        cols = {n: blk_i32[i] for i, n in enumerate(PACK_I32)}
        cols.update({n: blk_c[i] for i, n in enumerate(PACK_C)})
        cols.update({n: blk_u8[i] for i, n in enumerate(PACK_U8)})
        cols["pscore"] = blk_ps[0].astype(jnp.uint64)
        cols["valid"] = cols["valid"] != 0
        ordcm = cols.pop("ordcm")
        exo = blk_ex[0]
        exe = blk_ex[1]
        Gl, H = cols["cid"].shape
        S, A, D, B, GB = cfg.S, cfg.A, cfg.D, cfg.B, cfg.GB
        ng = cfg.n_gene
        iotaH = jnp.arange(H, dtype=jnp.int32)
        iotaA = jnp.arange(A, dtype=jnp.int64)
        jglob = (lax.axis_index("g").astype(I64) * cfg.G_loc
                 + jnp.arange(Gl, dtype=I64))          # [Gl]
        wmask = jnp.int64((1 << B) - 1)

        # ---- one-time device-side constant prep ----
        # exon gather in the coordinate dtype (int32 keeps the sweep's
        # [H, K, K] intersection block at native vector width)
        cdt = cols["cs"].dtype

        def _gather_ex(off, ne, cs, eo, ee):
            kk = jnp.arange(cfg.K, dtype=jnp.int32)[None, :]
            idx = off[:, None] + kk
            emask = kk < ne[:, None]
            idxc = jnp.clip(idx, 0, eo.shape[0] - 1)
            a_os = jnp.where(emask, eo[idxc].astype(cdt) + cs[:, None], 0)
            a_oe = jnp.where(emask, ee[idxc].astype(cdt) + cs[:, None], 0)
            return a_os, a_oe

        abs_os, abs_oe = jax.vmap(_gather_ex)(
            cols["off_exon"], cols["n_exon"], cols["cs"], exo, exe)

        def g_cm(a):  # gather a [Gl, H] column into cm order
            return jnp.take_along_axis(a, ordcm, axis=1)

        cid_cm = g_cm(cols["cid"])
        cm_cm = g_cm(cols["cm"])
        gid_cm = g_cm(cols["gid"])
        rev_cm = g_cm(cols["rev"].astype(jnp.int32))
        so_cm = g_cm(cols["score_ori"])
        sd_cm = g_cm(cols["score_dom"])
        dg_cm = g_cm(cols["dom_gid"])
        valid_cm = g_cm(cols["valid"].astype(jnp.int32)) != 0
        sid_cm = sid_of[jnp.clip(gid_cm, 0, ng - 1)]
        dsid_cm = sid_of[jnp.clip(dg_cm, 0, ng - 1)]

        def kept_pairs(flt, shadow, alive):
            """Adjacent kept pairs in cm order: (pair_ok, prev, i, v, w,
            dist, s1, s2) as [Gl, H] arrays (positions are cm-order)."""
            keptc = (~flt) & (~shadow)
            kept = g_cm(keptc.astype(jnp.int32)).astype(bool) & valid_cm
            idxk = jnp.where(kept, iotaH[None, :], -1)
            run = lax.associative_scan(jnp.maximum, idxk, axis=1)
            prev = jnp.concatenate(
                [jnp.full((Gl, 1), -1, jnp.int32), run[:, :-1]], axis=1)
            prevc = jnp.clip(prev, 0, H - 1)
            take = lambda a: jnp.take_along_axis(a, prevc, axis=1)
            pair_ok = kept & (prev >= 0) & (take(cid_cm) == cid_cm)
            w = (sid_cm.astype(I64) << 1) | rev_cm.astype(I64)
            v = take(w)
            # dist truncates to int32 like the reference pg_tmparc_t
            dist = (cm_cm - take(cm_cm)).astype(jnp.int32)
            dom_alive = (dg_cm >= 0) & (dsid_cm >= 0) \
                & alive[jnp.clip(dsid_cm, 0, S - 1)]
            use_ori_vec = (cfg.use_ori | (so_cm > sd_cm) | (dg_cm < 0)
                           | dom_alive)
            sc = jnp.where(use_ori_vec, so_cm, sd_cm)
            return kept, pair_ok, prev, v, w, dist, take(sc), sc

        rowsG = jnp.arange(Gl)[:, None]

        # ---- round-invariant sweep geometry (ONE K^2 exon pass) ----
        # the shadow sweep's pair gates, exact cov_short division and
        # uint64 score order depend only on static columns; pack them as
        # [Gl, W, H] uint8 bit-planes so each round's sweep is pure
        # bitwise work (dev.sweep_geo_planes docstring)
        sc_static = dev.SweepCols(
            valid=cols["valid"], cid=cols["cid"], cs=cols["cs"],
            ce=cols["ce"], flt=jnp.zeros_like(cols["valid"]),
            rev=cols["rev"].astype(jnp.int32), rank=cols["rank"],
            gid=cols["gid"], pscore=cols["pscore"],
            weak_br=jnp.zeros_like(cols["rank"]),
            cds_len=cols["cds_len"], ex_os=abs_os, ex_oe=abs_oe)
        geo_planes = jax.vmap(
            lambda c: dev.sweep_geo_planes(
                c, cfg.min_ov_ratio, W=cfg.W,
                check_strand=cfg.check_strand))(sc_static)

        def walk_merge(flt_b, shadow_b, alive, full: bool):
            """Walk + two-level merge (graph.c:87-177) from ONE global sort
            of (vw, genome) keys. full=False (in-loop) computes only what
            the rounds consume (group structure + the exact s1 average) and
            additionally records, per pair slot, the arc ROW its key landed
            in — the next round's weak propagation (branch.c:108-145) is
            then two gathers instead of a second multi-million-row
            sort-join (the pairs it walks are built from the SAME
            flt/shadow state this merge consumed); full=True (after the
            loop) adds the output-only stats (tot_cnt, dist, s2)."""
            kept, pair_ok, prev, v, w, dist, s1w, s2w = kept_pairs(
                flt_b, shadow_b, alive)
            sidc = jnp.clip(sid_cm, 0, S - 1)
            cnts = jnp.zeros((Gl, S), jnp.int32).at[rowsG, sidc].add(
                kept.astype(jnp.int32), mode="drop")
            seg_tot = lax.psum(cnts.sum(0, dtype=jnp.int32), "g")
            seg_ng = lax.psum((cnts > 0).sum(0, dtype=jnp.int32), "g")

            kf = (v << B) | w
            kr = ((w ^ 1) << B) | (v ^ 1)
            keys = jnp.concatenate([kf, kr], axis=1)          # [Gl, 2H]
            keys = (keys << GB) | jglob[:, None]
            ok2 = jnp.concatenate([pair_ok, pair_ok], axis=1)
            keys = jnp.where(ok2, keys, KSENT)
            s1_2 = jnp.concatenate([s1w, s2w], axis=1)
            ga = lambda a: lax.all_gather(a, "g", tiled=True).reshape(-1)
            # JB low bits of the lean sort key carry the global row index:
            # the per-round merge then sorts ONE i64 array (half the
            # bitonic-pass traffic of co-sorting payloads) and recovers the
            # permutation + s1 by mask/gather. Stable-sort equivalent: jo
            # increases with gathered position, so (key|jo) order == stable
            # order, and every consumer (segment max/sum, per-row scatter)
            # is order-invariant within a tie anyway. Falls back to the
            # co-sorted form when 2B+GB+JB > 62 (checked at entry, static).
            NL = Gl * 2 * H
            JB = cfg.JB
            so = None
            if (not full) and JB and nd > 1 and cfg.a2a_cap:
                # ---- bucket-exchange distributed merge (nd > 1) ----
                # The replicated form makes EVERY shard all_gather + sort
                # all Gp*2H keys (54% replicated overhead at 8 shards,
                # MESH_SCALING round 4). Keys are monotone in the out-
                # vertex v (top bits), so partitioning the key space into
                # nd contiguous v-ranges keeps every out-group (vw) and
                # in-group (vw, g) whole, and
                #   concat_t(sort(keys with dest t)) == sort(all keys)
                # EXACTLY. Each shard lean-sorts its NL local keys, counts
                # per-dest runs (contiguous, because dest is monotone in
                # the sorted key), exchanges [nd, C] chunks via all_to_all
                # (keys + s1 payload), sorts only its own range
                # (~2N/nd instead of N), reduces groups locally, and
                # rebuilds the replicated [A] arc planes by a windowed
                # scatter at its global arc offset + psum. Pair-slot arc
                # rows route back to their origin shard by a second
                # all_to_all aligned with the send slots. A per-dest count
                # above C folds into the existing n_out > A overflow ->
                # byte-exact host fallback.
                C = cfg.a2a_cap
                base = lax.axis_index("g").astype(I64) * NL
                jo_loc = (base + jnp.arange(NL, dtype=I64)) \
                    .reshape(Gl, 2 * H)
                kp = jnp.where(ok2, (keys << JB) | jo_loc, KSENT) \
                    .reshape(-1)
                s1f = s1_2.reshape(-1)
                kps_l = dev.colsort_i64(kp, cfg.colsort_loc) \
                    if cfg.colsort_loc else lax.sort(kp)  # local lean sort
                validl = kps_l != KSENT
                v_of = kps_l >> (JB + GB + B)
                dest = jnp.clip((v_of * nd) // (2 * S), 0, nd - 1) \
                    .astype(jnp.int32)
                cnt = jnp.zeros(nd, jnp.int32).at[dest].add(
                    validl.astype(jnp.int32), mode="drop")
                start = jnp.concatenate(
                    [jnp.zeros(1, jnp.int32),
                     jnp.cumsum(cnt)[:-1].astype(jnp.int32)])
                ovf_x = jnp.any(cnt > C)
                cc = jnp.arange(C, dtype=jnp.int32)[None, :]
                gidx = jnp.clip(start[:, None] + cc, 0, NL - 1)
                smask = cc < cnt[:, None]
                k_g = kps_l[gidx]
                k_send = jnp.where(smask, k_g, KSENT)
                orig_row = jnp.clip(
                    (k_g & ((1 << JB) - 1)) - base, 0, NL - 1) \
                    .astype(jnp.int32)
                s1_send = jnp.where(smask, s1f[orig_row], 0)
                a2a = lambda x: lax.all_to_all(
                    x, "g", split_axis=0, concat_axis=0, tiled=True)
                rk_f = a2a(k_send).reshape(-1)
                rs1_f = a2a(s1_send).reshape(-1)
                RL = rk_f.shape[0]
                rpos0 = jnp.arange(RL, dtype=jnp.int32)
                rk, rpos = lax.sort((rk_f, rpos0), num_keys=1)
                rs1 = rs1_f[rpos]
                keys_r = rk >> JB
                va = keys_r != (KSENT >> JB)
                pkr = jnp.concatenate([jnp.array([KSENT]), keys_r[:-1]])
                in_new = va & (keys_r != pkr)
                in_id = jnp.clip(jnp.cumsum(in_new.astype(jnp.int32)) - 1,
                                 0, RL - 1)
                s1_in = jax.ops.segment_max(jnp.where(va, rs1, 0), in_id,
                                            num_segments=RL, indices_are_sorted=True)
                vw_row = keys_r >> GB
                pvw = jnp.concatenate([jnp.array([KSENT]), vw_row[:-1]])
                out_new = va & (vw_row != pvw)
                out_id = jnp.clip(
                    jnp.cumsum(out_new.astype(jnp.int32)) - 1, 0, RL - 1)
                ng_f = jax.ops.segment_sum(in_new.astype(jnp.int32),
                                           out_id, num_segments=RL, indices_are_sorted=True)
                s1s_f = jax.ops.segment_sum(
                    jnp.where(in_new, s1_in[in_id].astype(I64), 0),
                    out_id, num_segments=RL, indices_are_sorted=True)
                vw_f = jax.ops.segment_max(jnp.where(va, vw_row, 0),
                                           out_id, num_segments=RL, indices_are_sorted=True)
                n_out_l = jnp.sum(out_new.astype(jnp.int64))
                nouts = lax.all_gather(n_out_l, "g")           # [nd]
                my = lax.axis_index("g")
                off = jnp.sum(jnp.where(jnp.arange(nd) < my, nouts, 0))
                n_out = jnp.sum(nouts)
                # capacity overflow rides the existing n_out > A check
                n_out = jnp.where(
                    lax.psum(ovf_x.astype(jnp.int32), "g") > 0,
                    jnp.int64(A + 1), n_out)
                posr = jnp.arange(RL, dtype=jnp.int64)
                lv = posr < n_out_l
                put = lambda vals, dt: lax.dynamic_update_slice(
                    jnp.zeros(A + RL, dt), jnp.where(lv, vals, 0).astype(dt),
                    (off,))[:A]
                live = iotaA < n_out
                s1_loc = _plus499_i32(s1s_f, ng_f.astype(I64))
                vw_gl, s1_gl = lax.psum(
                    (put(vw_f, I64), put(s1_loc, jnp.int32)), "g")
                arc_vw = jnp.where(live, vw_gl, SENT)
                arc_s1 = jnp.where(live, s1_gl, 0)
                lean = (arc_vw, arc_s1, n_out, seg_tot, seg_ng)
                out_gl = (off + out_id.astype(jnp.int64)).astype(jnp.int32)
                reply_f = jnp.zeros(RL, jnp.int32).at[rpos].set(
                    jnp.where(va, out_gl, 0), mode="drop")
                reply = a2a(reply_f.reshape(nd, C))
                pair_loc = jnp.zeros(NL, jnp.int32).at[
                    jnp.where(smask, orig_row, NL)].set(
                    reply, mode="drop")
                mine = pair_loc.reshape(Gl, 2 * H)
                tgt_prev = jnp.take_along_axis(
                    ordcm, jnp.clip(prev, 0, H - 1), axis=1)
                pair_st = (mine[:, :H], mine[:, H:], tgt_prev, pair_ok)
                return lean + (pair_st,)
            if full:
                d2 = jnp.concatenate([dist, dist], axis=1)
                s2_2 = jnp.concatenate([s2w, s1w], axis=1)
                keys, d2, s1_2, s2_2 = lax.sort(
                    (ga(keys), ga(d2), ga(s1_2), ga(s2_2)), num_keys=1)
                N = keys.shape[0]
                va = keys != KSENT
            elif JB:
                base = lax.axis_index("g").astype(I64) * NL
                jo_loc = (base + jnp.arange(NL, dtype=I64)).reshape(Gl, 2 * H)
                kp = jnp.where(ok2, (keys << JB) | jo_loc, KSENT)
                kps = dev.colsort_i64(ga(kp), cfg.colsort) \
                    if cfg.colsort else lax.sort(ga(kp))
                N = kps.shape[0]
                keys = kps >> JB                    # (vw<<GB)|g rows
                va = keys != (KSENT >> JB)
                so = jnp.where(va, kps & ((1 << JB) - 1), N)
                s1_2 = jnp.take(ga(s1_2),
                                jnp.clip(so, 0, N - 1).astype(jnp.int32))
            else:
                gk = ga(keys)
                jo = jnp.arange(gk.shape[0], dtype=jnp.int32)
                keys, s1_2, so = lax.sort((gk, ga(s1_2), jo), num_keys=1)
                N = keys.shape[0]
                va = keys != KSENT
            pk = jnp.concatenate([jnp.array([KSENT]), keys[:-1]])
            in_new = va & (keys != pk)
            in_id = jnp.clip(jnp.cumsum(in_new.astype(jnp.int32)) - 1,
                             0, N - 1)
            s1_in = jax.ops.segment_max(jnp.where(va, s1_2, 0), in_id,
                                        num_segments=N, indices_are_sorted=True)
            vw_row = keys >> GB
            pvw = jnp.concatenate([jnp.array([KSENT]), vw_row[:-1]])
            out_new = va & (vw_row != pvw)
            out_id = jnp.clip(jnp.cumsum(out_new.astype(jnp.int32)) - 1,
                              0, N - 1)
            ng_f = jax.ops.segment_sum(in_new.astype(jnp.int32), out_id,
                                       num_segments=N, indices_are_sorted=True)
            s1s_f = jax.ops.segment_sum(
                jnp.where(in_new, s1_in[in_id].astype(I64), 0), out_id,
                num_segments=N, indices_are_sorted=True)
            vw_f = jax.ops.segment_max(jnp.where(va, vw_row, 0), out_id,
                                       num_segments=N, indices_are_sorted=True)
            n_out = jnp.sum(out_new.astype(jnp.int64))
            live = iotaA < n_out
            arc_vw = jnp.where(live, vw_f[:A], SENT)
            arc_ng = jnp.where(live, ng_f[:A], 0)
            arc_s1s = jnp.where(live, s1s_f[:A], 0)
            arc_s1 = jnp.where(
                live, _plus499_i32(arc_s1s, arc_ng.astype(I64)), 0)
            lean = (arc_vw, arc_s1, n_out, seg_tot, seg_ng)
            if not full:
                # scatter each pair slot's arc row back through the sort
                # permutation; slice this shard's window of the (identical
                # on every shard) global array
                # invalid rows carry so == N (packed path) and are dropped;
                # their pair slots have pair_ok False so 0 is never read
                pair_arc = jnp.zeros(N, jnp.int32).at[so].set(
                    out_id.astype(jnp.int32), mode="drop")
                base = lax.axis_index("g").astype(jnp.int32) * (Gl * 2 * H)
                mine = lax.dynamic_slice_in_dim(
                    pair_arc, base, Gl * 2 * H).reshape(Gl, 2 * H)
                tgt_prev = jnp.take_along_axis(
                    ordcm, jnp.clip(prev, 0, H - 1), axis=1)
                pair_st = (mine[:, :H], mine[:, H:], tgt_prev, pair_ok)
                return lean + (pair_st,)
            cnt_in = jax.ops.segment_sum(va.astype(jnp.int64), in_id,
                                         num_segments=N, indices_are_sorted=True)
            ds_in = jax.ops.segment_sum(
                jnp.where(va, d2.astype(I64), 0), in_id, num_segments=N, indices_are_sorted=True)
            dr_in = sf.plus499_trunc(ds_in, jnp.maximum(cnt_in, 1))
            s2_in = jax.ops.segment_max(jnp.where(va, s2_2, 0), in_id,
                                        num_segments=N, indices_are_sorted=True)
            tot_f = jax.ops.segment_sum(
                jnp.where(in_new, cnt_in[in_id], 0).astype(jnp.int32),
                out_id, num_segments=N, indices_are_sorted=True)
            ds_f = jax.ops.segment_sum(
                jnp.where(in_new, dr_in[in_id] * cnt_in[in_id], 0),
                out_id, num_segments=N, indices_are_sorted=True)
            s2s_f = jax.ops.segment_sum(
                jnp.where(in_new, s2_in[in_id].astype(I64), 0), out_id,
                num_segments=N, indices_are_sorted=True)
            arc_tot = jnp.where(live, tot_f[:A], 0)
            # exact output averages (graph.c:170-172) via softfloat
            arc_ad = jnp.where(live, sf.plus499_trunc(
                jnp.where(live, ds_f[:A], 0),
                jnp.maximum(arc_tot, 1).astype(I64)), 0).astype(jnp.int32)
            arc_s2 = jnp.where(live, _plus499_i32(
                jnp.where(live, s2s_f[:A], 0), arc_ng.astype(I64)), 0)
            return lean + (arc_ng, arc_tot, arc_ad, arc_s2)

        # ---- round body ----
        def body(r, st):
            (flt, weak, shadow, pid_dom, alive, seg_tot, seg_ng,
             arc_vw, arc_s1, pair_st, loci_st, logs, dcap,
             aw_c, n1_c, n2_c, n_out_c, nc_in, overflow) = st
            flt_in, weak_in, alive_in = flt, weak, alive

            # ===== branch marking on the previous round's arcs =====
            valid_a = arc_vw != SENT
            v_a = arc_vw >> B
            prev_v = jnp.concatenate([jnp.array([-1], I64), v_a[:-1]])
            g_new = valid_a & (v_a != prev_v)
            g_id = jnp.clip(jnp.cumsum(g_new.astype(jnp.int32)) - 1, 0, A - 1)
            n_in_g = _seg_reduce(jax.ops.segment_sum,
                                 valid_a.astype(jnp.int32), g_id, A)[g_id]
            gs_of = _seg_reduce(jax.ops.segment_min,
                                jnp.where(valid_a, iotaA, A), g_id, A)[g_id]
            mx = _seg_reduce(jax.ops.segment_max,
                             jnp.where(valid_a, arc_s1, 0), g_id, A)[g_id]
            mx = jnp.maximum(mx, 0)
            branching = valid_a & (n_in_g >= 2)
            tgt_gid = seg_gid[jnp.clip((arc_vw & wmask) >> 1, 0, S - 1)]
            tgt_gid = jnp.clip(tgt_gid, 0, ng - 1)

            def branch_block(_):
                ovf = jnp.any(branching & (n_in_g > D))
                # rep positions (branch.c:6-29): last kept hit per gene in
                # the CURRENT cs order, with its kept-rank and cm
                keptc = ((flt == 0) & (shadow == 0) & cols["valid"])
                krank = jnp.cumsum(keptc.astype(jnp.int32), axis=1) - 1
                pos = jnp.where(keptc, iotaH[None, :], -1)
                gidc = jnp.clip(cols["gid"], 0, ng - 1)
                last = jnp.full((Gl, ng), -1, jnp.int32)
                last = last.at[jnp.arange(Gl)[:, None], gidc].max(
                    pos, mode="drop")
                lastc = jnp.clip(last, 0, H - 1)
                takeg = lambda a: jnp.take_along_axis(a, lastc, axis=1)
                r_pres = last >= 0
                r_cid = takeg(cols["cid"])
                r_rank = takeg(krank)
                r_cm = takeg(cols["cm"])
                # pairwise any-genome locality over the group window
                # (only zero-ness of n_local is ever used: branch.c:76).
                # Group members are CONTIGUOUS runs in the v-sorted arc
                # table, so the partner at in-group offset d is index a+d:
                # a lane ROLL instead of a per-member random gather (TPU
                # gathers measured ~1 ms per [Gl, A] plane — they were
                # ~1.0 s of the 4.2 s on-chip schedule). Locality is
                # symmetric, so only positive offsets run — trip count is
                # max group size - 1 — accumulating just two [A] planes:
                #   any-local-vs-a-MAX-arc (the weak-arc test), and
                #   has-an-EARLIER-local-partner (the n_dist_loci greedy).
                # The self pair (d=0) is unobservable: it only affects
                # arcs that are themselves max, which can never be weak
                # candidates (deficit 0). Roll wraparound pairs fail the
                # same-group check (equal gs_of requires a whole-table
                # group, which overflows D and falls back).
                pa = r_pres[:, tgt_gid]           # [Gl, A], a-side hoisted
                ca = r_cid[:, tgt_gid]
                ma = r_cm[:, tgt_gid]
                # kept-ranks fit int32 (< H); local_count is host-clamped
                # to INT32_MAX, exact because every rank gap fits too
                ra = r_rank[:, tgt_gid]
                is_max = branching & (arc_s1 == mx)
                # Per-trip KERNEL LAUNCH overhead dominated the loop
                # (measured ~4 ms/trip regardless of roll vs slice), so
                # each trip handles CH offsets: one dynamic window of
                # width A+CH-1 per plane, then CH STATIC shifted slices
                # that fuse into a single compare/reduce kernel. The
                # backward (earlier-partner) accumulations reuse the same
                # window trick on lane-reversed stacks:
                # rev(fwd(rev(x), s)) == back(x, s).
                CH = 8
                cat2 = lambda x: jnp.concatenate([x, x], axis=-1)
                pa2, ca2, ma2, ra2 = cat2(pa), cat2(ca), cat2(ma), cat2(ra)
                gs2, va2, im2 = cat2(gs_of), cat2(valid_a), cat2(is_max)

                def loc_chunk(d, st):
                    aml, he = st
                    w = lambda x2: lax.dynamic_slice_in_dim(
                        x2, d, A + CH - 1, axis=x2.ndim - 1)
                    PW, CW, MW, RW = w(pa2), w(ca2), w(ma2), w(ra2)
                    GW, VW, IW = w(gs2), w(va2), w(im2)
                    lps, ims = [], []
                    for k in range(CH):       # static: fuses into one kernel
                        sl = lambda W: lax.slice_in_dim(
                            W, k, k + A, axis=W.ndim - 1)
                        ok = pa & sl(PW)
                        if not cfg.frag_mode:
                            ok &= ca == sl(CW)
                        loc = ok & (
                            (jnp.abs(ma - sl(MW)) <= cfg.local_dist)
                            | (jnp.abs(ra - sl(RW)) <= cfg.local_count))
                        pair_ok = valid_a & (sl(GW) == gs_of) & sl(VW)
                        lp = jnp.any(loc, axis=0) & pair_ok   # local-shard
                        lps.append(lp)
                        ims.append(lp & is_max)
                        aml = aml | (lp & sl(IW))             # later max
                    RL2 = cat2(jnp.stack([x[::-1] for x in lps]))
                    RI2 = cat2(jnp.stack([x[::-1] for x in ims]))
                    RLW = lax.dynamic_slice_in_dim(RL2, d, A + CH - 1, 1)
                    RIW = lax.dynamic_slice_in_dim(RI2, d, A + CH - 1, 1)
                    he_r = jnp.zeros(A, bool)
                    am_r = jnp.zeros(A, bool)
                    for k in range(CH):
                        he_r = he_r | RLW[k, k:k + A]
                        am_r = am_r | RIW[k, k:k + A]
                    he = he | he_r[::-1]                      # earlier local
                    aml = aml | am_r[::-1]                    # earlier max
                    return aml, he

                # trip count = true max group size - 1 offsets, CH per
                # trip, from the REPLICATED arc table: all shards run in
                # lockstep. Offsets beyond the group fail the same-group
                # check, so chunk overshoot needs no masking.
                max_n = jnp.minimum(
                    jnp.max(jnp.where(branching, n_in_g, 0)), D) \
                    .astype(jnp.int32)
                aml0 = jnp.zeros(A, bool)
                he0 = jnp.zeros(A, bool)
                _, (aml, he) = lax.while_loop(
                    lambda st: st[0] < max_n,
                    lambda st: (st[0] + CH, loc_chunk(st[0], st[1])),
                    (jnp.int32(1), (aml0, he0)))
                nloc_any = lax.psum(aml.astype(jnp.int32), "g") > 0
                has_earlier = lax.psum(he.astype(jnp.int32), "g") > 0
                rm, rk = sf.one_minus_div(
                    jnp.maximum(arc_s1, 0).astype(I64),
                    jnp.maximum(mx, 1).astype(I64))
                cand = branching & (mx > 0) \
                    & sf.gt_const(rm, rk, cfg.branch_diff)
                cut = cand & ((~nloc_any
                               & sf.gt_const(rm, rk, cfg.branch_diff_dist))
                              | sf.gt_const(rm, rk, cfg.branch_diff_cut))
                aw = jnp.where(cut, 2, jnp.where(cand, 1, 0)).astype(jnp.uint8)
                # n_dist_loci (branch.c:82-90): count group members with no
                # earlier local partner (the greedy marks j from every
                # earlier i regardless of i's own group)
                contrib = branching & ~has_earlier
                n_grp = _seg_reduce(jax.ops.segment_sum,
                                    contrib.astype(jnp.int32), g_id, A)
                loci = jnp.zeros((S, 2), jnp.int32)
                head = g_new & (n_in_g >= 2)
                sidh = jnp.clip(v_a >> 1, 0, S - 1)
                orih = (v_a & 1).astype(jnp.int32)
                loci = loci.at[sidh, orih].add(
                    jnp.where(head, n_grp[g_id], 0), mode="drop")
                n1 = jnp.sum((cand & ~cut).astype(jnp.int64))
                n2 = jnp.sum(cut.astype(jnp.int64))
                return aw, loci, n1, n2, ovf

            def reuse_branch(_):
                # convergence skip (the host engine's monotone-state memos,
                # on chip): nc_in certifies the previous round had do_branch
                # and changed NOTHING in (flt, weak, alive) — this round's
                # branch marking would run on a bit-identical arc table and
                # bit-identical rep positions and reproduce the carried
                # arc_weak/loci/counts exactly. At r=0 (no branch round yet)
                # the carries are all zeros, matching the old no_branch arm.
                return aw_c, loci_st, n1_c, n2_c, jnp.asarray(False)

            run_br = do_branch[r] & (~nc_in | no_skip)
            arc_weak, loci, n_flt1, n_flt2, ovf_b = lax.cond(
                run_br, branch_block, reuse_branch, None)
            overflow |= ovf_b
            loci_st = jnp.where(do_branch[r], loci, loci_st)

            # ===== weak propagation onto hits (branch.c:108-145) =====
            # the pairs walked here are built from the SAME flt/shadow
            # state as the previous round's walk_merge, which recorded
            # each pair's arc row — two gathers replace the former
            # multi-million-row per-round sort-join
            def prop_block(weak):
                idx_f, idx_r, tgt_prev, pair_ok = pair_st
                aw32 = arc_weak.astype(jnp.int32)
                wk_f = jnp.where(pair_ok,
                                 aw32[jnp.clip(idx_f, 0, A - 1)], 0)
                wk_r = jnp.where(pair_ok,
                                 aw32[jnp.clip(idx_r, 0, A - 1)], 0)
                rows = jnp.arange(Gl)[:, None]
                # earlier hit gets the forward arc's mark, later the rev's
                weak = weak.at[rows, tgt_prev].max(
                    wk_f.astype(jnp.uint8), mode="drop")
                weak = weak.at[rows, ordcm].max(
                    wk_r.astype(jnp.uint8), mode="drop")
                return weak

            weak = lax.cond(do_branch[r], prop_block, lambda w: w, weak)
            flt = jnp.where((weak == 2) & (flt == 0), 1, flt) \
                .astype(jnp.uint8)

            # ===== annealed high-occurrence filter (graph.c:237-263) =====
            def occ_block(args):
                alive, flt = args
                occ_del = alive & (seg_tot.astype(jnp.int64) > occ_cut[r])
                deg = jnp.zeros(2 * S, jnp.int32).at[
                    jnp.clip(v_a, 0, 2 * S - 1)].add(
                        jnp.where(g_new, n_in_g, 0), mode="drop")
                degd = jnp.zeros(S, bool).at[jnp.clip(v_a >> 1, 0, S - 1)] \
                    .max(g_new & (n_in_g > deg_cut[r]), mode="drop")
                degd &= alive
                locid = alive & (jnp.maximum(loci[:, 0], loci[:, 1])
                                 > loci_cut[r])
                n_occ = jnp.sum(occ_del, dtype=jnp.int64)
                n_deg = jnp.sum(degd & ~occ_del, dtype=jnp.int64)
                n_loci = jnp.sum(locid & ~degd & ~occ_del, dtype=jnp.int64)
                newdel = occ_del | degd | locid
                alive = alive & ~newdel
                # hits of dead genes leave the walk (PG_SET_FILTER(vtx==0))
                sid_h = sid_of[jnp.clip(cols["gid"], 0, ng - 1)]
                dead = (sid_h < 0) | ~alive[jnp.clip(sid_h, 0, S - 1)]
                flt = jnp.where(dead & cols["valid"] & (flt == 0), 1, flt) \
                    .astype(jnp.uint8)
                return alive, flt, n_occ, n_deg, n_loci, newdel, deg

            def no_occ(args):
                alive, flt = args
                return (alive, flt, jnp.int64(0), jnp.int64(0), jnp.int64(0),
                        jnp.zeros(S, bool), jnp.zeros(2 * S, jnp.int32))

            alive, flt, n_occ, n_deg, n_loci, newdel, deg_v = lax.cond(
                do_occ[r], occ_block, no_occ, (alive, flt))

            # ===== convergence detection =====
            # one [2]-vector psum: the reference's n_prop counter plus a
            # global any-change bit over (flt, weak); alive is replicated.
            # weak is untouched after prop and flt after occ, so counting
            # here matches the reference's post-propagation log exactly.
            stat = lax.psum(jnp.stack([
                jnp.sum((weak != 0) & cols["valid"], dtype=jnp.int64),
                (jnp.any(flt != flt_in)
                 | jnp.any(weak != weak_in)).astype(jnp.int64)]), "g")
            n_prop = stat[0]
            ch = (stat[1] > 0) | jnp.any(alive != alive_in)
            # #del replay capture is ALWAYS threaded (a few [S]-sized
            # scatters per round) so verbose and quiet runs share ONE
            # compiled program per shape — halves the compile-cache space
            dcap_mask, dcap_deg, dcap_loci, dcap_tot = dcap
            sidx = jnp.arange(S)
            dcap_mask = dcap_mask.at[r].set(newdel.astype(jnp.uint8))
            dcap_deg = dcap_deg.at[r, :, 0].set(deg_v[sidx * 2])
            dcap_deg = dcap_deg.at[r, :, 1].set(deg_v[sidx * 2 + 1])
            dcap_loci = dcap_loci.at[r].set(loci)
            dcap_tot = dcap_tot.at[r].set(seg_tot)
            dcap = (dcap_mask, dcap_deg, dcap_loci, dcap_tot)

            # ===== arc regeneration (graph.c:87-177) =====
            # Skipped entirely when the round changed nothing: shadow /
            # pid_dom / the arc table are maintained consistent with the
            # current (flt, weak, alive) at every round boundary (round 0
            # always runs; the update functions are idempotent and the walk
            # is a pure function of that state), so unchanged inputs imply
            # bit-identical outputs. do_sweep/do_occ runtime gates exist
            # for profiling attribution only (scripts/tpu_roundprof.py).
            recompute = ch | (r == 0) | no_skip
            run_sw = recompute & do_sweep[r]

            def sweep_block(_):
                # shadow sweep on the (fixed) cs order, over the hoisted
                # geometry planes — only flt/weak-dependent work per round
                marks, b_score, b_other = jax.vmap(
                    lambda f, w, ps, pl: dev.shadow_round_kernel(
                        f, w, ps, pl, cfg.W))(
                    flt != 0, weak.astype(jnp.int32), cols["pscore"],
                    geo_planes)
                nonflt = flt == 0
                evaluated = nonflt & (cols["ev1"] != 0) & cols["valid"]
                shadow_n = jnp.where(evaluated, marks,
                                     (shadow != 0) | marks).astype(jnp.uint8)
                otherc = jnp.clip(b_other, 0, H - 1)
                has_dom = nonflt & (b_score > jnp.uint64(0))
                pid_o = jnp.take_along_axis(cols["pid"], otherc, axis=1)
                pid_n = jnp.where(nonflt, -1, pid_dom)
                pid_n = jnp.where(has_dom, pid_o, pid_n).astype(jnp.int32)
                return shadow_n, pid_n

            shadow, pid_dom = lax.cond(
                run_sw, sweep_block, lambda _: (shadow, pid_dom), None)

            # walk + lean merge (the rounds only consume group structure,
            # the exact s1 average and the seg counters)
            def walk_block(_):
                return walk_merge(flt != 0, shadow != 0, alive, full=False)

            def walk_skip(_):
                return arc_vw, arc_s1, n_out_c, seg_tot, seg_ng, pair_st

            arc_vw, arc_s1, n_out, seg_tot, seg_ng, pair_st = lax.cond(
                recompute & do_walk[r], walk_block, walk_skip, None)
            overflow |= n_out > A
            nc_out = do_branch[r] & ~ch

            logs = logs.at[r].set(jnp.stack([
                n_flt1, n_flt2, n_prop, n_occ, n_deg, n_loci,
                jnp.sum(alive, dtype=jnp.int64), n_out,
                run_br.astype(jnp.int64), run_sw.astype(jnp.int64)]))
            return (flt, weak, shadow, pid_dom, alive, seg_tot, seg_ng,
                    arc_vw, arc_s1, pair_st, loci_st, logs, dcap,
                    arc_weak, n_flt1, n_flt2, n_out, nc_out, overflow)

        dcap0 = (jnp.zeros((cfg.R, S), jnp.uint8),
                 jnp.zeros((cfg.R, S, 2), jnp.int32),
                 jnp.zeros((cfg.R, S, 2), jnp.int32),
                 jnp.zeros((cfg.R, S), jnp.int32))
        pair0 = (jnp.zeros((Gl, H), jnp.int32), jnp.zeros((Gl, H), jnp.int32),
                 jnp.zeros((Gl, H), jnp.int32), jnp.zeros((Gl, H), bool))
        st0 = (cols["flt"], cols["weak_br"], cols["shadow"], cols["pid_dom"],
               jnp.ones(S, bool), seg_tot0, seg_ng0, arc0_vw, arc0_s1, pair0,
               jnp.zeros((S, 2), jnp.int32),
               jnp.zeros((cfg.R, 10), jnp.int64), dcap0,
               jnp.zeros(A, jnp.uint8), jnp.int64(0), jnp.int64(0),
               jnp.int64(0), jnp.asarray(False), jnp.asarray(False))
        st = lax.fori_loop(0, cfg.R, body, st0)
        (flt, weak, shadow, pid_dom, alive, seg_tot, seg_ng, arc_vw, arc_s1,
         _pair_st, loci_st, logs, dcap,
         _aw_c, _n1_c, _n2_c, _n_out_c, _nc, overflow) = st
        # recompute the final arc table WITH its output-only stats from the
        # final state (identical kept pairs -> identical groups); all
        # averages are rounded exactly on device (softfloat)
        (arc_vw, arc_s1, n_out, seg_tot, seg_ng, arc_ng, arc_tot, arc_ad,
         arc_s2) = walk_merge(flt != 0, shadow != 0, alive, full=True)
        return (flt, weak, shadow, pid_dom, alive, seg_tot, seg_ng, arc_vw,
                arc_s1, arc_ng, arc_tot, arc_ad, arc_s2, loci_st,
                logs) + dcap + (overflow,)

    gs1 = P(None, "g")   # blocks are [n_cols, Gp, ...], 'g' on axis 1
    in_specs = (gs1, gs1, gs1, gs1, gs1) + (rep,) * 14
    out_specs = (gs, gs, gs, gs) + (rep,) * 16
    return shard_map(per_shard, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_rep=False)(
        blk_i32, blk_c, blk_ps, blk_u8, blk_ex, seg_gid, sid_of, arc0_vw,
        arc0_s1, seg_tot0, seg_ng0, occ_cut, deg_cut, loci_cut, do_branch,
        do_occ, do_sweep, do_walk, no_skip)


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

# Diagnostics of the most recent graph_gen_device call: engaged flag,
# fallback reason, static shape, and wall-clock stage breakdown (pack /
# upload / device run / pull). tpu_gate and the dryrun assert on this.
LAST: dict = {}


def _fallback(reason: str) -> bool:
    LAST.clear()
    LAST.update(engaged=False, reason=reason)
    return False


def graph_gen_device(opt: PgOpt, q) -> bool:
    """Run phases 2+3 of the schedule on device. Returns True when the
    results were applied (bit-identical to the host rounds); False when a
    precondition or capacity check failed and the caller must run the host
    rounds instead. Assumes phase 1 (gen_vtx + first gen_arc) already ran."""
    import time

    from ..graph.graphdata import ArcTable

    d = q.d
    G = d.n_genome
    if G == 0 or q.n_seg == 0 or q.n_arc == 0:
        return _fallback("empty graph")
    # build the mesh FIRST: the first jax.devices() call initializes the
    # backend client, which on the axon tunnel has measured seconds to
    # MINUTES — it must not contaminate pack_s
    mesh = make_mesh(opt.n_devices)
    t_pack0 = time.monotonic()
    views = _steady_cm_views(d)
    if views is None:
        log_msg("pg_device_loop", "cm/cs sort order not in steady cycle; "
                "falling back to host rounds")
        return _fallback("cm/cs sort order not in steady cycle")
    S = q.n_seg
    ngene = d.n_gene
    B = max(int(2 * S - 1).bit_length(), 2)
    nd = mesh.devices.size
    Gp = ((G + nd - 1) // nd) * nd
    GB = max((Gp - 1).bit_length(), 1)
    if 2 * B + GB > 62:
        return _fallback("2B+GB=%d > 62 (S=%d, Gp=%d)" % (2 * B + GB, S, Gp))
    # Kept-row compaction: phase 1 typically filters ~half the hits, and
    # flt is monotone — an entry-filtered hit never participates in any
    # round block (the reference skips flt rows on BOTH sides of every
    # sweep/walk/rep evaluation: overlap.c:101-156, graph.c:87-177,
    # branch.c:6-29). Packing only flt==0 rows shrinks every [G, H] plane,
    # the sweep band, the exon planes and the per-round merge keys ~2x at
    # bench scales. Dropped rows keep their entry flt/shadow/weak_br/
    # pid_dom on the host — exactly the stale-flag quirks — and are merged
    # back untouched after the pull.
    kept_idx = []
    ex_tot = []
    for g in d.genomes:
        h = g.hits
        n = g.n_hit
        kk = (np.flatnonzero(np.asarray(h.flt)[:n] == 0) if n
              else np.zeros(0, np.int64))
        kept_idx.append(kk)
        ex_tot.append(int(np.asarray(h.n_exon)[kk].sum()) if len(kk) else 0)
    H = max(((max((len(k) for k in kept_idx), default=1) + 511) // 512)
            * 512, 512)
    E = dev.next_pow2(max(max(ex_tot, default=1), 1))
    K = dev.next_pow2(
        max((int(np.asarray(g.hits.n_exon)[k].max(initial=1))
             for g, k in zip(d.genomes, kept_idx) if len(k)), default=1),
        lo=2)
    W = 1
    for g, k in zip(d.genomes, kept_idx):
        if len(k):
            W = max(W, dev.band_width(np.asarray(g.hits.cid)[k],
                                      np.asarray(g.hits.cs)[k],
                                      np.asarray(g.hits.ce)[k]))
    W = min(dev.next_pow2(W, lo=2), H)
    # 25% headroom over the phase-1 arc count, bucketed to 4096 for
    # compile-cache reuse; overflow falls back to the host rounds.
    # PANGENE_DEVLOOP_MAX_A caps device memory on huge graphs (and lets
    # tests exercise the overflow fallback).
    import os as _os
    A = ((q.n_arc + q.n_arc // 4 + 4095) // 4096 + 1) * 4096
    A = min(max(A, 4096), Gp * 2 * H)
    max_a = int(_os.environ.get("PANGENE_DEVLOOP_MAX_A", "0"))
    if max_a > 0:
        A = min(A, max_a)
    if q.n_arc > A:
        log_msg("pg_device_loop", "arc capacity %d below phase-1 count %d; "
                "falling back to host rounds", A, q.n_arc)
        return _fallback("arc capacity %d < phase-1 count %d" % (A, q.n_arc))
    D = 64
    T = opt.n_branch_flt
    R = T + 1

    # pack straight into the final [n_col, Gp, H] transfer blocks — no
    # intermediate per-column dicts, no post-hoc np.stack/astype/concat
    # copies (pack_s was 71 s at the 3.9M-record north star, VERDICT r3 #4)
    from ..ops.device_engine import hash_u32_np
    from ..ops.overlap import cds_len_all
    cmax = 0
    for g, kk in zip(d.genomes, kept_idx):
        if len(kk):
            h = g.hits
            cmax = max(cmax, int(np.asarray(h.ce)[kk].max(initial=0)),
                       int(np.asarray(h.cm)[kk].max(initial=0)),
                       int(np.asarray(h.cs)[kk].max(initial=0)))
    coord32 = cmax < 2**31
    cdt = np.int32 if coord32 else np.int64
    I32 = {n: i for i, n in enumerate(PACK_I32)}
    U8 = {n: i for i, n in enumerate(PACK_U8)}
    blk_i32 = np.zeros((len(PACK_I32), Gp, H), np.int32)
    blk_i32[I32["cid"]].fill(dev.PAD_CID)
    blk_i32[I32["dom_gid"]].fill(-1)
    blk_i32[I32["pid_dom"]].fill(-1)
    blk_i32[I32["cds_len"]].fill(1)
    blk_i32[I32["ordcm"]] = np.arange(H, dtype=np.int32)
    blk_c = np.zeros((len(PACK_C), Gp, H), cdt)
    blk_c[1].fill(-1)                       # ce pad, as build_stacked
    blk_ps = np.zeros((1, Gp, H), np.uint64)
    blk_u8 = np.zeros((len(PACK_U8), Gp, H), np.uint8)
    blk_ex = np.zeros((2, Gp, E), np.int32)
    prot_gid = np.asarray(d.prot_gid, np.int32)
    pref = np.asarray(d.gene_preferred, np.uint8)
    # stale-quirk constant: the reference's per-round n_prop counts ALL
    # hits with weak_br != 0; entry-filtered rows are not uploaded, so
    # their (constant) contribution is added back to the pulled logs
    n_prop_stale = 0
    for j, g in enumerate(d.genomes):
        h = g.hits
        n = g.n_hit
        kk = kept_idx[j]
        nk = len(kk)
        if n:
            n_prop_stale += int(((np.asarray(h.flt)[:n] != 0)
                                 & (np.asarray(h.weak_br)[:n] != 0)).sum())
        if nk == 0:
            continue
        tk = lambda a: np.asarray(a)[kk]
        pid_k = tk(h.pid)
        gid = prot_gid[pid_k]
        pid_dom0_k = tk(h.pid_dom0)
        blk_i32[I32["cid"], j, :nk] = tk(h.cid)
        blk_i32[I32["rank"], j, :nk] = tk(h.rank)
        blk_i32[I32["gid"], j, :nk] = gid
        blk_i32[I32["dom_gid"], j, :nk] = np.where(
            pid_dom0_k >= 0, prot_gid[np.clip(pid_dom0_k, 0, None)], -1)
        blk_i32[I32["score_ori"], j, :nk] = tk(h.score_ori)
        blk_i32[I32["score_dom"], j, :nk] = tk(h.score_dom)
        blk_i32[I32["cds_len"], j, :nk] = np.asarray(cds_len_all(g))[kk]
        blk_i32[I32["pid"], j, :nk] = pid_k
        blk_i32[I32["pid_dom"], j, :nk] = tk(h.pid_dom)
        # cm-order view of the kept subset: relative order is preserved
        # under subsetting, so filtering + renumbering the full stable
        # perm IS the stable perm of the subset
        vk = views[j]
        keptmask = np.zeros(n, bool)
        keptmask[kk] = True
        renum = np.cumsum(keptmask) - 1
        blk_i32[I32["ordcm"], j, :nk] = renum[vk[keptmask[vk]]]
        blk_c[0, j, :nk] = tk(h.cs)
        blk_c[1, j, :nk] = tk(h.ce)
        blk_c[2, j, :nk] = tk(h.cm)
        blk_ps[0, j, :nk] = (
            (tk(h.score_adj).astype(np.int64).astype(np.uint64)
             << np.uint64(33))
            | (pref[gid].astype(np.uint64) << np.uint64(32))
            | hash_u32_np(pid_k).astype(np.uint64))
        # flt is 0 for every kept row by construction (plane stays zero)
        blk_u8[U8["shadow"], j, :nk] = tk(h.shadow)
        blk_u8[U8["weak_br"], j, :nk] = tk(h.weak_br)
        blk_u8[U8["valid"], j, :nk] = 1
        blk_u8[U8["rev"], j, :nk] = tk(h.rev)
        blk_u8[U8["ev1"], j, :nk] = kk >= 1
        # exon ranges of kept hits, compacted with rewritten offsets
        cnt = tk(h.n_exon)
        off = tk(h.off_exon).astype(np.int64)
        new_off = np.zeros(nk, np.int64)
        new_off[1:] = np.cumsum(cnt[:-1], dtype=np.int64)
        tot = ex_tot[j]
        pos = (np.arange(tot, dtype=np.int64)
               - np.repeat(new_off, cnt) + np.repeat(off, cnt))
        blk_i32[I32["n_exon"], j, :nk] = cnt
        blk_i32[I32["off_exon"], j, :nk] = new_off.astype(np.int32)
        blk_ex[0, j, :tot] = np.asarray(g.exon_os)[pos]
        blk_ex[1, j, :tot] = np.asarray(g.exon_oe)[pos]

    # arc init from phase 1 (packed to B-bit vertices)
    a = q.arcs
    v0 = (a.x >> np.uint64(32)).astype(np.int64)
    w0 = (a.x & np.uint64(0xFFFFFFFF)).astype(np.int64)
    arc0_vw = np.full(A, SENT_I, np.int64)
    arc0_vw[:len(a)] = (v0 << B) | w0
    arc0_s1 = np.zeros(A, np.int32)
    arc0_s1[:len(a)] = a.s1

    # per-round thresholds (host IEEE doubles, exact)
    occ_cut = np.zeros(R, np.int64)
    deg_cut = np.zeros(R, np.int32)
    loci_cut = np.zeros(R, np.int32)
    do_branch = np.zeros(R, bool)
    do_occ = np.zeros(R, bool)
    occ_cut[0] = opt.max_avg_occ * 2 * G
    deg_cut[0] = opt.max_degree * 2
    loci_cut[0] = opt.max_dist_loci
    do_occ[0] = True
    for i in range(T):
        rr = 1.0 + (T - 1 - i) / T
        r_ = i + 1
        do_branch[r_] = True
        if i > 0:
            do_occ[r_] = True
            occ_cut[r_] = int(opt.max_avg_occ * rr + 0.499) * G
            deg_cut[r_] = int(opt.max_degree * rr + 0.499)
            loci_cut[r_] = int(opt.max_dist_loci * rr + 0.499)

    # profiling aid (scripts/tpu_roundprof.py): selectively disable round
    # blocks to attribute device time — INPUT values only, so the same
    # compiled program runs and no reference exactness is claimed
    import os as _os2
    do_sweep = np.ones(R, bool)
    do_walk = np.ones(R, bool)
    disable = _os2.environ.get("PANGENE_DEVLOOP_DISABLE", "")
    if "branch" in disable:
        do_branch[:] = False
    if "occ" in disable:
        do_occ[:] = False
    if "sweep" in disable:
        do_sweep[:] = False
    if "walk" in disable:
        do_walk[:] = False
    # "conv": defeat convergence skipping (every round recomputes branch +
    # sweep + walk) — quantifies the skip win with the same program
    no_skip = np.asarray("conv" in disable)

    # coord32: clamping local_dist at INT32_MAX is exact (every |cm gap|
    # fits int32, so a clamped threshold admits the same pairs)
    ld = int(opt.local_dist)
    if coord32:
        ld = min(ld, 2**31 - 1)
    lc = min(int(opt.local_count), 2**31 - 1)
    JB = max((Gp * 2 * H - 1).bit_length(), 1)
    if 2 * B + GB + JB > 62 or _os.environ.get("PANGENE_DEVLOOP_NO_JB"):
        JB = 0          # lean merge falls back to co-sorted payloads
    # bucket-exchange merge capacity (nd > 1 only; 0 disables): per-
    # (src,dst) all_to_all chunk holds up to slack * NL/nd keys, padded
    # to the lane width. Worst case a shard sends ALL its keys to one
    # dest; that sets the overflow flag -> exact host fallback.
    # engaged at nd > 2: at nd == 2 the exchange sorts ~slack*N/2 received
    # + N/2 local keys per shard vs the replicated form's N lean keys —
    # measured net-negative on the CPU mesh (19.3 s vs 16.2 s); from 4
    # shards on, per-shard sort work drops ~nd/(1+slack)x.
    a2a_cap = 0
    if nd > 2 and JB and _os.environ.get(
            "PANGENE_DEVLOOP_SHARD_MERGE", "1") != "0":
        NL = (Gp // nd) * 2 * H
        slack = float(_os.environ.get("PANGENE_DEVLOOP_A2A_SLACK", "1.5"))
        a2a_cap = min(((int(NL * slack) // nd + 127) // 128) * 128, NL)
    # columnsort for the lean merge sorts: "1" forces on, "0" (current
    # default) off, "auto" enables on TPU backends only. Default stays
    # off until the chip A/B (TPU_MICROBENCH sort_rows* vs sort_lean_1d
    # + an end-to-end big-corpus trial) lands; flipping it recompiles
    # every device-loop shape.
    cs_env = _os.environ.get("PANGENE_DEVLOOP_COLSORT", "0")
    use_cs = cs_env == "1" or (
        cs_env == "auto"
        and jax.default_backend() not in ("cpu",))
    colsort = colsort_loc = 0
    if use_cs and JB:
        colsort = dev.colsort_cols(Gp * 2 * H)
        if a2a_cap:
            colsort_loc = dev.colsort_cols((Gp // nd) * 2 * H)
    cfg = Cfg(H=H, K=K, W=W, S=S, A=A, D=D, B=B, GB=GB, JB=JB,
              n_gene=ngene, R=R,
              G_loc=Gp // nd, coord32=coord32,
              check_strand=bool(opt.check_strand),
              use_ori=bool(opt.use_ori_for_branch),
              frag_mode=bool(opt.frag_mode),
              min_ov_ratio=float(opt.min_ov_ratio),
              branch_diff=float(opt.branch_diff),
              branch_diff_dist=float(opt.branch_diff_dist),
              branch_diff_cut=float(opt.branch_diff_cut),
              local_dist=ld,
              local_count=lc,
              a2a_cap=a2a_cap,
              colsort=colsort,
              colsort_loc=colsort_loc)

    from .mesh import parallel_transfer_threads, pull_global, put_sharded
    t_up0 = time.monotonic()
    blocks = (blk_i32, blk_c, blk_ps.view(np.int64), blk_u8, blk_ex)
    nt = parallel_transfer_threads()
    if nt > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(nt) as ex:
            dev_blks = list(ex.map(lambda b: put_sharded(b, mesh, 1),
                                   blocks))
    else:
        dev_blks = [put_sharded(b, mesh, 1) for b in blocks]
    for b in dev_blks:
        b.block_until_ready()   # note: a no-op on the axon tunnel —
        # deferred transfer time is then charged to run_s instead
    t_run0 = time.monotonic()
    outs = _schedule(
        *dev_blks,
        q.seg_gid,
        q.g2s, arc0_vw, arc0_s1,
        q.seg_tot_cnt.astype(np.int32),
        q.seg_n_genome.astype(np.int32),
        occ_cut, deg_cut, loci_cut,
        do_branch, do_occ, do_sweep, do_walk, no_skip,
        cfg=cfg, mesh=mesh)
    # a 1-element pull forces execution completion even on the axon
    # backend (where block_until_ready does not actually block)
    overflow_flag = bool(np.asarray(outs[-1]))
    t_pull0 = time.monotonic()
    # first four outputs are genome-sharded; the rest replicated. The
    # #del capture planes (outs[15:19], O(R*S) — ~3.4 MB at big shapes)
    # are part of every program (single variant per shape) but only
    # PULLED when the verbosity will actually replay them.
    from .. import util
    pull_dcap = util.verbose >= 3
    pulls = [(pull_global, o) for o in outs[:4]] \
        + [(np.asarray, o) for o in outs[4:15]] \
        + ([(np.asarray, o) for o in outs[15:19]] if pull_dcap
           else [(lambda o: np.zeros((0,) + o.shape[1:], o.dtype), o)
                 for o in outs[15:19]]) \
        + [(np.asarray, outs[19])]
    if nt > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(nt) as ex:
            host = list(ex.map(lambda fo: fo[0](fo[1]), pulls))
    else:
        host = [f(o) for f, o in pulls]
    t_pull1 = time.monotonic()
    (flt, weak, shadow, pid_dom, alive, seg_tot, seg_ng, arc_vw, arc_s1,
     arc_ng, arc_tot, arc_ad, arc_s2, loci_fin, logs,
     dmask, ddeg, dloci, dtot, overflow) = host
    LAST.clear()
    LAST.update(
        engaged=not overflow_flag,
        shape=dict(G=G, Gp=Gp, H=H, E=E, K=K, W=W, S=S, A=A, D=D, R=R,
                   n_devices=nd),
        coord32=coord32,
        shard_merge=bool(a2a_cap),
        kept_frac=round(sum(len(k) for k in kept_idx)
                        / max(1, sum(g.n_hit for g in d.genomes)), 3),
        upload_bytes=int(sum(b.nbytes for b in (blk_i32, blk_c, blk_ps,
                                                blk_u8, blk_ex))),
        pack_s=round(t_up0 - t_pack0, 3),
        upload_s=round(t_run0 - t_up0, 3),
        run_s=round(t_pull0 - t_run0, 3),
        pull_s=round(t_pull1 - t_pull0, 3),
        # convergence skipping (logs cols 8/9 = ran_branch / ran_sweepwalk)
        rounds_branch_run=int(logs[:, 8].sum()),
        rounds_sweep_run=int(logs[:, 9].sum()),
        rounds_total=R)
    if overflow_flag:
        LAST["reason"] = "capacity overflow (arcs or branch window)"
        log_msg("pg_device_loop", "capacity overflow (arcs or branch "
                "window); falling back to host rounds")
        return False

    logs = np.array(logs)
    logs[:, 2] += n_prop_stale
    _emit_round_logs(q, logs, dmask, ddeg, dloci, dtot, R)

    # apply hit state: scatter pulled values to the kept rows; dropped
    # (entry-filtered) rows keep their entry values — the stale shadow /
    # pid_dom quirks, identical to what the host rounds leave behind
    for j, g in enumerate(d.genomes):
        h = g.hits
        kk = kept_idx[j]
        nk = len(kk)
        if nk == 0:
            continue
        for name, plane, dt in (("flt", flt, np.uint8),
                                ("weak_br", weak, np.uint8),
                                ("shadow", shadow, np.uint8),
                                ("pid_dom", pid_dom, np.int32)):
            base = np.asarray(getattr(h, name)).astype(dt, copy=True)
            base[kk] = plane[j, :nk].astype(dt)
            h.set(name, base)
    # segment compaction (the reference hard-deleted each round; ids are
    # order-preserving so one final compaction is identical)
    keep = alive.astype(bool)
    q.seg_gid = q.seg_gid[keep]
    q.seg_n_dom = q.seg_n_dom[keep]
    q.seg_n_sub = q.seg_n_sub[keep]
    q.seg_n_genome = seg_ng[keep].astype(np.int32)
    q.seg_tot_cnt = seg_tot[keep].astype(np.int32)
    q.seg_n_dist_loci = loci_fin[keep].astype(np.int32)
    q.seg_del = np.zeros(int(keep.sum()), np.uint8)
    q.gen_g2s()
    q.flag_vtx()
    # rebuild the arc table with original->compacted id remap
    na = int((arc_vw != SENT_I).sum())
    vw = arc_vw[:na]
    remap = np.cumsum(keep) - 1
    v = vw >> B
    w = vw & ((1 << B) - 1)
    newv = (remap[(v >> 1)] << 1) | (v & 1)
    neww = (remap[(w >> 1)] << 1) | (w & 1)
    out = ArcTable.empty(na)
    out.x = (newv.astype(np.uint64) << np.uint64(32)) | neww.astype(np.uint64)
    out.n_genome = arc_ng[:na].astype(np.int32)
    out.tot_cnt = arc_tot[:na].astype(np.int32)
    # averages already rounded exactly on device (softfloat +.499)
    out.avg_dist = arc_ad[:na].astype(np.int32)
    out.s1 = arc_s1[:na].astype(np.int32)
    out.s2 = arc_s2[:na].astype(np.int32)
    q.arcs = out
    return True


def _emit_round_logs(q, logs, dmask, ddeg, dloci, dtot, R) -> None:
    """Replay the reference's per-round stderr messages from the pulled
    counters (content-exact; timestamps are emission-time)."""
    import sys
    from .. import util
    d = q.d
    for r in range(R):
        n1, n2, nprop, nocc, ndeg, nloci, nseg, narc = (
            int(x) for x in logs[r][:8])
        if r >= 1:
            log_msg("pg_mark_branch_flt_arc",
                    "marked %d locally diverged branches and %d distantly "
                    "diverged branches", n1, n2)
            log_msg("pg_mark_branch_flt_hit", "marked %d diverged hits",
                    nprop)
        if r == 0 or r >= 2:
            log_msg("pg_flt_high_occ",
                    "filtered %d high-occurrence segments, %d high-degree "
                    "segments and %d segments connecting distant loci",
                    nocc, ndeg, nloci)
            if util.verbose >= 3 and dmask.shape[0] == R:
                for i in np.flatnonzero(dmask[r]):
                    s_occ = dtot[r, i] / d.n_genome
                    if r >= 2:
                        sys.stderr.write(
                            "#del\t%s\tavg_occ=%.1f\tdeg=%d,%d\t"
                            "dist_deg=%d,%d\n" % (
                                d.gene_name[q.seg_gid[i]], s_occ,
                                ddeg[r, i, 0], ddeg[r, i, 1],
                                dloci[r, i, 0], dloci[r, i, 1]))
                    else:
                        sys.stderr.write(
                            "#del\t%s\tavg_occ=%.1f\tdeg=*,*\t"
                            "dist_deg=%d,%d\n" % (
                                d.gene_name[q.seg_gid[i]], s_occ,
                                dloci[r, i, 0], dloci[r, i, 1]))
        if r == 0:
            log_msg("pg_graph_gen", "round-2 graph: %d genes and %d arcs",
                    nseg, narc)
