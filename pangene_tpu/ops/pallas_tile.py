"""Tile-pair Pallas TPU kernel for the shadow sweep (v2).

The v1 kernel (ops/pallas_sweep.py) walks delta = 1..W with a rolling
frame; each delta rolls every resident column block by one lane, so VMEM
traffic scales with W times the full column set — measured ~3x slower than
the XLA scan. This kernel restructures the sweep as LANE-TILE PAIRS:

  * grid (dt, p): program compares i-tile p (128 hits) against j-tile
    t = max(p - dt, 0); all 128x128 hit pairs of the tile pair are
    evaluated as dense (128, 128) vector ops — no rolls, and Mosaic's
    128-aligned dynamic-offset restriction is satisfied by construction
    because lane tiles ARE the alignment unit.
  * every column is staged in BOTH layouts (lane-major [NC, H] and
    transposed [H, NC]) so either side of a pair can sit on lanes or on
    sublanes without in-kernel transposes. The pair grid is evaluated
    twice per program — once with i on lanes (loser=i candidates), once
    with j on lanes (loser=j) — so the candidate reduction is always over
    the sublane axis and lands as natural (1, 128) rows.
  * outputs are per-dt candidate planes [DT+1, 8, H]: each block is
    written by exactly one (dt, p) program (dt-major grid order; clamped
    duplicate programs recompute a valid pair and overwrite with
    identical content), so no output block is ever revisited
    non-consecutively. The host merges the <= 2*(DT+1) candidates per hit
    with the scalar oracle's (hi, lo, min-other) lexicographic rule.

Exactness carries over from v1: int32 coordinates (caller checks
positions < 2^31), (hi, lo) packed-score compares, and the dyadic-ratio
integer form of the cov_short predicate (pallas_sweep.dyadic_ratio).
Bit-equal to ops/sweep.py on the fuzz corpus (tests/test_pallas_tile.py).

MEASURED OUTCOME (TPU v5 lite, 2026-08): the tile-pair formulation LOSES
to the v1 rolling-frame kernel — H=16k: ~200 vs 70 ms at W=512, ~480 vs
84 ms at W=2048 (v1 raises its block size with W, amortizing the rolls,
and pltpu.roll is cheap in VMEM on this generation; the tile grid pays
for the full 128x128 rectangle twice while only the band near the
diagonal can pass the window predicate). A per-tile-pair viability
pre-test (summary rows + @pl.when) skips dead pairs for free, but the
dense fuzz corpus keeps every same-contig pair alive, so it does not
close the gap there. v1 stays the production Pallas kernel; this module
is the documented, tested alternative for hardware where roll bandwidth,
not redundant compute, binds — and for sparse multi-contig bands where
the viability skip prunes most of the grid.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_sweep import dyadic_ratio  # noqa: F401  (shared helper)

I32_MIN = np.int32(-2**31)
I32_MAX = np.int32(2**31 - 1)
TL = 128

# column order inside the stacked planes; rows 11-14 carry per-tile
# summary scalars (broadcast across the tile's lanes) for the viability
# pre-test
CS, CE, CID, FLT, REV, RANK, GID, SHI, SLO, WEAK, CLEN = range(11)
SMIN_CS, SMAX_CE, SCID_LO, SCID_HI = 11, 12, 13, 14
NC = 16  # padded to a sublane-tile multiple
COL_ORDER = ("cs", "ce", "cid", "flt", "rev", "rank", "gid", "shi", "slo",
             "weak", "clen")
FILLS = {"cs": 0, "ce": -1, "cid": -7, "flt": 1, "rev": 0, "rank": 0,
         "gid": -1, "shi": 0, "slo": int(I32_MIN), "weak": 0, "clen": 1}


def _tile_candidates(lane, subl, lane_eos, lane_eoe, subl_eos, subl_eoe,
                     lane_idx, subl_idx, *, lane_is_late: bool, K: int,
                     check_strand: bool, cov_p: int, cov_k: int):
    """Candidates for lane-side losers of one 128x128 tile pair.

    lane: (NC, 128) column rows; subl: (128, NC) column columns;
    lane_e*: (K, 128); subl_e*: (128, K). Returns five (1, 128) planes:
    mark + best (hi, lo, other, ov), winner keys from the sublane side."""
    def L(c):
        return lane[c:c + 1, :]          # (1, 128)

    def S(c):
        return subl[:, c:c + 1]          # (128, 1)

    if lane_is_late:
        order_ok = subl_idx < lane_idx   # early (subl) precedes late (lane)
        win = S(CE) > L(CS)              # ce_early > cs_late
        hi_l, lo_l, rk_l, wk_l = L(SHI), L(SLO), L(RANK), L(WEAK)
        hi_e, lo_e, rk_e, wk_e = S(SHI), S(SLO), S(RANK), S(WEAK)
    else:
        order_ok = lane_idx < subl_idx
        win = L(CE) > S(CS)
        hi_l, lo_l, rk_l, wk_l = S(SHI), S(SLO), S(RANK), S(WEAK)
        hi_e, lo_e, rk_e, wk_e = L(SHI), L(SLO), L(RANK), L(WEAK)

    mask = order_ok & win & (L(FLT) == 0) & (S(FLT) == 0) \
        & (L(CID) == S(CID))
    if check_strand:
        mask &= L(REV) == S(REV)

    ov = jnp.zeros((TL, TL), jnp.int32)
    for a in range(K):
        ios = lane_eos[a:a + 1, :]       # (1, 128)
        ioe = lane_eoe[a:a + 1, :]
        for b in range(K):
            jos = subl_eos[:, b:b + 1]   # (128, 1)
            joe = subl_eoe[:, b:b + 1]
            ov = ov + jnp.maximum(
                jnp.minimum(ioe, joe) - jnp.maximum(ios, jos), 0)
    mask &= ov > 0

    same_gene = L(GID) == S(GID)
    m_short = jnp.minimum(L(CLEN), S(CLEN))
    cov_ok = (ov << cov_k) >= m_short * jnp.int32(cov_p)
    mask &= same_gene | cov_ok

    late_loses_by_score = (hi_l < hi_e) \
        | ((hi_l == hi_e) & (lo_l < lo_e)) \
        | ((hi_l == hi_e) & (lo_l == lo_e) & (rk_l > rk_e))
    by_score = same_gene | (wk_l == wk_e)
    late_loses = (by_score & late_loses_by_score) \
        | (~by_score & (wk_l > wk_e))
    lane_loses = late_loses if lane_is_late else ~late_loses
    maskC = mask & lane_loses

    hi_w = jnp.broadcast_to(S(SHI), (TL, TL))
    lo_w = jnp.broadcast_to(S(SLO), (TL, TL))
    ot_w = jnp.broadcast_to(subl_idx, (TL, TL))
    best_hi = jnp.max(jnp.where(maskC, hi_w, I32_MIN), axis=0,
                      keepdims=True)
    m2 = maskC & (hi_w == best_hi)
    best_lo = jnp.max(jnp.where(m2, lo_w, I32_MIN), axis=0, keepdims=True)
    m3 = m2 & (lo_w == best_lo)
    best_ot = jnp.min(jnp.where(m3, ot_w, I32_MAX), axis=0, keepdims=True)
    m4 = m3 & (ot_w == best_ot)
    best_ov = jnp.max(jnp.where(m4, ov, 0), axis=0, keepdims=True)
    mark = jnp.max(jnp.where(maskC, 1, 0), axis=0, keepdims=True)
    return mark, best_hi, best_lo, best_ot, best_ov


def _kernel(iN, jT, jN, iT, eNos_i, eNoe_i, eTos_j, eToe_j,
            eNos_j, eNoe_j, eTos_i, eToe_i, outA, outB,
            *, K: int, check_strand: bool, cov_p: int, cov_k: int):
    dt = pl.program_id(0)
    p = pl.program_id(1)
    t = jnp.maximum(p - dt, 0)
    zero = jnp.zeros((1, TL), jnp.int32)
    for r in range(8):
        outA[0, r:r + 1, :] = zero
        outB[0, r:r + 1, :] = zero

    # tile-pair viability from per-tile summaries carried in the spare
    # column-plane rows (SMIN_CS/SMAX_CE/SCID_LO/SCID_HI, broadcast across
    # each tile's lanes): the pair can only produce overlaps when the cid
    # ranges intersect and j's furthest end exceeds i's earliest start —
    # with real bands most dt > 0 programs die here and skip the K^2 work
    min_cs_i = iN[SMIN_CS, 0]
    cid_lo_i, cid_hi_i = iN[SCID_LO, 0], iN[SCID_HI, 0]
    max_ce_j = jN[SMAX_CE, 0]
    cid_lo_j, cid_hi_j = jN[SCID_LO, 0], jN[SCID_HI, 0]
    alive = (max_ce_j > min_cs_i) & (cid_hi_j >= cid_lo_i) \
        & (cid_hi_i >= cid_lo_j)

    @pl.when(alive)
    def _():
        i_lane = p * TL + jax.lax.broadcasted_iota(jnp.int32, (1, TL), 1)
        j_subl = t * TL + jax.lax.broadcasted_iota(jnp.int32, (TL, 1), 0)
        j_lane = t * TL + jax.lax.broadcasted_iota(jnp.int32, (1, TL), 1)
        i_subl = p * TL + jax.lax.broadcasted_iota(jnp.int32, (TL, 1), 0)
        # i on lanes: collect loser = i candidates
        outs = _tile_candidates(
            iN[...], jT[...], eNos_i[...], eNoe_i[...], eTos_j[...],
            eToe_j[...], i_lane, j_subl, lane_is_late=True, K=K,
            check_strand=check_strand, cov_p=cov_p, cov_k=cov_k)
        for r, v in enumerate(outs):
            outA[0, r:r + 1, :] = v
        # j on lanes: collect loser = j candidates
        outs = _tile_candidates(
            jN[...], iT[...], eNos_j[...], eNoe_j[...], eTos_i[...],
            eToe_i[...], j_lane, i_subl, lane_is_late=False, K=K,
            check_strand=check_strand, cov_p=cov_p, cov_k=cov_k)
        for r, v in enumerate(outs):
            outB[0, r:r + 1, :] = v


@functools.partial(jax.jit, static_argnames=(
    "T", "DT1", "K", "Kp", "Hp", "check_strand", "cov_p", "cov_k",
    "interpret"))
def _run(colsN, colsT, eNos, eNoe, eTos, eToe, *, T, DT1, K, Kp, Hp,
         check_strand, cov_p, cov_k, interpret):
    lane_cols = pl.BlockSpec((NC, TL), lambda dt, p: (0, p))
    lane_cols_j = pl.BlockSpec(
        (NC, TL), lambda dt, p: (0, jnp.maximum(p - dt, 0)))
    subl_cols_j = pl.BlockSpec(
        (TL, NC), lambda dt, p: (jnp.maximum(p - dt, 0), 0))
    subl_cols_i = pl.BlockSpec((TL, NC), lambda dt, p: (p, 0))
    lane_e_i = pl.BlockSpec((Kp, TL), lambda dt, p: (0, p))
    lane_e_j = pl.BlockSpec(
        (Kp, TL), lambda dt, p: (0, jnp.maximum(p - dt, 0)))
    subl_e_j = pl.BlockSpec(
        (TL, Kp), lambda dt, p: (jnp.maximum(p - dt, 0), 0))
    subl_e_i = pl.BlockSpec((TL, Kp), lambda dt, p: (p, 0))
    out_spec_A = pl.BlockSpec((1, 8, TL), lambda dt, p: (dt, 0, p))
    out_spec_B = pl.BlockSpec(
        (1, 8, TL), lambda dt, p: (dt, 0, jnp.maximum(p - dt, 0)))
    fn = functools.partial(_kernel, K=K, check_strand=check_strand,
                           cov_p=cov_p, cov_k=cov_k)
    return pl.pallas_call(
        fn,
        grid=(DT1, T),
        in_specs=[lane_cols, subl_cols_j, lane_cols_j, subl_cols_i,
                  lane_e_i, lane_e_i, subl_e_j, subl_e_j,
                  lane_e_j, lane_e_j, subl_e_i, subl_e_i],
        out_specs=[out_spec_A, out_spec_B],
        out_shape=[jax.ShapeDtypeStruct((DT1, 8, Hp), jnp.int32),
                   jax.ShapeDtypeStruct((DT1, 8, Hp), jnp.int32)],
        interpret=interpret,
    )(colsN, colsT, colsN, colsT, eNos, eNoe, eTos, eToe,
      eNos, eNoe, eTos, eToe)


def shadow_pallas_tile(cols_np: dict, K: int, W: int, H: int,
                       check_strand: bool, cov_p: int, cov_k: int,
                       interpret: bool = False):
    """Host wrapper. Returns (marks, has_dom, best_other, best_ov) of
    length H, same contract as pallas_sweep.shadow_pallas_genome."""
    T = max(-(-H // TL), 1)
    Hp = T * TL
    DT1 = min(-(-max(W, 1) // TL) + 1, T)
    Kp = max(-(-K // 8) * 8, 8)

    colsN = np.empty((NC, Hp), np.int32)
    for c, name in enumerate(COL_ORDER):
        colsN[c, :H] = cols_np[name]
        colsN[c, H:] = FILLS[name]
    colsN[len(COL_ORDER):] = 0

    eNos = np.zeros((Kp, Hp), np.int32)
    eNoe = np.zeros((Kp, Hp), np.int32)
    eNos[:K, :H] = cols_np["eos"].T
    eNoe[:K, :H] = cols_np["eoe"].T
    eTos = np.ascontiguousarray(eNos.T)
    eToe = np.ascontiguousarray(eNoe.T)

    # per-tile summaries over REAL rows, broadcast across each tile's
    # lanes in the spare plane rows; fully-padded tiles get impossible
    # bounds (max_ce = INT32_MIN) so their programs skip
    cs = cols_np["cs"]
    ce = cols_np["ce"]
    cid = cols_np["cid"]
    for tt in range(T):
        lo, hi = tt * TL, min((tt + 1) * TL, H)
        sl = slice(tt * TL, (tt + 1) * TL)
        if lo >= H:
            vals = (I32_MAX, I32_MIN, 1, 0)
        else:
            vals = (cs[lo:hi].min(), ce[lo:hi].max(),
                    cid[lo:hi].min(), cid[lo:hi].max())
        for row, v in zip((SMIN_CS, SMAX_CE, SCID_LO, SCID_HI), vals):
            colsN[row, sl] = v
    colsT = np.ascontiguousarray(colsN.T)

    with jax.enable_x64(False):
        outA, outB = _run(jnp.asarray(colsN), jnp.asarray(colsT),
                          jnp.asarray(eNos), jnp.asarray(eNoe),
                          jnp.asarray(eTos), jnp.asarray(eToe),
                          T=T, DT1=DT1, K=K, Kp=Kp, Hp=Hp,
                          check_strand=check_strand, cov_p=cov_p,
                          cov_k=cov_k, interpret=interpret)
    outA = np.asarray(outA)
    outB = np.asarray(outB)

    g_m = np.zeros(H, np.int64)
    g_hi = np.zeros(H, np.int64)
    g_lo = np.full(H, np.int64(I32_MIN), np.int64)
    g_ot = np.full(H, np.int64(I32_MAX), np.int64)
    g_ov = np.zeros(H, np.int64)

    for plane, is_b in ((outA, False), (outB, True)):
        for dt in range(DT1):
            # outB plane dt only writes j-tile blocks 0..T-1-dt (the
            # clamped programs overwrite lower blocks); lanes beyond that
            # are uninitialized output memory and must be ignored
            lim = min((T - dt) * TL, H) if is_b else H
            if lim <= 0:
                continue
            m = plane[dt, 0, :lim] > 0
            hi = plane[dt, 1, :lim].astype(np.int64)
            lo = plane[dt, 2, :lim].astype(np.int64)
            ot = plane[dt, 3, :lim].astype(np.int64)
            ov = plane[dt, 4, :lim].astype(np.int64)
            gh = g_hi[:lim]
            gl = g_lo[:lim]
            go = g_ot[:lim]
            better = m & ((hi > gh)
                          | ((hi == gh) & (lo > gl))
                          | ((hi == gh) & (lo == gl) & (ot < go)))
            g_m[:lim] |= m
            g_hi[:lim] = np.where(better, hi, gh)
            g_lo[:lim] = np.where(better, lo, gl)
            g_ot[:lim] = np.where(better, ot, go)
            g_ov[:lim] = np.where(better, ov, g_ov[:lim])

    marks = g_m > 0
    # "dominator only when winner packed score > 0": the packed u64 score
    # is 0 iff hi == 0 and lo == SIGN (hash 0 sign-flipped) — the same
    # values as the no-candidate initializers, matching the oracle's
    # tmp_score > 0 gate (same contract as pallas_sweep)
    has = (g_hi != 0) | (g_lo != np.int64(I32_MIN))
    return marks, has, g_ot, g_ov
