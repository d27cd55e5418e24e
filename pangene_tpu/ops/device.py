"""Device (JAX/XLA) kernels for the overlap sweeps — the hot loops.

Design (see ops/sweep.py for the proof): the reference pair set over
cs-sorted hits is {(j, i) : j < i, cid_j == cid_i, ce_j > cs_i}; the maximum
band width W = max_i (i - first qualifying j) is computed exactly with a
segmented prefix-max + searchsorted. The kernel then scans delta = 1..W,
comparing each hit with its delta-th predecessor via *dense shifted vectors*
(lax.dynamic_slice on W-padded arrays) — no scatters, no gathers, fully
VPU-vectorizable.

Per-pair CDS intersection uses the O(K^2) all-pairs clip form over K-padded
exon arrays (exact integer math, order-free). The dominator bookkeeping is
an elementwise lexicographic (score, -other_index) update per delta, which
equals the reference's first-max-wins chronological scan (overlap.c:148-155).

Float caveat: TPU f64 is emulated (double-double) and division is NOT
IEEE-exact (verified empirically), so the one float predicate —
cov_short < min_ov_ratio (overlap.c:134-136) — is evaluated EXACTLY with
the integer software round-to-nearest division in ops/softfloat.py; the
kernels contain no floating point at all.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import os

import jax

jax.config.update("jax_enable_x64", True)
# persistent compilation cache: shape-bucketed kernels recompile across CLI
# invocations otherwise (first TPU compile is 20-40s per shape; the full
# device-resident schedule is ~30 MIN of service-side compile per shape).
# Prefer a repo-local cache when one exists: the home directory dies with
# the container, the repo survives — a committed .xla_cache turns every
# fresh-container first run from a 30-min compile into a warm load.
_repo_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".xla_cache")
_cache_dir = os.environ.get(
    "PANGENE_TPU_CACHE",
    _repo_cache if os.path.isdir(_repo_cache)
    else os.path.expanduser("~/.cache/pangene_tpu_xla"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax
    pass

import jax.numpy as jnp
from jax import lax

I64 = jnp.int64
U64 = jnp.uint64
PAD_CID = np.int32(1 << 30)


def next_pow2(n: int, lo: int = 8) -> int:
    n = max(n, lo)
    return 1 << (n - 1).bit_length()


# ---------------------------------------------------------------------------
# columnsort: 1D sort as batched lane sorts (the TPU-friendly shape)
# ---------------------------------------------------------------------------

def colsort_cols(n: int) -> int:
    """Largest power-of-2 column count c (<= 64) for which Leighton's
    columnsort is valid on n keys: c | n, c | (n/c) and n/c >= 2(c-1)^2.
    0 when no c >= 8 qualifies (caller falls back to lax.sort)."""
    for c in (64, 32, 16, 8):
        r = n // c
        if n % c == 0 and r % c == 0 and r >= 2 * (c - 1) ** 2:
            return c
    return 0


def colsort_i64(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """Ascending sort of a flat i64 array via Leighton's 8-step
    columnsort: 4 row-sorts of [c, r] + 1 of [c+1, r] + 2 transposes +
    one shifted pass. XLA lowers a 1D lax.sort to a bitonic network over
    the (slow) minor dimension; the same keys as a BATCHED lane sort
    vectorize across sublanes, which measured several-fold faster per
    element on the chip (TPU_MICROBENCH.json sort_rows* vs
    sort_lean_1d). Exactness: columnsort is a proven oblivious sorting
    network, and every production key is distinct (the jo row index is
    embedded in the low bits), so the sorted output is the unique total
    order — bitwise identical to lax.sort's.

    The flat array is interpreted as the column-major layout of the
    classical r x c matrix; each ROW of the [c, r] working array is one
    classical column. Validity requires c | r and r >= 2(c-1)^2
    (checked by colsort_cols)."""
    n = x.shape[0]
    r = n // c
    R = x.reshape(c, r)
    R = lax.sort(R, dimension=1)                      # 1. sort columns
    R = R.reshape(r, c).T                             # 2. transpose
    R = lax.sort(R, dimension=1)                      # 3. sort columns
    R = R.T.reshape(c, r)                             # 4. untranspose
    R = lax.sort(R, dimension=1)                      # 5. sort columns
    lo = jnp.full(r // 2, jnp.iinfo(jnp.int64).min, x.dtype)
    hi = jnp.full(r - r // 2, jnp.iinfo(jnp.int64).max, x.dtype)
    z = jnp.concatenate([lo, R.reshape(-1), hi])      # 6. shift r/2
    z = lax.sort(z.reshape(c + 1, r), dimension=1)    # 7. sort columns
    return z.reshape(-1)[r // 2:r // 2 + n]           # 8. unshift


# ---------------------------------------------------------------------------
# band width (exact): W = max_i (i - min{j : cid_j==cid_i && ce_j > cs_i})
# ---------------------------------------------------------------------------

def band_width(cid: np.ndarray, cs: np.ndarray, ce: np.ndarray) -> int:
    """Host-side exact band computation via per-cid prefix max of ce.

    min{j : ce_j > t} within a cid equals searchsorted(prefix_max(ce), t,
    'right') because the running max first exceeds t exactly at that j.
    """
    n = len(cid)
    if n < 2:
        return 1
    # segmented prefix max of ce
    M = np.maximum.accumulate(ce)
    seg_start = np.zeros(n, bool)
    seg_start[0] = True
    seg_start[1:] = cid[1:] != cid[:-1]
    # reset accumulation at segment starts: do it per segment
    starts = np.flatnonzero(seg_start)
    M = ce.copy()
    for s, e in zip(starts, np.append(starts[1:], n)):
        M[s:e] = np.maximum.accumulate(ce[s:e])
    # composite keys keep the search within the right cid block
    B = 44
    assert int(ce.max(initial=0)) < (1 << B) and int(cid.max(initial=0)) < (1 << (62 - B))
    keyM = (cid.astype(np.int64) << B) | M.astype(np.int64)
    keyT = (cid.astype(np.int64) << B) | cs.astype(np.int64)
    J = np.searchsorted(keyM, keyT, side="right")
    i = np.arange(n)
    w = int(np.maximum(i - J, 0).max(initial=1))
    return max(w, 1)


# ---------------------------------------------------------------------------
# the fused banded sweep kernel
# ---------------------------------------------------------------------------

class SweepCols(NamedTuple):
    """H-padded per-hit columns (cs-sorted)."""
    valid: jnp.ndarray      # bool [H]
    cid: jnp.ndarray        # int32 [H] (pad PAD_CID)
    cs: jnp.ndarray         # int64 [H]
    ce: jnp.ndarray         # int64 [H]
    flt: jnp.ndarray        # bool [H]
    rev: jnp.ndarray        # int32 [H]
    rank: jnp.ndarray       # int32 [H]
    gid: jnp.ndarray        # int32 [H]
    pscore: jnp.ndarray     # uint64 [H] packed (score_adj<<33|pref<<32|hash)
    weak_br: jnp.ndarray    # int32 [H]
    cds_len: jnp.ndarray    # int32 [H]
    ex_os: jnp.ndarray      # int64 [H, K] absolute exon starts (pad empty)
    ex_oe: jnp.ndarray      # int64 [H, K]


def _shift_prev(arr: jnp.ndarray, delta, W: int, fill) -> jnp.ndarray:
    """arr_prev[i] = arr[i - delta] (fill outside), via slice of a W-padded copy."""
    pad_shape = (W,) + arr.shape[1:]
    padded = jnp.concatenate([jnp.full(pad_shape, fill, arr.dtype), arr], axis=0)
    start = (W - delta,) + (0,) * (arr.ndim - 1)
    return lax.dynamic_slice(padded, start, arr.shape)


def _shift_next(arr: jnp.ndarray, delta, W: int, fill) -> jnp.ndarray:
    """out[j] = arr[j + delta] (fill outside)."""
    pad_shape = (W,) + arr.shape[1:]
    padded = jnp.concatenate([arr, jnp.full(pad_shape, fill, arr.dtype)], axis=0)
    start = (delta,) + (0,) * (arr.ndim - 1)
    return lax.dynamic_slice(padded, start, arr.shape)


def _pair_geo(c: SweepCols, delta, W: int, check_strand: bool):
    """Round-INVARIANT pair gates + exact CDS intersection for
    (j = i - delta, i): everything except the flt terms."""
    jvalid = _shift_prev(c.valid, delta, W, False)
    cid_j = _shift_prev(c.cid, delta, W, PAD_CID)
    ce_j = _shift_prev(c.ce, delta, W, c.ce.dtype.type(-1))
    mask = c.valid & jvalid & (cid_j == c.cid) & (ce_j > c.cs)
    if check_strand:
        rev_j = _shift_prev(c.rev, delta, W, jnp.int32(-1))
        mask &= rev_j == c.rev
    # exact intersection: sum over exon pairs of relu(min(end)-max(start))
    zero = c.ex_os.dtype.type(0)
    os_j = _shift_prev(c.ex_os, delta, W, zero)
    oe_j = _shift_prev(c.ex_oe, delta, W, zero)
    lo = jnp.maximum(c.ex_os[:, :, None], os_j[:, None, :])
    hi = jnp.minimum(c.ex_oe[:, :, None], oe_j[:, None, :])
    ov = jnp.maximum(hi - lo, 0).astype(jnp.int64).sum(axis=(1, 2))
    mask &= ov > 0
    return mask, ov


def _pair_core(c: SweepCols, delta, W: int, check_strand: bool):
    """Pair masks + exact CDS intersection for (j = i - delta, i)."""
    geo, ov = _pair_geo(c, delta, W, check_strand)
    flt_j = _shift_prev(c.flt, delta, W, True)
    mask = geo & ~c.flt & ~flt_j
    return mask, ov


@functools.partial(jax.jit, static_argnames=("W", "check_strand"))
def ov_isoform_kernel(c: SweepCols, W: int, check_strand: bool) -> jnp.ndarray:
    """Device pg_flt_ov_isoform (overlap.c:58-93): returns flt_iso_ov marks."""
    def step(carry, delta):
        marks = carry
        mask, _ = _pair_core(c, delta, W, check_strand)
        gid_j = _shift_prev(c.gid, delta, W, jnp.int32(-1))
        mask &= gid_j == c.gid
        ps_j = _shift_prev(c.pscore, delta, W, jnp.uint64(0))
        rank_j = _shift_prev(c.rank, delta, W, jnp.int32(0))
        i_loses = (c.pscore < ps_j) | ((c.pscore == ps_j) & (c.rank > rank_j))
        marks |= mask & i_loses
        mark_j_here = mask & ~i_loses
        marks |= _shift_next(mark_j_here, delta, W, False)
        return marks, None

    marks0 = jnp.zeros_like(c.valid)
    marks, _ = lax.scan(step, marks0, jnp.arange(1, W + 1))
    return marks


def sweep_geo_planes(c: SweepCols, min_ov_ratio: float, W: int,
                     check_strand: bool) -> jnp.ndarray:
    """Hoist the round-INVARIANT part of the shadow sweep
    (overlap.c:101-156) out of the round loop: for each delta = 1..W pack
    one uint8 plane [W, H] with
      bit0  pair passes every flt/weak-independent gate (valid, same cid,
            ce_j > cs_i, strand, ov > 0, and the exact cov_short gate
            ``same_gene | !(ov/min(li,lj) < min_ov_ratio)``),
      bit1  same_gene,
      bit2  score_i_loses (packed-score/rank tie order, overlap.c:139-142).
    The exon K^2 intersection, the softfloat division and the uint64
    score compares run ONCE per schedule instead of once per round —
    the round body (shadow_round_kernel) is left with pure bitwise work.
    """
    from . import softfloat as sf

    def step(_, delta):
        geo, ov = _pair_geo(c, delta, W, check_strand)
        gid_j = _shift_prev(c.gid, delta, W, jnp.int32(-1))
        ps_j = _shift_prev(c.pscore, delta, W, jnp.uint64(0))
        rank_j = _shift_prev(c.rank, delta, W, jnp.int32(0))
        len_j = _shift_prev(c.cds_len, delta, W, jnp.int32(1))
        same_gene = gid_j == c.gid
        minlen = jnp.maximum(jnp.minimum(c.cds_len, len_j), 1)
        qm, qk = sf.div_rn(ov, minlen.astype(jnp.int64))
        cov_ok = ~sf.lt_const(qm, qk, min_ov_ratio)
        geo &= same_gene | cov_ok
        s_il = (c.pscore < ps_j) | ((c.pscore == ps_j)
                                    & (c.rank > rank_j))
        plane = (geo.astype(jnp.uint8)
                 | (same_gene.astype(jnp.uint8) << 1)
                 | (s_il.astype(jnp.uint8) << 2))
        return None, plane

    _, planes = lax.scan(step, None, jnp.arange(1, W + 1))
    return planes


def shadow_round_kernel(flt: jnp.ndarray, weak: jnp.ndarray,
                        pscore: jnp.ndarray, planes: jnp.ndarray, W: int):
    """Per-round shadow sweep over precomputed geometry planes.

    Byte-equivalent to shadow_kernel (minus the unused best-ov output):
    only the flt mask, the weak_br loser selection (overlap.c:143-147)
    and the dominator argmax run per round.
    """
    H = flt.shape[0]
    INT_MAX = jnp.int32(2**31 - 1)

    def step(carry, xs):
        delta, plane = xs
        marks, b_score, b_other = carry
        geo = (plane & 1) != 0
        same_gene = (plane & 2) != 0
        s_il = (plane & 4) != 0
        flt_j = _shift_prev(flt, delta, W, True)
        weak_j = _shift_prev(weak, delta, W, jnp.int32(0))
        mask = geo & ~flt & ~flt_j
        i_loses = jnp.where(same_gene | (weak == weak_j), s_il,
                            weak > weak_j)
        ps_j = _shift_prev(pscore, delta, W, jnp.uint64(0))
        other_j = jnp.arange(H, dtype=jnp.int32) - delta.astype(jnp.int32)
        cand_i = mask & i_loses
        marks |= cand_i
        upd = cand_i & ((ps_j > b_score) | ((ps_j == b_score)
                                            & (other_j < b_other)))
        b_score = jnp.where(upd, ps_j, b_score)
        b_other = jnp.where(upd, other_j, b_other)
        cand_j_at_i = mask & ~i_loses
        cand_j = _shift_next(cand_j_at_i, delta, W, False)
        marks |= cand_j
        sc_j = _shift_next(jnp.where(cand_j_at_i, pscore, jnp.uint64(0)),
                           delta, W, jnp.uint64(0))
        other_i = jnp.arange(H, dtype=jnp.int32) + delta.astype(jnp.int32)
        upd = cand_j & ((sc_j > b_score) | ((sc_j == b_score)
                                            & (other_i < b_other)))
        b_score = jnp.where(upd, sc_j, b_score)
        b_other = jnp.where(upd, other_i, b_other)
        return (marks, b_score, b_other), None

    carry0 = (jnp.zeros_like(flt),
              jnp.zeros(H, jnp.uint64),
              jnp.full(H, INT_MAX, jnp.int32))
    (marks, b_score, b_other), _ = lax.scan(
        step, carry0, (jnp.arange(1, W + 1), planes))
    return marks, b_score, b_other


@functools.partial(jax.jit, static_argnames=("min_ov_ratio", "W",
                                              "check_strand"))
def shadow_kernel(c: SweepCols, min_ov_ratio: float, W: int,
                  check_strand: bool):
    """Device pg_shadow sweep (overlap.c:101-156).

    Returns (marks, best_score, best_other, best_ov): per-hit loser marks
    and the dominator argmax (max winner packed score, ties -> smallest
    other index).  The cov_short gate ``(double)ov / min(li,lj) <
    min_ov_ratio`` (overlap.c:134-136) is evaluated EXACTLY via the
    software round-to-nearest division (ops/softfloat) — no f64, no
    ambiguity, min_ov_ratio is a static host double.
    """
    from . import softfloat as sf
    H = c.valid.shape[0]
    INT_MAX = jnp.int32(2**31 - 1)

    def step(carry, delta):
        marks, b_score, b_other, b_ov = carry
        mask, ov = _pair_core(c, delta, W, check_strand)
        gid_j = _shift_prev(c.gid, delta, W, jnp.int32(-1))
        ps_j = _shift_prev(c.pscore, delta, W, jnp.uint64(0))
        rank_j = _shift_prev(c.rank, delta, W, jnp.int32(0))
        weak_j = _shift_prev(c.weak_br, delta, W, jnp.int32(0))
        len_j = _shift_prev(c.cds_len, delta, W, jnp.int32(1))
        same_gene = gid_j == c.gid
        minlen = jnp.maximum(jnp.minimum(c.cds_len, len_j), 1)
        qm, qk = sf.div_rn(ov, minlen.astype(jnp.int64))
        cov_ok = ~sf.lt_const(qm, qk, min_ov_ratio)
        mask &= same_gene | cov_ok
        # loser selection (overlap.c:139-147)
        score_i_loses = (c.pscore < ps_j) | ((c.pscore == ps_j)
                                             & (c.rank > rank_j))
        i_loses = jnp.where(same_gene | (c.weak_br == weak_j),
                            score_i_loses, c.weak_br > weak_j)
        # loser = i: dense candidate (ps_j, other=j)
        other_j = jnp.arange(H, dtype=jnp.int32) - jnp.int32(delta)
        cand_i = mask & i_loses
        marks |= cand_i
        upd = cand_i & ((ps_j > b_score) | ((ps_j == b_score)
                                            & (other_j < b_other)))
        b_score = jnp.where(upd, ps_j, b_score)
        b_other = jnp.where(upd, other_j, b_other)
        b_ov = jnp.where(upd, ov.astype(jnp.int32), b_ov)
        # loser = j: shift candidates back to j rows
        cand_j_at_i = mask & ~i_loses
        cand_j = _shift_next(cand_j_at_i, delta, W, False)
        marks |= cand_j
        sc_j = _shift_next(jnp.where(cand_j_at_i, c.pscore, jnp.uint64(0)),
                           delta, W, jnp.uint64(0))
        ov_j = _shift_next(ov, delta, W, jnp.int64(0))
        other_i = jnp.arange(H, dtype=jnp.int32) + jnp.int32(delta)
        upd = cand_j & ((sc_j > b_score) | ((sc_j == b_score)
                                            & (other_i < b_other)))
        b_score = jnp.where(upd, sc_j, b_score)
        b_other = jnp.where(upd, other_i, b_other)
        b_ov = jnp.where(upd, ov_j.astype(jnp.int32), b_ov)
        return (marks, b_score, b_other, b_ov), None

    carry0 = (jnp.zeros_like(c.valid),
              jnp.zeros(H, jnp.uint64),
              jnp.full(H, INT_MAX, jnp.int32),
              jnp.zeros(H, jnp.int32))
    (marks, b_score, b_other, b_ov), _ = lax.scan(
        step, carry0, jnp.arange(1, W + 1))
    return marks, b_score, b_other, b_ov
