"""Vectorized (banded NumPy) host implementations of the overlap sweeps.

Same banded formulation as the device kernels (ops/device.py) — pair set
{(i-delta, i)} for delta=1..W with dense shifted columns — but computed with
NumPy, whose f64 is IEEE so the cov_short predicate is exact with no
ambiguity fallback. Bit-equal to the reference loops in ops/sweep.py (which
remain as the differential-test oracle).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.data import DataSet, Genome
from ..options import PgOpt
from .device import band_width
from .overlap import cds_len_all
from .device_engine import hash_u32_np


def _exon_windows(g: Genome, K: int) -> Tuple[np.ndarray, np.ndarray]:
    h = g.hits
    n = len(h)
    kk = np.arange(K)[None, :]
    idx = h.off_exon.astype(np.int64)[:, None] + kk
    emask = kk < h.n_exon[:, None]
    idxc = np.clip(idx, 0, max(len(g.exon_os) - 1, 0))
    cs = h.cs[:, None]
    abs_os = np.where(emask, g.exon_os[idxc].astype(np.int64) + cs, 0)
    abs_oe = np.where(emask, g.exon_oe[idxc].astype(np.int64) + cs, 0)
    return abs_os, abs_oe


def _shift_prev(a: np.ndarray, delta: int, fill) -> np.ndarray:
    out = np.empty_like(a)
    out[:delta] = fill
    out[delta:] = a[:-delta] if delta else a
    return out


def _shift_next(a: np.ndarray, delta: int, fill) -> np.ndarray:
    out = np.empty_like(a)
    if delta:
        out[-delta:] = fill
        out[:-delta] = a[delta:]
    else:
        out[:] = a
    return out


def _packed_scores(d: DataSet, g: Genome) -> np.ndarray:
    h = g.hits
    gid = np.asarray(d.prot_gid, np.int32)[h.pid]
    pref = np.asarray(d.gene_preferred, np.uint8)[gid]
    return ((h.score_adj.astype(np.int64).astype(np.uint64) << np.uint64(33))
            | (pref.astype(np.uint64) << np.uint64(32))
            | hash_u32_np(h.pid).astype(np.uint64)), gid


def flt_ov_isoform(opt: PgOpt, d: DataSet, g: Genome) -> int:
    """Vectorized pg_flt_ov_isoform (overlap.c:58-93)."""
    h = g.hits
    n = len(h)
    if n == 0:
        return 0
    W = band_width(h.cid, np.asarray(h.cs), np.asarray(h.ce))
    K = int(h.n_exon.max(initial=1))
    eos, eoe = _exon_windows(g, K)
    pscore, gid = _packed_scores(d, g)
    flt = h.flt != 0
    marks = np.zeros(n, bool)
    for delta in range(1, W + 1):
        mask = ~flt & ~_shift_prev(flt, delta, True)
        mask &= _shift_prev(h.cid, delta, -1) == h.cid
        mask &= _shift_prev(h.ce, delta, np.int64(-1)) > h.cs
        mask &= _shift_prev(gid, delta, -1) == gid
        if opt.check_strand:
            mask &= _shift_prev(h.rev, delta, 255) == h.rev
        if not mask.any():
            continue
        idx = np.flatnonzero(mask)
        jdx = idx - delta
        lo = np.maximum(eos[idx][:, :, None], eos[jdx][:, None, :])
        hi = np.minimum(eoe[idx][:, :, None], eoe[jdx][:, None, :])
        ov = np.maximum(hi - lo, 0).sum(axis=(1, 2))
        sel = ov > 0
        ii, jj = idx[sel], jdx[sel]
        i_loses = (pscore[ii] < pscore[jj]) | (
            (pscore[ii] == pscore[jj]) & (h.rank[ii] > h.rank[jj]))
        marks[ii[i_loses]] = True
        marks[jj[~i_loses]] = True
    h.flt_iso_ov[marks] = 1
    got = h.flt_iso_ov != 0
    h.flt[got] = 1
    return int(got.sum())


def shadow(opt: PgOpt, d: DataSet, g: Genome, cal_dom_sc: bool) -> int:
    """Vectorized pg_shadow (overlap.c:101-178), quirks preserved
    (stale hit-0/flt shadow, score>0 dominator gate, first-max tie-break)."""
    h = g.hits
    n = len(h)
    if n == 0:
        return 0
    W = band_width(h.cid, np.asarray(h.cs), np.asarray(h.ce))
    K = int(h.n_exon.max(initial=1))
    eos, eoe = _exon_windows(g, K)
    pscore, gid = _packed_scores(d, g)
    lens = cds_len_all(g).astype(np.int64)
    flt = h.flt != 0
    marks = np.zeros(n, bool)
    b_score = np.zeros(n, np.uint64)
    b_other = np.full(n, 2**31 - 1, np.int64)
    b_ov = np.zeros(n, np.int64)

    def lex_update(tgt, score, other, ov):
        upd = (score > b_score[tgt]) | ((score == b_score[tgt])
                                        & (other < b_other[tgt]))
        t = tgt[upd]
        b_score[t] = score[upd]
        b_other[t] = other[upd]
        b_ov[t] = ov[upd]

    for delta in range(1, W + 1):
        mask = ~flt & ~_shift_prev(flt, delta, True)
        mask &= _shift_prev(h.cid, delta, -1) == h.cid
        mask &= _shift_prev(h.ce, delta, np.int64(-1)) > h.cs
        if opt.check_strand:
            mask &= _shift_prev(h.rev, delta, 255) == h.rev
        if not mask.any():
            continue
        idx = np.flatnonzero(mask)
        jdx = idx - delta
        lo = np.maximum(eos[idx][:, :, None], eos[jdx][:, None, :])
        hi = np.minimum(eoe[idx][:, :, None], eoe[jdx][:, None, :])
        ov = np.maximum(hi - lo, 0).sum(axis=(1, 2))
        sel = ov > 0
        ii, jj, ovv = idx[sel], jdx[sel], ov[sel]
        same_gene = gid[ii] == gid[jj]
        m = np.minimum(lens[ii], lens[jj]).astype(np.float64)
        cov_ok = (ovv.astype(np.float64) / m) >= opt.min_ov_ratio
        keep = same_gene | cov_ok
        ii, jj, ovv, same_gene = ii[keep], jj[keep], ovv[keep], same_gene[keep]
        score_i_loses = (pscore[ii] < pscore[jj]) | (
            (pscore[ii] == pscore[jj]) & (h.rank[ii] > h.rank[jj]))
        wi, wj = h.weak_br[ii], h.weak_br[jj]
        i_loses = np.where(same_gene | (wi == wj), score_i_loses, wi > wj)
        li, lj = ii[i_loses], jj[i_loses]   # loser i, winner j
        marks[li] = True
        lex_update(li, pscore[jj[i_loses]], jj[i_loses], ovv[i_loses])
        lj2, wi2 = jj[~i_loses], ii[~i_loses]  # loser j, winner i
        marks[lj2] = True
        lex_update(lj2, pscore[wi2], wi2, ovv[~i_loses])

    nonflt = ~flt
    evaluated = nonflt.copy()
    evaluated[0] = False
    new_shadow = np.where(evaluated, marks, (h.shadow != 0) | marks)
    h.set("shadow", new_shadow.astype(np.uint8))
    has_dom = nonflt & (b_score > 0)
    other = np.clip(b_other, 0, n - 1).astype(np.int64)
    pid_dom = np.where(nonflt, -1, h.pid_dom)
    pid_dom = np.where(has_dom, h.pid[other], pid_dom)
    h.set("pid_dom", pid_dom.astype(np.int32))
    if cal_dom_sc:
        lensf = lens.astype(np.float64)
        ovf = b_ov.astype(np.float64)
        blend = (h.score_ori * (1.0 - ovf / lensf)
                 + h.score_ori[other] * (ovf / lensf[other]) + 0.499)
        sd = np.where(nonflt, -1, h.score_dom.astype(np.int64))
        sd = np.where(has_dom, blend.astype(np.int64), sd)
        h.set("score_dom", sd.astype(np.int32))
    return int((h.shadow[nonflt] != 0).sum())
