"""Exon-level CDS overlap.

The reference's hot inner kernel is a merge-scan of two sorted exon lists
returning the CDS intersection length (pg_hit_overlap, overlap.c:6-42; the
union length it also computes is unused). Intersection length is
order-independent exact integer math, so we are free to compute it any way;
the device kernels use a prefix-sum + searchsorted formulation that
vectorizes on the VPU, and this host version uses the same formulation via
NumPy for oracle testing.
"""
from __future__ import annotations

import numpy as np

from ..core.data import Genome


def cds_len(g: Genome, i: int) -> int:
    """Total exon length of hit i (reference pg_cds_len, overlap.c:45-51)."""
    off = int(g.hits.off_exon[i])
    n = int(g.hits.n_exon[i])
    return int((g.exon_oe[off:off + n] - g.exon_os[off:off + n]).sum())


def cds_len_all(g: Genome) -> np.ndarray:
    """Vectorized CDS length for every hit."""
    lens = (g.exon_oe - g.exon_os).astype(np.int64)
    cum = np.concatenate(([0], np.cumsum(lens)))
    off = g.hits.off_exon.astype(np.int64)
    return (cum[off + g.hits.n_exon] - cum[off]).astype(np.int32)


def interval_intersection(a_st: np.ndarray, a_en: np.ndarray,
                          b_st: np.ndarray, b_en: np.ndarray) -> int:
    """Intersection length of two sorted non-overlapping interval lists.

    Uses f(x) = total length of B below x, evaluated via searchsorted into
    B starts with clamped partial interval; l_inter = sum_a f(a_en)-f(a_st).
    """
    if len(a_st) == 0 or len(b_st) == 0:
        return 0
    b_cum = np.concatenate(([0], np.cumsum((b_en - b_st).astype(np.int64))))

    def f(x: np.ndarray) -> np.ndarray:
        k = np.searchsorted(b_st, x, side="right") - 1
        kc = np.clip(k, 0, len(b_st) - 1)
        part = np.clip(x - b_st[kc], 0, b_en[kc] - b_st[kc])
        return np.where(k < 0, 0, b_cum[kc] + part)

    return int((f(a_en) - f(a_st)).sum())


def hit_overlap(g: Genome, j: int, i: int) -> int:
    """CDS intersection length between hits j and i of genome g.

    Returns 0 when on different contigs or with disjoint [cs,ce) spans,
    matching the early-out in overlap.c:12.
    """
    h = g.hits
    if h.cid[j] != h.cid[i]:
        return 0
    if not (h.cs[j] < h.ce[i] and h.ce[j] > h.cs[i]):
        return 0
    oj, nj = int(h.off_exon[j]), int(h.n_exon[j])
    oi, ni = int(h.off_exon[i]), int(h.n_exon[i])
    a_st = g.exon_os[oj:oj + nj].astype(np.int64) + int(h.cs[j])
    a_en = g.exon_oe[oj:oj + nj].astype(np.int64) + int(h.cs[j])
    b_st = g.exon_os[oi:oi + ni].astype(np.int64) + int(h.cs[i])
    b_en = g.exon_oe[oi:oi + ni].astype(np.int64) + int(h.cs[i])
    return interval_intersection(a_st, a_en, b_st, b_en)
