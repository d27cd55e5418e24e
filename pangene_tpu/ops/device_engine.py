"""Host<->device bridge for the sweep kernels.

Builds padded SweepCols from a Genome, invokes the jitted kernels (shapes
bucketed to powers of two so XLA compilations are reused across genomes and
rounds), and finalizes the float-sensitive pieces (score_dom's +.499
blending, counts) in host IEEE f64. The kernels themselves are exact
integer programs (ops/softfloat), so results are bit-equal to the host
oracle with no fallback path.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.data import DataSet, Genome
from ..options import PgOpt
from . import device as dev
from .overlap import cds_len_all

import jax.numpy as jnp


def hash_u32_np(keys: np.ndarray) -> np.ndarray:
    """Vectorized pg_hash_uint32 (pgpriv.h:88-97), uint32 wraparound."""
    k = keys.astype(np.uint32)
    with np.errstate(over="ignore"):
        k = (k + np.invert(k << np.uint32(15))).astype(np.uint32)
        k ^= k >> np.uint32(10)
        k = (k + (k << np.uint32(3))).astype(np.uint32)
        k ^= k >> np.uint32(6)
        k = (k + np.invert(k << np.uint32(11))).astype(np.uint32)
        k ^= k >> np.uint32(16)
    return k


def build_cols(d: DataSet, g: Genome, H: int, K: int) -> dev.SweepCols:
    h = g.hits
    n = len(h)
    prot_gid = np.asarray(d.prot_gid, np.int32)
    gid = prot_gid[h.pid]
    pref = np.asarray(d.gene_preferred, np.uint8)[gid]
    hashes = hash_u32_np(h.pid)
    pscore = ((h.score_adj.astype(np.int64).astype(np.uint64) << np.uint64(33))
              | (pref.astype(np.uint64) << np.uint64(32))
              | hashes.astype(np.uint64))

    def pad(a, fill, dtype):
        out = np.full(H, fill, dtype)
        out[:n] = a
        return out

    # absolute exon windows [H, K]
    ex_os = np.zeros((H, K), np.int64)
    ex_oe = np.zeros((H, K), np.int64)
    if n:
        kk = np.arange(K)[None, :]
        idx = h.off_exon[:, None].astype(np.int64) + kk
        emask = kk < h.n_exon[:, None]
        idxc = np.clip(idx, 0, max(len(g.exon_os) - 1, 0))
        cs_col = h.cs[:, None]
        ex_os[:n] = np.where(emask, g.exon_os[idxc].astype(np.int64) + cs_col, 0)
        ex_oe[:n] = np.where(emask, g.exon_oe[idxc].astype(np.int64) + cs_col, 0)

    valid = np.zeros(H, bool)
    valid[:n] = True
    return dev.SweepCols(
        valid=jnp.asarray(valid),
        cid=jnp.asarray(pad(h.cid, dev.PAD_CID, np.int32)),
        cs=jnp.asarray(pad(h.cs, 0, np.int64)),
        ce=jnp.asarray(pad(h.ce, -1, np.int64)),
        flt=jnp.asarray(pad(h.flt != 0, True, bool)),
        rev=jnp.asarray(pad(h.rev, 0, np.int32)),
        rank=jnp.asarray(pad(h.rank, 0, np.int32)),
        gid=jnp.asarray(pad(gid, -1, np.int32)),
        pscore=jnp.asarray(pad(pscore, 0, np.uint64)),
        weak_br=jnp.asarray(pad(h.weak_br, 0, np.int32)),
        cds_len=jnp.asarray(pad(cds_len_all(g), 1, np.int32)),
        ex_os=jnp.asarray(ex_os),
        ex_oe=jnp.asarray(ex_oe),
    )


def _shapes(d: DataSet, g: Genome):
    h = g.hits
    n = len(h)
    H = dev.next_pow2(n)
    K = dev.next_pow2(int(h.n_exon.max(initial=1)), lo=2)
    W = dev.next_pow2(dev.band_width(h.cid, np.asarray(h.cs), np.asarray(h.ce)),
                      lo=2)
    W = min(W, max(n, 1))
    return H, K, W


def flt_ov_isoform(opt: PgOpt, d: DataSet, g: Genome) -> int:
    """Device-backed pg_flt_ov_isoform; bit-equal to the host oracle."""
    if g.n_hit == 0:
        return 0
    H, K, W = _shapes(d, g)
    cols = build_cols(d, g, H, K)
    marks = np.asarray(dev.ov_isoform_kernel(cols, W, opt.check_strand))
    h = g.hits
    n = len(h)
    new = marks[:n]
    h.flt_iso_ov[new] = 1
    got = h.flt_iso_ov != 0
    h.flt[got] = 1
    return int(got.sum())


def shadow(opt: PgOpt, d: DataSet, g: Genome, cal_dom_sc: bool) -> int:
    """Device-backed pg_shadow; bit-equal to the host oracle (the coverage
    gate runs through the exact softfloat division, so there is no float
    ambiguity and no fallback)."""
    if g.n_hit == 0:
        return 0
    H, K, W = _shapes(d, g)
    cols = build_cols(d, g, H, K)
    marks, b_score, b_other, b_ov = dev.shadow_kernel(
        cols, float(opt.min_ov_ratio), W, opt.check_strand)
    h = g.hits
    n = len(h)
    marks = np.asarray(marks)[:n]
    b_score = np.asarray(b_score)[:n]
    b_other = np.asarray(b_other)[:n]
    b_ov = np.asarray(b_ov)[:n]
    nonflt = h.flt == 0
    # evaluated (non-flt, index>=1) hits are reset then re-marked; hit 0 and
    # flt hits keep stale values (reference quirk, overlap.c:108-116)
    evaluated = nonflt.copy()
    if n:
        evaluated[0] = False
    new_shadow = np.where(evaluated, marks,
                          (h.shadow != 0) | marks).astype(np.uint8)
    h.set("shadow", new_shadow)
    # dominator finalize (host f64 for the +.499 blend)
    has_dom = nonflt & (b_score > 0)
    pid_dom = np.where(nonflt, -1, h.pid_dom)
    other = np.clip(b_other, 0, max(n - 1, 0))
    pid_dom = np.where(has_dom, h.pid[other], pid_dom)
    h.set("pid_dom", pid_dom.astype(np.int32))
    if cal_dom_sc:
        lens = cds_len_all(g).astype(np.float64)
        li = lens
        lj = lens[other]
        ovf = b_ov.astype(np.float64)
        blend = (h.score_ori * (1.0 - ovf / li)
                 + h.score_ori[other] * (ovf / lj) + 0.499)
        sd = np.where(nonflt, -1, h.score_dom.astype(np.int64))
        sd = np.where(has_dom, blend.astype(np.int64), sd)
        h.set("score_dom", sd.astype(np.int32))
    return int((h.shadow[nonflt] != 0).sum())
