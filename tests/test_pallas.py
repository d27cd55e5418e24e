"""Pallas shadow-sweep kernel vs the scalar oracle (interpret mode on CPU;
the same kernel compiles under Mosaic and is exercised on TPU by bench/CI)."""
import numpy as np
import pytest

from pangene_tpu.core.data import DataSet, Genome
from pangene_tpu.options import PgOpt
from pangene_tpu.ops import sweep
from pangene_tpu.ops.device import band_width
from pangene_tpu.ops.device_engine import hash_u32_np
from pangene_tpu.ops.overlap import cds_len_all
from pangene_tpu.ops.pallas_sweep import dyadic_ratio, shadow_pallas_genome

from test_device_engine import random_genome


def build_cols(d, g):
    h = g.hits
    prot_gid = np.asarray(d.prot_gid, np.int32)
    gid = prot_gid[h.pid]
    pref = np.asarray(d.gene_preferred, np.uint8)[gid]
    K = int(h.n_exon.max(initial=1))
    kk = np.arange(K)[None, :]
    idx = np.clip(h.off_exon.astype(np.int64)[:, None] + kk, 0,
                  max(len(g.exon_os) - 1, 0))
    emask = kk < h.n_exon[:, None]
    eos = np.where(emask, g.exon_os[idx] + h.cs[:, None], 0).astype(np.int32)
    eoe = np.where(emask, g.exon_oe[idx] + h.cs[:, None], 0).astype(np.int32)
    return {
        "cs": h.cs.astype(np.int32), "ce": h.ce.astype(np.int32),
        "cid": h.cid.astype(np.int32), "flt": h.flt.astype(np.int32),
        "rev": h.rev.astype(np.int32), "rank": h.rank.astype(np.int32),
        "gid": gid.astype(np.int32),
        "shi": ((h.score_adj.astype(np.int64) << 1) | pref).astype(np.int32),
        "slo": hash_u32_np(h.pid).view(np.int32) + np.int32(-2**31),
        "weak": h.weak_br.astype(np.int32),
        "clen": cds_len_all(g).astype(np.int32),
        "eos": eos, "eoe": eoe,
    }, K


def test_dyadic_ratio():
    assert dyadic_ratio(0.5) == (1, 1)
    assert dyadic_ratio(0.25) == (1, 2)
    assert dyadic_ratio(0.75) == (3, 2)
    assert dyadic_ratio(1.0) == (1, 0)
    assert dyadic_ratio(0.3) is None
    assert dyadic_ratio(0.9) is None


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("check_strand", [False, True])
def test_pallas_shadow_vs_oracle(seed, check_strand):
    rng = np.random.default_rng(seed)
    opt = PgOpt()
    if check_strand:
        from pangene_tpu.options import PG_F_CHECK_STRAND
        opt.flag |= PG_F_CHECK_STRAND
    d, g = random_genome(rng, n_hits=150, weak=(seed % 2 == 0))
    d2 = DataSet.new()
    d2.__dict__.update({k: v for k, v in d.__dict__.items()
                        if k != "genomes"})
    g2 = Genome(g.label, g.ctg_names, g.ctg_len, g.hits.copy(),
                g.exon_os.copy(), g.exon_oe.copy())
    d2.genomes = [g2]
    sweep.shadow(opt, d, g, cal_dom_sc=False)
    cols, K = build_cols(d2, g2)
    W = band_width(g2.hits.cid, np.asarray(g2.hits.cs),
                   np.asarray(g2.hits.ce))
    p, k = dyadic_ratio(opt.min_ov_ratio)
    marks, has, other, ov = shadow_pallas_genome(
        cols, K, W, g2.n_hit, check_strand, p, k, interpret=True)
    h2 = g2.hits
    nonflt = h2.flt == 0
    evaluated = nonflt.copy()
    evaluated[0] = False
    new_shadow = np.where(evaluated, marks, (h2.shadow != 0) | marks)
    oth = np.clip(other, 0, g2.n_hit - 1).astype(np.int64)
    pid_dom = np.where(nonflt, -1, h2.pid_dom)
    pid_dom = np.where(nonflt & has, h2.pid[oth], pid_dom)
    np.testing.assert_array_equal(new_shadow.astype(np.uint8), g.hits.shadow)
    np.testing.assert_array_equal(pid_dom.astype(np.int32), g.hits.pid_dom)
