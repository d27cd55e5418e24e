"""Tile-pair Pallas shadow kernel (v2) vs the scalar oracle (interpret
mode on CPU; the same kernel compiles under Mosaic on TPU)."""
import numpy as np
import pytest

from pangene_tpu.core.data import DataSet, Genome
from pangene_tpu.options import PgOpt
from pangene_tpu.ops import sweep
from pangene_tpu.ops.device import band_width
from pangene_tpu.ops.pallas_tile import dyadic_ratio, shadow_pallas_tile

from test_device_engine import random_genome
from test_pallas import build_cols


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("check_strand", [False, True])
def test_tile_shadow_vs_oracle(seed, check_strand):
    rng = np.random.default_rng(seed)
    opt = PgOpt()
    if check_strand:
        from pangene_tpu.options import PG_F_CHECK_STRAND
        opt.flag |= PG_F_CHECK_STRAND
    d, g = random_genome(rng, n_hits=300, weak=(seed % 2 == 0))
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
    marks, has, other, ov = shadow_pallas_tile(
        cols, K, W, g2.n_hit, check_strand, p, k, interpret=True)
    h2 = g2.hits
    nonflt = h2.flt == 0
    evaluated = nonflt.copy()
    evaluated[0] = False
    new_shadow = np.where(evaluated, marks, (h2.shadow != 0) | marks)
    oth = np.clip(other, 0, g2.n_hit - 1).astype(np.int64)
    pid_dom = np.where(nonflt, -1, h2.pid_dom)
    pid_dom = np.where(nonflt & has, h2.pid[oth], pid_dom)
    np.testing.assert_array_equal(new_shadow.astype(np.uint8),
                                  g.hits.shadow, err_msg="shadow")
    np.testing.assert_array_equal(pid_dom.astype(np.int32),
                                  g.hits.pid_dom, err_msg="pid_dom")
