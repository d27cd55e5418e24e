"""Differential fuzz: native C sweeps (native/pgsweep.c) vs the scalar
reference-semantics oracle in ops/sweep.py. Same corpora as the vectorized
engine's fuzz so all three host engines are pinned to identical behavior."""
import numpy as np
import pytest

from pangene_tpu.options import PG_F_CHECK_STRAND, PgOpt
from pangene_tpu.ops import sweep, sweep_native

from test_device_engine import random_genome
from test_sweep_vec import clone

pytestmark = pytest.mark.skipif(not sweep_native.available(),
                                reason="no C compiler for pgsweep")


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("check_strand", [False, True])
def test_shadow_native_vs_oracle(seed, check_strand):
    rng = np.random.default_rng(seed)
    opt = PgOpt()
    if check_strand:
        opt.flag |= PG_F_CHECK_STRAND
    d, g = random_genome(rng, n_hits=120, weak=(seed % 2 == 0))
    d2, g2 = clone(d, g)
    n1 = sweep.shadow(opt, d, g, cal_dom_sc=True)
    n2 = sweep_native.shadow(opt, d2, g2, cal_dom_sc=True)
    assert n1 == n2
    for col in ("shadow", "pid_dom", "score_dom"):
        np.testing.assert_array_equal(g.hits.cols[col], g2.hits.cols[col],
                                      err_msg=col)


@pytest.mark.parametrize("seed", range(8))
def test_shadow_native_no_dom_sc(seed):
    rng = np.random.default_rng(100 + seed)
    opt = PgOpt()
    d, g = random_genome(rng, n_hits=150, weak=True)
    d2, g2 = clone(d, g)
    n1 = sweep.shadow(opt, d, g, cal_dom_sc=False)
    n2 = sweep_native.shadow(opt, d2, g2, cal_dom_sc=False)
    assert n1 == n2
    for col in ("shadow", "pid_dom", "score_dom"):
        np.testing.assert_array_equal(g.hits.cols[col], g2.hits.cols[col],
                                      err_msg=col)


@pytest.mark.parametrize("seed", range(8))
def test_ov_isoform_native_vs_oracle(seed):
    rng = np.random.default_rng(50 + seed)
    opt = PgOpt()
    d, g = random_genome(rng, n_hits=120)
    d2, g2 = clone(d, g)
    n1 = sweep.flt_ov_isoform(opt, d, g)
    n2 = sweep_native.flt_ov_isoform(opt, d2, g2)
    assert n1 == n2
    np.testing.assert_array_equal(g.hits.flt_iso_ov, g2.hits.flt_iso_ov)
    np.testing.assert_array_equal(g.hits.flt, g2.hits.flt)
