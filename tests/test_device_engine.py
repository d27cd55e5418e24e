"""Differential tests: jax device kernels vs the host NumPy oracle.

Runs on a CPU backend (conftest forces JAX_PLATFORMS=cpu with 8 virtual
devices). Randomized genomes exercise overlap depth, multi-contig layouts,
strand checks and weak_br interactions.
"""
import numpy as np
import pytest

from pangene_tpu.core.data import DataSet, Genome, HitTable
from pangene_tpu.options import PG_F_CHECK_STRAND, PgOpt
from pangene_tpu.ops import device_engine, sweep
from pangene_tpu.ops.device import band_width
from pangene_tpu.ops.sort import hit_sort


def random_genome(rng, n_hits=60, n_genes=8, n_prots_per_gene=3, n_ctg=3,
                  weak=False):
    d = DataSet.new()
    for gi in range(n_genes):
        gid = d.add_gene("G%d" % gi)
        for pi in range(n_prots_per_gene):
            d.add_prot("G%d:P%d" % (gi, pi), gid)
        d.gene_preferred[gid] = int(rng.random() < 0.2)
    n_prot = d.n_prot
    h = HitTable.empty(n_hits)
    exon_os = []
    exon_oe = []
    off = 0
    cols = {k: [] for k in ("pid", "cid", "cs", "ce", "cm", "score_adj",
                            "score_ori", "rank", "rev", "flt", "weak_br",
                            "n_exon", "off_exon")}
    for i in range(n_hits):
        pid = int(rng.integers(0, n_prot))
        cid = int(rng.integers(0, n_ctg))
        cs = int(rng.integers(0, 3000))
        n_exon = int(rng.integers(1, 5))
        pts = np.sort(rng.integers(0, 500, 2 * n_exon))
        # make strictly increasing to keep exons disjoint
        pts = pts + np.arange(2 * n_exon)
        os_ = pts[0::2]
        oe_ = pts[1::2]
        span = int(oe_[-1])
        exon_os.append(os_.astype(np.int32))
        exon_oe.append(oe_.astype(np.int32))
        cols["pid"].append(pid)
        cols["cid"].append(cid)
        cols["cs"].append(cs)
        cols["ce"].append(cs + span)
        cols["cm"].append(cs + span // 2)
        cols["score_adj"].append(int(rng.integers(0, 1000)))
        cols["score_ori"].append(int(rng.integers(0, 1200)))
        cols["rank"].append(int(rng.integers(0, 3)))
        cols["rev"].append(int(rng.integers(0, 2)))
        cols["flt"].append(int(rng.random() < 0.15))
        cols["weak_br"].append(int(rng.integers(0, 3)) if weak else 0)
        cols["n_exon"].append(n_exon)
        cols["off_exon"].append(off)
        off += n_exon
    for k, v in cols.items():
        h.set(k, np.asarray(v, h.cols[k].dtype))
    h.set("pid_dom", np.full(n_hits, -1, np.int32))
    g = Genome("test", ["c%d" % i for i in range(n_ctg)],
               np.full(n_ctg, 10000, np.int64), h,
               np.concatenate(exon_os), np.concatenate(exon_oe))
    d.genomes.append(g)
    hit_sort(g, by_cm=False)
    return d, g


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("check_strand", [False, True])
def test_shadow_device_vs_host(seed, check_strand):
    rng = np.random.default_rng(seed)
    opt = PgOpt(engine="jax")
    if check_strand:
        opt.flag |= PG_F_CHECK_STRAND
    d, g = random_genome(rng, weak=(seed % 2 == 0))
    d2 = DataSet.new()
    d2.__dict__.update({k: v for k, v in d.__dict__.items() if k != "genomes"})
    g2 = Genome(g.label, g.ctg_names, g.ctg_len, g.hits.copy(),
                g.exon_os.copy(), g.exon_oe.copy())
    d2.genomes = [g2]
    n_host = sweep.shadow(opt, d, g, cal_dom_sc=True)
    n_dev = device_engine.shadow(opt, d2, g2, cal_dom_sc=True)
    assert n_host == n_dev
    for col in ("shadow", "pid_dom", "score_dom"):
        np.testing.assert_array_equal(g.hits.cols[col], g2.hits.cols[col],
                                      err_msg=col)


@pytest.mark.parametrize("seed", range(6))
def test_ov_isoform_device_vs_host(seed):
    rng = np.random.default_rng(100 + seed)
    opt = PgOpt(engine="jax")
    d, g = random_genome(rng)
    g2 = Genome(g.label, g.ctg_names, g.ctg_len, g.hits.copy(),
                g.exon_os.copy(), g.exon_oe.copy())
    d2 = DataSet.new()
    d2.__dict__.update({k: v for k, v in d.__dict__.items() if k != "genomes"})
    d2.genomes = [g2]
    n_host = sweep.flt_ov_isoform(opt, d, g)
    n_dev = device_engine.flt_ov_isoform(opt, d2, g2)
    assert n_host == n_dev
    np.testing.assert_array_equal(g.hits.flt_iso_ov, g2.hits.flt_iso_ov)
    np.testing.assert_array_equal(g.hits.flt, g2.hits.flt)


def test_band_width_exact():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(2, 80))
        cid = np.sort(rng.integers(0, 3, n)).astype(np.int32)
        cs = np.zeros(n, np.int64)
        for c in np.unique(cid):
            m = cid == c
            cs[m] = np.sort(rng.integers(0, 1000, int(m.sum())))
        ce = cs + rng.integers(1, 400, n)
        W = band_width(cid, cs, ce)
        # brute force: max over i of i - min{j: cid match, ce_j > cs_i}
        want = 1
        for i in range(n):
            for j in range(i):
                if cid[j] == cid[i] and ce[j] > cs[i]:
                    want = max(want, i - j)
                    break
        assert W >= want, (W, want)


def test_c4_jax_engine_gfa(c4_pafs, golden_dir):
    import io
    from pangene_tpu import pipeline
    from pangene_tpu.options import PgOpt as P
    opt = P(engine="jax")
    buf = io.StringIO()
    pipeline.run(opt, c4_pafs, out=buf)
    assert buf.getvalue() == (golden_dir / "C4.gfa").read_text()
