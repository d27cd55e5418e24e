"""Unit tests for the ingest and kernel building blocks, checked against
brute-force oracles (the test pyramid the reference lacks, SURVEY.md §4)."""
import numpy as np
import pytest

from pangene_tpu.io.gfa_write import parse_sample
from pangene_tpu.io.paf import cal_cm, parse_cigar, read_label
from pangene_tpu.ops.overlap import interval_intersection
from pangene_tpu.ops.sweep import hash_uint32, packed_score


def test_parse_cigar_basic():
    # 10 aa match, intron of 50, 5 aa match -> exons [0,30) [80,95)
    os_, oe_, x, nfs = parse_cigar(b"10M50N5M", rev=0)
    assert x == 95 and nfs == 0
    assert os_.tolist() == [0, 80] and oe_.tolist() == [30, 95]


def test_parse_cigar_uv_offsets():
    # U intron: exon boundary at st=x+1, next exon at x+l-2 (read.c:59-63)
    os_, oe_, x, _ = parse_cigar(b"4M30U4M", rev=0)
    assert os_.tolist() == [0, 40] and oe_.tolist() == [13, 54]
    os_, oe_, x, _ = parse_cigar(b"4M30V4M", rev=0)
    assert os_.tolist() == [0, 41] and oe_.tolist() == [14, 54]


def test_parse_cigar_rev_and_fs():
    os_f, oe_f, x, nfs = parse_cigar(b"3M10N2M1F1M", rev=0)
    assert nfs == 1 and x == 9 + 10 + 6 + 1 + 3
    os_r, oe_r, xr, _ = parse_cigar(b"3M10N2M1F1M", rev=1)
    assert xr == x
    assert os_r.tolist() == [x - e for e in oe_f.tolist()[::-1]]
    assert oe_r.tolist() == [x - s for s in os_f.tolist()[::-1]]


def test_cal_cm_midpoint():
    # two exons of 10 and 20; total 30, half=15 -> position 5 into exon 2
    os_ = np.array([0, 100], np.int32)
    oe_ = np.array([10, 120], np.int32)
    assert cal_cm(1000, os_, oe_) == 1000 + 100 + 5


def test_interval_intersection_brute_force():
    rng = np.random.default_rng(0)
    for _ in range(200):
        def mk():
            n = rng.integers(1, 8)
            pts = np.sort(rng.integers(0, 100, 2 * n))
            return pts[0::2].astype(np.int64), pts[1::2].astype(np.int64)
        a_st, a_en = mk()
        b_st, b_en = mk()
        got = interval_intersection(a_st, a_en, b_st, b_en)
        want = sum(max(0, min(ae, be) - max(as_, bs))
                   for as_, ae in zip(a_st, a_en)
                   for bs, be in zip(b_st, b_en))
        assert got == want


def test_hash_uint32_known_values():
    # golden values from the reference pg_hash_uint32 (pgpriv.h:88-97)
    assert hash_uint32(0) == 0x4636b9c9
    assert hash_uint32(1) == 0x62baf5a0
    assert hash_uint32(42) == 0xd4798d01
    assert hash_uint32(0xFFFFFFFF) == 0xdc8b039a


def test_packed_score_layout():
    s = packed_score(5, 1, 0xDEADBEEF)
    assert s == (5 << 33) | (1 << 32) | 0xDEADBEEF


def test_parse_sample():
    assert parse_sample("HG00438#1#ctg") == ("HG00438", 1)
    assert parse_sample("GRCh38#0#chr6") == ("GRCh38", 0)
    assert parse_sample("chr6") == (None, -1)
    assert parse_sample("a##ctg") == ("a", 0)       # strtol("") quirk
    assert parse_sample("#1#ctg") == (None, -1)     # empty sample
    assert parse_sample("s#-1#ctg") == (None, -1)   # negative hap
    assert parse_sample("s#1x#ctg") == (None, -1)   # trailing garbage
    assert parse_sample("s#+7#c") == ("s", 7)


def test_read_label():
    assert read_label("/a/b/90_HG00438.1.f1v2g.paf.gz") == "90_HG00438.1.f1v2g"
    assert read_label("x.paf") == "x"
    assert read_label("dir/.paf.gz") is None


def test_debug_gene_dump(c4_pafs, capsys):
    """debug_gene prints the reference's Z-line dump (pg_debug_gene,
    graph.c:265-278) for one vertex's outgoing arcs."""
    import io
    import sys

    from pangene_tpu import pipeline
    from pangene_tpu.graph.build import debug_gene
    from pangene_tpu.options import PgOpt
    q = pipeline.run(PgOpt(), c4_pafs, out=io.StringIO())
    err = io.StringIO()
    old = sys.stderr
    sys.stderr = err
    try:
        debug_gene(q, "C4A")
    finally:
        sys.stderr = old
    lines = [l for l in err.getvalue().splitlines() if l.startswith("Z\t")]
    assert lines and all(l.split("\t")[1][1:] == "C4A" for l in lines)
