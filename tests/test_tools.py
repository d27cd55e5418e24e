"""Toolkit tests: bubble calling on the reference's test/bubble fixtures and
the C4 graph, plus the matrix/diff/outgroup subcommands.

No k8 runtime exists here to diff against pangene.js directly, so expected
outputs are (a) hand-derived for the synthetic t2-* fixtures (diamond,
nested, sequential, inversion cases), (b) checked against the documented
biology of the C4/RCCX locus (one bibubble STK19..TNXB containing
C4A/C4B/CYP21A2, tex/pangene.tex:544-560), and (c) validated against a
brute-force definitional bibubble checker.
"""
import io
import pathlib
import sys

import pytest

from pangene_tpu.tools.cli import main as tools_main
from pangene_tpu.tools.gfa import GFA
from pangene_tpu.tools.netgraph import NetGraph

BUBBLE = pathlib.Path("/root/reference/test/bubble")
GOLDEN = pathlib.Path(__file__).parent / "golden"


def run_tool(capsys, *args):
    tools_main(list(args))
    return capsys.readouterr().out


def bb_lines(out):
    return [l for l in out.split("\n") if l.startswith("BB")]


@pytest.fixture(autouse=True)
def _need_fixtures():
    if not BUBBLE.exists():
        pytest.skip("reference bubble fixtures not available")


def test_t2_fixtures(capsys):
    # diamond: one bubble s1..s4 {s2,s3}
    out = run_tool(capsys, "call", "--sym", str(BUBBLE / "t2-0-simple.gfa"))
    assert bb_lines(out) == ["BB\t0\t-1\t0\t>s1\t>s4\t-1\t2\ts2,s3"]
    # nested: inner s4..s6 inside outer s1..s3
    out = run_tool(capsys, "call", "--sym", str(BUBBLE / "t2-1.gfa"))
    bbs = bb_lines(out)
    assert len(bbs) == 2
    assert "\t>s1\t>s3\t" in bbs[0] and bbs[0].endswith("s2,s4,s5,s7,s6")
    assert "\t>s4\t>s6\t" in bbs[1] and bbs[1].split("\t")[2] == "0"  # nested
    # two sequential diamonds
    out = run_tool(capsys, "call", "--sym", str(BUBBLE / "t2-2.gfa"))
    assert len(bb_lines(out)) == 2
    # linear chain: no bubble
    out = run_tool(capsys, "call", "--sym", str(BUBBLE / "t2-3.gfa"))
    assert bb_lines(out) == []
    # inversion bubble around s2
    out = run_tool(capsys, "call", "--sym", str(BUBBLE / "t2-4.gfa"))
    assert bb_lines(out) == ["BB\t0\t-1\t0\t>s1\t>s3\t-1\t1\ts2"]


def test_c4_call_rccx(capsys):
    out = run_tool(capsys, "call", str(GOLDEN / "C4.gfa"))
    bbs = bb_lines(out)
    assert len(bbs) == 1
    cols = bbs[0].split("\t")
    assert cols[4:6] == [">STK19", "<TNXB"]
    assert cols[6] == "9"  # distinct alleles across the 33 haplotypes
    assert set(cols[8].split(",")) == {"C4A", "C4B", "CYP21A2"}
    al = [l for l in out.split("\n") if l.startswith("AL")]
    assert len(al) == 9
    assert sum(int(l.split("\t")[1]) for l in al) == 33  # every haplotype


def test_bibubble_definitional_checker(capsys):
    """Brute-force check of the generalized-bibubble definition
    (tex/pangene.tex:349-356) on every reported t2/t1 bubble."""
    for fn in sorted(BUBBLE.glob("t2-*.gfa")) + sorted(BUBBLE.glob("t1-*.gfa")):
        g = GFA().from_file(str(fn))
        g.symmetrize()
        net = NetGraph(g, False, None)
        bb = net.get_bb(100, use_pst=False, ignore_walk=True)
        for b in bb:
            vs, ve, interior = b["vs"], b["ve"], set(b["seg"])
            # forward reachability from vs without crossing ve
            seen = set()
            stack = [vs]
            ends = set()
            while stack:
                v = stack.pop()
                off, n = g.idx[v]
                for i in range(n):
                    w = g.arc[off + i].w
                    if w == ve:
                        ends.add(w)
                        continue
                    if w not in seen and w != (vs ^ 1):
                        seen.add(w)
                        stack.append(w)
            assert {s >> 1 for s in seen} <= interior | {vs >> 1, ve >> 1}
            assert ends == {ve}


def test_gfa2matrix(capsys):
    out = run_tool(capsys, "gfa2matrix", str(GOLDEN / "C4.gfa"))
    lines = out.strip().split("\n")
    assert lines[0].startswith("Gene\tGRCh38#0\tCHM13#0")
    assert len(lines) == 8  # header + 7 genes
    row = {l.split("\t")[0]: l.split("\t")[1:] for l in lines[1:]}
    assert all(v == "1" for v in row["DXO"])       # core gene
    assert row["C4A"].count("0") == 2              # absent in 2 primates
    # copy-number mode keeps counts > 1
    out = run_tool(capsys, "gfa2matrix", "-c", str(GOLDEN / "C4.gfa"))
    row = {l.split("\t")[0]: l.split("\t")[1:]
           for l in out.strip().split("\n")[1:]}
    assert any(int(v) > 1 for v in row["C4B"])


def test_calldiff_and_outgroup(capsys, tmp_path):
    call_out = run_tool(capsys, "call", str(GOLDEN / "C4.gfa"))
    f1 = tmp_path / "c1.txt"
    f1.write_text(call_out)
    assert run_tool(capsys, "calldiff", str(f1), str(f1)).strip() == ""
    og = tmp_path / "og.txt"
    og.write_text("GRCh38#0\nCHM13#0\n")
    out = run_tool(capsys, "outgroup", str(f1), str(og))
    assert out.startswith("BA\t0\tpoly_in,exp_in")


def test_call2html(capsys, tmp_path):
    call_out = run_tool(capsys, "call", str(GOLDEN / "C4.gfa"))
    f1 = tmp_path / "c1.txt"
    f1.write_text(call_out)
    out = run_tool(capsys, "call2html", str(f1))
    assert "<table" in out and "STK19" in out and "&mdash;" in out


def test_flt_mmseqs(capsys, tmp_path):
    # mmseqs fmt2: q,t,fident,alnlen,mism,gapopen,qs,qe,ts,te,e,bits,qlen,tlen
    rec_good = "\t".join(["A:1", "B:1", "0.95", "100", "2", "0", "1", "100",
                          "1", "100", "1e-50", "500", "100", "100"])
    rec_bad = "\t".join(["C:1", "D:1", "0.95", "50", "30", "10", "1", "50",
                         "1", "50", "1e-10", "90", "200", "200"])
    f = tmp_path / "mm.txt"
    f.write_text(rec_good + "\n" + rec_bad + "\n")
    out = run_tool(capsys, "flt-mmseqs", str(f))
    assert "A:1" in out and "C:1" not in out
    out = run_tool(capsys, "flt-mmseqs", "-v", str(f))
    assert "C:1" in out and "A:1" not in out


def test_getaa(capsys, tmp_path):
    gtf = tmp_path / "a.gtf"
    gtf.write_text(
        'chr1\tx\tCDS\t1\t9\t.\t+\t0\tgene_id "G1"; gene_name "GENE1"; '
        'protein_id "P1"; protein_version "2"; gene_biotype "protein_coding";\n'
        'chrM\tx\tCDS\t1\t9\t.\t+\t0\tgene_id "GM"; protein_id "PM"; '
        'gene_biotype "protein_coding";\n')
    faa = tmp_path / "a.faa"
    faa.write_text(">P1.2 desc\nMKV\n>PM.1\nMAA\n")
    out = run_tool(capsys, "getaa", str(gtf), str(faa))
    assert out == ">GENE1:P1.2 chr1\nMKV\n"


def test_bed2paf(capsys, tmp_path):
    bed = tmp_path / "x.bed"
    bed.write_text("c1\t10\t100\tG1:P1\t50\t+\nc2\t20\t120\tG1:P2\t60\t+\n")
    fai1 = tmp_path / "1.fai"
    fai1.write_text("c1\t1000\n")
    fai2 = tmp_path / "2.fai"
    fai2.write_text("c2\t2000\n")
    out = run_tool(capsys, "bed2paf", str(bed), str(fai1), str(fai2))
    assert out == "c1\t1000\t10\t100\t+\tc2\t2000\t20\t120\t50\t60\t60\tpn:Z:G1\n"


def test_random_chained_diamonds(tmp_path, capsys):
    """Constructed ground truth: a long chain with K random diamond
    insertions must yield exactly K bibubbles, each with the planted
    interior; every report also passes the definitional checker."""
    import random
    rng = random.Random(17)
    segs = []
    links = []
    chain = ["b%d" % i for i in range(40)]
    segs += chain
    planted = []
    for i in range(len(chain) - 1):
        if rng.random() < 0.35 and len(planted) < 12:
            a1 = "alt%d_1" % i
            a2 = "alt%d_2" % i
            segs += [a1, a2]
            links += [(chain[i], a1), (chain[i], a2),
                      (a1, chain[i + 1]), (a2, chain[i + 1])]
            planted.append((chain[i], chain[i + 1], {a1, a2}))
        else:
            links.append((chain[i], chain[i + 1]))
    gfa = tmp_path / "rand.gfa"
    with open(gfa, "w") as f:
        for s in segs:
            f.write("S\t%s\t*\tLN:i:100\n" % s)
        for a, b in links:
            f.write("L\t%s\t+\t%s\t+\t0M\n" % (a, b))
    out = run_tool(capsys, "call", "--sym", str(gfa))
    bbs = bb_lines(out)
    assert len(bbs) == len(planted), (len(bbs), len(planted))
    got = {}
    for l in bbs:
        c = l.split("\t")
        got[(c[4].lstrip("><"), c[5].lstrip("><"))] = set(c[8].split(","))
    for vs, ve, interior in planted:
        assert got.get((vs, ve)) == interior, (vs, ve)


def test_getopt_k8_semantics():
    """_getopt must match k8 getopt (pangene.js:15-77): bundled short
    flags, inline/following args, `--` termination keeping `--` in rest,
    unknown opts (and any --long) yield '?'."""
    from pangene_tpu.tools.cli import _getopt
    # bundled flags
    opts, rest = _getopt(["-bd", "in.gfa"], "bedpm:wr:s")
    assert opts == [("-b", ""), ("-d", "")] and rest == ["in.gfa"]
    # bundled flag + arg-taking opt with inline arg
    opts, rest = _getopt(["-wm50", "x"], "bedpm:wr:s")
    assert opts == [("-w", ""), ("-m", "50")] and rest == ["x"]
    # arg-taking opt consuming the next argv item
    opts, rest = _getopt(["-m", "50", "x"], "bedpm:wr:s")
    assert opts == [("-m", "50")] and rest == ["x"]
    # `--` terminates; it and everything after stay in rest (k8 quirk)
    opts, rest = _getopt(["-b", "--", "-d", "y"], "bedpm:wr:s")
    assert opts == [("-b", "")] and rest == ["--", "-d", "y"]
    # unknown short option and long option both yield '?'
    opts, rest = _getopt(["-z", "--long", "f"], "bedpm:wr:s")
    assert opts == [("?", ""), ("?", "")] and rest == ["f"]
    # non-options interleave untouched
    opts, rest = _getopt(["a", "-e", "b", "-m7"], "bedpm:wr:s")
    assert opts == [("-e", ""), ("-m", "7")] and rest == ["a", "b"]
