"""Toolkit `call` exactness: independent-oracle cross-derivation + pinned
byte goldens for every reference bubble fixture (VERDICT r1 item 3).

No k8 runtime exists here, so reference outputs cannot be produced
directly. Instead tests/bubble_oracle.py re-derives the full call
semantics (cycle equivalence DEFINITIONALLY, bubble tests, nesting, walk
projection, allele counting) from the pangene.js algorithm spec with none
of tools/'s code; agreement on every fixture plus randomized graphs makes
a shared transcription error in both implementations the only unchecked
failure mode. Class numbering is traversal-dependent, so the cec column
is compared after first-appearance renumbering AND the seg->class
partitions are asserted identical.
"""
import contextlib
import io
import pathlib
import random

import pytest

from bubble_oracle import OGfa, call_oracle, seg_classes
from pangene_tpu.tools.cli import main as tools_main
from pangene_tpu.tools.gfa import GFA
from pangene_tpu.tools.netgraph import NetGraph

BUBBLE = pathlib.Path("/root/reference/test/bubble")
GOLDEN = pathlib.Path(__file__).parent / "golden"
FIXTURES = sorted(BUBBLE.glob("*.gfa")) if BUBBLE.exists() else []


def tools_call(fn, sym):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        tools_main(["call"] + (["--sym"] if sym else []) + [str(fn)])
    return buf.getvalue()


def records(text):
    return [l for l in text.split("\n") if l and not l.startswith("CC")]


def norm_cec(lines):
    m = {}
    out = []
    for l in lines:
        t = l.split("\t")
        if t and t[0] in ("BB", "FB"):
            c = t[3]
            if c not in m:
                m[c] = str(len(m))
            t[3] = m[c]
        out.append("\t".join(t))
    return out


def assert_call_matches_oracle(text, sym):
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".gfa", delete=False) as f:
        f.write(text)
        fn = f.name
    ours = norm_cec(records(tools_call(fn, sym)))
    orcl = norm_cec(call_oracle(text, sym))
    assert ours == orcl


def assert_partition_matches(text, sym):
    """mark_cec's seg classes must equal the definitional partition."""
    g = GFA().from_string(text)
    if sym:
        g.symmetrize()
    NetGraph(g, False, None).mark_cec()
    ours = [s.cec for s in g.seg]
    orcl = seg_classes(OGfa(text, sym))
    assert len(ours) == len(orcl)
    for i in range(len(ours)):
        assert (ours[i] < 0) == (orcl[i] is None), i
        for j in range(i + 1, len(ours)):
            if ours[i] < 0 or ours[j] < 0:
                continue
            assert (ours[i] == ours[j]) == (orcl[i] == orcl[j]), (i, j)


@pytest.mark.parametrize("fx", FIXTURES, ids=lambda p: p.name)
@pytest.mark.parametrize("sym", [False, True], ids=["plain", "sym"])
def test_fixture_oracle_agreement(fx, sym):
    text = fx.read_text()
    assert_call_matches_oracle(text, sym)
    assert_partition_matches(text, sym)


@pytest.mark.parametrize("fx", FIXTURES, ids=lambda p: p.name)
@pytest.mark.parametrize("sym", [False, True], ids=["plain", "sym"])
def test_fixture_goldens_pinned(fx, sym):
    suffix = ".call-sym.txt" if sym else ".call.txt"
    want = (GOLDEN / "bubble" / (fx.stem + suffix)).read_text()
    assert tools_call(fx, sym) == want


def test_c4_call_oracle_and_golden():
    """C4 has W lines: exercises walk projection + allele counting."""
    text = (GOLDEN / "C4.gfa").read_text()
    assert_call_matches_oracle(text, sym=False)
    assert_partition_matches(text, sym=False)
    got = tools_call(GOLDEN / "C4.gfa", sym=False)
    assert got == (GOLDEN / "bubble" / "C4.call.txt").read_text()


def _random_gfa(rng, n_seg, n_extra, n_walk):
    """Random dual-closed graph with a linear backbone plus random chords,
    and walks that follow random successor paths (so alleles exist)."""
    names = ["g%d" % i for i in range(n_seg)]
    arcs = set()
    for i in range(n_seg - 1):
        arcs.add((2 * i, 2 * (i + 1)))
    for _ in range(n_extra):
        if rng.random() < 0.5 and n_seg >= 4:
            # diamond chord: skip 2-3 backbone genes forward
            i = rng.randrange(n_seg - 3)
            j = min(i + rng.randrange(2, 4), n_seg - 1)
            arcs.add((2 * i, 2 * j))
        else:
            v = rng.randrange(2 * n_seg)
            w = rng.randrange(2 * n_seg)
            if v >> 1 != w >> 1:
                arcs.add((v, w))
    arcs = sorted(arcs)
    lines = ["S\t%s\t*\tLN:i:100" % n for n in names]
    for v, w in arcs:
        lines.append("L\t%s\t%s\t%s\t%s\t0M" % (
            names[v >> 1], "+-"[v & 1], names[w >> 1], "+-"[w & 1]))
    # successor map on the dual-closed graph for walk generation
    succ = {}
    for v, w in arcs:
        succ.setdefault(v, []).append(w)
        succ.setdefault(w ^ 1, []).append(v ^ 1)
    for j in range(n_walk):
        v = rng.randrange(2 * n_seg)
        path = [v]
        for _ in range(rng.randrange(3, 12)):
            nxt = succ.get(path[-1])
            if not nxt:
                break
            path.append(rng.choice(nxt))
        walk = "".join("><"[x & 1] + names[x >> 1] for x in path)
        lines.append("W\tasm%d\t%d\tchr1\t0\t1000\t%s" % (j, j % 2, walk))
    return "\n".join(lines) + "\n"


def test_random_graphs_oracle_fuzz():
    rng = random.Random(42)
    n_with_bubbles = 0
    for trial in range(25):
        text = _random_gfa(rng, n_seg=rng.randrange(5, 14),
                           n_extra=rng.randrange(2, 10),
                           n_walk=rng.randrange(0, 5))
        assert_call_matches_oracle(text, sym=True)
        assert_partition_matches(text, sym=True)
        if any(l.startswith("BB") for l in call_oracle(text, True)):
            n_with_bubbles += 1
    assert n_with_bubbles >= 5  # the fuzz actually exercises bubbles


def tools_call_pst(fn):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        tools_main(["call", "--sym", "-p", "-s", str(fn)])
    return buf.getvalue()


@pytest.mark.parametrize("fx", FIXTURES, ids=lambda p: p.name)
def test_pst_mode_definitional_and_golden(fx):
    """`call -p -s` (PST / SESE path, pangene.js:607-631,736-772): every
    surviving BB record must pass the ORACLE's definitional bibubble test
    with the exact member set, every FB record must fail it, and the byte
    output is pinned."""
    from bubble_oracle import OGfa, _get_bubble_id
    out = tools_call_pst(fx)
    want = (GOLDEN / "bubble" / (fx.stem + ".call-pst.txt")).read_text()
    assert out == want
    g = OGfa(fx.read_text(), sym=True)
    n_vtx = 2 * len(g.names)

    def vtx(tok):
        return g.name_id[tok[1:]] * 2 | (0 if tok[0] == ">" else 1)

    n_bb = 0
    for line in records(out):
        t = line.split("\t")
        if t[0] not in ("BB", "FB"):
            continue
        vs, ve = vtx(t[4]), vtx(t[5])
        flag = [-1] * n_vtx
        r = _get_bubble_id(g, vs, ve, flag, 0, 100)
        if t[0] == "BB":
            n_bb += 1
            assert r, line
            assert {g.names[s] for s in r} == set(t[-1].split(",")), line
        else:
            assert not r, line
    # the fixtures exercise real PST bubbles, not vacuous empties
    if fx.name in ("t2-0-simple.gfa", "t2-1.gfa", "t1-8c.gfa"):
        assert n_bb >= 1
