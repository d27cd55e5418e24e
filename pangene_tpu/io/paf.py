"""Host-side PAF ingest.

Streams one miniprot PAF file per genome into the SoA data model. String
interning and per-record side effects replicate the reference field-by-field
state machine (read.c:107-262) exactly, including its quirks:

  * gene/protein/contig ids are assigned in first-encounter order
    (read.c:151-170, 190-196);
  * a record dropped by the coverage (read.c:182) or identity (read.c:209)
    gate still registers its gene/protein/contig and still bumps the
    per-protein rank counter (read.c:170-171);
  * prot.len is reset per record, so the last parsed record of a protein
    defines its length (read.c:168, 175);
  * the adjusted score is score_ori * exp(-m*(div+uncov)) rounded with +.499
    (read.c:213-216; the reference uses long-double expl — the optional
    native helper reproduces it bit-exactly, the Python fallback uses
    double exp).

This layer is I/O- and string-bound, latency-irrelevant next to device
compute, and deliberately host-side (SURVEY.md §7 design stance).
"""
from __future__ import annotations

import gzip
import math
import re
from typing import List, Optional, Tuple

import numpy as np

from ..core.data import DataSet, Genome, HitTable
from ..options import PgOpt

try:  # bit-exact long-double exp helper (native/)
    from ..native import score_adj_exact as _score_adj_exact
except Exception:  # pragma: no cover - fallback when extension not built
    _score_adj_exact = None

_CIGAR_RE = re.compile(rb"(\d+)([A-Za-z=])")


def parse_cigar(cg: bytes, rev: int) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """CIGAR -> exon arrays (os, oe relative to cs), span x, frameshift count.

    Mirrors the op semantics of read.c:47-90: N/U/V introns split exons (U/V
    carry 1/2-bp splice-boundary offsets), M/X/=/D advance 3*l nt, F/G advance
    l and count as potential loss-of-function; exons are reversed for '-'
    strand so os/oe are always ascending along the contig.
    """
    os_: List[int] = [0]
    oe_: List[int] = [0]
    x = 0
    n_fs = 0
    for m in _CIGAR_RE.finditer(cg):
        l = int(m.group(1))
        op = m.group(2)
        if op in b"NUV":
            if op == b"N":
                st, en = x, x + l
            elif op == b"U":
                st, en = x + 1, x + l - 2
            else:
                st, en = x + 2, x + l - 1
            oe_[-1] = st
            os_.append(en)
            oe_.append(en)
            x += l
        elif op in b"MX=D":
            x += l * 3
        elif op in b"FG":
            x += l
            n_fs += 1
    oe_[-1] = x
    os_a = np.asarray(os_, np.int32)
    oe_a = np.asarray(oe_, np.int32)
    if rev:
        os_a, oe_a = (x - oe_a)[::-1].copy(), (x - os_a)[::-1].copy()
    return os_a, oe_a, x, n_fs


def cal_cm(cs: int, os_: np.ndarray, oe_: np.ndarray) -> int:
    """Genomic position of the CDS midpoint (reference pg_hit_cal_cm, hit.c:14-27)."""
    lens = (oe_ - os_).astype(np.int64)
    cum = np.concatenate(([0], np.cumsum(lens)))
    half = int(cum[-1]) >> 1
    # exon i with cum[i] <= half < cum[i+1]
    i = int(np.searchsorted(cum, half, side="right")) - 1
    if i >= len(lens):  # all-empty exon list can't happen for kept hits
        raise ValueError("empty CDS")
    # the reference scan also requires half < cum[i]+len_i; with zero-length
    # exons searchsorted('right') lands past them exactly as the C loop does
    while lens[i] == 0:
        i += 1
    return cs + int(os_[i]) + half - int(cum[i])


def read_label(fn: str) -> Optional[str]:
    """Basename minus .paf/.gz suffixes (reference pg_read_label, read.c:92-105)."""
    base = fn.rsplit("/", 1)[-1]
    en = len(base)
    if base.endswith(".gz"):
        en -= 3
    if base[:en].endswith(".paf"):
        en -= 4
    if en <= 0:
        return None
    return base[:en]


def score_adj_round(score_ori: int, coef: float, div: float, uncov: float) -> int:
    """score_adj = (int)(score_ori * expl(-coef*(div+uncov)) + .499) (read.c:216)."""
    if _score_adj_exact is not None:
        return _score_adj_exact(score_ori, coef, div, uncov)
    return int(score_ori * math.exp(-coef * (div + uncov)) + 0.499)


class _GenomeBuilder:
    """Columnar append buffers for one genome."""

    def __init__(self, label: Optional[str]):
        self.label = label
        self.ctg_names: List[str] = []
        self.ctg_len: List[int] = []
        self.ctg_id = {}
        self.rows: List[tuple] = []  # one tuple per hit, HIT column order
        self.exon_os: List[np.ndarray] = []
        self.exon_oe: List[np.ndarray] = []
        self.n_exon = 0

    def finish(self) -> Genome:
        hits = HitTable.empty(len(self.rows))
        if self.rows:
            cols = list(zip(*self.rows))
            names = ("pid", "qs", "qe", "cid", "mlen", "blen", "lof", "rank",
                     "score_ori", "score_adj", "n_exon", "off_exon",
                     "rev", "cs", "cm", "ce")
            for name, vals in zip(names, cols):
                hits.set(name, np.asarray(vals, hits.cols[name].dtype))
        hits.set("pid_dom", np.full(len(self.rows), -1, np.int32))
        hits.set("pid_dom0", np.full(len(self.rows), -1, np.int32))
        exon_os = (np.concatenate(self.exon_os) if self.exon_os
                   else np.zeros(0, np.int32))
        exon_oe = (np.concatenate(self.exon_oe) if self.exon_oe
                   else np.zeros(0, np.int32))
        return Genome(self.label, self.ctg_names,
                      np.asarray(self.ctg_len, np.int64), hits,
                      exon_os, exon_oe)


def _open(fn: str):
    if fn == "-":
        import sys
        return sys.stdin.buffer
    if fn.endswith(".gz"):
        return gzip.open(fn, "rb")
    return open(fn, "rb")


def read_paf(opt: PgOpt, d: DataSet, fn: str) -> Genome:
    """Parse one PAF file into a new Genome appended to `d` (read.c:107-242).

    Uses the native C parser (zlib + exact long-double score adjustment)
    when available and no exclusion list is set; falls back to the pure
    Python state machine. Only parsing + interning here; the per-genome
    filter postpass (read.c:243-260) is run by the pipeline driver so it
    can target host or device engines.
    """
    import os
    import sys
    if fn != "-" and not os.path.exists(fn):
        # the reference silently returns -1 without creating a genome
        # (read.c:117-118); we at least warn
        sys.stderr.write("[W::pg_read_paf] failed to open %r; skipped\n" % fn)
        return None
    if opt.excl is None and fn != "-":
        g = _read_paf_native(opt, d, fn)
        if g is not None:
            return g
    gb = _GenomeBuilder(read_label(fn))
    delim = opt.gene_delim.encode()
    excl = opt.excl
    incl = opt.incl
    pref = opt.preferred
    rank_cnt = {}  # per-file per-protein occurrence counter (read.c:170)
    n_tot = 0

    with _open(fn) as fp:
        for line in fp:
            line = line.rstrip(b"\n").rstrip(b"\r")
            # NB: no blank-line skip — the reference pushes empty lines through
            # the field loop, interning a ""-named gene/protein (read.c:128-171)
            n_tot += 1
            fields = line.split(b"\t")
            # field 0: query name -> gene:protein split at first delimiter
            qname = fields[0]
            di = qname.find(delim)
            gene_name_b = qname[:di] if di >= 0 else qname
            qname_s = qname.decode()
            gene_name = gene_name_b.decode()
            if excl and (qname_s in excl or gene_name in excl):
                continue
            gid = d.add_gene(gene_name)
            d.gene_preferred[gid] = 1 if (pref and gene_name in pref) else 0
            d.gene_included[gid] = 1 if (incl and gene_name in incl) else 0
            pid = d.add_prot(qname_s, gid)
            d.prot_gid[pid] = gid
            d.prot_len[pid] = 0  # reset per record (read.c:168)
            rank = rank_cnt.get(qname_s, -1) + 1
            rank_cnt[qname_s] = rank
            if len(fields) < 2:
                continue
            # field 1: query length
            qlen = int(fields[1])
            d.prot_len[pid] = qlen
            if d.gene_len[gid] < qlen:
                d.gene_len[gid] = qlen
            if len(fields) < 11:
                continue
            qs = int(fields[2])
            qe = int(fields[3])
            if qe - qs < qlen * opt.min_prot_ratio:  # coverage gate (read.c:182)
                continue
            strand = fields[4]
            if strand not in (b"+", b"-"):
                continue
            rev = 1 if strand == b"-" else 0
            # field 5/6: contig name / length
            ctg = fields[5].decode()
            cid = gb.ctg_id.get(ctg, -1)
            if cid < 0:
                cid = len(gb.ctg_names)
                gb.ctg_id[ctg] = cid
                gb.ctg_names.append(ctg)
                gb.ctg_len.append(0)
                if ctg not in d.ctg_id:
                    d.ctg_id[ctg] = len(d.ctg_id)
            gb.ctg_len[cid] = int(fields[6])
            cs = int(fields[7])
            ce = int(fields[8])
            mlen = int(fields[9])
            blen = int(fields[10])
            if mlen < blen * opt.min_prot_iden:  # identity gate (read.c:209)
                continue
            # tags (fields 12+)
            score_ori = 0
            score_adj = 0
            n_fs_tag = -1
            n_stop_tag = -1
            exon_arrays = None
            cig_fs = 0
            for f in fields[12:]:
                if f.startswith(b"ms:i:"):
                    div = 1.0 - mlen / blen
                    uncov = 1.0 - (qe - qs) / qlen
                    score_ori = int(f[5:])
                    score_adj = score_adj_round(score_ori, opt.score_adj_coef,
                                                div, uncov)
                elif f.startswith(b"fs:i:"):
                    n_fs_tag = int(f[5:])
                elif f.startswith(b"st:i:"):
                    n_stop_tag = int(f[5:])
                elif f.startswith(b"cg:Z:"):
                    os_a, oe_a, x, cig_fs = parse_cigar(f[5:], rev)
                    assert x == ce - cs, "CIGAR span != ce-cs (read.c:75)"
                    exon_arrays = (os_a, oe_a)
            if exon_arrays is None:
                continue  # n_exon < 1: record dropped (read.c:229)
            os_a, oe_a = exon_arrays
            lof_tags = (n_fs_tag if n_fs_tag > 0 else 0) + \
                       (n_stop_tag if n_stop_tag > 0 else 0)
            lof = max(cig_fs, lof_tags)
            off_exon = gb.n_exon
            gb.exon_os.append(os_a)
            gb.exon_oe.append(oe_a)
            gb.n_exon += len(os_a)
            cm = cal_cm(cs, os_a, oe_a)
            gb.rows.append((pid, qs, qe, cid, mlen, blen, lof, rank,
                            score_ori, score_adj, len(os_a), off_exon,
                            rev, cs, cm, ce))

    g = gb.finish()
    d.genomes.append(g)
    g._n_tot_records = n_tot  # for the read-stage log line
    return g


def parse_worker(args) -> Optional[dict]:
    """Parallel-parse worker: standalone native parse of ONE PAF file with
    file-LOCAL ids (picklable numpy SoA + name blob). The pool driver
    (pipeline.read_all) merges results in FILE ORDER, so global interning
    order — and therefore every id and tie order — is identical to the
    sequential path."""
    fn, min_ratio, min_iden, coef, delim = args
    from ..native import loader
    return loader.parse_paf_native(fn, min_ratio, min_iden, coef,
                                   sess=None, delim=delim)


def merge_standalone(opt: PgOpt, d: DataSet, fn: str, nat: dict) -> Genome:
    """Merge one worker's file-local parse into the global DataSet,
    replaying the reference's per-record global side effects in record
    order (read.c:151-200): gene/protein interning at first encounter,
    prot_len last-record-wins, gene_len max, contig registration."""
    from ..native.loader import decode_names
    prot_names = decode_names(nat["prot_blob"])
    delim = opt.gene_delim
    pref, incl = opt.preferred, opt.incl
    loc2glob = np.empty(len(prot_names), np.int32)
    for li, name in enumerate(prot_names):
        di = name.find(delim)
        gname = name[:di] if di >= 0 else name
        gid = d.add_gene(gname)
        d.gene_preferred[gid] = 1 if (pref and gname in pref) else 0
        d.gene_included[gid] = 1 if (incl and gname in incl) else 0
        pid = d.add_prot(name, gid)
        d.prot_gid[pid] = gid
        loc2glob[li] = pid
    nat = dict(nat)
    nat["r_name"] = loc2glob[nat["r_name"]] if len(nat["r_name"]) \
        else nat["r_name"]
    nat["h_name"] = loc2glob[nat["h_name"]] if len(nat["h_name"]) \
        else nat["h_name"]
    return _apply_native(opt, d, fn, nat)


def _read_paf_native(opt: PgOpt, d: DataSet, fn: str) -> Optional[Genome]:
    """Assemble a Genome from the native parser's SoA output, applying the
    per-record global-table side effects in record order (read.c:151-200):
    gene/protein interning at first occurrence, prot_len = last record's
    qlen (reset-0 quirk), gene_len = max, per-record contig length.

    Interning happens cross-file inside the native parser (InternSession):
    hit/record name columns arrive carrying final global ids, and only the
    NEW name tail is decoded per file. Global ids equal the pure-Python
    path's because both assign in first-occurrence record order."""
    from ..native import loader
    sess = getattr(d, "_nat_sess", None)
    if sess is None:
        if d.n_gene or d.n_prot:
            # another parser already interned names (e.g. an earlier "-"
            # stdin file went through the Python path): the C session
            # could not reproduce those ids, so stay on the Python parser
            return None
        sess = loader.make_session(opt.gene_delim)
        if sess is None:
            return None
        import weakref
        weakref.finalize(d, sess.close)
        d._nat_sess = sess
    n_gene0, n_prot0 = d.n_gene, d.n_prot
    if sess.counts() != (n_gene0, n_prot0):
        # a non-session parser interleaved (e.g. a "-" stdin file): the C
        # session can no longer mint ids consistent with the tables
        return None
    nat = loader.parse_paf_native(fn, opt.min_prot_ratio, opt.min_prot_iden,
                                  opt.score_adj_coef, sess=sess)
    if nat is None:
        return None
    n_gene1, n_prot1 = sess.counts()
    if n_gene1 > n_gene0:
        names = sess.names_tail(0, n_gene0, n_gene1)
        base = len(d.gene_name)
        for i, name in enumerate(names):
            d.gene_id[name] = base + i
        d.gene_name.extend(names)
        k = len(names)
        d.gene_len.extend_zeros(k)
        if opt.preferred:
            d.gene_preferred.extend(
                [1 if name in opt.preferred else 0 for name in names])
        else:
            d.gene_preferred.extend_zeros(k)
        if opt.incl:
            d.gene_included.extend(
                [1 if name in opt.incl else 0 for name in names])
        else:
            d.gene_included.extend_zeros(k)
        d.gene_rep_pid.extend_zeros(k, fill=-1)
    pgarr = sess.prot_gid(n_prot1)
    if n_prot1 > n_prot0:
        names = sess.names_tail(1, n_prot0, n_prot1)
        base = len(d.prot_name)
        for i, name in enumerate(names):
            d.prot_id[name] = base + i
        d.prot_name.extend(names)
        k = len(names)
        d.prot_len.extend_zeros(k)
        d.prot_gid.extend(pgarr[n_prot0:])
        d.prot_rep.extend_zeros(k)
        d.prot_n.extend_zeros(k)
        d.prot_avg_score_adj.extend_zeros(k)
        d.prot_max_score_ori.extend_zeros(k)
    return _apply_native(opt, d, fn, nat)


def _apply_native(opt: PgOpt, d: DataSet, fn: str, nat: dict) -> Genome:
    """Common tail of the native-parse merge: per-file global side effects
    + hit-table assembly. r_name/h_name must carry GLOBAL protein ids."""
    pgarr = d.prot_gid.view()
    # prot_len: last record per name wins; missing field-1 records reset to 0.
    # All reductions are group-wise over the FILE's names only (sorted-run
    # reduceat + vector scatter into the IntVec windows — the per-record
    # Python write-back loop here measured ~7% of the host run).
    r_name = nat["r_name"]
    r_qlen = nat["r_qlen"]
    if len(r_name):
        order = np.argsort(r_name, kind="stable")
        ns = r_name[order]
        last = order[np.flatnonzero(np.concatenate((ns[1:] != ns[:-1], [True])))]
        tgt = r_name[last]
        newv = np.maximum(r_qlen[last].astype(np.int64), 0)
        d.prot_len.view()[tgt] = newv
        # gene_len = max over records with a parsed qlen
        has = r_qlen >= 0
        if has.any():
            gids = pgarr[r_name[has]]
            q = r_qlen[has].astype(np.int64)
            o2 = np.argsort(gids, kind="stable")
            gs = gids[o2]
            starts = np.flatnonzero(np.concatenate(([True], gs[1:] != gs[:-1])))
            gmax = np.maximum.reduceat(q[o2], starts)
            ug = gs[starts]
            gl = d.gene_len.view()
            np.maximum.at(gl, ug, gmax)
    # contigs: per-file table; register names globally; len = last record's
    ctg_names = nat["ctg_names"]
    for name in ctg_names:
        if name not in d.ctg_id:
            d.ctg_id[name] = len(d.ctg_id)
    ctg_len = np.zeros(len(ctg_names), np.int64)
    r_cid = nat["r_cid"]
    r_ctglen = nat["r_ctglen"]
    seen = r_cid >= 0
    if seen.any():
        cids = r_cid[seen]
        lens = r_ctglen[seen]
        order = np.argsort(cids, kind="stable")
        cs_ = cids[order]
        last = order[np.flatnonzero(np.concatenate((cs_[1:] != cs_[:-1], [True])))]
        ctg_len[cids[last]] = lens[last]
    # hit table
    n = len(nat["h_name"])
    hits = HitTable.empty(n)
    hits.set("pid", nat["h_name"])      # global pids from the session
    for src, dst in (("h_qs", "qs"), ("h_qe", "qe"), ("h_mlen", "mlen"),
                     ("h_blen", "blen"), ("h_rank", "rank"),
                     ("h_score_ori", "score_ori"),
                     ("h_score_adj", "score_adj"), ("h_lof", "lof"),
                     ("h_n_exon", "n_exon"), ("h_off_exon", "off_exon"),
                     ("h_cid", "cid"), ("h_cs", "cs"), ("h_ce", "ce"),
                     ("h_cm", "cm")):
        hits.set(dst, nat[src])
    hits.set("rev", nat["h_rev"].astype(np.uint8))
    hits.set("pid_dom", np.full(n, -1, np.int32))
    hits.set("pid_dom0", np.full(n, -1, np.int32))
    g = Genome(read_label(fn), ctg_names, ctg_len, hits,
               nat["e_os"], nat["e_oe"])
    d.genomes.append(g)
    g._n_tot_records = nat["n_records"]
    return g
