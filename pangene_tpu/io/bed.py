"""BED12 debug dump with per-hit filter-state tags
(reference pg_write_bed_hit, format.c:78-118)."""
from __future__ import annotations

from typing import IO

from ..core.data import DataSet


def write_bed(d: DataSet, is_walk: bool, out: IO[str]) -> None:
    for j, g in enumerate(d.genomes):
        h = g.hits
        for i in range(len(h)):
            if is_walk and h.flt[i]:
                continue
            off = int(h.off_exon[i])
            ne = int(h.n_exon[i])
            sizes = "".join("%d," % (g.exon_oe[off + k] - g.exon_os[off + k])
                            for k in range(ne))
            starts = "".join("%d," % g.exon_os[off + k] for k in range(ne))
            iden = "%.4f" % (int(h.mlen[i]) / int(h.blen[i]))
            dom = "*" if h.pid_dom0[i] < 0 else d.prot_name[h.pid_dom0[i]]
            out.write(
                "%s\t%d\t%d\t%s\t%d\t%c\t%d\t%d\t0\t%d\t%s\t%s"
                "\tft:i:%d\tpf:Z:%d%d%d%d\trk:i:%d\trp:i:%d\tsd:i:%d\tvt:i:%d"
                "\tbr:i:%d\tcm:i:%d\tid:f:%s\tdm:Z:%s\n" % (
                    g.ctg_names[h.cid[i]], h.cs[i], h.ce[i],
                    d.prot_name[h.pid[i]], h.score_ori[i], "+-"[int(h.rev[i])],
                    h.cs[i], h.ce[i], ne, sizes, starts,
                    h.flt[i], h.pseudo[i], h.flt_iso_ov[i], h.flt_chain[i],
                    h.flt_iso_sub_self[i], h.rank[i], h.rep[i], h.shadow[i],
                    h.vtx[i], h.weak_br[i], h.cm[i], iden, dom))
