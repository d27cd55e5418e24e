"""Synthetic miniprot-PAF generation for benchmarks and multi-chip dry runs.

Generates structurally realistic inputs: orthologous gene loci shared across
genomes, multiple isoforms per gene (driving the overlap sweeps), occasional
paralogs/pseudogene copies (driving shadowing and branch pruning), valid
CIGAR strings with introns, and PanSN contig names (driving W-line parsing).
"""
from __future__ import annotations

import gzip
import os
from typing import List

import numpy as np


def synth_paf_files(out_dir: str, n_genome: int = 8, n_gene: int = 200,
                    n_iso: int = 3, n_ctg: int = 4, seed: int = 0,
                    paralog_rate: float = 0.08,
                    single_exon: bool = False) -> List[str]:
    """Synthetic miniprot-shaped PAF corpus. single_exon=True emits
    unspliced single-exon hits (the bacterial / miniprot -S shape,
    BASELINE.json's bacterial config)."""
    rng = np.random.default_rng(seed)
    # gene layout shared across genomes: order along contigs with jitter
    gene_ctg = rng.integers(0, n_ctg, n_gene)
    gene_pos = rng.integers(0, 50_000_000, n_gene)
    # protein lengths (aa) and exon structure per isoform
    files = []
    os.makedirs(out_dir, exist_ok=True)
    for gi in range(n_genome):
        fn = os.path.join(out_dir, "synth%03d.paf.gz" % gi)
        files.append(fn)
        lines = []
        for gene in range(n_gene):
            if rng.random() < 0.05:  # gene missing in this genome
                continue
            n_copies = 1 + (rng.random() < paralog_rate)
            for copy in range(n_copies):
                for iso in range(1 + int(rng.integers(0, n_iso))):
                    n_exon = 1 if single_exon else int(rng.integers(2, 9))
                    exon_aa = rng.integers(20, 200, n_exon)
                    introns = rng.integers(80, 5000, n_exon - 1)
                    qlen = int(exon_aa.sum()) + int(rng.integers(0, 30))
                    qs = int(rng.integers(0, 10))
                    qe = qs + int(exon_aa.sum())
                    if qe > qlen:
                        qe = qlen
                    span = int(exon_aa.sum()) * 3 + int(introns.sum())
                    ctg = int(gene_ctg[gene])
                    base = int(gene_pos[gene]) + copy * 2_000_000 \
                        + int(rng.integers(0, 2000))
                    strand = "+-"[int(rng.integers(0, 2))]
                    mlen = int((qe - qs) * (0.85 + 0.14 * rng.random()))
                    blen = qe - qs + int(rng.integers(0, 10))
                    ms = int(mlen * 2 * (0.9 + 0.2 * rng.random()))
                    cig = []
                    for k in range(n_exon):
                        cig.append("%dM" % exon_aa[k])
                        if k < n_exon - 1:
                            cig.append("%dN" % introns[k])
                    name = "GENE%05d:ISO%d" % (gene, iso)
                    ctg_name = "S%03d#%d#ctg%d" % (gi // 2, gi % 2 + 1, ctg)
                    lines.append("\t".join(map(str, (
                        name, qlen, qs, qe, strand, ctg_name, 60_000_000,
                        base, base + span, mlen, blen, 60,
                        "ms:i:%d" % ms, "fs:i:0", "st:i:0",
                        "cg:Z:%s" % "".join(cig)))))
        with gzip.open(fn, "wt") as fp:
            fp.write("\n".join(lines) + "\n")
    return files


def synth_dataset(n_genome: int = 8, n_gene: int = 60, seed: int = 0):
    """In-memory DataSet via the PAF text path (exercises ingest too)."""
    import tempfile

    from .options import PgOpt
    from .pipeline import read_all
    tmp = tempfile.mkdtemp(prefix="pg_synth_")
    files = synth_paf_files(tmp, n_genome=n_genome, n_gene=n_gene, seed=seed)
    opt = PgOpt()
    return opt, read_all(opt, files)
