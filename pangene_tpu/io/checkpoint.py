"""Checkpoint / resume: persist post-ingest hit tensors so the graph phase
can re-run without re-parsing PAFs (SURVEY.md §5 — the reference has no
checkpointing; runs are seconds-to-minutes, but at pangenome scale parsing
dominates re-runs and parameter sweeps).

Format: one .npz per dataset holding every genome's column arrays + exon
pools + the global gene/protein tables. Exact round-trip (dtype- and
order-preserving), so a resumed run is byte-identical to a fresh one.
"""
from __future__ import annotations

import json
from typing import List

import numpy as np

from ..core.data import DataSet, Genome, HitTable


def save_dataset(d: DataSet, path: str) -> None:
    arrs = {}
    meta = {
        "n_genome": d.n_genome,
        "gene_name": d.gene_name,
        "gene_len": d.gene_len,
        "gene_preferred": d.gene_preferred,
        "gene_included": d.gene_included,
        "gene_rep_pid": d.gene_rep_pid,
        "prot_name": d.prot_name,
        "prot_len": d.prot_len,
        "prot_gid": d.prot_gid,
        "prot_rep": d.prot_rep,
        "prot_n": d.prot_n,
        "prot_avg_score_adj": d.prot_avg_score_adj,
        "prot_max_score_ori": d.prot_max_score_ori,
        "ctg_id_order": list(d.ctg_id.keys()),
        "labels": [g.label for g in d.genomes],
        "ctg_names": [g.ctg_names for g in d.genomes],
    }
    for j, g in enumerate(d.genomes):
        for k, v in g.hits.cols.items():
            arrs["g%d_%s" % (j, k)] = v
        arrs["g%d_exon_os" % j] = g.exon_os
        arrs["g%d_exon_oe" % j] = g.exon_oe
        arrs["g%d_ctg_len" % j] = g.ctg_len
    arrs["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrs)


def load_dataset(path: str) -> DataSet:
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode())
    d = DataSet.new()
    d.gene_name = meta["gene_name"]
    d.gene_len = meta["gene_len"]
    d.gene_preferred = meta["gene_preferred"]
    d.gene_included = meta["gene_included"]
    d.gene_rep_pid = meta["gene_rep_pid"]
    d.prot_name = meta["prot_name"]
    d.prot_len = meta["prot_len"]
    d.prot_gid = meta["prot_gid"]
    d.prot_rep = meta["prot_rep"]
    d.prot_n = meta["prot_n"]
    d.prot_avg_score_adj = meta["prot_avg_score_adj"]
    d.prot_max_score_ori = meta["prot_max_score_ori"]
    d.gene_id = {n: i for i, n in enumerate(d.gene_name)}
    d.prot_id = {n: i for i, n in enumerate(d.prot_name)}
    d.ctg_id = {n: i for i, n in enumerate(meta["ctg_id_order"])}
    for j in range(meta["n_genome"]):
        hits = HitTable.empty(len(z["g%d_pid" % j]))
        for k in hits.cols:
            hits.set(k, z["g%d_%s" % (j, k)])
        g = Genome(meta["labels"][j], meta["ctg_names"][j],
                   z["g%d_ctg_len" % j], hits,
                   z["g%d_exon_os" % j], z["g%d_exon_oe" % j])
        d.genomes.append(g)
    return d
