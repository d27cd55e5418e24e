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
        "gene_len": np.asarray(d.gene_len).tolist(),
        "gene_preferred": np.asarray(d.gene_preferred).tolist(),
        "gene_included": np.asarray(d.gene_included).tolist(),
        "gene_rep_pid": np.asarray(d.gene_rep_pid).tolist(),
        "prot_name": d.prot_name,
        "prot_len": np.asarray(d.prot_len).tolist(),
        "prot_gid": np.asarray(d.prot_gid).tolist(),
        "prot_rep": np.asarray(d.prot_rep).tolist(),
        "prot_n": np.asarray(d.prot_n).tolist(),
        "prot_avg_score_adj": np.asarray(d.prot_avg_score_adj).tolist(),
        "prot_max_score_ori": np.asarray(d.prot_max_score_ori).tolist(),
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
    d.gene_len = np.asarray(meta["gene_len"], np.int64)
    d.gene_preferred = np.asarray(meta["gene_preferred"], np.uint8)
    d.gene_included = np.asarray(meta["gene_included"], np.uint8)
    d.gene_rep_pid = np.asarray(meta["gene_rep_pid"], np.int64)
    d.prot_name = meta["prot_name"]
    d.prot_len = np.asarray(meta["prot_len"], np.int64)
    d.prot_gid = np.asarray(meta["prot_gid"], np.int32)
    d.prot_rep = np.asarray(meta["prot_rep"], np.uint8)
    d.prot_n = np.asarray(meta["prot_n"], np.int64)
    d.prot_avg_score_adj = np.asarray(meta["prot_avg_score_adj"], np.int64)
    d.prot_max_score_ori = np.asarray(meta["prot_max_score_ori"], np.int32)
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
