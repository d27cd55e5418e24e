"""End-to-end pipeline driver mirroring the reference main flow
(main.c:117-138): read all PAFs (with per-genome filter postpass),
post-process, build graph, emit GFA/BED.

The per-genome compute stages are dispatched through an engine: "host"
(exact NumPy oracle) or "jax" (jit/vmap device pipeline, sharded over the
genome mesh axis when multiple devices are available).
"""
from __future__ import annotations

import sys
from typing import IO, List, Optional

from .core.data import DataSet, Genome
from .graph import build as build_mod
from .graph.graphdata import Graph
from .graph.post import post_process
from .io import bed as bed_mod
from .io import gfa_write
from .io import paf as paf_mod
from .options import (PG_F_WRITE_BED_FLAG, PG_F_WRITE_BED_RAW,
                      PG_F_WRITE_BED_WALK, PG_F_WRITE_NO_WALK, PgOpt)
from .ops import pseudo as pseudo_ops
from .ops import dispatch as sweep
from .ops.sort import hit_sort
from .util import log_msg


def read_postpass(opt: PgOpt, d: DataSet, g: Genome, n_tot: int) -> None:
    """Per-genome filter postpass run right after parsing one PAF
    (reference read.c:243-260)."""
    n_pseudo = pseudo_ops.flag_pseudo(d, g)
    h = g.hits
    h.flt[h.pseudo == 1] = 1
    hit_sort(g, by_cm=False)
    sweep.shadow(opt, d, g, cal_dom_sc=True)
    # snapshot read-time dominators, then reset (read.c:249-253)
    h.set("pid_dom0", h.pid_dom.copy())
    h.pid_dom[:] = -1
    h.shadow[:] = 0
    n_flt_ov_iso = sweep.flt_ov_isoform(opt, d, g)
    n_flt_chain = pseudo_ops.flt_chain_shadow(d, g)
    n_flt_subopt = pseudo_ops.flt_subopt_isoform(d, g)
    log_msg("pg_read_paf", "[%d] %s: %d hits parsed, %d kept and "
            "%d+%d+%d+%d filtered", d.n_genome - 1, g.label or "?",
            n_tot, g.n_hit, n_pseudo, n_flt_ov_iso, n_flt_chain, n_flt_subopt)


def _n_parse_workers(files: List[str]) -> int:
    """Parallel-parse worker count: PANGENE_PARSE_WORKERS, else one per
    available core (capped at 8 and at the file count); 0/1 = sequential.
    The reference is single-threaded — per-genome parsing is the
    embarrassingly parallel axis it never exploits (SURVEY §2.4(1))."""
    import os
    env = os.environ.get("PANGENE_PARSE_WORKERS")
    if env is not None:
        n = int(env)
    else:
        n = min(len(os.sched_getaffinity(0))
                if hasattr(os, "sched_getaffinity") else os.cpu_count() or 1,
                8)
    return min(n, len(files))


def read_all(opt: PgOpt, files: List[str]) -> DataSet:
    d = DataSet.new()
    n_workers = _n_parse_workers(files)
    if n_workers > 1 and opt.excl is None and "-" not in files:
        from .native import loader
        if loader.get_lib() is not None:
            return _read_all_parallel(opt, files, d, n_workers)
    for fn in files:
        g = paf_mod.read_paf(opt, d, fn)
        if g is None:
            continue
        read_postpass(opt, d, g, getattr(g, "_n_tot_records", g.n_hit))
    return d


def _read_all_parallel(opt: PgOpt, files: List[str], d: DataSet,
                       n_workers: int) -> DataSet:
    """Process-pool per-genome parsing: workers run the standalone native
    parser (zlib + tokenizing + CIGAR expansion + exact score_adj) with
    file-local ids; the driver merges results IN FILE ORDER so global
    interning order — and thus every downstream id, rank and tie order —
    is byte-identical to the sequential path. The per-genome filter
    postpass stays in the driver (it dispatches to host/device engines)."""
    import multiprocessing as mp
    import os
    import sys
    args = [(fn, opt.min_prot_ratio, opt.min_prot_iden,
             opt.score_adj_coef, opt.gene_delim) for fn in files
            if fn == "-" or os.path.exists(fn)]
    skipped = [fn for fn in files if fn != "-" and not os.path.exists(fn)]
    for fn in skipped:
        sys.stderr.write("[W::pg_read_paf] failed to open %r; skipped\n" % fn)
    ctx = mp.get_context("fork" if sys.platform != "win32" else "spawn")
    with ctx.Pool(n_workers) as pool:
        for (fn, *_), nat in zip(args, pool.imap(paf_mod.parse_worker, args,
                                                 chunksize=1)):
            if nat is None:   # native parser unavailable in the worker
                g = paf_mod.read_paf(opt, d, fn)
            else:
                g = paf_mod.merge_standalone(opt, d, fn, nat)
            if g is None:
                continue
            read_postpass(opt, d, g, getattr(g, "_n_tot_records", g.n_hit))
    return d


def run(opt: PgOpt, files: List[str], out: Optional[IO[str]] = None,
        save_hits: Optional[str] = None,
        load_hits: Optional[str] = None,
        profile: Optional[str] = None) -> Graph:
    """Full run; returns the final Graph (None graph fields if --bed=raw).

    save_hits/load_hits checkpoint the post-ingest per-genome hit tensors
    (SURVEY.md §5): a resumed run skips PAF parsing and the per-genome read
    postpass and is byte-identical to a fresh one as long as the
    read-phase options (-d/-e/-l/-m/-S/-X/-I/-P) are unchanged.
    """
    out = out or sys.stdout
    if profile:  # jax.profiler trace (device + host timelines)
        import jax
        jax.profiler.start_trace(profile)
    try:
        return _run_inner(opt, files, out, save_hits, load_hits)
    finally:
        if profile:
            import jax
            jax.profiler.stop_trace()
            log_msg("pg_profile", "trace written to %s", profile)


def _run_inner(opt, files, out, save_hits, load_hits) -> Graph:
    import time as _time
    from . import util
    util.stage_stats.clear()
    t0 = _time.monotonic()
    if load_hits:
        from .io.checkpoint import load_dataset
        d = load_dataset(load_hits)
        log_msg("pg_resume", "loaded %d genomes, %d genes, %d proteins from %s",
                d.n_genome, d.n_gene, d.n_prot, load_hits)
    else:
        d = read_all(opt, files)
    if save_hits:
        from .io.checkpoint import save_dataset
        save_dataset(d, save_hits)
        log_msg("pg_checkpoint", "saved post-ingest tensors to %s", save_hits)
    util.stage_stats["parse_s"] = round(_time.monotonic() - t0, 3)
    t0 = _time.monotonic()
    post_process(opt, d)
    util.stage_stats["post_s"] = round(_time.monotonic() - t0, 3)
    if opt.flag & PG_F_WRITE_BED_RAW:
        bed_mod.write_bed(d, is_walk=False, out=out)
        return Graph(d)
    q = Graph(d)
    t0 = _time.monotonic()
    build_mod.graph_gen(opt, q)
    util.stage_stats["graph_s"] = round(_time.monotonic() - t0, 3)
    t0 = _time.monotonic()
    if opt.flag & PG_F_WRITE_BED_WALK:
        bed_mod.write_bed(d, is_walk=True, out=out)
    elif opt.flag & PG_F_WRITE_BED_FLAG:
        bed_mod.write_bed(d, is_walk=False, out=out)
    else:
        gfa_write.write_graph(q, out)
        if not (opt.flag & PG_F_WRITE_NO_WALK):
            gfa_write.write_walk(q, out)
    util.stage_stats["emit_s"] = round(_time.monotonic() - t0, 3)
    return q
