"""End-to-end engine equivalence: the full pipeline (parse -> filters ->
15-round schedule -> GFA) must produce byte-identical output on the host
(native C), host-vec (NumPy) and host-ref (scalar oracle) engines.

This pins every native kernel (sweeps, branch marking, walk/dedupe/merge,
propagation, memo layers) against the pure-Python reference semantics on
corpora larger than the unit fuzzes."""
import io
import os

import pytest

from pangene_tpu import pipeline, util
from pangene_tpu.options import PgOpt
from pangene_tpu.testing import synth_paf_files


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("equiv")
    files = synth_paf_files(str(d), n_genome=6, n_gene=300, n_iso=3, seed=3)
    return sorted(str(p) for p in d.iterdir() if str(p).endswith(".paf.gz"))


def run_engine(files, engine, extra=None):
    util.verbose = 0
    opt = PgOpt(engine=engine)
    for k, v in (extra or {}).items():
        setattr(opt, k, v)
    out = io.StringIO()
    pipeline.run(opt, files, out=out)
    return out.getvalue()


@pytest.mark.parametrize("extra", [
    {},
    {"min_ov_ratio": 0.3},
    {"use_ori_for_branch_flag": True},
])
def test_host_engines_identical(corpus, extra):
    kw = {}
    if extra.get("use_ori_for_branch_flag"):
        from pangene_tpu.options import PG_F_ORI_FOR_BRANCH
        kw = {"flag": PgOpt().flag | PG_F_ORI_FOR_BRANCH}
    elif extra:
        kw = dict(extra)
    ref = run_engine(corpus, "host-ref", kw)
    vec = run_engine(corpus, "host-vec", kw)
    nat = run_engine(corpus, "host", kw)
    assert vec == ref
    assert nat == ref


def test_parallel_parse_identical(corpus, monkeypatch):
    """Process-pool per-genome parsing (pipeline._read_all_parallel) must be
    byte-identical to sequential parsing: file-order merging reproduces the
    global interning order exactly (read.c:151-200 side effects)."""
    seq = run_engine(corpus, "host")
    monkeypatch.setenv("PANGENE_PARSE_WORKERS", "3")
    par = run_engine(corpus, "host")
    assert par == seq
    # --bed=raw covers the per-record side-effect columns directly
    from pangene_tpu.options import PG_F_WRITE_BED_RAW
    kw = {"flag": PgOpt().flag | PG_F_WRITE_BED_RAW}
    monkeypatch.delenv("PANGENE_PARSE_WORKERS")
    seq = run_engine(corpus, "host", kw)
    monkeypatch.setenv("PANGENE_PARSE_WORKERS", "2")
    assert run_engine(corpus, "host", kw) == seq
