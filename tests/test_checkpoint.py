"""Checkpoint/resume: a resumed run must be byte-identical to a fresh one,
including graph-phase parameter sweeps on the resumed tensors."""
import io

from pangene_tpu import pipeline
from pangene_tpu.options import PgOpt


def test_save_resume_roundtrip(c4_pafs, golden_dir, tmp_path):
    ckpt = str(tmp_path / "hits.npz")
    out1 = io.StringIO()
    pipeline.run(PgOpt(), c4_pafs, out=out1, save_hits=ckpt)
    assert out1.getvalue() == (golden_dir / "C4.gfa").read_text()
    out2 = io.StringIO()
    pipeline.run(PgOpt(), [], out=out2, load_hits=ckpt)
    assert out2.getvalue() == out1.getvalue()
    # graph-phase sweep on resumed tensors
    out3 = io.StringIO()
    pipeline.run(PgOpt(max_avg_occ=1), [], out=out3, load_hits=ckpt)
    assert out3.getvalue() == (golden_dir / "C4.c1.gfa").read_text()


def test_resume_cross_engine_and_options(tmp_path):
    """A checkpoint written once must reproduce byte-identical output under
    a fresh parse, a resumed run, a resumed run with different graph-phase
    options, and a resumed run on the sharded engine (pipeline.py contract:
    only read-phase options are baked into the tensors)."""
    import io

    from pangene_tpu.testing import synth_paf_files
    corpus = tmp_path / "c"
    synth_paf_files(str(corpus), n_genome=6, n_gene=120, n_iso=2, seed=21)
    files = sorted(str(p) for p in corpus.iterdir()
                   if str(p).endswith(".paf.gz"))
    ckpt = str(tmp_path / "hits.npz")
    fresh = io.StringIO()
    pipeline.run(PgOpt(), files, out=fresh, save_hits=ckpt)
    resumed = io.StringIO()
    pipeline.run(PgOpt(), [], out=resumed, load_hits=ckpt)
    assert resumed.getvalue() == fresh.getvalue()
    # graph-phase sweep on resumed tensors == fresh run with same options
    fresh2 = io.StringIO()
    pipeline.run(PgOpt(max_degree=4, branch_diff=0.01), files, out=fresh2)
    res2 = io.StringIO()
    pipeline.run(PgOpt(max_degree=4, branch_diff=0.01), [], out=res2,
                 load_hits=ckpt)
    assert res2.getvalue() == fresh2.getvalue()
    # resumed + sharded engine == fresh host
    res3 = io.StringIO()
    pipeline.run(PgOpt(engine="sharded"), [], out=res3, load_hits=ckpt)
    assert res3.getvalue() == fresh.getvalue()
