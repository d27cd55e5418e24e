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
