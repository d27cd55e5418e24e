"""Golden-file integration parity on the reference's C4/RCCX fixture.

The checked-in golden files were produced by the reference binary
(lh3/pangene v1.1-r231, gcc -O2) with the documented command (README.md:13);
byte-identical output is the acceptance gate (BASELINE.md north star).
"""
import io

import pytest

from pangene_tpu import pipeline
from pangene_tpu.cli import parse_args
from pangene_tpu.io import bed as bed_mod
from pangene_tpu.options import PgOpt


def run_capture(args, files):
    opt, fl, extras = parse_args(args + files)
    out = io.StringIO()
    pipeline.run(opt, fl, out=out, **extras)
    return out.getvalue()


def test_c4_gfa_bit_identical(c4_pafs, golden_dir):
    got = run_capture([], c4_pafs)
    assert got == (golden_dir / "C4.gfa").read_text()


@pytest.mark.parametrize("mode", ["raw", "flag", "walk"])
def test_c4_bed_parity(c4_pafs, golden_dir, mode):
    got = run_capture(["--bed=%s" % mode], c4_pafs)
    assert got == (golden_dir / ("C4.bed.%s" % mode)).read_text()


@pytest.mark.parametrize("name,args", [
    # options that actually change C4 output
    ("c1", ["-c", "1"]), ("p099", ["-p", "0.99"]), ("e097", ["-e", "0.97"]),
    ("D1kC0", ["-D", "1k", "-C", "0"]), ("Xc4", ["-X", "C4A,C4B"]),
    # no-op-on-C4 regressions (still assert the flag plumbing is benign)
    ("J", ["-J"]), ("S", ["-S"]), ("E", ["-E"]), ("F", ["-F"]),
    ("a2", ["-a", "2"]), ("p03", ["-p", "0.3"]), ("f09", ["-f", "0.9"]),
    ("orisc", ["--ori-sc"]),
])
def test_c4_option_parity(c4_pafs, golden_dir, name, args):
    got = run_capture(args, c4_pafs)
    assert got == (golden_dir / ("C4.%s.gfa" % name)).read_text()


def test_synth16_parity(golden_dir, tmp_path):
    """16-genome / 16k-record synthetic dataset (6310 GFA lines) vs the
    reference binary's output — exercises branch cutting, high-occ deletion
    and paralog shadowing far more than C4."""
    import gzip
    from pangene_tpu.testing import synth_paf_files
    files = synth_paf_files(str(tmp_path), n_genome=16, n_gene=500, n_iso=3,
                            seed=42)
    got = run_capture([], files)
    want = gzip.open(golden_dir / "synth16.gfa.gz", "rt").read()
    assert got == want


def test_c4_cli_host_vec_engine(c4_pafs, golden_dir):
    """--engine host-vec is reachable from the CLI (it is the production
    fallback when no C compiler exists) and byte-identical on C4."""
    got = run_capture(["--engine", "host-vec"], c4_pafs)
    assert got == (golden_dir / "C4.gfa").read_text()
