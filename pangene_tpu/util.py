"""Timers and stderr logging in the reference's format.

Every stage logs "[M::func::<wall>*<cpu%>]" lines gated by a verbosity level
(reference sys.c:95-138, pgpriv.h:60-64). Keeping the same discipline makes
graph-quality regressions diffable against reference stderr output.
"""
from __future__ import annotations

import os
import resource
import sys
import time

verbose = 3

# Coarse wall-clock of the most recent pipeline.run, keyed by stage
# (parse/post_process/graph/emit, plus phase1_host when the device loop
# ran). Reset at the start of each run; consumed by scripts/tpu_gate.py's
# utilization breakdown and bench.py's sharded line.
stage_stats: dict = {}

_t0 = time.monotonic()
_cpu0 = time.process_time()


def realtime() -> float:
    return time.monotonic() - _t0


def cputime() -> float:
    return time.process_time() - _cpu0


def peakrss() -> float:
    """Peak RSS in bytes."""
    ru = resource.getrusage(resource.RUSAGE_SELF)
    mult = 1024 if sys.platform != "darwin" else 1
    return ru.ru_maxrss * mult


def percent_cpu() -> float:
    rt = realtime()
    return 100.0 * cputime() / rt if rt > 0 else 0.0


def timestamp() -> str:
    return f"{realtime():.3f}*{percent_cpu() / 100.0:.2f}"


def log_msg(func: str, fmt: str, *args, min_verbose: int = 3,
            with_ts: bool = True) -> None:
    if verbose < min_verbose:
        return
    msg = fmt % args if args else fmt
    if with_ts:
        sys.stderr.write(f"[M::{func}::{timestamp()}] {msg}\n")
    else:
        sys.stderr.write(f"[M::{func}] {msg}\n")
