"""-X/-I/-P gene-list parsing: "STR" comma/space lists or "@FILE"
(reference pg_read_list, read.c:265-303)."""
from __future__ import annotations

import gzip
import re
from typing import Set


def read_list(o: str) -> Set[str]:
    names: Set[str] = set()
    if not o.startswith("@"):
        for tok in re.split(r"[,\s\t]+", o):
            if tok:
                names.add(tok)
    else:
        opener = gzip.open if o[1:].endswith(".gz") else open
        with opener(o[1:], "rt") as fp:
            for line in fp:
                tok = line.split()[0] if line.split() else ""
                names.add(tok)
    return names
