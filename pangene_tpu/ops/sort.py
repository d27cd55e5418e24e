"""Hit sorting.

The reference buckets hits by contig id then LSD-radix-sorts each bucket by
cs or cm with stable tie order (hit.c:29-64). A stable lexicographic sort on
(cid, key) is the same permutation; NumPy lexsort / JAX lax.sort(is_stable)
provide it directly.
"""
from __future__ import annotations

import numpy as np

from ..core.data import Genome


def hit_sort_perm(cid: np.ndarray, key: np.ndarray) -> np.ndarray:
    """Stable (cid, key) sort permutation."""
    return np.lexsort((key, cid))


def hit_sort(g: Genome, by_cm: bool) -> None:
    """In-place sort of a genome's hits (reference pg_hit_sort, hit.c:29-64)."""
    key = g.hits.cm if by_cm else g.hits.cs
    perm = hit_sort_perm(g.hits.cid, key)
    g.hits.permute(perm)
