"""Hit sorting.

The reference buckets hits by contig id then LSD-radix-sorts each bucket by
cs or cm with stable tie order (hit.c:29-64). A stable lexicographic sort on
(cid, key) is the same permutation; NumPy lexsort / JAX lax.sort(is_stable)
provide it directly.

Coordinates (cid/cs/cm) are immutable after ingest, so the permutation
produced by a sort depends only on the table's current row ORDER, not on any
flag state. The pruning schedule re-sorts every genome cm->cs ~19 times with
identical coordinates; we therefore memoize permutations per (order-state,
key) on the genome. Order states are fingerprinted by the permutation-from-
base vector, so when the cm->cs round trip returns to a previously seen
ordering (the common case: it converges after at most one round) every later
sort is a dict lookup + gather, and identity sorts skip the gather entirely.
Bit-equivalence with always-re-sorting is structural: the cached perm IS the
lexsort that would have been computed for that ordering.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..core.data import Genome


def hit_sort_perm(cid: np.ndarray, key: np.ndarray) -> np.ndarray:
    """Stable (cid, key) sort permutation."""
    return np.lexsort((key, cid))


class _SortCache:
    """Per-genome memo of sort permutations keyed by order state."""

    __slots__ = ("state", "trans", "orders", "order_index", "next_tag",
                 "_ident_view")

    def __init__(self, n: int) -> None:
        self.state = 0
        self._ident_view = None
        base = np.arange(n, dtype=np.int32)
        self.orders: Dict[int, np.ndarray] = {0: base}
        self.order_index: Dict[bytes, int] = {base.tobytes(): 0}
        # (state, by_cm) -> (perm or None for identity, next_state)
        self.trans: Dict[Tuple[int, bool], Tuple[Optional[np.ndarray], int]] = {}
        self.next_tag = 1


def _get_cache(g: Genome) -> _SortCache:
    c = getattr(g, "_sort_cache", None)
    if c is None or len(c.orders[0]) != len(g.hits):
        c = _SortCache(len(g.hits))
        g._sort_cache = c  # type: ignore[attr-defined]
    return c


def cm_cycle_view(g: Genome):
    """If the cm->cs round trip from the current order state is a known
    cycle (state S --cm--> T --cs--> S, both transitions cached), return
    the cm-order index vector: gathering rows through it is bit-identical
    to physically sorting to cm, computing, and sorting back, because the
    two permutations compose to the identity (fingerprint-equal orders).
    Returns None when the cycle is not (yet) established; callers then do
    the physical round trip, which populates the cache for next round."""
    c = _get_cache(g)
    fwd = c.trans.get((c.state, True))
    if fwd is None:
        return None
    perm, t = fwd
    back = c.trans.get((t, False))
    if back is None or back[1] != c.state:
        return None
    if perm is not None:
        return perm
    # memoized identity: downstream caches (sweep_native walk-pack) key on
    # the view OBJECT identity, so a fresh arange per round would
    # spuriously invalidate them
    ident = getattr(c, "_ident_view", None)
    if ident is None or len(ident) != len(g.hits):
        ident = np.arange(len(g.hits), dtype=np.int64)
        c._ident_view = ident
    return ident


def hit_sort(g: Genome, by_cm: bool) -> None:
    """In-place sort of a genome's hits (reference pg_hit_sort, hit.c:29-64)."""
    c = _get_cache(g)
    ent = c.trans.get((c.state, by_cm))
    if ent is None:
        h = g.hits
        key = h.cm if by_cm else h.cs
        perm = hit_sort_perm(h.cid, key)
        n = len(perm)
        if n and perm[0] == 0 and np.array_equal(perm, np.arange(n)) or n == 0:
            ent = (None, c.state)
        else:
            order = c.orders[c.state][perm]
            fp = order.tobytes()
            nxt = c.order_index.get(fp)
            if nxt is None:
                nxt = c.next_tag
                c.next_tag += 1
                c.orders[nxt] = order
                c.order_index[fp] = nxt
            ent = (perm, nxt)
        c.trans[(c.state, by_cm)] = ent
    perm, nxt = ent
    if perm is not None:
        g.hits.permute(perm)
    c.state = nxt
