"""Independent brute-force oracle for the `call` subcommand.

This is a SECOND implementation of the reference pangene.js `call`
semantics (pangene.js:937-979), written from the algorithm's definition
with none of tools/gfa.py's or tools/netgraph.py's machinery:

  * cycle-equivalence classes are computed by the DEFINITIONAL predicate
    (two edges are cycle equivalent iff they lie on exactly the same set
    of simple cycles: for non-bridges e1, e2 that holds iff e1 is a bridge
    in G - e2 and vice versa; all bridges share the empty cycle set,
    matching the reference's class 0 for tree edges not in cycles,
    pangene.js:723) instead of the Johnson bracket-list algorithm
    (pangene.js:640-735);
  * bubble enumeration, the generalized-bibubble test, nesting, walk
    projection and allele counting re-derive pangene.js:237-386 and
    836-930 step by step.

Class NUMBERING is algorithm-dependent (DFS discovery order) and cannot
be reproduced definitionally, so the oracle emits its own labels; tests
compare outputs after first-appearance renumbering of the cec column and
separately assert the seg->class PARTITIONS are identical.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

_RE_WALK = re.compile(r"([><])([^\s><]+)")
_MAX_EXT = 100


class OGfa:
    """Minimal GFA model mirroring pangene.js:93-230 parse semantics."""

    def __init__(self, text: str, sym: bool):
        self.names: List[str] = []
        self.name_id: Dict[str, int] = {}
        self.arcs: List[Tuple[int, int, int]] = []   # (v, w, rank)
        self.walks: List[Tuple[str, List[int]]] = []  # (asm, vertices)
        for line in text.split("\n"):
            t = line.split("\t")
            if line.startswith("S") and len(t) >= 3:
                self._sid(t[1])
            elif line.startswith("L") and len(t) >= 5 \
                    and t[2] in "+-" and t[4] in "+-":
                v = self._sid(t[1]) * 2 | (0 if t[2] == "+" else 1)
                w = self._sid(t[3]) * 2 | (0 if t[4] == "+" else 1)
                rank = -1
                for f in t[6:]:
                    m = re.match(r"^SR:i:(\S+)", f)
                    if m:
                        rank = int(m.group(1))
                self.arcs.append((v, w, rank))
            elif line.startswith("W") and len(t) >= 7:
                vs = [self.name_id[m.group(2)] * 2
                      | (0 if m.group(1) == ">" else 1)
                      for m in _RE_WALK.finditer(t[6])
                      if m.group(2) in self.name_id]
                self.walks.append((t[1] + "#" + t[2], vs))
        if sym:
            seen = {(v, w) for v, w, _ in self.arcs}
            for v, w, rank in list(self.arcs):
                key = (w ^ 1, v ^ 1)
                if key not in seen:
                    seen.add(key)
                    self.arcs.append((key[0], key[1], rank))
        self._index()

    def _sid(self, name: str) -> int:
        i = self.name_id.get(name)
        if i is None:
            i = len(self.names)
            self.name_id[name] = i
            self.names.append(name)
        return i

    def _index(self) -> None:
        n_vtx = 2 * len(self.names)
        self.arcs.sort(key=lambda a: a[0])           # stable, like JS sort
        self.idx = [(0, 0)] * n_vtx
        st = 0
        n = len(self.arcs)
        for i in range(1, n + 1):
            if i == n or self.arcs[i][0] != self.arcs[st][0]:
                self.idx[self.arcs[st][0]] = (st, i - st)
                st = i
        for v in range(n_vtx):                       # rank-0 arc first
            off, nv = self.idx[v]
            i0 = -1
            for i in range(nv):
                if self.arcs[off + i][2] == 0:
                    i0 = i
            if i0 > 0:
                self.arcs[off], self.arcs[off + i0] = \
                    self.arcs[off + i0], self.arcs[off]

    def succ(self, v: int) -> List[int]:
        off, n = self.idx[v]
        return [self.arcs[off + i][1] for i in range(n)]


# ---------------------------------------------------------------------------
# cycle equivalence, definitionally
# ---------------------------------------------------------------------------

def _net_nodes(g: OGfa) -> List[int]:
    """end_cat: connected components of link edges (v^1, w)
    (pangene.js:468-504); every GFA vertex gets a category."""
    n_vtx = 2 * len(g.names)
    par = list(range(n_vtx))

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for v, w, _ in g.arcs:
        a, b = find(v ^ 1), find(w)
        if a != b:
            par[a] = b
    cat = {}
    out = []
    for v in range(n_vtx):
        r = find(v)
        if r not in cat:
            cat[r] = len(cat)
        out.append(cat[r])
    return out


def seg_classes(g: OGfa) -> List[Optional[int]]:
    """Per segment: its cycle-equivalence class id (oracle labels), or
    None for a net self-loop (the reference leaves cec == -1 there)."""
    cat = _net_nodes(g)
    n_node = max(cat) + 1 if cat else 0
    edges = []                                       # (node_a, node_b, seg)
    self_loop = [False] * len(g.names)
    for i in range(len(g.names)):
        a, b = cat[2 * i], cat[2 * i + 1]
        if a == b:
            self_loop[i] = True
        else:
            edges.append((a, b, i))

    def connected_without(skip: set) -> List[int]:
        """Component id per node with edges in `skip` removed."""
        comp = [-1] * n_node
        adj: List[List[int]] = [[] for _ in range(n_node)]
        for k, (a, b, _) in enumerate(edges):
            if k not in skip:
                adj[a].append(b)
                adj[b].append(a)
        c = 0
        for s in range(n_node):
            if comp[s] >= 0:
                continue
            stack = [s]
            comp[s] = c
            while stack:
                x = stack.pop()
                for y in adj[x]:
                    if comp[y] < 0:
                        comp[y] = c
                        stack.append(y)
            c += 1
        return comp

    def is_bridge(k: int, extra_skip: int = -1) -> bool:
        comp = connected_without({k, extra_skip} if extra_skip >= 0
                                 else {k})
        a, b, _ = edges[k]
        return comp[a] != comp[b]

    E = len(edges)
    bridge = [is_bridge(k) for k in range(E)]
    # union-find over cycle-equivalent pairs
    par = list(range(E))

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for i in range(E):
        if bridge[i]:
            continue
        for j in range(i + 1, E):
            if bridge[j]:
                continue
            # e_i ~ e_j iff neither lies on a cycle avoiding the other
            if _bridge_in_minus(edges, n_node, i, j) \
                    and _bridge_in_minus(edges, n_node, j, i):
                a, b = find(i), find(j)
                if a != b:
                    par[a] = b
    labels: Dict[object, int] = {}
    out: List[Optional[int]] = [None] * len(g.names)
    for k, (_, _, seg) in enumerate(edges):
        key = "B" if bridge[k] else find(k)
        if key not in labels:
            labels[key] = len(labels)
        out[seg] = labels[key]
    return out


def _bridge_in_minus(edges, n_node, i, j) -> bool:
    """Is edge i a bridge in G - edge j (i.e., no cycle through i avoids j)?"""
    adj: List[List[int]] = [[] for _ in range(n_node)]
    for k, (a, b, _) in enumerate(edges):
        if k != i and k != j:
            adj[a].append(b)
            adj[b].append(a)
    ai, bi, _ = edges[i]
    comp = [-1] * n_node
    stack = [ai]
    comp[ai] = 0
    while stack:
        x = stack.pop()
        for y in adj[x]:
            if comp[y] < 0:
                comp[y] = 0
                stack.append(y)
    return comp[bi] < 0


# ---------------------------------------------------------------------------
# bubbles (pangene.js:237-386), walks and alleles (836-930)
# ---------------------------------------------------------------------------

def _undirected_neighbor(g: OGfa, v: int) -> List[int]:
    a = []
    for w in g.succ(v):
        a.append(w)
        for u in g.succ(w ^ 1):
            if u != (v ^ 1):
                a.append(u)
    # JS Array.sort default = string comparison (pangene.js:300)
    a.sort(key=str)
    out = []
    for x in a:
        if not out or out[-1] != x:
            out.append(x)
    return out


def _traverse_bubble(g, vs, ve, flag, f, max_n):
    """pangene.js:236-256; returns None on escape/overflow (the JS returns
    [], which its caller treats identically to a legitimately-empty list)."""
    stack = [vs]
    lst = []
    flag[vs] = f
    while stack:
        v = stack.pop()
        for w in g.succ(v):
            if w == (vs ^ 1):
                continue
            if w == (ve ^ 1):
                return None
            if flag[w] != f:
                flag[w] = f
                if w == ve:
                    continue
                if flag[w ^ 1] != f:
                    lst.append(w >> 1)
                stack.append(w)
        if len(lst) > max_n:
            break
    return None if len(lst) > max_n else lst


def _get_bubble_id(g, vs, ve, flag, f, max_n):
    n2 = 2 * len(g.names)
    f_for, f_rev = f, f + n2
    lf = _traverse_bubble(g, vs, ve, flag, f_for, max_n)
    if lf is None:
        return []
    lr = _traverse_bubble(g, ve ^ 1, vs ^ 1, flag, f_rev, max_n)
    if lr is None or len(lf) != len(lr):
        return []
    if sum(1 for s in lf
           if flag[s << 1] == f_rev or flag[s << 1 | 1] == f_rev) != len(lf):
        return []
    for s in lf:
        for rev in (0, 1):
            for w in g.succ(s << 1 | rev):
                if flag[w] != f_for and flag[w] != f_rev:
                    return []
    return lf


def call_oracle(text: str, sym: bool, max_ext: int = _MAX_EXT) -> List[str]:
    """The `call` output lines (BB/AL/// records), with the cec column
    carrying the ORACLE's class labels (compare after renumbering)."""
    g = OGfa(text, sym)
    cls = seg_classes(g)
    n_vtx = 2 * len(g.names)
    flag1 = [-1] * n_vtx
    flag2 = [-1] * n_vtx
    f1 = f2 = 0
    bb = []
    for vs in range(n_vtx):
        cec = cls[vs >> 1]
        if cec is None or g.idx[vs][1] == 0:
            continue
        if g.idx[vs][1] == 1:
            w = g.arcs[g.idx[vs][0]][1] ^ 1
            if g.idx[w][1] < 2:
                continue
        queue = [vs]
        ve = []
        ext = 0
        flag1[vs] = f1
        while queue:
            v = queue.pop(0)
            for w in _undirected_neighbor(g, v):
                if flag1[w] != f1:
                    if flag1[w ^ 1] != f1:
                        ext += 1
                    if w == (vs ^ 1):
                        continue
                    flag1[w] = f1
                    if cls[w >> 1] == cec:
                        ve.append(w)
                        continue
                    queue.append(w)
            if ext > max_ext:
                break
        for v_end in ve:
            r = _get_bubble_id(g, vs, v_end, flag2, f2, max_ext)
            if r and vs < v_end:
                bb.append({"cec": cec, "par": -1, "vs": vs, "ve": v_end,
                           "seg": r, "list": [g.names[s] for s in r]})
            f2 += 1
        f1 += 1

    # parent assignment by descending size (stable)
    aux = sorted(range(len(bb)), key=lambda i: -len(bb[i]["seg"]))
    flag3 = [-1] * len(g.names)
    for bid in aux:
        b = bb[bid]
        par = -2
        nested = True
        for s in b["seg"]:
            if par == -2:
                par = flag3[s]
            elif par != flag3[s]:
                nested = False
            flag3[s] = bid
        b["par"] = par if nested else -2

    # walks -> alleles (walk_ht + count_allele)
    if g.walks:
        st: List[List[Tuple[int, int, int]]] = [[] for _ in range(n_vtx)]
        en = [{"walk": -1, "a": []} for _ in range(n_vtx)]
        ht: List[List[Tuple[int, int, int, int]]] = [[] for _ in bb]
        for i, b in enumerate(bb):
            st[b["vs"]].append((b["ve"], i, 1))
            st[b["ve"] ^ 1].append((b["vs"] ^ 1, i, -1))
        for j, (_, vtx) in enumerate(g.walks):
            for i, v in enumerate(vtx):
                for (e_end, bid, ori) in st[v]:
                    e = en[e_end]
                    if e["walk"] != j:
                        e["walk"] = j
                        e["a"] = []
                    e["a"].append((i, bid, ori))
                if en[v]["walk"] != j:
                    continue
                for (st_off, bid, ori) in en[v]["a"]:
                    ht[bid].append((j, st_off, i, ori))
        for i, b in enumerate(bb):
            gene_seen = {}
            gene_list = []
            for (wj, so, eo, ori) in ht[i]:
                vtx = g.walks[wj][1]
                for k in range(so + 1, eo):
                    s = vtx[k] >> 1
                    if s not in gene_seen:
                        gene_seen[s] = 1
                        gene_list.append(g.names[s])
            b["n_gene"] = len(gene_list)
            b["gene"] = []
            b["al"] = []
            if len(gene_list) > max_ext:
                continue
            b["gene"] = gene_list
            al: Dict[str, dict] = {}
            for (wj, so, eo, ori) in ht[i]:
                vtx = g.walks[wj][1]
                if ori > 0:
                    a = [vtx[k] for k in range(so, eo + 1)]
                else:
                    a = [vtx[k] ^ 1 for k in range(eo, so - 1, -1)]
                key = ",".join(str(x) for x in a)
                if key not in al:
                    al[key] = {"a": a, "asm": []}
                al[key]["asm"].append(g.walks[wj][0])
            b["al"] = sorted(
                ({"n": len(v["asm"]), "a": v["a"], "asm": v["asm"]}
                 for v in al.values()), key=lambda x: -x["n"])

    # print_bb (pangene.js:906-930)
    out = []
    orient = "><"
    for i, b in enumerate(bb):
        vs, ve = b["vs"], b["ve"]
        s1 = orient[vs & 1] + g.names[vs >> 1]
        s2 = orient[ve & 1] + g.names[ve >> 1]
        if "al" in b:
            gene = b["gene"]
            gl = str(b["n_gene"]) if not gene \
                else "%d\t%s" % (len(gene), ",".join(gene))
            if len(b["al"]) < 2:
                continue
            out.append("BB\t%d\t%d\t%s\t%s\t%s\t%d\t%s"
                       % (i, b["par"], b["cec"], s1, s2, len(b["al"]), gl))
            for alx in b["al"]:
                walk = "".join(orient[v & 1] + g.names[v >> 1]
                               for v in alx["a"])
                out.append("AL\t%d\t%s\t%s"
                           % (alx["n"], walk, ",".join(alx["asm"])))
            out.append("//")
        else:
            out.append("BB\t%d\t%d\t%s\t%s\t%s\t-1\t%d\t%s"
                       % (i, b["par"], b["cec"], s1, s2,
                          len(b["list"]), ",".join(b["list"])))
    return out
