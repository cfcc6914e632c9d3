"""Independent pure-Python / dense-numpy oracles for kernel parity tests.

Deliberately written in a different style from the engine (dense
matrices, dicts, union-find) so agreement is meaningful — this mirrors
SURVEY.md section 5's test plan (NetworkX is not in this container, so
these stand in for the nx oracles with the same published semantics).
"""

from __future__ import annotations

import numpy as np


def pagerank_oracle(edges: list[tuple[int, int]], vids: list[int], *,
                    damping: float = 0.85, tol: float = 1e-6,
                    max_iters: int = 200, dangling: str = "redistribute") -> dict[int, float]:
    """Dense-matrix power iteration, same spec as the engine."""
    idx = {v: i for i, v in enumerate(sorted(vids))}
    V = len(idx)
    A = np.zeros((V, V))
    for s, d in edges:
        A[idx[d], idx[s]] += 1.0
    out = A.sum(axis=0)
    P = np.divide(A, out, out=np.zeros_like(A), where=out > 0)
    p = np.full(V, 1.0 / V)
    base = np.full(V, 1.0 / V)
    for _ in range(max_iters):
        new = P @ p
        if dangling == "redistribute":
            new += p[out == 0].sum() / V
        new = (1 - damping) * base + damping * new
        if np.abs(new - p).sum() < tol:
            p = new
            break
        p = new
    return {v: p[i] for v, i in idx.items()}


def rwr_oracle(edges: list[tuple[int, int]], vids: list[int], *,
               restart: float = 0.7, tol: float = 1e-3,
               source: int | None = None, max_iters: int = 500) -> dict[int, float]:
    """Literal transcription of the reference formula: W = column-L1-
    normalized adjacency of the REVERSED graph; p <- (1-c) W p + c p0
    (/root/reference/patternmatching/gray/rwr.py:133-190)."""
    order = sorted(vids)
    idx = {v: i for i, v in enumerate(order)}
    V = len(idx)
    # nx adjacency convention: A[i, j] = weight of edge i->j.  The
    # reference builds the REVERSED graph's adjacency — reversed edge
    # (d, s) for each original (s, d) — column-L1-normalizes it
    # (axis=0), and iterates M.dot(p).
    Arev = np.zeros((V, V))
    for s, d in edges:
        Arev[idx[d], idx[s]] += 1.0
    colsum = Arev.sum(axis=0)
    M = np.divide(Arev, colsum, out=np.zeros_like(Arev), where=colsum > 0)
    p0 = np.full(V, 1.0 / V)
    if source is not None:
        p0 = np.zeros(V)
        p0[idx[source]] = 1.0
    p = p0.copy()
    for _ in range(max_iters):
        new = (1 - restart) * (M @ p) + restart * p0
        if np.abs(new - p).sum() < tol:
            return {v: new[i] for v, i in idx.items()}
        p = new
    return {v: p[i] for v, i in idx.items()}


class _UF:
    def __init__(self, items):
        self.p = {x: x for x in items}

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def components_oracle(edges, vids) -> dict[int, int]:
    """Union-find; component label = min vid."""
    uf = _UF(vids)
    for s, d in edges:
        uf.union(s, d)
    # path-compress fully, then relabel by min member
    comp: dict[int, list[int]] = {}
    for v in vids:
        comp.setdefault(uf.find(v), []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def labelprop_oracle(edges, vids, *, max_rounds: int = 20) -> dict[int, int]:
    """Synchronous LP, most-frequent neighbor label, min tie-break,
    isolated vertices keep their label.  Same spec as the engine,
    dict-and-loop implementation."""
    from collections import Counter

    nbrs: dict[int, list[int]] = {v: [] for v in vids}
    for s, d in edges:
        nbrs[s].append(d)
        nbrs[d].append(s)
    labels = {v: v for v in vids}
    for _ in range(max_rounds):
        new = {}
        for v in vids:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in nbrs[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            return new
        labels = new
    return labels


def triangles_oracle(edges, vids) -> int:
    """Set-based exact count on the simple undirected graph (self loops
    and parallel edges dropped) — the reference's
    sum(nx.triangles)/3 semantics."""
    adj: dict[int, set[int]] = {v: set() for v in vids}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    # each triangle counted exactly once at its smallest vertex v with
    # ordered higher neighbors u < w
    count = 0
    for v in sorted(vids):
        hi = sorted(u for u in adj[v] if u > v)
        for i, u in enumerate(hi):
            for w in hi[i + 1:]:
                if w in adj[u]:
                    count += 1
    return count


def per_vertex_triangles_oracle(edges, vids) -> dict[int, int]:
    """nx.triangles-style per-vertex triangle map on the simple
    undirected graph."""
    adj: dict[int, set[int]] = {v: set() for v in vids}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    count = {v: 0 for v in vids}
    for v in sorted(vids):
        hi = sorted(u for u in adj[v] if u > v)
        for i, u in enumerate(hi):
            for w in hi[i + 1:]:
                if w in adj[u]:
                    count[v] += 1
                    count[u] += 1
                    count[w] += 1
    return count


def kcore_oracle(edges, vids) -> dict[int, int]:
    """Core number per vertex by naive repeated peeling (independent
    of the kernel's cascade formulation)."""
    adj: dict[int, set[int]] = {v: set() for v in vids}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    core = {v: 0 for v in vids}
    alive = {v: set(n) for v, n in adj.items()}
    k = 0
    while alive:
        removed = [v for v, n in alive.items() if len(n) <= k]
        if not removed:
            k += 1
            continue
        for v in removed:
            core[v] = k
            for u in alive[v]:
                alive[u].discard(v)
            del alive[v]
    return core
