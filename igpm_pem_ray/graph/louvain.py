"""Synchronous greedy-modularity community detection (Louvain-style
local moving, one level, deterministic).

Reference analog: the recursive Louvain call that picks recompute
communities (/root/reference/patternmatching/gray/incremental/
query_call.py:130-177).  Classic Louvain's sequential vertex sweep is
order-dependent and unshardable; this kernel is the synchronous,
integer-exact variant: every vertex simultaneously moves to the
candidate community with the best modularity gain, computed from the
PREVIOUS round's assignment, with a deterministic tie-break — the same
design trade the LP kernel makes (labelprop.py), so the per-round
exchange is the identical packed (dst, neighbor-label) count pass and
the 10^12-V transport story carries over unchanged.

Score (all int64, no floats anywhere): for vertex v and candidate
community c (the communities of v's neighbors plus v's own),

    s(v, c) = 2m * k_{v,c} - deg(v) * (tot(c) - deg(v)*[c == c_t(v)])

which is the standard Louvain gain  k_{v,c}/m - deg(v)*tot(c\\v)/(2m^2)
scaled by the positive constant 2m^2 — argmax-equivalent, exact under
any reduction order, and SQL-expressible.  tot(c) = sum of degrees in
c under the previous assignment; the [c == c_t(v)] correction removes
v itself before measuring the destination, per the Louvain convention.
Ties break to the SMALLEST community label; a vertex whose best score
is its own community stays.  deg/tot/k are over the undirected simple
view (DISTINCT neighbor pairs), matching the DuckDB oracle
(pipelines/graph_queries.sql_louvain) bit for bit.

Candidate duplicates are harmless: the "stay" row (c_t(v), k=0) may
coexist with a genuine neighbor count (c_t(v), k>0); since 2m > 0 the
k>0 row always scores strictly higher, so no dedup pass is needed in
either engine.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, lp_count_pass

_LBL_BITS = 31
_MASK = (1 << _LBL_BITS) - 1


def _louvain_round(g: DenseGraph, labels: np.ndarray, deg: np.ndarray,
                   m2: int) -> np.ndarray:
    """One synchronous local-moving round; labels are dense indices."""
    V = g.num_vertices
    codes, counts = lp_count_pass(g, labels, lbl_bits=_LBL_BITS)
    # tot(c): int64-exact degree mass per community (no bincount —
    # its float64 weights would round above 2^53)
    tot = np.zeros(V, dtype=np.int64)
    np.add.at(tot, labels, deg)
    # candidates: neighbor communities (with counts) + the own-
    # community stay row at k=0 (duplicates never win; see module doc)
    v = np.concatenate([codes >> _LBL_BITS, np.arange(V, dtype=np.int64)])
    c = np.concatenate([codes & _MASK, labels])
    k = np.concatenate([counts, np.zeros(V, dtype=np.int64)])
    stay = labels[v] == c
    s = m2 * k - deg[v] * (tot[c] - np.where(stay, deg[v], 0))
    # deterministic argmax per vertex: order by (v asc, s desc, c asc)
    order = np.lexsort((c, -s, v))
    first = np.flatnonzero(np.r_[True, v[order][1:] != v[order][:-1]])
    new = labels.copy()
    new[v[order][first]] = c[order][first]
    return new


def louvain_communities_dense(g: DenseGraph, *, max_rounds: int = 20,
                              stats: dict | None = None) -> np.ndarray:
    """Dense fast path: labels as a V-vector of dense indices.  The
    per-round exchange (lp_count_pass) is partition-parallel; driver
    state is O(V) like the LP/PageRank dense kernels, with the same
    shuffle-sibling story at 10^12 V (shuffle_kernels.py K3 plan plus
    one (community, deg) groupby for tot)."""
    V = g.num_vertices
    labels = np.arange(V, dtype=np.int64)
    deg = np.asarray(g.outdeg, dtype=np.int64)  # symmetric build: undirected degree
    m2 = int(deg.sum())  # == 2m == number of directed dense edges
    t0 = time.perf_counter()
    rounds = 0
    for r in range(max_rounds):
        new = _louvain_round(g, labels, deg, m2)
        changed = int((new != labels).sum())
        labels = new
        rounds = r + 1
        if changed == 0:
            break
    if stats is not None:
        stats.update({"rounds": rounds, "wall_sec": time.perf_counter() - t0})
    return labels


def louvain_communities(edges_ds, *, max_rounds: int = 20,
                        stats: dict | None = None) -> pa.Table:
    """edges -> (vid, community), community = raw vid of the winning
    representative (dense index order == raw vid order: the vid domain
    is sorted ascending at build)."""
    g = build_dense_graph(edges_ds, symmetric=True)
    labels = louvain_communities_dense(g, max_rounds=max_rounds, stats=stats)
    return pa.table({"vid": g.vids, "community": np.asarray(g.vids)[labels]})
