"""k-truss decomposition — the edge analog of k-core.

An edge belongs to the k-truss iff it participates in >= k-2
triangles inside the k-truss subgraph; ``truss(e)`` is the largest k
for which e survives.  Computed by support peeling: enumerate
triangles on the degeneracy-oriented graph, drop edges below the
support threshold, repeat to fixpoint, then raise k (Cohen 2008).

Execution envelope: like `graph/kcore.core_numbers`, the peel runs on
driver numpy arrays over the distributed-built simple edge table (the
cascade is a tight data-dependent loop; V+E driver arrays are the
same envelope the dense kernels already assume).  All per-round work
is vectorized: the wedge expansion is the repeat/offset trick (no
per-vertex Python), triangle closure is a searchsorted against the
packed oriented edge set, and support is one bincount over edge ids.

No reference analog (SURVEY.md section 2); k-truss is the standard
cohesive-subgraph operator for community cores at web scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _collect_simple_edges(edges_ds) -> np.ndarray:
    """Distinct canonical (a < b) pairs as an (E, 2) int64 array
    (distributed canon + distinct; self-loops dropped)."""
    from ray.data.aggregate import Count

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"src": np.minimum(s, d), "dst": np.maximum(s, d)})

    pdf = edges_ds.map_batches(canon, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"]).to_pandas()
    if len(pdf) == 0:  # empty groupby output is COLUMN-less
        return np.empty((0, 2), dtype=np.int64)
    return np.stack([pdf["src"].to_numpy().astype(np.int64),
                     pdf["dst"].to_numpy().astype(np.int64)], axis=1)


def _edge_supports(a: np.ndarray, b: np.ndarray, vids: np.ndarray):
    """Per-edge triangle support of the simple graph given by
    canonical dense pairs (a < b are dense indices).  Returns int64[E].
    Degeneracy-style orientation by (degree, vid) rank bounds the
    wedge expansion."""
    E = len(a)
    V = len(vids)
    deg = np.bincount(a, minlength=V) + np.bincount(b, minlength=V)
    rank = np.empty(V, dtype=np.int64)
    rank[np.lexsort((np.arange(V), deg))] = np.arange(V)
    # orient each edge low-rank -> high-rank
    flip = rank[a] > rank[b]
    u = np.where(flip, b, a)
    w = np.where(flip, a, b)
    # oriented CSR sorted by (u, rank(w)) — neighbor lists rank-sorted
    order = np.lexsort((rank[w], u))
    u_s, w_s = u[order], w[order]
    # edge id per oriented position = original edge index
    eid_s = np.arange(E)[order]
    indptr = np.searchsorted(u_s, np.arange(V + 1))
    # wedge expansion: position p (edge u->v) pairs v with every LATER
    # neighbor of u (higher rank) — repeat/offset trick, no Python loop
    end_of_u = indptr[u_s + 1]
    rem = end_of_u - np.arange(E) - 1
    total = int(rem.sum())
    support = np.zeros(E, dtype=np.int64)
    if total == 0:
        return support
    first = np.repeat(np.arange(E), rem)
    offs = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem)
    second = first + 1 + offs
    v_w = w_s[first]   # lower-rank wedge tip
    w_w = w_s[second]  # higher-rank wedge tip
    # close the wedge: is (v_w, w_w) an oriented edge?
    packed = (rank[u_s].astype(np.int64) << 31) | rank[w_s]
    pk_sorted = np.sort(packed)
    pk_order = np.argsort(packed, kind="stable")
    key = (rank[v_w].astype(np.int64) << 31) | rank[w_w]
    pos = np.searchsorted(pk_sorted, key)
    pos = np.minimum(pos, len(pk_sorted) - 1)
    hit = pk_sorted[pos] == key
    # support increments for the three edges of each found triangle
    e_uv = eid_s[first[hit]]
    e_uw = eid_s[second[hit]]
    e_vw = eid_s[pk_order[pos[hit]]]
    np.add.at(support, e_uv, 1)
    np.add.at(support, e_uw, 1)
    np.add.at(support, e_vw, 1)
    return support


def truss_numbers(edges_ds) -> pa.Table:
    """(src, dst, truss): the largest k such that the edge survives
    k-truss peeling (truss >= 2 for every edge; triangle-free edges
    get exactly 2)."""
    pairs = _collect_simple_edges(edges_ds)
    if len(pairs) == 0:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "truss": pa.array([], pa.int64())})
    vids = np.unique(pairs)
    a = np.searchsorted(vids, pairs[:, 0])
    b = np.searchsorted(vids, pairs[:, 1])
    E = len(a)
    truss = np.full(E, 2, dtype=np.int64)
    alive = np.arange(E)
    k = 3
    while len(alive):
        # peel at level k to fixpoint (edges dropped at ANY round of
        # this level keep their previous truss value k-1; survivors
        # are only labeled AFTER the fixpoint — a mid-level label
        # would stick to edges dropped in a later round)
        while True:
            sup = _edge_supports(a[alive], b[alive], vids)
            drop = sup < k - 2
            if not drop.any():
                break
            alive = alive[~drop]
            if len(alive) == 0:
                break
        if len(alive):
            truss[alive] = k
            k += 1
    return pa.table({"src": vids[a].astype(np.int64),
                     "dst": vids[b].astype(np.int64),
                     "truss": truss})
