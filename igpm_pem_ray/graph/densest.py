"""Densest subgraph — Charikar's greedy peel (approximating the
maximum average-degree subgraph within factor 2; Charikar, APPROX
2000): repeatedly remove the minimum-degree vertex and return the
intermediate vertex set with the highest edge/vertex density.  The
link-graph use is spam-farm / link-exchange core discovery (dense
blocks of mutually-linking hosts) and community seeding.

No reference analog (IGPM-PEM's closest is the single-k degree
threshold in gray_incremental.py:194); first-class here like kcore.

Strategy: driver peel on the simple edge set (one-at-a-time min-degree
heap with lazy deletion, O(E log V) — exact greedy order, so results
are deterministic with the (degree, vid) tie-break).  Same dense-
envelope caveat as ``kcore.core_numbers``: the per-block canon+unique
combiner bounds what reaches the driver to the simple edge set; beyond
that envelope run the peel on the k-core filtrate
(``kcore_membership`` keeps only the dense region, Dataset-resident)
first — the densest subgraph always lives inside the max-core.

Density comparisons are exact-rational (cross-multiplied integers);
the reported density_e6 is the repo's half-up fixed point.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray.data as rd

from igpm_pem_ray.graph.kcore import _canon_unique


def densest_subgraph(edges_ds, *, stats: dict | None = None):
    """-> Dataset (vid,) of the greedy densest subgraph's members
    (sorted); ``stats`` gains n_vertices / n_edges / density_e6."""
    pdf = edges_ds.select_columns(["src", "dst"]).map_batches(
        _canon_unique, batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas()
    empty = rd.from_arrow(pa.table({"vid": pa.array([], pa.int64())}))
    if not len(pdf):
        if stats is not None:
            stats.update({"n_vertices": 0, "n_edges": 0, "density_e6": 0})
        return empty
    pairs = np.unique(pdf[["src", "dst"]].to_numpy(), axis=0)
    vids = np.unique(pairs)
    V, E = len(vids), len(pairs)
    s = np.searchsorted(vids, pairs[:, 0])
    d = np.searchsorted(vids, pairs[:, 1])
    heads = np.concatenate([s, d])
    tails = np.concatenate([d, s])
    order = np.argsort(heads, kind="stable")
    heads, tails = heads[order], tails[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.add.at(indptr, heads + 1, 1)
    indptr = np.cumsum(indptr)
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64)

    # exact Charikar greedy: remove THE min-degree vertex (vid asc
    # tie-break) one at a time; best intermediate set by exact
    # rational density comparison e*Vb > eb*Vr
    alive = np.ones(V, dtype=bool)
    deg_cur = deg.copy()
    heap = [(int(deg[i]), int(i)) for i in range(V)]
    heapq.heapify(heap)
    e_rem, v_rem = E, V
    best = (E, V)               # density of the full graph
    best_removed = 0
    removal_order: list[int] = []
    while v_rem > 0:
        dk, u = heapq.heappop(heap)
        if not alive[u] or dk != deg_cur[u]:
            continue            # stale lazy entry
        removal_order.append(u)
        alive[u] = False
        e_rem -= int(deg_cur[u])
        v_rem -= 1
        for w in tails[indptr[u]:indptr[u + 1]]:
            if alive[w]:
                deg_cur[w] -= 1
                heapq.heappush(heap, (int(deg_cur[w]), int(w)))
        if v_rem and e_rem * best[1] > best[0] * v_rem:
            best = (e_rem, v_rem)
            best_removed = len(removal_order)
    members = np.ones(V, dtype=bool)
    members[removal_order[:best_removed]] = False
    out = vids[members]
    if stats is not None:
        stats.update({
            "n_vertices": int(best[1]), "n_edges": int(best[0]),
            "density_e6": int(np.floor(best[0] * 1e6 / best[1] + 0.5))
            if best[1] else 0})
    return rd.from_arrow(pa.table({"vid": np.sort(out).astype(np.int64)}))
