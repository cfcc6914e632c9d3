"""HITS hubs & authorities (fixed-iteration, L1-normalized) on a
directed edge Dataset.

Reference context: the reference's vertex-importance signal is RWR
(/root/reference/patternmatching/gray/rwr.py); HITS is the companion
web-link-analysis kernel a link-graph user expects next to PageRank —
hub(u) = sum of auth over u's out-neighbors, auth(v) = sum of hub
over v's in-neighbors.

Semantics pinned for the SQL oracle: per iteration
    a_k  = normalize_L1(A^T h_{k-1})      (auth from in-edges)
    h_k  = normalize_L1(A a_k)            (hub from out-edges)
with h_0 = 1/V.  L1 (sum) normalization instead of the textbook L2:
sqrt is not bit-stable across engines, while the e8 fixed-point
rounding (pipelines.common.scale_col / sql_scale) absorbs the ~1e-16
relative float-order noise of distributed sums exactly as it does for
PageRank.  Rankings are identical to the L2 variant (positive scalar
rescaling).

Plan: dense fast-path substrate — two ``msg_pass`` exchanges per
iteration over the pinned partition preps (forward for auth, the
reverse preps for hub; no symmetrized edge set is ever materialized),
O(V) driver vectors, V < 2^31 asserted at build.  The V-unbounded
Dataset-resident analog is the ``shuffle_kernels.pagerank_shuffle``
family (same join+groupby recurrence with two message directions).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, msg_pass


def hits_dense(g: DenseGraph, *, n_iters: int = 5,
               stats: dict | None = None) -> tuple[np.ndarray, np.ndarray]:
    """(hub, auth) dense float64 arrays after ``n_iters`` exchanges."""
    if g.symmetric:
        raise ValueError("HITS is a directed kernel: build the graph "
                         "with symmetric=False")
    V = g.num_vertices
    t0 = time.perf_counter()
    hub = np.full(V, 1.0 / V if V else 0.0)
    auth = np.zeros(V)
    for _ in range(n_iters):
        araw = msg_pass(g, hub, reduce="sum", init=0.0, directions="out")
        z = araw.sum()
        auth = araw / z if z > 0 else araw
        hraw = msg_pass(g, auth, reduce="sum", init=0.0, directions="in")
        z = hraw.sum()
        hub = hraw / z if z > 0 else hraw
    if stats is not None:
        stats.update({"iterations": n_iters,
                      "wall_sec": time.perf_counter() - t0})
    return hub, auth


def hits(edges_ds, *, n_iters: int = 5,
         stats: dict | None = None) -> pa.Table:
    """edges Dataset (src, dst raw vids) -> (vid, hub, auth) float64,
    sorted by vid."""
    g = build_dense_graph(edges_ds)
    hub, auth = hits_dense(g, n_iters=n_iters, stats=stats)
    return pa.table({"vid": g.vids.astype(np.int64),
                     "hub": hub, "auth": auth})
