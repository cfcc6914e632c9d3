"""Unweighted single-source BFS levels (hop distance) on the
undirected view of an edge Dataset.

Reference context: the reference walks seed neighborhoods breadth-
first when growing G-Ray matches (/root/reference/patternmatching/
gray/gray_multiple.py bridge/seed expansion); this is the standalone
whole-graph kernel — per-vertex hop distance from one source.

Plan: the dense fast-path substrate (graph/dense.py) — distance
vector on the driver (V-bounded, V < 2^31 asserted at build), one
``msg_pass(min)`` exchange per round over the pinned per-partition
preps, flowing BOTH directions so the directed edge table is walked
undirected without materializing its symmetrization.  Early-stops
when a round changes nothing (diameter+1 rounds total).  The
V-unbounded Dataset-resident family for this recurrence is
``shuffle_kernels.connected_components_shuffle`` (same min-exchange
shape with (vid, dist) state rows); BFS differs only in seeding and
the +1 per hop.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, msg_pass

_UNREACHED = np.int64(1) << 40  # sentinel: survives +1 per round without overflow


def bfs_levels_dense(g: DenseGraph, source: int, *, max_depth: int = 32,
                     stats: dict | None = None) -> np.ndarray:
    """Dense-index level array (``_UNREACHED`` where not reached
    within ``max_depth`` hops).  ``source`` is a RAW vid."""
    V = g.num_vertices
    dist = np.full(V, _UNREACHED, dtype=np.int64)
    pos = np.searchsorted(g.vids, source)
    if pos >= V or g.vids[pos] != source:
        raise ValueError(f"source vid {source} not in graph")
    dist[pos] = 0
    directions = "out" if g.symmetric else "both"
    t0 = time.perf_counter()
    rounds = 0
    for _ in range(max_depth):
        msgs = msg_pass(g, dist, reduce="min", init=_UNREACHED,
                        directions=directions)
        new = np.minimum(dist, msgs + 1)
        rounds += 1
        if np.array_equal(new, dist):
            break
        dist = new
    if stats is not None:
        stats.update({"rounds": rounds,
                      "reached": int((dist < _UNREACHED).sum()),
                      "wall_sec": time.perf_counter() - t0})
    return dist


def bfs_levels(edges_ds, source: int | None = None, *, max_depth: int = 32,
               stats: dict | None = None) -> pa.Table:
    """edges Dataset (src, dst raw vids) -> (vid, level) for every
    vertex reached from ``source`` within ``max_depth`` undirected
    hops.  ``source`` defaults to the smallest vid in the graph
    (deterministic).  Sorted by vid."""
    g = build_dense_graph(edges_ds)
    if g.num_vertices == 0:
        return pa.table({"vid": pa.array([], pa.int64()),
                         "level": pa.array([], pa.int64())})
    if source is None:
        source = int(g.vids[0])
    dist = bfs_levels_dense(g, source, max_depth=max_depth, stats=stats)
    m = dist < _UNREACHED
    return pa.table({"vid": g.vids[m].astype(np.int64),
                     "level": dist[m].astype(np.int64)})
