"""Weighted single-source shortest paths (bounded-hop Bellman-Ford)
on the undirected view of an edge Dataset.

Reference context: the reference's G-Ray neighborhood expansion walks
hop-bounded paths (/root/reference/patternmatching/gray/gray_multiple.py
bridge search); this is the standalone weighted whole-graph kernel the
reference lacks — per-vertex cheapest-path weight from one source,
paths capped at ``n_iters`` hops so the result is well-defined on any
graph and matches an unrolled SQL relaxation exactly.

Edge weights are a deterministic pure function of the RAW endpoint
vids — ``w(u, v) = 1 + (u + v) mod WEIGHT_MOD`` — symmetric (depends
on the sum), strictly positive, and integer, so the kernel, the
Dataset-resident sibling (shuffle_kernels.sssp_shuffle) and the DuckDB
oracle all compute bit-identical int64 distances under ANY reduction
order with no weight column materialized anywhere.

Plan: the dense fast-path substrate (graph/dense.py) — distance vector
on the driver (V-bounded, V < 2^31 asserted at build), one custom
gather+reduceat relaxation per round over the pinned per-partition
preps, flowing BOTH directions so the directed edge table is walked
undirected without symmetrizing.  Unlike bfs_levels the message is
``dist[src] + w(src, dst)`` (per-edge weight reconstructed in the
task from the partition's own vid arrays — nothing extra shipped),
so msg_pass's value-gather alone can't express it.  Early-stops when
a round changes nothing; capped at ``n_iters`` rounds to match the
oracle's unrolled relaxation depth.  The V-unbounded family member is
``shuffle_kernels.sssp_shuffle`` (same relaxation with (vid, dist)
state rows).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph

WEIGHT_MOD = 7          # w(u,v) = 1 + (u+v) % WEIGHT_MOD  in [1, 7]
_UNREACHED = np.int64(1) << 40  # survives +max-weight per round


def edge_weights(src_vids: np.ndarray, dst_vids: np.ndarray) -> np.ndarray:
    """The shared deterministic weight convention (int64, symmetric)."""
    return 1 + (src_vids.astype(np.int64) + dst_vids.astype(np.int64)) % WEIGHT_MOD


@ray.remote
def _relax_fwd(prep: dict, vids, dist):
    """One weighted relaxation over a forward (dst-sorted) partition:
    min over in-edges of dist[src] + w(src,dst), returned as the
    partition's dense dst-range slice."""
    if prep["n_edges"] == 0:
        return 0, None
    src = prep["src_sorted"]
    seg_len = np.diff(np.r_[prep["bounds"], len(src)])
    dst = prep["dst_uniq"].repeat(seg_len)
    cand = dist[src] + edge_weights(vids[src], vids[dst])
    seg = np.minimum.reduceat(cand, prep["bounds"])
    lo = prep["lo"]
    out = np.full(prep["hi"] - lo + 1, _UNREACHED, dtype=np.int64)
    out[prep["dst_uniq"] - lo] = seg
    return lo, out


@ray.remote
def _relax_rev(prep: dict, vids, dist):
    """The reversed flow (dst -> src messages) over a reverse prep."""
    if prep["n"] == 0:
        return 0, None
    gathered = prep["gather"]           # dst dense ids in src-sorted order
    seg_len = np.diff(np.r_[prep["bounds"], len(gathered)])
    src = prep["uniq"].repeat(seg_len)  # src dense ids per edge
    cand = dist[gathered] + edge_weights(vids[gathered], vids[src])
    seg = np.minimum.reduceat(cand, prep["bounds"])
    lo = prep["lo"]
    out = np.full(prep["hi"] - lo + 1, _UNREACHED, dtype=np.int64)
    out[prep["uniq"] - lo] = seg
    return lo, out


def sssp_dense(g: DenseGraph, source: int, *, n_iters: int = 8,
               stats: dict | None = None) -> np.ndarray:
    """Dense-index distance array (``_UNREACHED`` where no <=n_iters-hop
    path exists).  ``source`` is a RAW vid."""
    V = g.num_vertices
    dist = np.full(V, _UNREACHED, dtype=np.int64)
    pos = np.searchsorted(g.vids, source)
    if pos >= V or g.vids[pos] != source:
        raise ValueError(f"source vid {source} not in graph")
    dist[pos] = 0
    vref = ray.put(g.vids.astype(np.int64))
    t0 = time.perf_counter()
    rounds = 0
    for _ in range(n_iters):
        dref = ray.put(dist)
        futs = [_relax_fwd.remote(p, vref, dref) for p in g.partitions()]
        if not g.symmetric:
            futs += [_relax_rev.remote(p, vref, dref)
                     for p in g.partitions_rev()]
        new = dist.copy()
        for lo, seg in ray.get(futs):
            if seg is not None:
                view = new[lo:lo + len(seg)]
                view[:] = np.minimum(view, seg)
        rounds += 1
        if np.array_equal(new, dist):
            break
        dist = new
    if stats is not None:
        stats.update({"rounds": rounds,
                      "reached": int((dist < _UNREACHED).sum()),
                      "wall_sec": time.perf_counter() - t0})
    return dist


def sssp(edges_ds, source: int | None = None, *, n_iters: int = 8,
         stats: dict | None = None) -> pa.Table:
    """edges Dataset (src, dst raw vids) -> (vid, dist) for every
    vertex with a <=``n_iters``-hop undirected weighted path from
    ``source`` (default: smallest vid — deterministic).  Sorted by
    vid; distances are exact int64."""
    g = build_dense_graph(edges_ds)
    if g.num_vertices == 0:
        return pa.table({"vid": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
    if source is None:
        source = int(g.vids[0])
    dist = sssp_dense(g, source, n_iters=n_iters, stats=stats)
    m = dist < _UNREACHED
    return pa.table({"vid": g.vids[m].astype(np.int64),
                     "dist": dist[m].astype(np.int64)})
