"""Betweenness centrality (Brandes), multi-source vectorized.

Brandes' algorithm (J. Math. Sociol. 2001) from a deterministic
sample of sources — the standard web-scale approximation
(Brandes-Pich 2007): betweenness is estimated as
``(V / |S|) * sum over sampled sources`` of the per-source dependency
accumulation; exact when S = all vertices.

Execution shape: S source columns ride (V, S) arrays through the SAME
pinned-partition exchanges as every other dense kernel —

- forward (BFS + path counting): one ``msg_pass(sum)`` per level over
  sigma masked to the current frontier; an edge (v, w) with
  dist[v] = d-1, dist[w] = d is a shortest-path DAG edge ⟺ the mask
  is just the distance array, so no predecessor lists are ever built.
- backward (dependency): one ``msg_pass(sum)`` per level of
  (1 + delta) / sigma masked to distance d, received only by vertices
  at d-1 and scaled by their own sigma.

Per chunk the state is O(V * S) floats; chunks of sources are
independent (fan-out-able, restartable) and the graph blocks are
pinned once.  The graph is treated as undirected via
``directions="both"`` exchanges (no symmetrized edge set), matching
graph/distance.py.

No reference analog (the reference computes no centrality beyond RWR
— SURVEY.md section 2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, msg_pass


# Coarse partitioning for the (V, S) array-exchange kernels: every
# pass ships the WHOLE value array to every partition task, so total
# traffic scales with the partition count, not the edge count — few
# big blocks beat the iterative kernels' 2-per-CPU default (measured
# 43s -> 16s on the sf0.1 bench graph at 8 blocks + 128-wide chunks).
# At cluster scale raise it just enough that a block's edges fit a
# worker; the per-task edge work is vectorized either way.
WIDE_KERNEL_BLOCKS = 8


def _as_simple_graph(edges) -> DenseGraph:
    """Shortest-path counting is a SIMPLE-graph notion: parallel edges
    (or a pair present in both orientations) would multiply sigma by
    edge multiplicity under the summed exchange.  Collapse to
    distinct canonical (min, max) pairs before the dense build; a
    DenseGraph passed directly is trusted to be simple already."""
    if isinstance(edges, DenseGraph):
        return edges
    from ray.data.aggregate import Count

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.minimum(s, d), "dst": np.maximum(s, d)})

    simple = edges.map_batches(canon, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"])
    return build_dense_graph(simple, target_blocks=WIDE_KERNEL_BLOCKS)


def betweenness(edges, *, sources: np.ndarray | None = None,
                sample_every: int | None = None,
                max_depth: int = 10_000,
                chunk_size: int = 128,
                checkpoint_dir: str | None = None,
                resume: bool = False) -> pa.Table:
    """(vid, betweenness_e6): Brandes dependency sums over ``sources``
    (RAW vids; default all vertices = exact betweenness), scaled by
    V/|S| when sampling, e6 fixed-point, endpoints excluded (the
    standard convention), undirected unnormalized.

    ``sample_every=k`` picks every k-th vertex of the sorted vid
    domain — deterministic, engine-independent.  ``max_depth`` caps
    BFS rounds (a safety bound, not an approximation on connected
    inputs).
    """
    g = _as_simple_graph(edges)
    V = g.num_vertices
    if V == 0:
        return pa.table({"vid": pa.array([], pa.int64()),
                         "betweenness_e6": pa.array([], pa.int64())})
    if sources is None:
        idx_sources = np.arange(V)
        if sample_every and sample_every > 1:
            idx_sources = idx_sources[::sample_every]
    else:
        sv = np.asarray(sources, dtype=g.vids.dtype)
        pos = np.searchsorted(g.vids, sv)
        ok = (pos < V)
        ok[ok] = g.vids[pos[ok]] == sv[ok]
        idx_sources = np.unique(pos[ok])
    S_total = len(idx_sources)
    accum = np.zeros(V, dtype=np.float64)
    if S_total == 0:
        return pa.table({"vid": g.vids.astype(np.int64),
                         "betweenness_e6": accum.astype(np.int64)})

    # per-source-chunk checkpoints (the chunk is the unit of both
    # parallelism and restart): iteration = chunks completed, state =
    # the running dependency accumulator (save_vector manifests)
    params = {"kernel": "betweenness", "max_depth": max_depth,
              "chunk_size": chunk_size, "V": V, "E": g.num_edges,
              "S": S_total}
    start_chunk = 0
    if resume and checkpoint_dir:
        from igpm_pem_ray.state import checkpoint as ckpt

        found = ckpt.latest_checkpoint(checkpoint_dir, params)
        if found is not None:
            start_chunk = found[0]
            accum = np.array(found[2], dtype=np.float64)  # writable copy

    INF = np.iinfo(np.int32).max
    n_chunks = (S_total + chunk_size - 1) // chunk_size
    for ci in range(start_chunk, n_chunks):
        start = ci * chunk_size
        chunk = idx_sources[start:start + chunk_size]
        S = len(chunk)
        dist = np.full((V, S), INF, dtype=np.int32)
        sigma = np.zeros((V, S), dtype=np.float64)
        dist[chunk, np.arange(S)] = 0
        sigma[chunk, np.arange(S)] = 1.0
        # forward: level-synchronous BFS with path counting
        depth = 0
        for d in range(1, max_depth + 1):
            contrib = np.where(dist == d - 1, sigma, 0.0)
            if not contrib.any():
                break
            incoming = msg_pass(g, contrib, reduce="sum", init=0.0,
                                directions="both")
            newly = (dist == INF) & (incoming > 0.0)
            if not newly.any():
                break
            dist[newly] = d
            sigma[newly] = incoming[newly]
            depth = d
        # backward: dependency accumulation, deepest level first
        delta = np.zeros((V, S), dtype=np.float64)
        for d in range(depth, 0, -1):
            at_d = dist == d
            coef = np.zeros((V, S))
            coef[at_d] = (1.0 + delta[at_d]) / sigma[at_d]
            msgs = msg_pass(g, coef, reduce="sum", init=0.0,
                            directions="both")
            at_prev = dist == d - 1
            delta[at_prev] += sigma[at_prev] * msgs[at_prev]
        # exclude the source's own row (delta[source] covers paths
        # STARTING there; Brandes sums over w != s only)
        delta[chunk, np.arange(S)] = 0.0
        accum += delta.sum(axis=1)
        if checkpoint_dir:
            from igpm_pem_ray.state import checkpoint as ckpt

            ckpt.save_vector(checkpoint_dir, ci + 1, g.vids, accum,
                             metric_name="chunks_done",
                             metric_value=float(ci + 1), params=params)

    # undirected double-count (each pair contributes from both
    # endpoints' source runs when S = all): the standard /2
    scale = (V / S_total) / 2.0
    bc = accum * scale
    return pa.table({"vid": g.vids.astype(np.int64),
                     "betweenness_e6": np.floor(bc * 1e6 + 0.5)
                     .astype(np.int64)})
