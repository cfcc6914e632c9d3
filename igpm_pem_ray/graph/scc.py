"""Strongly connected components — the directed companion of WCC
(kernel K2 family).  The reference only ever computes WEAK components
(/root/reference/patternmatching/gray/rwr.py:26,56-61); on a web link
graph the directed structure (giant SCC + IN/OUT tendrils, the
Broder et al. 2000 "bow-tie") needs SCC proper.

Algorithm: trim + forward-coloring + backward-reach ("coloring" SCC,
Orzan 2004 / Slota-Rajamanickam-Madduri 2014 — public), expressed on
the repo's dense message-passing substrate (`graph/dense.py`), i.e.
every sweep is one `msg_pass` = per-partition gather+reduceat tasks
over pinned Arrow blocks + a driver merge:

1. **Trim**: iteratively assign vertices with zero in- or out-degree
   within the active set (their SCC is trivially themselves).  On
   web-shaped graphs this peels the IN/OUT tendrils, which is most of
   the non-giant-SCC mass.
2. **Forward min-coloring**: color[v] = min active vid that reaches v,
   propagated along out-edges to fixpoint (reduce=min sweeps).
   Inactive vertices carry +inf so they transmit no-ops — removing an
   SCC never changes the remaining SCCs (a cycle through a removed
   vertex would put it in the same SCC, contradiction).
3. **Backward reach, all colors in parallel**: roots are v with
   color[v]==v; u joins if some out-neighbor w is reached with
   color[w]==color[u].  Because forward coloring guarantees
   color[w] <= color[u] along u->w, a reduce=max over
   (reached ? color : -1) equals color[u] IFF such a neighbor exists
   — one sweep per BFS level, no per-color loop.
4. Assign reached vertices scc=color (the MIN raw vid in the SCC —
   same deterministic label convention as WCC), deactivate, re-trim,
   repeat while any vertex is active.

Scale notes: driver state is O(V) int64/bool arrays (the dense-kernel
family envelope, V < 2^31 asserted at build); every sweep is a full
O(E) distributed pass with no shuffle (partition-local reduceat +
disjoint-slice merge).  Outer rounds = number of SCC "levels" peeled;
worst case O(V) on a path-of-cycles, typically a handful on web
graphs after trimming.  The Dataset-resident analog for V beyond
driver arrays would follow `shuffle_kernels.py` (state as a (vid,
color, reached) Dataset, two joins + groupby per sweep).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, msg_pass

_INF = np.iinfo(np.int64).max


def _trim(g: DenseGraph, active: np.ndarray, scc: np.ndarray,
          idx: np.ndarray) -> int:
    """Peel zero in-/out-degree (within active) vertices; own-vid SCC.
    Returns the number of vertices trimmed."""
    n = 0
    while True:
        a64 = active.astype(np.int64)
        # active in-neighbor count lands at dst; out-count at src.
        indeg = msg_pass(g, a64, reduce="sum", init=0, directions="out")
        outdeg = msg_pass(g, a64, reduce="sum", init=0, directions="in")
        trim = active & ((indeg == 0) | (outdeg == 0))
        if not trim.any():
            return n
        scc[trim] = idx[trim]
        active[trim] = False
        n += int(trim.sum())


def strongly_connected_components_dense(g: DenseGraph, *,
                                        stats: dict | None = None
                                        ) -> np.ndarray:
    """Dense per-vertex SCC labels (root = min dense index in the SCC;
    vids are sorted at build, so min index == min raw vid)."""
    V = g.num_vertices
    idx = np.arange(V, dtype=np.int64)
    scc = np.full(V, -1, dtype=np.int64)
    active = np.ones(V, dtype=bool)
    t0 = time.perf_counter()
    sweeps = 0
    rounds = 0
    trimmed = _trim(g, active, scc, idx)
    while active.any():
        rounds += 1
        # 1. forward min-coloring to fixpoint
        color = np.where(active, idx, _INF)
        while True:
            sweeps += 1
            msgs = msg_pass(g, color, reduce="min", init=_INF,
                            directions="out")
            new = np.where(active, np.minimum(color, msgs), color)
            if np.array_equal(new, color):
                break
            color = new
        # 2. backward reach from roots, all colors at once
        reached = active & (color == idx)
        while True:
            sweeps += 1
            vals = np.where(reached, color, np.int64(-1))
            msgs = msg_pass(g, vals, reduce="max", init=np.int64(-1),
                            directions="in")
            newly = active & ~reached & (msgs == color)
            if not newly.any():
                break
            reached |= newly
        # 3. assign + peel
        scc[reached] = color[reached]
        active[reached] = False
        trimmed += _trim(g, active, scc, idx)
    if stats is not None:
        stats.update({"rounds": rounds, "sweeps": sweeps,
                      "trimmed": trimmed, "num_vertices": V,
                      "num_edges": g.num_edges,
                      "wall_sec": time.perf_counter() - t0})
    return scc


def strongly_connected_components(edges_ds, *,
                                  stats: dict | None = None) -> pa.Table:
    """Directed edges (src,dst raw vids) -> (vid, scc) with scc = min
    raw vid in the strongly connected component (exact-match
    testable, same convention as `connected_components`)."""
    g = build_dense_graph(edges_ds)
    labels = strongly_connected_components_dense(g, stats=stats)
    return pa.table({"vid": g.vids, "scc": g.vids[labels]})
