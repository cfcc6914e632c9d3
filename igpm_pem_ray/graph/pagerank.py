"""PageRank / Random-Walk-with-Restart power iteration (kernel K1).

Reference semantics reproduced (SURVEY.md K1): the reference iterates
``p <- (1-c) * W * p + c * p0`` over a column-L1-normalized transition
matrix until the L1 residual drops below a threshold
(/root/reference/patternmatching/gray/rwr.py:132-190; restart c=0.7 at
gray_multiple.py:73, threshold 0.001 at rwr.py:15).  PageRank is the
same recurrence with c = 1-damping, uniform p0 and dangling-mass
redistribution; the north rule fixes damping-style iteration to an L1
residual < 1e-6.

Execution shape per iteration (all-to-all exchange is ONE groupby of
pre-aggregated partials):

    contrib = rank / outdeg                  (driver, O(V))
    ray.put(contrib)                         (broadcast once)
    edges.map_batches(combiner)              (gather-scatter, per-block
                                              sort+reduceat partials)
    groupby("dst").sum()                     (merge vertex messages)
    rank' = (1-d)*p0 + d*(msgs + dangling)   (driver, O(V))
    residual = ||rank' - rank||_1            (driver)

Checkpoint every ``checkpoint_every`` iterations via state/checkpoint
(per-partition lineage manifests); ``resume=True`` warm-starts from the
latest committed iteration with matching params.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, msg_pass
from igpm_pem_ray.state import checkpoint as ckpt


def pagerank_dense(g: DenseGraph, *, damping: float = 0.85, tol: float = 1e-6,
                   max_iters: int = 200, dangling: str = "redistribute",
                   p0: np.ndarray | None = None,
                   init_rank: np.ndarray | None = None,
                   checkpoint_dir: str | None = None, checkpoint_every: int = 5,
                   resume: bool = False, stats: dict | None = None) -> np.ndarray:
    """Power iteration on an already-materialized DenseGraph.

    dangling="redistribute": standard PageRank (mass of out-degree-0
    vertices spread uniformly).  dangling="drop": the reference's
    zero-column behavior (rwr.py:145-147) — mass leaks, matching RWR
    semantics exactly.
    """
    V = g.num_vertices
    if V == 0:
        return np.empty(0)
    params = {"kernel": "pagerank", "damping": damping, "tol": tol,
              "dangling": dangling, "V": V, "E": g.num_edges,
              "personalized": p0 is not None}
    base = np.full(V, 1.0 / V) if p0 is None else p0
    # warm start (incremental batch-dynamic path, SURVEY.md K7): start
    # from the previous step's converged vector instead of uniform
    rank = base.copy() if init_rank is None else np.asarray(init_rank, dtype=np.float64)
    start_iter = 0
    if resume and checkpoint_dir:
        found = ckpt.latest_checkpoint(checkpoint_dir, params)
        if found is not None:
            start_iter, _, rank, _ = found[0], found[1], found[2], found[3]
            rank = np.asarray(rank, dtype=np.float64)

    inv_out = np.zeros(V)
    nz = g.outdeg > 0
    inv_out[nz] = 1.0 / g.outdeg[nz]
    residual = float("inf")
    iters_run = 0
    t0 = time.perf_counter()
    for k in range(start_iter, max_iters):
        contrib = rank * inv_out
        new = msg_pass(g, contrib, reduce="sum", init=0.0)
        if dangling == "redistribute":
            new += rank[~nz].sum() / V
        new = (1.0 - damping) * base + damping * new
        residual = float(np.abs(new - rank).sum())
        rank = new
        iters_run = k + 1
        if checkpoint_dir and (iters_run % checkpoint_every == 0 or residual < tol):
            ckpt.save_vector(checkpoint_dir, iters_run, g.vids, rank,
                             metric_name="l1_residual", metric_value=residual,
                             params=params)
        if residual < tol:
            break
    if stats is not None:
        wall = time.perf_counter() - t0
        stats.update({
            "iterations": iters_run - start_iter, "total_iterations": iters_run,
            "residual": residual, "wall_sec": wall,
            "edges_per_sec": g.num_edges * max(1, iters_run - start_iter) / max(wall, 1e-9),
            "num_vertices": V, "num_edges": g.num_edges,
        })
    return rank


def pagerank(edges_ds, *, damping: float = 0.85, tol: float = 1e-6,
             max_iters: int = 200, dangling: str = "redistribute",
             checkpoint_dir: str | None = None, checkpoint_every: int = 5,
             resume: bool = False, stats: dict | None = None) -> pa.Table:
    """edges Dataset (src,dst raw vids) -> (vid, rank) Arrow table."""
    g = build_dense_graph(edges_ds)
    rank = pagerank_dense(g, damping=damping, tol=tol, max_iters=max_iters,
                          dangling=dangling, checkpoint_dir=checkpoint_dir,
                          checkpoint_every=checkpoint_every, resume=resume,
                          stats=stats)
    return pa.table({"vid": g.vids, "rank": rank})


def rwr(edges_ds, *, restart: float = 0.7, tol: float = 1e-3,
        max_iters: int = 200, source_vid=None, reverse: bool = False,
        stats: dict | None = None) -> pa.Table:
    """Reference-parity Random Walk with Restart.

    ``p <- (1-c) W p + c p0`` with W built as in the reference
    (rwr.py:133-147): adjacency of the reversed graph, column-L1
    normalized.  That composition is algebraically the *forward* flow —
    mass moves along each original edge src->dst with weight
    1/outdeg(src) — hence ``reverse=False`` here reproduces the
    reference transition.  No dangling redistribution (zero columns
    leak mass, rwr.py:145-147); L1 stop at ``tol`` (CONV_THRESHOLD,
    rwr.py:15).  ``source_vid=None`` -> uniform p0 (global proximity);
    otherwise one-hot personalization like the reference's per-seed
    vectors (rwr.py:183-190).
    """
    g = build_dense_graph(edges_ds, reverse=reverse)
    V = g.num_vertices
    p0 = None
    if source_vid is not None:
        sv = np.atleast_1d(np.asarray(source_vid, dtype=g.vids.dtype))
        pos = np.searchsorted(g.vids, sv)
        in_range = pos < V
        valid = in_range.copy()
        valid[in_range] = g.vids[pos[in_range]] == sv[in_range]
        if not valid.all():
            raise KeyError(
                f"rwr: source vid(s) not in the edge-derived vertex domain: "
                f"{sv[~valid][:5].tolist()}")
        p0 = np.zeros(V)
        p0[pos] = 1.0
    rank = pagerank_dense(g, damping=1.0 - restart, tol=tol, max_iters=max_iters,
                          dangling="drop", p0=p0, stats=stats)
    return pa.table({"vid": g.vids, "score": rank})
