"""Connected components via min-label propagation (kernel K2).

Reference semantics: ``nx.weakly_connected_components`` — edge
direction ignored — used to scope all RWR work
(/root/reference/patternmatching/gray/rwr.py:26,56-61) and for
load-balancing (parallel/gray_mp.py:172-178).  Output: every vertex
labeled with the minimum raw vid of its component (exact-match
criterion per the north rule).

Execution: symmetrized dense edge Dataset (both directions stored once,
at build time); each round is one broadcast of the label array + one
pre-aggregated ``groupby("dst").min()`` message shuffle; converges when
no label changes (changed-count aggregate == 0).  Rounds are bounded by
graph diameter; SURVEY.md section 7.4 notes pointer-jumping as the
scale path for high-diameter graphs.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, msg_pass
from igpm_pem_ray.state import checkpoint as ckpt


def connected_components_dense(g: DenseGraph, *, max_rounds: int = 10_000,
                               checkpoint_dir: str | None = None,
                               checkpoint_every: int = 10,
                               resume: bool = False,
                               stats: dict | None = None) -> np.ndarray:
    """Works on either build: a symmetric graph exchanges along stored
    edges; a directed graph exchanges BOTH ways per round (reverse
    preps — half the materialized edges, same WCC labels).  Returns the
    per-vertex dense label array; map through g.vids for raw ids."""
    directions = "out" if g.symmetric else "both"
    V = g.num_vertices
    labels = np.arange(V, dtype=np.int64)
    params = {"kernel": "wcc", "V": V, "E": g.num_edges}
    start_round = 0
    if resume and checkpoint_dir:
        found = ckpt.latest_checkpoint(checkpoint_dir, params)
        if found is not None:
            start_round, _, labels, _ = found
            labels = np.asarray(labels, dtype=np.int64)
    t0 = time.perf_counter()
    rounds = start_round
    for k in range(start_round, max_rounds):
        msgs = msg_pass(g, labels, reduce="min", init=np.iinfo(np.int64).max,
                        directions=directions)
        new = np.minimum(labels, msgs)
        changed = int((new != labels).sum())
        labels = new
        rounds = k + 1
        if checkpoint_dir and (rounds % checkpoint_every == 0 or changed == 0):
            ckpt.save_vector(checkpoint_dir, rounds, g.vids, labels,
                             metric_name="changed", metric_value=changed,
                             params=params)
        if changed == 0:
            break
    if stats is not None:
        stats.update({"rounds": rounds, "wall_sec": time.perf_counter() - t0,
                      "num_vertices": V, "num_edges": g.num_edges})
    return labels


def connected_components(edges_ds, *, max_rounds: int = 10_000,
                         checkpoint_dir: str | None = None, resume: bool = False,
                         stats: dict | None = None) -> pa.Table:
    """edges (src,dst raw vids) -> (vid, component) with component =
    min raw vid in the component (deterministic, exact-match testable).

    Builds the DIRECTED dense graph (half the rows of a symmetrized
    build) and exchanges both directions per round via reverse preps."""
    g = build_dense_graph(edges_ds)
    labels = connected_components_dense(g, max_rounds=max_rounds,
                                        checkpoint_dir=checkpoint_dir,
                                        resume=resume, stats=stats)
    return pa.table({"vid": g.vids, "component": g.vids[labels]})


DENSE_CC_MAX_EDGES = 20_000_000


def components_auto(edges_ds, *, n_edges: int | None = None,
                    stats: dict | None = None):
    """(vid, component) as a DATASET, strategy chosen by edge count:
    the dense fast kernel while the graph fits driver V-arrays, the
    Dataset-resident ``connected_components_shuffle`` above (round-2
    verdict item #4 — dup-graph closures must not assume the pair
    graph is small)."""
    import ray.data as rd

    from igpm_pem_ray.graph.shuffle_kernels import connected_components_shuffle

    if n_edges is None:
        n_edges = edges_ds.count()
    if n_edges <= DENSE_CC_MAX_EDGES:
        if stats is not None:
            stats["strategy"] = "dense"
        return rd.from_arrow(connected_components(edges_ds, stats=stats))
    return connected_components_shuffle(edges_ds, stats=stats)


def component_sizes(components: pa.Table) -> pa.Table:
    """(component, size) — reference's WCC-size statistics
    (gray_incremental.py:92-96, rl_model.py:134-140)."""
    import pyarrow.compute as pc

    counts = components.group_by("component").aggregate([("vid", "count")])
    return counts.rename_columns(["component", "size"])
