"""Bow-tie decomposition of a directed graph (Broder et al.,
"Graph structure in the Web", WWW 2000).

Classes relative to the giant strongly connected component:
``0 = CORE`` (the largest SCC; ties broken by smallest SCC label),
``1 = IN`` (reaches the core but is not in it),
``2 = OUT`` (reachable from the core),
``3 = OTHER`` (tendrils, tubes and disconnected components — not
split further).  IN and OUT are provably disjoint outside the core
(membership in both implies mutual reachability with the core).

Execution shape: one SCC run (graph/scc.py trim+coloring kernel),
then two indicator reachability fixpoints over the SAME pinned dense
partitions — forward (``directions="out"``) for OUT, reverse
(``directions="in"``) for IN — each round one ``msg_pass(max)``.

The classic Common-Crawl / web-graph structural report; no reference
analog (SURVEY.md section 2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.dense import build_dense_graph, msg_pass
from igpm_pem_ray.graph.scc import strongly_connected_components

CORE, IN, OUT, OTHER = 0, 1, 2, 3


def bowtie(edges, *, stats: dict | None = None) -> pa.Table:
    """(vid, cls) bow-tie class per vertex of the directed edge
    Dataset."""
    scc_t = strongly_connected_components(edges)
    vids = scc_t["vid"].to_numpy()
    scc = scc_t["scc"].to_numpy()
    order = np.argsort(vids)
    vids, scc = vids[order], scc[order]
    labels, counts = np.unique(scc, return_counts=True)
    core_label = int(labels[np.lexsort((labels, -counts))[0]])
    g = build_dense_graph(edges, vids=vids)

    def reach_fixpoint(seed: np.ndarray, directions: str) -> np.ndarray:
        ind = seed.astype(np.int64)
        while True:
            nxt = np.maximum(ind, msg_pass(g, ind, reduce="max",
                                           init=np.int64(0),
                                           directions=directions))
            if np.array_equal(nxt, ind):
                return ind.astype(bool)
            ind = nxt

    core = scc == core_label
    out_reach = reach_fixpoint(core, "out")   # forward: core -> v
    in_reach = reach_fixpoint(core, "in")     # reverse: v -> core
    cls = np.full(len(vids), OTHER, dtype=np.int64)
    cls[in_reach] = IN
    cls[out_reach] = OUT
    cls[core] = CORE
    if stats is not None:
        stats.update({"core_label": core_label,
                      "n_core": int(core.sum()),
                      "n_in": int((cls == IN).sum()),
                      "n_out": int((cls == OUT).sum()),
                      "n_other": int((cls == OTHER).sum())})
    return pa.table({"vid": vids.astype(np.int64), "cls": cls})
