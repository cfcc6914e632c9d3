"""DAG analytics: topological layering (longest-path level).

``layer(v) = 0`` for sources (no in-edges); otherwise
``1 + max(layer(u) for u -> v)`` — the canonical parallel scheduling
depth / topological generation number.  Computed by iterating
``msg_pass(max)`` over the forward direction until fixpoint: layers
only grow, each round finalizes at least one more generation, so the
round count equals the DAG depth (the critical-path length).

Rejects cyclic inputs: on a cycle the level would exceed V - 1, which
the kernel detects and raises (a Dataset-scale cycle check for free).

The canonical co-occurrence edge table (src < dst) is a DAG by
construction, which is what the SQL oracle runs on.

No reference analog (SURVEY.md section 2); layering is the standard
batch-scheduling primitive for dependency graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, msg_pass


def topological_layers(edges, *, max_rounds: int | None = None,
                       stats: dict | None = None) -> pa.Table:
    """(vid, layer) for every vertex of a DAG edge table (raw vids);
    raises ValueError on a cycle."""
    g = edges if isinstance(edges, DenseGraph) else build_dense_graph(edges)
    V = g.num_vertices
    if V == 0:
        return pa.table({"vid": pa.array([], pa.int64()),
                         "layer": pa.array([], pa.int64())})
    layer = np.zeros(V, dtype=np.int64)
    limit = max_rounds if max_rounds is not None else V
    rounds = 0
    for _ in range(limit + 1):
        # candidate = 1 + max over in-edges of the sender's layer
        incoming = msg_pass(g, layer, reduce="max", init=np.int64(-1))
        new = np.maximum(layer, incoming + 1)
        if np.array_equal(new, layer):
            break
        layer = new
        rounds += 1
        if layer.max() > V - 1:
            raise ValueError("cycle detected: layer exceeds V-1")
    else:
        if max_rounds is None:
            raise ValueError("cycle detected: no fixpoint after V rounds")
    if stats is not None:
        stats.update({"rounds": rounds, "depth": int(layer.max())})
    return pa.table({"vid": g.vids.astype(np.int64), "layer": layer})
