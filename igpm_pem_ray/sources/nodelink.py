"""Node-link JSON graph reader/writer (SURVEY.md S1/S5).

Reference analog: ``json.load`` + ``json_graph.node_link_graph``
(/root/reference/patternmatching/gray/incremental/query_call.py:24-33)
and the writer at load_edgelist.py:39-41.  Schema per the reference's
sample files: nodes ``{id, label[, score...]}``, links
``{source, target[, key], label[, add]}``.

Returns two Datasets (vertices, edges) instead of one in-memory graph
object; small graphs round-trip losslessly for the pattern-match parity
fixtures.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd


def load_node_link_json(path: str):
    """-> (vertices_ds, edges_ds).

    vertices: vid:int64, label:string, plus any numeric props (float64).
    edges: src:int64, dst:int64, key:int64, label:string, ts:int64
    (``add`` -> ts; missing -> 0, matching the reference's default of
    treating unstamped edges as the base graph).
    """
    with open(path) as fh:
        data = json.load(fh)

    prop_keys = sorted({k for n in data.get("nodes", []) for k in n
                        if k not in ("id", "label")})
    vcols: dict[str, list] = {"vid": [], "label": []}
    for p in prop_keys:
        vcols[p] = []
    for n in data.get("nodes", []):
        vcols["vid"].append(int(n["id"]))
        vcols["label"].append(str(n.get("label", "")))
        for p in prop_keys:
            v = n.get(p)
            vcols[p].append(float(v) if v is not None else None)
    vtable = pa.table({
        "vid": pa.array(vcols["vid"], type=pa.int64()),
        "label": pa.array(vcols["label"], type=pa.string()),
        **{p: pa.array(vcols[p], type=pa.float64()) for p in prop_keys},
    })

    ecols = {"src": [], "dst": [], "key": [], "label": [], "ts": []}
    for e in data.get("links", []):
        ecols["src"].append(int(e["source"]))
        ecols["dst"].append(int(e["target"]))
        ecols["key"].append(int(e.get("key", 0)))
        ecols["label"].append(str(e.get("label", "")))
        ecols["ts"].append(int(e.get("add", 0)))
    etable = pa.table({
        "src": pa.array(ecols["src"], type=pa.int64()),
        "dst": pa.array(ecols["dst"], type=pa.int64()),
        "key": pa.array(ecols["key"], type=pa.int64()),
        "label": pa.array(ecols["label"], type=pa.string()),
        "ts": pa.array(ecols["ts"], type=pa.int64()),
    })
    return rd.from_arrow(vtable), rd.from_arrow(etable)


def write_node_link_json(vertices_ds, edges_ds, path: str) -> str:
    """S5: Dataset pair -> node-link JSON (for small parity graphs)."""
    vt = vertices_ds.to_pandas()
    et = edges_ds.to_pandas()
    nodes = []
    prop_cols = [c for c in vt.columns if c not in ("vid", "label")]
    for _, r in vt.iterrows():
        n = {"id": int(r["vid"]), "label": r.get("label", "")}
        for p in prop_cols:
            if r[p] is not None and r[p] == r[p]:
                n[p] = float(r[p])
        nodes.append(n)
    links = []
    for _, r in et.iterrows():
        e = {"source": int(r["src"]), "target": int(r["dst"])}
        if "key" in et.columns:
            e["key"] = int(r["key"])
        if "label" in et.columns and r["label"]:
            e["label"] = str(r["label"])
        if "ts" in et.columns:
            e["add"] = int(r["ts"])
        links.append(e)
    with open(path, "w") as fh:
        json.dump({"directed": False, "multigraph": True, "graph": {},
                   "nodes": nodes, "links": links}, fh)
    return path
