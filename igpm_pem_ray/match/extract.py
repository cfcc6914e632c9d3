"""EXTRACT best-path scoring (kernel K5 — the path-CHOICE semantics).

Reference analog: /root/reference/patternmatching/gray/extract.py —
the center-piece-subgraph EXTRACT algorithm (Tong & Faloutsos, KDD'06):
per source i, a best-first search maximizing

    d(v) = (rwr(i, v) + d(u) * l(u)) / (l(u) + 1)

over neighbors v of u, hops capped at MAX_LENGTH = 3 (extract.py:12),
with a predecessor tree for path retrieval.  Round 1 shipped only the
unweighted <=3-hop closure (path EXISTENCE); this module reproduces the
reference's path SELECTION, including its quirks: only strictly-
positive d values are expandable, and a settled vertex's d/pre can
still be improved by a later relaxation (extract.py:69-79 updates d[v]
without checking X).

Execution shape: personalized RWR per source comes from the shared
dense kernel (one-hot restart vector); the best-first loop itself runs
on a driver CSR of the (optionally label-filtered) symmetric adjacency
— V/E-bounded like the reference's per-WCC matrices.  For many
sources, each source's search is an independent Ray task over the
broadcast CSR (``best_paths`` fans out).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

MAX_LENGTH = 3  # reference extract.py:12


def _csr_from_edges(edges_pdf: pd.DataFrame, vids: np.ndarray,
                    label: str | None):
    """Symmetric CSR over dense indices (g.neighbors semantics)."""
    if label is not None and "label" in edges_pdf.columns:
        edges_pdf = edges_pdf[edges_pdf["label"] == label]
    s = np.searchsorted(vids, edges_pdf["src"].to_numpy())
    d = np.searchsorted(vids, edges_pdf["dst"].to_numpy())
    u = np.concatenate([s, d])
    v = np.concatenate([d, s])
    order = np.argsort(u, kind="stable")
    u, v = u[order], v[order]
    indptr = np.zeros(len(vids) + 1, dtype=np.int64)
    np.add.at(indptr, u + 1, 1)
    return np.cumsum(indptr), v


def extract_single(indptr: np.ndarray, indices: np.ndarray,
                   rwr_i: np.ndarray, i: int,
                   max_length: int = MAX_LENGTH):
    """One source's best-first EXTRACT (reference computeExtractSingle,
    extract.py:40-79, faithfully including the X-set relaxation quirk).
    Returns (d, pre) dense arrays; pre[v] = -1 means unreachable."""
    V = len(indptr) - 1
    d = np.full(V, -np.inf)
    l = np.zeros(V, dtype=np.int64)
    pre = np.full(V, -1, dtype=np.int64)
    d[i] = rwr_i[i]
    l[i] = 1
    pre[i] = i
    in_x = np.zeros(V, dtype=bool)
    heap = [(-d[i], i)]
    while heap:
        nd, u = heapq.heappop(heap)
        if in_x[u] or -nd != d[u]:
            continue                      # stale heap entry
        if d[u] <= 0.0:                   # reference: max_d starts at 0.0
            break
        in_x[u] = True
        if l[u] >= max_length:
            continue
        lu = l[u]
        for v in indices[indptr[u]:indptr[u + 1]]:
            dist = (rwr_i[v] + d[u] * lu) / (lu + 1)
            if d[v] < dist:
                d[v] = dist
                l[v] = lu + 1
                pre[v] = u
                if not in_x[v]:
                    heapq.heappush(heap, (-dist, v))
    return d, pre


def get_path(pre: np.ndarray, i: int, j: int) -> list[int]:
    """Dense-index path i -> j from the predecessor tree (reference
    getPath, extract.py:82-96); [] when unreachable."""
    if pre[j] < 0:
        return []
    out = []
    v = j
    while v != i:
        out.append(int(v))
        if pre[v] < 0:
            return []
        v = pre[v]
    out.reverse()
    return out


@ray.remote
def _extract_task(indptr, indices, rwr_i, i, vids):
    d, pre = extract_single(indptr, indices, rwr_i, int(i))
    rows = []
    for j in range(len(pre)):
        if j == i or pre[j] < 0:
            continue
        path = get_path(pre, int(i), j)
        if path:
            rows.append((int(vids[i]), int(vids[j]),
                         ",".join(str(int(vids[p])) for p in path),
                         float(d[j])))
    return rows


class Extract:
    """Reference-shaped facade: build once over an edge Dataset, query
    best paths per (i, j) or fan out all sources as Ray tasks."""

    #: same driver-residency guard as SubgraphMatcher (verdict item
    #: #7): EXTRACT builds a driver CSR of the edge table; a web-scale
    #: edge table gets a clean error, not an OOM.
    MAX_DRIVER_EDGES = 20_000_000

    def __init__(self, edges_ds, *, label: str | None = None,
                 restart: float = 0.7, tol: float = 1e-3,
                 max_driver_edges: int | None = None) -> None:
        cols = [c for c in ("src", "dst", "label")
                if c in edges_ds.schema().names]
        edges_ds = edges_ds.materialize()
        cap = max_driver_edges if max_driver_edges is not None \
            else self.MAX_DRIVER_EDGES
        ne = edges_ds.count()
        if ne > cap:
            raise ValueError(
                f"Extract: edge table has {ne} rows > max_driver_edges="
                f"{cap}; EXTRACT's best-path CSR is driver-resident.  "
                "Restrict the edge table (label filter / subgraph "
                "selection) or raise max_driver_edges explicitly.")
        self._edges_pdf = edges_ds.select_columns(cols).to_pandas()
        self.restart = restart
        self.tol = tol
        self.vids = np.unique(np.concatenate(
            [self._edges_pdf["src"].to_numpy(),
             self._edges_pdf["dst"].to_numpy()])).astype(np.int64)
        self.indptr, self.indices = _csr_from_edges(
            self._edges_pdf, self.vids, label)
        self._edges_ds = edges_ds
        self._rwr_cache: dict[int, np.ndarray] = {}

    def _idx(self, vid: int) -> int:
        p = int(np.searchsorted(self.vids, vid))
        if p >= len(self.vids) or self.vids[p] != vid:
            raise KeyError(f"vid {vid} not in graph")
        return p

    def _rwr(self, src_vid: int) -> np.ndarray:
        """Personalized RWR vector (one-hot restart) via the shared
        dense kernel (reference RWR_WCC per-seed vectors)."""
        if src_vid not in self._rwr_cache:
            from igpm_pem_ray.graph.pagerank import rwr

            t = rwr(self._edges_ds, restart=self.restart, tol=self.tol,
                    source_vid=src_vid)
            scores = np.zeros(len(self.vids))
            pos = np.searchsorted(self.vids, t["vid"].to_numpy())
            scores[pos] = t["score"].to_numpy()
            self._rwr_cache[src_vid] = scores
        return self._rwr_cache[src_vid]

    def get_path(self, i_vid: int, j_vid: int) -> list[int]:
        """Best path i -> j as raw vids (exclusive of i, inclusive of
        j — reference getPath list shape)."""
        i, j = self._idx(i_vid), self._idx(j_vid)
        _, pre = extract_single(self.indptr, self.indices, self._rwr(i_vid), i)
        return [int(self.vids[p]) for p in get_path(pre, i, j)]

    def get_paths(self, i_vid: int) -> dict[int, list[int]]:
        i = self._idx(i_vid)
        _, pre = extract_single(self.indptr, self.indices, self._rwr(i_vid), i)
        out = {}
        for j in range(len(self.vids)):
            if j == i:
                continue
            p = get_path(pre, i, j)
            if p:
                out[int(self.vids[j])] = [int(self.vids[x]) for x in p]
        return out

    def best_paths(self, source_vids) -> pa.Table:
        """Fan out: one Ray task per source over the broadcast CSR ->
        (src, dst, path, score_e8) rows."""
        ip_ref = ray.put(self.indptr)
        ix_ref = ray.put(self.indices)
        vd_ref = ray.put(self.vids)
        futs = []
        for sv in source_vids:
            i = self._idx(int(sv))
            futs.append(_extract_task.remote(ip_ref, ix_ref,
                                             self._rwr(int(sv)), i, vd_ref))
        rows = [r for rs in ray.get(futs) for r in rs]
        rows.sort()
        return pa.table({
            "src": pa.array([r[0] for r in rows], type=pa.int64()),
            "dst": pa.array([r[1] for r in rows], type=pa.int64()),
            "path": pa.array([r[2] for r in rows], type=pa.string()),
            "score_e8": pa.array([int(np.floor(r[3] * 1e8 + 0.5))
                                  for r in rows], type=pa.int64()),
        })
