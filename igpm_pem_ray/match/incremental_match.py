"""Incremental pattern matching over ts-batched edge additions (K7).

Reference analog: the incremental G-Ray driver re-runs matching per
timestamp batch from the affected part of the graph, deduplicates
against everything found so far, and reports per-step "Newly found
patterns" / "Total exact patterns" counters
(/root/reference/patternmatching/gray/incremental/gray_incremental.py:
141-202,282-315).

Ray-Data-first re-expression — the DELTA-JOIN rule instead of seed
re-expansion: with add-only updates, every match that is new at step t
must map at least one query edge onto an edge added in batch t.  So
per step the engine runs the exact BFS-join plan once per query-edge
slot with THAT slot's relation restricted to the batch edges (all
other slots see the cumulative edge set), unions the runs, and drops
vertex-sets already seen.  Each run starts its plan at the delta slot,
so partial-match tables stay proportional to the batch size, not the
graph — the scalable analog of the reference's affected-seed scoping.

``--path`` slots delta too: the slot's closure is restricted to <=3-hop
paths using >=1 batch edge (union over batch-edge positions,
``SubgraphMatcher._path_rel_delta``), so path queries pay batch-sized
work per step as well.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import ray.data as rd

from igpm_pem_ray.match.query import Query, parse_query_args
from igpm_pem_ray.match.subgraph import SubgraphMatcher


def _vertices_from_edges(edges_ds):
    """(vid,) vertex Dataset derived from edge endpoints (unlabeled
    dynamic graphs — the reference's edge-list inputs carry no vertex
    labels either, load_edgelist.py)."""
    import pyarrow as pa

    def endpoints(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": np.unique(np.concatenate([s, d]))})

    uniq = edges_ds.map_batches(endpoints, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    vids = np.unique(uniq["vid"].to_numpy()) if len(uniq) else np.empty(0, np.int64)
    return rd.from_arrow(pa.table({"vid": vids.astype(np.int64)}))


class IncrementalMatcher:
    """Cumulative pattern matching with per-step new-pattern counters.

    ``step(cum_edges, batch_edges)`` -> metrics dict with
    ``patterns_total`` (reference num_exact) and ``patterns_new``
    (reference newly_found).  Vertex-set dedup state (``seen``) is a
    plain set of vid tuples — checkpointable alongside kernel state.
    """

    def __init__(self, query: Query | list[str], *, vertices_ds=None,
                 num_partitions: int = 2, count_approx: bool = False) -> None:
        self.query = (query if isinstance(query, Query)
                      else parse_query_args(list(query)))
        self.vertices = vertices_ds
        self.num_partitions = num_partitions
        self.seen: set[tuple] = set()
        # reference num_approx counter (gray_incremental.py:201-202):
        # opt-in — each step pays a full match_approx pass
        self.count_approx = count_approx
        self.seen_approx: set[tuple] = set()
        self._first = True

    def _matcher(self, cum_edges) -> SubgraphMatcher:
        v = self.vertices if self.vertices is not None \
            else _vertices_from_edges(cum_edges)
        return SubgraphMatcher(v, cum_edges, num_partitions=self.num_partitions)

    def step(self, cum_edges, batch_edges) -> dict:
        """Process one ts batch; returns counters for this step."""
        t0 = time.perf_counter()
        q = self.query
        m = self._matcher(cum_edges)
        if self._first or not q.edges:
            pdf = m.match(q)
        else:
            # delta-join: one plan run per query-edge slot, that slot
            # restricted to the batch edges (edge slots) or to the
            # >=1-batch-edge path closure (path slots), plan started at
            # the slot so partials stay batch-sized
            batch_edges = batch_edges.materialize()  # reused per slot
            parts: list[pd.DataFrame] = []
            inter_cols_all: list[str] = []
            m._npart_override = 1  # batch-sized partials: see subgraph.py
            try:
                for qe in q.edges:
                    order = m._plan(q, start_name=qe.name)
                    first = order[0].a
                    cand = m._candidates(q, first)
                    if cand is None:
                        cand = np.sort(m._vp["vid"].to_numpy().astype(np.int64))
                    run, inter_cols = m._exec_plan(
                        q, order, first, cand,
                        rel_override={qe.name: batch_edges})
                    inter_cols_all = sorted(set(inter_cols_all) | set(inter_cols))
                    if len(run):
                        parts.append(run)
            finally:
                m._npart_override = 0
            if parts:
                pdf = pd.concat(parts, ignore_index=True).drop_duplicates()
                pdf = m._apply_condition(q, pdf)
                pdf = m._dedup_sets(
                    pdf, [s for s in pdf.columns if not s.startswith("_p_")],
                    inter_cols_all)
            else:
                pdf = pd.DataFrame()
        self._first = False
        new = [vs for vs in (pdf["_vidset"] if len(pdf) else [])
               if vs not in self.seen]
        self.seen.update(new)
        out = {
            "patterns_new": len(new),        # reference newly_found
            "patterns_total": len(self.seen),  # reference num_exact
            "match_elapsed_sec": round(time.perf_counter() - t0, 4),
        }
        if self.count_approx:
            ap = m.match_approx(q)
            sets = set(ap["_vidset"]) if len(ap) else set()
            # an approx set that later became exact stops counting
            self.seen_approx = (self.seen_approx | sets) - self.seen
            out["patterns_approx_total"] = len(self.seen_approx)
        return out
