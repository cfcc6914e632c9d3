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
                 num_partitions: int = 2, count_approx: bool = False,
                 approx_delta: bool = True) -> None:
        self.query = (query if isinstance(query, Query)
                      else parse_query_args(list(query)))
        self.vertices = vertices_ds
        self.num_partitions = num_partitions
        self.seen: set[tuple] = set()
        # reference num_approx counter (gray_incremental.py:201-202):
        # opt-in.  approx_delta=True (default) applies the same
        # delta-join rule to the approx pass: an approx (one-edge-
        # missing) binding that is NEW at step t must map >=1 of its
        # PRESENT edges onto a batch-t edge, so each (drop-slot,
        # delta-slot) pair runs batch-restricted — O(batch) per step
        # instead of the full cumulative match_approx (round-2 ADVICE).
        self.count_approx = count_approx
        self.approx_delta = approx_delta
        self.seen_approx: set[tuple] = set()
        self._first = True

    # ---- checkpointable dedup state (K7: cross-step state never only
    # in memory; same manifest protocol as the kernel checkpoints) ----

    def _ckpt_params(self) -> dict:
        return {"kernel": "incremental_matcher", "query": repr(self.query),
                "count_approx": self.count_approx}

    def state_table(self):
        """Seen-set state as one pa.Table (vids: list<int64>, kind)."""
        import pyarrow as pa

        rows = [(list(map(int, vs)), "exact") for vs in sorted(self.seen)]
        rows += [(list(map(int, vs)), "approx")
                 for vs in sorted(self.seen_approx)]
        return pa.table({
            "vids": pa.array([r[0] for r in rows], type=pa.list_(pa.int64())),
            "kind": pa.array([r[1] for r in rows], type=pa.string()),
        })

    def restore_state(self, table) -> None:
        kinds = table["kind"].to_pylist()
        vids = table["vids"].to_pylist()
        self.seen = {tuple(v) for v, k in zip(vids, kinds) if k == "exact"}
        self.seen_approx = {tuple(v) for v, k in zip(vids, kinds)
                            if k == "approx"}
        self._first = False

    def save(self, checkpoint_dir: str, step: int) -> str:
        from igpm_pem_ray.state import checkpoint as ckpt

        return ckpt.save_table(checkpoint_dir, step, self.state_table(),
                               metric_name="patterns_total",
                               metric_value=float(len(self.seen)),
                               params=self._ckpt_params())

    def resume(self, checkpoint_dir: str):
        """Load the latest committed seen-set; returns the resumed step
        number or None (fresh start — params fingerprint mismatch or no
        checkpoint)."""
        from igpm_pem_ray.state import checkpoint as ckpt

        found = ckpt.latest_table(checkpoint_dir, self._ckpt_params())
        if found is None:
            return None
        step, tbl, _m = found
        self.restore_state(tbl)
        return step

    def _matcher(self, cum_edges) -> SubgraphMatcher:
        v = self.vertices if self.vertices is not None \
            else _vertices_from_edges(cum_edges)
        return SubgraphMatcher(v, cum_edges, num_partitions=self.num_partitions)

    def step(self, cum_edges, batch_edges) -> dict:
        """Process one ts batch; returns counters for this step."""
        t0 = time.perf_counter()
        q = self.query
        m = self._matcher(cum_edges)
        first_step = self._first
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
            if first_step or not self.approx_delta:
                ap = m.match_approx(q)
                sets = set(ap["_vidset"]) if len(ap) else set()
            else:
                sets = self._approx_delta_sets(m, q, batch_edges)
            # an approx set that later became exact stops counting
            self.seen_approx = (self.seen_approx | sets) - self.seen
            out["patterns_approx_total"] = len(self.seen_approx)
        return out

    def _approx_delta_sets(self, m: SubgraphMatcher, q: Query,
                           batch_edges) -> set:
        """One-edge-missing bindings first visible this step: for each
        droppable slot, run the reduced query's plan once per REMAINING
        slot with that slot restricted to the batch edges (mirrors the
        exact delta-join rule; exact bindings are removed by the caller
        via ``- self.seen``)."""
        batch_edges = batch_edges.materialize()
        sets: set = set()
        touched_all = {s for e in q.edges for s in (e.a, e.b)}
        m._npart_override = 1
        try:
            for drop in q.edges:
                rest = [e for e in q.edges if e.name != drop.name]
                if not rest:
                    continue
                if {s for e in rest for s in (e.a, e.b)} != touched_all:
                    continue  # dropping would leave an unbound symbol
                q2 = Query(syms=list(q.syms),
                           vertex_labels=dict(q.vertex_labels),
                           edges=rest, directed=q.directed,
                           condition=q.condition)
                try:
                    m._plan(q2)
                except ValueError:
                    continue  # dropping this slot disconnects the query
                parts: list[pd.DataFrame] = []
                inter_cols_all: list[str] = []
                for qe in rest:
                    order = m._plan(q2, start_name=qe.name)
                    first = order[0].a
                    cand = m._candidates(q2, first)
                    if cand is None:
                        cand = np.sort(m._vp["vid"].to_numpy().astype(np.int64))
                    run, inter_cols = m._exec_plan(
                        q2, order, first, cand,
                        rel_override={qe.name: batch_edges})
                    inter_cols_all = sorted(set(inter_cols_all) | set(inter_cols))
                    if len(run):
                        parts.append(run)
                if not parts:
                    continue
                pdf = pd.concat(parts, ignore_index=True).drop_duplicates()
                pdf = m._apply_condition(q2, pdf)
                pdf = m._dedup_sets(
                    pdf, [s for s in pdf.columns if not s.startswith("_p_")],
                    inter_cols_all)
                if len(pdf):
                    sets |= set(pdf["_vidset"])
        finally:
            m._npart_override = 0
        return sets
