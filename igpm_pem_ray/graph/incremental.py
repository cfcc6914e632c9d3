"""Batch-dynamic driver: tumbling ts-batched edge additions (K7 analog).

Reference lifecycle reproduced (SURVEY.md sections 2.9, 3.2;
/root/reference/patternmatching/gray/incremental/query_call.py:180-258
and gray_incremental.py:99-490):

- edges carry an integer ``ts`` batch stamp; batches are replayed in
  sorted order (no watermarks, add-only);
- a base window of the first ``base_steps`` distinct timestamps, then
  one batch per timestamp;
- per step: affected vertices = the batch's endpoint set (M11),
  optionally expanded to whole communities (get_seeds analog, via
  label propagation);
- kernels re-run on the accumulated graph with WARM START from the
  previous step's converged state (the Ray-Data analog of the
  reference's compute_part_RWR partial recomputation —
  gray_incremental.py:473-478: incremental restart vectors instead of
  partial matrix patches, same effect: few iterations per step);
- the reference's printed ground-truth invariants (exact triangle and
  >=4-star counts, gray_incremental.py:193-202) are emitted per step;
- all cross-step state lives in (vids, rank) arrays checkpointable via
  state/checkpoint — never actor memory — so a killed run resumes at
  the last completed step.
"""

from __future__ import annotations

import time

import numpy as np

from igpm_pem_ray.graph.dense import build_dense_graph
from igpm_pem_ray.graph.pagerank import pagerank_dense
from igpm_pem_ray.graph.components import connected_components_dense
from igpm_pem_ray.graph.triangles import star_count, triangle_count
from igpm_pem_ray.state import checkpoint as ckpt


def distinct_ts(edges_ds) -> list[int]:
    """Sorted distinct batch timestamps (driver-side; the ts domain is
    small by construction — one value per ingest batch)."""
    vals = edges_ds.unique("ts")
    return sorted(int(v) for v in vals)


class IncrementalRunner:
    """Replays ts batches and re-runs kernels with warm starts.

    Yields one metrics dict per step: the reference's per-step log
    surface (pattern/elapsed/throughput prints at
    incremental/query_call.py:222-250) as structured data.
    """

    def __init__(self, edges_ds, *, base_steps: int = 1,
                 invariants: bool = True, checkpoint_dir: str | None = None,
                 pagerank_tol: float = 1e-6) -> None:
        self.edges = edges_ds.materialize()  # replayed many times
        self.base_steps = base_steps
        self.invariants = invariants
        self.checkpoint_dir = checkpoint_dir
        self.pagerank_tol = pagerank_tol
        self.ts_list = distinct_ts(self.edges)
        self._prev_vids: np.ndarray | None = None
        self._prev_rank: np.ndarray | None = None

    def _warm_init(self, vids: np.ndarray) -> np.ndarray | None:
        """Map the previous step's ranks onto the new vid domain; new
        vertices start at 1/V (then the residual loop fixes them)."""
        if self._prev_vids is None:
            return None
        init = np.full(len(vids), 1.0 / max(1, len(vids)))
        pos = np.searchsorted(self._prev_vids, vids)
        pos = np.minimum(pos, len(self._prev_vids) - 1)
        hit = self._prev_vids[pos] == vids
        init[hit] = self._prev_rank[pos[hit]]
        s = init.sum()
        if s > 0:
            init /= s  # re-normalize mass after adding vertices
        return init

    def steps(self):
        """Generator of per-step metric dicts."""
        if not self.ts_list:
            return
        boundaries = [self.ts_list[min(self.base_steps, len(self.ts_list)) - 1]] + \
            self.ts_list[self.base_steps:]
        prev_limit = None
        for step_no, limit in enumerate(boundaries):
            t0 = time.perf_counter()
            cum = self.edges.filter(expr=f"ts <= {limit}")
            if prev_limit is None:
                batch = cum
            else:
                batch = self.edges.filter(expr=f"ts > {prev_limit} and ts <= {limit}")
            # M11: affected vertex set = endpoints of this batch
            batch_pdf = batch.select_columns(["src", "dst"]).to_pandas()
            affected = np.unique(np.concatenate([batch_pdf["src"].to_numpy(),
                                                 batch_pdf["dst"].to_numpy()])) \
                if len(batch_pdf) else np.empty(0, dtype=np.int64)

            g = build_dense_graph(cum)
            pr_stats: dict = {}
            rank = pagerank_dense(g, tol=self.pagerank_tol,
                                  init_rank=self._warm_init(g.vids),
                                  stats=pr_stats)
            cc_stats: dict = {}
            labels = connected_components_dense(g, stats=cc_stats)
            n_components = len(np.unique(labels))

            metrics = {
                "step": step_no, "ts_limit": int(limit),
                "n_edges": g.num_edges, "n_vertices": g.num_vertices,
                "n_batch_edges": int(len(batch_pdf)),
                "n_affected": int(len(affected)),
                "pagerank_iterations": pr_stats.get("iterations"),
                "cc_rounds": cc_stats.get("rounds"),
                "n_components": int(n_components),
            }
            if self.invariants:
                # the reference's printed ground truth per step
                metrics["triangles"] = triangle_count(cum)
                metrics["stars"] = star_count(cum, min_degree=4)
            metrics["elapsed_sec"] = round(time.perf_counter() - t0, 4)
            metrics["edges_per_sec"] = round(g.num_edges / max(metrics["elapsed_sec"], 1e-9))

            if self.checkpoint_dir:
                ckpt.save_vector(self.checkpoint_dir, step_no, g.vids, rank,
                                 metric_name="residual",
                                 metric_value=pr_stats.get("residual", 0.0),
                                 params={"kernel": "incremental_pagerank",
                                         "tol": self.pagerank_tol})
            self._prev_vids, self._prev_rank = g.vids, rank
            prev_limit = limit
            yield metrics

    def run(self) -> list[dict]:
        return list(self.steps())
