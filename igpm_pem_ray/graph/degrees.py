"""Degree computations (SURVEY.md A3 / S9).

Reference analogs: ``graph.degree()`` and the >=4-degree star count
(gray_incremental.py:194,202); the degree-distribution plot
(plot_deg_dist.py:17-31) becomes a (degree, n_vertices) table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Count, Sum


def degrees(edges_ds, *, direction: str = "out"):
    """(vid, degree) Dataset.  direction: out | in | both (multigraph
    counts — parallel edges count, like nx degree on a MultiGraph)."""
    def partial(batch: pa.Table) -> pa.Table:
        cols = {"out": ["src"], "in": ["dst"], "both": ["src", "dst"]}[direction]
        vals = np.concatenate([batch[c].to_numpy(zero_copy_only=False) for c in cols])
        u, c = np.unique(vals, return_counts=True)
        return pa.table({"vid": u, "c": c.astype(np.int64)})

    return edges_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
                   .groupby("vid").aggregate(Sum("c", alias_name="degree"))


def degree_distribution(edges_ds, *, direction: str = "out"):
    """(degree, n_vertices) — the log-log plot's underlying table."""
    return degrees(edges_ds, direction=direction) \
        .groupby("degree").aggregate(Count(alias_name="n_vertices"))
