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


def _simple_symmetric_with_degrees(edges_ds, num_partitions: int):
    """Shared front for the degree-correlation operators: canonical
    simple edges -> symmetric (x, y) Dataset with the SIMPLE undirected
    degree of BOTH endpoints attached (x, y, dx, dy) plus the (v, d)
    degree table.  Two hash joins against the degree table; everything
    stays a Dataset."""
    def sym(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        kp = lo != hi
        return pa.table({"x": np.concatenate([lo[kp], hi[kp]]),
                         "y": np.concatenate([hi[kp], lo[kp]])})

    # dedup AFTER symmetrizing: one shuffle makes the rows simple and
    # symmetric at once (parallel (src,dst) duplicates collapse here)
    ue = edges_ds.select_columns(["src", "dst"]) \
        .map_batches(sym, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["x", "y"]).aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"]).materialize()
    deg = ue.groupby("x").aggregate(Count(alias_name="d")) \
        .rename_columns({"x": "v"}).materialize()
    both = ue.join(deg, join_type="inner", num_partitions=num_partitions,
                   on=("y",), right_on=("v",)) \
        .rename_columns({"d": "dy"}) \
        .join(deg, join_type="inner", num_partitions=num_partitions,
              on=("x",), right_on=("v",)) \
        .rename_columns({"d": "dx"})
    return both, deg


def _half_up_ratio_e6(s: np.ndarray, c: np.ndarray) -> np.ndarray:
    """round-half-up(1e6 * s / c) in EXACT int64 arithmetic:
    (2_000_000*s + c) // (2*c) for s, c > 0 — the identical expression
    the SQL oracles use, so the fixed-point column hashes bit-for-bit
    with no float reduction-order hazard."""
    s = s.astype(np.int64)
    c = c.astype(np.int64)
    return (2_000_000 * s + c) // (2 * c)


def avg_neighbor_degree(edges_ds, *, num_partitions: int | None = None):
    """Per-vertex average neighbor degree over the SIMPLE undirected
    graph — (vid, degree, annd_e6) Dataset, annd_e6 =
    round-half-up(1e6 * mean degree over neighbors), exact integer.

    The classic web-graph degree-correlation measurement (Pastor-
    Satorras/Vazquez/Vespignani, PRL 87 2001); the reference's only
    degree surface is the global distribution (plot_deg_dist.py:17-31)
    — this is its second moment.  Plan: symmetrize+dedup (one
    shuffle), degree join on the neighbor endpoint, one groupby-sum —
    no all-pairs work, hub cost linear in degree."""
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(16, cpus // 2))
    both, _deg = _simple_symmetric_with_degrees(edges_ds, num_partitions)
    per_v = both.groupby("x").aggregate(Sum("dy", alias_name="sd"),
                                        Count(alias_name="c"),
                                        Sum("dx", alias_name="sdx"))

    def finish(b: pa.Table) -> pa.Table:
        sd = b["sd"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        sdx = b["sdx"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vid": b["x"],
                         "degree": sdx // np.maximum(c, 1),
                         "annd_e6": _half_up_ratio_e6(sd, c)})

    return per_v.map_batches(finish, batch_format="pyarrow")


def knn_curve(edges_ds, *, num_partitions: int | None = None):
    """Degree-correlation curve knn(k): for each degree class k, the
    mean neighbor degree over all simple-edge endpoints of degree k —
    (degree, knn_e6, n_endpoints), exact-integer e6 fixed point.

    Assortative graphs rise, disassortative (the web) fall; this is
    the standard curve behind the single-number assortativity
    coefficient (q_assortativity)."""
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(16, cpus // 2))
    both, _deg = _simple_symmetric_with_degrees(edges_ds, num_partitions)
    per_k = both.groupby("dx").aggregate(Sum("dy", alias_name="sd"),
                                         Count(alias_name="c"))

    def finish(b: pa.Table) -> pa.Table:
        sd = b["sd"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"degree": b["dx"],
                         "knn_e6": _half_up_ratio_e6(sd, c),
                         "n_endpoints": c})

    return per_k.map_batches(finish, batch_format="pyarrow")
