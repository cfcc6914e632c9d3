"""Dense-indexed edge Dataset + vertex-message aggregation.

This is the shared substrate for the iterative kernels (PageRank,
connected components, label propagation): the north-rule execution
shape "per-partition gather-scatter in map_batches followed by
groupby-aggregate shuffles to merge vertex messages".

Layout
------
- ``vids``: sorted unique raw vertex ids (driver + broadcast via
  ``ray.put``); dense index = position.  At sandbox scale V fits
  comfortably in one object (V=1e6 -> 8 MB); at 10^12-page scale this
  becomes a vid->idx hash join against a vertices Dataset — the kernels
  below only touch the mapping through this module, so that swap is
  local.
- ``edges``: a **materialized** Dataset of (src, dst) int64 dense
  indices.  Materializing once pins the narrow (16 B/row) edge blocks
  in the object store; every iteration re-runs map_batches over the
  cached blocks with zero re-read/re-hash cost.  This is the Ray-Data
  analog of the reference holding its graph in memory across RWR
  iterations (/root/reference/patternmatching/gray/rwr.py:32,108-129)
  — but spillable, partitioned and shared.
- per-iteration per-vertex state (ranks, labels) lives in numpy arrays
  on the driver, broadcast per iteration (``ray.put``), and is what the
  checkpoints persist — never actor memory, so resume is trivial.

Message pass = per-batch combiner (sort + ``np.add/minimum.reduceat``
-> one partial row per distinct dst per block) followed by a
``groupby("dst")`` shuffle of the *partials* — the pre-aggregation
keeps the shuffle O(distinct dst x blocks), not O(E).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Max, Min, Sum


def _np_col(batch: pa.Table, name: str) -> np.ndarray:
    return batch[name].to_numpy(zero_copy_only=False)


def vertex_domain(edges_ds) -> np.ndarray:
    """Sorted unique vertex ids over both endpoints.

    Distributed distinct: per-batch ``np.unique`` combiner then
    ``Dataset.unique`` (shuffle on vid); only the V distinct ids reach
    the driver.
    """
    def endpoints(batch: pa.Table) -> pa.Table:
        s = _np_col(batch, "src")
        d = _np_col(batch, "dst")
        return pa.table({"vid": np.unique(np.concatenate([s, d]))})

    vals = edges_ds.map_batches(endpoints, batch_format="pyarrow",
                                zero_copy_batch=True).unique("vid")
    if not vals:
        return np.empty(0, dtype=np.int64)
    dtype = np.uint64 if max(vals) > np.iinfo(np.int64).max else np.int64
    return np.sort(np.asarray(vals, dtype=dtype))


@dataclass
class DenseGraph:
    vids: np.ndarray        # sorted raw ids; dense idx = position
    edges: "ray.data.Dataset"  # materialized (src,dst) dense int64
    outdeg: np.ndarray      # int64, len V (over the stored orientation)
    num_edges: int

    @property
    def num_vertices(self) -> int:
        return len(self.vids)


def build_dense_graph(edges_ds, *, symmetric: bool = False, reverse: bool = False,
                      drop_self_loops: bool = False) -> DenseGraph:
    """Materialize a dense-indexed edge Dataset.

    symmetric: store both (u,v) and (v,u) — for undirected kernels
    (connected components / label propagation), replacing the
    reference's ``to_directed``/undirected views (rwr.py:26).
    reverse: flip direction (the reference's ``G.reverse()`` before
    column normalization, rwr.py:134).
    """
    vids = vertex_domain(edges_ds)
    assert len(vids) < 2**31, "dense index packing assumes V < 2^31"
    vids_ref = ray.put(vids)

    def to_dense(batch: pa.Table) -> pa.Table:
        vv = ray.get(vids_ref)
        s = np.searchsorted(vv, _np_col(batch, "src").astype(vv.dtype))
        d = np.searchsorted(vv, _np_col(batch, "dst").astype(vv.dtype))
        if drop_self_loops:
            keep = s != d
            s, d = s[keep], d[keep]
        if reverse:
            s, d = d, s
        if symmetric:
            s, d = np.concatenate([s, d]), np.concatenate([d, s])
        return pa.table({"src": s.astype(np.int64), "dst": d.astype(np.int64)})

    dense = edges_ds.select_columns(["src", "dst"]).map_batches(
        to_dense, batch_format="pyarrow", zero_copy_batch=True).materialize()

    outdeg = np.zeros(len(vids), dtype=np.int64)
    if len(vids):
        # out-degree: per-batch unique-count combiner -> groupby sum -> driver scatter
        def deg_partial(batch: pa.Table) -> pa.Table:
            u, c = np.unique(_np_col(batch, "src"), return_counts=True)
            return pa.table({"v": u, "c": c.astype(np.int64)})

        pdf = dense.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True) \
                   .groupby("v").aggregate(Sum("c", alias_name="c")).to_pandas()
        if len(pdf):
            outdeg[pdf["v"].to_numpy()] = pdf["c"].to_numpy()
    return DenseGraph(vids=vids, edges=dense, outdeg=outdeg, num_edges=dense.count())


_REDUCERS = {"sum": (np.add, Sum), "min": (np.minimum, Min), "max": (np.maximum, Max)}


def aggregate_messages(dense_edges, values_ref, *, reduce: str = "sum"):
    """One vertex-message exchange: msg(dst) = reduce over in-edges of
    values[src].

    values_ref: ``ray.ObjectRef`` to a numpy array indexed by dense src
    (broadcast once per iteration; tasks read it zero-copy from the
    object store).

    Returns (dst_idx, agg) numpy arrays — at most V rows cross back to
    the driver, never O(E).
    """
    np_red, ray_agg = _REDUCERS[reduce]

    def combiner(batch: pa.Table) -> pa.Table:
        vals = ray.get(values_ref)
        s = _np_col(batch, "src")
        d = _np_col(batch, "dst")
        w = vals[s]
        order = np.argsort(d, kind="stable")
        d_s, w_s = d[order], w[order]
        bounds = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        return pa.table({"dst": d_s[bounds], "val": np_red.reduceat(w_s, bounds)})

    agg = dense_edges.map_batches(combiner, batch_format="pyarrow", zero_copy_batch=True) \
                     .groupby("dst").aggregate(ray_agg("val", alias_name="val"))
    pdf = agg.to_pandas()
    if not len(pdf):  # empty edge set -> empty (column-less) frame
        return np.empty(0, dtype=np.int64), np.empty(0)
    return pdf["dst"].to_numpy(), pdf["val"].to_numpy()
