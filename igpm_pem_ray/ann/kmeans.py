"""Distributed Lloyd's k-means over an embedding column.

Full-data k-means (unlike the IVF coarse quantizer in ann/knn.py,
which trains on a sample): every iteration is ONE map_batches pass
emitting per-block sufficient statistics (k x d vector sums + k
counts — constant size per block regardless of rows) and an
O(blocks * k * d) driver reduce; assignments are a final stateless
map.  Deterministic init: the k embeddings with the smallest ids.

The standard training-data-pipeline clustering primitive (corpus
bucketing, semantic dedup prep); no reference analog (SURVEY.md
section 2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _block_stats(b: pa.Table, cents_ref, id_col: str, col: str) -> pa.Table:
    c = ray.get(cents_ref) if not isinstance(cents_ref, np.ndarray) \
        else cents_ref
    x = np.asarray(b[col].to_pylist(), dtype=np.float64)
    # argmin ||x - c||^2 = argmin (-2 x.c + |c|^2); one matmul per block
    d2 = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
    assign = d2.argmin(axis=1)
    k, dim = c.shape
    sums = np.zeros((k, dim))
    np.add.at(sums, assign, x)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    # inertia partial (exact squared distances for reporting)
    best = d2[np.arange(len(x)), assign] + (x * x).sum(axis=1)
    inertia = np.zeros(k)
    np.add.at(inertia, assign, best)
    return pa.table({"cluster": np.arange(k, dtype=np.int64),
                     "count": counts,
                     "inertia": inertia,
                     "sum": [row.tolist() for row in sums]})


def kmeans_fit(emb_ds, *, k: int, n_iters: int = 5,
               id_col: str = "vec_id", col: str = "embedding",
               stats: dict | None = None):
    """-> (centroids float64[k, d], per-cluster counts int64[k]).

    Iterations: map_batches partial stats -> tiny driver reduce (the
    collected partials are blocks x k rows of (count, sum) — constant
    in the row count)."""
    # deterministic init WITHOUT a global sort: each block keeps its k
    # smallest ids (a per-block partial top-k), the driver merges
    # blocks x k rows — same result as sort().limit(k), no all-to-all
    def smallest_k(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        keep = np.argsort(ids, kind="stable")[:k]
        return pa.table({id_col: ids[keep],
                         col: b[col].take(pa.array(keep))})

    init = emb_ds.select_columns([id_col, col]) \
        .map_batches(smallest_k, batch_format="pyarrow",
                     zero_copy_batch=True).to_pandas()
    init = init.sort_values(id_col, kind="mergesort").head(k)
    cents = np.asarray(init[col].tolist(), dtype=np.float64)
    data = emb_ds.select_columns([id_col, col]).materialize()
    counts = np.zeros(k, dtype=np.int64)
    inertia = 0.0
    for _ in range(n_iters):
        ref = ray.put(cents)
        parts = data.map_batches(
            lambda b, _r=ref: _block_stats(b, _r, id_col, col),
            batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        sums = np.zeros_like(cents)
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for cl, cnt, ine, sm in zip(parts["cluster"], parts["count"],
                                    parts["inertia"], parts["sum"]):
            sums[cl] += np.asarray(sm)
            counts[cl] += cnt
            inertia += ine
        nz = counts > 0
        cents[nz] = sums[nz] / counts[nz, None]
    if stats is not None:
        stats.update({"inertia": float(inertia),
                      "n_iters": n_iters})
    return cents, counts


def kmeans_assign(emb_ds, cents: np.ndarray, *, id_col: str = "vec_id",
                  col: str = "embedding"):
    """Stateless assignment map: Dataset(id, cluster)."""
    ref = ray.put(cents)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = np.asarray(b[col].to_pylist(), dtype=np.float64)
        d2 = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
        return pa.table({id_col: b[id_col],
                         "cluster": d2.argmin(axis=1).astype(np.int64)})

    return emb_ds.select_columns([id_col, col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True)
