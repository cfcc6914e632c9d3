"""Explicit partitioning + skew handling (SURVEY.md K8/K10, section 4).

The reference partitions with METIS + k-hop halos
(/root/reference/patternmatching/subgraph/divide.py:8-30, overlap.py:
8-46) and greedy WCC bin-packing (parallel/gray_mp.py:172-178).  The
Ray-Data-native replacements:

- hash partitioning on a key column (``assign_buckets``) — the ONE
  partitioning key reused across stages;
- hub detection (degree aggregate) + SALTING: rows of hot keys are
  split across ``salt_factor`` sub-keys so no single groupby partition
  receives a hub's full mass; aggregates merge the sub-keys in a tiny
  second pass (the standard two-stage skew-safe aggregation);
- size-weighted greedy assignment (``greedy_pack``) for component ->
  worker balancing, mirroring split_list_wcc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Sum


def assign_buckets(ds, key: str, num_buckets: int, *, out_col: str = "bucket"):
    """Deterministic hash bucket per row (splitmix-style mix of the
    int64 key)."""
    def bucketize(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        z = (k + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        b = (z ^ (z >> np.uint64(31))) % np.uint64(num_buckets)
        return batch.append_column(out_col, pa.array(b.astype(np.int64)))

    return ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)


def detect_hubs(edges_ds, *, key: str = "dst", threshold: int | None = None,
                top_fraction: float = 1e-4) -> np.ndarray:
    """Keys whose degree exceeds ``threshold`` (default: the
    ``top_fraction`` quantile of the degree distribution) — candidates
    for salting.  One count aggregate; result is small (hubs only)."""
    def partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch[key].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"k": u, "c": c.astype(np.int64)})

    pdf = edges_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
                  .groupby("k").aggregate(Sum("c", alias_name="c")).to_pandas()
    if not len(pdf):
        return np.empty(0, dtype=np.int64)
    if threshold is None:
        threshold = max(2, int(np.quantile(pdf["c"], 1.0 - top_fraction)))
    return pdf.loc[pdf["c"] >= threshold, "k"].to_numpy()


def salt_keys(ds, key: str, hubs: np.ndarray, *, salt_factor: int = 8,
              out_col: str = "salt"):
    """Split hot keys into ``salt_factor`` deterministic sub-keys by
    appending a separate ``salt`` column; cold keys get salt 0.
    ``groupby([key, salt])`` then spreads each hub across salt_factor
    reducers; a second groupby on ``key`` alone (cheap — one row per
    (key, salt)) merges the partials.

    The salt is a SEPARATE column, not ``key*salt_factor+salt``: with
    63-bit hashed vids (ids.py) the multiply wraps int64 and silently
    merges distinct groups (ADVICE round 1)."""
    hub_ref = ray.put(np.sort(np.asarray(hubs, dtype=np.int64)))

    def salt(batch: pa.Table) -> pa.Table:
        hubs_sorted = ray.get(hub_ref)
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        is_hub = np.zeros(len(k), dtype=bool)
        if len(hubs_sorted):
            pos = np.searchsorted(hubs_sorted, k)
            pos = np.minimum(pos, len(hubs_sorted) - 1)
            is_hub = hubs_sorted[pos] == k
        h = (np.arange(len(k)) + k) % salt_factor  # deterministic spread
        s = np.where(is_hub, h, 0)
        return batch.append_column(out_col, pa.array(s.astype(np.int64)))

    return ds.map_batches(salt, batch_format="pyarrow", zero_copy_batch=True)


def greedy_pack(sizes: dict[int, int], num_workers: int) -> dict[int, int]:
    """Size-weighted greedy bin packing (largest first -> least-loaded
    worker): the reference's WCC load balancing, split_list_wcc
    (parallel/gray_mp.py:172-178).  Returns {item_id: worker}."""
    loads = [0] * num_workers
    out: dict[int, int] = {}
    for item, size in sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0])):
        w = int(np.argmin(loads))
        out[item] = w
        loads[w] += size
    return out
