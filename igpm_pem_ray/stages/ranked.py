"""Per-group ranking / top-k — the windowed `row_number() OVER
(PARTITION BY key ORDER BY ...)` operator, Ray-Data-first.

Shape: ONE global sort by (key, order cols) — groups land contiguous
and pre-ranked — then every block assigns ranks vectorized; the only
cross-block state is, per block, the count of leading rows whose key
continues from the previous block (O(blocks) driver stitch, same
pattern as stages/sessionize.py).  No per-group Python: a
``groupby(key).map_groups(head)`` would pay Python per group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


@ray.remote
def _key_bounds(tbl: pa.Table, key: str):
    if tbl.num_rows == 0 or key not in tbl.column_names:
        return None
    k = tbl[key].to_numpy(zero_copy_only=False)
    first_run = int(np.argmax(k != k[0])) if (k != k[0]).any() else len(k)
    last_run = int(np.argmax(k[::-1] != k[-1])) if (k != k[-1]).any() else len(k)
    # keys only ever compared for equality across blocks — keep string
    # (or any hashable) keys as-is, coerce numpy ints to Python ints so
    # the driver-side == works across block dtypes
    def py(x):
        return int(x) if isinstance(x, (int, np.integer)) else x

    return {"first_key": py(k[0]), "first_run": first_run,
            "last_key": py(k[-1]), "last_run": last_run, "n": len(k)}


@ray.remote
def _rank_filter(tbl: pa.Table, key: str, k_top: int | None,
                 offset: int) -> pa.Table:
    """Rank rows within contiguous key runs (plus ``offset`` for the
    first run, carried over from preceding blocks); keep rank <= k_top
    when set.  Ranks are 1-based."""
    if tbl.num_rows == 0 or key not in tbl.column_names:
        return tbl
    k = tbl[key].to_numpy(zero_copy_only=False)
    new = np.r_[True, k[1:] != k[:-1]]
    starts = np.flatnonzero(new)
    pos = np.arange(len(k)) - np.repeat(starts, np.diff(np.r_[starts, len(k)]))
    rank = pos + 1
    rank[:starts[1] if len(starts) > 1 else len(k)] += offset
    keep = rank <= k_top if k_top is not None \
        else np.ones(len(k), dtype=bool)
    out = tbl.filter(pa.array(keep))
    return out.append_column("rank", pa.array(rank[keep], type=pa.int64()))


def rank_per_group(ds, *, key: str, order: list[str],
                   descending: list[bool],
                   target_blocks: int | None = None):
    """All rows + their 1-based ``rank`` within ``key`` (no filter) —
    the building block for per-group quantiles/medians."""
    return topk_per_group(ds, key=key, order=order, descending=descending,
                          k=None, target_blocks=target_blocks)


def topk_per_group(ds, *, key: str, order: list[str],
                   descending: list[bool], k: int | None,
                   target_blocks: int | None = None):
    """-> input columns + ``rank``, keeping the top-``k`` rows per
    ``key`` under the (order, descending) sort (all rows when k is
    None) — deterministic when the order columns are a total order
    within each key."""
    srt = ds.sort([key, *order], descending=[False, *descending])
    if target_blocks:
        srt = srt.repartition(target_blocks)  # order-preserving split
    srt = srt.materialize()
    refs = srt.to_arrow_refs()
    if not refs:
        return srt
    bounds = ray.get([_key_bounds.remote(r, key) for r in refs])

    offsets = [0] * len(refs)
    carry_key, carry_count = None, 0
    for i, b in enumerate(bounds):
        if b is None:
            continue
        if carry_key is not None and b["first_key"] == carry_key:
            offsets[i] = carry_count
            if b["first_run"] == b["n"]:   # whole block one key run
                carry_count += b["n"]
                continue
        carry_key = b["last_key"]
        carry_count = b["last_run"]
    return rd.from_arrow_refs(
        [_rank_filter.remote(r, key, k, off)
         for r, off in zip(refs, offsets)])
