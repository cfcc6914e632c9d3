"""Temporal joins — as-of join, range (interval) join, per-key running
total.  The custom operators a training-data / event-attribution
pipeline needs that Ray Data has no built-in for (brief: "as-of join,
range join, windowed aggregate"), each expressed as a composition of
``sort`` / ``map_batches`` / hash ``join`` + a tiny O(blocks) driver
stitch, never per-group Python.

Scale shapes
------------
- ``asof_join``: ONE global sort of (build ∪ probe) by (key, ts, side)
  — the honest all-to-all — then every sorted block forward-fills the
  last build row vectorized (numpy maximum.accumulate over build row
  positions, reset per key run).  The only cross-block state is the
  last build row of each block's LAST key: because the sort is global,
  a key can only straddle adjacent block boundaries, so the driver
  carry is O(1) per block (same stitch family as
  stages/sessionize.py), not O(distinct keys).
- ``range_join_agg``: the classic bucketed interval join — intervals
  of width <= W explode to the <= 2 width-W time buckets they touch,
  points bucket to exactly one, a hash join on (key, bucket) bounds
  the candidate set, an exact containment filter + groupby finish it.
  No interval ever meets a point outside its two buckets, and a point
  joins each interval at most once (its bucket is unique), so no
  dedup pass is needed.
- ``cumsum_per_key``: global sort by (key, order cols), per-block
  vectorized prefix sums, O(1)-per-boundary driver carry of the
  running sum for the single key that straddles each block boundary.

All three are oracle-checked against DuckDB window/inequality-join SQL
in pipelines/relational.py (queries ``asof_purchase_attrib``,
``range_join_windows``, ``cumsum_orders``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

NO_MATCH = np.int64(-1)  # sentinel (COALESCE(-1) in the SQL oracles)


# ------------------------------ as-of join ------------------------------

@ray.remote(num_returns=2)
def _asof_block(tbl: pa.Table, payload_cols: list[str]):
    """(probe-only output table, summary) for one sorted block.

    Input columns: key, us, side (0=build, 1=probe), val (build rows),
    plus probe payload columns.  Output: payload + key + us +
    matched (asof_us, asof_val), NO_MATCH where no build row at-or-
    before exists **within this block's key run** (the driver patch
    fills the first run from the carry).
    """
    n = tbl.num_rows
    if n == 0 or "key" not in tbl.column_names:
        out = pa.table({c: pa.array([], type=pa.int64())
                        for c in (*payload_cols, "key", "us",
                                  "asof_us", "asof_val")})
        return out, None
    key = tbl["key"].to_numpy(zero_copy_only=False)
    us = tbl["us"].to_numpy(zero_copy_only=False)
    side = tbl["side"].to_numpy(zero_copy_only=False)
    val = tbl["val"].to_numpy(zero_copy_only=False)
    pos = np.arange(n, dtype=np.int64)

    build = side == 0
    # per-row start of its key run (keys are contiguous after the sort)
    new_run = np.r_[True, key[1:] != key[:-1]]
    run_start = np.maximum.accumulate(np.where(new_run, pos, 0))
    # last build row position at or before each row (sort puts builds
    # before probes at equal ts, so "at-or-before" is positional)
    last_build = np.maximum.accumulate(np.where(build, pos, NO_MATCH))
    matched = last_build >= run_start

    probe = ~build
    pm = matched[probe]
    pidx = last_build[probe]
    asof_us = np.where(pm, us[np.maximum(pidx, 0)], NO_MATCH)
    asof_val = np.where(pm, val[np.maximum(pidx, 0)], NO_MATCH)
    cols = {c: tbl[c].filter(pa.array(probe)) for c in payload_cols}
    cols["key"] = pa.array(key[probe].astype(np.int64))
    cols["us"] = pa.array(us[probe].astype(np.int64))
    cols["asof_us"] = pa.array(asof_us.astype(np.int64))
    cols["asof_val"] = pa.array(asof_val.astype(np.int64))

    # summary: last build row for the block's LAST key (None if that
    # key has no build row in this block)
    last_key = int(key[-1])
    in_last = build & (key == key[-1])
    if in_last.any():
        j = int(pos[in_last][-1])
        last_build_row = (int(us[j]), int(val[j]))
    else:
        last_build_row = None
    summary = {"first_key": int(key[0]), "last_key": last_key,
               "last_build": last_build_row}
    return pa.table(cols), summary


@ray.remote
def _asof_patch(tbl: pa.Table, carry_key: int, carry_us: int,
                carry_val: int) -> pa.Table:
    """Fill NO_MATCH rows of the carry key (necessarily the block's
    first run) from the previous blocks' last build row."""
    key = tbl["key"].to_numpy(zero_copy_only=False)
    hit = (key == carry_key) & \
        (tbl["asof_us"].to_numpy(zero_copy_only=False) == NO_MATCH)
    if not hit.any():
        return tbl
    asof_us = tbl["asof_us"].to_numpy(zero_copy_only=False).copy()
    asof_val = tbl["asof_val"].to_numpy(zero_copy_only=False).copy()
    asof_us[hit] = carry_us
    asof_val[hit] = carry_val
    return tbl.set_column(tbl.column_names.index("asof_us"), "asof_us",
                          pa.array(asof_us)) \
              .set_column(tbl.column_names.index("asof_val"), "asof_val",
                          pa.array(asof_val))


def asof_join(build_ds, probe_ds, *, payload_cols: list[str],
              target_blocks: int | None = None):
    """For every probe row, the latest build row with the same ``key``
    and ``us`` at-or-before the probe's ``us``.

    ``build_ds``: columns (key, us, val) — pre-aggregate ties at equal
    (key, us) yourself if the tie-break matters (the query below uses
    max(val)).  ``probe_ds``: columns (key, us, *payload_cols).
    Returns (``*payload_cols``, key, us, asof_us, asof_val) with -1
    sentinels where no build row precedes the probe (left-join
    semantics, oracle uses COALESCE(-1)).
    """
    null64 = pa.nulls(0, pa.int64())  # schema alignment template

    def tag_build(b: pa.Table) -> pa.Table:
        cols = {"key": b["key"].cast(pa.int64()),
                "us": b["us"].cast(pa.int64()),
                "side": pa.nulls(b.num_rows, pa.int64()).fill_null(0),
                "val": b["val"].cast(pa.int64())}
        for c in payload_cols:
            cols[c] = pa.nulls(b.num_rows, pa.int64())
        return pa.table(cols)

    def tag_probe(b: pa.Table) -> pa.Table:
        cols = {"key": b["key"].cast(pa.int64()),
                "us": b["us"].cast(pa.int64()),
                "side": pa.nulls(b.num_rows, pa.int64()).fill_null(1),
                # constant, NOT null: a null int64 would round-trip
                # through float64/NaN in the block kernel's to_numpy
                "val": pa.nulls(b.num_rows, pa.int64()).fill_null(NO_MATCH)}
        for c in payload_cols:
            cols[c] = b[c].cast(pa.int64())
        return pa.table(cols)

    both = build_ds.map_batches(tag_build, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .union(probe_ds.map_batches(tag_probe, batch_format="pyarrow",
                                    zero_copy_batch=True)) \
        .sort(["key", "us", "side"])
    if target_blocks:
        both = both.repartition(target_blocks)
    both = both.materialize()
    refs = both.to_arrow_refs()
    if not refs:
        return rd.from_arrow(pa.table(
            {c: null64 for c in (*payload_cols, "key", "us",
                                 "asof_us", "asof_val")}))
    parts = [_asof_block.remote(r, payload_cols) for r in refs]
    tables = [p[0] for p in parts]
    summaries = ray.get([p[1] for p in parts])

    # O(1)-per-boundary carry: the last build row of the single key
    # that straddles each block boundary
    out_refs = []
    carry = None  # (key, us, val)
    for tref, s in zip(tables, summaries):
        if s is None:
            out_refs.append(tref)
            continue
        if carry is not None and carry[0] == s["first_key"]:
            tref = _asof_patch.remote(tref, *carry)
        if s["last_build"] is not None:
            carry = (s["last_key"], *s["last_build"])
        elif carry is not None and carry[0] == s["last_key"]:
            pass  # single-key block with no build: carry persists
        else:
            carry = None
        out_refs.append(tref)
    return rd.from_arrow_refs(out_refs)


# ---------------------------- range join ----------------------------

def range_join_agg(intervals_ds, points_ds, *, width_us: int,
                   num_partitions: int = 4):
    """Inner interval join + aggregate: for every interval
    [start_us, start_us + width_us) in ``intervals_ds`` (columns
    iv_id, key, start_us), the count and int64 sum of ``val`` over
    points (columns key, us, val) of the same key inside the window.
    Intervals with zero points are absent (inner-join semantics).

    Bucketing: fixed-width time buckets of ``width_us`` — an interval
    of exactly that width touches at most 2 buckets, a point exactly
    one, so the hash join on (key, bucket) sees each candidate pair
    once and the containment filter finishes exactly.
    """
    from ray.data.aggregate import Count, Max, Sum

    def explode(b: pa.Table) -> pa.Table:
        iv = b["iv_id"].to_numpy(zero_copy_only=False)
        k = b["key"].to_numpy(zero_copy_only=False)
        s = b["start_us"].to_numpy(zero_copy_only=False)
        b0 = s // width_us
        b1 = (s + width_us - 1) // width_us
        two = b1 != b0
        return pa.table({
            "iv_id": np.r_[iv, iv[two]].astype(np.int64),
            "key": np.r_[k, k[two]].astype(np.int64),
            "start_us": np.r_[s, s[two]].astype(np.int64),
            "bucket": np.r_[b0, b1[two]].astype(np.int64),
        })

    def point_bucket(b: pa.Table) -> pa.Table:
        us = b["us"].to_numpy(zero_copy_only=False)
        return pa.table({
            "key": b["key"].cast(pa.int64()),
            "us": pa.array(us.astype(np.int64)),
            "val": b["val"].cast(pa.int64()),
            "bucket": pa.array((us // width_us).astype(np.int64)),
        })

    iv = intervals_ds.map_batches(explode, batch_format="pyarrow",
                                  zero_copy_batch=True)
    pt = points_ds.map_batches(point_bucket, batch_format="pyarrow",
                               zero_copy_batch=True)
    joined = iv.join(pt, join_type="inner", on=("key", "bucket"),
                     num_partitions=num_partitions)

    def contain(b: pa.Table) -> pa.Table:
        us = b["us"].to_numpy(zero_copy_only=False)
        s = b["start_us"].to_numpy(zero_copy_only=False)
        keep = (us >= s) & (us < s + width_us)
        return pa.table({"iv_id": b["iv_id"].filter(pa.array(keep)),
                         "key": b["key"].filter(pa.array(keep)),
                         "val": b["val"].filter(pa.array(keep))})

    return joined.map_batches(contain, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("iv_id").aggregate(
            Max("key", alias_name="key"),     # constant per iv_id
            Count(alias_name="n_points"),
            Sum("val", alias_name="sum_val"))


# ------------------------ per-key running total ------------------------

@ray.remote(num_returns=2)
def _cumsum_block(tbl: pa.Table, payload_cols: list[str]):
    n = tbl.num_rows
    if n == 0 or "key" not in tbl.column_names:
        out = pa.table({c: pa.array([], type=pa.int64())
                        for c in (*payload_cols, "key", "us", "cum_val")})
        return out, None
    key = tbl["key"].to_numpy(zero_copy_only=False)
    val = tbl["val"].to_numpy(zero_copy_only=False)
    pos = np.arange(n, dtype=np.int64)
    new_run = np.r_[True, key[1:] != key[:-1]]
    csum = np.cumsum(val)
    # subtract the prefix before each run start (run-id gather, safe
    # for negative vals where a maximum.accumulate trick would not be)
    starts = np.flatnonzero(new_run)
    run_id = np.cumsum(new_run) - 1
    base = (csum[starts] - val[starts])[run_id]
    cum = csum - base
    cols = {c: tbl[c] for c in payload_cols}
    cols["key"] = pa.array(key.astype(np.int64))
    cols["us"] = tbl["us"]
    cols["cum_val"] = pa.array(cum.astype(np.int64))
    last_run_sum = int(cum[-1])
    summary = {"first_key": int(key[0]), "last_key": int(key[-1]),
               "first_run_len": int(np.argmax(key != key[0]))
               if (key != key[0]).any() else n,
               "last_run_sum": last_run_sum}
    return pa.table(cols), summary


@ray.remote
def _cumsum_patch(tbl: pa.Table, first_run_len: int,
                  offset: int) -> pa.Table:
    cum = tbl["cum_val"].to_numpy(zero_copy_only=False).copy()
    cum[:first_run_len] += offset
    return tbl.set_column(tbl.column_names.index("cum_val"), "cum_val",
                          pa.array(cum))


def cumsum_per_key(ds, *, payload_cols: list[str], order_cols=("us",),
                   target_blocks: int | None = None):
    """Running total of ``val`` per ``key`` in (key, *order_cols)
    order — `sum() OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`.  Input columns: key, us (int64-castable), val, plus
    ``payload_cols`` passed through.  Same O(1)-per-boundary driver
    stitch as :func:`asof_join`.
    """
    srt = ds.sort(["key", *order_cols])
    if target_blocks:
        srt = srt.repartition(target_blocks)
    srt = srt.materialize()
    refs = srt.to_arrow_refs()
    if not refs:
        return rd.from_arrow(pa.table(
            {c: pa.nulls(0, pa.int64())
             for c in (*payload_cols, "key", "us", "cum_val")}))
    parts = [_cumsum_block.remote(r, payload_cols) for r in refs]
    tables = [p[0] for p in parts]
    summaries = ray.get([p[1] for p in parts])

    out_refs = []
    carry = None  # (key, running_sum)
    for tref, s in zip(tables, summaries):
        if s is None:
            out_refs.append(tref)
            continue
        applied = carry is not None and carry[0] == s["first_key"]
        if applied:
            tref = _cumsum_patch.remote(tref, s["first_run_len"], carry[1])
        out_sum = s["last_run_sum"]
        if applied and s["first_key"] == s["last_key"]:
            out_sum += carry[1]
        carry = (s["last_key"], out_sum)
        out_refs.append(tref)
    return rd.from_arrow_refs(out_refs)


@ray.remote(num_returns=2)
def _gap_block(block: pa.Table):
    """Per-block lag-diff partials for gap_stats_per_key: (user_rows
    of interior-gap stats, boundary summary).  Input block is a slice
    of the (key, us)-sorted table."""
    if block.num_rows == 0:
        return None, None
    k = block["key"].to_numpy(zero_copy_only=False)
    us = block["us"].to_numpy(zero_copy_only=False)
    same = k[1:] == k[:-1]
    gap = (us[1:] - us[:-1])[same]
    gk = k[1:][same]
    if len(gk):
        uniq, idx = np.unique(gk, return_index=True)
        # gk is sorted (block is key-sorted): reduceat over segments
        n = np.diff(np.r_[idx, len(gk)])
        mn = np.minimum.reduceat(gap, idx)
        mx = np.maximum.reduceat(gap, idx)
        sm = np.add.reduceat(gap, idx)
    else:
        uniq = np.empty(0, np.int64)
        n = mn = mx = sm = np.empty(0, np.int64)
    partial = pa.table({"key": uniq.astype(np.int64),
                        "n_gaps": n.astype(np.int64),
                        "min_gap": mn.astype(np.int64),
                        "max_gap": mx.astype(np.int64),
                        "sum_gap": sm.astype(np.int64)})
    summary = {"first_key": int(k[0]), "first_us": int(us[0]),
               "last_key": int(k[-1]), "last_us": int(us[-1])}
    return partial, summary


def gap_stats_per_key(ds, *, target_blocks: int | None = None):
    """Inter-event gap statistics per key — the lag()-window shape
    `us - lag(us) OVER (PARTITION BY key ORDER BY us)` aggregated to
    (key, n_gaps, min_gap, max_gap, sum_gap), keys with >= 2 rows.

    Consecutive differences of a sorted sequence depend only on the
    sorted multiset, so ties in ``us`` need no extra tie-break
    column.  Plan: one sort, per-block vectorized reduceat partials,
    O(blocks) driver boundary-gap stitch (one extra gap row per
    adjacent block pair sharing a key), one O(keys) groupby merge.
    """
    from ray.data.aggregate import Max, Min, Sum

    srt = ds.sort(["key", "us"])
    if target_blocks:
        srt = srt.repartition(target_blocks)
    srt = srt.materialize()
    refs = srt.to_arrow_refs()
    empty = pa.table({c: pa.nulls(0, pa.int64())
                      for c in ("key", "n_gaps", "min_gap", "max_gap",
                                "sum_gap")})
    if not refs:
        return rd.from_arrow(empty)
    outs = [_gap_block.remote(r) for r in refs]
    partial_refs = [o[0] for o in outs]
    summaries = ray.get([o[1] for o in outs])

    # boundary gaps: adjacent non-empty blocks sharing a key
    bkeys, bgaps = [], []
    prev = None
    for s in summaries:
        if s is None:
            continue
        if prev is not None and prev["last_key"] == s["first_key"]:
            bkeys.append(s["first_key"])
            bgaps.append(s["first_us"] - prev["last_us"])
        prev = s
    bk = np.asarray(bkeys, dtype=np.int64)
    bg = np.asarray(bgaps, dtype=np.int64)
    boundary = pa.table({"key": bk, "n_gaps": np.ones(len(bk), np.int64),
                         "min_gap": bg, "max_gap": bg, "sum_gap": bg})

    parts = rd.from_arrow_refs(
        [r for r, s in zip(partial_refs, summaries) if s is not None])
    allparts = parts.union(rd.from_arrow(boundary if len(bk) else empty))
    return allparts.groupby("key").aggregate(
        Sum("n_gaps", alias_name="n_gaps"),
        Min("min_gap", alias_name="min_gap"),
        Max("max_gap", alias_name="max_gap"),
        Sum("sum_gap", alias_name="sum_gap"))


def overlap_join_count(a_ds, b_ds, *, bucket_us: int,
                       num_partitions: int = 8):
    """Interval-overlap join, aggregated: for every row of
    ``a_ds(aid, a_start, a_end)`` count the rows of
    ``b_ds(b_start, b_end)`` whose half-open interval overlaps
    (a_start < b_end AND b_start < a_end).

    Plan: both sides explode to the width-``bucket_us`` buckets their
    interval touches (ceil(len/w)+1 buckets/row — pick w >= typical
    length so it's <= 2), hash join on the bucket id, exact overlap
    filter, then a (aid, b-identity) DISTINCT groupby de-dupes pairs
    that met in more than one bucket, and a final count per aid.
    The non-equi join becomes one equi shuffle — the same bucketing
    family as range_join_agg, extended to interval x interval."""
    from ray.data.aggregate import Count, Min

    def explode(prefix, id_cols):
        def f(b: pa.Table) -> pa.Table:
            s = b[f"{prefix}_start"].to_numpy(zero_copy_only=False)
            e = b[f"{prefix}_end"].to_numpy(zero_copy_only=False)
            first = s // bucket_us
            last = (e - 1) // bucket_us
            n = (last - first + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(s)), n)
            off = np.arange(int(n.sum())) - np.repeat(
                np.cumsum(n) - n, n)
            out = {f"{prefix}_bucket": (first[idx] + off).astype(np.int64),
                   f"{prefix}_start": s[idx], f"{prefix}_end": e[idx]}
            for c in id_cols:
                out[c] = b[c].to_numpy(zero_copy_only=False)[idx]
            return pa.table(out)
        return f

    ae = a_ds.map_batches(explode("a", ["aid"]), batch_format="pyarrow",
                          zero_copy_batch=True)
    be = b_ds.map_batches(explode("b", []), batch_format="pyarrow",
                          zero_copy_batch=True)
    j = ae.join(be, join_type="inner", num_partitions=num_partitions,
                on=("a_bucket",), right_on=("b_bucket",))

    def exact(t: pa.Table) -> pa.Table:
        a_s = t["a_start"].to_numpy(zero_copy_only=False)
        a_e = t["a_end"].to_numpy(zero_copy_only=False)
        b_s = t["b_start"].to_numpy(zero_copy_only=False)
        b_e = t["b_end"].to_numpy(zero_copy_only=False)
        keep = (a_s < b_e) & (b_s < a_e)
        return pa.table({"aid": t["aid"].to_numpy(
                             zero_copy_only=False)[keep],
                         "b_start": b_s[keep], "b_end": b_e[keep]})

    pairs = j.map_batches(exact, batch_format="pyarrow",
                          zero_copy_batch=True)
    # dedupe (aid, b-interval) pairs that met in 2 buckets, then count.
    # b-identity = its interval; b rows are pre-distinct by caller.
    return pairs.groupby(["aid", "b_start", "b_end"]) \
        .aggregate(Min("b_start", alias_name="_m")) \
        .groupby("aid").aggregate(Count(alias_name="n_overlaps"))


@ray.remote(num_returns=2)
def _bigram_block(block: pa.Table):
    """Per-block adjacent-pair partials for adjacent_pair_counts."""
    if block.num_rows == 0:
        return None, None
    k = block["key"].to_numpy(zero_copy_only=False)
    v = np.asarray(block["val"].to_pylist(), dtype=object)
    same = k[1:] == k[:-1]
    prev = v[:-1][same]
    curr = v[1:][same]
    if len(prev):
        import pandas as _pd

        pairs = _pd.DataFrame({"prev": prev, "curr": curr}) \
            .groupby(["prev", "curr"], as_index=False).size()
        partial = pa.table({"prev": pairs["prev"].astype(str),
                            "curr": pairs["curr"].astype(str),
                            "n": pairs["size"].to_numpy()
                            .astype(np.int64)})
    else:
        partial = pa.table({"prev": pa.array([], pa.string()),
                            "curr": pa.array([], pa.string()),
                            "n": pa.array([], pa.int64())})
    summary = {"first_key": int(k[0]), "first_val": str(v[0]),
               "last_key": int(k[-1]), "last_val": str(v[-1])}
    return partial, summary


def adjacent_pair_counts(ds, *, target_blocks: int | None = None):
    """Markov-transition counts of ``val`` sequences per ``key`` in
    (key, us[, tiebreak]) order: how often value X is immediately
    followed by value Y within a key — sort + per-block vectorized
    pair counts + O(blocks) boundary-pair stitch + one O(distinct
    pairs) merge groupby.  Input columns: key (int64), us, tie, val.
    """
    from ray.data.aggregate import Sum

    srt = ds.sort(["key", "us", "tie"])
    if target_blocks:
        srt = srt.repartition(target_blocks)
    srt = srt.materialize()
    refs = srt.to_arrow_refs()
    empty = pa.table({"prev": pa.array([], pa.string()),
                      "curr": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if not refs:
        return rd.from_arrow(empty)
    outs = [_bigram_block.remote(r) for r in refs]
    partial_refs = [o[0] for o in outs]
    summaries = ray.get([o[1] for o in outs])

    bp, bc = [], []
    prev_s = None
    for s in summaries:
        if s is None:
            continue
        if prev_s is not None and prev_s["last_key"] == s["first_key"]:
            bp.append(prev_s["last_val"])
            bc.append(s["first_val"])
        prev_s = s
    boundary = pa.table({"prev": pa.array(bp, pa.string()),
                         "curr": pa.array(bc, pa.string()),
                         "n": pa.array([1] * len(bp), pa.int64())})
    parts = rd.from_arrow_refs(
        [r for r, s in zip(partial_refs, summaries) if s is not None])
    allparts = parts.union(rd.from_arrow(boundary if len(bp) else empty))
    return allparts.groupby(["prev", "curr"]).aggregate(
        Sum("n", alias_name="n"))


# ----------------------------- debounce -----------------------------

@ray.remote(num_returns=2)
def _debounce_block(block: pa.Table, gap_us: int, key_cols: tuple):
    """Per-block lag-debounce keep mask (row 0 provisionally kept);
    returns (kept rows, boundary summary).  Input is a slice of the
    (key..., us, id)-sorted table."""
    if block.num_rows == 0:
        return None, None
    us = block["us"].to_numpy(zero_copy_only=False)
    same = np.ones(block.num_rows - 1, dtype=bool)
    for kc in key_cols:
        k = block[kc].to_numpy(zero_copy_only=False)
        same &= k[1:] == k[:-1]
    keep = np.r_[True, ~same | ((us[1:] - us[:-1]) > gap_us)]
    first = tuple(block[kc][0].as_py() for kc in key_cols)
    last = tuple(block[kc][block.num_rows - 1].as_py() for kc in key_cols)
    summary = {"first_key": first, "first_us": int(us[0]),
               "last_key": last, "last_us": int(us[-1])}
    return block.filter(pa.array(keep)), summary


@ray.remote
def _drop_first_row(tbl: pa.Table) -> pa.Table:
    return tbl.slice(1)


def debounce_per_key(events_ds, *, gap_us: int,
                     key_cols: tuple = ("user_id", "event_type"),
                     ts_col: str = "ts", id_col: str = "event_id",
                     target_blocks: int | None = None):
    """Lag-based debounce — drop every event whose immediately
    preceding event of the SAME key (in (ts, id) order) is within
    ``gap_us``; the streaming duplicate-suppression operator (double
    clicks, sensor chatter, retry storms).  Lag semantics (each row is
    compared with its raw predecessor, kept or not) are exactly
    ``us - lag(us) OVER (PARTITION BY key ORDER BY us, id) > gap``, so
    the SQL oracle is one window function.

    Scale shape: ONE global sort by (key..., us, id), per-block
    vectorized keep masks, and an O(1)-per-block driver patch: only a
    block's FIRST row depends on cross-block state (its lag row is the
    previous block's last row), so the driver drops that single row
    when the previous block ends with the same key within gap — the
    stages/sessionize.py stitch family.  Returns the kept rows with
    ``us`` (int64 microseconds) replacing ``ts``.
    """
    cols = [id_col, *key_cols]

    def pre(b: pa.Table) -> pa.Table:
        out = {c: b[c] for c in cols}
        out["us"] = b[ts_col].cast(pa.int64())
        return pa.table(out)

    srt = events_ds.map_batches(pre, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .sort([*key_cols, "us", id_col])
    if target_blocks:
        srt = srt.repartition(target_blocks)
    srt = srt.materialize()
    refs = srt.to_arrow_refs()
    if not refs:
        return srt
    outs = [_debounce_block.remote(r, gap_us, tuple(key_cols))
            for r in refs]
    kept_refs = [o[0] for o in outs]
    summaries = ray.get([o[1] for o in outs])

    final = []
    prev = None
    for kref, s in zip(kept_refs, summaries):
        if s is None:
            continue
        if prev is not None and prev["last_key"] == s["first_key"] \
                and s["first_us"] - prev["last_us"] <= gap_us:
            kref = _drop_first_row.remote(kref)
        final.append(kref)
        prev = s
    return rd.from_arrow_refs(final)


# ----------------------- trailing ROWS window -----------------------

def _empty_roll(id_col: str) -> pa.Table:
    z = np.empty(0, dtype=np.int64)
    return pa.table({id_col: z, "key": z, "us": z, "val": z})


@ray.remote
def _chain_tail(prev_tail: pa.Table, block: pa.Table, k: int) -> pa.Table:
    """Last ``k`` rows of concat(prev_tail, block) — chained across
    blocks so a run of tiny blocks still yields the true trailing
    context (O(k) rows shipped per link)."""
    t = pa.concat_tables([prev_tail, block]) if prev_tail.num_rows \
        else block
    return t.slice(max(0, t.num_rows - k))


@ray.remote
def _roll_block(block: pa.Table, prev_tail: pa.Table, k: int,
                id_col: str) -> pa.Table:
    """Trailing k-row count/sum per key over one sorted block, with
    ``prev_tail`` (<= k-1 true predecessor rows) prepended so windows
    crossing the block boundary are exact; the prepended rows are
    sliced off the output."""
    skip = prev_tail.num_rows
    t = pa.concat_tables([prev_tail, block]) if skip else block
    if t.num_rows == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "key": pa.array([], pa.int64()),
                         "us": pa.array([], pa.int64()),
                         "w_n": pa.array([], pa.int64()),
                         "w_sum": pa.array([], pa.int64())})
    key = t["key"].to_numpy(zero_copy_only=False)
    val = t["val"].to_numpy(zero_copy_only=False).astype(np.int64)
    new = np.r_[True, key[1:] != key[:-1]]
    starts = np.flatnonzero(new)
    pos = np.arange(len(key)) - np.repeat(
        starts, np.diff(np.r_[starts, len(key)]))
    m = np.minimum(pos, k - 1)              # rows looking back
    c = np.r_[0, np.cumsum(val)]            # c[i+1]-c[j] = sum(val[j:i+1])
    idx = np.arange(len(key))
    w_sum = c[idx + 1] - c[idx - m]
    w_n = m + 1
    out = pa.table({id_col: t[id_col], "key": t["key"], "us": t["us"],
                    "w_n": w_n.astype(np.int64),
                    "w_sum": w_sum.astype(np.int64)})
    return out.slice(skip)


def rolling_per_key(ds, *, k: int, key_col: str = "key",
                    ts_col: str = "us", id_col: str = "rid",
                    val_col: str = "val",
                    target_blocks: int | None = None):
    """Trailing ROWS-window aggregate — per key, each row's count and
    sum over the last ``k`` rows (itself included) in (ts, id) order:
    ``sum(val) OVER (PARTITION BY key ORDER BY us, id ROWS BETWEEN
    k-1 PRECEDING AND CURRENT ROW)``.  The per-row rolling-feature
    shape (trailing spend, rolling z-score numerators) that tumbling /
    sliding TIME windows (q_window_events / q_sliding_window) don't
    cover.

    Scale shape: ONE global sort, per-block vectorized cumsum windows,
    and an O(k)-rows-per-block remote tail CHAIN (not just the
    previous block's tail: a run of sub-k blocks must pass true
    context through, so tails chain sequentially — k is a small
    constant, the chain tasks are trivially cheap).  Integer-exact:
    callers pre-scale float values.
    """
    def pre(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b[id_col].cast(pa.int64()),
                         "key": b[key_col].cast(pa.int64()),
                         "us": b[ts_col].cast(pa.int64()),
                         "val": b[val_col].cast(pa.int64())})

    srt = ds.map_batches(pre, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .sort(["key", "us", id_col])
    if target_blocks:
        srt = srt.repartition(target_blocks)
    srt = srt.materialize()
    refs = srt.to_arrow_refs()
    if not refs:
        return srt
    empty = ray.put(_empty_roll(id_col))
    tails = []
    prev = empty
    for r in refs:
        prev = _chain_tail.remote(prev, r, k - 1)
        tails.append(prev)
    prev_tails = [empty, *tails[:-1]]
    return rd.from_arrow_refs(
        [_roll_block.remote(r, t, k, id_col)
         for r, t in zip(refs, prev_tails)])


# ----------------------- adjacent triple counts -----------------------

@ray.remote
def _triple_block(block: pa.Table, prev_tail: pa.Table) -> pa.Table:
    """(a, b, c) counts of per-key value triples whose LAST row lies
    in ``block``; ``prev_tail`` (<= 2 true predecessor rows) supplies
    the cross-boundary context."""
    skip = prev_tail.num_rows
    t = pa.concat_tables([prev_tail, block]) if skip else block
    n = t.num_rows
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "c": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if n < 3:
        return empty
    k = t["key"].to_numpy(zero_copy_only=False)
    v = t["val"].to_numpy(zero_copy_only=False)
    i = np.arange(2, n)
    ok = (k[i] == k[i - 1]) & (k[i - 1] == k[i - 2]) & (i >= max(skip, 2))
    i = i[ok]
    if not len(i):
        return empty
    import pandas as pd

    vc = pd.DataFrame({"a": v[i - 2], "b": v[i - 1], "c": v[i]}) \
        .groupby(["a", "b", "c"], sort=False).size().reset_index(name="n")
    return pa.table({"a": pa.array(vc["a"], pa.string()),
                     "b": pa.array(vc["b"], pa.string()),
                     "c": pa.array(vc["c"], pa.string()),
                     "n": vc["n"].to_numpy().astype(np.int64)})


def adjacent_triple_counts(ds, *, target_blocks: int | None = None):
    """Second-order Markov transition counts: how often value X, Y, Z
    occur as three CONSECUTIVE rows of one key in (us, tie) order —
    the 3-gram sequence-mining sibling of :func:`adjacent_pair_counts`.
    Input columns: key (int64), us, tie, val (string).

    Scale shape: one global sort, per-block vectorized triple counts,
    and the same O(2)-rows remote tail CHAIN as
    :func:`rolling_per_key` — a run of 1-row blocks still threads true
    context through, where a naive previous-block-only stitch would
    drop triples.  One O(distinct triples) merge groupby.
    """
    from ray.data.aggregate import Sum

    srt = ds.sort(["key", "us", "tie"])
    if target_blocks:
        srt = srt.repartition(target_blocks)
    srt = srt.materialize()
    refs = srt.to_arrow_refs()
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "c": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if not refs:
        return rd.from_arrow(empty)
    tails, prev = [], None
    for r in refs:
        prev = _chain_tail.remote(prev, r, 2) if prev is not None \
            else _chain_tail.remote(_first_empty.remote(r), r, 2)
        tails.append(prev)
    firsts = [_first_empty.remote(refs[0]), *tails[:-1]]
    outs = [_triple_block.remote(r, t) for r, t in zip(refs, firsts)]
    return rd.from_arrow_refs(outs).groupby(["a", "b", "c"]).aggregate(
        Sum("n", alias_name="n"))


@ray.remote
def _first_empty(block: pa.Table) -> pa.Table:
    """Zero-row table with the block's schema (typed empty tail)."""
    return block.slice(0, 0)


# ---------------- global watermark (exclusive running max) ----------------

WM_NONE = np.iinfo(np.int64).min  # "no preceding row" sentinel


@ray.remote
def _block_ts_max(block: pa.Table, ts_col: str):
    a = block[ts_col].to_numpy(zero_copy_only=False)
    return int(a.max()) if len(a) else None


@ray.remote
def _wm_block(block: pa.Table, ts_col: str, carry: int) -> pa.Table:
    ts = block[ts_col].to_numpy(zero_copy_only=False)
    if not len(ts):
        return block.append_column("wm", pa.array([], pa.int64()))
    inc = np.maximum.accumulate(ts)
    exc = np.empty_like(ts)
    exc[0] = WM_NONE
    exc[1:] = inc[:-1]
    return block.append_column(
        "wm", pa.array(np.maximum(exc, np.int64(carry))))


def watermark_assign(ds, *, order_cols, ts_col: str = "us",
                     target_blocks: int | None = None):
    """Streaming-watermark assignment: adds ``wm`` = max of ``ts_col``
    over all STRICTLY PRECEDING rows in the total order ``order_cols``
    (``max(ts) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND
    1 PRECEDING)``); the first row gets ``WM_NONE``.  Distributed as a
    classic two-wave scan: one tiny per-block max task wave, an
    O(blocks) driver exclusive-prefix over those scalars, then one
    patch wave applying each block's carry — no row ever leaves its
    block, so the stage streams at any scale.  ``order_cols`` must be
    a total order (ties would make "preceding" ambiguous)."""
    srt = ds.sort(list(order_cols))
    if target_blocks:
        srt = srt.repartition(target_blocks)
    srt = srt.materialize()
    refs = srt.to_arrow_refs()
    if not refs:
        return srt
    maxima = ray.get([_block_ts_max.remote(r, ts_col) for r in refs])
    carries, run = [], int(WM_NONE)
    for m in maxima:
        carries.append(run)
        if m is not None and m > run:
            run = m
    outs = [_wm_block.remote(r, ts_col, c) for r, c in zip(refs, carries)]
    return rd.from_arrow_refs(outs)


@ray.remote(num_returns=2)
def _cummax_block(tbl: pa.Table, payload_cols: list[str]):
    n = tbl.num_rows
    if n == 0 or "key" not in tbl.column_names:
        out = pa.table({c: pa.array([], type=pa.int64())
                        for c in (*payload_cols, "key", "us", "cum_max")})
        return out, None
    key = tbl["key"].to_numpy(zero_copy_only=False)
    val = tbl["val"].to_numpy(zero_copy_only=False).astype(np.int64)
    new_run = np.r_[True, key[1:] != key[:-1]]
    run_id = np.cumsum(new_run) - 1
    # segmented cummax: shift runs onto disjoint ASCENDING levels so
    # one maximum.accumulate never carries across a run boundary (an
    # earlier run's shifted max is strictly below the next run's
    # level floor)
    big = int(val.max()) - int(val.min()) + 1
    shifted = val + big * run_id
    cum = np.maximum.accumulate(shifted) - big * run_id
    cols = {c: tbl[c] for c in payload_cols}
    cols["key"] = pa.array(key.astype(np.int64))
    cols["us"] = tbl["us"]
    cols["cum_max"] = pa.array(cum.astype(np.int64))
    summary = {"first_key": int(key[0]), "last_key": int(key[-1]),
               "first_run_len": int(np.argmax(key != key[0]))
               if (key != key[0]).any() else n,
               "last_run_max": int(cum[-1])}
    return pa.table(cols), summary


@ray.remote
def _cummax_patch(tbl: pa.Table, first_run_len: int,
                  carry: int) -> pa.Table:
    cum = tbl["cum_max"].to_numpy(zero_copy_only=False).copy()
    cum[:first_run_len] = np.maximum(cum[:first_run_len], carry)
    return tbl.set_column(tbl.column_names.index("cum_max"), "cum_max",
                          pa.array(cum))


def cummax_per_key(ds, *, payload_cols: list[str], order_cols=("us",),
                   target_blocks: int | None = None):
    """Running maximum of ``val`` per ``key`` in (key, *order_cols)
    order — `max() OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED
    PRECEDING)` — the high-watermark sibling of
    :func:`cumsum_per_key` with the same one-sort / per-block-
    vectorized / O(1)-per-boundary-carry plan."""
    srt = ds.sort(["key", *order_cols])
    if target_blocks:
        srt = srt.repartition(target_blocks)
    srt = srt.materialize()
    refs = srt.to_arrow_refs()
    if not refs:
        return rd.from_arrow(pa.table(
            {c: pa.nulls(0, pa.int64())
             for c in (*payload_cols, "key", "us", "cum_max")}))
    parts = [_cummax_block.remote(r, payload_cols) for r in refs]
    tables = [p[0] for p in parts]
    summaries = ray.get([p[1] for p in parts])

    out_refs = []
    carry = None  # (key, running_max)
    for tref, s in zip(tables, summaries):
        if s is None:
            out_refs.append(tref)
            continue
        applied = carry is not None and carry[0] == s["first_key"]
        if applied:
            tref = _cummax_patch.remote(tref, s["first_run_len"],
                                        carry[1])
        out_max = s["last_run_max"]
        if applied and s["first_key"] == s["last_key"]:
            out_max = max(out_max, carry[1])
        carry = (s["last_key"], out_max)
        out_refs.append(tref)
    return rd.from_arrow_refs(out_refs)
