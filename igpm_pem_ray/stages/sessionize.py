"""Gap-based sessionization — a training-data / clickstream operator
(tumbling windows are in ``pipelines/relational.q_window_events``; this
is the data-dependent-window sibling).

Scale shape: ONE global sort by (key, ts) — the honest all-to-all —
then every block computes its internal sessions vectorized (numpy
flatnonzero + reduceat-style segment math, no per-group Python: a
``groupby(key).map_groups`` would pay Python per user, the known
map_groups-per-tiny-group cost).  Sessions that span adjacent sorted
blocks are stitched by the driver from per-block BOUNDARY summaries
only (first/last session per block, O(blocks) driver work); interior
sessions never leave the object store — the result Dataset is built
from the adjusted per-block tables plus one tiny driver table of
merged boundary sessions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

SESSION_SCHEMA = pa.schema([("user_id", pa.int64()),
                            ("session_start_us", pa.int64()),
                            ("n_events", pa.int64()),
                            ("duration_us", pa.int64())])


def _empty_sessions() -> pa.Table:
    z = np.empty(0, dtype=np.int64)
    return pa.table({"user_id": z, "start_us": z, "end_us": z, "n": z})


@ray.remote
def _block_sessions(tbl: pa.Table, gap_us: int) -> pa.Table:
    """Sessions fully computable inside one sorted block:
    (user_id, start_us, end_us, n) per session, in order."""
    if tbl.num_rows == 0 or "user_id" not in tbl.column_names:
        return _empty_sessions()
    u = tbl["user_id"].to_numpy(zero_copy_only=False)
    us = tbl["us"].to_numpy(zero_copy_only=False)
    new = np.r_[True, (u[1:] != u[:-1]) | (us[1:] - us[:-1] > gap_us)]
    starts = np.flatnonzero(new)
    ends = np.r_[starts[1:], len(us)] - 1
    return pa.table({
        "user_id": u[starts].astype(np.int64),
        "start_us": us[starts].astype(np.int64),
        "end_us": us[ends].astype(np.int64),
        "n": (ends - starts + 1).astype(np.int64),
    })


@ray.remote
def _bounds(sess: pa.Table):
    n = sess.num_rows
    if n == 0:
        return None
    first = {c: sess[c][0].as_py() for c in sess.column_names}
    last = {c: sess[c][n - 1].as_py() for c in sess.column_names}
    return {"n_sessions": n, "first": first, "last": last}


@ray.remote
def _trim(sess: pa.Table, drop_head: bool, drop_tail: bool) -> pa.Table:
    lo = 1 if drop_head else 0
    hi = sess.num_rows - (1 if drop_tail else 0)
    out = sess.slice(lo, max(0, hi - lo))
    return pa.table({
        "user_id": out["user_id"],
        "session_start_us": out["start_us"],
        "n_events": out["n"],
        "duration_us": pa.array(
            out["end_us"].to_numpy(zero_copy_only=False)
            - out["start_us"].to_numpy(zero_copy_only=False),
            type=pa.int64()),
    })


def sessionize(events_ds, *, gap_us: int = 30 * 60 * 1_000_000,
               key: str = "user_id", ts_col: str = "ts",
               target_blocks: int | None = None):
    """-> Dataset (user_id, session_start_us, n_events, duration_us):
    one row per maximal run of a user's events with inter-event gaps
    <= gap_us.  ``target_blocks`` re-splits the sorted table (order
    preserved) — the per-block parallelism knob, also used by tests to
    force sessions across block boundaries."""
    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b[key].cast(pa.int64()),
            "us": b[ts_col].cast(pa.int64()),
        })

    srt = events_ds.map_batches(pre, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .sort(["user_id", "us"])
    if target_blocks:
        # repartition after sort splits blocks without reordering rows
        srt = srt.repartition(target_blocks)
    srt = srt.materialize()
    refs = srt.to_arrow_refs()
    if not refs:
        return rd.from_arrow(SESSION_SCHEMA.empty_table())
    sess_refs = [_block_sessions.remote(r, gap_us) for r in refs]
    bounds = ray.get([_bounds.remote(s) for s in sess_refs])

    # driver stitch over block boundaries: O(blocks) work, no session
    # data beyond the two boundary summaries per block
    drop_head = [False] * len(refs)
    drop_tail = [False] * len(refs)
    merged_rows: list[tuple[int, int, int, int]] = []  # user,start,end,n
    carry = None  # open session dict(user_id,start_us,end_us,n)
    for i, b in enumerate(bounds):
        if b is None:
            continue
        first, last, ns = b["first"], b["last"], b["n_sessions"]
        if carry is not None:
            if first["user_id"] == carry["user_id"] and \
                    first["start_us"] - carry["end_us"] <= gap_us:
                drop_head[i] = True
                carry = {"user_id": carry["user_id"],
                         "start_us": carry["start_us"],
                         "end_us": first["end_us"],
                         "n": carry["n"] + first["n"]}
                if ns == 1:
                    continue  # whole block absorbed; carry stays open
                merged_rows.append((carry["user_id"], carry["start_us"],
                                    carry["end_us"], carry["n"]))
                carry = None
            else:
                merged_rows.append((carry["user_id"], carry["start_us"],
                                    carry["end_us"], carry["n"]))
                carry = None
        # open the block's last session as the new carry
        drop_tail[i] = True
        carry = dict(last)
    if carry is not None:
        merged_rows.append((carry["user_id"], carry["start_us"],
                            carry["end_us"], carry["n"]))

    trimmed = [_trim.remote(s, h, t)
               for s, h, t in zip(sess_refs, drop_head, drop_tail)]
    out = rd.from_arrow_refs(trimmed)
    if merged_rows:
        m = np.asarray(merged_rows, dtype=np.int64)
        out = out.union(rd.from_arrow(pa.table({
            "user_id": m[:, 0], "session_start_us": m[:, 1],
            "n_events": m[:, 3], "duration_us": m[:, 2] - m[:, 1],
        })))
    return out
