"""Relational / streaming / text-table queries with DuckDB oracles.

These wire the reference's operator surface (SURVEY.md section 2:
filters M2-M9, groupby/orderby/aggregate A1-A2/O1, joins J1-J5, dedup
D1-D4, window/timestamp ops, text analysis) onto the driver's testdata
tables so every operator has a side-by-side SQL oracle.

Float convention: every float is scaled to int64 PER ROW
(``floor(x*s+0.5)``) before any sum — integer aggregates are exact in
both engines regardless of reduction order, so value-hashes match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from igpm_pem_ray.functions.conditions import compile_condition
from igpm_pem_ray.pipelines.common import read_table, scale_col

STOP10 = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "are")
HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def _ts_us(batch: pa.Table, col: str = "ts") -> np.ndarray:
    return batch[col].cast(pa.int64()).to_numpy(zero_copy_only=False)


# ---------------- M2/M8: filter + project + computed column ----------------

def q_filter_project(sf_dir: str):
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity",
                             "l_extendedprice", "l_discount"])

    def f(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        keep = (qty > 30) & (disc <= 0.05)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        rev = price * (1.0 - disc[keep])
        return pa.table({
            "l_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
            "l_linenumber": batch["l_linenumber"].to_numpy(zero_copy_only=False)[keep].astype(np.int64),
            "revenue_e2": scale_col(rev, 100.0),
        })

    return li.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sql_filter_project() -> str:
    return ("SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, "
            "CAST(floor(l_extendedprice*(1.0-l_discount)*100.0+0.5) AS BIGINT) AS revenue_e2 "
            "FROM lineitem WHERE l_quantity > 30 AND l_discount <= 0.05")


# ---------------- A1/A2: grouped aggregates (TPC-H Q1 shape) ----------------

def q_group_agg(sf_dir: str):
    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount"])

    def pre(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_e2": scale_col(batch["l_quantity"].to_numpy(zero_copy_only=False), 100.0),
            "price_e2": scale_col(batch["l_extendedprice"].to_numpy(zero_copy_only=False), 100.0),
            "disc_e6": scale_col(batch["l_discount"].to_numpy(zero_copy_only=False), 1e6),
        })

    agg = li.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Count(alias_name="n_rows"),
            Sum("qty_e2", alias_name="sum_qty_e2"),
            Sum("price_e2", alias_name="sum_price_e2"),
            Sum("disc_e6", alias_name="sum_disc_e6"),
            Max("price_e2", alias_name="max_price_e2"),
            Min("qty_e2", alias_name="min_qty_e2"))
    pdf = agg.to_pandas()
    pdf["avg_disc_e6"] = (pdf["sum_disc_e6"] // pdf["n_rows"]).astype("int64")
    pdf["n_rows"] = pdf["n_rows"].astype("int64")
    return pa.Table.from_pandas(pdf, preserve_index=False)


def sql_group_agg() -> str:
    return (
        "SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(CAST(floor(l_quantity*100.0+0.5) AS BIGINT)) AS BIGINT) AS sum_qty_e2, "
        "CAST(sum(CAST(floor(l_extendedprice*100.0+0.5) AS BIGINT)) AS BIGINT) AS sum_price_e2, "
        "CAST(sum(CAST(floor(l_discount*1e6+0.5) AS BIGINT)) AS BIGINT) AS sum_disc_e6, "
        "max(CAST(floor(l_extendedprice*100.0+0.5) AS BIGINT)) AS max_price_e2, "
        "min(CAST(floor(l_quantity*100.0+0.5) AS BIGINT)) AS min_qty_e2, "
        "CAST(sum(CAST(floor(l_discount*1e6+0.5) AS BIGINT)) // count(*) AS BIGINT) AS avg_disc_e6 "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus")


# ---------------- O1/O2: order-by + top-k ----------------

def q_topk_orders(sf_dir: str):
    o = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def pre(batch: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "totalprice_e2": scale_col(
                             batch["o_totalprice"].to_numpy(zero_copy_only=False), 100.0)})

    top = o.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True) \
           .sort(["totalprice_e2", "o_orderkey"], descending=[True, False]).limit(10)
    return top


def sql_topk_orders() -> str:
    return ("SELECT o_orderkey, CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS totalprice_e2 "
            "FROM orders ORDER BY totalprice_e2 DESC, o_orderkey LIMIT 10")


# ---------------- J1: broadcast dimension join ----------------

def q_join_broadcast(sf_dir: str):
    """customers per region name: broadcast nation+region (small dims,
    ray.put once) into a map_batches lookup — no shuffle join
    (SURVEY.md J1 broadcast semi-join pattern)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    r_name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nk_to_region = {nk: r_name[rk] for nk, rk in
                    zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())}
    ref = ray.put(nk_to_region)

    def lookup(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        names = pd.Series(nk).map(m).to_numpy()
        return pa.table({
            "r_name": pa.array(names, type=pa.string()),
            "acctbal_e2": scale_col(batch["c_acctbal"].to_numpy(zero_copy_only=False), 100.0),
        })

    cust = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    return cust.map_batches(lookup, batch_format="pyarrow", zero_copy_batch=True) \
               .groupby("r_name").aggregate(Count(alias_name="n_customers"),
                                            Sum("acctbal_e2", alias_name="sum_acctbal_e2"))


def sql_join_broadcast() -> str:
    return (
        "SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_customers, "
        "CAST(sum(CAST(floor(c.c_acctbal*100.0+0.5) AS BIGINT)) AS BIGINT) AS sum_acctbal_e2 "
        "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name")


# ---------------- J2: large-large hash join ----------------

def q_join_hash(sf_dir: str):
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    j = orders.join(cust, join_type="inner", num_partitions=8,
                    on=("o_custkey",), right_on=("c_custkey",))

    def pre(batch: pa.Table) -> pa.Table:
        return pa.table({"c_mktsegment": batch["c_mktsegment"],
                         "totalprice_e2": scale_col(
                             batch["o_totalprice"].to_numpy(zero_copy_only=False), 100.0)})

    return j.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True) \
            .groupby("c_mktsegment").aggregate(
                Count(alias_name="n_orders"),
                Sum("totalprice_e2", alias_name="sum_totalprice_e2"))


def sql_join_hash() -> str:
    return ("SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(floor(o.o_totalprice*100.0+0.5) AS BIGINT)) AS BIGINT) AS sum_totalprice_e2 "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_mktsegment")


# ---------------- J-anti / J-semi ----------------

def q_anti_join(sf_dir: str):
    """Orders that have no lineitems, counted per orderstatus (D4/J
    anti-join — the reference's separate_exist_nodes difference side,
    gray_incremental.py:481-490)."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])
    anti = orders.join(li, join_type="left_anti", num_partitions=8,
                       on=("o_orderkey",), right_on=("l_orderkey",))
    return anti.groupby("o_orderstatus").aggregate(Count(alias_name="n_orders"))


def sql_anti_join() -> str:
    return ("SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders FROM orders o "
            "WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) "
            "GROUP BY o_orderstatus")


def q_semi_join(sf_dir: str):
    """Customers with at least one order > 200k, counted per nation
    (semi-join J5 'connectivity lookup' analog)."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    big = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]) \
        .filter(expr="o_totalprice > 200000")
    semi = cust.join(big, join_type="left_semi", num_partitions=8,
                     on=("c_custkey",), right_on=("o_custkey",))
    out = semi.groupby("c_nationkey").aggregate(Count(alias_name="n_customers")).to_pandas()
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def sql_semi_join() -> str:
    return ("SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(count(*) AS BIGINT) AS n_customers FROM customer c "
            "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND o.o_totalprice > 200000) GROUP BY c_nationkey")


# ---------------- streaming-shaped: windows + timestamp ops ----------------

def q_window_events(sf_dir: str):
    """Tumbling 1h window per event_type (SURVEY.md 2.9 window model)."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def pre(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch)
        return pa.table({
            "event_type": batch["event_type"],
            "window_start_us": (us // HOUR_US) * HOUR_US,
            "value_e2": scale_col(batch["value"].to_numpy(zero_copy_only=False), 100.0),
        })

    return ev.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby(["event_type", "window_start_us"]).aggregate(
                 Count(alias_name="n_events"),
                 Sum("value_e2", alias_name="sum_value_e2"))


def sql_window_events() -> str:
    return ("SELECT event_type, CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(floor(value*100.0+0.5) AS BIGINT)) AS BIGINT) AS sum_value_e2 "
            "FROM events GROUP BY event_type, window_start_us")


def q_ts_rebase(sf_dir: str):
    """Timestamp re-basing to day indices from the global min — the
    reference's seconds->days coercion (load_edgelist_timestamp.py:25,
    load_edgelist_dataverse.py:9-13; M9).  Global min aggregate then a
    vectorized subtract pass."""
    ev = read_table(sf_dir, "events", columns=["ts"])
    mn = ev.min("ts")
    mn_us = int(pd.Timestamp(mn).value // 1000)  # ns -> us

    def pre(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch)
        return pa.table({"day_idx": (us - mn_us) // DAY_US})

    return ev.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby("day_idx").aggregate(Count(alias_name="n_events"))


def sql_ts_rebase() -> str:
    return ("SELECT (epoch_us(ts) - (SELECT min(epoch_us(ts)) FROM events)) // 86400000000 "
            "AS day_idx, CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY day_idx")


def q_ts_window_filter(sf_dir: str):
    """Edges-with-add < limit filter analog (M8, load_edgelist.py:63):
    events in the first 12 hours from the stream start."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])
    mn_us = int(pd.Timestamp(ev.min("ts")).value // 1000)
    cut = mn_us + 12 * HOUR_US

    def pre(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch)
        keep = us < cut
        return pa.table({"event_type": batch["event_type"].filter(pa.array(keep))})

    return ev.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby("event_type").aggregate(Count(alias_name="n_events"))


def sql_ts_window_filter() -> str:
    return ("SELECT event_type, CAST(count(*) AS BIGINT) AS n_events FROM events "
            "WHERE epoch_us(ts) < (SELECT min(epoch_us(ts)) FROM events) + 43200000000 "
            "GROUP BY event_type")


def q_event_funnel(sf_dir: str):
    """Ordered three-stage funnel (signup -> click -> purchase) over
    the event stream: users who signed up, then clicked AFTER their
    first signup, then purchased AFTER that first qualifying click.
    Classic product-analytics operator; each stage is one per-user min
    aggregate + one user-keyed hash join + a vectorized ts filter —
    user_id-partitioned end-to-end, so a billion-user table shuffles
    by key instead of broadcasting."""
    ev = read_table(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def pre(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": batch["user_id"],
                         "t": _ts_us(batch),
                         "et": batch["event_type"]})

    base = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    def stage(prev, et: str, alias: str):
        """per-user min event time of type `et` strictly after prev's
        per-user cutoff column (`prev` has user_id + 'cut')."""
        cand = base.map_batches(
            lambda b, e=et: b.filter(pc.equal(b["et"], e))
            .select(["user_id", "t"]),
            batch_format="pyarrow")
        if prev is None:
            got = cand
        else:
            got = cand.join(prev, join_type="inner", num_partitions=8,
                            on=("user_id",)) \
                .map_batches(lambda b: b.filter(
                    pc.greater(b["t"], b["cut"])).select(["user_id", "t"]),
                    batch_format="pyarrow")
        return got.groupby("user_id").aggregate(
            Min("t", alias_name="cut")).materialize()

    a = stage(None, "signup", "a")
    b = stage(a, "click", "b")
    c = stage(b, "purchase", "c")
    return pa.table({
        "n_signup": pa.array([a.count()], pa.int64()),
        "n_signup_click": pa.array([b.count()], pa.int64()),
        "n_signup_click_purchase": pa.array([c.count()], pa.int64()),
    })


def sql_event_funnel() -> str:
    return (
        "WITH a AS (SELECT user_id, min(epoch_us(ts)) AS cut FROM events "
        "WHERE event_type='signup' GROUP BY user_id), "
        "b AS (SELECT e.user_id, min(epoch_us(e.ts)) AS cut FROM events e "
        "JOIN a ON e.user_id=a.user_id "
        "WHERE e.event_type='click' AND epoch_us(e.ts) > a.cut "
        "GROUP BY e.user_id), "
        "c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS cut FROM events e "
        "JOIN b ON e.user_id=b.user_id "
        "WHERE e.event_type='purchase' AND epoch_us(e.ts) > b.cut "
        "GROUP BY e.user_id) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_signup, "
        "(SELECT CAST(count(*) AS BIGINT) FROM b) AS n_signup_click, "
        "(SELECT CAST(count(*) AS BIGINT) FROM c) "
        "AS n_signup_click_purchase")


# ---------------- O6: seeded deterministic sampling ----------------

# affine-hash sampling constants: identical expression on both engines,
# so the "seed" is the (A, B, M, T) tuple — deterministic, shuffle-free
_SAMPLE_A, _SAMPLE_B, _SAMPLE_M, _SAMPLE_T = 2654435761, 97, 1 << 31, (1 << 31) // 20


def q_sample(sf_dir: str):
    """5% deterministic sample of orders (O6 seeded-sampling analog:
    the reference seeds random.* for reproducible batches,
    generator.py; here the sample is a pure function of the key, which
    is also restartable at any scale — no RNG state to checkpoint)."""
    o = read_table(sf_dir, "orders", columns=["o_orderkey"])

    def f(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * _SAMPLE_A + _SAMPLE_B) % _SAMPLE_M
        return pa.table({"o_orderkey": k[h < _SAMPLE_T]})

    return o.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sql_sample() -> str:
    return (f"SELECT o_orderkey FROM orders WHERE "
            f"(o_orderkey * {_SAMPLE_A} + {_SAMPLE_B}) % {_SAMPLE_M} < {_SAMPLE_T}")


# ---------------- M11/D2: distinct union of id sets ----------------

def q_distinct_union(sf_dir: str):
    ev = read_table(sf_dir, "events", columns=["user_id"]).rename_columns({"user_id": "uid"})
    oc = read_table(sf_dir, "orders", columns=["o_custkey"]).rename_columns({"o_custkey": "uid"})
    return ev.union(oc).groupby("uid").aggregate(Count(alias_name="_n")).drop_columns(["_n"])


def sql_distinct_union() -> str:
    return ("SELECT DISTINCT uid FROM (SELECT user_id AS uid FROM events "
            "UNION ALL SELECT o_custkey FROM orders)")


# ------------- sliding windows (overlapping assignment) -------------

SLIDE_STEP_US = 15 * 60 * 1_000_000   # 15 min hop
SLIDE_SPAN = 4                        # 4 hops = 1 h window


def q_sliding_window(sf_dir: str):
    """1h windows sliding every 15min per event_type: each event is
    flat-mapped to its SPAN covering windows (vectorized repeat/tile),
    then one count/sum groupby — the overlapping-window sibling of
    ``q_window_events``."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def assign(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch)
        base = us // SLIDE_STEP_US
        k = np.tile(np.arange(SLIDE_SPAN, dtype=np.int64), len(us))
        ws = (np.repeat(base, SLIDE_SPAN) - k) * SLIDE_STEP_US
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v = scale_col(batch["value"].to_numpy(zero_copy_only=False), 100.0)
        return pa.table({
            "event_type": np.repeat(et, SLIDE_SPAN),
            "window_start_us": ws,
            "value_e2": np.repeat(v, SLIDE_SPAN),
        })

    return ev.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True) \
             .groupby(["event_type", "window_start_us"]).aggregate(
                 Count(alias_name="n_events"),
                 Sum("value_e2", alias_name="sum_value_e2"))


def sql_sliding_window() -> str:
    return (
        "SELECT event_type, "
        f"CAST((CAST(epoch_us(ts) AS BIGINT) // {SLIDE_STEP_US} - k) "
        f"* {SLIDE_STEP_US} AS BIGINT) AS window_start_us, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(sum(CAST(floor(value*100.0+0.5) AS BIGINT)) AS BIGINT) "
        "AS sum_value_e2 "
        f"FROM events, range({SLIDE_SPAN}) t(k) "
        "GROUP BY event_type, window_start_us")


# ------------- deterministic train/val split (affine hash) -------------

SPLIT_A, SPLIT_B, SPLIT_M = 2654435761, 17, 1 << 31
VAL_PCT = 10  # val = lowest 10% of the hash ring


def q_train_val_split(sf_dir: str):
    """Deterministic 90/10 train/val document split by affine id hash
    — reproducible across runs/engines, no RNG state, filterable at
    the read at scale (the split column is a pure function of the
    id)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def tag(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (ids * SPLIT_A + SPLIT_B) % SPLIT_M
        return pa.table({
            "doc_id": ids,
            "split": np.where(h < SPLIT_M // VAL_PCT, "val", "train"),
        })

    return docs.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def sql_train_val_split() -> str:
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CASE WHEN "
        f"(doc_id * {SPLIT_A} + {SPLIT_B}) % {SPLIT_M} < {SPLIT_M // VAL_PCT} "
        "THEN 'val' ELSE 'train' END AS split FROM documents")


# ------------- exact per-group quantiles (rank selection) -------------

def q_quantile_events(sf_dir: str):
    """Exact p50/p90 of value per event_type — rank-selection plan:
    rank all rows per key (sort + block ranks + boundary offsets),
    join per-key counts, keep the rows at rank max(1, ceil(q*n))
    (DuckDB quantile_disc convention, probed), fold to one row per
    key.  Exact at any group size — no sketchy approximations."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type",
                                               "value"])

    def pre(b: pa.Table) -> pa.Table:
        # event_type hashed to int64 for the sort key; the string rides
        # along for output
        et = b["event_type"].to_numpy(zero_copy_only=False)
        codes = pd.util.hash_array(et.astype(str).astype(object)) \
            .astype(np.int64) >> 1
        return pa.table({
            "etk": codes,
            "event_type": b["event_type"],
            "value_e2": scale_col(b["value"].to_numpy(zero_copy_only=False),
                                  100.0),
            "event_id": b["event_id"].cast(pa.int64()),
        })

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    ranked = rank_per_group(rows, key="etk",
                            order=["value_e2", "event_id"],
                            descending=[False, False]).materialize()
    counts = rows.groupby("etk").aggregate(Count(alias_name="n"))
    joined = ranked.join(counts, join_type="inner", num_partitions=2,
                         on=("etk",))

    def pick(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        rank = b["rank"].to_numpy(zero_copy_only=False)
        v = b["value_e2"].to_numpy(zero_copy_only=False)
        t50 = np.maximum(1, np.ceil(0.5 * n).astype(np.int64))
        t90 = np.maximum(1, np.ceil(0.9 * n).astype(np.int64))
        is50 = rank == t50
        is90 = rank == t90
        keep = is50 | is90
        big = np.int64(np.iinfo(np.int64).min)
        return pa.table({
            "event_type": b["event_type"].take(
                pa.array(np.flatnonzero(keep))),
            "p50_e2": np.where(is50[keep], v[keep], big),
            "p90_e2": np.where(is90[keep], v[keep], big),
        })

    return joined.map_batches(pick, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Max("p50_e2", alias_name="p50_e2"),
            Max("p90_e2", alias_name="p90_e2"))


def sql_quantile_events() -> str:
    return (
        "SELECT event_type, "
        "CAST(quantile_disc(CAST(floor(value*100.0+0.5) AS BIGINT), 0.5) "
        "AS BIGINT) AS p50_e2, "
        "CAST(quantile_disc(CAST(floor(value*100.0+0.5) AS BIGINT), 0.9) "
        "AS BIGINT) AS p90_e2 "
        "FROM events GROUP BY event_type")


# ------------- sessionization (data-dependent windows) -------------

SESSION_GAP_US = 30 * 60 * 1_000_000


def q_sessionize(sf_dir: str):
    """Gap-based sessions per user (30 min inactivity closes a
    session): sort + per-block vectorized runs + boundary stitch, no
    per-group Python (stages/sessionize.py)."""
    from igpm_pem_ray.stages.sessionize import sessionize

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])
    return sessionize(ev, gap_us=SESSION_GAP_US)


def sql_sessionize() -> str:
    return (
        "WITH o AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, "
        "  lag(CAST(epoch_us(ts) AS BIGINT)) OVER "
        "    (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev "
        "  FROM events), "
        "m AS (SELECT user_id, us, CASE WHEN prev IS NULL OR "
        f"  us - prev > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s FROM o), "
        "s AS (SELECT user_id, us, sum(new_s) OVER "
        "  (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid "
        "  FROM m) "
        "SELECT user_id, CAST(min(us) AS BIGINT) AS session_start_us, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(max(us) - min(us) AS BIGINT) AS duration_us "
        "FROM s GROUP BY user_id, sid")


# -------- latest-record-per-key (recency dedup, SCD collapse) --------

def q_latest_events(sf_dir: str):
    """Latest event per user (ts desc, event_id desc tie-break) — the
    keep-newest dedup every training-data refresh needs.  Plan: max-ts
    aggregate, semi-join back at (user, ts), max-event_id aggregate —
    two single-key-ish shuffles, no per-group Python."""
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"].cast(pa.int64()),
                         "us": _ts_us(b),
                         "event_id": b["event_id"].cast(pa.int64())})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    latest_ts = rows.groupby("user_id").aggregate(
        Max("us", alias_name="us"))
    at_max = rows.join(latest_ts, join_type="inner", num_partitions=2,
                       on=("user_id", "us"))
    return at_max.groupby("user_id").aggregate(
        Max("us", alias_name="last_us"),
        Max("event_id", alias_name="last_event_id"))


def sql_latest_events() -> str:
    return (
        "SELECT user_id, CAST(max(us) AS BIGINT) AS last_us, "
        "CAST(max(event_id) AS BIGINT) AS last_event_id FROM ("
        "  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_id, "
        "  rank() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC) AS r"
        "  FROM events) WHERE r = 1 GROUP BY user_id")


# ------------- per-group top-k (partitioned row_number) -------------

def q_topk_per_customer(sf_dir: str):
    """Top-3 orders per customer by (price desc, orderkey asc) — the
    windowed row_number operator via sort + block-rank + O(blocks)
    boundary offsets (stages/ranked.py), no per-group Python."""
    from igpm_pem_ray.stages.ranked import topk_per_group

    od = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"].cast(pa.int64()),
            "price_e2": scale_col(
                b["o_totalprice"].to_numpy(zero_copy_only=False), 100.0),
            "o_orderkey": b["o_orderkey"].cast(pa.int64()),
        })

    rows = od.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    return topk_per_group(rows, key="o_custkey",
                          order=["price_e2", "o_orderkey"],
                          descending=[True, False], k=3)


def sql_topk_per_customer() -> str:
    return (
        "SELECT o_custkey, price_e2, o_orderkey, CAST(rank AS BIGINT) AS rank "
        "FROM (SELECT CAST(o_custkey AS BIGINT) AS o_custkey, "
        "  CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS price_e2, "
        "  CAST(o_orderkey AS BIGINT) AS o_orderkey, "
        "  row_number() OVER (PARTITION BY o_custkey ORDER BY "
        "    floor(o_totalprice*100.0+0.5) DESC, o_orderkey ASC) AS rank "
        "  FROM orders) WHERE rank <= 3")


# ---------------- M2: condition-expression language ----------------

COND_EXPR = "l_extendedprice * (1 - l_discount) > 50000 AND NOT l_returnflag == 'A'"


def q_condition_filter(sf_dir: str):
    """Filter via the compiled condition language (reference
    ConditionParser semantics), then count per returnflag."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_extendedprice", "l_discount", "l_returnflag"])
    cond = compile_condition(COND_EXPR)
    return li.map_batches(lambda df: df[cond(df)], batch_format="pandas") \
             .groupby("l_returnflag").aggregate(Count(alias_name="n_rows"))


def sql_condition_filter() -> str:
    return ("SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows FROM lineitem "
            "WHERE l_extendedprice * (1 - l_discount) > 50000 AND NOT l_returnflag = 'A' "
            "GROUP BY l_returnflag")


# ---------------- documents: dedup + text analysis ----------------

def q_doc_dedup_exact(sf_dir: str):
    """Exact dedup stays a Dataset end to end: the winner table is
    sorted by Dataset.sort (range-partition shuffle), never collected
    to driver pandas — at 100 TB the winner list is itself huge."""
    from igpm_pem_ray.text.dedup import exact_dedup

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup(docs).select_columns(["doc_id"]).sort("doc_id")


def sql_doc_dedup_exact() -> str:
    # same winner rule: min doc_id per exact (whitespace-normalized) text;
    # explicit ASCII whitespace class matches the engine's fingerprint64
    # normalization exactly (tabs/newlines included, unicode spaces not)
    return ("SELECT min(doc_id) AS doc_id FROM documents "
            "GROUP BY trim(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g')) "
            "ORDER BY doc_id")


def q_doc_tokens(sf_dir: str):
    from igpm_pem_ray.text.analysis import token_count

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "n_tokens": token_count(df["text"])})

    return docs.map_batches(f, batch_format="pandas")


def sql_doc_tokens() -> str:
    return ("SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
            "CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens "
            "FROM documents")


def q_doc_quality(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    stop = frozenset(STOP10)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        toks = text.str.split()
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars": text.str.len().astype("int64"),
            "n_tokens": toks.str.len().astype("int64"),
            "n_stopwords": toks.map(
                lambda ws: sum(1 for w in ws if w in stop) if isinstance(ws, list) else 0
            ).astype("int64"),
        })

    return docs.map_batches(f, batch_format="pandas")


def sql_doc_quality() -> str:
    stops = ", ".join(f"'{w}'" for w in STOP10)
    return (
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
        "CASE WHEN trim(text) = '' THEN 0 ELSE "
        "CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens, "
        "CASE WHEN trim(text) = '' THEN 0 ELSE "
        f"CAST(length(list_filter(string_split_regex(trim(text), '\\s+'), x -> x IN ({stops}))) AS BIGINT) END "
        "AS n_stopwords FROM documents")


def q_lang_dist(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["lang"])
    return docs.groupby("lang").aggregate(Count(alias_name="n_docs"))


def sql_lang_dist() -> str:
    return "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang"


# ---------------- embeddings: ANN cosine top-k ----------------

ANN_K = 10


def q_ann_cosine(sf_dir: str):
    from igpm_pem_ray.ann.knn import brute_force_topk

    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "==", 0)])
    qvec = np.asarray(qtbl["embedding"][0].as_py(), dtype=np.float64)[None, :]
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    top = brute_force_topk(emb, qvec, k=ANN_K)
    return pa.table({"vec_id": top["vec_id"],
                     "sim_e4": scale_col(top["sim"].to_numpy(), 1e4)})


EMBED_DUP_T = 0.4  # testdata embeddings are random (max sim ~0.51)


def q_embed_near_dup(sf_dir: str):
    """Embedding-cosine near-dup pairs (driver-spec dedup variant):
    exact all-pairs over the threshold, streamed block x broadcast;
    the pair table stays a Dataset end to end (Dataset.sort, the
    q_doc_dedup_exact convention — no full-result driver pandas)."""
    from igpm_pem_ray.ann.embed_dedup import cosine_pairs

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_pairs(emb, threshold=EMBED_DUP_T).map_batches(
        lambda b: pa.table({
            "id_a": b["id_a"].cast(pa.int64()),
            "id_b": b["id_b"].cast(pa.int64()),
            "sim_e4": scale_col(
                b["sim"].to_numpy(zero_copy_only=False), 1e4)}),
        batch_format="pyarrow", zero_copy_batch=True) \
        .sort(["id_a", "id_b"])


def sql_embed_near_dup() -> str:
    # DOUBLE[] cast: float32 cosine would diverge from the engine's
    # float64 math (same convention as sql_ann_cosine)
    sim = "list_cosine_similarity(a.e, b.e)"
    return (
        "WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) "
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        f"CAST(floor({sim}*1e4+0.5) AS BIGINT) AS sim_e4 "
        f"FROM n a JOIN n b ON a.vec_id < b.vec_id WHERE {sim} >= {EMBED_DUP_T}")


def sql_ann_cosine() -> str:
    # cast to DOUBLE[]: duckdb's float32 cosine would diverge from the
    # engine's float64 math by ~1e-6 (visible at the 1e4 grid)
    q = "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
    sim = f"list_cosine_similarity(CAST(embedding AS DOUBLE[]), {q})"
    return (f"SELECT vec_id, CAST(floor({sim}*1e4+0.5) AS BIGINT) AS sim_e4 "
            f"FROM embeddings ORDER BY {sim} DESC, vec_id LIMIT {ANN_K}")


# ------------- temporal joins (as-of / range / running total) -------------
# Custom operators the brief names (as-of join, range join, windowed
# aggregate) that Ray Data has no built-in for — stages/temporal.py.

ATTRIB_WINDOW_US = HOUR_US  # purchase -> click attribution window


def q_asof_attrib(sf_dir: str):
    """As-of join: every 'click' event joined to the same user's
    latest 'purchase' at-or-before it (ties at equal ts -> max value).
    Sort + per-block vectorized forward fill + O(1)/boundary stitch
    (stages/temporal.asof_join); -1 sentinels for never-purchased."""
    from ray.data.aggregate import Max

    from igpm_pem_ray.stages.temporal import asof_join

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type",
                             "value"])

    def pre_build(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["event_type"], "purchase")
        b = b.filter(keep)
        return pa.table({"key": b["user_id"].cast(pa.int64()),
                         "us": b["ts"].cast(pa.int64()),
                         "val": scale_col(
                             b["value"].to_numpy(zero_copy_only=False),
                             1e6)})

    def pre_probe(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["event_type"], "click")
        b = b.filter(keep)
        return pa.table({"key": b["user_id"].cast(pa.int64()),
                         "us": b["ts"].cast(pa.int64()),
                         "event_id": b["event_id"].cast(pa.int64())})

    build = ev.map_batches(pre_build, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby(["key", "us"]).aggregate(Max("val", alias_name="val"))
    probe = ev.map_batches(pre_probe, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = asof_join(build, probe, payload_cols=["event_id"])

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b["event_id"],
                         "user_id": b["key"],
                         "us": b["us"],
                         "purch_us": b["asof_us"],
                         "purch_value_e6": b["asof_val"]})

    return out.map_batches(rename, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_asof_attrib() -> str:
    return (
        "WITH p AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, "
        "  max(CAST(floor(value*1e6+0.5) AS BIGINT)) AS val FROM events "
        "  WHERE event_type = 'purchase' GROUP BY 1, 2), "
        "c AS (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us "
        "  FROM events WHERE event_type = 'click'), "
        "m AS (SELECT c.event_id, c.user_id, c.us, max(p.us) AS purch_us "
        "  FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.us <= c.us "
        "  GROUP BY 1, 2, 3) "
        "SELECT m.event_id, m.user_id, m.us, "
        "COALESCE(m.purch_us, -1) AS purch_us, "
        "COALESCE(p.val, -1) AS purch_value_e6 "
        "FROM m LEFT JOIN p ON p.user_id = m.user_id AND p.us = m.purch_us")


def q_range_join(sf_dir: str):
    """Range join: clicks inside [purchase_ts, purchase_ts + 1h) of
    the same user, aggregated per purchase — bucketed interval join
    (explode intervals to <= 2 one-hour buckets, hash join on
    (user, bucket), exact containment filter; stages/temporal.py)."""
    from igpm_pem_ray.stages.temporal import range_join_agg

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type",
                             "value"])

    def pre_iv(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "purchase"))
        return pa.table({"iv_id": b["event_id"].cast(pa.int64()),
                         "key": b["user_id"].cast(pa.int64()),
                         "start_us": b["ts"].cast(pa.int64())})

    def pre_pt(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "click"))
        return pa.table({"key": b["user_id"].cast(pa.int64()),
                         "us": b["ts"].cast(pa.int64()),
                         "val": scale_col(
                             b["value"].to_numpy(zero_copy_only=False),
                             1e6)})

    iv = ev.map_batches(pre_iv, batch_format="pyarrow",
                        zero_copy_batch=True)
    pt = ev.map_batches(pre_pt, batch_format="pyarrow",
                        zero_copy_batch=True)
    out = range_join_agg(iv, pt, width_us=ATTRIB_WINDOW_US)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"purch_id": b["iv_id"],
                         "user_id": b["key"],
                         "n_clicks": b["n_points"].cast(pa.int64()),
                         "sum_click_value_e6": b["sum_val"].cast(pa.int64())})

    return out.map_batches(rename, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_range_join() -> str:
    return (
        "SELECT p.event_id AS purch_id, p.user_id, "
        "CAST(count(*) AS BIGINT) AS n_clicks, "
        "CAST(sum(CAST(floor(c.value*1e6+0.5) AS BIGINT)) AS BIGINT) "
        "  AS sum_click_value_e6 "
        "FROM events p JOIN events c ON c.user_id = p.user_id "
        "AND c.event_type = 'click' "
        "AND epoch_us(c.ts) >= epoch_us(p.ts) "
        f"AND epoch_us(c.ts) < epoch_us(p.ts) + {ATTRIB_WINDOW_US} "
        "WHERE p.event_type = 'purchase' GROUP BY 1, 2")


def q_cumsum_orders(sf_dir: str):
    """Per-customer running order total in (o_orderdate, o_orderkey)
    order — `sum() OVER (PARTITION BY ... ROWS UNBOUNDED PRECEDING)`
    via sort + per-block prefix sums + O(1)/boundary carry
    (stages/temporal.cumsum_per_key)."""
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    od = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_orderdate",
                             "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"key": b["o_custkey"].cast(pa.int64()),
                         "us": b["o_orderdate"].cast(pa.int64()),
                         "o_orderkey": b["o_orderkey"].cast(pa.int64()),
                         "val": scale_col(
                             b["o_totalprice"].to_numpy(zero_copy_only=False),
                             100.0)})

    rows = od.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)
    out = cumsum_per_key(rows, payload_cols=["o_orderkey"],
                         order_cols=("us", "o_orderkey"))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["key"],
                         "cum_spend_e2": b["cum_val"]})

    return out.map_batches(rename, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_cumsum_orders() -> str:
    return (
        "SELECT o_orderkey, o_custkey, "
        "CAST(sum(CAST(floor(o_totalprice*100.0+0.5) AS BIGINT)) OVER ("
        "  PARTITION BY o_custkey "
        "  ORDER BY epoch_us(o_orderdate), o_orderkey "
        "  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_spend_e2 "
        "FROM orders")


# -------- inter-event gaps (lag-diff window aggregate) --------

def q_event_gaps(sf_dir: str):
    """Per-user inter-event time statistics — the lag()-window shape
    `us - lag(us) OVER (PARTITION BY user_id ORDER BY us)` aggregated
    to (n, min, max, sum) per user via sort + per-block reduceat
    partials + O(blocks) boundary stitch
    (stages/temporal.gap_stats_per_key); users with >= 2 events."""
    from igpm_pem_ray.stages.temporal import gap_stats_per_key

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"key": b["user_id"].cast(pa.int64()),
                         "us": b["ts"].cast(pa.int64())})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)
    out = gap_stats_per_key(rows)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["key"],
                         "n_gaps": b["n_gaps"],
                         "min_gap_us": b["min_gap"],
                         "max_gap_us": b["max_gap"],
                         "sum_gap_us": b["sum_gap"]})

    return out.map_batches(rename, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_event_gaps() -> str:
    return (
        "WITH o AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, "
        "  lag(CAST(epoch_us(ts) AS BIGINT)) OVER "
        "    (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev "
        "  FROM events), "
        "g AS (SELECT user_id, us - prev AS gap FROM o "
        "  WHERE prev IS NOT NULL) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps, "
        "CAST(min(gap) AS BIGINT) AS min_gap_us, "
        "CAST(max(gap) AS BIGINT) AS max_gap_us, "
        "CAST(sum(gap) AS BIGINT) AS sum_gap_us "
        "FROM g GROUP BY user_id ORDER BY user_id")


def q_approx_quantiles_price(sf_dir: str):
    """DDSketch (alpha=0.01 relative error) quantiles of
    o_totalprice — rows-only (approximate by construction); the
    error bound vs exact numpy quantiles is pinned by
    tests/test_text.py::test_ddsketch_error_bound."""
    from igpm_pem_ray.text.sketch import approx_quantiles

    od = read_table(sf_dir, "orders", columns=["o_totalprice"])
    t = approx_quantiles(od, col="o_totalprice",
                         qs=[0.5, 0.9, 0.99], alpha=0.01)
    return pa.table({"q_e6": t["q_e6"],
                     "approx_e2": scale_col(t["approx"].to_numpy(), 100.0)})


# -------- full-outer join (disjoint-side reconciliation) --------

def q_join_outer(sf_dir: str):
    """Full-outer join of two PARTIALLY overlapping derived sets —
    high-balance customers vs customers with >= 8 orders — with
    COALESCEd measures and side flags.  Executed as a tagged union +
    ONE groupby(key) aggregate (join-as-aggregation): the same single
    hash shuffle a full_outer hash join costs, but immune to the
    empty-hash-partition schema loss Ray's native full_outer hits
    when one side is a small filtered aggregate (every non-inner
    Dataset.join fails on a partition that receives zero left blocks;
    observed on ray 2.49, hence this plan)."""
    from ray.data.aggregate import Count, Sum

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def highbal(b: pa.Table) -> pa.Table:
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        keep = bal > 9000.0
        n = int(keep.sum())
        return pa.table({
            "custkey": b["c_custkey"].to_numpy(zero_copy_only=False)[keep],
            "acctbal_e2": scale_col(bal[keep], 100.0),
            "n_orders": np.zeros(n, np.int64),
            "side": np.ones(n, np.int64)})

    hb = cust.map_batches(highbal, batch_format="pyarrow",
                          zero_copy_batch=True)
    freq = read_table(sf_dir, "orders", columns=["o_custkey"]) \
        .groupby("o_custkey").aggregate(Count(alias_name="n_orders")) \
        .filter(expr="n_orders >= 8")

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "custkey": b["o_custkey"],
            "acctbal_e2": np.zeros(n, np.int64),
            "n_orders": b["n_orders"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            "side": np.full(n, 2, np.int64)})

    fr = freq.map_batches(tag_right, batch_format="pyarrow")
    merged = hb.union(fr).groupby("custkey").aggregate(
        Sum("acctbal_e2", alias_name="acctbal_e2"),
        Sum("n_orders", alias_name="n_orders"),
        Sum("side", alias_name="side"))

    def finish(b: pa.Table) -> pa.Table:
        side = b["side"].to_numpy(zero_copy_only=False)
        return pa.table({
            "custkey": b["custkey"],
            "high_balance": (side & 1).astype(np.int64),
            "frequent": (side >> 1).astype(np.int64),
            "acctbal_e2": b["acctbal_e2"].cast(pa.int64()),
            "n_orders": b["n_orders"].cast(pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def sql_join_outer() -> str:
    return (
        "WITH hb AS (SELECT c_custkey, "
        "CAST(floor(c_acctbal*100.0+0.5) AS BIGINT) AS acctbal_e2 "
        "FROM customer WHERE c_acctbal > 9000.0), "
        "freq AS (SELECT o_custkey, count(*) AS n FROM orders "
        "GROUP BY o_custkey HAVING count(*) >= 8) "
        "SELECT COALESCE(hb.c_custkey, freq.o_custkey) AS custkey, "
        "CAST(hb.c_custkey IS NOT NULL AS BIGINT) AS high_balance, "
        "CAST(freq.o_custkey IS NOT NULL AS BIGINT) AS frequent, "
        "COALESCE(hb.acctbal_e2, 0) AS acctbal_e2, "
        "CAST(COALESCE(freq.n, 0) AS BIGINT) AS n_orders "
        "FROM hb FULL OUTER JOIN freq ON freq.o_custkey = hb.c_custkey "
        "ORDER BY custkey")


def q_heavy_hitter_tokens(sf_dir: str):
    """Misra-Gries top tokens of the corpus (k=32 counters/block) —
    rows-only (approximate by construction; the n/(k+1) guarantee is
    pinned by tests/test_text.py::test_misra_gries_guarantee)."""
    from igpm_pem_ray.text.sketch import heavy_hitters

    docs = read_table(sf_dir, "documents", columns=["text"])
    return heavy_hitters(docs, col="text", k=32, tokenize=True)


def q_approx_token_freq(sf_dir: str):
    """Count-Min point-frequency estimates for a fixed probe list —
    rows-only (approximate by construction; never-undercount +
    overcount bound + exact linear-merge algebra pinned by
    tests/test_text.py::test_count_min_*).  The bounded-memory
    lookup companion to `heavy_hitter_tokens`."""
    from igpm_pem_ray.text.sketch import approx_token_freq

    docs = read_table(sf_dir, "documents", columns=["text"])
    return approx_token_freq(docs, col="text",
                             probes=["join", "hash", "stream", "the",
                                     "window", "zzz_absent"])


# -------- stratified sampling (per-group deterministic fractions) --------

_STRATA_PERMILLE = {"BUILDING": 300, "AUTOMOBILE": 200}
_STRATA_DEFAULT = 100


def q_stratified_sample(sf_dir: str):
    """Per-segment deterministic sample of customers — 30% BUILDING,
    20% AUTOMOBILE, 10% everything else, selected by the same
    RNG-free affine-hash ring as the train/val split
    ((c_custkey * 2654435761) mod 1000 < permille), so the sample is
    stable across engines and reruns.  One stateless filter map, no
    shuffle."""
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def pick(b: pa.Table) -> pa.Table:
        key = b["c_custkey"].to_numpy(zero_copy_only=False)
        seg = b["c_mktsegment"].to_pylist()
        permille = np.array([_STRATA_PERMILLE.get(s, _STRATA_DEFAULT)
                             for s in seg], np.int64)
        keep = (key * 2654435761) % 1000 < permille
        return pa.table({
            "c_custkey": key[keep],
            "c_mktsegment": pa.array([s for s, k in zip(seg, keep) if k],
                                     pa.string()),
            "acctbal_e2": scale_col(
                b["c_acctbal"].to_numpy(zero_copy_only=False)[keep],
                100.0)})

    return cust.map_batches(pick, batch_format="pyarrow",
                            zero_copy_batch=True)


def sql_stratified_sample() -> str:
    return (
        "SELECT c_custkey, c_mktsegment, "
        "CAST(floor(c_acctbal*100.0+0.5) AS BIGINT) AS acctbal_e2 "
        "FROM customer "
        "WHERE (c_custkey * 2654435761) % 1000 < "
        "CASE c_mktsegment WHEN 'BUILDING' THEN 300 "
        "WHEN 'AUTOMOBILE' THEN 200 ELSE 100 END "
        "ORDER BY c_custkey")


# -------- interval-overlap join --------

_DAY_US = 86_400_000_000


def q_overlap_join(sf_dir: str):
    """Per big order (o_totalprice > 400k), the number of DISTINCT
    discounted-R shipment windows [l_shipdate, +3d) overlapping the
    order's week [o_orderdate, +7d): two-sided bucket expansion +
    equi join on bucket + exact overlap filter + pair-distinct
    (stages/temporal.overlap_join_count)."""
    from igpm_pem_ray.stages.temporal import overlap_join_count

    od = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def big(b: pa.Table) -> pa.Table:
        tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
        keep = tp > 400_000.0
        start = b["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        return pa.table({"aid": b["o_orderkey"].to_numpy(
                             zero_copy_only=False)[keep],
                         "a_start": start,
                         "a_end": start + 7 * _DAY_US})

    a = od.map_batches(big, batch_format="pyarrow", zero_copy_batch=True)
    li = read_table(sf_dir, "lineitem",
                    columns=["l_shipdate", "l_discount", "l_returnflag"])

    def disc(b: pa.Table) -> pa.Table:
        d = b["l_discount"].to_numpy(zero_copy_only=False)
        rf = np.asarray(b["l_returnflag"].to_pylist(), dtype=object)
        keep = (d >= 0.09) & (rf == "R")
        start = b["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        return pa.table({"b_start": start,
                         "b_end": start + 3 * _DAY_US})

    from ray.data.aggregate import Min as _Min

    bset = li.map_batches(disc, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["b_start", "b_end"]) \
        .aggregate(_Min("b_start", alias_name="_m")).drop_columns(["_m"])
    out = overlap_join_count(a, bset, bucket_us=7 * _DAY_US)

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["aid"],
                         "n_overlaps": b["n_overlaps"].cast(pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow")


def sql_overlap_join() -> str:
    day = _DAY_US
    return (
        f"WITH a AS (SELECT o_orderkey, "
        f"CAST(epoch_us(o_orderdate) AS BIGINT) AS s, "
        f"CAST(epoch_us(o_orderdate) AS BIGINT) + {7 * day} AS e "
        f"FROM orders WHERE o_totalprice > 400000.0), "
        f"b AS (SELECT DISTINCT CAST(epoch_us(l_shipdate) AS BIGINT) "
        f"AS s, CAST(epoch_us(l_shipdate) AS BIGINT) + {3 * day} AS e "
        f"FROM lineitem WHERE l_discount >= 0.09 "
        f"AND l_returnflag = 'R') "
        f"SELECT a.o_orderkey, CAST(count(*) AS BIGINT) AS n_overlaps "
        f"FROM a JOIN b ON a.s < b.e AND b.s < a.e "
        f"GROUP BY a.o_orderkey ORDER BY a.o_orderkey")


# -------- regex scrub + extract (PII-redaction shape) --------

def q_props_scrub(sf_dir: str):
    """Redact digit runs from the events ``props`` JSON string and
    extract the "k" field — the PII-scrubbing / field-extraction
    map shape (compiled-regex pandas str kernels, stateless, no
    shuffle).  (event_id, k, n_redacted, scrubbed)."""
    ev = read_table(sf_dir, "events", columns=["event_id", "props"])

    def scrub(pdf):
        import pandas as pd

        s = pdf["props"].astype("string")
        k = s.str.extract(r'"k": ([0-9]+)', expand=False).astype("int64")
        n = s.str.count(r"[0-9]+").astype("int64")
        red = s.str.replace(r"[0-9]+", "#", regex=True)
        return pd.DataFrame({"event_id": pdf["event_id"],
                             "k": k, "n_redacted": n, "scrubbed": red})

    return ev.map_batches(scrub, batch_format="pandas")


def sql_props_scrub() -> str:
    return (
        "SELECT event_id, "
        "CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS BIGINT) AS k, "
        "CAST(length(regexp_extract_all(props, '[0-9]+')) AS BIGINT) "
        "AS n_redacted, "
        "regexp_replace(props, '[0-9]+', '#', 'g') AS scrubbed "
        "FROM events ORDER BY event_id")


def q_kmeans_embed(sf_dir: str):
    """Distributed Lloyd's k-means (k=8, 5 iters) over the embeddings
    table — (cluster, n, centroid_norm_e6); rows-only (float
    iteration), pinned to a single-process numpy Lloyd's oracle in
    tests/test_text.py::test_kmeans_matches_numpy_lloyds."""
    from igpm_pem_ray.ann.kmeans import kmeans_fit

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents, counts = kmeans_fit(emb, k=8, n_iters=5)
    norms = np.sqrt((cents * cents).sum(axis=1))
    return pa.table({"cluster": np.arange(8, dtype=np.int64),
                     "n": counts,
                     "centroid_norm_e6": scale_col(norms, 1e6)})


def q_quantile_cont_events(sf_dir: str):
    """Interpolated (quantile_cont) p50/p90 of value per event_type —
    the rank-selection plan extended to TWO picked ranks per quantile
    (floor/ceil of pos = (n-1)*q, the probed DuckDB convention) and
    one fixed-order interpolation expression, e4 fixed-point."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type",
                                               "value"])

    def pre(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        codes = pd.util.hash_array(et.astype(str).astype(object)) \
            .astype(np.int64) >> 1
        return pa.table({
            "etk": codes,
            "event_type": b["event_type"],
            "value_e2": scale_col(b["value"].to_numpy(zero_copy_only=False),
                                  100.0),
            "event_id": b["event_id"].cast(pa.int64()),
        })

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    ranked = rank_per_group(rows, key="etk",
                            order=["value_e2", "event_id"],
                            descending=[False, False]).materialize()
    counts = rows.groupby("etk").aggregate(Count(alias_name="n"))
    joined = ranked.join(counts, join_type="inner", num_partitions=2,
                         on=("etk",))
    QS = (("p50", 0.5), ("p90", 0.9))

    def pick(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        rank = b["rank"].to_numpy(zero_copy_only=False)
        v = b["value_e2"].to_numpy(zero_copy_only=False).astype(np.float64)
        big = float(np.iinfo(np.int64).min)
        cols = {"event_type": []}
        keep_any = np.zeros(len(rank), dtype=bool)
        parts = {}
        for nm, q in QS:
            pos = (n - 1.0) * q
            lo = np.floor(pos) + 1.0   # 1-based rank of the low row
            hi = np.ceil(pos) + 1.0
            frac = pos - np.floor(pos)
            is_lo = rank == lo
            is_hi = rank == hi
            parts[nm] = (is_lo, is_hi, frac)
            keep_any |= is_lo | is_hi
        idx = np.flatnonzero(keep_any)
        out = {"event_type": b["event_type"].take(pa.array(idx))}
        for nm, q in QS:
            is_lo, is_hi, frac = parts[nm]
            # ship (v_lo, v_hi*frac-ish) pieces as maxes; the final
            # interpolation happens after the fold so the expression
            # order is fixed: lo + (hi - lo) * frac
            out[f"{nm}_lo"] = np.where(is_lo[idx], v[idx], big)
            out[f"{nm}_hi"] = np.where(is_hi[idx], v[idx], big)
            out[f"{nm}_frac"] = np.where(is_lo[idx] | is_hi[idx],
                                         frac[idx], big)
        return pa.table(out)

    folded = joined.map_batches(pick, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            *[agg for nm, _ in QS for agg in (
                Max(f"{nm}_lo", alias_name=f"{nm}_lo"),
                Max(f"{nm}_hi", alias_name=f"{nm}_hi"),
                Max(f"{nm}_frac", alias_name=f"{nm}_frac"))])

    def interp(b: pa.Table) -> pa.Table:
        out = {"event_type": b["event_type"]}
        for nm, _ in QS:
            lo = b[f"{nm}_lo"].to_numpy(zero_copy_only=False)
            hi = b[f"{nm}_hi"].to_numpy(zero_copy_only=False)
            fr = b[f"{nm}_frac"].to_numpy(zero_copy_only=False)
            val = lo + (hi - lo) * fr
            out[f"{nm}_e4"] = np.floor(val * 100.0 + 0.5).astype(np.int64)
        return pa.table(out)

    return folded.map_batches(interp, batch_format="pyarrow")


def sql_quantile_cont_events() -> str:
    v = "CAST(floor(value*100.0+0.5) AS BIGINT)"
    return (
        f"SELECT event_type, "
        f"CAST(floor(quantile_cont({v}, 0.5)*100.0+0.5) AS BIGINT) "
        f"AS p50_e4, "
        f"CAST(floor(quantile_cont({v}, 0.9)*100.0+0.5) AS BIGINT) "
        f"AS p90_e4 "
        f"FROM events GROUP BY event_type ORDER BY event_type")


# -------- Bloom-prefiltered semi-join --------

def q_bloom_semi_join(sf_dir: str):
    """Same result as `semi_join` (lineitems of high-value orders per
    returnflag) but through a BLOOM PREFILTER: per-block bit-array
    partials over the build side (OR-merged on the driver — KB-sized
    regardless of rows), broadcast once, fact side drops definite
    misses BEFORE the exact verify, which removes the false positives
    — so the output is bit-identical to the plain semi-join and the
    same SQL oracle applies.  At 10^12 fact rows the filter kills the
    shuffle volume; the exact verify here is the same broadcast
    np.isin the semi-join uses (at larger build sides it becomes the
    hash join, Bloom still prefiltering)."""
    import ray as _ray

    M = 1 << 16  # bits
    K = 4        # hash probes

    def bloom_hashes(keys: np.ndarray) -> np.ndarray:
        h = keys.astype(np.uint64, copy=True)
        out = np.empty((K, len(keys)), dtype=np.int64)
        for i in range(K):
            c = (0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF
            z = (h + np.uint64(c))
            z ^= z >> np.uint64(30)
            z *= np.uint64(0xBF58476D1CE4E5B9)
            z ^= z >> np.uint64(27)
            out[i] = (z % np.uint64(M)).astype(np.int64)
        return out

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def build_block(b: pa.Table) -> pa.Table:
        tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
        keys = b["o_orderkey"].to_numpy(zero_copy_only=False)[tp > 300_000.0]
        bits = np.zeros(M // 8, dtype=np.uint8)
        if len(keys):
            hs = bloom_hashes(keys).ravel()
            np.bitwise_or.at(bits, hs // 8,
                             (1 << (hs % 8)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary()),
                         "keys": pa.array([keys.tolist()],
                                          pa.list_(pa.int64()))})

    parts = orders.map_batches(build_block, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    bloom = np.zeros(M // 8, dtype=np.uint8)
    exact_keys = []
    for blob, keys in zip(parts["bits"], parts["keys"]):
        bloom |= np.frombuffer(blob, dtype=np.uint8)
        exact_keys.append(np.asarray(keys, dtype=np.int64))
    exact = np.sort(np.concatenate(exact_keys)) if exact_keys \
        else np.empty(0, np.int64)
    bref = _ray.put((bloom, exact))

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_returnflag"])

    def probe(b: pa.Table) -> pa.Table:
        bits, keys = _ray.get(bref)
        k = b["l_orderkey"].to_numpy(zero_copy_only=False)
        hs = bloom_hashes(k)
        maybe = np.ones(len(k), dtype=bool)
        for i in range(K):
            maybe &= (bits[hs[i] // 8] >> (hs[i] % 8) & 1).astype(bool)
        # exact verify on the survivors only
        sub = k[maybe]
        hit = np.zeros(len(k), dtype=bool)
        hit[np.flatnonzero(maybe)[np.isin(sub, keys)]] = True
        rf = b["l_returnflag"].take(pa.array(np.flatnonzero(hit)))
        return pa.table({"l_returnflag": rf})

    from ray.data.aggregate import Count

    return li.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("l_returnflag").aggregate(Count(alias_name="n_items"))


def sql_bloom_semi_join() -> str:
    return ("SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem l WHERE EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_orderkey = l.l_orderkey "
            "AND o.o_totalprice > 300000.0) "
            "GROUP BY l_returnflag ORDER BY l_returnflag")


# -------- composed corpus-curation pipeline --------

def q_corpus_curation(sf_dir: str):
    """The flagship LLM-data curation pipeline as ONE composed query:
    keep documents that are (1) English, (2) length-bounded
    (60 <= tokens), (3) stopword-rich enough (>= 10% of tokens — the
    fluency heuristic), and (4) the smallest-id representative of
    their exact-duplicate group (fp64 content fingerprint ->
    groupby-min, the doc_dedup_exact plan).  One stateless scoring
    map + one dedup shuffle; returns survivors (doc_id, lang,
    n_tokens) — the deterministic SQL-checkable core of the curation
    funnel (the MinHash near-dup stage is the non-SQL continuation,
    `near_dup_groups`)."""
    from igpm_pem_ray.text.analysis import fingerprint64

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "lang"])
    stop = frozenset(STOP10)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        toks = text.str.split()
        n_tokens = toks.str.len().fillna(0).astype("int64")
        n_stop = toks.map(
            lambda ws: sum(1 for w in ws if w in stop)
            if isinstance(ws, list) else 0).astype("int64")
        keep = (df["lang"] == "en") & (n_tokens >= 60) \
            & (n_stop * 10 >= n_tokens)
        out = pd.DataFrame({
            "doc_id": df["doc_id"][keep],
            "lang": df["lang"][keep],
            "n_tokens": n_tokens[keep].to_numpy(),
            "fp64": fingerprint64(text[keep].tolist()),
        })
        return out

    scored = docs.map_batches(score, batch_format="pandas")
    from ray.data.aggregate import Min

    # winner + its attributes in ONE groupby, no join-back (and no
    # empty-partition join hazard on a sparse filter): pack
    # (doc_id, n_tokens) into a single int64 — min orders by doc_id
    # first, so the group minimum IS the winner row.  lang is
    # constant ('en') for every survivor by construction.
    def pack(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = b["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"fp64": b["fp64"],
                         "packed": (did << 20) | nt})

    won = scored.map_batches(pack, batch_format="pyarrow")         .groupby("fp64").aggregate(Min("packed", alias_name="packed"))

    def unpack(b: pa.Table) -> pa.Table:
        pk = b["packed"].to_numpy(zero_copy_only=False)
        n = len(pk)
        return pa.table({
            "doc_id": (pk >> 20).astype(np.int64),
            "lang": pa.array(["en"] * n, pa.string()),
            "n_tokens": (pk & ((1 << 20) - 1)).astype(np.int64)})

    return won.map_batches(unpack, batch_format="pyarrow")


def sql_corpus_curation() -> str:
    stops = ", ".join(f"'{w}'" for w in STOP10)
    return (
        "WITH scored AS (SELECT doc_id, lang, "
        "CASE WHEN trim(text) = '' THEN 0 ELSE "
        r"CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) "
        "END AS n_tokens, "
        "CASE WHEN trim(text) = '' THEN 0 ELSE "
        r"CAST(length(list_filter(string_split_regex(trim(text), '\s+'), "
        f"x -> x IN ({stops}))) AS BIGINT) END AS n_stop, "
        "trim(regexp_replace(text, '[ \\t\\n\\r\\f\\v]+', ' ', 'g')) "
        "AS fp FROM documents), "
        "kept AS (SELECT * FROM scored WHERE lang = 'en' "
        "AND n_tokens >= 60 AND n_stop * 10 >= n_tokens), "
        "reps AS (SELECT fp, min(doc_id) AS rep_id FROM kept "
        "GROUP BY fp) "
        "SELECT k.doc_id, k.lang, k.n_tokens FROM kept k "
        "JOIN reps r ON r.fp = k.fp AND r.rep_id = k.doc_id "
        "ORDER BY k.doc_id")


def q_quartile_orders(sf_dir: str):
    """Quartile bucket of every order within its customer segment-
    equivalent (o_orderpriority group), by totalprice — the ntile
    shape with an EXPLICIT bucket rule floor((rank-1)*4/n) written
    identically in both engines (builtin ntile remainder placement
    varies): rank via the sort + block-rank plan, counts joined by
    closure-free broadcast (tiny group count table)."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    od = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_orderpriority",
                             "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        codes = pd.util.hash_array(pr.astype(str).astype(object)) \
            .astype(np.int64) >> 1
        return pa.table({
            "gk": codes,
            "o_orderpriority": b["o_orderpriority"],
            "o_orderkey": b["o_orderkey"].cast(pa.int64()),
            "price_e2": scale_col(
                b["o_totalprice"].to_numpy(zero_copy_only=False), 100.0)})

    rows = od.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    ranked = rank_per_group(rows, key="gk",
                            order=["price_e2", "o_orderkey"],
                            descending=[False, False])
    counts = rows.groupby("gk").aggregate(Count(alias_name="n")) \
        .to_pandas()
    lut = dict(zip(counts["gk"].astype("int64"),
                   counts["n"].astype("int64")))
    import ray as _ray

    lref = _ray.put(lut)

    def bucket(b: pa.Table) -> pa.Table:
        lu = _ray.get(lref)
        gk = b["gk"].to_numpy(zero_copy_only=False)
        n = np.array([lu[int(g)] for g in gk], np.int64)
        rank = b["rank"].to_numpy(zero_copy_only=False)
        q = (rank - 1) * 4 // n
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_orderpriority": b["o_orderpriority"],
                         "quartile": q.astype(np.int64)})

    return ranked.map_batches(bucket, batch_format="pyarrow")


def sql_quartile_orders() -> str:
    return (
        "WITH r AS (SELECT o_orderkey, o_orderpriority, "
        "row_number() OVER (PARTITION BY o_orderpriority "
        "ORDER BY CAST(floor(o_totalprice*100.0+0.5) AS BIGINT), "
        "o_orderkey) AS rk, "
        "count(*) OVER (PARTITION BY o_orderpriority) AS n "
        "FROM orders) "
        "SELECT o_orderkey, o_orderpriority, "
        "CAST((rk - 1) * 4 // n AS BIGINT) AS quartile FROM r "
        "ORDER BY o_orderkey")


def q_event_bigrams(sf_dir: str):
    """Markov transition counts of event types per user ((prev, curr)
    adjacency in (ts, event_id) order) — the sequence-mining shape,
    via stages/temporal.adjacent_pair_counts (sort + block pairs +
    boundary stitch)."""
    from igpm_pem_ray.stages.temporal import adjacent_pair_counts

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"key": b["user_id"].cast(pa.int64()),
                         "us": b["ts"].cast(pa.int64()),
                         "tie": b["event_id"].cast(pa.int64()),
                         "val": b["event_type"]})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)
    out = adjacent_pair_counts(rows)

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"prev_type": b["prev"], "event_type": b["curr"],
                         "n": b["n"].cast(pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow")


def sql_event_bigrams() -> str:
    return (
        "WITH o AS (SELECT user_id, event_type, "
        "lag(event_type) OVER (PARTITION BY user_id "
        "ORDER BY epoch_us(ts), event_id) AS prev_type FROM events) "
        "SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n "
        "FROM o WHERE prev_type IS NOT NULL "
        "GROUP BY prev_type, event_type ORDER BY prev_type, event_type")


def q_gopher_quality(sf_dir: str):
    """Gopher-style repetition filters per document
    (text/repetition.py): top-unigram / top-adjacent-bigram / distinct
    fractions as e6 floor-division fixed point + the keep flag.  Pure
    per-doc pandas kernels, no shuffle."""
    from igpm_pem_ray.text.repetition import repetition_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return repetition_table(docs)


def sql_gopher_quality() -> str:
    from igpm_pem_ray.text.repetition import (
        MAX_TOP_BIGRAM_E6, MAX_TOP_UNIGRAM_E6, MIN_DISTINCT_E6)

    return (
        "WITH docs AS (SELECT doc_id, trim(text) AS tt FROM documents), "
        "toks AS (SELECT doc_id, string_split_regex(tt, '\\s+') AS ws "
        "FROM docs WHERE tt <> ''), "
        "uni AS (SELECT doc_id, w, count(*) AS c FROM toks, "
        "unnest(ws) AS t(w) GROUP BY doc_id, w), "
        "us AS (SELECT doc_id, max(c) AS maxc, sum(c) AS n, "
        "count(*) AS nd FROM uni GROUP BY doc_id), "
        "big AS (SELECT t.doc_id, t.ws[g.i] || ' ' || t.ws[g.i+1] AS bg, "
        "count(*) AS c FROM toks t, "
        "unnest(generate_series(1, len(t.ws)-1)) AS g(i) "
        "GROUP BY t.doc_id, bg), "
        "bs AS (SELECT doc_id, max(c) AS maxb FROM big GROUP BY doc_id), "
        "j AS (SELECT d.doc_id, COALESCE(u.n, 0) AS n_tokens, "
        "CASE WHEN COALESCE(u.n, 0) > 0 THEN u.maxc*1000000//u.n "
        "ELSE 0 END AS top_unigram_frac_e6, "
        "CASE WHEN COALESCE(u.n, 0) > 1 "
        "THEN COALESCE(b.maxb, 0)*1000000//(u.n-1) "
        "ELSE 0 END AS top_bigram_frac_e6, "
        "CASE WHEN COALESCE(u.n, 0) > 0 THEN u.nd*1000000//u.n "
        "ELSE 0 END AS distinct_frac_e6 "
        "FROM docs d LEFT JOIN us u USING (doc_id) "
        "LEFT JOIN bs b USING (doc_id)) "
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
        "CAST(top_unigram_frac_e6 AS BIGINT) AS top_unigram_frac_e6, "
        "CAST(top_bigram_frac_e6 AS BIGINT) AS top_bigram_frac_e6, "
        "CAST(distinct_frac_e6 AS BIGINT) AS distinct_frac_e6, "
        "CAST(CASE WHEN n_tokens > 0 "
        f"AND top_unigram_frac_e6 <= {MAX_TOP_UNIGRAM_E6} "
        f"AND top_bigram_frac_e6 <= {MAX_TOP_BIGRAM_E6} "
        f"AND distinct_frac_e6 >= {MIN_DISTINCT_E6} "
        "THEN 1 ELSE 0 END AS BIGINT) AS keep "
        "FROM j ORDER BY doc_id")


def q_quality_sample(sf_dir: str):
    """Quality-weighted deterministic corpus sampling (the mixture /
    reweighting step of corpus curation, CCNet/DoReMi shape): keep a
    document with probability proportional to its quality weight —
    here the Gopher distinct-token fraction — decided by the same
    RNG-free affine hash ring as train_val_split, so the sample is
    reproducible across engines and reruns and needs NO global state:
    keep iff (doc_id*A + B) mod M, folded to e6, < distinct_frac_e6.
    One per-doc pandas stage (repetition signals) + a vectorized hash
    filter; no shuffle."""
    from igpm_pem_ray.text.repetition import repetition_stats

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        st = repetition_stats(df)
        ids = st["doc_id"].to_numpy().astype(np.int64)
        h_e6 = ((ids * SPLIT_A + SPLIT_B) % SPLIT_M) * 1_000_000 // SPLIT_M
        keep = h_e6 < st["distinct_frac_e6"].to_numpy()
        out = st.loc[keep, ["doc_id", "distinct_frac_e6"]].copy()
        out["hash_e6"] = h_e6[keep]
        return out

    return docs.map_batches(f, batch_format="pandas")


def sql_quality_sample() -> str:
    return (
        "WITH docs AS (SELECT doc_id, trim(text) AS tt FROM documents), "
        "toks AS (SELECT doc_id, string_split_regex(tt, '\\s+') AS ws "
        "FROM docs WHERE tt <> ''), "
        "uni AS (SELECT doc_id, w, count(*) AS c FROM toks, "
        "unnest(ws) AS t(w) GROUP BY doc_id, w), "
        "us AS (SELECT doc_id, sum(c) AS n, count(*) AS nd "
        "FROM uni GROUP BY doc_id), "
        "j AS (SELECT d.doc_id, "
        "CASE WHEN COALESCE(u.n, 0) > 0 THEN u.nd*1000000//u.n ELSE 0 END "
        "AS distinct_frac_e6, "
        f"((d.doc_id*{SPLIT_A} + {SPLIT_B}) % {SPLIT_M}) * 1000000 "
        f"// {SPLIT_M} AS hash_e6 "
        "FROM docs d LEFT JOIN us u USING (doc_id)) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(distinct_frac_e6 AS BIGINT) AS distinct_frac_e6, "
        "CAST(hash_e6 AS BIGINT) AS hash_e6 "
        "FROM j WHERE hash_e6 < distinct_frac_e6 ORDER BY doc_id")


# ---------------- C4-style duplicate-span removal ----------------

SEG_W = 10           # tokens per segment (C4 used 3-sentence spans;
                     # the corpus has no sentence boundaries, so a
                     # fixed-width deterministic segmentation stands
                     # in — the plumbing is segmentation-independent)
SEG_NO_BITS = 20     # pack = doc_id << 20 | seg_no  (docs < 2^43,
                     # segments per doc < 2^20 — asserted below)


def q_span_dedup(sf_dir: str):
    """C4-style corpus-level duplicate-span removal (Raffel et al.
    1910.10683 §2.2 shape): segment every document into fixed-width
    SEG_W-token spans, keep only the globally-FIRST occurrence of each
    distinct span (first = min (doc_id, seg_no)), and reassemble the
    surviving spans per document in order.

    Scale shape — ONE groupby, ZERO joins: because the winner id
    ``pack = doc_id*2^20 + seg_no`` encodes the kept instance, the
    (seg, min(pack)) aggregate alone reconstructs the kept rows; no
    join-back of the exploded segment table is needed.  Segment
    explode is per-batch pandas C kernels (split/explode/groupby-
    join); reassembly is one groupby(doc_id) over the SURVIVORS only
    (<= corpus distinct spans, not corpus spans).  At 100 TB the
    segment strings in the groupby key would be replaced by a 128-bit
    fingerprint (text/dedup fp convention); kept verbatim here so the
    DuckDB oracle compares the actual strings."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def segments(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()  # whitespace, drops empties
        e = pd.DataFrame({"doc_id": df["doc_id"], "tok": toks}).explode(
            "tok", ignore_index=True)
        e = e[e["tok"].notna()]
        if not len(e):
            return pd.DataFrame({"seg": pd.Series([], dtype=object),
                                 "pack": pd.Series([], dtype=np.int64)})
        tok_no = e.groupby("doc_id").cumcount()
        seg_no = (tok_no // SEG_W).to_numpy()
        assert seg_no.max() < (1 << SEG_NO_BITS)
        g = e.assign(seg_no=seg_no).groupby(["doc_id", "seg_no"])
        seg = g["tok"].agg(" ".join).reset_index()
        pack = (seg["doc_id"].to_numpy().astype(np.int64)
                << SEG_NO_BITS) | seg["seg_no"].to_numpy()
        return pd.DataFrame({"seg": seg["tok"], "pack": pack})

    win = docs.map_batches(segments, batch_format="pandas") \
        .groupby("seg").aggregate(Min("pack", alias_name="pack"))

    def decode(b: pa.Table) -> pa.Table:
        p = b["pack"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": p >> SEG_NO_BITS,
                         "seg_no": p & ((1 << SEG_NO_BITS) - 1),
                         "seg": b["seg"]})

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("seg_no", kind="mergesort")
        return pd.DataFrame({
            "doc_id": [np.int64(df["doc_id"].iloc[0])],
            "clean_text": [" ".join(df["seg"])],
            "n_kept": [np.int64(len(df))]})

    return win.map_batches(decode, batch_format="pyarrow") \
        .groupby("doc_id").map_groups(reassemble, batch_format="pandas") \
        .sort("doc_id")


def sql_span_dedup() -> str:
    m = 1 << SEG_NO_BITS
    return (
        r"WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, "
        r"'\s+'), x -> x <> '') AS toks FROM documents), "
        "seg AS (SELECT doc_id, g.i AS seg_no, "
        f"array_to_string(toks[g.i*{SEG_W}+1 : g.i*{SEG_W}+{SEG_W}], ' ') "
        "AS seg FROM t, unnest(generate_series(0, "
        f"CAST(floor((len(toks)-1)/{SEG_W}) AS BIGINT))) AS g(i) "
        "WHERE len(toks) > 0), "
        f"win AS (SELECT seg, min(doc_id*{m} + seg_no) AS pack "
        "FROM seg GROUP BY seg), "
        f"kept AS (SELECT pack//{m} AS doc_id, pack%{m} AS seg_no, seg "
        "FROM win) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "string_agg(seg, ' ' ORDER BY seg_no) AS clean_text, "
        "CAST(count(*) AS BIGINT) AS n_kept "
        "FROM kept GROUP BY doc_id ORDER BY doc_id")


# ---------------- blocklist page filter (C4 "bad words" rule) --------

BLOCKLIST = ("slow", "dup")   # deterministic in-code list (the rule is
                              # list-independent; C4 ships ~400 terms)


def q_blocklist_filter(sf_dir: str):
    """C4-style blocklist filtering (Raffel et al. 1910.10683 §2.2:
    drop any page containing a blocklisted term): per document the
    exact-token blocklist hit count and the keep flag.  Per-batch
    pandas explode + isin C kernels, no shuffle, docs with zero
    tokens kept."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame({"doc_id": df["doc_id"],
                          "token": df["text"].str.split()}).explode(
            "token", ignore_index=True)
        hits = e[e["token"].isin(BLOCKLIST)].groupby("doc_id").size()
        n_bad = df["doc_id"].map(hits).fillna(0).astype(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "n_bad": n_bad,
            "keep": (n_bad == 0).astype(np.int64)})

    return docs.map_batches(f, batch_format="pandas")


def sql_blocklist_filter() -> str:
    lst = ", ".join(f"'{w}'" for w in BLOCKLIST)
    return (
        r"WITH e AS (SELECT doc_id, unnest(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
        "FROM documents), "
        f"b AS (SELECT doc_id, count(*) AS n_bad FROM e "
        f"WHERE token IN ({lst}) GROUP BY doc_id) "
        "SELECT CAST(d.doc_id AS BIGINT) AS doc_id, "
        "CAST(COALESCE(b.n_bad, 0) AS BIGINT) AS n_bad, "
        "CAST(CASE WHEN COALESCE(b.n_bad, 0) = 0 THEN 1 ELSE 0 END "
        "AS BIGINT) AS keep "
        "FROM documents d LEFT JOIN b USING (doc_id) ORDER BY doc_id")


# -------- hourly active-user retention (cohort next-bucket return) --------

RETAIN_US = 3_600_000_000  # 1h buckets


def q_user_retention(sf_dir: str):
    """Per-hour active users and how many return in the NEXT hour —
    the classic cohort-retention shape.  Join-free plan: one
    groupby(user_id).map_groups computes each user's distinct active
    hours and flags hours followed by activity (np.isin(hrs+1, hrs) —
    per-group work is O(user's hours), user activity is naturally
    bounded so no skew), then one O(hours) groupby-sum.  The
    equivalent SQL is a distinct + self-join on (user, hr+1); the
    Ray plan ships each user once instead of joining the activity
    table against itself."""
    import pandas as pd

    from ray.data.aggregate import Count, Sum

    ev = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def to_hr(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "hr": us // RETAIN_US})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        hrs = np.unique(g["hr"].to_numpy())
        return pd.DataFrame({
            "hr": hrs,
            "ret": np.isin(hrs + 1, hrs,
                           assume_unique=True).astype(np.int64)})

    act = ev.map_batches(to_hr, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("user_id").map_groups(per_user, batch_format="pandas")
    out = act.groupby("hr").aggregate(Count(alias_name="n_active"),
                                      Sum("ret", alias_name="n_retained"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"hr": b["hr"],
                         "n_active": b["n_active"].cast(pa.int64()),
                         "n_retained": b["n_retained"].cast(pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow")


def sql_user_retention() -> str:
    return (
        f"WITH au AS (SELECT DISTINCT epoch_us(ts) // {RETAIN_US} AS hr, "
        "user_id FROM events), "
        "ret AS (SELECT a.hr, count(*) AS n_retained FROM au a "
        "JOIN au b ON b.user_id = a.user_id AND b.hr = a.hr + 1 "
        "GROUP BY 1) "
        "SELECT au.hr, CAST(count(*) AS BIGINT) AS n_active, "
        "CAST(COALESCE(any_value(ret.n_retained), 0) AS BIGINT) "
        "AS n_retained "
        "FROM au LEFT JOIN ret ON ret.hr = au.hr "
        "GROUP BY au.hr ORDER BY au.hr")


# -------- IQR outlier counts per event_type (Tukey fences) --------

def q_outlier_events(sf_dir: str):
    """Per-event-type Tukey-fence outlier counts: exact q25/q75 via
    the rank-selection quantile plan (quantile_disc convention) on
    e2-scaled integer values, fences kept in DOUBLED units
    (lo2 = 5*q1 - 3*q3, hi2 = 5*q3 - 3*q1) so 1.5*IQR never leaves
    integer arithmetic; the tiny per-type fence table is broadcast by
    closure into one counting map (per-block partials, one O(types)
    groupby-sum).  Outlier iff 2*v < lo2 or 2*v > hi2 — bit-identical
    in both engines."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type",
                                               "value"])

    def pre(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        codes = pd.util.hash_array(et.astype(str).astype(object)) \
            .astype(np.int64) >> 1
        return pa.table({
            "etk": codes,
            "event_type": b["event_type"],
            "value_e2": scale_col(b["value"].to_numpy(zero_copy_only=False),
                                  100.0),
            "event_id": b["event_id"].cast(pa.int64()),
        })

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    ranked = rank_per_group(rows, key="etk",
                            order=["value_e2", "event_id"],
                            descending=[False, False]).materialize()
    counts = rows.groupby("etk").aggregate(Count(alias_name="n"))
    joined = ranked.join(counts, join_type="inner", num_partitions=2,
                         on=("etk",))

    def pick(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        rank = b["rank"].to_numpy(zero_copy_only=False)
        v = b["value_e2"].to_numpy(zero_copy_only=False)
        t25 = np.maximum(1, np.ceil(0.25 * n).astype(np.int64))
        t75 = np.maximum(1, np.ceil(0.75 * n).astype(np.int64))
        is25 = rank == t25
        is75 = rank == t75
        keep = is25 | is75
        big = np.int64(np.iinfo(np.int64).min)
        return pa.table({
            "event_type": b["event_type"].take(
                pa.array(np.flatnonzero(keep))),
            "q1_e2": np.where(is25[keep], v[keep], big),
            "q3_e2": np.where(is75[keep], v[keep], big),
        })

    qt = joined.map_batches(pick, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Max("q1_e2", alias_name="q1_e2"),
            Max("q3_e2", alias_name="q3_e2")).to_pandas()
    fences = {et: (5 * int(q1) - 3 * int(q3), 5 * int(q3) - 3 * int(q1))
              for et, q1, q3 in zip(qt["event_type"], qt["q1_e2"],
                                    qt["q3_e2"])}

    def flag(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        v2 = 2 * scale_col(b["value"].to_numpy(zero_copy_only=False), 100.0)
        lo = np.array([fences[e][0] for e in et], dtype=np.int64)
        hi = np.array([fences[e][1] for e in et], dtype=np.int64)
        out = (v2 < lo) | (v2 > hi)
        u, idx = np.unique(et, return_inverse=True)
        cnt = np.zeros(len(u), dtype=np.int64)
        np.add.at(cnt, idx, out.astype(np.int64))
        return pa.table({
            "event_type": pa.array(list(u), pa.string()),
            "c": cnt,
            "lo2_e2": np.array([fences[e][0] for e in u], dtype=np.int64),
            "hi2_e2": np.array([fences[e][1] for e in u], dtype=np.int64)})

    out = ev.map_batches(flag, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("event_type").aggregate(
            Sum("c", alias_name="n_outliers"),
            Max("lo2_e2", alias_name="lo2_e2"),
            Max("hi2_e2", alias_name="hi2_e2"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b["event_type"],
                         "n_outliers": b["n_outliers"].cast(pa.int64()),
                         "lo2_e2": b["lo2_e2"].cast(pa.int64()),
                         "hi2_e2": b["hi2_e2"].cast(pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow")


def sql_outlier_events() -> str:
    v = "CAST(floor(value*100.0+0.5) AS BIGINT)"
    return (
        f"WITH q AS (SELECT event_type, "
        f"CAST(quantile_disc({v}, 0.25) AS BIGINT) AS q1, "
        f"CAST(quantile_disc({v}, 0.75) AS BIGINT) AS q3 "
        "FROM events GROUP BY 1) "
        "SELECT e.event_type, "
        f"CAST(sum(CASE WHEN 2*{v.replace('value', 'e.value')} "
        "< 5*q.q1 - 3*q.q3 "
        f"OR 2*{v.replace('value', 'e.value')} > 5*q.q3 - 3*q.q1 "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, "
        "5*q.q1 - 3*q.q3 AS lo2_e2, 5*q.q3 - 3*q.q1 AS hi2_e2 "
        "FROM events e JOIN q ON q.event_type = e.event_type "
        "GROUP BY 1, 3, 4 ORDER BY 1")


# -------- hourly event-rate anomaly flags (2-sigma, exact ints) --------

def q_event_rate_anomaly(sf_dir: str):
    """Hours whose event count deviates from the all-hours mean by
    more than 2 standard deviations — the pipeline-monitoring shape.
    One O(hours) count groupby; mean/variance as exact integer
    sufficient statistics (N, S=Σc, S2=Σc²) and the 2σ test kept in
    cross-multiplied integer form,

        (c·N − S)² · N  >  4 · (N·S2 − S²) · N   ≡   (c−μ)² > 4σ²
        → (c·N − S)²  >  4 · (N·S2 − S²)

    so no float ever appears (population σ, the group_stats
    convention).  Returns the anomalous (hr, n_events) rows."""
    from ray.data.aggregate import Count

    ev = read_table(sf_dir, "events", columns=["ts"])

    def to_hr(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"hr": us // RETAIN_US})

    counts = ev.map_batches(to_hr, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("hr").aggregate(Count(alias_name="c")).to_pandas()
    c = counts["c"].to_numpy().astype(np.int64)
    n = int(len(c))
    s, s2 = int(c.sum()), int((c * c).sum())
    dev = c.astype(object) * n - s           # python ints: no overflow
    var4 = 4 * (n * s2 - s * s)
    flag = np.array([int(d) * int(d) > var4 for d in dev])
    out = counts[flag].sort_values("hr")
    return pa.table({"hr": out["hr"].to_numpy().astype(np.int64),
                     "n_events": out["c"].to_numpy().astype(np.int64)})


def sql_event_rate_anomaly() -> str:
    return (
        f"WITH hc AS (SELECT epoch_us(ts) // {RETAIN_US} AS hr, "
        "count(*) AS c FROM events GROUP BY 1), "
        "st AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(c) AS HUGEINT) AS s, "
        "CAST(sum(c*c) AS HUGEINT) AS s2 FROM hc) "
        "SELECT hc.hr, CAST(hc.c AS BIGINT) AS n_events FROM hc, st "
        "WHERE (hc.c*st.n - st.s)*(hc.c*st.n - st.s) "
        "> 4*(st.n*st.s2 - st.s*st.s) ORDER BY hc.hr")


# -------- lag-window debounce (streaming duplicate suppression) --------

DEBOUNCE_GAP_US = 6 * 3600 * 1_000_000  # 6 h (p10 inter-event gap ~5.5 h)


def q_event_debounce(sf_dir: str):
    """Debounced events: drop any event whose previous same-(user,
    type) event is within DEBOUNCE_GAP_US — retry-storm / double-fire
    suppression, the keep-only-meaningful-transitions dedup that
    precedes sessionization in clickstream pipelines.  One global
    sort + O(1)-per-block boundary patch (stages/temporal.py
    ``debounce_per_key``)."""
    from igpm_pem_ray.stages.temporal import debounce_per_key

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "event_type", "ts"])
    return debounce_per_key(ev, gap_us=DEBOUNCE_GAP_US)


def sql_event_debounce() -> str:
    return (
        "WITH o AS (SELECT CAST(event_id AS BIGINT) AS event_id, "
        "CAST(user_id AS BIGINT) AS user_id, event_type, "
        "CAST(epoch_us(ts) AS BIGINT) AS us, "
        "lag(CAST(epoch_us(ts) AS BIGINT)) OVER "
        "(PARTITION BY user_id, event_type "
        "ORDER BY epoch_us(ts), event_id) AS prev FROM events) "
        "SELECT event_id, user_id, event_type, us FROM o "
        f"WHERE prev IS NULL OR us - prev > {DEBOUNCE_GAP_US}")


# ------------- percent-rank window (distribution position) -------------

def q_percent_rank_orders(sf_dir: str):
    """Each order's percent-rank of o_totalprice within its priority
    class — the percentile-position window op (price-band features,
    per-segment outlier screens).  Deterministic total order via the
    (o_totalprice, o_orderkey) tie-break; pr_e6 = floor((rn-1)*1e6 /
    (n-1)) integer fixed point.  Plan: the stages/ranked.py sorted-
    block rank (no per-group Python) + an O(groups) driver count map
    (5 priority classes) broadcast into one stateless batch map."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    ranked = rank_per_group(orders, key="o_orderpriority",
                            order=["o_totalprice", "o_orderkey"],
                            descending=[False, False])
    counts = {r["o_orderpriority"]: r["n"]
              for r in orders.groupby("o_orderpriority")
              .aggregate(Count(alias_name="n")).take_all()}

    def pr(b: pa.Table) -> pa.Table:
        rn = b["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.asarray([counts[p] for p in
                        b["o_orderpriority"].to_pylist()], dtype=np.int64)
        pr_e6 = np.where(n > 1, (rn - 1) * 1_000_000 // np.maximum(n - 1, 1),
                         0).astype(np.int64)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_orderpriority": b["o_orderpriority"],
                         "pr_e6": pr_e6})

    return ranked.map_batches(pr, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_percent_rank_orders() -> str:
    return (
        "WITH r AS (SELECT o_orderkey, o_orderpriority, "
        "row_number() OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice, o_orderkey) AS rn, "
        "count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders) "
        "SELECT o_orderkey, o_orderpriority, "
        "CAST(CASE WHEN n > 1 THEN ((rn-1)*1000000) // (n-1) "
        "ELSE 0 END AS BIGINT) AS pr_e6 FROM r")


# ------------- trailing ROWS window (per-key rolling feature) -------------

ROLL_K = 5


def q_rolling_events(sf_dir: str):
    """Per-user trailing-5-event rolling count and value sum at every
    event — the per-row rolling-feature window (trailing spend,
    rolling z-score numerators) in (ts, event_id) order.  Values
    scaled to e2 integers BEFORE the window sum, so the result is
    reduction-order-exact.  One global sort + vectorized cumsum
    windows + an O(k)-rows-per-block tail chain
    (stages/temporal.rolling_per_key)."""
    from igpm_pem_ray.stages.temporal import rolling_per_key

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "us": b["ts"].cast(pa.int64()),
            "v_e2": scale_col(
                b["value"].to_numpy(zero_copy_only=False), 1e2)})

    out = rolling_per_key(
        ev.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True),
        k=ROLL_K, key_col="user_id", ts_col="us", id_col="event_id",
        val_col="v_e2")
    return out.rename_columns({"key": "user_id", "w_sum": "w_sum_e2"})


def sql_rolling_events() -> str:
    from igpm_pem_ray.pipelines.common import sql_scale

    v = sql_scale("value", "1e2")
    return (
        f"WITH o AS (SELECT CAST(event_id AS BIGINT) AS event_id, "
        f"CAST(user_id AS BIGINT) AS user_id, "
        f"CAST(epoch_us(ts) AS BIGINT) AS us, {v} AS v_e2 FROM events) "
        "SELECT event_id, user_id, us, "
        "CAST(count(*) OVER w AS BIGINT) AS w_n, "
        "CAST(sum(v_e2) OVER w AS BIGINT) AS w_sum_e2 FROM o "
        "WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id "
        f"ROWS BETWEEN {ROLL_K - 1} PRECEDING AND CURRENT ROW)")


# ------------- second-order sequence mining (event trigrams) -------------

def q_event_trigrams(sf_dir: str):
    """Second-order Markov transition counts of event types per user
    (three CONSECUTIVE events in (ts, event_id) order) — the 3-gram
    sequence-mining extension of `event_bigrams`, via
    stages/temporal.adjacent_triple_counts (sort + per-block triples +
    O(2)-rows tail chain)."""
    from igpm_pem_ray.stages.temporal import adjacent_triple_counts

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"key": b["user_id"].cast(pa.int64()),
                         "us": b["ts"].cast(pa.int64()),
                         "tie": b["event_id"].cast(pa.int64()),
                         "val": b["event_type"]})

    out = adjacent_triple_counts(
        ev.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True))
    return out.map_batches(lambda b: pa.table({
        "a": b["a"], "b": b["b"], "c": b["c"],
        "n": b["n"].cast(pa.int64())}), batch_format="pyarrow")


def sql_event_trigrams() -> str:
    return (
        "WITH o AS (SELECT event_type AS c, "
        "lag(event_type, 2) OVER win AS a, "
        "lag(event_type, 1) OVER win AS b FROM events "
        "WINDOW win AS (PARTITION BY user_id "
        "ORDER BY epoch_us(ts), event_id)) "
        "SELECT a, b, c, CAST(count(*) AS BIGINT) AS n FROM o "
        "WHERE a IS NOT NULL GROUP BY a, b, c")


# ---------------- k-center diversity sampling (coreset) ----------------

KCENTER_K = 8


def q_kcenter_sample(sf_dir: str):
    """Greedy k-center (Gonzalez) diversity sample of the embedding
    table — the coreset-selection pass that picks a maximally-spread
    subset for curation/eval (ann/kcenter.py: k one-pass rounds, tiny
    center broadcast, O(blocks) candidate rows per round).  Rows-only:
    the greedy is inherently sequential in k, no SQL window expresses
    it; exact parity vs a brute-force numpy greedy is pytest-pinned
    (tests/test_operators.py)."""
    from igpm_pem_ray.ann.kcenter import kcenter_sample

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kcenter_sample(emb, KCENTER_K)


# ---------------- temporal motif pairs (A then B within dt) ----------------

MOTIF_DT_US = 12 * 3600 * 1_000_000  # 12 h


def q_temporal_pairs(sf_dir: str):
    """Temporal motif pair counts: how often event type A is followed
    by type B within 12 h for the SAME user — the 2-event temporal
    motif (Paranjape-Benson-Leskovec, WSDM 2017), strictly more than
    `event_bigrams` (which counts only ADJACENT successors).

    Scale shape: the non-equi time-window join becomes ONE equi
    shuffle via width-dt bucketing — the A side explodes to its bucket
    and the next (a successor within dt lives in one of the two), the
    B side keeps its single bucket, so every qualifying pair meets
    EXACTLY once (no dedup pass); one hash join on (user, bucket), a
    vectorized window filter, per-block combiners, and an O(types^2)
    final groupby."""
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])

    def a_side(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        bkt = us // MOTIF_DT_US
        return pa.table({
            "user_a": np.concatenate([uid, uid]),
            "bkt": np.concatenate([bkt, bkt + 1]),
            "type_a": np.concatenate([et, et]),
            "us_a": np.concatenate([us, us])})

    def b_side(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_b": b["user_id"].to_numpy(zero_copy_only=False),
            "bkt_b": us // MOTIF_DT_US,
            "type_b": b["event_type"].to_numpy(zero_copy_only=False),
            "us_b": us})

    n_ev = ev.count()  # parquet metadata count, no scan
    np_join = 1 if n_ev < 65_536 else min(32, max(8, n_ev // 200_000))
    a = ev.map_batches(a_side, batch_format="pyarrow", zero_copy_batch=True)
    bb = ev.map_batches(b_side, batch_format="pyarrow",
                        zero_copy_batch=True)
    j = a.join(bb, join_type="inner", num_partitions=np_join,
               on=("user_a", "bkt"), right_on=("user_b", "bkt_b"))

    def window(t: pa.Table) -> pa.Table:
        d = t["us_b"].to_numpy(zero_copy_only=False) \
            - t["us_a"].to_numpy(zero_copy_only=False)
        keep = (d > 0) & (d <= MOTIF_DT_US)
        g = pd.DataFrame({
            "type_a": t["type_a"].to_numpy(zero_copy_only=False)[keep],
            "type_b": t["type_b"].to_numpy(zero_copy_only=False)[keep]}) \
            .groupby(["type_a", "type_b"], sort=False).size() \
            .reset_index(name="n_p")
        return pa.table({"type_a": g["type_a"].to_numpy(),
                         "type_b": g["type_b"].to_numpy(),
                         "n_p": g["n_p"].to_numpy().astype(np.int64)})

    return j.map_batches(window, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["type_a", "type_b"]).aggregate(Sum("n_p", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "type_a": b["type_a"], "type_b": b["type_b"],
            "n": b["n"].cast(pa.int64())}), batch_format="pyarrow")


def sql_temporal_pairs() -> str:
    return (
        "WITH e AS (SELECT user_id, event_type, "
        "CAST(epoch_us(ts) AS BIGINT) AS us FROM events) "
        "SELECT a.event_type AS type_a, b.event_type AS type_b, "
        "CAST(count(*) AS BIGINT) AS n FROM e a JOIN e b "
        "ON a.user_id = b.user_id AND b.us > a.us "
        f"AND b.us - a.us <= {MOTIF_DT_US} "
        "GROUP BY type_a, type_b")


def q_temporal_triples(sf_dir: str):
    """3-event temporal motif counts: type sequences A -> B -> C by
    one user with the whole motif inside the 12 h window
    (us_a < us_b < us_c, us_c - us_a <= dt) — the WSDM'17 motif family
    one size up from `temporal_pairs`.

    Scale shape: two bucketed equi joins.  Stage 1 builds qualifying
    (a, b) pairs exactly as `temporal_pairs` (pair meets once).  Stage
    2 re-buckets each pair BY ITS FIRST EVENT's timestamp to its
    bucket and the next, joins the single-bucket c side on
    (user, bucket), and filters us_c > us_b AND us_c - us_a <= dt —
    c's bucket is unique, so each (a, b, c) again meets exactly once.
    Per-block combiners keep the final groupby O(types^3)."""
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])
    n_ev = ev.count()
    np_join = 1 if n_ev < 65_536 else min(32, max(8, n_ev // 200_000))

    def a_side(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        bkt = us // MOTIF_DT_US
        return pa.table({
            "user_a": np.concatenate([uid, uid]),
            "bkt": np.concatenate([bkt, bkt + 1]),
            "type_a": np.concatenate([et, et]),
            "us_a": np.concatenate([us, us])})

    def ev_side(prefix):
        def f(b: pa.Table) -> pa.Table:
            us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({
                f"user_{prefix}": b["user_id"].to_numpy(
                    zero_copy_only=False),
                f"bkt_{prefix}": us // MOTIF_DT_US,
                f"type_{prefix}": b["event_type"].to_numpy(
                    zero_copy_only=False),
                f"us_{prefix}": us})
        return f

    a = ev.map_batches(a_side, batch_format="pyarrow", zero_copy_batch=True)
    bb = ev.map_batches(ev_side("b"), batch_format="pyarrow",
                        zero_copy_batch=True)
    jab = a.join(bb, join_type="inner", num_partitions=np_join,
                 on=("user_a", "bkt"), right_on=("user_b", "bkt_b"))

    def pair_filter(t: pa.Table) -> pa.Table:
        d = t["us_b"].to_numpy(zero_copy_only=False) \
            - t["us_a"].to_numpy(zero_copy_only=False)
        keep = (d > 0) & (d <= MOTIF_DT_US)
        us_a = t["us_a"].to_numpy(zero_copy_only=False)[keep]
        bkt = us_a // MOTIF_DT_US
        return pa.table({
            "user_p": np.concatenate(
                [t["user_a"].to_numpy(zero_copy_only=False)[keep]] * 2),
            "bkt_p": np.concatenate([bkt, bkt + 1]),
            "type_a": np.concatenate(
                [t["type_a"].to_numpy(zero_copy_only=False)[keep]] * 2),
            "type_b": np.concatenate(
                [t["type_b"].to_numpy(zero_copy_only=False)[keep]] * 2),
            "us_a": np.concatenate([us_a] * 2),
            "us_b": np.concatenate(
                [t["us_b"].to_numpy(zero_copy_only=False)[keep]] * 2)})

    pairs = jab.map_batches(pair_filter, batch_format="pyarrow",
                            zero_copy_batch=True)
    cc = ev.map_batches(ev_side("c"), batch_format="pyarrow",
                        zero_copy_batch=True)
    j3 = pairs.join(cc, join_type="inner", num_partitions=np_join,
                    on=("user_p", "bkt_p"), right_on=("user_c", "bkt_c"))

    def triple_filter(t: pa.Table) -> pa.Table:
        us_a = t["us_a"].to_numpy(zero_copy_only=False)
        us_b = t["us_b"].to_numpy(zero_copy_only=False)
        us_c = t["us_c"].to_numpy(zero_copy_only=False)
        keep = (us_c > us_b) & (us_c - us_a <= MOTIF_DT_US)
        g = pd.DataFrame({
            "type_a": t["type_a"].to_numpy(zero_copy_only=False)[keep],
            "type_b": t["type_b"].to_numpy(zero_copy_only=False)[keep],
            "type_c": t["type_c"].to_numpy(zero_copy_only=False)[keep]}) \
            .groupby(["type_a", "type_b", "type_c"], sort=False).size() \
            .reset_index(name="n_p")
        return pa.table({"type_a": g["type_a"].to_numpy(),
                         "type_b": g["type_b"].to_numpy(),
                         "type_c": g["type_c"].to_numpy(),
                         "n_p": g["n_p"].to_numpy().astype(np.int64)})

    return j3.map_batches(triple_filter, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["type_a", "type_b", "type_c"]) \
        .aggregate(Sum("n_p", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "type_a": b["type_a"], "type_b": b["type_b"],
            "type_c": b["type_c"], "n": b["n"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_temporal_triples() -> str:
    return (
        "WITH e AS (SELECT user_id, event_type, "
        "CAST(epoch_us(ts) AS BIGINT) AS us FROM events) "
        "SELECT a.event_type AS type_a, b.event_type AS type_b, "
        "c.event_type AS type_c, CAST(count(*) AS BIGINT) AS n "
        "FROM e a JOIN e b ON a.user_id = b.user_id AND b.us > a.us "
        f"AND b.us - a.us <= {MOTIF_DT_US} "
        "JOIN e c ON c.user_id = a.user_id AND c.us > b.us "
        f"AND c.us - a.us <= {MOTIF_DT_US} "
        "GROUP BY type_a, type_b, type_c")


# ----------------- hour-of-day seasonality profile -----------------

def q_hourly_profile(sf_dir: str):
    """Circular hour-of-day activity profile per event type — the
    seasonality fingerprint (bot traffic is flat, human traffic
    diurnal); one vectorized (us // 3600e6) mod 24 map and one
    O(types x 24) groupby.  Unlike `window_events` (absolute tumbling
    windows) this folds time onto the 24 h clock."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def hod(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"event_type": b["event_type"],
                         "hour": (us // 3_600_000_000) % 24})

    return ev.map_batches(hod, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["event_type", "hour"]).aggregate(
            Count(alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "event_type": b["event_type"],
            "hour": b["hour"].cast(pa.int64()),
            "n": b["n"].cast(pa.int64())}), batch_format="pyarrow")


def sql_hourly_profile() -> str:
    return (
        "SELECT event_type, "
        "CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour, "
        "CAST(count(*) AS BIGINT) AS n FROM events "
        "GROUP BY event_type, hour")


# ---------------- 2-D skyline (Pareto frontier) preference query ----------------

def _skyline2d_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean skyline-membership mask for minimize-(price, size).

    A point survives iff nothing dominates it: no point with both
    coords <= and at least one strictly <.  Vectorized O(n log n):
    lexsort by (price, size); within a price group only the group-min
    size can survive; across groups a point needs size strictly below
    the running min size of every strictly-cheaper group.  Duplicate
    (price, size) pairs never dominate each other, so all copies of a
    surviving pair are kept — matching SQL NOT EXISTS semantics."""
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((size, price))
    p, s = price[order], size[order]
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = p[1:] != p[:-1]
    grp_id = np.cumsum(new_grp) - 1
    grp_min = s[new_grp]                      # sorted asc within group
    cm = np.minimum.accumulate(grp_min)
    prev_min = np.empty(len(grp_min), dtype=np.int64)
    prev_min[0] = np.iinfo(np.int64).max
    prev_min[1:] = cm[:-1]
    keep_sorted = (s < prev_min[grp_id]) & (s == grp_min[grp_id])
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask


def q_skyline_parts(sf_dir: str):
    """Pareto-optimal parts minimizing (p_retailprice, p_size) — the
    skyline / preference-query operator (cheapest-smallest frontier;
    the classic BNL/SFS workload).  Distributed plan exploits that a
    skyline point survives ANY local pass: per-block vectorized local
    skyline (map_batches) shrinks each block to its frontier, then one
    single-task global pass over the tiny union finishes — no shuffle,
    no driver loop.  Prices compared as e2-scaled ints so the
    dominance relation is identical in both engines."""
    parts = read_table(sf_dir, "part",
                       columns=["p_partkey", "p_size", "p_retailprice"])

    def local(b: pa.Table) -> pa.Table:
        price = scale_col(b["p_retailprice"].to_numpy(zero_copy_only=False),
                          100.0)
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _skyline2d_mask(price, size)
        return pa.table({
            "p_partkey": pc.array_filter(b["p_partkey"], pa.array(m)),
            "price_e2": price[m], "p_size": size[m]})

    def final(b: pa.Table) -> pa.Table:
        m = _skyline2d_mask(b["price_e2"].to_numpy(zero_copy_only=False),
                            b["p_size"].to_numpy(zero_copy_only=False))
        arr = pa.array(m)
        return pa.table({"p_partkey": pc.array_filter(b["p_partkey"], arr),
                         "price_e2": pc.array_filter(b["price_e2"], arr),
                         "p_size": pc.array_filter(b["p_size"], arr)})

    return (parts.map_batches(local, batch_format="pyarrow",
                              zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def sql_skyline_parts() -> str:
    return (
        "WITH p AS (SELECT p_partkey, "
        "CAST(floor(p_retailprice*100.0+0.5) AS BIGINT) AS price_e2, "
        "CAST(p_size AS BIGINT) AS p_size FROM part) "
        "SELECT a.p_partkey, a.price_e2, a.p_size FROM p a "
        "WHERE NOT EXISTS (SELECT 1 FROM p b "
        "WHERE b.price_e2 <= a.price_e2 AND b.p_size <= a.p_size "
        "AND (b.price_e2 < a.price_e2 OR b.p_size < a.p_size))")


# ---------------- gaps-and-islands over an integer key sequence ----------------

def _runs_of_consecutive(k: np.ndarray):
    """(starts, ends, counts) of maximal consecutive-integer runs in a
    sorted int64 array."""
    if len(k) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    bnd = np.flatnonzero(np.diff(k) != 1)
    first = np.concatenate(([0], bnd + 1))
    last = np.concatenate((bnd, [len(k) - 1]))
    return k[first], k[last], (last - first + 1).astype(np.int64)


def q_islands_orders(sf_dir: str):
    """Gaps-and-islands over the o_orderkey values of finished
    ('F'-status) orders: maximal runs of consecutive keys with
    (island_start, island_end, n_keys) — the classic sequence-
    segmentation operator (contiguous id ranges, missing-data gaps,
    retention streaks).  The status filter leaves an irregular ~1/3
    subset of the dense key space, so the result is a real island
    table (hundreds of islands at sf0.001), not one trivial run.

    Distributed plan: one global sort, per-batch vectorized run
    extraction (each batch is contiguous in the sorted order) shrinks
    the data to O(islands) run fragments, then a single-task
    whole-block merge stitches fragments that touch across batch
    boundaries.  No driver loop; the only all-to-all is the sort the
    semantics require."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderstatus"])

    def pre(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["o_orderstatus"], "F")
        return pa.table(
            {"o_orderkey": pc.array_filter(b["o_orderkey"], keep)})

    def local(b: pa.Table) -> pa.Table:
        k = np.sort(b["o_orderkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        s, e, n = _runs_of_consecutive(k)
        return pa.table({"s": s, "e": e, "n": n})

    def merge(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        e = b["e"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(s, kind="stable")
        s, e, n = s[order], e[order], n[order]
        if len(s) == 0:
            return pa.table({"island_start": s, "island_end": e,
                             "n_keys": n})
        new = np.empty(len(s), dtype=bool)
        new[0] = True
        new[1:] = s[1:] > e[:-1] + 1
        first = np.flatnonzero(new)
        return pa.table({
            "island_start": s[first],
            "island_end": np.maximum.reduceat(e, first),
            "n_keys": np.add.reduceat(n, first)})

    # the global sort bounds each batch to a contiguous key range, so
    # `local` emits at most one mergeable fragment per batch edge
    return (orders.map_batches(pre, batch_format="pyarrow",
                               zero_copy_batch=True)
            .sort("o_orderkey")
            .map_batches(local, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def sql_islands_orders() -> str:
    return (
        "WITH r AS (SELECT o_orderkey AS k, "
        "o_orderkey - row_number() OVER (ORDER BY o_orderkey) AS grp "
        "FROM orders WHERE o_orderstatus = 'F') "
        "SELECT CAST(min(k) AS BIGINT) AS island_start, "
        "CAST(max(k) AS BIGINT) AS island_end, "
        "CAST(count(*) AS BIGINT) AS n_keys FROM r GROUP BY grp")


# ---------------- interval-union coverage (sweep line) ----------------

COVER_D_US = 600_000_000  # each event covers [ts, ts + 10 min)


def q_interval_cover(sf_dir: str):
    """Per-user union length of fixed-duration event intervals — the
    sweep-line interval-union operator (total active time, ad-exposure
    coverage, sensor uptime): each event covers [ts, ts+10min); output
    (user_id, covered_us, n_blocks) where n_blocks counts maximal
    merged intervals.  Differs from sessionize (which counts gaps
    between POINTS) by measuring covered TIME of overlapping ranges.

    Plan: one (user_id, ts) global sort, per-batch vectorized merge
    into maximal blocks (fixed duration keeps interval ends monotone
    within a user, so 'overlaps previous' is a single vectorized
    compare + reduceat), then a single whole-block task stitches the
    one possible boundary fragment per batch edge and reduces per
    user.  O(blocks) fragments ever leave the batches."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "s": b["ts"].cast(pa.timestamp("us"))
                                     .cast(pa.int64())})

    def _merge_blocks(u, s, e):
        brk = np.empty(len(u), dtype=bool)
        brk[0] = True
        brk[1:] = (u[1:] != u[:-1]) | (s[1:] > e[:-1])
        first = np.flatnonzero(brk)
        return (u[first], s[first], np.maximum.reduceat(e, first))

    def local(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        s = b["s"].to_numpy(zero_copy_only=False)
        if len(u) == 0:
            z = np.zeros(0, dtype=np.int64)
            return pa.table({"u": z, "bs": z, "be": z})
        mu, ms, me = _merge_blocks(u, s, s + COVER_D_US)
        return pa.table({"u": mu, "bs": ms, "be": me})

    def final(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        bs = b["bs"].to_numpy(zero_copy_only=False)
        be = b["be"].to_numpy(zero_copy_only=False)
        if len(u) == 0:
            z = np.zeros(0, dtype=np.int64)
            return pa.table({"user_id": z, "covered_us": z, "n_blocks": z})
        order = np.lexsort((bs, u))
        mu, ms, me = _merge_blocks(u[order], bs[order], be[order])
        ub = np.empty(len(mu), dtype=bool)
        ub[0] = True
        ub[1:] = mu[1:] != mu[:-1]
        uf = np.flatnonzero(ub)
        return pa.table({
            "user_id": mu[uf],
            "covered_us": np.add.reduceat(me - ms, uf),
            "n_blocks": np.diff(np.append(uf, len(mu))).astype(np.int64)})

    return (ev.map_batches(pre, batch_format="pyarrow",
                           zero_copy_batch=True)
            .sort(["user_id", "s"])
            .map_batches(local, batch_format="pyarrow",
                         zero_copy_batch=True)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def sql_interval_cover() -> str:
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS s, "
        f"epoch_us(ts) + {COVER_D_US} AS e FROM events), "
        "w AS (SELECT user_id, s, e, CASE WHEN s > max(e) OVER "
        "(PARTITION BY user_id ORDER BY s, e "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
        "THEN 1 ELSE 0 END AS brk FROM e), "
        "g AS (SELECT user_id, s, e, sum(brk) OVER "
        "(PARTITION BY user_id ORDER BY s, e "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM w), "
        "b AS (SELECT user_id, grp, max(e) - min(s) AS len "
        "FROM g GROUP BY user_id, grp) "
        "SELECT CAST(user_id AS BIGINT) AS user_id, "
        "CAST(sum(len) AS BIGINT) AS covered_us, "
        "CAST(count(*) AS BIGINT) AS n_blocks FROM b GROUP BY user_id")


# ---------------- robust MAD outlier screen per group ----------------

def q_mad_outliers(sf_dir: str):
    """Median / median-absolute-deviation robust outlier screen per
    event type: med = quantile_disc(0.5) of the e2-scaled value, mad =
    quantile_disc(0.5) of |v - med|, n_outliers = rows with
    |v - med| > 3*mad — the robust twin of the 2-sigma/IQR screens
    (immune to the very outliers it hunts).  Three streaming passes:
    the exact rank-selection median (stages/ranked.py, the
    quantile_events plan) run on v then on |v - med|, then one count
    groupby; only O(groups) medians ever reach the driver, broadcast
    back into the next pass's closure."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type",
                                               "value"])

    def pre(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        codes = pd.util.hash_array(et.astype(str).astype(object)) \
            .astype(np.int64) >> 1
        return pa.table({
            "etk": codes,
            "event_type": b["event_type"],
            "v": scale_col(b["value"].to_numpy(zero_copy_only=False), 100.0),
            "event_id": b["event_id"].cast(pa.int64())})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    def _median_per_type(ds, col: str) -> dict:
        ranked = rank_per_group(ds, key="etk", order=[col, "event_id"],
                                descending=[False, False])
        counts = ds.groupby("etk").aggregate(Count(alias_name="n"))
        joined = ranked.join(counts, join_type="inner", num_partitions=2,
                             on=("etk",))

        def pick(b: pa.Table) -> pa.Table:
            n = b["n"].to_numpy(zero_copy_only=False)
            rank = b["rank"].to_numpy(zero_copy_only=False)
            keep = rank == np.maximum(1, np.ceil(0.5 * n).astype(np.int64))
            return pa.table({
                "event_type": b["event_type"].take(
                    pa.array(np.flatnonzero(keep))),
                "med": b[col].to_numpy(zero_copy_only=False)[keep]})

        out = joined.map_batches(pick, batch_format="pyarrow").to_pandas()
        return dict(zip(out["event_type"], out["med"].astype(np.int64)))

    meds = _median_per_type(rows, "v")

    def add_ad(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_pylist()
        m = np.asarray([meds[t] for t in et], dtype=np.int64)
        return pa.table({
            "etk": b["etk"], "event_type": b["event_type"],
            "ad": np.abs(b["v"].to_numpy(zero_copy_only=False) - m),
            "event_id": b["event_id"]})

    ads = rows.map_batches(add_ad, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    mads = _median_per_type(ads, "ad")

    def flag(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_pylist()
        thr = np.asarray([3 * mads[t] for t in et], dtype=np.int64)
        out = b["ad"].to_numpy(zero_copy_only=False) > thr
        return pa.table({"event_type": b["event_type"],
                         "is_out": out.astype(np.int64)})

    outs = ads.map_batches(flag, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("event_type").aggregate(Sum(on="is_out",
                                             alias_name="n_outliers")) \
        .to_pandas()
    n_out = dict(zip(outs["event_type"], outs["n_outliers"]))
    types = sorted(meds)
    return pa.table({
        "event_type": types,
        "med_e2": np.asarray([meds[t] for t in types], dtype=np.int64),
        "mad_e2": np.asarray([mads[t] for t in types], dtype=np.int64),
        "n_outliers": np.asarray([int(n_out.get(t, 0)) for t in types],
                                 dtype=np.int64)})


def sql_mad_outliers() -> str:
    return (
        "WITH e AS (SELECT event_type, "
        "CAST(floor(value*100.0+0.5) AS BIGINT) AS v FROM events), "
        "m AS (SELECT event_type, CAST(quantile_disc(v, 0.5) AS BIGINT) "
        "AS med FROM e GROUP BY event_type), "
        "a AS (SELECT e.event_type, abs(e.v - m.med) AS ad, m.med "
        "FROM e JOIN m USING (event_type)), "
        "d AS (SELECT event_type, CAST(quantile_disc(ad, 0.5) AS BIGINT) "
        "AS mad FROM a GROUP BY event_type) "
        "SELECT a.event_type, max(a.med) AS med_e2, max(d.mad) AS mad_e2, "
        "CAST(count(*) FILTER (a.ad > 3*d.mad) AS BIGINT) AS n_outliers "
        "FROM a JOIN d USING (event_type) GROUP BY a.event_type")


# ---------------- windowed top-k heavy hitters ----------------

WINDOW_TOPK = 2


def q_window_topk(sf_dir: str):
    """Top-2 event types per tumbling 1-day window by count, with a
    deterministic (count DESC, event_type ASC) tie-break — the
    windowed heavy-hitter operator (trending topics per day, per-hour
    top crawl hosts).  Composition: one (window, type) pre-aggregating
    groupby shrinks the stream to O(windows x types), then the sorted-
    block ranker (stages/ranked.py) ranks WITHIN each window without
    any per-group Python; rank <= k filter is a stateless map."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        us = _ts_us(b)
        return pa.table({"event_type": b["event_type"],
                         "day_us": (us // DAY_US) * DAY_US})

    counts = ev.map_batches(pre, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(["event_type", "day_us"]).aggregate(
            Count(alias_name="n"))

    def neg(b: pa.Table) -> pa.Table:
        # rank ascending on (-n, event_type): count DESC, name ASC
        return pa.table({
            "day_us": b["day_us"].cast(pa.int64()),
            "event_type": b["event_type"],
            "n": b["n"].cast(pa.int64()),
            "negn": pc.negate(b["n"].cast(pa.int64()))})

    ranked = rank_per_group(
        counts.map_batches(neg, batch_format="pyarrow"),
        key="day_us", order=["negn", "event_type"],
        descending=[False, False])

    def keep(b: pa.Table) -> pa.Table:
        m = b["rank"].to_numpy(zero_copy_only=False) <= WINDOW_TOPK
        idx = pa.array(np.flatnonzero(m))
        return pa.table({
            "day_us": b["day_us"].take(idx),
            "event_type": b["event_type"].take(idx),
            "n": b["n"].take(idx),
            "rnk": b["rank"].to_numpy(zero_copy_only=False)[m]})

    return ranked.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_window_topk() -> str:
    return (
        "WITH c AS (SELECT event_type, "
        "CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_us, "
        "CAST(count(*) AS BIGINT) AS n FROM events "
        "GROUP BY event_type, day_us), "
        "r AS (SELECT day_us, event_type, n, row_number() OVER ("
        "PARTITION BY day_us ORDER BY n DESC, event_type) AS rnk FROM c) "
        f"SELECT day_us, event_type, n, CAST(rnk AS BIGINT) AS rnk "
        f"FROM r WHERE rnk <= {WINDOW_TOPK}")


# ---------------- deterministic weighted sampling without replacement ----------------

WSAMPLE_K = 100
WSAMPLE_M = 2_147_483_647  # 2^31 - 1


def q_weighted_sample(sf_dir: str):
    """Weighted sample of 100 orders, selection probability increasing
    with o_totalprice — the deterministic analog of Efraimidis-
    Spirakis A-Res reservoir sampling: priority = hash(key) // weight
    (a big-weight row gets a small priority), keep the k smallest
    priorities with an orderkey tie-break.  Replayable (no RNG state),
    expressed identically in SQL, and distributed as per-block partial
    top-k selection (argpartition) + one tiny single-task merge — the
    same partial-selection shape as every top-k in this repo, never a
    global sort."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def pri(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(
            scale_col(b["o_totalprice"].to_numpy(zero_copy_only=False),
                      100.0), 1)
        p = ((k % WSAMPLE_M) * 2654435761) % WSAMPLE_M // w
        if len(p) > WSAMPLE_K:
            # keep the same (pri, orderkey) tie-break as the final
            # merge, or a boundary tie could drop the globally-chosen row
            idx = np.lexsort((k, p))[:WSAMPLE_K]
            k, p = k[idx], p[idx]
        return pa.table({"o_orderkey": k, "pri": p})

    def merge(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        p = b["pri"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, p))[:WSAMPLE_K]
        return pa.table({"o_orderkey": k[order], "pri": p[order]})

    return (orders.map_batches(pri, batch_format="pyarrow",
                               zero_copy_batch=True)
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def sql_weighted_sample() -> str:
    return (
        "WITH p AS (SELECT o_orderkey, "
        f"((o_orderkey % {WSAMPLE_M}) * 2654435761) % {WSAMPLE_M} // "
        "greatest(CAST(floor(o_totalprice*100.0+0.5) AS BIGINT), 1) "
        "AS pri FROM orders) "
        f"SELECT o_orderkey, CAST(pri AS BIGINT) AS pri FROM p "
        f"ORDER BY pri, o_orderkey LIMIT {WSAMPLE_K}")


# ---------------- Benford first-digit distribution (data quality) ----------------

def q_benford_prices(sf_dir: str):
    """First-significant-digit distribution of o_totalprice vs the
    Benford expectation — the classic fabricated-data / corruption
    screen.  The digit is taken from the e2-scaled integer via string
    slicing (no float log10 whose boundary rounding could differ
    between engines); share_e6 uses the integer half-up convention
    with the total count a driver scalar.  One stateless map + one
    9-row groupby."""
    orders = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def digit(b: pa.Table) -> pa.Table:
        v = scale_col(b["o_totalprice"].to_numpy(zero_copy_only=False),
                      100.0)
        v = v[v > 0]
        # strip trailing magnitude: repeated // 10 until < 10, done
        # arithmetically via the decimal digit count
        nd = np.char.str_len(v.astype("U"))
        d = v // 10 ** (nd.astype(np.int64) - 1)
        return pa.table({"digit": d.astype(np.int64)})

    counts = orders.map_batches(digit, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .groupby("digit").aggregate(Count(alias_name="n")).to_pandas()
    total = int(counts["n"].sum())
    counts = counts.sort_values("digit")
    return pa.table({
        "digit": counts["digit"].to_numpy(np.int64),
        "n": counts["n"].to_numpy(np.int64),
        "share_e6": np.floor(counts["n"].to_numpy(np.int64) * 1e6
                             / total + 0.5).astype(np.int64)})


def sql_benford_prices() -> str:
    return (
        "WITH v AS (SELECT CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) "
        "AS x FROM orders), "
        "d AS (SELECT CAST(substr(CAST(x AS VARCHAR), 1, 1) AS BIGINT) "
        "AS digit FROM v WHERE x > 0), "
        "t AS (SELECT count(*) AS total FROM d) "
        "SELECT digit, CAST(count(*) AS BIGINT) AS n, "
        "CAST(floor(count(*) * 1e6 / t.total + 0.5) AS BIGINT) AS share_e6 "
        "FROM d, t GROUP BY digit, t.total")


# ---------------- k-anonymity audit (privacy data quality) ----------------

KANON_K = 5


def q_k_anonymity(sf_dir: str):
    """k-anonymity audit of the (nation, order-priority) quasi-
    identifier over customers' orders: for each equivalence class its
    size, plus a violates flag for classes smaller than k=5 — the
    re-identification-risk screen run before releasing a dataset.
    One join to attach the customer's nation (small side), one
    two-key groupby; the flag is a stateless map."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey",
                                                   "c_nationkey"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey",
                                                   "o_orderpriority"])
    j = orders.join(cust, join_type="inner", num_partitions=4,
                    on=("o_custkey",), right_on=("c_custkey",))
    counts = j.groupby(["c_nationkey", "o_orderpriority"]).aggregate(
        Count(alias_name="class_size"))

    def flag(b: pa.Table) -> pa.Table:
        n = b["class_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "nationkey": b["c_nationkey"].cast(pa.int64()),
            "o_orderpriority": b["o_orderpriority"],
            "class_size": n,
            "violates": (n < KANON_K).astype(np.int64)})

    return counts.map_batches(flag, batch_format="pyarrow")


def sql_k_anonymity() -> str:
    return (
        "SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey, "
        "o.o_orderpriority, CAST(count(*) AS BIGINT) AS class_size, "
        f"CAST(CASE WHEN count(*) < {KANON_K} THEN 1 ELSE 0 END AS BIGINT) "
        "AS violates "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_nationkey, o.o_orderpriority")


# ---------------- CUSUM changepoint detection over hourly counts ----------------

CUSUM_K_E0 = 3    # per-hour drift allowance (counts)
CUSUM_H_E0 = 12   # alarm threshold


def q_cusum_events(sf_dir: str):
    """One-sided CUSUM changepoint statistic over the per-type hourly
    event-count series: S_t = max(0, S_{t-1} + (x_t - k)) with alarm
    when S_t > h — the classic sequential burst/shift detector (crawl
    storms, bot onsets).  The recurrence has the closed form
    S_t = P_t - min_{j<=t} P_j with P = cumsum(x - k), so BOTH engines
    compute it without sequential row-at-a-time state: the oracle uses
    window cumsum + running min; the Ray plan shrinks the stream with
    one (type, hour) groupby (the only heavy step), then runs the
    vectorized prefix form per type inside one whole-block task over
    the tiny O(types x hours) series.  Missing hours contribute
    nothing (both engines operate on observed hours only).  Integer
    end-to-end."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        us = _ts_us(b)
        return pa.table({"event_type": b["event_type"],
                         "hour_us": (us // HOUR_US) * HOUR_US})

    counts = ev.map_batches(pre, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(["event_type", "hour_us"]).aggregate(
            Count(alias_name="n"))

    def cusum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "hour_us"],
                            kind="mergesort").reset_index(drop=True)
        if not len(df):
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "hour_us": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64"),
                "alarm": pd.Series([], dtype="int64")})
        x = df["n"].to_numpy(np.int64) - CUSUM_K_E0
        et = df["event_type"].to_numpy()
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        new[1:] = et[1:] != et[:-1]
        s = np.empty(len(df), np.int64)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(df))
        for a, bnd in zip(starts, ends):   # O(types) segments, each
            pp = np.cumsum(x[a:bnd])       # fully vectorized inside
            mm = np.minimum(np.minimum.accumulate(pp), 0)
            s[a:bnd] = pp - mm
        return pd.DataFrame({
            "event_type": df["event_type"],
            "hour_us": df["hour_us"].astype(np.int64),
            "s": s,
            "alarm": (s > CUSUM_H_E0).astype(np.int64)})

    return (counts.repartition(1)
            .map_batches(cusum, batch_format="pandas", batch_size=None))


def sql_cusum_events() -> str:
    return (
        "WITH c AS (SELECT event_type, "
        f"CAST((epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS BIGINT) "
        "AS hour_us, CAST(count(*) AS BIGINT) AS n FROM events "
        "GROUP BY event_type, hour_us), "
        f"p AS (SELECT event_type, hour_us, sum(n - {CUSUM_K_E0}) OVER "
        "(PARTITION BY event_type ORDER BY hour_us "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp FROM c), "
        "m AS (SELECT event_type, hour_us, cp, least(min(cp) OVER "
        "(PARTITION BY event_type ORDER BY hour_us "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS mn "
        "FROM p) "
        "SELECT event_type, hour_us, CAST(cp - mn AS BIGINT) AS s, "
        f"CAST(CASE WHEN cp - mn > {CUSUM_H_E0} THEN 1 ELSE 0 END "
        "AS BIGINT) AS alarm FROM m")


# ---------------- Gini inequality coefficient per group ----------------

def q_gini_nation(sf_dir: str):
    """Gini coefficient of customer spend within each nation — the
    inequality / concentration metric (revenue concentration risk,
    crawl-budget skew) via the exact rank formula on ascending-sorted
    spend: G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)).  All sums
    integer (e2-scaled spend, dense ranks from stages/ranked.py with a
    custkey tie-break); one float op at the very end under the shared
    floor(x*1e6+0.5) convention.  Plan: custkey groupby-sum shrinks
    orders to one row per customer, small join attaches the nation,
    sorted-block rank within nation, one nation groupby."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    orders = read_table(sf_dir, "orders", columns=["o_custkey",
                                                   "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey",
                                                   "c_nationkey"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "x": scale_col(b["o_totalprice"].to_numpy(zero_copy_only=False),
                           100.0)})

    spend = orders.map_batches(pre, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby("o_custkey").aggregate(Sum(on="x", alias_name="x"))
    j = spend.join(cust, join_type="inner", num_partitions=4,
                   on=("o_custkey",), right_on=("c_custkey",))

    def shape(b: pa.Table) -> pa.Table:
        return pa.table({"nk": b["c_nationkey"].cast(pa.int64()),
                         "x": b["x"].cast(pa.int64()),
                         "o_custkey": b["o_custkey"].cast(pa.int64())})

    ranked = rank_per_group(
        j.map_batches(shape, batch_format="pyarrow"),
        key="nk", order=["x", "o_custkey"], descending=[False, False])

    def weight(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        i = b["rank"].to_numpy(zero_copy_only=False)
        return pa.table({"nk": b["nk"], "x": x, "ix": i * x})

    agg = ranked.map_batches(weight, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("nk").aggregate(Sum(on="x", alias_name="sx"),
                                 Sum(on="ix", alias_name="six"),
                                 Count(alias_name="n"))

    def gini(b: pa.Table) -> pa.Table:
        sx = b["sx"].to_numpy(zero_copy_only=False).astype(np.int64)
        six = b["six"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = np.floor((2 * six - (n + 1) * sx) * 1e6 / (n * sx) + 0.5) \
            .astype(np.int64)
        return pa.table({"nationkey": b["nk"].cast(pa.int64()),
                         "n_customers": n, "gini_e6": g})

    return agg.map_batches(gini, batch_format="pyarrow")


def sql_gini_nation() -> str:
    return (
        "WITH s AS (SELECT o_custkey, "
        "sum(CAST(floor(o_totalprice*100.0+0.5) AS BIGINT)) AS x "
        "FROM orders GROUP BY o_custkey), "
        "j AS (SELECT c.c_nationkey AS nk, s.x, s.o_custkey "
        "FROM s JOIN customer c ON s.o_custkey = c.c_custkey), "
        "r AS (SELECT nk, x, row_number() OVER (PARTITION BY nk "
        "ORDER BY x, o_custkey) AS i FROM j), "
        "a AS (SELECT nk, sum(i*x) AS six, sum(x) AS sx, count(*) AS n "
        "FROM r GROUP BY nk) "
        "SELECT CAST(nk AS BIGINT) AS nationkey, "
        "CAST(n AS BIGINT) AS n_customers, "
        "CAST(floor((2*six - (n+1)*sx) * 1e6 / (n*sx) + 0.5) AS BIGINT) "
        "AS gini_e6 FROM a")


# ---------------- funnel conversion latency quantiles ----------------

def q_funnel_latency(sf_dir: str):
    """Time from a user's FIRST view to their first purchase at or
    after it — the conversion-latency metric behind funnel dashboards,
    reduced to exact p50/p90 seconds plus the converted-user count.
    Two per-user Min groupbys (first view; first qualifying purchase
    via one join + filter) shrink the stream to O(users) latencies;
    the discrete quantiles (rank = max(1, ceil(q*n)), the
    quantile_disc convention used repo-wide) come from one whole-block
    task over that small table."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts",
                                               "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "us": _ts_us(b),
                         "event_type": b["event_type"]})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)

    def only(kind: str):
        def f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b["event_type"], kind))
            return t.select(["user_id", "us"])
        return f

    fv = rows.map_batches(only("view"), batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("user_id").aggregate(Min(on="us", alias_name="fv"))
    pur = rows.map_batches(only("purchase"), batch_format="pyarrow",
                           zero_copy_batch=True)
    j = pur.join(fv, join_type="inner", num_partitions=4,
                 on=("user_id",))

    def after(b: pa.Table) -> pa.Table:
        us = b["us"].to_numpy(zero_copy_only=False)
        f = b["fv"].to_numpy(zero_copy_only=False)
        keep = us >= f
        return pa.table({"user_id": b["user_id"].to_numpy(
                             zero_copy_only=False)[keep],
                         "lat_us": us[keep] - f[keep]})

    lat = j.map_batches(after, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .groupby("user_id").aggregate(Min(on="lat_us", alias_name="lat"))

    def q(b: pa.Table) -> pa.Table:
        v = np.sort(b["lat"].to_numpy(zero_copy_only=False) // 1_000_000)
        n = len(v)
        p50 = v[max(1, int(np.ceil(0.5 * n))) - 1]
        p90 = v[max(1, int(np.ceil(0.9 * n))) - 1]
        return pa.table({"n_converted": np.asarray([n], dtype=np.int64),
                         "p50_s": np.asarray([p50], dtype=np.int64),
                         "p90_s": np.asarray([p90], dtype=np.int64)})

    return lat.repartition(1).map_batches(q, batch_format="pyarrow",
                                          batch_size=None)


def sql_funnel_latency() -> str:
    return (
        "WITH fv AS (SELECT user_id, min(epoch_us(ts)) AS fv FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "fp AS (SELECT e.user_id, "
        "min(epoch_us(e.ts)) - min(fv.fv) AS lat_us "
        "FROM events e JOIN fv ON e.user_id = fv.user_id "
        "AND epoch_us(e.ts) >= fv.fv "
        "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
        "SELECT CAST(count(*) AS BIGINT) AS n_converted, "
        "CAST(quantile_disc(lat_us // 1000000, 0.5) AS BIGINT) AS p50_s, "
        "CAST(quantile_disc(lat_us // 1000000, 0.9) AS BIGINT) AS p90_s "
        "FROM fp")


# ---------------- lag-1 autocorrelation of the daily series ----------------

def q_daily_autocorr(sf_dir: str):
    """Lag-1 Pearson autocorrelation of the per-type DAILY event-count
    series — the burstiness / momentum diagnostic for time series
    (bot traffic autocorrelates, organic noise doesn't).  Consecutive-
    day pairs only (a gap day breaks the pair, both engines identical
    via the day arithmetic).  All five sufficient sums are integers;
    the single final float expression follows the corr_price_qty
    convention (identical IEEE expression both sides, e6 half-up).
    Heavy step: one (type, day) groupby; the series itself is tiny and
    pairs form in one whole-block task."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        us = _ts_us(b)
        return pa.table({"event_type": b["event_type"],
                         "day": us // DAY_US})

    counts = ev.map_batches(pre, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(["event_type", "day"]).aggregate(Count(alias_name="n"))

    def corr(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "day"],
                            kind="mergesort").reset_index(drop=True)
        et = df["event_type"].to_numpy()
        day = df["day"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        pair = (et[1:] == et[:-1]) & (day[1:] == day[:-1] + 1)
        x, y = n[:-1][pair], n[1:][pair]
        types = et[:-1][pair]
        out_t, out_r, out_n = [], [], []
        for t in pd.unique(types):                 # O(types) loop
            m = types == t
            xs, ys = x[m], y[m]
            k = len(xs)
            sx, sy = int(xs.sum()), int(ys.sum())
            sxx = int((xs * xs).sum())
            syy = int((ys * ys).sum())
            sxy = int((xs * ys).sum())
            r = (k * sxy - sx * sy) / np.sqrt(
                (k * sxx - sx * sx) * (k * syy - sy * sy))
            out_t.append(t)
            out_r.append(int(np.floor(r * 1e6 + 0.5)))
            out_n.append(k)
        return pd.DataFrame({"event_type": out_t,
                             "n_pairs": pd.Series(out_n, dtype="int64"),
                             "r1_e6": pd.Series(out_r, dtype="int64")})

    return (counts.repartition(1)
            .map_batches(corr, batch_format="pandas", batch_size=None))


def sql_daily_autocorr() -> str:
    return (
        f"WITH c AS (SELECT event_type, epoch_us(ts) // {DAY_US} AS day, "
        "CAST(count(*) AS BIGINT) AS n FROM events "
        "GROUP BY event_type, day), "
        "p AS (SELECT event_type, day, n, "
        "lag(day) OVER (PARTITION BY event_type ORDER BY day) AS pd, "
        "lag(n) OVER (PARTITION BY event_type ORDER BY day) AS pn "
        "FROM c), "
        "q AS (SELECT event_type, pn AS x, n AS y FROM p "
        "WHERE pd = day - 1), "
        "a AS (SELECT event_type, count(*) AS k, sum(x) AS sx, "
        "sum(y) AS sy, sum(x*x) AS sxx, sum(y*y) AS syy, "
        "sum(x*y) AS sxy FROM q GROUP BY event_type) "
        "SELECT event_type, CAST(k AS BIGINT) AS n_pairs, "
        "CAST(floor((k*sxy - sx*sy)/sqrt((k*sxx - sx*sx)"
        "*(k*syy - sy*sy))*1e6 + 0.5) AS BIGINT) AS r1_e6 FROM a")


# ---------------- Kaplan-Meier survival table of inter-order gaps ----------------

def q_km_interorder(sf_dir: str):
    """Kaplan-Meier sufficient statistics for customer inter-order
    gaps: for every observed gap length d (days), n_events = gaps of
    exactly d and n_at_risk = gaps >= d — the survival / churn table
    (S(t) is a trivial client-side product over these integer rows;
    the product itself is deliberately not emitted per the repo's
    integer-exact convention).

    Distributed lag without per-group Python: rank orders within each
    customer (sorted-block ranker), one (custkey, rank) hash self-join
    pairs each order with its successor, gaps fold through a
    (gap)-keyed count groupby, and the tiny distinct-gap table gets
    its suffix sum (n_at_risk) in one whole-block task."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    orders = read_table(sf_dir, "orders", columns=["o_orderkey",
                                                   "o_custkey",
                                                   "o_orderdate"])

    def pre(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"ck": b["o_custkey"].cast(pa.int64()),
                         "day": us // DAY_US,
                         "o_orderkey": b["o_orderkey"].cast(pa.int64())})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True)
    ranked = rank_per_group(rows, key="ck",
                            order=["day", "o_orderkey"],
                            descending=[False, False]).materialize()
    nxt = ranked.map_batches(
        lambda b: pa.table({"ck2": b["ck"],
                            "prev_rank": b["rank"].to_numpy(
                                zero_copy_only=False) - 1,
                            "day2": b["day"]}),
        batch_format="pyarrow")
    j = ranked.join(nxt, join_type="inner", num_partitions=4,
                    on=("ck", "rank"), right_on=("ck2", "prev_rank"))

    gaps = j.map_batches(
        lambda b: pa.table({"gap_days": (
            b["day2"].to_numpy(zero_copy_only=False)
            - b["day"].to_numpy(zero_copy_only=False))}),
        batch_format="pyarrow") \
        .groupby("gap_days").aggregate(Count(alias_name="n_events"))

    def survival(b: pa.Table) -> pa.Table:
        g = b["gap_days"].to_numpy(zero_copy_only=False)
        n = b["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(g)
        g, n = g[order], n[order]
        at_risk = np.cumsum(n[::-1])[::-1]
        return pa.table({"gap_days": g.astype(np.int64), "n_events": n,
                         "n_at_risk": at_risk.astype(np.int64)})

    return gaps.repartition(1).map_batches(
        survival, batch_format="pyarrow", batch_size=None)


def sql_km_interorder() -> str:
    return (
        "WITH o AS (SELECT o_custkey AS ck, "
        f"epoch_us(o_orderdate) // {DAY_US} AS day, o_orderkey "
        "FROM orders), "
        "p AS (SELECT ck, day, lead(day) OVER (PARTITION BY ck "
        "ORDER BY day, o_orderkey) AS nday FROM o), "
        "g AS (SELECT nday - day AS gap_days FROM p "
        "WHERE nday IS NOT NULL), "
        "c AS (SELECT gap_days, CAST(count(*) AS BIGINT) AS n_events "
        "FROM g GROUP BY gap_days) "
        "SELECT CAST(gap_days AS BIGINT) AS gap_days, n_events, "
        "CAST(sum(n_events) OVER (ORDER BY gap_days DESC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS n_at_risk FROM c")


# ---------------- maximum interval concurrency (sweep-line depth) ----------------

def q_max_concurrency(sf_dir: str):
    """Peak number of simultaneously-open 10-minute event intervals and
    the earliest instant it is reached — the sweep-line depth operator
    behind capacity sizing (max concurrent sessions, peak connection
    count).  Each event contributes (+1 at ts, -1 at ts+D) deltas; the
    running sum in (us, delta) order — ends sort before starts at the
    same instant, so touching intervals never double-count — is the
    live depth.  The distributed running total is
    stages/temporal.cumsum_per_key (per-block vectorized partials,
    O(1)-per-boundary stitch); the max and its argmin-time are two
    scalar aggregates over the depth table."""
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    ev = read_table(sf_dir, "events", columns=["ts"])

    def deltas(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = len(us)
        return pa.table({
            "key": np.zeros(2 * n, dtype=np.int64),
            "us": np.concatenate([us, us + COVER_D_US]),
            "val": np.concatenate([np.ones(n, np.int64),
                                   np.full(n, -1, np.int64)])})

    pts = ev.map_batches(deltas, batch_format="pyarrow",
                         zero_copy_batch=True)
    depth = cumsum_per_key(pts, payload_cols=[],
                           order_cols=("us", "val")).materialize()
    md = int(depth.max("cum_val"))
    at = int(depth.filter(expr=f"cum_val == {md}").min("us"))
    return pa.table({"max_depth": np.asarray([md], dtype=np.int64),
                     "at_us": np.asarray([at], dtype=np.int64)})


def sql_max_concurrency() -> str:
    return (
        "WITH pts AS (SELECT epoch_us(ts) AS us, 1 AS d FROM events "
        f"UNION ALL SELECT epoch_us(ts) + {COVER_D_US}, -1 FROM events), "
        "c AS (SELECT us, sum(d) OVER (ORDER BY us, d "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth "
        "FROM pts), "
        "m AS (SELECT max(depth) AS md FROM c) "
        "SELECT CAST(m.md AS BIGINT) AS max_depth, "
        "CAST((SELECT min(us) FROM c WHERE c.depth = m.md) AS BIGINT) "
        "AS at_us FROM m")


# ---------------- categorical transition matrix (Markov counts) ----------------

def q_priority_transitions(sf_dir: str):
    """Transition counts between the order-priority classes of each
    customer's consecutive orders — the empirical Markov matrix
    (state-transition mining over per-entity ordered histories).
    Same distributed-lag shape as km_interorder: sorted-block rank per
    customer, one (custkey, rank) self-join to pair each order with
    its successor, then one (from, to) groupby."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderdate", "o_orderpriority"])

    def pre(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"ck": b["o_custkey"].cast(pa.int64()),
                         "day": pc.divide(us, DAY_US),
                         "o_orderkey": b["o_orderkey"].cast(pa.int64()),
                         "prio": b["o_orderpriority"]})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True)
    ranked = rank_per_group(rows, key="ck",
                            order=["day", "o_orderkey"],
                            descending=[False, False]).materialize()
    nxt = ranked.map_batches(
        lambda b: pa.table({"ck2": b["ck"],
                            "prev_rank": b["rank"].to_numpy(
                                zero_copy_only=False) - 1,
                            "to_prio": b["prio"]}),
        batch_format="pyarrow")
    j = ranked.join(nxt, join_type="inner", num_partitions=4,
                    on=("ck", "rank"), right_on=("ck2", "prev_rank"))
    return j.groupby(["prio", "to_prio"]) \
        .aggregate(Count(alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "from_prio": b["prio"], "to_prio": b["to_prio"],
            "n": b["n"].cast(pa.int64())}), batch_format="pyarrow")


def sql_priority_transitions() -> str:
    return (
        "WITH o AS (SELECT o_custkey AS ck, "
        f"epoch_us(o_orderdate) // {DAY_US} AS day, o_orderkey, "
        "o_orderpriority AS prio FROM orders), "
        "p AS (SELECT ck, prio, lead(prio) OVER (PARTITION BY ck "
        "ORDER BY day, o_orderkey) AS nprio FROM o) "
        "SELECT prio AS from_prio, nprio AS to_prio, "
        "CAST(count(*) AS BIGINT) AS n FROM p "
        "WHERE nprio IS NOT NULL GROUP BY prio, nprio")


# ---------------- hierarchical rollup over an implicit binary tree ----------------

TREE_LEVELS = 3


def q_tree_rollup(sf_dir: str):
    """Revenue rollup over the implicit binary hierarchy node =
    orderkey >> level (levels 1..3) — the hierarchical-aggregation
    pattern (category trees, org charts, geo pyramids) expressed the
    scalable way: level L aggregates the ALREADY-REDUCED level L-1
    output (combiner reuse), so each successive groupby touches half
    the keys of the previous one instead of re-scanning the fact
    table.  Output (level, node, sum_e2, n_orders), integer-exact."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["o_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64) >> 1,
            "sum_e2": scale_col(
                b["o_totalprice"].to_numpy(zero_copy_only=False), 100.0),
            "n_orders": np.ones(b.num_rows, dtype=np.int64)})

    level = orders.map_batches(pre, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby("node").aggregate(Sum("sum_e2", alias_name="sum_e2"),
                                   Sum("n_orders", alias_name="n_orders"))
    outs = []
    for lv in range(1, TREE_LEVELS + 1):
        outs.append(level.map_batches(
            lambda b, _lv=lv: pa.table({
                "level": np.full(b.num_rows, _lv, np.int64),
                "node": b["node"].cast(pa.int64()),
                "sum_e2": b["sum_e2"].cast(pa.int64()),
                "n_orders": b["n_orders"].cast(pa.int64())}),
            batch_format="pyarrow").materialize())
        if lv < TREE_LEVELS:
            level = level.map_batches(
                lambda b: pa.table({
                    "node": b["node"].cast(pa.int64()).to_numpy(
                        zero_copy_only=False) >> 1,
                    "sum_e2": b["sum_e2"].cast(pa.int64()),
                    "n_orders": b["n_orders"].cast(pa.int64())}),
                batch_format="pyarrow") \
                .groupby("node").aggregate(
                    Sum("sum_e2", alias_name="sum_e2"),
                    Sum("n_orders", alias_name="n_orders"))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def sql_tree_rollup() -> str:
    sel = " UNION ALL ".join(
        f"SELECT {lv} AS level, o_orderkey // {1 << lv} AS node, "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS v FROM orders"
        for lv in range(1, TREE_LEVELS + 1))
    return (
        f"WITH u AS ({sel}) "
        "SELECT CAST(level AS BIGINT) AS level, CAST(node AS BIGINT) "
        "AS node, CAST(sum(v) AS BIGINT) AS sum_e2, "
        "CAST(count(*) AS BIGINT) AS n_orders "
        "FROM u GROUP BY level, node")


# ---------------- any-distance precedence pair counts ----------------

def q_precedence_counts(sf_dir: str):
    """Global counts of ordered event-type pairs (a strictly before b
    in the same user's history, ANY distance apart) — the sequential-
    pattern / precedence-mining primitive that adjacency bigrams
    (event_bigrams) and bounded-window motifs (temporal_pairs) both
    miss.  Per user the count matrix is an exclusive-prefix-count
    matmul (M^T @ onehot), so each user group is one vectorized numpy
    op inside a user-keyed map_groups (groups are per-user histories,
    dozens of rows); one (a, b) groupby sums the per-user matrices.
    Tie-break (ts, event_id) identical to the oracle's join
    predicate."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts",
                                               "event_id", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "us": _ts_us(b),
                         "event_id": b["event_id"].cast(pa.int64()),
                         "event_type": b["event_type"]})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["us", "event_id"], kind="mergesort")
        types, codes = np.unique(df["event_type"].to_numpy(),
                                 return_inverse=True)
        k, n = len(types), len(df)
        onehot = np.zeros((n, k), dtype=np.int64)
        onehot[np.arange(n), codes] = 1
        excl = np.cumsum(onehot, axis=0) - onehot   # counts strictly before
        mat = excl.T @ onehot                        # (a, b) precedence
        a_idx, b_idx = np.nonzero(mat)
        return pd.DataFrame({
            "type_a": types[a_idx], "type_b": types[b_idx],
            "n": mat[a_idx, b_idx]})

    return ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("user_id").map_groups(per_user, batch_format="pandas") \
        .groupby(["type_a", "type_b"]).aggregate(Sum("n", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "type_a": b["type_a"], "type_b": b["type_b"],
            "n": b["n"].cast(pa.int64())}), batch_format="pyarrow")


def sql_precedence_counts() -> str:
    return (
        "SELECT a.event_type AS type_a, b.event_type AS type_b, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM events a JOIN events b ON a.user_id = b.user_id "
        "AND (epoch_us(a.ts) < epoch_us(b.ts) "
        "OR (epoch_us(a.ts) = epoch_us(b.ts) "
        "AND a.event_id < b.event_id)) "
        "GROUP BY a.event_type, b.event_type")


# ---------------- winsorized mean per group ----------------

def q_winsorized_mean(sf_dir: str):
    """p10/p90-winsorized mean of the event value per type — the
    robust location estimate that keeps every observation but clamps
    the tails (less brittle than trimming under heavy skew).  The two
    clamp bounds are exact rank-selection quantiles (quantile_disc
    convention, stages/ranked.py); the clamp + sum pass is integer e2
    so the winsorized sum is reduction-order exact; one final float
    gives wmean_e6 under the shared half-up convention."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type",
                                               "value"])

    def pre(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        codes = pd.util.hash_array(et.astype(str).astype(object)) \
            .astype(np.int64) >> 1
        return pa.table({
            "etk": codes, "event_type": b["event_type"],
            "v": scale_col(b["value"].to_numpy(zero_copy_only=False),
                           100.0),
            "event_id": b["event_id"].cast(pa.int64())})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    ranked = rank_per_group(rows, key="etk", order=["v", "event_id"],
                            descending=[False, False])
    counts = rows.groupby("etk").aggregate(Count(alias_name="n"))
    joined = ranked.join(counts, join_type="inner", num_partitions=2,
                         on=("etk",))

    def pick(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        rank = b["rank"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        lo = rank == np.maximum(1, np.ceil(0.1 * n).astype(np.int64))
        hi = rank == np.maximum(1, np.ceil(0.9 * n).astype(np.int64))
        keep = lo | hi
        big = np.int64(np.iinfo(np.int64).min)
        return pa.table({
            "event_type": b["event_type"].take(
                pa.array(np.flatnonzero(keep))),
            "p10": np.where(lo[keep], v[keep], big),
            "p90": np.where(hi[keep], v[keep], big)})

    qs = joined.map_batches(pick, batch_format="pyarrow") \
        .groupby("event_type").aggregate(Max("p10", alias_name="p10"),
                                         Max("p90", alias_name="p90")) \
        .to_pandas()
    bounds = {r["event_type"]: (int(r["p10"]), int(r["p90"]))
              for _, r in qs.iterrows()}

    def clamp(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_pylist()
        lo = np.asarray([bounds[t][0] for t in et], dtype=np.int64)
        hi = np.asarray([bounds[t][1] for t in et], dtype=np.int64)
        v = np.clip(b["v"].to_numpy(zero_copy_only=False), lo, hi)
        return pa.table({"event_type": b["event_type"], "wv": v,
                         "one": np.ones(len(v), np.int64)})

    agg = rows.map_batches(clamp, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("event_type").aggregate(Sum("wv", alias_name="wsum_e2"),
                                         Sum("one", alias_name="n")) \
        .to_pandas()
    ws = agg["wsum_e2"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    return pa.table({
        "event_type": agg["event_type"].to_numpy(),
        "n": n, "wsum_e2": ws,
        "wmean_e6": np.floor(ws * 1e4 / n + 0.5).astype(np.int64)})


def sql_winsorized_mean() -> str:
    return (
        "WITH e AS (SELECT event_type, "
        "CAST(floor(value*100.0+0.5) AS BIGINT) AS v FROM events), "
        "q AS (SELECT event_type, "
        "CAST(quantile_disc(v, 0.1) AS BIGINT) AS p10, "
        "CAST(quantile_disc(v, 0.9) AS BIGINT) AS p90 "
        "FROM e GROUP BY event_type), "
        "w AS (SELECT e.event_type, "
        "least(greatest(e.v, q.p10), q.p90) AS wv "
        "FROM e JOIN q USING (event_type)) "
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(wv) AS BIGINT) AS wsum_e2, "
        "CAST(floor(sum(wv) * 1e4 / count(*) + 0.5) AS BIGINT) "
        "AS wmean_e6 FROM w GROUP BY event_type")


# ---------------- shipping-delay profile by order month ----------------

def q_ship_delay(sf_dir: str):
    """Days from order placement to each lineitem's ship date,
    profiled per order month (n, total, max) — the fulfillment-latency
    / SLA metric joining the fact table to its parent header.  One
    orderkey hash join, vectorized day arithmetic, one month groupby;
    integer end to end."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey",
                                                 "l_shipdate"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey",
                                                   "o_orderdate"])
    j = li.join(orders, join_type="inner", num_partitions=4,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def delay(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False) // DAY_US
        odate = b["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"month": odate // (30 * DAY_US),
                         "delay_days": ship - odate // DAY_US})

    return j.map_batches(delay, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("month").aggregate(
            Count(alias_name="n"),
            Sum("delay_days", alias_name="sum_days"),
            Max("delay_days", alias_name="max_days")) \
        .map_batches(lambda b: pa.table({
            "month": b["month"].cast(pa.int64()),
            "n": b["n"].cast(pa.int64()),
            "sum_days": b["sum_days"].cast(pa.int64()),
            "max_days": b["max_days"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_ship_delay() -> str:
    return (
        "SELECT CAST(epoch_us(o.o_orderdate) // "
        f"({30} * {DAY_US}) AS BIGINT) AS month, "
        "CAST(count(*) AS BIGINT) AS n, "
        f"CAST(sum(epoch_us(l.l_shipdate) // {DAY_US} "
        f"- epoch_us(o.o_orderdate) // {DAY_US}) AS BIGINT) AS sum_days, "
        f"CAST(max(epoch_us(l.l_shipdate) // {DAY_US} "
        f"- epoch_us(o.o_orderdate) // {DAY_US}) AS BIGINT) AS max_days "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY month")


# ---------------- latest-wins upsert compaction (CDC) ----------------

def q_upsert_latest(sf_dir: str):
    """Latest-wins compaction of the event stream keyed by
    (user_id, event_type): keep each key's most recent row — the CDC /
    changelog-upsert primitive every lakehouse MERGE implements.
    Deterministic under ts ties via the event_id tie-break.  One
    sorted-block rank per key (descending ts) + a stateless rank==1
    filter; no driver state."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id",
                                               "ts", "event_type",
                                               "value"])

    def pre(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        tk = pd.util.hash_array(et.astype(str).astype(object)) \
            .astype(np.int64) >> 1
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": u * 1_000_003 + (tk % 1_000_003),
            "user_id": u, "event_type": b["event_type"],
            "us": _ts_us(b),
            "event_id": b["event_id"].cast(pa.int64()),
            "value_e2": scale_col(
                b["value"].to_numpy(zero_copy_only=False), 100.0)})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)
    ranked = rank_per_group(rows, key="key",
                            order=["us", "event_id"],
                            descending=[True, True])

    def keep(b: pa.Table) -> pa.Table:
        m = b["rank"].to_numpy(zero_copy_only=False) == 1
        idx = pa.array(np.flatnonzero(m))
        return pa.table({
            "user_id": b["user_id"].take(idx),
            "event_type": b["event_type"].take(idx),
            "us": b["us"].take(idx),
            "event_id": b["event_id"].take(idx),
            "value_e2": b["value_e2"].take(idx)})

    return ranked.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_upsert_latest() -> str:
    return (
        "WITH r AS (SELECT user_id, event_type, epoch_us(ts) AS us, "
        "event_id, CAST(floor(value*100.0+0.5) AS BIGINT) AS value_e2, "
        "row_number() OVER (PARTITION BY user_id, event_type "
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
        "SELECT CAST(user_id AS BIGINT) AS user_id, event_type, "
        "CAST(us AS BIGINT) AS us, CAST(event_id AS BIGINT) AS event_id, "
        "value_e2 FROM r WHERE rn = 1")


# ---------------- SCD2 validity intervals from a changelog ----------------

def q_scd_intervals(sf_dir: str):
    """Slowly-changing-dimension (type 2) history table from the event
    changelog: each (user, event_type) observation becomes a row with
    [valid_from, valid_to) — valid_to = the key's next observation, or
    -1 for the still-current row (integer sentinel instead of NULL so
    the value-hash is engine-neutral).  Completes the CDC pair with
    upsert_latest.  Distributed lead: sorted-block rank per key + one
    (key, rank) self-join — no window state on the driver."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id",
                                               "ts", "event_type",
                                               "value"])

    def pre(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        tk = pd.util.hash_array(et.astype(str).astype(object)) \
            .astype(np.int64) >> 1
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": u * 1_000_003 + (tk % 1_000_003),
            "user_id": u, "event_type": b["event_type"],
            "us": _ts_us(b),
            "event_id": b["event_id"].cast(pa.int64()),
            "value_e2": scale_col(
                b["value"].to_numpy(zero_copy_only=False), 100.0)})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)
    ranked = rank_per_group(rows, key="key",
                            order=["us", "event_id"],
                            descending=[False, False]).materialize()
    nxt = ranked.map_batches(
        lambda b: pa.table({"key2": b["key"],
                            "prev_rank": b["rank"].to_numpy(
                                zero_copy_only=False) - 1,
                            "next_us": b["us"]}),
        batch_format="pyarrow")
    j = ranked.join(nxt, join_type="left_outer", num_partitions=4,
                    on=("key", "rank"), right_on=("key2", "prev_rank"))

    def out(b: pa.Table) -> pa.Table:
        nu = pc.fill_null(b["next_us"], -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "event_type": b["event_type"],
            "value_e2": b["value_e2"].cast(pa.int64()),
            "valid_from_us": b["us"].cast(pa.int64()),
            "valid_to_us": nu})

    return j.map_batches(out, batch_format="pyarrow")


def sql_scd_intervals() -> str:
    return (
        "SELECT CAST(user_id AS BIGINT) AS user_id, event_type, "
        "CAST(floor(value*100.0+0.5) AS BIGINT) AS value_e2, "
        "CAST(epoch_us(ts) AS BIGINT) AS valid_from_us, "
        "CAST(COALESCE(lead(epoch_us(ts)) OVER (PARTITION BY user_id, "
        "event_type ORDER BY ts, event_id), -1) AS BIGINT) "
        "AS valid_to_us FROM events")


# ---------------- user journey path signatures ----------------

JOURNEY_K = 5


def q_journey_paths(sf_dir: str):
    """Count of each distinct user journey — the ordered signature of
    a user's first 5 event types ('view>click>purchase>...') — the
    path-analytics primitive behind funnel-discovery dashboards.
    Per-user signature built inside a user-keyed map_groups (each
    group is one small history; ts+event_id tie-break identical to
    the oracle's window), then one signature groupby."""
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id",
                                               "ts", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "us": _ts_us(b),
                         "event_id": b["event_id"].cast(pa.int64()),
                         "event_type": b["event_type"]})

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["us", "event_id"],
                            kind="mergesort").head(JOURNEY_K)
        return pd.DataFrame({
            "journey": [">".join(df["event_type"].tolist())]})

    return ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("user_id").map_groups(sig, batch_format="pandas") \
        .groupby("journey").aggregate(Count(alias_name="n_users")) \
        .map_batches(lambda b: pa.table({
            "journey": b["journey"],
            "n_users": b["n_users"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_journey_paths() -> str:
    return (
        "WITH r AS (SELECT user_id, event_type, row_number() OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events), "
        "s AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) "
        f"AS journey FROM r WHERE rn <= {JOURNEY_K} GROUP BY user_id) "
        "SELECT journey, CAST(count(*) AS BIGINT) AS n_users "
        "FROM s GROUP BY journey")


# ---------------- semi-structured JSON field extraction ----------------

def q_json_extract_stats(sf_dir: str):
    """Extract the integer field k from the ``props`` JSON string and
    profile it per event type (n, sum, min, max) — the semi-structured
    column-extraction pattern (properties bags, API payloads) done
    with a vectorized regex (pandas str.extract vs RE2 regexp_extract,
    same pattern both sides) instead of a JSON parser per row.
    Integer end to end."""
    ev = read_table(sf_dir, "events", columns=["event_type", "props"])

    def ext(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k": (\d+)', expand=False)
        m = k.notna()
        return pd.DataFrame({
            "event_type": df["event_type"][m],
            "k": k[m].astype("int64")})

    return ev.map_batches(ext, batch_format="pandas") \
        .groupby("event_type").aggregate(
            Count(alias_name="n"), Sum("k", alias_name="sum_k"),
            Min("k", alias_name="min_k"), Max("k", alias_name="max_k")) \
        .map_batches(lambda b: pa.table({
            "event_type": b["event_type"],
            "n": b["n"].cast(pa.int64()),
            "sum_k": b["sum_k"].cast(pa.int64()),
            "min_k": b["min_k"].cast(pa.int64()),
            "max_k": b["max_k"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_json_extract_stats() -> str:
    return (
        "WITH e AS (SELECT event_type, "
        "CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) AS k "
        "FROM events WHERE regexp_matches(props, '\"k\": (\\d+)')) "
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(k) AS BIGINT) AS sum_k, "
        "CAST(min(k) AS BIGINT) AS min_k, "
        "CAST(max(k) AS BIGINT) AS max_k FROM e GROUP BY event_type")


# ---------------- series densification (zero-fill missing hours) ----------------

def q_densify_hours(sf_dir: str):
    """Per-type hourly counts DENSIFIED over the full [min, max] hour
    grid with explicit zero rows — the gap-filling step every
    time-series model needs before windows/derivatives (missing hours
    are data, not absence of rows).  The fact scan is one (type, hour)
    groupby; the grid is O(types x hours) built in one whole-block
    task from two scalar bounds and left-merged against the sparse
    counts."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        us = _ts_us(b)
        return pa.table({"event_type": b["event_type"],
                         "hour_us": (us // HOUR_US) * HOUR_US})

    sparse = ev.map_batches(pre, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(["event_type", "hour_us"]) \
        .aggregate(Count(alias_name="n")).materialize()
    lo = int(sparse.min("hour_us"))
    hi = int(sparse.max("hour_us"))

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        grid_h = np.arange(lo, hi + HOUR_US, HOUR_US, dtype=np.int64)
        types = np.sort(df["event_type"].unique())
        full = pd.MultiIndex.from_product(
            [types, grid_h], names=["event_type", "hour_us"]).to_frame(
            index=False)
        out = full.merge(df, on=["event_type", "hour_us"], how="left")
        out["n"] = out["n"].fillna(0).astype("int64")
        out["hour_us"] = out["hour_us"].astype("int64")
        return out

    return sparse.repartition(1).map_batches(
        fill, batch_format="pandas", batch_size=None)


def sql_densify_hours() -> str:
    return (
        "WITH c AS (SELECT event_type, "
        f"CAST((epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS BIGINT) "
        "AS hour_us, CAST(count(*) AS BIGINT) AS n FROM events "
        "GROUP BY event_type, hour_us), "
        "b AS (SELECT min(hour_us) AS lo, max(hour_us) AS hi FROM c), "
        f"g AS (SELECT unnest(range(b.lo, b.hi + {HOUR_US}, "
        f"{HOUR_US})) AS hour_us FROM b), "
        "t AS (SELECT DISTINCT event_type FROM c) "
        "SELECT t.event_type, CAST(g.hour_us AS BIGINT) AS hour_us, "
        "CAST(COALESCE(c.n, 0) AS BIGINT) AS n "
        "FROM t CROSS JOIN g LEFT JOIN c "
        "ON c.event_type = t.event_type AND c.hour_us = g.hour_us")


# ---------------- anti-entropy table checksums per bucket ----------------

CHECKSUM_BUCKETS = 64
_CK_M = (1 << 31) - 1


def q_table_checksum(sf_dir: str):
    """Order-insensitive content checksum of the orders table per
    hash bucket — the anti-entropy / replica-verification primitive
    (compare per-bucket digests across copies, re-sync only diverging
    buckets).  Each row folds to one affine hash over its columns
    (mod 2^31-1 pre-reductions keep every product int64-safe and
    SQL-identical); bucket digest = plain SUM of row hashes, so the
    digest is reduction-order independent by construction.  One
    stateless map + one 64-group groupby."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey",
                                 "o_totalprice"])

    def rh(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = scale_col(b["o_totalprice"].to_numpy(zero_copy_only=False),
                      100.0)
        h = ((k % _CK_M) * 1_103_515_245 + (c % _CK_M) * 69_069
             + (p % _CK_M) * 40_692) % _CK_M
        return pa.table({"bucket": k % CHECKSUM_BUCKETS,
                         "h": h, "one": np.ones(len(k), np.int64)})

    return orders.map_batches(rh, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("bucket").aggregate(Sum("h", alias_name="checksum"),
                                     Sum("one", alias_name="n_rows")) \
        .map_batches(lambda b: pa.table({
            "bucket": b["bucket"].cast(pa.int64()),
            "checksum": b["checksum"].cast(pa.int64()),
            "n_rows": b["n_rows"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_table_checksum() -> str:
    return (
        "WITH r AS (SELECT o_orderkey % "
        f"{CHECKSUM_BUCKETS} AS bucket, "
        f"((o_orderkey % {_CK_M}) * 1103515245 "
        f"+ (o_custkey % {_CK_M}) * 69069 "
        f"+ (CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) % {_CK_M}) "
        f"* 40692) % {_CK_M} AS h FROM orders) "
        "SELECT CAST(bucket AS BIGINT) AS bucket, "
        "CAST(sum(h) AS BIGINT) AS checksum, "
        "CAST(count(*) AS BIGINT) AS n_rows FROM r GROUP BY bucket")


# ---------------- Gini-Simpson behavioral diversity per user ----------------

def q_user_diversity(sf_dir: str):
    """Gini-Simpson diversity 1 - sum(p_t^2) of each user's event-type
    mix — the diversity index that, unlike Shannon entropy, is exact
    rational arithmetic (no libm log): D_e6 = floor((n^2 - sum c^2) *
    1e6 / n^2 + 0.5) from integer per-(user, type) counts.  Bots score
    near 0 (one behavior), engaged users near the 4/5 ceiling of five
    types.  Two groupbys: (user, type) counts, then per-user fold."""
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    counts = ev.groupby(["user_id", "event_type"]).aggregate(
        Count(alias_name="c"))

    def fold(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": b["user_id"].cast(pa.int64()),
                         "n": c, "c2": c * c})

    agg = counts.map_batches(fold, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("user_id").aggregate(Sum("n", alias_name="n"),
                                      Sum("c2", alias_name="c2"))

    def div(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = b["c2"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.floor((n * n - c2) * 1e6 / (n * n) + 0.5).astype(np.int64)
        return pa.table({"user_id": b["user_id"].cast(pa.int64()),
                         "n_events": n, "simpson_e6": d})

    return agg.map_batches(div, batch_format="pyarrow")


def sql_user_diversity() -> str:
    return (
        "WITH c AS (SELECT user_id, event_type, count(*) AS c "
        "FROM events GROUP BY user_id, event_type), "
        "a AS (SELECT user_id, sum(c) AS n, sum(c*c) AS c2 FROM c "
        "GROUP BY user_id) "
        "SELECT CAST(user_id AS BIGINT) AS user_id, "
        "CAST(n AS BIGINT) AS n_events, "
        "CAST(floor((n*n - c2) * 1e6 / (n*n) + 0.5) AS BIGINT) "
        "AS simpson_e6 FROM a")


# ---------------- feature-store user activity features ----------------

def q_user_features(sf_dir: str):
    """Per-user churn/engagement feature row — days since last event,
    event counts in the trailing 7- and 30-day windows (relative to
    the corpus max timestamp, the standard offline feature-store
    convention), and total count.  One scalar max + one conditional-sum
    groupby; integer end to end."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"], "us": _ts_us(b)})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    now = int(rows.max("us"))

    def feats(b: pa.Table) -> pa.Table:
        us = b["us"].to_numpy(zero_copy_only=False)
        age_d = (now - us) // DAY_US
        return pa.table({
            "user_id": b["user_id"],
            "one": np.ones(len(us), np.int64),
            "in7": (age_d < 7).astype(np.int64),
            "in30": (age_d < 30).astype(np.int64),
            "last_us": us})

    agg = rows.map_batches(feats, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("user_id").aggregate(
            Sum("one", alias_name="n_total"),
            Sum("in7", alias_name="n_7d"),
            Sum("in30", alias_name="n_30d"),
            Max("last_us", alias_name="last_us"))

    def out(b: pa.Table) -> pa.Table:
        last = b["last_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "n_total": b["n_total"].cast(pa.int64()),
            "n_7d": b["n_7d"].cast(pa.int64()),
            "n_30d": b["n_30d"].cast(pa.int64()),
            "days_since_last": (now - last) // DAY_US})

    return agg.map_batches(out, batch_format="pyarrow")


def sql_user_features() -> str:
    return (
        "WITH m AS (SELECT max(epoch_us(ts)) AS now FROM events) "
        "SELECT CAST(user_id AS BIGINT) AS user_id, "
        "CAST(count(*) AS BIGINT) AS n_total, "
        "CAST(sum(CASE WHEN (m.now - epoch_us(ts)) // "
        f"{DAY_US} < 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_7d, "
        "CAST(sum(CASE WHEN (m.now - epoch_us(ts)) // "
        f"{DAY_US} < 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_30d, "
        f"CAST((m.now - max(epoch_us(ts))) // {DAY_US} AS BIGINT) "
        "AS days_since_last "
        "FROM events, m GROUP BY user_id, m.now")


# ---------------- adoption curve (cumulative distinct users) ----------------

def q_adoption_curve(sf_dir: str):
    """Cumulative count of distinct users ever seen, by day — the
    adoption / growth curve.  First-seen day per user (one Min
    groupby) shrinks the stream to O(users); daily new-user counts
    plus a prefix sum over the tiny day series finish in one
    whole-block task."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"],
                         "day": _ts_us(b) // DAY_US})

    first = ev.map_batches(pre, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("user_id").aggregate(Min("day", alias_name="fday"))
    daily = first.groupby("fday").aggregate(Count(alias_name="n_new"))

    def cum(b: pa.Table) -> pa.Table:
        d = b["fday"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n_new"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d)
        d, n = d[order], n[order]
        return pa.table({"day": d, "n_new": n,
                         "cum_users": np.cumsum(n)})

    return daily.repartition(1).map_batches(cum, batch_format="pyarrow",
                                            batch_size=None)


def sql_adoption_curve() -> str:
    return (
        "WITH f AS (SELECT user_id, "
        f"min(epoch_us(ts) // {DAY_US}) AS fday FROM events "
        "GROUP BY user_id), "
        "d AS (SELECT fday AS day, CAST(count(*) AS BIGINT) AS n_new "
        "FROM f GROUP BY fday) "
        "SELECT CAST(day AS BIGINT) AS day, n_new, "
        "CAST(sum(n_new) OVER (ORDER BY day "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS cum_users FROM d")


# ---------------- deterministic A/B conversion test ----------------

def q_ab_test(sf_dir: str):
    """Two-proportion conversion comparison under a deterministic
    hash split (user_id %% 2): per arm the distinct-user and
    converted-user (>= 14 purchase events — roughly the corpus median,
    so both outcomes occur) counts, conversion rate, and the pooled
    two-proportion z-score — the experimentation primitive.  Integer
    sufficient statistics; the z-score is the single final float
    expression, written identically in both engines (corr
    convention)."""
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pur = pc.equal(b["event_type"], "purchase") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": u, "grp": u % 2, "pur": pur})

    def thr(b: pa.Table) -> pa.Table:
        n = b["pc"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": b["user_id"], "grp": b["grp"],
                         "conv": (n >= 14).astype(np.int64)})

    per_user = ev.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("user_id").aggregate(Max("grp", alias_name="grp"),
                                      Sum("pur", alias_name="pc")) \
        .map_batches(thr, batch_format="pyarrow")
    arms = per_user.groupby("grp").aggregate(
        Count(alias_name="n_users"), Sum("conv", alias_name="n_conv")) \
        .to_pandas().sort_values("grp")
    n = arms["n_users"].to_numpy(np.int64)
    c = arms["n_conv"].to_numpy(np.int64)
    p = (c[0] + c[1]) / (n[0] + n[1])
    z = (c[0] / n[0] - c[1] / n[1]) / np.sqrt(
        p * (1 - p) * (1.0 / n[0] + 1.0 / n[1]))
    return pa.table({
        "n_a": n[:1], "conv_a": c[:1],
        "n_b": n[1:2], "conv_b": c[1:2],
        "rate_a_e6": np.floor(c[:1] * 1e6 / n[:1] + 0.5).astype(np.int64),
        "rate_b_e6": np.floor(c[1:2] * 1e6 / n[1:2] + 0.5).astype(np.int64),
        "z_e6": np.asarray([int(np.floor(z * 1e6 + 0.5))],
                           dtype=np.int64)})


def sql_ab_test() -> str:
    return (
        "WITH u AS (SELECT user_id, user_id % 2 AS grp, "
        "CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 "
        "ELSE 0 END) >= 14 THEN 1 ELSE 0 END "
        "AS conv FROM events GROUP BY user_id), "
        "a AS (SELECT grp, count(*) AS n, sum(conv) AS c FROM u "
        "GROUP BY grp), "
        "w AS (SELECT "
        "max(CASE WHEN grp = 0 THEN n END) AS na, "
        "max(CASE WHEN grp = 0 THEN c END) AS ca, "
        "max(CASE WHEN grp = 1 THEN n END) AS nb, "
        "max(CASE WHEN grp = 1 THEN c END) AS cb FROM a) "
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a, "
        "CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b, "
        "CAST(floor(ca * 1e6 / na + 0.5) AS BIGINT) AS rate_a_e6, "
        "CAST(floor(cb * 1e6 / nb + 0.5) AS BIGINT) AS rate_b_e6, "
        "CAST(floor((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) "
        "/ sqrt(((ca + cb) / CAST(na + nb AS DOUBLE)) "
        "* (1 - (ca + cb) / CAST(na + nb AS DOUBLE)) "
        "* (1.0 / na + 1.0 / nb)) * 1e6 + 0.5) AS BIGINT) AS z_e6 "
        "FROM w")


# ---------------- cross-table daily activity correlation ----------------

def q_activity_corr(sf_dir: str):
    """Pearson correlation between the daily ORDER count and the daily
    EVENT count, aligned by day INDEX from each table's own first day
    (the two streams live in different calendar eras, so the join is
    on relative position — shape comparison of the overlapping
    prefix).  Two daily count groupbys, two scalar mins, one index
    hash join, integer sufficient sums, single final float under the
    corr convention."""
    orders = read_table(sf_dir, "orders", columns=["o_orderdate"])
    events = read_table(sf_dir, "events", columns=["ts"])

    oc = orders.map_batches(
        lambda b: pa.table({"day": b["o_orderdate"]
                            .cast(pa.timestamp("us")).cast(pa.int64())
                            .to_numpy(zero_copy_only=False) // DAY_US}),
        batch_format="pyarrow").groupby("day").aggregate(
        Count(alias_name="x")).materialize()
    ec = events.map_batches(
        lambda b: pa.table({"day2": _ts_us(b) // DAY_US}),
        batch_format="pyarrow").groupby("day2").aggregate(
        Count(alias_name="y")).materialize()
    omin = int(oc.min("day"))
    emin = int(ec.min("day2"))
    oc = oc.map_batches(lambda b: pa.table({
        "idx": b["day"].to_numpy(zero_copy_only=False) - omin,
        "x": b["x"].cast(pa.int64())}), batch_format="pyarrow")
    ec = ec.map_batches(lambda b: pa.table({
        "idx2": b["day2"].to_numpy(zero_copy_only=False) - emin,
        "y": b["y"].cast(pa.int64())}), batch_format="pyarrow")
    j = oc.join(ec, join_type="inner", num_partitions=2,
                on=("idx",), right_on=("idx2",))

    def sums(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"one": np.ones(len(x), np.int64), "sx": x,
                         "sy": y, "sxx": x * x, "syy": y * y,
                         "sxy": x * y})

    agg = j.map_batches(sums, batch_format="pyarrow") \
        .groupby("one").aggregate(
            Count(alias_name="k"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy")) \
        .to_pandas()
    k = int(agg["k"].iloc[0]); sx = int(agg["sx"].iloc[0])
    sy = int(agg["sy"].iloc[0]); sxx = int(agg["sxx"].iloc[0])
    syy = int(agg["syy"].iloc[0]); sxy = int(agg["sxy"].iloc[0])
    r = (k * sxy - sx * sy) / np.sqrt(
        (k * sxx - sx * sx) * (k * syy - sy * sy))
    return pa.table({"n_days": np.asarray([k], dtype=np.int64),
                     "corr_e6": np.asarray(
                         [int(np.floor(r * 1e6 + 0.5))], dtype=np.int64)})


def sql_activity_corr() -> str:
    return (
        f"WITH o0 AS (SELECT epoch_us(o_orderdate) // {DAY_US} AS day, "
        "count(*) AS x FROM orders GROUP BY day), "
        "o AS (SELECT day - (SELECT min(day) FROM o0) AS idx, x FROM o0), "
        f"e0 AS (SELECT epoch_us(ts) // {DAY_US} AS day, count(*) AS y "
        "FROM events GROUP BY day), "
        "e AS (SELECT day - (SELECT min(day) FROM e0) AS idx, y FROM e0), "
        "j AS (SELECT o.x, e.y FROM o JOIN e USING (idx)), "
        "a AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy, "
        "sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy FROM j) "
        "SELECT CAST(k AS BIGINT) AS n_days, "
        "CAST(floor((k*sxy - sx*sy)/sqrt((k*sxx - sx*sx)"
        "*(k*syy - sy*sy))*1e6 + 0.5) AS BIGINT) AS corr_e6 FROM a")


# ---------------- deterministic half-sample variance replicates ----------------

HS_REPLICATES = 16
_HS_M = (1 << 31) - 1


def q_halfsample_replicates(sf_dir: str):
    """16 deterministic half-sample replicates of the mean order price
    — the subsampling / resampling variance-estimation primitive
    (m-out-of-n bootstrap): replicate b keeps the rows whose affine
    key hash has bit b set, so every replicate is an independent-ish
    half, RNG-free and identically defined in SQL.  Per block one
    (16 x 2) partial via matrix masking — the 16x fan-out never
    leaves the block as rows; output is 16 integer rows + the e6 mean
    (half-up float like every ratio here).  The spread of mean_e6
    across replicates IS the sampling-variance estimate."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = scale_col(b["o_totalprice"].to_numpy(zero_copy_only=False),
                      100.0)
        h = ((k % _HS_M) * 1_103_515_245 + 12_345) % _HS_M
        bits = (h[:, None] >> np.arange(HS_REPLICATES)) & 1   # (n, 16)
        return pa.table({
            "replicate": np.arange(HS_REPLICATES, dtype=np.int64),
            "n": bits.sum(axis=0).astype(np.int64),
            "sum_e2": (bits * p[:, None]).sum(axis=0).astype(np.int64)})

    agg = orders.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("replicate").aggregate(Sum("n", alias_name="n"),
                                        Sum("sum_e2", alias_name="sum_e2")) \
        .to_pandas().sort_values("replicate")
    n = agg["n"].to_numpy(np.int64)
    s = agg["sum_e2"].to_numpy(np.int64)
    return pa.table({
        "replicate": agg["replicate"].to_numpy(np.int64),
        "n": n, "sum_e2": s,
        "mean_e6": np.floor(s * 1e4 / n + 0.5).astype(np.int64)})


def sql_halfsample_replicates() -> str:
    return (
        f"WITH h AS (SELECT ((o_orderkey % {_HS_M}) * 1103515245 "
        f"+ 12345) % {_HS_M} AS h, "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS p "
        "FROM orders), "
        f"b AS (SELECT unnest(range(0, {HS_REPLICATES})) AS replicate), "
        "r AS (SELECT b.replicate, count(*) AS n, sum(h.p) AS sum_e2 "
        "FROM b JOIN h ON ((h.h >> b.replicate) & 1) = 1 "
        "GROUP BY b.replicate) "
        "SELECT CAST(replicate AS BIGINT) AS replicate, "
        "CAST(n AS BIGINT) AS n, CAST(sum_e2 AS BIGINT) AS sum_e2, "
        "CAST(floor(sum_e2 * 1e4 / n + 0.5) AS BIGINT) AS mean_e6 "
        "FROM r")


# ---------------- partition-key skew diagnostic ----------------

def q_key_skew(sf_dir: str):
    """Skew profile of the l_partkey distribution — the shuffle-health
    diagnostic run before choosing a partitioning key: distinct key
    count, the hottest key's row share, and the Herfindahl
    concentration index sum(share^2) (both e6, exact integer
    numerators).  One key-count groupby + one tiny fold."""
    li = read_table(sf_dir, "lineitem", columns=["l_partkey"])
    counts = li.groupby("l_partkey").aggregate(Count(alias_name="c"))

    def fold(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"one": np.ones(len(c), np.int64),
                         "c": c, "c2": c * c,
                         "cmax": c})

    agg = counts.map_batches(fold, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("one").aggregate(
            Count(alias_name="n_keys"), Sum("c", alias_name="total"),
            Sum("c2", alias_name="c2"), Max("cmax", alias_name="cmax")) \
        .to_pandas()
    nk = int(agg["n_keys"].iloc[0]); tot = int(agg["total"].iloc[0])
    c2 = int(agg["c2"].iloc[0]); cm = int(agg["cmax"].iloc[0])
    return pa.table({
        "n_keys": np.asarray([nk], dtype=np.int64),
        "n_rows": np.asarray([tot], dtype=np.int64),
        "max_share_e6": np.asarray(
            [int(np.floor(cm * 1e6 / tot + 0.5))], dtype=np.int64),
        "hhi_e6": np.asarray(
            [int(np.floor(c2 * 1e6 / (tot * tot) + 0.5))],
            dtype=np.int64)})


def sql_key_skew() -> str:
    return (
        "WITH c AS (SELECT l_partkey, count(*) AS c FROM lineitem "
        "GROUP BY l_partkey), "
        "a AS (SELECT count(*) AS nk, sum(c) AS tot, sum(c*c) AS c2, "
        "max(c) AS cm FROM c) "
        "SELECT CAST(nk AS BIGINT) AS n_keys, "
        "CAST(tot AS BIGINT) AS n_rows, "
        "CAST(floor(cm * 1e6 / tot + 0.5) AS BIGINT) AS max_share_e6, "
        "CAST(floor(c2 * 1e6 / (tot * tot) + 0.5) AS BIGINT) AS hhi_e6 "
        "FROM a")


# ---------------- duplicate-payment detection (fraud screen) ----------------

DUP_PAY_WINDOW_D = 90
DUP_PAY_BAND_E2 = 1_000_000   # $10k amount bands


def q_dup_payments(sf_dir: str):
    """Order pairs from the same customer in the SAME $10k amount band
    within 90 days — the double-charge / replay fraud screen (exact
    amount equality never fires on continuous prices, so the band is
    the blocking key).  One (custkey, band) hash self-join blocks
    candidates, then a vectorized |date diff| filter; canonical
    okey_a < okey_b."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey",
                                 "o_totalprice", "o_orderdate"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "ck": b["o_custkey"].cast(pa.int64()),
            "amt": scale_col(
                b["o_totalprice"].to_numpy(zero_copy_only=False),
                100.0) // DUP_PAY_BAND_E2,
            "okey": b["o_orderkey"].cast(pa.int64()),
            "day": b["o_orderdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False) // DAY_US})

    rows = ev = orders.map_batches(pre, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    right = rows.map_batches(
        lambda b: pa.table({"ck2": b["ck"], "amt2": b["amt"],
                            "okey_b": b["okey"], "day_b": b["day"]}),
        batch_format="pyarrow")
    j = rows.join(right, join_type="inner", num_partitions=4,
                  on=("ck", "amt"), right_on=("ck2", "amt2"))

    def keep(b: pa.Table) -> pa.Table:
        ka = b["okey"].to_numpy(zero_copy_only=False)
        kb = b["okey_b"].to_numpy(zero_copy_only=False)
        da = b["day"].to_numpy(zero_copy_only=False)
        db = b["day_b"].to_numpy(zero_copy_only=False)
        m = (ka < kb) & (np.abs(da - db) <= DUP_PAY_WINDOW_D)
        return pa.table({
            "custkey": b["ck"].to_numpy(zero_copy_only=False)[m],
            "okey_a": ka[m], "okey_b": kb[m],
            "amt_band": b["amt"].to_numpy(zero_copy_only=False)[m],
            "gap_days": np.abs(da - db)[m]})

    return j.map_batches(keep, batch_format="pyarrow",
                         zero_copy_batch=True)


def sql_dup_payments() -> str:
    return (
        "WITH o AS (SELECT o_orderkey AS okey, o_custkey AS ck, "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) "
        f"// {DUP_PAY_BAND_E2} AS amt, "
        f"epoch_us(o_orderdate) // {DAY_US} AS day FROM orders) "
        "SELECT CAST(a.ck AS BIGINT) AS custkey, "
        "CAST(a.okey AS BIGINT) AS okey_a, "
        "CAST(b.okey AS BIGINT) AS okey_b, a.amt AS amt_band, "
        "CAST(abs(a.day - b.day) AS BIGINT) AS gap_days "
        "FROM o a JOIN o b ON a.ck = b.ck AND a.amt = b.amt "
        "AND a.okey < b.okey "
        f"WHERE abs(a.day - b.day) <= {DUP_PAY_WINDOW_D}")


# ---------------- exponential-decay trending counts ----------------

DECAY_HORIZON_D = 20  # half-life = 1 day; weight 2^(H - age), age <= H


def q_decay_counts(sf_dir: str):
    """Trending score per event type under an exponential time decay
    with a one-day half-life — the classic streaming 'trending now'
    ranking.  The decay base is 2 and ages are whole days, so every
    weight is a power of two and the score is EXACT int64 in any
    reduction order (the repo's dyadic-decay convention, like the Katz
    integer recurrence): score = sum over events of 2^(H - age_days)
    for age_days <= H.  Plan: one scalar max-day aggregate, then a
    single vectorized map_batches (shift, no pow) + one small groupby
    over the handful of event types."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"etype": b["event_type"],
                         "day": _ts_us(b) // DAY_US})

    days = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    max_day = int(days.max("day"))

    def weigh(b: pa.Table) -> pa.Table:
        d = b["day"].to_numpy(zero_copy_only=False)
        age = max_day - d
        keep = age <= DECAY_HORIZON_D
        w = np.zeros(len(d), np.int64)
        w[keep] = np.int64(1) << (DECAY_HORIZON_D - age[keep])
        return pa.table({"etype": b["etype"].filter(pa.array(keep)),
                         "w": w[keep],
                         "one": np.ones(int(keep.sum()), np.int64)})

    agg = days.map_batches(weigh, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("etype").aggregate(Sum("w", alias_name="score"),
                                    Sum("one", alias_name="n_recent"))
    return agg.rename_columns({"etype": "event_type"})


def sql_decay_counts() -> str:
    h = DECAY_HORIZON_D
    return (
        f"WITH e AS (SELECT event_type, epoch_us(ts) // {DAY_US} AS day "
        "FROM events), m AS (SELECT max(day) AS md FROM e) "
        "SELECT e.event_type, "
        f"CAST(sum(CAST(1 AS BIGINT) << CAST({h} - (m.md - e.day) AS INTEGER)) AS BIGINT) AS score, "
        "CAST(count(*) AS BIGINT) AS n_recent "
        f"FROM e, m WHERE m.md - e.day <= {h} "
        "GROUP BY e.event_type")


# ---------------- leave-one-out target encoding ----------------

TE_SAMPLE_MOD = 37  # deterministic row sample to bound the output


def q_target_encode(sf_dir: str):
    """Leave-one-out target encoding of o_orderpriority against the
    order total — the standard high-cardinality categorical feature
    for tabular ML, with the LOO trick that removes self-leakage:
    enc(row) = (sum_cat - target_row) / (n_cat - 1).  Returned as an
    exact (numerator, denominator) int64 pair in cents instead of a
    float ratio, so the value-hash is reduction-order-robust and the
    consumer can divide at whatever precision it wants.  Plan: one
    tiny per-category groupby (5 priorities) broadcast into a
    vectorized map_batches — no second shuffle, no window sort; rows
    sampled deterministically (okey % 37 == 0) to bound the output."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"okey": b["o_orderkey"].cast(pa.int64()),
                         "prio": b["o_orderpriority"],
                         "cents": scale_col(
                             b["o_totalprice"].to_numpy(zero_copy_only=False),
                             100.0)})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    gp = rows.groupby("prio").aggregate(
        Sum("cents", alias_name="s"), Count(alias_name="n")).to_pandas()
    sums = dict(zip(gp["prio"], gp["s"].astype(np.int64)))
    cnts = dict(zip(gp["prio"], gp["n"].astype(np.int64)))

    def encode(b: pa.Table) -> pa.Table:
        ok = b["okey"].to_numpy(zero_copy_only=False)
        keep = ok % TE_SAMPLE_MOD == 0
        prio = b["prio"].to_numpy(zero_copy_only=False)[keep]
        cents = b["cents"].to_numpy(zero_copy_only=False)[keep]
        s = np.array([sums[p] for p in prio], np.int64)
        n = np.array([cnts[p] for p in prio], np.int64)
        m = n > 1
        return pa.table({"okey": ok[keep][m], "prio": prio[m],
                         "loo_num": (s - cents)[m],
                         "loo_den": (n - 1)[m]})

    return rows.map_batches(encode, batch_format="pyarrow",
                            zero_copy_batch=True)


def sql_target_encode() -> str:
    return (
        "WITH o AS (SELECT o_orderkey AS okey, o_orderpriority AS prio, "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents "
        "FROM orders), "
        "e AS (SELECT okey, prio, "
        "sum(cents) OVER (PARTITION BY prio) - cents AS loo_num, "
        "count(*) OVER (PARTITION BY prio) - 1 AS loo_den FROM o) "
        "SELECT okey, prio, CAST(loo_num AS BIGINT) AS loo_num, "
        "CAST(loo_den AS BIGINT) AS loo_den FROM e "
        f"WHERE okey % {TE_SAMPLE_MOD} = 0 AND loo_den > 0")


# ---------------- consistent-hash ring placement ----------------

CH_NODES = 8
CH_VNODES = 16  # virtual nodes per physical node
CH_RING = 2_147_483_648  # 2^31
CH_MULT = 2_654_435_761  # Knuth multiplicative constant
CH_SALT = 12_345


def _ch_ring() -> tuple[np.ndarray, np.ndarray]:
    """(sorted vnode positions, owning physical node per position) —
    identical affine hash in the SQL oracle; all arithmetic < 2^45 so
    int64-exact in both engines."""
    node = np.repeat(np.arange(CH_NODES, dtype=np.int64), CH_VNODES)
    vn = np.tile(np.arange(CH_VNODES, dtype=np.int64), CH_NODES)
    pos = ((node * 1000 + vn) * CH_MULT) % CH_RING
    order = np.lexsort((node, pos))
    return pos[order], node[order]


def q_consistent_hash(sf_dir: str):
    """Consistent-hash ring placement (Karger et al. / Dynamo-style):
    CH_NODES physical nodes x CH_VNODES virtual nodes at deterministic
    multiplicative-hash positions; every part key goes to the successor
    vnode clockwise (wraparound to the ring minimum).  Returns the
    per-node key load — the rebalancing diagnostic that motivates
    virtual nodes in the first place.  Plan: the 128-entry ring is
    built once on the driver and closed over (broadcast-once), each
    batch is one vectorized np.searchsorted; one tiny groupby."""
    ring_pos, ring_node = _ch_ring()
    parts = read_table(sf_dir, "part", columns=["p_partkey"])

    def assign(b: pa.Table) -> pa.Table:
        k = b["p_partkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        kpos = (k * CH_MULT + CH_SALT) % CH_RING
        idx = np.searchsorted(ring_pos, kpos, side="left")
        idx[idx == len(ring_pos)] = 0  # wraparound
        return pa.table({"node": ring_node[idx],
                         "one": np.ones(len(k), np.int64)})

    return parts.map_batches(assign, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("node").aggregate(Sum("one", alias_name="n_keys"))


def sql_consistent_hash() -> str:
    return (
        "WITH vn AS (SELECT n.range AS node, i.range AS vn, "
        f"((n.range*1000 + i.range) * {CH_MULT}) % {CH_RING} AS pos "
        f"FROM range({CH_NODES}) n, range({CH_VNODES}) i), "
        "kp AS (SELECT p_partkey, "
        f"(p_partkey * {CH_MULT} + {CH_SALT}) % {CH_RING} AS kpos "
        "FROM part), "
        "asg AS (SELECT k.p_partkey, coalesce("
        "(SELECT v.node FROM vn v WHERE v.pos >= k.kpos "
        "ORDER BY v.pos, v.node LIMIT 1), "
        "(SELECT v.node FROM vn v ORDER BY v.pos, v.node LIMIT 1)"
        ") AS node FROM kp k) "
        "SELECT CAST(node AS BIGINT) AS node, "
        "CAST(count(*) AS BIGINT) AS n_keys FROM asg GROUP BY node")


# ---------------- z-order (Morton) layout keys ----------------

ZORDER_BITS = 12  # bits per dimension; 24-bit interleaved key
ZORDER_BUCKET_SHIFT = 16  # bucket = zkey >> shift (256 buckets)


def _morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave the low ZORDER_BITS bits of x (even positions) and y
    (odd positions) — vectorized shifts, no LUT, identical unrolled
    expression in the SQL oracle."""
    z = np.zeros(len(x), np.int64)
    for i in range(ZORDER_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def q_zorder_keys(sf_dir: str):
    """Z-order (Morton) clustering keys over (customer, order day) —
    the multi-dimensional data-layout primitive behind Delta/Iceberg
    OPTIMIZE ZORDER: rows sorted by the interleaved key stay clustered
    in BOTH dimensions, so either-column range predicates prune
    row groups.  Returns per-bucket (top 8 interleaved bits) row
    counts plus the min/max day span inside each bucket — the locality
    diagnostic.  All arithmetic is int64 shifts, exact in both
    engines."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate"])

    def zkey(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        mask = (np.int64(1) << ZORDER_BITS) - 1
        z = _morton2(ck & mask, day & mask)
        return pa.table({"bucket": z >> ZORDER_BUCKET_SHIFT,
                         "day": day,
                         "one": np.ones(len(z), np.int64)})

    return orders.map_batches(zkey, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("bucket").aggregate(Sum("one", alias_name="n_rows"),
                                     Min("day", alias_name="min_day"),
                                     Max("day", alias_name="max_day"))


def sql_zorder_keys() -> str:
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"(((ck >> {i}) & 1) << {2 * i})")
        terms.append(f"(((day >> {i}) & 1) << {2 * i + 1})")
    mask = (1 << ZORDER_BITS) - 1
    z = " | ".join(terms)
    return (
        "WITH o AS (SELECT o_custkey AS ck0, "
        f"epoch_us(o_orderdate) // {DAY_US} AS day FROM orders), "
        f"b AS (SELECT ck0 & {mask} AS ck, day & {mask} AS dlo, day "
        "FROM o), "
        f"z AS (SELECT ({z.replace('day', 'dlo')}) >> "
        f"{ZORDER_BUCKET_SHIFT} AS bucket, day FROM b) "
        "SELECT CAST(bucket AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(min(day) AS BIGINT) AS min_day, "
        "CAST(max(day) AS BIGINT) AS max_day FROM z GROUP BY bucket")


# ---------------- watermark / late-data accounting ----------------

LATE_TOL_US = 14 * DAY_US  # allowed lateness before an event is "late"
LATE_ARRIVAL_MULT = 2_654_435_761
LATE_ARRIVAL_RING = 2_147_483_648


def q_late_events(sf_dir: str):
    """Watermark-based late-data accounting (the Beam/Flink allowed-
    lateness model): replay events in a deterministic hash-permuted
    arrival order (multi-source ingest decouples arrival from event
    time), track watermark = max event time over all previously-arrived
    events, and flag an event late when its event time trails the
    watermark by more than LATE_TOL_US.  Per event type: arrivals,
    late count, and worst lateness beyond the allowance.  The running
    max is stages/temporal.watermark_assign — per-block
    maximum.accumulate + an O(blocks) scalar carry, no row movement."""
    from igpm_pem_ray.stages.temporal import watermark_assign, WM_NONE

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        eid = b["event_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "ak": (eid * LATE_ARRIVAL_MULT) % LATE_ARRIVAL_RING,
            "etype": b["event_type"],
            "us": _ts_us(b)})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)
    wm = watermark_assign(rows, order_cols=("ak", "us"), ts_col="us")

    def flag(b: pa.Table) -> pa.Table:
        us = b["us"].to_numpy(zero_copy_only=False)
        w = b["wm"].to_numpy(zero_copy_only=False)
        late = (w != WM_NONE) & (us < w - LATE_TOL_US)
        lateness = np.where(late, w - LATE_TOL_US - us, 0)
        return pa.table({"etype": b["etype"],
                         "one": np.ones(len(us), np.int64),
                         "late": late.astype(np.int64),
                         "lateness": lateness.astype(np.int64)})

    agg = wm.map_batches(flag, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("etype").aggregate(
            Sum("one", alias_name="n_events"),
            Sum("late", alias_name="n_late"),
            Max("lateness", alias_name="max_late_us"))
    return agg.rename_columns({"etype": "event_type"})


def sql_late_events() -> str:
    return (
        f"WITH e AS (SELECT (event_id * {LATE_ARRIVAL_MULT}) % "
        f"{LATE_ARRIVAL_RING} AS ak, event_type, epoch_us(ts) AS us "
        "FROM events), "
        "w AS (SELECT event_type, us, max(us) OVER (ORDER BY ak, us "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm FROM e) "
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
        f"CAST(sum(CASE WHEN wm IS NOT NULL AND us < wm - {LATE_TOL_US} "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_late, "
        "CAST(coalesce(max(CASE WHEN wm IS NOT NULL AND "
        f"us < wm - {LATE_TOL_US} THEN wm - {LATE_TOL_US} - us END), 0) "
        "AS BIGINT) AS max_late_us "
        "FROM w GROUP BY event_type")


# ---------------- zone maps (data-skipping min/max pruning) ----------------

ZONE_ROWS = 512  # synthetic "row group": zone = l_orderkey // ZONE_ROWS
ZONE_PRED_LO_OFF = 5   # predicate: ship day in [min+5, min+15]
ZONE_PRED_HI_OFF = 15


def q_zone_maps(sf_dir: str):
    """Zone-map data skipping (the Parquet row-group / ORC stripe
    min-max pruning model): build per-zone (min, max, count) stats of
    the ship day over synthetic orderkey-range zones, then evaluate a
    day-range predicate against the stats and report how many zones
    prune, how many rows the surviving zones would scan, and how many
    rows actually match — the scan-selectivity diagnostic that
    motivates sort/z-order layout.  Plan: one (zone) groupby for the
    stats, a second pass for true matches, per-block partials for the
    one-row summary; all int64."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_shipdate"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "zone": b["l_orderkey"].cast(pa.int64()).to_numpy(
                zero_copy_only=False) // ZONE_ROWS,
            "day": b["l_shipdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False) // DAY_US})

    rows = li.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    lo = int(rows.min("day")) + ZONE_PRED_LO_OFF
    hi = int(rows.min("day")) + ZONE_PRED_HI_OFF

    zones = rows.map_batches(
        lambda b: b.append_column("one", pa.array(
            np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("zone").aggregate(Min("day", alias_name="zmin"),
                                   Max("day", alias_name="zmax"),
                                   Sum("one", alias_name="zrows"))

    def zone_partial(b: pa.Table) -> pa.Table:
        zmin = b["zmin"].to_numpy(zero_copy_only=False)
        zmax = b["zmax"].to_numpy(zero_copy_only=False)
        zrows = b["zrows"].to_numpy(zero_copy_only=False)
        survive = (zmax >= lo) & (zmin <= hi)
        return pa.table({
            "n_zones": pa.array([len(zmin)], pa.int64()),
            "n_pruned": pa.array([int((~survive).sum())], pa.int64()),
            "rows_scanned": pa.array([int(zrows[survive].sum())],
                                     pa.int64())})

    zp = zones.map_batches(zone_partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def match_partial(b: pa.Table) -> pa.Table:
        d = b["day"].to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([int(((d >= lo) & (d <= hi)).sum())],
                                       pa.int64())})

    rows_matched = int(rows.map_batches(match_partial,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True).sum("m") or 0)
    return pa.table({
        "n_zones": pa.array([int(zp.sum("n_zones") or 0)], pa.int64()),
        "n_pruned": pa.array([int(zp.sum("n_pruned") or 0)], pa.int64()),
        "rows_scanned": pa.array([int(zp.sum("rows_scanned") or 0)],
                                 pa.int64()),
        "rows_matched": pa.array([rows_matched], pa.int64())})


def sql_zone_maps() -> str:
    return (
        "WITH r AS (SELECT l_orderkey // {zr} AS zone, "
        "epoch_us(l_shipdate) // {day} AS day FROM lineitem), "
        "p AS (SELECT min(day) + {plo} AS lo, min(day) + {phi} AS hi "
        "FROM r), "
        "z AS (SELECT zone, min(day) AS zmin, max(day) AS zmax, "
        "count(*) AS zrows FROM r GROUP BY zone) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM z) AS n_zones, "
        "(SELECT CAST(sum(CASE WHEN zmax < p.lo OR zmin > p.hi THEN 1 "
        "ELSE 0 END) AS BIGINT) FROM z, p) AS n_pruned, "
        "(SELECT CAST(coalesce(sum(CASE WHEN zmax >= p.lo AND "
        "zmin <= p.hi THEN zrows END), 0) AS BIGINT) FROM z, p) "
        "AS rows_scanned, "
        "(SELECT CAST(sum(CASE WHEN day >= p.lo AND day <= p.hi THEN 1 "
        "ELSE 0 END) AS BIGINT) FROM r, p) AS rows_matched"
    ).format(zr=ZONE_ROWS, day=DAY_US, plo=ZONE_PRED_LO_OFF,
             phi=ZONE_PRED_HI_OFF)


# ---------------- GROUPING SETS (multi-granularity aggregate) -------------

def q_grouping_sets(sf_dir: str):
    """GROUPING SETS ((priority), (status), ()) over order totals —
    the general multi-granularity aggregate that ROLLUP/CUBE
    specialize (both already covered by q_rollup_revenue /
    q_cube_revenue; this is the irregular-sets form).  Each set is one
    independent groupby over the SAME pre-scaled batch stream; absent
    keys are filled with the '(all)' marker and a grouping id
    disambiguates, mirroring SQL GROUPING().  Sums are pre-scaled
    int64 cents, exact in any reduction order."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderpriority", "o_orderstatus",
                                 "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"prio": b["o_orderpriority"],
                         "status": b["o_orderstatus"],
                         "cents": scale_col(
                             b["o_totalprice"].to_numpy(zero_copy_only=False),
                             100.0),
                         "one": np.ones(b.num_rows, np.int64)})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    by_prio = rows.groupby("prio").aggregate(
        Sum("cents", alias_name="revenue_e2"), Sum("one", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "prio": b["prio"],
            "status": pa.array(["(all)"] * b.num_rows, pa.string()),
            "grouping_id": np.full(b.num_rows, 1, np.int64),
            "revenue_e2": b["revenue_e2"], "n": b["n"]}),
            batch_format="pyarrow")
    by_status = rows.groupby("status").aggregate(
        Sum("cents", alias_name="revenue_e2"), Sum("one", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "prio": pa.array(["(all)"] * b.num_rows, pa.string()),
            "status": b["status"],
            "grouping_id": np.full(b.num_rows, 2, np.int64),
            "revenue_e2": b["revenue_e2"], "n": b["n"]}),
            batch_format="pyarrow")
    total = pa.table({
        "prio": pa.array(["(all)"], pa.string()),
        "status": pa.array(["(all)"], pa.string()),
        "grouping_id": pa.array([3], pa.int64()),
        "revenue_e2": pa.array([int(rows.sum("cents") or 0)], pa.int64()),
        "n": pa.array([rows.count()], pa.int64())})
    import ray.data as rd
    return by_prio.union(by_status).union(rd.from_arrow(total))


def sql_grouping_sets() -> str:
    return (
        "WITH o AS (SELECT o_orderpriority AS p, o_orderstatus AS s, "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents "
        "FROM orders) "
        "SELECT coalesce(p, '(all)') AS prio, "
        "coalesce(s, '(all)') AS status, "
        "CAST(CASE WHEN s IS NULL AND p IS NULL THEN 3 "
        "WHEN s IS NULL THEN 1 ELSE 2 END AS BIGINT) AS grouping_id, "
        "CAST(sum(cents) AS BIGINT) AS revenue_e2, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM o GROUP BY GROUPING SETS ((p), (s), ())")


# ---------------- functional-dependency discovery (data profiling) --------

FD_CANDIDATES = [
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("lineitem", "l_orderkey", "l_returnflag"),
]


def q_fd_discovery(sf_dir: str):
    """Approximate functional-dependency discovery (the TANE/data-
    profiling primitive): for each candidate X -> Y, count the LHS
    groups, the groups violating the dependency (|distinct Y| > 1),
    and the minimum number of row edits to repair it (g3 error:
    rows - sum of per-group majority counts).  One (X, Y) count
    groupby + one X-level aggregation per candidate — the same plan
    shape at any scale; exact int64."""
    from ray.data.aggregate import Count, Max as _Max

    out = {"fd": [], "n_groups": [], "n_violating": [], "g3_err": []}
    for table, lhs, rhs in FD_CANDIDATES:
        t = read_table(sf_dir, table, columns=[lhs, rhs])
        xy = t.groupby([lhs, rhs]).aggregate(Count(alias_name="c"))
        per_x = xy.map_batches(
            lambda b, _l=lhs: pa.table({
                "x": b[_l].cast(pa.int64()),
                "one": np.ones(b.num_rows, np.int64),
                "c": b["c"].cast(pa.int64())}),
            batch_format="pyarrow") \
            .groupby("x").aggregate(Sum("one", alias_name="n_y"),
                                    Sum("c", alias_name="n_rows"),
                                    _Max("c", alias_name="maj"))

        def partial(b: pa.Table) -> pa.Table:
            ny = b["n_y"].to_numpy(zero_copy_only=False)
            nr = b["n_rows"].to_numpy(zero_copy_only=False)
            mj = b["maj"].to_numpy(zero_copy_only=False)
            return pa.table({
                "g": pa.array([len(ny)], pa.int64()),
                "v": pa.array([int((ny > 1).sum())], pa.int64()),
                "e": pa.array([int((nr - mj).sum())], pa.int64())})

        p = per_x.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
        out["fd"].append(f"{lhs}->{rhs}")
        out["n_groups"].append(int(p.sum("g") or 0))
        out["n_violating"].append(int(p.sum("v") or 0))
        out["g3_err"].append(int(p.sum("e") or 0))
    return pa.table({"fd": pa.array(out["fd"], pa.string()),
                     "n_groups": pa.array(out["n_groups"], pa.int64()),
                     "n_violating": pa.array(out["n_violating"], pa.int64()),
                     "g3_err": pa.array(out["g3_err"], pa.int64())})


def sql_fd_discovery() -> str:
    selects = []
    for table, lhs, rhs in FD_CANDIDATES:
        selects.append(
            f"SELECT '{lhs}->{rhs}' AS fd, "
            "CAST(count(*) AS BIGINT) AS n_groups, "
            "CAST(sum(CASE WHEN n_y > 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_violating, "
            "CAST(sum(n_rows - maj) AS BIGINT) AS g3_err FROM ("
            f"SELECT {lhs}, count(*) AS n_y, sum(c) AS n_rows, "
            "max(c) AS maj FROM ("
            f"SELECT {lhs}, {rhs}, count(*) AS c FROM {table} "
            f"GROUP BY {lhs}, {rhs}) GROUP BY {lhs})")
    return " UNION ALL ".join(selects)




# ---------------- Bloom-filter false-positive-rate measurement ------------

BLOOM_M = 1 << 14  # bits
BLOOM_KS = (1, 2, 3)  # hash salts (k = 3 hashes)
BLOOM_A = 1_103_515_245
BLOOM_P = 2_147_483_647  # 2^31 - 1: h*h stays under 2^62


def _bloom_pos(keys: np.ndarray, j: int) -> np.ndarray:
    """Hash j's bit position — quadratic (h*h+h) mod p mix (affine
    alone is low-discrepancy on consecutive keys, see _agms_signs),
    identical integer expression in the SQL oracle."""
    h = (keys * BLOOM_A + 7_777 * j) % BLOOM_P
    h = (h * h + h) % BLOOM_P
    return h % BLOOM_M


def q_bloom_fpr(sf_dir: str):
    """Measured false-positive rate of a concrete Bloom filter — the
    'verify the data structure against its advertised bound' check:
    members = order keys divisible by 3, probes = the rest; the bit
    array is the distinct union of the members' k=3 positions, a probe
    false-positives when all its k positions are set.  Plan: one
    distinct-positions groupby builds the filter, the 2 KiB bitset is
    closed over into a vectorized probe pass, partials reduce to one
    row.  Reports count fields and fpr_e6 = 1e6*fp // probes — all
    exact int64."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey"])

    def member_bits(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        mem = keys[keys % 3 == 0]
        pos = np.unique(np.concatenate(
            [_bloom_pos(mem, j) for j in BLOOM_KS])) \
            if len(mem) else np.array([], np.int64)
        return pa.table({"pos": pos})

    bits_pdf = orders.map_batches(member_bits, batch_format="pyarrow",
                                  zero_copy_batch=True) \
        .groupby("pos").aggregate(Count(alias_name="_n")).to_pandas()
    bitset = np.zeros(BLOOM_M, bool)
    if len(bits_pdf):
        bitset[bits_pdf["pos"].to_numpy().astype(np.int64)] = True

    def probe(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n_mem = int((keys % 3 == 0).sum())
        pr = keys[keys % 3 != 0]
        hit = np.ones(len(pr), bool)
        for j in BLOOM_KS:
            hit &= bitset[_bloom_pos(pr, j)]
        return pa.table({"n_members": pa.array([n_mem], pa.int64()),
                         "n_probes": pa.array([len(pr)], pa.int64()),
                         "n_false_pos": pa.array([int(hit.sum())],
                                                 pa.int64())})

    p = orders.map_batches(probe, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    n_mem = int(p.sum("n_members") or 0)
    n_pr = int(p.sum("n_probes") or 0)
    n_fp = int(p.sum("n_false_pos") or 0)
    return pa.table({
        "n_members": pa.array([n_mem], pa.int64()),
        "n_probes": pa.array([n_pr], pa.int64()),
        "n_false_pos": pa.array([n_fp], pa.int64()),
        "fpr_e6": pa.array([1_000_000 * n_fp // max(n_pr, 1)],
                           pa.int64())})


def sql_bloom_fpr() -> str:
    def pos(expr: str, j: int) -> str:
        h = f"(({expr} * {BLOOM_A} + {7_777 * j}) % {BLOOM_P})"
        return f"((({h} * {h} + {h}) % {BLOOM_P}) % {BLOOM_M})"

    bit_selects = " UNION ".join(
        f"SELECT {pos('o_orderkey', j)} AS pos FROM orders "
        "WHERE o_orderkey % 3 = 0" for j in BLOOM_KS)
    fp_cond = " AND ".join(
        f"{pos('o_orderkey', j)} IN (SELECT pos FROM bits)"
        for j in BLOOM_KS)
    return (
        f"WITH bits AS ({bit_selects}) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders "
        "WHERE o_orderkey % 3 = 0) AS n_members, "
        "(SELECT CAST(count(*) AS BIGINT) FROM orders "
        "WHERE o_orderkey % 3 != 0) AS n_probes, "
        "(SELECT CAST(count(*) AS BIGINT) FROM orders "
        f"WHERE o_orderkey % 3 != 0 AND {fp_cond}) AS n_false_pos, "
        "(SELECT CAST(1000000 * (SELECT count(*) FROM orders "
        f"WHERE o_orderkey % 3 != 0 AND {fp_cond}) "
        "// greatest((SELECT count(*) FROM orders "
        "WHERE o_orderkey % 3 != 0), 1) AS BIGINT)) AS fpr_e6")


# ---------------- incremental view maintenance (delta merge) --------------

IVM_DELTA_MOD = 10  # delta batch = orderkeys with key % 10 == 7


def q_ivm_delta(sf_dir: str):
    """Incremental view maintenance of a grouped aggregate: the
    maintained view is (priority -> revenue, count); a delta batch of
    inserts (okey % 10 == 7) arrives and the view is updated by
    merging per-group delta aggregates into the base — the aggregate
    is abelian, so maintenance cost is O(|delta| + |groups|), never a
    base recompute.  Output shows base, delta and merged values per
    group.  Plan: one groupby per side (the delta side's input is a
    pushed-down filter), one small outer join to merge."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        okey = b["o_orderkey"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"prio": b["o_orderpriority"],
                         "is_delta": (okey % IVM_DELTA_MOD == 7)
                         .astype(np.int64),
                         "cents": scale_col(
                             b["o_totalprice"].to_numpy(zero_copy_only=False),
                             100.0),
                         "one": np.ones(len(okey), np.int64)})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True)

    def split(b: pa.Table) -> pa.Table:
        isd = b["is_delta"].to_numpy(zero_copy_only=False)
        c = b["cents"].to_numpy(zero_copy_only=False)
        return pa.table({
            "prio": b["prio"],
            "base_n": 1 - isd, "delta_n": isd,
            "base_rev": c * (1 - isd), "delta_rev": c * isd})

    agg = rows.map_batches(split, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("prio").aggregate(
            Sum("base_n", alias_name="base_n"),
            Sum("delta_n", alias_name="delta_n"),
            Sum("base_rev", alias_name="base_rev_e2"),
            Sum("delta_rev", alias_name="delta_rev_e2"))

    def merged(b: pa.Table) -> pa.Table:
        bn = b["base_n"].to_numpy(zero_copy_only=False)
        dn = b["delta_n"].to_numpy(zero_copy_only=False)
        br = b["base_rev_e2"].to_numpy(zero_copy_only=False)
        dr = b["delta_rev_e2"].to_numpy(zero_copy_only=False)
        return pa.table({"prio": b["prio"], "base_n": bn, "delta_n": dn,
                         "new_n": bn + dn, "base_rev_e2": br,
                         "delta_rev_e2": dr, "new_rev_e2": br + dr})

    return agg.map_batches(merged, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_ivm_delta() -> str:
    return (
        "WITH o AS (SELECT o_orderpriority AS prio, "
        f"CASE WHEN o_orderkey % {IVM_DELTA_MOD} = 7 THEN 1 ELSE 0 END "
        "AS isd, CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents "
        "FROM orders) "
        "SELECT prio, CAST(sum(1 - isd) AS BIGINT) AS base_n, "
        "CAST(sum(isd) AS BIGINT) AS delta_n, "
        "CAST(count(*) AS BIGINT) AS new_n, "
        "CAST(sum(cents * (1 - isd)) AS BIGINT) AS base_rev_e2, "
        "CAST(sum(cents * isd) AS BIGINT) AS delta_rev_e2, "
        "CAST(sum(cents) AS BIGINT) AS new_rev_e2 "
        "FROM o GROUP BY prio")


# ---------------- exact ROC AUC via rank statistics ----------------

def q_auc_exact(sf_dir: str):
    """Exact ROC AUC of a scorer against binary labels via the
    Mann-Whitney U identity — the standard ranking-model eval, exact
    in integers: with per-score buckets (score -> n_pos, n_neg) in
    ascending score order, U2 = sum of n_pos * (2*cum_neg_below +
    n_neg_at_score) counts concordant pairs twice (ties once), and
    AUC = U2 / (2 * P * N).  Labels: urgent/high priority; score:
    order total in cents.  Plan: one groupby to buckets, the global
    running negative count via the cumsum boundary-carry scan
    (stages/temporal.cumsum_per_key — blocks never move), one partial
    reduce.  Returns (n_pos, n_neg, u2, auc_e6), all exact int64."""
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderpriority", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        prio = b["o_orderpriority"].to_pandas()
        pos = prio.str.startswith(("1-", "2-")).to_numpy()
        return pa.table({"score": scale_col(
            b["o_totalprice"].to_numpy(zero_copy_only=False), 100.0),
            "npos": pos.astype(np.int64),
            "nneg": (~pos).astype(np.int64)})

    buckets = orders.map_batches(pre, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .groupby("score").aggregate(Sum("npos", alias_name="np_"),
                                    Sum("nneg", alias_name="nn"))

    # cum_val = inclusive running sum of n_neg in score order (one
    # shared key; blocks stay put, carry is O(blocks) driver scalars)
    rows = buckets.map_batches(
        lambda b: pa.table({"key": np.zeros(b.num_rows, np.int64),
                            "us": b["score"].cast(pa.int64()),
                            "val": b["nn"].cast(pa.int64()),
                            "nn": b["nn"].cast(pa.int64()),
                            "np_": b["np_"].cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    cum = cumsum_per_key(rows, payload_cols=["np_", "nn"],
                         order_cols=("us",))

    def partial(b: pa.Table) -> pa.Table:
        npb = b["np_"].to_numpy(zero_copy_only=False)
        cv = b["cum_val"].to_numpy(zero_copy_only=False)
        at = b["nn"].to_numpy(zero_copy_only=False)
        # cum_val is inclusive; below = cum - at, so
        # 2*below + at = 2*cum - at
        u2 = int((npb * (2 * cv - at)).sum())
        return pa.table({"u2": pa.array([u2], pa.int64()),
                         "p": pa.array([int(npb.sum())], pa.int64()),
                         "n": pa.array([int(at.sum())], pa.int64())})

    pr = cum.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    u2 = int(pr.sum("u2") or 0)
    p = int(pr.sum("p") or 0)
    n = int(pr.sum("n") or 0)
    return pa.table({
        "n_pos": pa.array([p], pa.int64()),
        "n_neg": pa.array([n], pa.int64()),
        "u2": pa.array([u2], pa.int64()),
        "auc_e6": pa.array([1_000_000 * u2 // max(2 * p * n, 1)],
                           pa.int64())})


def sql_auc_exact() -> str:
    return (
        "WITH o AS (SELECT CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) "
        "AS score, CASE WHEN o_orderpriority LIKE '1-%' "
        "OR o_orderpriority LIKE '2-%' THEN 1 ELSE 0 END AS pos "
        "FROM orders), "
        "b AS (SELECT score, sum(pos) AS np_, sum(1 - pos) AS nn "
        "FROM o GROUP BY score), "
        "c AS (SELECT np_, nn, sum(nn) OVER (ORDER BY score "
        "ROWS UNBOUNDED PRECEDING) AS cumnn FROM b), "
        "t AS (SELECT sum(np_ * (2*cumnn - nn)) AS u2, "
        "sum(np_) AS p, sum(nn) AS n FROM c) "
        "SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg, "
        "CAST(u2 AS BIGINT) AS u2, "
        "CAST(1000000 * u2 // greatest(2*p*n, 1) AS BIGINT) AS auc_e6 "
        "FROM t")


# ---------------- NTILE equal-frequency binning ----------------

NTILE_K = 10


def q_ntile_orders(sf_dir: str):
    """NTILE(10) equal-frequency discretization of order totals — the
    feature-binning / equi-depth-histogram window op: global 1-based
    ranks come from the sorted-block rank carry (stages/ranked.
    rank_per_group with one shared key — blocks stay put, O(blocks)
    driver scalars), then bin = (rank-1)*k // n reproduces SQL NTILE's
    remainder-to-leading-bins split exactly; per-bin (count, min, max)
    summarize the cutpoints.  Exact int64 end to end."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"g": np.zeros(b.num_rows, np.int64),
                         "cents": scale_col(
                             b["o_totalprice"].to_numpy(zero_copy_only=False),
                             100.0),
                         "okey": b["o_orderkey"].cast(pa.int64())})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    n = rows.count()
    ranked = rank_per_group(rows, key="g", order=["cents", "okey"],
                            descending=[False, False])

    def to_bin(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False)
        c = b["cents"].to_numpy(zero_copy_only=False)
        return pa.table({"bin": (r - 1) * NTILE_K // n + 1,
                         "cents": c,
                         "one": np.ones(len(r), np.int64)})

    return ranked.map_batches(to_bin, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("bin").aggregate(Sum("one", alias_name="n_rows"),
                                  Min("cents", alias_name="lo_e2"),
                                  Max("cents", alias_name="hi_e2"))


def sql_ntile_orders() -> str:
    return (
        "WITH o AS (SELECT o_orderkey AS okey, "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents "
        "FROM orders), "
        f"t AS (SELECT cents, ntile({NTILE_K}) OVER "
        "(ORDER BY cents, okey) AS bin FROM o) "
        "SELECT CAST(bin AS BIGINT) AS bin, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(min(cents) AS BIGINT) AS lo_e2, "
        "CAST(max(cents) AS BIGINT) AS hi_e2 FROM t GROUP BY bin")


# ---------------- trailing-window distinct users ----------------

WD_WINDOW_D = 7


def q_window_distinct(sf_dir: str):
    """Exact trailing-7-day distinct users per day (rolling DAU->WAU):
    distinct counts are NOT decomposable over a sliding window, so the
    scalable exact plan explodes each (user, day) presence into the
    WD_WINDOW_D windows it can serve, dedups per (window, user) with
    one groupby, and counts per window — shuffle volume is
    window_size * distinct-presences, the standard exact-rolling-
    distinct trade documented in stream-processing texts (the approx
    alternative is the repo's HLL sketch).  Only windows fully inside
    the data range are reported (no partial leading windows)."""
    from ray.data.aggregate import Count

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["user_id"].cast(pa.int64()),
                         "day": _ts_us(b) // DAY_US})

    days = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    lo = int(days.min("day"))
    hi = int(days.max("day"))

    def explode(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        d = b["day"].to_numpy(zero_copy_only=False)
        offs = np.arange(WD_WINDOW_D, dtype=np.int64)
        w = (d[:, None] + offs[None, :]).ravel()
        uu = np.repeat(u, WD_WINDOW_D)
        keep = (w >= lo + WD_WINDOW_D - 1) & (w <= hi)
        return pa.table({"w": w[keep], "u": uu[keep]})

    uniq = days.map_batches(explode, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(["w", "u"]).aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"])
    return uniq.map_batches(
        lambda b: pa.table({"window_end_day": b["w"],
                            "one": np.ones(b.num_rows, np.int64)}),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("window_end_day").aggregate(
            Sum("one", alias_name="n_distinct_users"))


def sql_window_distinct() -> str:
    return (
        f"WITH d AS (SELECT DISTINCT user_id AS u, "
        f"epoch_us(ts) // {DAY_US} AS day FROM events), "
        "r AS (SELECT min(day) AS lo, max(day) AS hi FROM d), "
        f"x AS (SELECT d.day + o.range AS w, d.u FROM d, "
        f"range({WD_WINDOW_D}) o, r "
        f"WHERE d.day + o.range >= r.lo + {WD_WINDOW_D - 1} "
        "AND d.day + o.range <= r.hi) "
        "SELECT CAST(w AS BIGINT) AS window_end_day, "
        "CAST(count(DISTINCT u) AS BIGINT) AS n_distinct_users "
        "FROM x GROUP BY w")


# ---------------- calibration bins (reliability diagram) ----------------

CALIB_BINS = 10


def q_calibration_bins(sf_dir: str):
    """Reliability-diagram table for a score used as a probability —
    the calibration companion to q_auc_exact (AUC measures ranking,
    calibration measures the probabilities themselves): min-max
    normalize the order-total score to p_hat in [0, 1e6], bin into 10
    fixed-width bins, and per bin report support, positives, observed
    rate and mean predicted value.  A calibrated scorer has
    pos_rate_e6 tracking avg_p_e6 along the diagonal.  Two scalar
    aggregates + one vectorized pass + one tiny groupby; rates as
    truncated integer ratios (non-negative, so python and DuckDB //
    agree)."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderpriority", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        prio = b["o_orderpriority"].to_pandas()
        pos = prio.str.startswith(("1-", "2-")).to_numpy()
        return pa.table({"cents": scale_col(
            b["o_totalprice"].to_numpy(zero_copy_only=False), 100.0),
            "pos": pos.astype(np.int64)})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    lo = int(rows.min("cents"))
    hi = int(rows.max("cents"))
    span = hi - lo + 1

    def binned(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False)
        p_e6 = 1_000_000 * (c - lo) // span
        return pa.table({"bin": p_e6 * CALIB_BINS // 1_000_000,
                         "one": np.ones(len(c), np.int64),
                         "pos": b["pos"], "p_e6": p_e6})

    agg = rows.map_batches(binned, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("bin").aggregate(Sum("one", alias_name="n"),
                                  Sum("pos", alias_name="n_pos"),
                                  Sum("p_e6", alias_name="sum_p_e6"))

    def rates(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        npos = b["n_pos"].to_numpy(zero_copy_only=False)
        sp = b["sum_p_e6"].to_numpy(zero_copy_only=False)
        return pa.table({"bin": b["bin"], "n": n, "n_pos": npos,
                         "pos_rate_e6": 1_000_000 * npos // n,
                         "avg_p_e6": sp // n})

    return agg.map_batches(rates, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_calibration_bins() -> str:
    return (
        "WITH o AS (SELECT CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) "
        "AS cents, CASE WHEN o_orderpriority LIKE '1-%' "
        "OR o_orderpriority LIKE '2-%' THEN 1 ELSE 0 END AS pos "
        "FROM orders), "
        "r AS (SELECT min(cents) AS lo, max(cents) - min(cents) + 1 "
        "AS span FROM o), "
        "b AS (SELECT 1000000 * (cents - r.lo) // r.span AS p_e6, pos "
        "FROM o, r) "
        f"SELECT CAST(p_e6 * {CALIB_BINS} // 1000000 AS BIGINT) AS bin, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(pos) AS BIGINT) AS n_pos, "
        "CAST(1000000 * sum(pos) // count(*) AS BIGINT) AS pos_rate_e6, "
        "CAST(sum(p_e6) // count(*) AS BIGINT) AS avg_p_e6 "
        f"FROM b GROUP BY p_e6 * {CALIB_BINS} // 1000000")


# ---------------- score-distribution drift (two-sample chi-square) -------

DRIFT_BINS = 10
DRIFT_E6 = 10**6


def q_score_drift(sf_dir: str):
    """Data-drift monitor: two-sample chi-square between the order-
    total score distributions of the first and second halves of the
    order-date range, over DRIFT_BINS fixed-width global bins — the
    integer-exact sibling of PSI (which needs ln).  One vectorized
    pass bins every order into a (half, bin) cell, one tiny groupby,
    then the chi-square is summed on the driver in unbounded Python
    ints with the repo's half-up convention ((2*num+den)//(2*den)),
    matching the HUGEINT oracle bit for bit."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        return pa.table({"day": day,
                         "cents": scale_col(
                             b["o_totalprice"].to_numpy(zero_copy_only=False),
                             100.0)})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    dlo, dhi = int(rows.min("day")), int(rows.max("day"))
    clo, chi_ = int(rows.min("cents")), int(rows.max("cents"))
    mid = (dlo + dhi) // 2
    span = chi_ - clo + 1

    def cells(b: pa.Table) -> pa.Table:
        d = b["day"].to_numpy(zero_copy_only=False)
        c = b["cents"].to_numpy(zero_copy_only=False)
        return pa.table({"half": (d > mid).astype(np.int64),
                         "bin": (c - clo) * DRIFT_BINS // span,
                         "one": np.ones(len(d), np.int64)})

    obs_pdf = rows.map_batches(cells, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby(["half", "bin"]).aggregate(Sum("one", alias_name="o")) \
        .to_pandas()
    obs = {(int(h), int(bn)): int(o) for h, bn, o in
           zip(obs_pdf["half"], obs_pdf["bin"], obs_pdf["o"])}
    halves = sorted({h for h, _ in obs})
    bins = sorted({bn for _, bn in obs})
    row = {h: sum(v for (a, _), v in obs.items() if a == h)
           for h in halves}
    col = {bn: sum(v for (_, b2), v in obs.items() if b2 == bn)
           for bn in bins}
    n = sum(obs.values())
    chi2_e6 = 0
    for h in halves:
        for bn in bins:
            o = obs.get((h, bn), 0)
            num = (o * n - row[h] * col[bn]) ** 2 * DRIFT_E6
            den = row[h] * col[bn] * n
            chi2_e6 += (2 * num + den) // (2 * den)
    dof = (len(halves) - 1) * (len(bins) - 1)
    return pa.table({"chi2_e6": pa.array([chi2_e6], pa.int64()),
                     "dof": pa.array([dof], pa.int64())})


def sql_score_drift() -> str:
    return (
        "WITH o0 AS (SELECT epoch_us(o_orderdate) // "
        f"{DAY_US} AS day, "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents "
        "FROM orders), "
        "rng AS (SELECT (min(day) + max(day)) // 2 AS mid, "
        "min(cents) AS clo, max(cents) - min(cents) + 1 AS span "
        "FROM o0), "
        "b AS (SELECT CASE WHEN day > rng.mid THEN 1 ELSE 0 END AS half, "
        f"(cents - rng.clo) * {DRIFT_BINS} // rng.span AS bin "
        "FROM o0, rng), "
        "o AS (SELECT half, bin, count(*) AS o FROM b GROUP BY 1, 2), "
        "r AS (SELECT half, count(*) AS r FROM b GROUP BY 1), "
        "c AS (SELECT bin, count(*) AS c FROM b GROUP BY 1), "
        "n AS (SELECT count(*) AS n FROM b), "
        "cells AS (SELECT r.half, c.bin, COALESCE(o.o, 0) AS o, r.r, "
        "c.c, (SELECT n FROM n) AS n FROM r CROSS JOIN c "
        "LEFT JOIN o ON o.half = r.half AND o.bin = c.bin), "
        "terms AS (SELECT (2*pn + den) // (2*den) AS t FROM ("
        "SELECT (CAST(o AS HUGEINT)*n - CAST(r AS HUGEINT)*c)"
        "*(CAST(o AS HUGEINT)*n - CAST(r AS HUGEINT)*c)"
        f"*{DRIFT_E6} AS pn, "
        "CAST(r AS HUGEINT)*c*n AS den FROM cells) q) "
        "SELECT CAST((SELECT sum(t) FROM terms) AS BIGINT) AS chi2_e6, "
        "CAST(((SELECT count(*) FROM r) - 1) * "
        "((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof")


# ---------------- weekly cohort retention matrix ----------------

WEEK_US = 7 * DAY_US


def q_cohort_matrix(sf_dir: str):
    """Weekly cohort retention matrix — the 2-D growth-analytics grid
    (rows = signup cohort week, columns = weeks-since offset, cell =
    distinct users active): cohort week = each user's first active
    week (one groupby(min)), activity deduped to (user, week) cells
    (one groupby), one hash join assigns each activity cell to its
    cohort, one counting groupby ends it.  Complements
    q_user_retention's hour-to-next-hour curve with the full cohort
    triangle; all int64."""
    from ray.data.aggregate import Count

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["user_id"].cast(pa.int64()),
                         "week": _ts_us(b) // WEEK_US})

    uw = ev.map_batches(pre, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .groupby(["u", "week"]).aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"]).materialize()
    first = uw.groupby("u").aggregate(Min("week", alias_name="w0")) \
        .map_batches(lambda b: pa.table({"u2": b["u"], "w0": b["w0"]}),
                     batch_format="pyarrow")
    j = uw.join(first, join_type="inner", num_partitions=4,
                on=("u",), right_on=("u2",))
    return j.map_batches(
        lambda b: pa.table({
            "cohort_week": b["w0"],
            "offset_w": b["week"].to_numpy(zero_copy_only=False)
            - b["w0"].to_numpy(zero_copy_only=False),
            "one": np.ones(b.num_rows, np.int64)}),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["cohort_week", "offset_w"]).aggregate(
            Sum("one", alias_name="n_users"))


def sql_cohort_matrix() -> str:
    return (
        f"WITH uw AS (SELECT DISTINCT user_id AS u, "
        f"epoch_us(ts) // {WEEK_US} AS week FROM events), "
        "f AS (SELECT u, min(week) AS w0 FROM uw GROUP BY u) "
        "SELECT CAST(f.w0 AS BIGINT) AS cohort_week, "
        "CAST(uw.week - f.w0 AS BIGINT) AS offset_w, "
        "CAST(count(*) AS BIGINT) AS n_users "
        "FROM uw JOIN f ON f.u = uw.u GROUP BY f.w0, uw.week - f.w0")


# ---------------- correlated aggregate: above own average ----------------

def q_above_own_avg(sf_dir: str):
    """Correlated-aggregate filter — orders priced strictly above their
    OWN customer's average (the `WHERE x > (SELECT avg ... correlated)`
    shape): per-customer (sum, n) from one groupby joins back to the
    rows, and the comparison is the integer cross-multiplication
    cents * n > sum_cents — no division, no float, exact.  Output per
    priority: orders, above-own-average orders.  The join-back is the
    standard decorrelation every optimizer applies; here it is
    explicit and the broadcast side stays a Dataset."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority",
                                 "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"ck": b["o_custkey"].cast(pa.int64()),
                         "prio": b["o_orderpriority"],
                         "cents": scale_col(
                             b["o_totalprice"].to_numpy(zero_copy_only=False),
                             100.0),
                         "one": np.ones(b.num_rows, np.int64)})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    per_cust = rows.groupby("ck").aggregate(
        Sum("cents", alias_name="s"), Sum("one", alias_name="n")) \
        .map_batches(lambda b: pa.table({"ck2": b["ck"], "s": b["s"],
                                         "n": b["n"]}),
                     batch_format="pyarrow")
    j = rows.join(per_cust, join_type="inner", num_partitions=4,
                  on=("ck",), right_on=("ck2",))

    def flag(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False)
        s = b["s"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({"prio": b["prio"],
                         "one": np.ones(len(c), np.int64),
                         "above": (c * n > s).astype(np.int64)})

    return j.map_batches(flag, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("prio").aggregate(Sum("one", alias_name="n_orders"),
                                   Sum("above", alias_name="n_above"))


def sql_above_own_avg() -> str:
    return (
        "WITH o AS (SELECT o_custkey AS ck, o_orderpriority AS prio, "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents "
        "FROM orders), "
        "g AS (SELECT ck, sum(cents) AS s, count(*) AS n FROM o "
        "GROUP BY ck) "
        "SELECT o.prio, CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(sum(CASE WHEN o.cents * g.n > g.s THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_above "
        "FROM o JOIN g ON g.ck = o.ck GROUP BY o.prio")


# ---------------- cumulative distinct users per day ----------------

def q_cum_uniques(sf_dir: str):
    """Cumulative distinct users by day (the audience-growth curve):
    a user contributes on their FIRST active day only, so the curve is
    the running sum of per-day first-appearance counts — one
    groupby(min) for first days, one tiny per-day groupby, then the
    cumsum boundary-carry scan (blocks never move).  Days with no new
    users simply inherit the previous value at read time; only days
    with >= 1 first appearance emit a row (same in the oracle)."""
    from ray.data.aggregate import Count
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["user_id"].cast(pa.int64()),
                         "day": _ts_us(b) // DAY_US})

    firsts = ev.map_batches(pre, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("u").aggregate(Min("day", alias_name="d0"))
    per_day = firsts.map_batches(
        lambda b: pa.table({"key": np.zeros(b.num_rows, np.int64),
                            "us": b["d0"].cast(pa.int64()),
                            "val": np.ones(b.num_rows, np.int64)}),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("us").aggregate(Sum("val", alias_name="n_new"))
    rows = per_day.map_batches(
        lambda b: pa.table({"key": np.zeros(b.num_rows, np.int64),
                            "us": b["us"].cast(pa.int64()),
                            "val": b["n_new"].cast(pa.int64()),
                            "n_new": b["n_new"].cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    cum = cumsum_per_key(rows, payload_cols=["n_new"], order_cols=("us",))
    return cum.map_batches(
        lambda b: pa.table({"day": b["us"], "n_new": b["n_new"],
                            "cum_users": b["cum_val"]}),
        batch_format="pyarrow", zero_copy_batch=True)


def sql_cum_uniques() -> str:
    return (
        f"WITH f AS (SELECT user_id AS u, min(epoch_us(ts) // {DAY_US}) "
        "AS d0 FROM events GROUP BY user_id), "
        "d AS (SELECT d0 AS day, count(*) AS n_new FROM f GROUP BY d0) "
        "SELECT CAST(day AS BIGINT) AS day, "
        "CAST(n_new AS BIGINT) AS n_new, "
        "CAST(sum(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) "
        "AS BIGINT) AS cum_users FROM d")


# ---------------- EXCEPT ALL (multiset difference) ----------------

def q_except_all(sf_dir: str):
    """Multiset difference EXCEPT ALL between the two halves of the
    order-date range over (custkey, priority) rows — the bag-semantics
    set op UNION/INTERSECT-style queries miss: surviving multiplicity
    = max(c_first - c_second, 0).  One (key, half) counting groupby,
    one vectorized difference — no join, no row replication; rows with
    zero surviving multiplicity are dropped (same as SQL EXCEPT ALL's
    empty contribution)."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority",
                                 "o_orderdate"])

    def pre(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        return pa.table({"ck": b["o_custkey"].cast(pa.int64()),
                         "prio": b["o_orderpriority"],
                         "day": day})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    lo, hi = int(rows.min("day")), int(rows.max("day"))
    mid = (lo + hi) // 2

    agg = rows.map_batches(
        lambda b: (lambda d: pa.table({
            "ck": b["ck"], "prio": b["prio"],
            "c1": (d <= mid).astype(np.int64),
            "c2": (d > mid).astype(np.int64)}))(
            b["day"].to_numpy(zero_copy_only=False)),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["ck", "prio"]).aggregate(
            Sum("c1", alias_name="n_first"),
            Sum("c2", alias_name="n_second"))

    def diff(b: pa.Table) -> pa.Table:
        c1 = b["n_first"].to_numpy(zero_copy_only=False)
        c2 = b["n_second"].to_numpy(zero_copy_only=False)
        surv = np.maximum(c1 - c2, 0)
        keep = surv > 0
        return pa.table({"custkey": b["ck"].filter(pa.array(keep)),
                         "prio": b["prio"].filter(pa.array(keep)),
                         "multiplicity": surv[keep]})

    return agg.map_batches(diff, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_except_all() -> str:
    return (
        "WITH o AS (SELECT o_custkey AS ck, o_orderpriority AS prio, "
        f"epoch_us(o_orderdate) // {DAY_US} AS day FROM orders), "
        "r AS (SELECT (min(day) + max(day)) // 2 AS mid FROM o), "
        "c AS (SELECT ck, prio, "
        "sum(CASE WHEN day <= r.mid THEN 1 ELSE 0 END) AS c1, "
        "sum(CASE WHEN day > r.mid THEN 1 ELSE 0 END) AS c2 "
        "FROM o, r GROUP BY ck, prio) "
        "SELECT CAST(ck AS BIGINT) AS custkey, prio, "
        "CAST(c1 - c2 AS BIGINT) AS multiplicity "
        "FROM c WHERE c1 > c2")


# ---------------- KMV (k-minimum-values) distinct sketch ----------------

KMV_K = 64
KMV_A = 1_103_515_245
KMV_P = 2_147_483_647  # 2^31 - 1; h*h < 2^62


def _kmv_hash(keys: np.ndarray) -> np.ndarray:
    """Quadratic-mix hash to [0, P) — affine alone is low-discrepancy
    on consecutive ids (see _agms_signs), which would bias the kth
    minimum badly."""
    h = (keys * KMV_A + 99_991) % KMV_P
    return (h * h + h) % KMV_P


def q_kmv_distinct(sf_dir: str):
    """KMV (k-minimum-values / bottom-k) distinct-count sketch over
    event users — the order-statistics alternative to the repo's HLL:
    keep the K smallest hash values; estimate = (K-1) * P // h_(K)
    (Bar-Yossef et al.), exact integer arithmetic so the oracle
    hash-matches.  Plan: each block emits its own bottom-K partial
    (vectorized np.partition), one tiny merge block re-selects the
    global bottom-K — mergeability is the whole point of the sketch.
    Reports the estimate next to the exact distinct count."""
    from ray.data.aggregate import Count

    ev = read_table(sf_dir, "events", columns=["user_id"])

    def bottomk(b: pa.Table) -> pa.Table:
        u = np.unique(b["user_id"].cast(pa.int64())
                      .to_numpy(zero_copy_only=False))
        h = np.unique(_kmv_hash(u))
        return pa.table({"h": h[:KMV_K]})

    mins = ev.map_batches(bottomk, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .repartition(1) \
        .map_batches(lambda b: pa.table({
            "h": np.unique(b["h"].to_numpy(zero_copy_only=False))[:KMV_K]}),
            batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True).to_pandas()
    hs = mins["h"].to_numpy()
    kth = int(hs[KMV_K - 1]) if len(hs) >= KMV_K else None
    est = (KMV_K - 1) * KMV_P // kth if kth else len(hs)

    exact = int(ev.groupby("user_id").aggregate(Count(alias_name="_n"))
                .count())
    return pa.table({
        "est_distinct": pa.array([est], pa.int64()),
        "true_distinct": pa.array([exact], pa.int64()),
        "kth_min_hash": pa.array([kth if kth else -1], pa.int64())})


def sql_kmv_distinct() -> str:
    h0 = f"((user_id * {KMV_A} + 99991) % {KMV_P})"
    h = f"(({h0} * {h0} + {h0}) % {KMV_P})"
    return (
        f"WITH u AS (SELECT DISTINCT user_id FROM events), "
        f"hs AS (SELECT DISTINCT {h} AS h FROM u), "
        f"bk AS (SELECT h FROM hs ORDER BY h LIMIT {KMV_K}), "
        "kth AS (SELECT CASE WHEN (SELECT count(*) FROM bk) >= "
        f"{KMV_K} THEN (SELECT max(h) FROM bk) ELSE NULL END AS k) "
        "SELECT CAST(CASE WHEN kth.k IS NOT NULL THEN "
        f"CAST({(KMV_K - 1)} AS BIGINT) * {KMV_P} // kth.k "
        "ELSE (SELECT count(*) FROM bk) END AS BIGINT) AS est_distinct, "
        "(SELECT CAST(count(*) AS BIGINT) FROM u) AS true_distinct, "
        "CAST(coalesce(kth.k, -1) AS BIGINT) AS kth_min_hash "
        "FROM kth")


# ---------------- Lorenz curve deciles ----------------

LORENZ_K = 10


def q_lorenz_deciles(sf_dir: str):
    """Lorenz-curve table underlying the Gini coefficient
    (q_gini_nation reports the scalar; this is the plot data): rank
    customers by total spend, split into 10 equal-frequency groups,
    and report each decile's customer count and EXACT cumulative spend
    share as an integer (cum_cents, total_cents) pair — no division,
    no float.  Ranks via the sorted-block rank carry, cumulative sums
    via one pass over the tiny 10-row decile table."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"ck": b["o_custkey"].cast(pa.int64()),
                         "cents": scale_col(
                             b["o_totalprice"].to_numpy(zero_copy_only=False),
                             100.0)})

    spend = orders.map_batches(pre, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby("ck").aggregate(Sum("cents", alias_name="spend")) \
        .map_batches(lambda b: pa.table({
            "g": np.zeros(b.num_rows, np.int64),
            "spend": b["spend"].cast(pa.int64()),
            "ck": b["ck"].cast(pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
    n = spend.count()
    ranked = rank_per_group(spend, key="g", order=["spend", "ck"],
                            descending=[False, False])

    agg = ranked.map_batches(
        lambda b: (lambda r: pa.table({
            "decile": (r - 1) * LORENZ_K // n + 1,
            "spend": b["spend"],
            "one": np.ones(len(r), np.int64)}))(
            b["rank"].to_numpy(zero_copy_only=False)),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("decile").aggregate(Sum("one", alias_name="n_cust"),
                                     Sum("spend", alias_name="dec_cents")) \
        .to_pandas().sort_values("decile")
    dec = agg["dec_cents"].to_numpy().astype(np.int64)
    cum = np.cumsum(dec)
    total = int(dec.sum())
    return pa.table({
        "decile": agg["decile"].to_numpy().astype(np.int64),
        "n_cust": agg["n_cust"].to_numpy().astype(np.int64),
        "cum_cents": cum,
        "total_cents": np.full(len(dec), total, np.int64)})


def sql_lorenz_deciles() -> str:
    return (
        "WITH s AS (SELECT o_custkey AS ck, "
        "sum(CAST(floor(o_totalprice*100.0+0.5) AS BIGINT)) AS spend "
        "FROM orders GROUP BY o_custkey), "
        f"t AS (SELECT spend, ntile({LORENZ_K}) OVER "
        "(ORDER BY spend, ck) AS decile FROM s), "
        "d AS (SELECT decile, count(*) AS n_cust, sum(spend) AS dc "
        "FROM t GROUP BY decile) "
        "SELECT CAST(decile AS BIGINT) AS decile, "
        "CAST(n_cust AS BIGINT) AS n_cust, "
        "CAST(sum(dc) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) "
        "AS BIGINT) AS cum_cents, "
        "CAST((SELECT sum(dc) FROM d) AS BIGINT) AS total_cents FROM d")


# ---------------- exact per-group median (order statistics) ----------------

def q_median_nation(sf_dir: str):
    """Exact per-nation median of customer account balances as the
    middle ORDER-STATISTIC PAIR (lo, hi) — for odd groups lo = hi, for
    even groups they bracket the conventional average, which is left
    to the consumer so everything stays int64 (no float .5 halves).
    Plan: per-(nation) ranks via the sorted-block rank carry, group
    sizes from one tiny groupby broadcast back, middle elements
    selected vectorized — the per-group generalization of the global
    quantile queries."""
    from igpm_pem_ray.stages.ranked import rank_per_group
    from ray.data.aggregate import Count
    import ray as _ray

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"nat": b["c_nationkey"].cast(pa.int64()),
                         "bal": scale_col(
                             b["c_acctbal"].to_numpy(zero_copy_only=False),
                             100.0),
                         "ck": b["c_custkey"].cast(pa.int64())})

    rows = cust.map_batches(pre, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    sizes = rows.groupby("nat").aggregate(Count(alias_name="n")) \
        .to_pandas()
    nv = np.zeros(int(sizes["nat"].max()) + 1, np.int64)
    nv[sizes["nat"].to_numpy()] = sizes["n"].to_numpy()
    ref = _ray.put(nv)

    ranked = rank_per_group(rows, key="nat", order=["bal", "ck"],
                            descending=[False, False])

    def mid(b: pa.Table, _ref=ref) -> pa.Table:
        nvv = _ray.get(_ref)
        nat = b["nat"].to_numpy(zero_copy_only=False)
        r = b["rank"].to_numpy(zero_copy_only=False)
        bal = b["bal"].to_numpy(zero_copy_only=False)
        n = nvv[nat]
        is_lo = r == (n + 1) // 2
        is_hi = r == (n + 2) // 2
        keep = is_lo | is_hi
        return pa.table({"nat": nat[keep],
                         "lo": np.where(is_lo[keep], bal[keep], 0),
                         "hi": np.where(is_hi[keep], bal[keep], 0),
                         "n": n[keep]})

    agg = ranked.map_batches(mid, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("nat").aggregate(Sum("lo", alias_name="sl"),
                                  Sum("hi", alias_name="sh"),
                                  Max("n", alias_name="n"))

    def fin(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        sl = b["sl"].to_numpy(zero_copy_only=False)
        sh = b["sh"].to_numpy(zero_copy_only=False)
        # odd group: one row was both lo and hi -> sl==sh==value;
        # even: two rows, each contributing one side
        return pa.table({"nationkey": b["nat"], "n_cust": n,
                         "med_lo_e2": sl, "med_hi_e2": sh})

    return agg.map_batches(fin, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_median_nation() -> str:
    return (
        "WITH c AS (SELECT c_nationkey AS nat, "
        "CAST(floor(c_acctbal*100.0+0.5) AS BIGINT) AS bal, "
        "c_custkey AS ck FROM customer), "
        "r AS (SELECT nat, bal, row_number() OVER "
        "(PARTITION BY nat ORDER BY bal, ck) AS rk, "
        "count(*) OVER (PARTITION BY nat) AS n FROM c) "
        "SELECT CAST(nat AS BIGINT) AS nationkey, "
        "CAST(max(n) AS BIGINT) AS n_cust, "
        "CAST(sum(CASE WHEN rk = (n + 1) // 2 THEN bal ELSE 0 END) "
        "AS BIGINT) AS med_lo_e2, "
        "CAST(sum(CASE WHEN rk = (n + 2) // 2 THEN bal ELSE 0 END) "
        "AS BIGINT) AS med_hi_e2 "
        "FROM r WHERE rk = (n + 1) // 2 OR rk = (n + 2) // 2 "
        "GROUP BY nat")


# -------- decision stump: exact best Gini split (supervised split search) --------

STUMP_PACK = 1 << 31   # (n, n1) pair packed into one prefix-summable int64
STUMP_S = 1_000_000    # fixed-point scale for the purity score


def q_decision_stump(sf_dir: str):
    """Exact best single-feature threshold split — the CART /
    gradient-boosting inner loop: over all candidate thresholds t on
    x = o_totalprice, maximize the weighted Gini purity of the
    partition (x <= t | x > t) against the binary label
    y = [o_orderstatus = 'F'].

    Minimizing weighted Gini impurity is equivalent to maximizing
    h(t) = (aL^2+bL^2)/nL + (aR^2+bR^2)/nR (a/b = class counts per
    side), an exact rational with num <= 2n^3 and den = nL*nR <=
    n^2/4 — int64-safe to n ~ 4e5 rows, and the fixed-point argmax
    key floor(num*S/den) is computed WITHOUT overflow via the divmod
    identity (num//den)*S + ((num%den)*S)//den, written identically
    in the SQL oracle.  (At 10^12 rows the candidate set is first
    quantile-bucketed — standard histogram-split practice — which
    this plan expresses by feeding bucketed x; counts stay int64.)

    Plan: one groupby on x -> per-value (n, n1) PACKED as n*2^31+n1
    so ONE distributed prefix sum (stages/temporal.cumsum_per_key,
    linear in the pack while total rows < 2^31) yields both
    cumulative counts; a stateless map scores every candidate; the
    argmax is a per-block partial best + sort/limit(1) merge."""
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    orders = read_table(sf_dir, "orders",
                        columns=["o_totalprice", "o_orderstatus"])

    def pre(b: pa.Table) -> pa.Table:
        x = scale_col(b["o_totalprice"].to_numpy(zero_copy_only=False),
                      100.0)
        y = (np.asarray(b["o_orderstatus"].to_pylist(), dtype=object)
             == "F").astype(np.int64)
        return pa.table({"x": x, "y": y})

    per_val = orders.map_batches(pre, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .groupby("x").aggregate(Count(alias_name="n"),
                                Sum("y", alias_name="n1"))
    packed = per_val.map_batches(
        lambda b: pa.table({
            "key": np.zeros(b.num_rows, np.int64),
            "us": b["x"].cast(pa.int64()),
            "x": b["x"].cast(pa.int64()),
            "val": (b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
                    * STUMP_PACK
                    + b["n1"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))}),
        batch_format="pyarrow")
    cum = cumsum_per_key(packed, payload_cols=["x"]).materialize()

    tot = cum.max("cum_val")  # last prefix = global totals, same pack
    nt = int(tot) >> 31
    at = int(tot) & (STUMP_PACK - 1)

    def score(b: pa.Table) -> pa.Table:
        cv = b["cum_val"].to_numpy(zero_copy_only=False)
        x = b["x"].to_numpy(zero_copy_only=False)
        nl = cv >> 31
        al = cv & (STUMP_PACK - 1)
        keep = nl < nt
        nl, al, x = nl[keep], al[keep], x[keep]
        if not len(x):
            return pa.table({"threshold_e2": np.empty(0, np.int64),
                             "purity_e6": np.empty(0, np.int64),
                             "n_left": np.empty(0, np.int64),
                             "n_right": np.empty(0, np.int64)})
        nr = nt - nl
        bl = nl - al
        ar = at - al
        br = nr - ar
        num = (al * al + bl * bl) * nr + (ar * ar + br * br) * nl
        den = nl * nr
        q = (num // den) * STUMP_S + ((num % den) * STUMP_S) // den
        i = np.lexsort((x, -q))[0]  # best q, then smallest threshold
        return pa.table({"threshold_e2": x[i:i + 1].astype(np.int64),
                         "purity_e6": q[i:i + 1].astype(np.int64),
                         "n_left": nl[i:i + 1].astype(np.int64),
                         "n_right": nr[i:i + 1].astype(np.int64)})

    best = cum.map_batches(score, batch_format="pyarrow") \
        .sort(["purity_e6", "threshold_e2"], descending=[True, False]) \
        .limit(1)
    return pa.Table.from_pandas(best.to_pandas(), preserve_index=False) \
        .select(["threshold_e2", "purity_e6", "n_left", "n_right"])


def sql_decision_stump() -> str:
    return (
        "WITH o AS (SELECT "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS x, "
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y "
        "FROM orders), "
        "g AS (SELECT x, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(y) AS BIGINT) AS n1 FROM o GROUP BY x), "
        "c AS (SELECT x, CAST(sum(n) OVER w AS BIGINT) AS nl, "
        "CAST(sum(n1) OVER w AS BIGINT) AS al FROM g "
        "WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)), "
        "t AS (SELECT CAST(sum(n) AS BIGINT) AS nt, "
        "CAST(sum(n1) AS BIGINT) AS at FROM g), "
        "s AS (SELECT x, nl, (SELECT nt FROM t) - nl AS nr, al, "
        "nl - al AS bl, (SELECT at FROM t) - al AS ar, "
        "((SELECT nt FROM t) - nl) - ((SELECT at FROM t) - al) AS br "
        "FROM c WHERE nl < (SELECT nt FROM t)), "
        "q AS (SELECT x, nl, nr, "
        "(al*al + bl*bl) * nr + (ar*ar + br*br) * nl AS num, "
        "nl * nr AS den FROM s) "
        "SELECT CAST(x AS BIGINT) AS threshold_e2, "
        f"CAST((num // den) * {STUMP_S} + "
        f"((num % den) * {STUMP_S}) // den AS BIGINT) AS purity_e6, "
        "CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right "
        "FROM q "
        f"ORDER BY purity_e6 DESC, x LIMIT 1")


# -------- Allen interval-algebra census --------

ALLEN_Q_US = 600_000_000  # 10-minute quantum: start snap + duration unit
_AL_A, _AL_C, _AL_M = 1_103_515_245, 12_345, (1 << 31) - 1


def q_allen_census(sf_dir: str):
    """Census of Allen's 13 interval-algebra relations (before, meets,
    overlaps, starts, during, finishes, their inverses, equals —
    Allen CACM 1983) over per-user event intervals: start = ts
    snapped to a 10-minute quantum (so boundary-coincident relations
    are realizable), duration = (1 + event_id mod 13) quanta.  Pairs
    are ordered by an affine hash of event_id (same expression in the
    SQL oracle) rather than by id — event ids correlate with time, and
    id-ordered pairs would never realize the six inverse relations.
    The relation classifier is the temporal-reasoning primitive under
    scheduling / conflict detection; the census is its corpus-level
    fingerprint.

    Scale shape: ONE equi hash self-join on user_id (per-user groups
    are small, so fan-out is bounded; at web scale the join key
    gains a coarse time bucket exactly like q_temporal_pairs); the
    13-way classification is one vectorized np.select over the four
    endpoint comparisons; per-block combiners + an O(13) groupby."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def side(prefix: str):
        def f(b: pa.Table) -> pa.Table:
            us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            eid = b["event_id"].to_numpy(zero_copy_only=False)
            s = us // ALLEN_Q_US * ALLEN_Q_US
            dur = (eid % 13 + 1) * ALLEN_Q_US
            hk = ((eid % _AL_M) * _AL_A + _AL_C) % _AL_M
            return pa.table({f"u_{prefix}": b["user_id"],
                             f"s_{prefix}": s,
                             f"e_{prefix}": s + dur,
                             f"h_{prefix}": hk,
                             f"id_{prefix}": eid})
        return f

    a = ev.map_batches(side("a"), batch_format="pyarrow",
                       zero_copy_batch=True)
    bb = ev.map_batches(side("b"), batch_format="pyarrow",
                        zero_copy_batch=True)
    n_ev = ev.count()
    np_join = 1 if n_ev < 65_536 else min(32, max(8, n_ev // 200_000))
    j = a.join(bb, join_type="inner", num_partitions=np_join,
               on=("u_a",), right_on=("u_b",))

    NAMES = np.asarray(
        ["before", "meets", "overlaps", "starts", "during", "finishes",
         "equals", "finished_by", "contains", "started_by",
         "overlapped_by", "met_by", "after"], dtype=object)

    def classify(t: pa.Table) -> pa.Table:
        ia = t["id_a"].to_numpy(zero_copy_only=False)
        ib = t["id_b"].to_numpy(zero_copy_only=False)
        ha = t["h_a"].to_numpy(zero_copy_only=False)
        hb = t["h_b"].to_numpy(zero_copy_only=False)
        keep = (ha < hb) | ((ha == hb) & (ia < ib))
        s1 = t["s_a"].to_numpy(zero_copy_only=False)[keep]
        e1 = t["e_a"].to_numpy(zero_copy_only=False)[keep]
        s2 = t["s_b"].to_numpy(zero_copy_only=False)[keep]
        e2 = t["e_b"].to_numpy(zero_copy_only=False)[keep]
        rel = np.select(
            [e1 < s2,
             e1 == s2,
             (s1 < s2) & (s2 < e1) & (e1 < e2),
             (s1 == s2) & (e1 < e2),
             (s1 > s2) & (e1 < e2),
             (s1 > s2) & (e1 == e2),
             (s1 == s2) & (e1 == e2),
             (s1 < s2) & (e1 == e2),
             (s1 < s2) & (e1 > e2),
             (s1 == s2) & (e1 > e2),
             (s2 < s1) & (s1 < e2) & (e2 < e1),
             e2 == s1,
             e2 < s1],
            np.arange(13), default=-1)
        u, c = np.unique(rel, return_counts=True)
        return pa.table({"relation": pa.array(NAMES[u], pa.string()),
                         "n": c.astype(np.int64)})

    return j.map_batches(classify, batch_format="pyarrow") \
        .groupby("relation").aggregate(Sum("n", alias_name="n_pairs"))


def sql_allen_census() -> str:
    iv = ("SELECT user_id, event_id, "
          f"((event_id % {_AL_M}) * {_AL_A} + {_AL_C}) % {_AL_M} AS hk, "
          f"CAST(epoch_us(ts) AS BIGINT) // {ALLEN_Q_US} * {ALLEN_Q_US} "
          "AS s, "
          f"CAST(epoch_us(ts) AS BIGINT) // {ALLEN_Q_US} * {ALLEN_Q_US} "
          f"+ (event_id % 13 + 1) * {ALLEN_Q_US} AS e FROM events")
    return (
        f"WITH iv AS ({iv}), "
        "p AS (SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2 "
        "FROM iv a JOIN iv b ON a.user_id = b.user_id "
        "AND (a.hk < b.hk OR (a.hk = b.hk "
        "AND a.event_id < b.event_id))) "
        "SELECT CASE "
        "WHEN e1 < s2 THEN 'before' "
        "WHEN e1 = s2 THEN 'meets' "
        "WHEN s1 < s2 AND s2 < e1 AND e1 < e2 THEN 'overlaps' "
        "WHEN s1 = s2 AND e1 < e2 THEN 'starts' "
        "WHEN s1 > s2 AND e1 < e2 THEN 'during' "
        "WHEN s1 > s2 AND e1 = e2 THEN 'finishes' "
        "WHEN s1 = s2 AND e1 = e2 THEN 'equals' "
        "WHEN s1 < s2 AND e1 = e2 THEN 'finished_by' "
        "WHEN s1 < s2 AND e1 > e2 THEN 'contains' "
        "WHEN s1 = s2 AND e1 > e2 THEN 'started_by' "
        "WHEN s2 < s1 AND s1 < e2 AND e2 < e1 THEN 'overlapped_by' "
        "WHEN e2 = s1 THEN 'met_by' "
        "ELSE 'after' END AS relation, "
        "CAST(count(*) AS BIGINT) AS n_pairs FROM p GROUP BY 1")


# -------- U-shaped multi-touch attribution --------

ATTR_BP_EDGE = 4_000   # basis points to first and to last touch
ATTR_BP_MID = 2_000    # pool split across middle touches


def q_attribution_u(sf_dir: str):
    """Position-based (U-shaped / 40-20-40) multi-touch attribution:
    for each converting user, the touchpoint path is every
    non-purchase event strictly before the user's FIRST purchase
    ((ts, event_id) lexicographic), and the conversion's 10000 basis
    points are split 40/20/40 — first and last touch get 4000 each,
    the middle pool of 2000 is divided by exact floor division with
    the REMAINDER credited to the first touch (single-touch paths
    take all 10000; two-touch paths fold the whole pool into the
    first).  The marketing-attribution operator class, kept in
    integer basis points so credit sums are exact under any
    reduction order.

    Plan: the conversion row per user is two tiny aggregates (min ts
    over purchases, then min event_id at that ts); touches reach
    their conversion by ONE hash join on user_id; per-user path
    ranks come from the sorted-block rank carry
    (stages/ranked.rank_per_group) and path lengths from one
    groupby joined back — every step an equi shuffle on user_id, no
    driver state."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"user": b["user_id"].cast(pa.int64()),
                         "us": b["ts"].cast(pa.int64()),
                         "eid": b["event_id"].cast(pa.int64()),
                         "etype": b["event_type"]})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    # join partitions follow the q_temporal_pairs convention: 1 below
    # 65k rows — each hash join spawns num_partitions aggregator
    # actors, and several concurrent joins deadlock a small CPU pool
    npj = 1 if rows.count() < 65_536 else 8
    pur = rows.filter(expr="etype == 'purchase'").materialize()
    g1 = pur.groupby("user").aggregate(Min("us", alias_name="cus"))
    j1 = pur.join(g1.rename_columns({"user": "user_g"}),
                  join_type="inner", num_partitions=npj,
                  on=("user",), right_on=("user_g",))
    conv = j1.filter(expr="us == cus") \
        .groupby("user").aggregate(Min("eid", alias_name="cid"),
                                   Min("us", alias_name="cus")) \
        .rename_columns({"user": "cuser"})

    touches = rows.filter(expr="etype != 'purchase'") \
        .join(conv, join_type="inner", num_partitions=npj,
              on=("user",), right_on=("cuser",))

    def before(b: pa.Table) -> pa.Table:
        us = b["us"].to_numpy(zero_copy_only=False)
        eid = b["eid"].to_numpy(zero_copy_only=False)
        cus = b["cus"].to_numpy(zero_copy_only=False)
        cid = b["cid"].to_numpy(zero_copy_only=False)
        m = (us < cus) | ((us == cus) & (eid < cid))
        return pa.table({"user": b["user"].to_numpy(
            zero_copy_only=False)[m], "us": us[m], "eid": eid[m],
            "etype": b["etype"].filter(pa.array(m))})

    tch = touches.map_batches(before, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    # forward + reverse path ranks (n = r + rr - 1) instead of a
    # count-join back: one fewer shuffle, and it sidesteps the Ray
    # 2.49 hash-join failure on empty right partitions (see README)
    ranked = rank_per_group(tch, key="user", order=["us", "eid"],
                            descending=[False, False]) \
        .rename_columns({"rank": "r"})
    full = rank_per_group(ranked, key="user", order=["us", "eid"],
                          descending=[True, True])

    def credit(b: pa.Table) -> pa.Table:
        r = b["r"].to_numpy(zero_copy_only=False)
        rr = b["rank"].to_numpy(zero_copy_only=False)
        n = r + rr - 1
        mid_each = np.where(n > 2, ATTR_BP_MID // np.maximum(n - 2, 1),
                            np.int64(0))
        rem = np.where(n > 2, ATTR_BP_MID - (n - 2) * mid_each,
                       np.int64(ATTR_BP_MID))
        c = np.where(n == 1, np.int64(10_000),
                     np.where(r == 1, ATTR_BP_EDGE + rem,
                              np.where(rr == 1, np.int64(ATTR_BP_EDGE),
                                       mid_each)))
        return pa.table({"channel": b["etype"],
                         "credit": c.astype(np.int64)})

    return full.map_batches(credit, batch_format="pyarrow") \
        .groupby("channel").aggregate(Sum("credit",
                                          alias_name="credit_bp"),
                                      Count(alias_name="n_touches"))


def sql_attribution_u() -> str:
    return (
        "WITH e AS (SELECT user_id AS u, "
        "CAST(epoch_us(ts) AS BIGINT) AS us, event_id AS eid, "
        "event_type AS etype FROM events), "
        "c1 AS (SELECT u, min(us) AS cus FROM e "
        "WHERE etype = 'purchase' GROUP BY u), "
        "conv AS (SELECT e.u, min(e.eid) AS cid, min(e.us) AS cus "
        "FROM e JOIN c1 ON c1.u = e.u AND c1.cus = e.us "
        "WHERE e.etype = 'purchase' GROUP BY e.u), "
        "t AS (SELECT e.u, e.us, e.eid, e.etype FROM e "
        "JOIN conv ON conv.u = e.u WHERE e.etype <> 'purchase' "
        "AND (e.us < conv.cus OR (e.us = conv.cus "
        "AND e.eid < conv.cid))), "
        "r AS (SELECT u, etype, row_number() OVER "
        "(PARTITION BY u ORDER BY us, eid) AS rk, "
        "count(*) OVER (PARTITION BY u) AS n FROM t), "
        "cr AS (SELECT etype, CASE WHEN n = 1 THEN 10000 "
        f"WHEN rk = 1 THEN {ATTR_BP_EDGE} + (CASE WHEN n > 2 "
        f"THEN {ATTR_BP_MID} - (n - 2) * ({ATTR_BP_MID} // (n - 2)) "
        f"ELSE {ATTR_BP_MID} END) "
        f"WHEN rk = n THEN {ATTR_BP_EDGE} "
        f"ELSE {ATTR_BP_MID} // (n - 2) END AS credit FROM r) "
        "SELECT etype AS channel, "
        "CAST(sum(credit) AS BIGINT) AS credit_bp, "
        "CAST(count(*) AS BIGINT) AS n_touches "
        "FROM cr GROUP BY etype")


# -------- greedy interval scheduling (activity selection) --------

ACT_Q_US = 600_000_000   # 10-minute quantum
ACT_ROUNDS = 5           # bounded greedy picks per user (SQL-unrollable)


def q_activity_selection(sf_dir: str):
    """Per-user maximum non-overlapping interval set by the classic
    earliest-finish-time greedy (activity selection / meeting-room
    scheduling), intervals = events with start ts snapped to 10-min
    quanta and duration (1 + event_id mod 13) quanta, capped at
    ACT_ROUNDS picks so the greedy recurrence unrolls into the SQL
    oracle round for round.  Greedy-on-sorted-finish is optimal for
    the uncapped problem; the cap is the bounded-round convention the
    matching/MIS/k-core oracles already use.

    Scale shape: the pick in every round is `min over eligible
    intervals per user` of the PACKED (finish, start, id) key — one
    int64, so each round is ONE groupby-min (combiner-friendly, no
    sort); eligibility (start >= current finish) is a stateless map
    against the O(users) pick table of the previous round, broadcast
    once via ray.put (at web scale the broadcast becomes a hash join
    on user, same plan shape).  Pack bounds asserted: quanta < 2^21,
    event_id < 2^20, finish < 2^22."""
    import ray as _ray

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    base = int(ev.min("ts").timestamp() * 1_000_000) \
        if hasattr(ev.min("ts"), "timestamp") else int(ev.min("ts"))

    def pre(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        s_q = (us - base) // ACT_Q_US
        e_q = s_q + (eid % 13 + 1)
        assert int(s_q.max(initial=0)) < (1 << 21) \
            and int(eid.max(initial=0)) < (1 << 20)
        pack = (e_q << 41) | (s_q << 20) | eid
        return pa.table({"user": b["user_id"].cast(pa.int64()),
                         "s_q": s_q, "pack": pack})

    iv = ev.map_batches(pre, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()

    users_sorted = None
    cur_end = None   # per-user current finish quantum
    n_sel = None
    for rnd in range(ACT_ROUNDS):
        if rnd == 0:
            elig = iv
        else:
            ref = _ray.put((users_sorted, cur_end))

            def keep(b: pa.Table, _ref=ref) -> pa.Table:
                us_, ce_ = _ray.get(_ref)
                u = b["user"].to_numpy(zero_copy_only=False)
                s_q = b["s_q"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(us_, u)
                m = s_q >= ce_[pos]
                return pa.table({"user": u[m], "s_q": s_q[m],
                                 "pack": b["pack"].to_numpy(
                                     zero_copy_only=False)[m]})

            elig = iv.map_batches(keep, batch_format="pyarrow",
                                  zero_copy_batch=True)
        picks = elig.groupby("user").aggregate(
            Min("pack", alias_name="p")).to_pandas()
        if not len(picks):
            break
        pu = picks["user"].to_numpy().astype(np.int64)
        pe = (picks["p"].to_numpy().astype(np.int64)) >> 41
        if rnd == 0:
            users_sorted = np.sort(pu)
            cur_end = np.zeros(len(users_sorted), np.int64)
            n_sel = np.zeros(len(users_sorted), np.int64)
        pos = np.searchsorted(users_sorted, pu)
        cur_end[pos] = pe
        n_sel[pos] += 1
    if users_sorted is None:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "n_meetings": pa.array([], pa.int64())})
    return pa.table({"user_id": users_sorted.astype(np.int64),
                     "n_meetings": n_sel.astype(np.int64)})


def sql_activity_selection() -> str:
    iv = ("SELECT user_id AS u, "
          f"(CAST(epoch_us(ts) AS BIGINT) - (SELECT "
          f"CAST(epoch_us(min(ts)) AS BIGINT) FROM events)) // {ACT_Q_US} "
          "AS s_q, event_id AS eid FROM events")
    parts = [
        f"iv0 AS ({iv})",
        "iv AS (SELECT u, s_q, s_q + (eid % 13 + 1) AS e_q, "
        "((s_q + (eid % 13 + 1)) << 41) | (s_q << 20) | eid AS pack "
        "FROM iv0)",
        "s1 AS (SELECT u, min(pack) AS p FROM iv GROUP BY u)",
        "c1 AS (SELECT u, p >> 41 AS cur FROM s1)",
    ]
    for r in range(2, ACT_ROUNDS + 1):
        parts += [
            f"s{r} AS (SELECT iv.u, min(iv.pack) AS p FROM iv "
            f"JOIN c{r - 1} c ON c.u = iv.u WHERE iv.s_q >= c.cur "
            "GROUP BY iv.u)",
            f"c{r} AS (SELECT u, p >> 41 AS cur FROM s{r})",
        ]
    presence = " + ".join(
        f"(CASE WHEN EXISTS (SELECT 1 FROM s{r} WHERE s{r}.u = s1.u) "
        "THEN 1 ELSE 0 END)" for r in range(2, ACT_ROUNDS + 1))
    return (
        f"WITH {', '.join(parts)} "
        "SELECT CAST(s1.u AS BIGINT) AS user_id, "
        f"CAST(1 + {presence} AS BIGINT) AS n_meetings FROM s1")


# -------- INTERSECT ALL (multiset intersection) --------

def q_intersect_all(sf_dir: str):
    """Multiset intersection INTERSECT ALL between the two halves of
    the order-date range over (custkey, priority) rows — completes
    the bag-semantics set-op family next to q_except_all: surviving
    multiplicity = min(c_first, c_second), zero-count rows dropped.
    Same shuffle shape: ONE counting groupby, one vectorized min."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority",
                                 "o_orderdate"])

    def pre(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        return pa.table({"ck": b["o_custkey"].cast(pa.int64()),
                         "prio": b["o_orderpriority"],
                         "day": day})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    lo, hi = int(rows.min("day")), int(rows.max("day"))
    mid = (lo + hi) // 2

    agg = rows.map_batches(
        lambda b: (lambda d: pa.table({
            "ck": b["ck"], "prio": b["prio"],
            "c1": (d <= mid).astype(np.int64),
            "c2": (d > mid).astype(np.int64)}))(
            b["day"].to_numpy(zero_copy_only=False)),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["ck", "prio"]).aggregate(
            Sum("c1", alias_name="n_first"),
            Sum("c2", alias_name="n_second"))

    def inter(b: pa.Table) -> pa.Table:
        c1 = b["n_first"].to_numpy(zero_copy_only=False)
        c2 = b["n_second"].to_numpy(zero_copy_only=False)
        surv = np.minimum(c1, c2)
        keep = surv > 0
        return pa.table({"custkey": b["ck"].filter(pa.array(keep)),
                         "prio": b["prio"].filter(pa.array(keep)),
                         "multiplicity": surv[keep]})

    return agg.map_batches(inter, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_intersect_all() -> str:
    return (
        "WITH o AS (SELECT o_custkey AS ck, o_orderpriority AS prio, "
        f"CAST(epoch_us(o_orderdate) AS BIGINT) // {DAY_US} AS day "
        "FROM orders), "
        "b AS (SELECT min(day) AS lo, max(day) AS hi FROM o), "
        "c AS (SELECT ck, prio, "
        "sum(CASE WHEN day <= ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 THEN 1 ELSE 0 END) AS c1, "
        "sum(CASE WHEN day > ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 THEN 1 ELSE 0 END) AS c2 FROM o GROUP BY ck, prio) "
        "SELECT CAST(ck AS BIGINT) AS custkey, prio, "
        "CAST(least(c1, c2) AS BIGINT) AS multiplicity FROM c "
        "WHERE least(c1, c2) > 0")


# -------- UNPIVOT (wide -> long melt) --------

UNPIVOT_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_unpivot(sf_dir: str):
    """UNPIVOT / melt: the four lineitem measure columns rotate into
    (orderkey, linenumber, measure, value_e2) long form — the inverse
    of q_pivot_status and the standard prep step before generic
    per-measure aggregation.  Values share one e2 fixed point so a
    single int64 value column carries all measures exactly.

    Scale shape: a stateless per-batch column explode (4x row
    replication, zero shuffle) followed by nothing — melt is
    embarrassingly parallel; the groupby here is only the per-measure
    count/sum summary that keeps the query output bounded."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber"] + UNPIVOT_COLS)

    def melt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = b["l_linenumber"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        names, vals = [], []
        for c in UNPIVOT_COLS:
            names.append(np.full(n, c, dtype=object))
            vals.append(scale_col(
                b[c].to_numpy(zero_copy_only=False), 100.0))
        return pa.table({
            "orderkey": np.tile(ok, len(UNPIVOT_COLS)),
            "linenumber": np.tile(ln, len(UNPIVOT_COLS)),
            "measure": pa.array(np.concatenate(names), pa.string()),
            "value_e2": np.concatenate(vals)})

    long = li.map_batches(melt, batch_format="pyarrow",
                          zero_copy_batch=True)
    return long.groupby("measure").aggregate(
        Count(alias_name="n_rows"),
        Sum("value_e2", alias_name="total_e2"),
        Min("value_e2", alias_name="min_e2"),
        Max("value_e2", alias_name="max_e2"))


def sql_unpivot() -> str:
    arms = " UNION ALL ".join(
        f"SELECT '{c}' AS measure, "
        f"CAST(floor({c}*100.0+0.5) AS BIGINT) AS v FROM lineitem"
        for c in UNPIVOT_COLS)
    return (
        f"WITH long AS ({arms}) "
        "SELECT measure, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(v) AS BIGINT) AS total_e2, "
        "CAST(min(v) AS BIGINT) AS min_e2, "
        "CAST(max(v) AS BIGINT) AS max_e2 "
        "FROM long GROUP BY measure")


# -------- l-diversity audit --------

LDIV_L = 3   # required distinct sensitive values per class


def q_l_diversity(sf_dir: str):
    """l-diversity audit (Machanavajjhala et al. ICDE 2006) — the
    extension of q_k_anonymity that catches the homogeneity attack
    k-anonymity misses: for each (nation, priority) quasi-identifier
    class, the number of DISTINCT sensitive values (order status)
    must be >= l, else the class leaks the sensitive attribute even
    when it is large.  Same join + groupby shape as the k-anonymity
    audit with a distinct-count aggregate: one join to attach the
    nation, one (class, status) dedup groupby, one class groupby."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey",
                                                   "c_nationkey"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority",
                                 "o_orderstatus"])
    j = orders.join(cust, join_type="inner", num_partitions=4,
                    on=("o_custkey",), right_on=("c_custkey",))
    # distinct sensitive values per class: dedup groupby then count
    dis = j.groupby(["c_nationkey", "o_orderpriority",
                     "o_orderstatus"]).aggregate(
        Count(alias_name="_n"))
    counts = dis.groupby(["c_nationkey", "o_orderpriority"]).aggregate(
        Count(alias_name="n_sensitive"),
        Sum("_n", alias_name="class_size"))

    def flag(b: pa.Table) -> pa.Table:
        ns = b["n_sensitive"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "nationkey": b["c_nationkey"].cast(pa.int64()),
            "o_orderpriority": b["o_orderpriority"],
            "class_size": b["class_size"].cast(pa.int64()),
            "n_sensitive": ns,
            "violates": (ns < LDIV_L).astype(np.int64)})

    return counts.map_batches(flag, batch_format="pyarrow")


def sql_l_diversity() -> str:
    return (
        "SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey, "
        "o.o_orderpriority, CAST(count(*) AS BIGINT) AS class_size, "
        "CAST(count(DISTINCT o.o_orderstatus) AS BIGINT) "
        "AS n_sensitive, "
        "CAST(CASE WHEN count(DISTINCT o.o_orderstatus) "
        f"< {LDIV_L} THEN 1 ELSE 0 END AS BIGINT) AS violates "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_nationkey, o.o_orderpriority")


# -------- seasonal-naive forecast backtest (MASE) --------

MASE_E6 = 1_000_000


def q_seasonal_naive(sf_dir: str):
    """Forecast backtest: the seasonal-naive model (y_hat(d) =
    y(d-7)) evaluated per event type over the LAST 7 days of daily
    event counts against the MASE yardstick's in-sample naive walk
    (y_hat(d) = y(d-1)) — the standard baseline every production
    forecast must beat (Hyndman-Koehler 2006), kept exact: both sums
    of absolute errors are integers, and the MASE ratio is the e6
    floor-division fixed point.  Days with no events count as zero
    via the densified day range (shared with the SQL oracle's
    generate_series).

    Scale shape: ONE (type, day) counting groupby; the per-type
    backtest joins the tiny (types x days) matrix to its own day-7
    and day-1 lags by key shift — O(types * days) rows end to end."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "etype": b["event_type"],
            "day": b["ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False) // DAY_US})

    per_day = ev.map_batches(pre, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["etype", "day"]).aggregate(Count(alias_name="n")) \
        .to_pandas()
    lo, hi = int(per_day["day"].min()), int(per_day["day"].max())
    days = np.arange(lo, hi + 1)
    types = sorted(per_day["etype"].unique())
    # dense (types x days) count matrix: tiny, the heavy count above
    # was the distributed part
    M = np.zeros((len(types), len(days)), np.int64)
    ti = {t: i for i, t in enumerate(types)}
    M[[ti[t] for t in per_day["etype"]],
      per_day["day"].to_numpy() - lo] = per_day["n"].to_numpy()
    test = days >= hi - 6
    # the oracle's INNER joins require BOTH lags (day-7 and day-1) to
    # exist inside the densified range — a test day with idx < 7 is
    # dropped from BOTH sums (negative indices would otherwise wrap)
    idx = np.nonzero(test)[0]
    idx = idx[idx >= 7]
    # all test days dropped -> the oracle's GROUP BY over an empty
    # join emits NO rows at all
    types = types if len(idx) else []
    rows = []
    for t in types:
        y = M[ti[t]]
        sae_s = int(np.abs(y[idx] - y[idx - 7]).sum())
        sae_n = int(np.abs(y[idx] - y[idx - 1]).sum())
        mase = (sae_s * MASE_E6 // sae_n) if sae_n > 0 else -1
        rows.append((t, sae_s, sae_n, mase))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "sae_seasonal": pa.array([r[1] for r in rows], pa.int64()),
        "sae_naive": pa.array([r[2] for r in rows], pa.int64()),
        "mase_e6": pa.array([r[3] for r in rows], pa.int64())})


def sql_seasonal_naive() -> str:
    return (
        "WITH e AS (SELECT event_type AS t, "
        f"CAST(epoch_us(ts) AS BIGINT) // {DAY_US} AS day FROM events), "
        "b AS (SELECT min(day) AS lo, max(day) AS hi FROM e), "
        "dn AS (SELECT t, day, count(*) AS n FROM e GROUP BY t, day), "
        "grid AS (SELECT ty.t, d.day FROM "
        "(SELECT DISTINCT t FROM e) ty, "
        "(SELECT unnest(generate_series((SELECT lo FROM b), "
        "(SELECT hi FROM b))) AS day) d), "
        "y AS (SELECT g.t, g.day, COALESCE(dn.n, 0) AS n FROM grid g "
        "LEFT JOIN dn ON dn.t = g.t AND dn.day = g.day), "
        "t7 AS (SELECT a.t, abs(a.n - s.n) AS es, abs(a.n - p.n) AS en "
        "FROM y a JOIN y s ON s.t = a.t AND s.day = a.day - 7 "
        "JOIN y p ON p.t = a.t AND p.day = a.day - 1 "
        "WHERE a.day >= (SELECT hi FROM b) - 6) "
        "SELECT t AS event_type, "
        "CAST(sum(es) AS BIGINT) AS sae_seasonal, "
        "CAST(sum(en) AS BIGINT) AS sae_naive, "
        "CAST(CASE WHEN sum(en) > 0 THEN "
        f"sum(es) * {MASE_E6} // sum(en) ELSE -1 END AS BIGINT) "
        "AS mase_e6 "
        "FROM t7 GROUP BY t")


# -------- OHLC candlestick aggregation --------

def q_ohlc_daily(sf_dir: str):
    """Daily OHLC (open / high / low / close) bars over event values —
    the first/last-value-per-bucket aggregation class (financial
    candlesticks, telemetry roll-ups): open = value of the first
    event of the day, close = value of the last ((ts, event_id)
    total order), high/low = max/min, all values in the e2 fixed
    point.

    Scale shape: ONE day groupby computes min/max/count directly and
    open/close WITHOUT a sort — each block contributes its candidate
    (packed (us, event_id) order key, value) pair and the groupby
    takes the min/max pack; the matching value rides in the low bits
    of a second packed column (order key << 20 | value index is
    avoided — instead two aggregates of PACKED (key, value) pairs
    where value occupies the low 21 bits, asserted < 2^21), so
    first/last-per-group costs the same as min/max."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_id", "value"])
    base = None

    def pre(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        v = scale_col(b["value"].to_numpy(zero_copy_only=False), 100.0)
        assert int(v.max(initial=0)) < (1 << 21) and int(v.min(initial=0)) >= 0
        day = us // DAY_US
        # order key: second-of-day (< 2^17) then event id (< 2^20) —
        # a deterministic total order (ids unique) that fits the pack
        okey = (us % DAY_US) // 1_000_000 << 20 | eid
        assert int(eid.max(initial=0)) < (1 << 20)
        pack = okey << 21 | v
        return pa.table({"day": day, "v": v, "pack": pack})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)
    agg = rows.groupby("day").aggregate(
        Min("pack", alias_name="first_pack"),
        Max("pack", alias_name="last_pack"),
        Min("v", alias_name="low_e2"),
        Max("v", alias_name="high_e2"),
        Count(alias_name="n_events"))

    def fin(b: pa.Table) -> pa.Table:
        m = (1 << 21) - 1
        return pa.table({
            "day": b["day"].cast(pa.int64()),
            "open_e2": pa.compute.bit_wise_and(b["first_pack"], m),
            "high_e2": b["high_e2"].cast(pa.int64()),
            "low_e2": b["low_e2"].cast(pa.int64()),
            "close_e2": pa.compute.bit_wise_and(b["last_pack"], m),
            "n_events": b["n_events"].cast(pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def sql_ohlc_daily() -> str:
    return (
        "WITH e AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS us, "
        "event_id AS eid, "
        "CAST(floor(value*100.0+0.5) AS BIGINT) AS v FROM events), "
        f"p AS (SELECT us // {DAY_US} AS day, v, "
        f"((us % {DAY_US}) // 1000000 << 20 | eid) << 21 | v "
        "AS pack FROM e) "
        "SELECT CAST(day AS BIGINT) AS day, "
        "CAST(min(pack) & ((1 << 21) - 1) AS BIGINT) AS open_e2, "
        "CAST(max(v) AS BIGINT) AS high_e2, "
        "CAST(min(v) AS BIGINT) AS low_e2, "
        "CAST(max(pack) & ((1 << 21) - 1) AS BIGINT) AS close_e2, "
        "CAST(count(*) AS BIGINT) AS n_events "
        "FROM p GROUP BY day")


# -------- RFM customer segmentation --------

RFM_K = 5


def q_rfm_segments(sf_dir: str):
    """RFM (recency / frequency / monetary) quintile segmentation —
    the classic customer-value census: per customer, days since
    last order, order count and total spend, each discretized into
    NTILE(5) bins ((rank-1)*k//n + 1, q_ntile_orders' exact SQL-NTILE
    reproduction; recency ranks ascending — most recent = bin 1 —
    frequency and monetary descending so bin 1 is always 'best'),
    composed into the 3-digit segment code 100r+10f+m.

    Scale shape: ONE per-customer groupby does all three aggregates
    (the only pass over the fact table); the three quintile ranks run
    on the O(customers) summary via the sorted-block rank carry, and
    the segment census is an O(125) groupby."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        return pa.table({"ck": b["o_custkey"].cast(pa.int64()),
                         "day": day,
                         "cents": scale_col(
                             b["o_totalprice"].to_numpy(
                                 zero_copy_only=False), 100.0)})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    maxday = int(rows.max("day"))
    per_c = rows.groupby("ck").aggregate(
        Max("day", alias_name="last_day"),
        Count(alias_name="freq"),
        Sum("cents", alias_name="mon")).materialize()
    n = per_c.count()

    cur = per_c.map_batches(
        lambda b: pa.table({
            "g": np.zeros(b.num_rows, np.int64),
            "ck": b["ck"].cast(pa.int64()),
            "rec": maxday - b["last_day"].to_numpy(zero_copy_only=False),
            "freq": b["freq"].cast(pa.int64()),
            "mon": b["mon"].cast(pa.int64())}),
        batch_format="pyarrow")
    specs = [("rec", False, "rb"), ("freq", True, "fb"),
             ("mon", True, "mb")]
    for col, desc, out in specs:
        ranked = rank_per_group(cur, key="g", order=[col, "ck"],
                                descending=[desc, False])
        cur = ranked.map_batches(
            lambda b, _o=out: pa.table(
                {**{c: b[c] for c in b.column_names if c != "rank"},
                 _o: (b["rank"].to_numpy(zero_copy_only=False) - 1)
                 * RFM_K // n + 1}),
            batch_format="pyarrow").materialize()

    return cur.map_batches(
        lambda b: pa.table({
            "segment": b["rb"].to_numpy(zero_copy_only=False) * 100
            + b["fb"].to_numpy(zero_copy_only=False) * 10
            + b["mb"].to_numpy(zero_copy_only=False),
            "one": np.ones(b.num_rows, np.int64)}),
        batch_format="pyarrow") \
        .groupby("segment").aggregate(Sum("one", alias_name="n_customers"))


def sql_rfm_segments() -> str:
    return (
        "WITH o AS (SELECT o_custkey AS ck, "
        f"CAST(epoch_us(o_orderdate) AS BIGINT) // {DAY_US} AS day, "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents "
        "FROM orders), "
        "c AS (SELECT ck, max(day) AS last_day, count(*) AS freq, "
        "sum(cents) AS mon FROM o GROUP BY ck), "
        "m AS (SELECT max(day) AS maxday FROM o), "
        "n AS (SELECT count(*) AS n FROM c), "
        "r AS (SELECT ck, "
        "row_number() OVER (ORDER BY (SELECT maxday FROM m) - last_day, "
        "ck) AS rr, "
        "row_number() OVER (ORDER BY freq DESC, ck) AS rf, "
        "row_number() OVER (ORDER BY mon DESC, ck) AS rm FROM c), "
        f"b AS (SELECT ((rr - 1) * {RFM_K} // (SELECT n FROM n) + 1) "
        "* 100 + "
        f"((rf - 1) * {RFM_K} // (SELECT n FROM n) + 1) * 10 + "
        f"((rm - 1) * {RFM_K} // (SELECT n FROM n) + 1) AS segment "
        "FROM r) "
        "SELECT CAST(segment AS BIGINT) AS segment, "
        "CAST(count(*) AS BIGINT) AS n_customers FROM b "
        "GROUP BY segment")


# -------- FIFO lot allocation (cost-of-goods matching) --------

def q_fifo_allocation(sf_dir: str):
    """FIFO inventory allocation: per part, 'purchase' lots (first
    half of the ship-date range) are consumed by 'sale' lots (second
    half) in strict first-in-first-out order, and the allocation
    matrix says how many units of each sale came from each purchase —
    the cost-of-goods-sold / lot-genealogy operator.  The sequential
    FIFO walk becomes PURE interval algebra: with per-part cumulative
    quantity intervals [cumQ_prev, cumQ) on both sides, sale s draws
    from purchase p exactly  overlap = max(0, min(hiP, hiS) -
    max(loP, loS))  units — no loop, no state.

    Scale shape: two cumulative prefix sums per part (ONE
    cumsum_per_key pass each — the (key, ts, id)-sorted block carry),
    one hash join on partkey (per-part groups are small; at depot
    scale the join key gains a cum-quantity bucket exactly like
    q_range_join), one vectorized overlap map, and a per-part summary
    groupby.  Quantities stay int64 end to end."""
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_orderkey", "l_linenumber",
                             "l_quantity", "l_shipdate"])

    def pre(b: pa.Table) -> pa.Table:
        us = b["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "pk": b["l_partkey"].cast(pa.int64()),
            "us": us,
            "lid": b["l_orderkey"].to_numpy(zero_copy_only=False)
            * 8 + b["l_linenumber"].to_numpy(zero_copy_only=False),
            "qty": b["l_quantity"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})

    rows = li.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    lo, hi = int(rows.min("us")), int(rows.max("us"))
    mid = (lo + hi) // 2

    def side(which: str):
        def f(b: pa.Table) -> pa.Table:
            us = b["us"].to_numpy(zero_copy_only=False)
            m = us <= mid if which == "p" else us > mid
            return pa.table({"key": b["pk"].to_numpy(
                zero_copy_only=False)[m], "us": us[m],
                "lid": b["lid"].to_numpy(zero_copy_only=False)[m],
                "val": b["qty"].to_numpy(zero_copy_only=False)[m]})
        return f

    def cum_iv(which: str, a: str):
        c = cumsum_per_key(
            rows.map_batches(side(which), batch_format="pyarrow",
                             zero_copy_batch=True),
            payload_cols=["lid", "val"], order_cols=("us", "lid"))
        return c.map_batches(
            lambda b: pa.table({
                f"pk_{a}": b["key"].cast(pa.int64()),
                f"lid_{a}": b["lid"].cast(pa.int64()),
                f"lo_{a}": b["cum_val"].to_numpy(zero_copy_only=False)
                - b["val"].to_numpy(zero_copy_only=False),
                f"hi_{a}": b["cum_val"].cast(pa.int64())}),
            batch_format="pyarrow")

    pur = cum_iv("p", "p")
    sal = cum_iv("s", "s")
    npj = 1 if rows.count() < 65_536 else 8
    j = pur.join(sal, join_type="inner", num_partitions=npj,
                 on=("pk_p",), right_on=("pk_s",))

    def alloc(b: pa.Table) -> pa.Table:
        lop = b["lo_p"].to_numpy(zero_copy_only=False)
        hip = b["hi_p"].to_numpy(zero_copy_only=False)
        los = b["lo_s"].to_numpy(zero_copy_only=False)
        his = b["hi_s"].to_numpy(zero_copy_only=False)
        ov = np.minimum(hip, his) - np.maximum(lop, los)
        m = ov > 0
        return pa.table({"pk": b["pk_p"].to_numpy(
            zero_copy_only=False)[m], "units": ov[m],
            "one": np.ones(int(m.sum()), np.int64)})

    return j.map_batches(alloc, batch_format="pyarrow") \
        .groupby("pk").aggregate(
            Sum("one", alias_name="n_allocations"),
            Sum("units", alias_name="units_matched")) \
        .rename_columns({"pk": "partkey"})


def sql_fifo_allocation() -> str:
    return (
        "WITH l AS (SELECT l_partkey AS pk, "
        "CAST(epoch_us(l_shipdate) AS BIGINT) AS us, "
        "l_orderkey * 8 + l_linenumber AS lid, "
        "CAST(l_quantity AS BIGINT) AS qty FROM lineitem), "
        "b AS (SELECT min(us) AS lo, max(us) AS hi FROM l), "
        "p AS (SELECT pk, lid, "
        "sum(qty) OVER w - qty AS lo_p, sum(qty) OVER w AS hi_p "
        "FROM l WHERE us <= ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 WINDOW w AS (PARTITION BY pk ORDER BY us, lid "
        "ROWS UNBOUNDED PRECEDING)), "
        "s AS (SELECT pk, lid, "
        "sum(qty) OVER w - qty AS lo_s, sum(qty) OVER w AS hi_s "
        "FROM l WHERE us > ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 WINDOW w AS (PARTITION BY pk ORDER BY us, lid "
        "ROWS UNBOUNDED PRECEDING)), "
        "a AS (SELECT p.pk, least(p.hi_p, s.hi_s) "
        "- greatest(p.lo_p, s.lo_s) AS units FROM p "
        "JOIN s ON s.pk = p.pk "
        "WHERE least(p.hi_p, s.hi_s) - greatest(p.lo_p, s.lo_s) > 0) "
        "SELECT CAST(pk AS BIGINT) AS partkey, "
        "CAST(count(*) AS BIGINT) AS n_allocations, "
        "CAST(sum(units) AS BIGINT) AS units_matched "
        "FROM a GROUP BY pk")


# -------- AS-OF snapshot (time travel) --------

def q_snapshot_asof(sf_dir: str):
    """Time-travel AS-OF snapshot: the state of every (user,
    event_type) dimension key at T = the midpoint of the event range
    — i.e. the latest observation at or before T under the
    (second-of-range, event_id) total order.  The query side of the
    CDC family: upsert_latest compacts to NOW, scd_intervals builds
    the full history, this reads one historical instant.

    Scale shape: a snapshot is ONE groupby-max of the PACKED (order
    key, value) int64 (q_ohlc_daily's first/last-as-minmax trick:
    rebased seconds < 2^22, event_id < 2^20, value_e2 < 2^21,
    asserted), so time travel costs exactly one combiner-friendly
    shuffle — no sort, no join, no window."""
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id",
                             "event_type", "value"])
    lo = int(ev.min("ts").timestamp() * 1_000_000) \
        if hasattr(ev.min("ts"), "timestamp") else int(ev.min("ts"))
    hi = int(ev.max("ts").timestamp() * 1_000_000) \
        if hasattr(ev.max("ts"), "timestamp") else int(ev.max("ts"))
    t_us = (lo + hi) // 2

    def pre(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = us <= t_us
        eid = b["event_id"].to_numpy(zero_copy_only=False)[m]
        v = scale_col(b["value"].to_numpy(zero_copy_only=False)[m],
                      100.0)
        sec = (us[m] - lo) // 1_000_000
        assert int(sec.max(initial=0)) < (1 << 22) \
            and int(eid.max(initial=0)) < (1 << 20) \
            and int(v.max(initial=0)) < (1 << 21) \
            and int(v.min(initial=0)) >= 0
        pack = (sec << 20 | eid) << 21 | v
        return pa.table({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False)[m]
            .astype(np.int64),
            "event_type": b["event_type"].filter(pa.array(m)),
            "pack": pack})

    agg = ev.map_batches(pre, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["user_id", "event_type"]).aggregate(
            Max("pack", alias_name="p"))
    return agg.map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "event_type": b["event_type"],
            "value_e2": pa.compute.bit_wise_and(b["p"],
                                                (1 << 21) - 1)}),
        batch_format="pyarrow")


def sql_snapshot_asof() -> str:
    return (
        "WITH b AS (SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS lo, "
        "CAST(epoch_us(max(ts)) AS BIGINT) AS hi FROM events), "
        "e AS (SELECT user_id, event_type, "
        "(((CAST(epoch_us(ts) AS BIGINT) - (SELECT lo FROM b)) "
        "// 1000000) << 20 | event_id) << 21 | "
        "CAST(floor(value*100.0+0.5) AS BIGINT) AS pack "
        "FROM events WHERE CAST(epoch_us(ts) AS BIGINT) <= "
        "((SELECT lo FROM b) + (SELECT hi FROM b)) // 2) "
        "SELECT CAST(user_id AS BIGINT) AS user_id, event_type, "
        "CAST(max(pack) & ((1 << 21) - 1) AS BIGINT) AS value_e2 "
        "FROM e GROUP BY user_id, event_type")


# -------- Shapley-value channel attribution --------

SHAP_CHANNELS = ["click", "error", "signup", "view"]  # bit order


def q_shapley_attribution(sf_dir: str):
    """Exact Shapley-value attribution (Shapley 1953, the
    cooperative-game sibling of q_attribution_u's positional rule):
    the characteristic function v(S) = number of converting users
    whose pre-conversion touched-channel set is contained in S, and
    each channel's credit is the exact Shapley sum over the 2^4
    channel subsets, scaled by 4! = 24 so every weight
    |S|!*(n-|S|-1)! is an integer — no probabilities, no floats.
    Sum over channels of shapley_x24 equals 24*(v(all) - v(empty)),
    the efficiency axiom, exactly.

    Scale shape: conversions and touches reuse the attribution_u
    join plan; the touched-set is ONE (user, channel) dedup groupby
    folded to a 4-bit mask by a second sum groupby (distinct bits, so
    sum == OR); the Shapley reduction runs on the <= 16-row mask
    census — all the combinatorics happen on O(2^n) driver rows."""
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"user": b["user_id"].cast(pa.int64()),
                         "us": b["ts"].cast(pa.int64()),
                         "eid": b["event_id"].cast(pa.int64()),
                         "etype": b["event_type"]})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    # join partitions follow the q_temporal_pairs convention: 1 below
    # 65k rows — each hash join spawns num_partitions aggregator
    # actors, and several concurrent joins deadlock a small CPU pool
    npj = 1 if rows.count() < 65_536 else 8
    pur = rows.filter(expr="etype == 'purchase'").materialize()
    g1 = pur.groupby("user").aggregate(Min("us", alias_name="cus"))
    j1 = pur.join(g1.rename_columns({"user": "user_g"}),
                  join_type="inner", num_partitions=npj,
                  on=("user",), right_on=("user_g",))
    conv = j1.filter(expr="us == cus") \
        .groupby("user").aggregate(Min("eid", alias_name="cid"),
                                   Min("us", alias_name="cus")) \
        .rename_columns({"user": "cuser"})

    touches = rows.filter(expr="etype != 'purchase'") \
        .join(conv, join_type="inner", num_partitions=npj,
              on=("user",), right_on=("cuser",))

    bit = {c: 1 << i for i, c in enumerate(SHAP_CHANNELS)}

    def to_bits(b: pa.Table) -> pa.Table:
        us = b["us"].to_numpy(zero_copy_only=False)
        eid = b["eid"].to_numpy(zero_copy_only=False)
        cus = b["cus"].to_numpy(zero_copy_only=False)
        cid = b["cid"].to_numpy(zero_copy_only=False)
        m = (us < cus) | ((us == cus) & (eid < cid))
        et = np.asarray(b["etype"].to_pylist(), dtype=object)[m]
        bits = np.array([bit[t] for t in et], np.int64) \
            if len(et) else np.empty(0, np.int64)
        return pa.table({"user": b["user"].to_numpy(
            zero_copy_only=False)[m], "b": bits})

    masks = touches.map_batches(to_bits, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .groupby(["user", "b"]).aggregate(Count(alias_name="_n")) \
        .groupby("user").aggregate(Sum("b", alias_name="mask"))
    cens = masks.groupby("mask").aggregate(
        Count(alias_name="n")).to_pandas()
    cnt = {int(m): int(n) for m, n in zip(cens["mask"], cens["n"])}
    # converting users with zero pre-conversion touches -> mask 0
    n_conv = conv.count()
    cnt[0] = cnt.get(0, 0) + n_conv - sum(cnt.values())

    def v(S: int) -> int:
        return sum(n for m, n in cnt.items() if m & ~S == 0)

    import math
    n = len(SHAP_CHANNELS)
    out = []
    for i, c in enumerate(SHAP_CHANNELS):
        others = [j for j in range(n) if j != i]
        phi = 0
        for sub in range(1 << (n - 1)):
            S = 0
            for k, j in enumerate(others):
                if sub >> k & 1:
                    S |= 1 << j
            sz = bin(sub).count("1")
            w = math.factorial(sz) * math.factorial(n - sz - 1)
            phi += w * (v(S | (1 << i)) - v(S))
        out.append((c, phi))
    return pa.table({
        "channel": pa.array([o[0] for o in out], pa.string()),
        "shapley_x24": pa.array([o[1] for o in out], pa.int64())})


def sql_shapley_attribution() -> str:
    import math
    n = len(SHAP_CHANNELS)
    bits = {c: 1 << i for i, c in enumerate(SHAP_CHANNELS)}
    bit_case = " ".join(
        f"WHEN '{c}' THEN {b}" for c, b in bits.items())
    base = (
        "e AS (SELECT user_id AS u, "
        "CAST(epoch_us(ts) AS BIGINT) AS us, event_id AS eid, "
        "event_type AS etype FROM events), "
        "c1 AS (SELECT u, min(us) AS cus FROM e "
        "WHERE etype = 'purchase' GROUP BY u), "
        "conv AS (SELECT e.u, min(e.eid) AS cid, min(e.us) AS cus "
        "FROM e JOIN c1 ON c1.u = e.u AND c1.cus = e.us "
        "WHERE e.etype = 'purchase' GROUP BY e.u), "
        "t AS (SELECT DISTINCT e.u, "
        f"CASE e.etype {bit_case} ELSE 0 END AS b FROM e "
        "JOIN conv ON conv.u = e.u WHERE e.etype <> 'purchase' "
        "AND (e.us < conv.cus OR (e.us = conv.cus "
        "AND e.eid < conv.cid))), "
        "mk AS (SELECT conv.u, COALESCE(tm.mask, 0) AS mask FROM conv "
        "LEFT JOIN (SELECT u, sum(b) AS mask FROM t GROUP BY u) tm "
        "ON tm.u = conv.u), "
        "cnt AS MATERIALIZED (SELECT mask, count(*) AS n FROM mk "
        "GROUP BY mask)")
    def v_expr(S: int) -> str:
        return (f"(SELECT COALESCE(sum(n), 0) FROM cnt "
                f"WHERE mask & {(~S) & ((1 << n) - 1)} = 0)")
    selects = []
    for i, c in enumerate(SHAP_CHANNELS):
        others = [j for j in range(n) if j != i]
        terms = []
        for sub in range(1 << (n - 1)):
            S = 0
            for k, j in enumerate(others):
                if sub >> k & 1:
                    S |= 1 << j
            sz = bin(sub).count("1")
            w = math.factorial(sz) * math.factorial(n - sz - 1)
            terms.append(f"{w} * ({v_expr(S | (1 << i))} - {v_expr(S)})")
        selects.append(
            f"SELECT '{c}' AS channel, "
            f"CAST({' + '.join(terms)} AS BIGINT) AS shapley_x24")
    return f"WITH {base} {' UNION ALL '.join(selects)}"


# -------- universe (join-consistent) sampling --------

UNIV_MOD = 8   # 1/8 universe sample on the customer key


def q_universe_sample(sf_dir: str):
    """Universe sampling (the join-consistent sampling of BlinkDB /
    Quickr): sample the KEY universe — customers with
    custkey mod 8 == 0 — and take every orders row of a sampled
    customer, so joins on the sampled key stay unbiased (per-row
    Bernoulli sampling would quadratically thin join results).  The
    query reports revenue per order priority on the sample, the x8
    scale-up estimate, and the exact answer side by side — the
    approximate-query-processing audit.

    Scale shape: the sample predicate is a stateless hash filter
    (NO coordination — any table sharing the key samples
    consistently); one groupby each for sample and exact."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority",
                                 "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        cents = scale_col(b["o_totalprice"].to_numpy(
            zero_copy_only=False), 100.0)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        ins = (ck % UNIV_MOD == 0).astype(np.int64)
        return pa.table({"prio": b["o_orderpriority"],
                         "cents": cents,
                         "s_cents": cents * ins,
                         "s_n": ins})

    agg = orders.map_batches(pre, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("prio").aggregate(
            Sum("cents", alias_name="exact_e2"),
            Count(alias_name="n_exact"),
            Sum("s_cents", alias_name="sample_e2"),
            Sum("s_n", alias_name="n_sample"))

    def est(b: pa.Table) -> pa.Table:
        return pa.table({
            "prio": b["prio"],
            "n_exact": b["n_exact"].cast(pa.int64()),
            "n_sample": b["n_sample"].cast(pa.int64()),
            "exact_e2": b["exact_e2"].cast(pa.int64()),
            "estimate_e2": b["sample_e2"].to_numpy(
                zero_copy_only=False) * UNIV_MOD})

    return agg.map_batches(est, batch_format="pyarrow")


def sql_universe_sample() -> str:
    return (
        "WITH o AS (SELECT o_orderpriority AS prio, "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents, "
        f"CASE WHEN o_custkey % {UNIV_MOD} = 0 THEN 1 ELSE 0 END AS ins "
        "FROM orders) "
        "SELECT prio, CAST(count(*) AS BIGINT) AS n_exact, "
        "CAST(sum(ins) AS BIGINT) AS n_sample, "
        "CAST(sum(cents) AS BIGINT) AS exact_e2, "
        f"CAST(sum(cents * ins) * {UNIV_MOD} AS BIGINT) AS estimate_e2 "
        "FROM o GROUP BY prio")


# -------- difference-in-differences --------

DID_E2 = 100


def q_diff_in_diff(sf_dir: str):
    """Difference-in-differences estimate — the panel causal-
    inference workhorse: treatment group = customers of even nations,
    periods = the two order-date halves, outcome = mean order total.
    DiD = (treat_post - treat_pre) - (ctrl_post - ctrl_pre), each
    cell mean computed as the overflow-free divmod fixed point
    (sum // n) * 100 + ((sum % n) * 100) // n (the q_decision_stump
    identity) so the estimate is bit-identical across engines, with
    the four exact (sum, n) cells alongside for auditability.

    Scale shape: ONE pass assigns (group, period) flags vectorized,
    one 4-cell groupby-sum; the DiD arithmetic is O(1) driver work on
    the four cells."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey"])
    j = orders.join(cust, join_type="inner", num_partitions=4,
                    on=("o_custkey",), right_on=("c_custkey",))

    def pre(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        return pa.table({
            "treat": (b["c_nationkey"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % 2 == 0).astype(np.int64),
            "day": day,
            "cents": scale_col(b["o_totalprice"].to_numpy(
                zero_copy_only=False), 100.0)})

    rows = j.map_batches(pre, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    lo, hi = int(rows.min("day")), int(rows.max("day"))
    mid = (lo + hi) // 2
    cells = rows.map_batches(
        lambda b: pa.table({
            "treat": b["treat"],
            "post": (b["day"].to_numpy(zero_copy_only=False)
                     > mid).astype(np.int64),
            "cents": b["cents"]}),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["treat", "post"]).aggregate(
            Sum("cents", alias_name="s"),
            Count(alias_name="n")).to_pandas()

    def mean_e2(s: int, n: int) -> int:
        return (s // n) * DID_E2 + ((s % n) * DID_E2) // n

    m = {}
    for _, row in cells.iterrows():
        m[(int(row["treat"]), int(row["post"]))] = mean_e2(
            int(row["s"]), int(row["n"]))
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    out = {"did_e4": pa.array([did], pa.int64())}
    for (t, p), label in [((0, 0), "ctrl_pre"), ((0, 1), "ctrl_post"),
                          ((1, 0), "treat_pre"), ((1, 1), "treat_post")]:
        out[f"mean_{label}_e4"] = pa.array([m[(t, p)]], pa.int64())
    return pa.table(out)


def sql_diff_in_diff() -> str:
    cell = ("SELECT CASE WHEN c.c_nationkey % 2 = 0 THEN 1 ELSE 0 END "
            "AS treat, CASE WHEN "
            f"CAST(epoch_us(o.o_orderdate) AS BIGINT) // {DAY_US} > "
            "(SELECT (min(CAST(epoch_us(o_orderdate) AS BIGINT) "
            f"// {DAY_US}) + max(CAST(epoch_us(o_orderdate) AS BIGINT) "
            f"// {DAY_US})) // 2 FROM orders) THEN 1 ELSE 0 END AS post, "
            "CAST(floor(o.o_totalprice*100.0+0.5) AS BIGINT) AS cents "
            "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey")
    mean = (f"(s // n) * {DID_E2} + ((s % n) * {DID_E2}) // n")
    return (
        f"WITH r AS ({cell}), "
        "g AS (SELECT treat, post, CAST(sum(cents) AS BIGINT) AS s, "
        "CAST(count(*) AS BIGINT) AS n FROM r GROUP BY treat, post), "
        f"mm AS (SELECT treat, post, {mean} AS m FROM g) "
        "SELECT CAST(((SELECT m FROM mm WHERE treat=1 AND post=1) - "
        "(SELECT m FROM mm WHERE treat=1 AND post=0)) - "
        "((SELECT m FROM mm WHERE treat=0 AND post=1) - "
        "(SELECT m FROM mm WHERE treat=0 AND post=0)) AS BIGINT) "
        "AS did_e4, "
        "(SELECT CAST(m AS BIGINT) FROM mm WHERE treat=0 AND post=0) "
        "AS mean_ctrl_pre_e4, "
        "(SELECT CAST(m AS BIGINT) FROM mm WHERE treat=0 AND post=1) "
        "AS mean_ctrl_post_e4, "
        "(SELECT CAST(m AS BIGINT) FROM mm WHERE treat=1 AND post=0) "
        "AS mean_treat_pre_e4, "
        "(SELECT CAST(m AS BIGINT) FROM mm WHERE treat=1 AND post=1) "
        "AS mean_treat_post_e4")


# -------- per-column table profiler --------

PROFILE_COLS = [
    ("o_orderkey", "int"), ("o_custkey", "int"),
    ("o_orderstatus", "str"), ("o_totalprice", "e2"),
    ("o_orderpriority", "str")]


def q_profile_table(sf_dir: str):
    """Column-level profiling of the orders table — the Deequ /
    dbt-docs data-profiling operator: per column, row count, null
    count, exact distinct count, and a numeric (lo, hi) facet —
    values for integer columns, e2 cents for decimals, LENGTHS for
    strings (string min/max themselves are collation-dependent;
    lengths are engine-neutral).

    Scale shape: profiling is inherently per-column — each column
    gets one select + one distinct-count groupby over only that
    column (columnar reads make this cheap; the five passes share
    nothing and pipeline through the executor concurrently)."""
    rows = []
    for col, kind in PROFILE_COLS:
        ds = read_table(sf_dir, "orders", columns=[col])

        # nulls are EXCLUDED from min/max/distinct (SQL semantics) but
        # counted exactly: one projection ships the NON-NULL facet
        # values + keys for the distinct groupby, a second reduces
        # each batch to ONE summary row of (rows, nulls) partials —
        # exact for partial-null and all-null batches alike
        def _facet_v(arr: pa.ChunkedArray, _k: str) -> np.ndarray:
            valid = ~np.asarray(
                pc.is_null(arr).to_numpy(zero_copy_only=False), bool)
            if _k == "int":
                return arr.to_numpy(zero_copy_only=False)[valid] \
                    .astype(np.int64)
            if _k == "e2":
                return scale_col(
                    arr.to_numpy(zero_copy_only=False)[valid], 100.0)
            return np.asarray(
                [len(x) for x, ok in zip(arr.to_pylist(), valid)
                 if ok], np.int64)

        def vals(b: pa.Table, _c=col, _k=kind) -> pa.Table:
            v = _facet_v(b[_c], _k)
            # distinct-count key: the VALUE itself (for strings the
            # lo/hi facet is the length, but distinctness is real)
            k = b[_c].drop_null().cast(pa.string()) if _k == "str" \
                else pa.array(v)
            return pa.table({"v": pa.array(v, pa.int64()), "k": k})

        def summ(b: pa.Table, _c=col) -> pa.Table:
            nn = int(pc.count(b[_c], mode="only_null").as_py())
            return pa.table({"rows": pa.array([len(b)], pa.int64()),
                             "null": pa.array([nn], pa.int64())})

        proj = ds.map_batches(vals, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
        cnts = ds.map_batches(summ, batch_format="pyarrow",
                              zero_copy_batch=True)
        n = int(cnts.sum("rows") or 0)
        n_null = int(cnts.sum("null") or 0)
        lo, hi = int(proj.min("v")), int(proj.max("v"))
        nd = proj.groupby("k").aggregate(Count(alias_name="_n")).count()
        rows.append((col, n, n_null, nd, lo, hi))
    return pa.table({
        "column": pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "n_null": pa.array([r[2] for r in rows], pa.int64()),
        "n_distinct": pa.array([r[3] for r in rows], pa.int64()),
        "lo": pa.array([r[4] for r in rows], pa.int64()),
        "hi": pa.array([r[5] for r in rows], pa.int64())})


def sql_profile_table() -> str:
    sels = []
    for col, kind in PROFILE_COLS:
        if kind == "int":
            ex = f"CAST({col} AS BIGINT)"
        elif kind == "e2":
            ex = f"CAST(floor({col}*100.0+0.5) AS BIGINT)"
        else:
            ex = f"CAST(length({col}) AS BIGINT)"
        sels.append(
            f"SELECT '{col}' AS \"column\", "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(*) - count({col}) AS BIGINT) AS n_null, "
            f"CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct, "
            f"CAST(min({ex}) AS BIGINT) AS lo, "
            f"CAST(max({ex}) AS BIGINT) AS hi FROM orders")
    return " UNION ALL ".join(sels)


# -------- running-peak max drawdown --------

def q_max_drawdown(sf_dir: str):
    """Per-user maximum drawdown of the signed running balance
    (credits = event value, debits = 'error' events) — the
    high-watermark risk statistic: max over time of (running peak -
    current balance), exact in e2 cents.  The balance is the per-user
    prefix SUM, the peak its per-user prefix MAX — both computed by
    the sorted-block carry stages (stages/temporal.cumsum_per_key and
    the new cummax_per_key sibling), so the whole query is two
    sorts + two O(1)-per-boundary scans + one groupby, no windows on
    a driver.

    The (us, event_id) order is total, shared with the SQL oracle's
    window ORDER BY."""
    from igpm_pem_ray.stages.temporal import cummax_per_key, cumsum_per_key

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id",
                             "event_type", "value"])

    def pre(b: pa.Table) -> pa.Table:
        v = scale_col(b["value"].to_numpy(zero_copy_only=False), 100.0)
        et = np.asarray(b["event_type"].to_pylist(), dtype=object)
        sv = np.where(et == "error", -v, v)
        return pa.table({"key": b["user_id"].cast(pa.int64()),
                         "us": b["ts"].cast(pa.int64()),
                         "eid": b["event_id"].cast(pa.int64()),
                         "val": sv})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)
    bal = cumsum_per_key(rows, payload_cols=["eid"],
                         order_cols=("us", "eid"))
    peak_in = bal.map_batches(
        lambda b: pa.table({"key": b["key"], "us": b["us"],
                            "eid": b["eid"],
                            "bal": b["cum_val"],
                            "val": b["cum_val"]}),
        batch_format="pyarrow")
    pk = cummax_per_key(peak_in, payload_cols=["eid", "bal"],
                        order_cols=("us", "eid"))

    def dd(b: pa.Table) -> pa.Table:
        bal_ = b["bal"].to_numpy(zero_copy_only=False)
        peak = b["cum_max"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b["key"].cast(pa.int64()),
                         "d": peak - bal_,
                         "p": peak})

    return pk.map_batches(dd, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Max("d", alias_name="max_drawdown_e2"),
            Max("p", alias_name="peak_e2"))


def sql_max_drawdown() -> str:
    return (
        "WITH e AS (SELECT user_id AS u, "
        "CAST(epoch_us(ts) AS BIGINT) AS us, event_id AS eid, "
        "CASE WHEN event_type = 'error' THEN "
        "-CAST(floor(value*100.0+0.5) AS BIGINT) "
        "ELSE CAST(floor(value*100.0+0.5) AS BIGINT) END AS sv "
        "FROM events), "
        "c AS (SELECT u, us, eid, sum(sv) OVER w AS bal FROM e "
        "WINDOW w AS (PARTITION BY u ORDER BY us, eid "
        "ROWS UNBOUNDED PRECEDING)), "
        "m AS (SELECT u, bal, max(bal) OVER w AS peak FROM c "
        "WINDOW w AS (PARTITION BY u ORDER BY us, eid "
        "ROWS UNBOUNDED PRECEDING)) "
        "SELECT CAST(u AS BIGINT) AS user_id, "
        "CAST(max(peak - bal) AS BIGINT) AS max_drawdown_e2, "
        "CAST(max(peak) AS BIGINT) AS peak_e2 FROM m GROUP BY u")


# -------- referential-integrity audit --------

RI_FKS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def q_ri_audit(sf_dir: str):
    """Referential-integrity audit of every foreign-key edge in the
    star schema: per FK, child row count, orphan count (child keys
    with no parent), and distinct orphan keys — the constraint-
    validation sweep warehouses run after every load (the FK side of
    q_dq_checks' column rules).

    Scale shape: each parent key set ships ONCE via ray.put and the
    child side checks membership with a vectorized np.isin inside
    map_batches — a broadcast anti-join, no shuffle (the repo's
    small-side convention; a parent too big to broadcast flips to
    the q_anti_join hash plan).  Parents here are dimension tables;
    the fact-side scan is the only full pass."""
    import ray as _ray

    rows = []
    for child, ck, parent, pk in RI_FKS:
        par = read_table(sf_dir, parent, columns=[pk]).to_pandas()
        keys = np.sort(par[pk].to_numpy().astype(np.int64))
        ref = _ray.put(keys)

        def check(b: pa.Table, _ref=ref, _ck=ck) -> pa.Table:
            ks = _ray.get(_ref)
            v = b[_ck].to_numpy(zero_copy_only=False).astype(np.int64)
            orphan = ~np.isin(v, ks)
            if orphan.any():
                u = np.unique(v[orphan])
            else:
                u = np.empty(0, np.int64)
            return pa.table({
                "n": pa.array([len(v)], pa.int64()),
                "n_orphan": pa.array([int(orphan.sum())], pa.int64()),
                "keys": pa.array([u.tolist()],
                                 pa.list_(pa.int64()))})

        part = read_table(sf_dir, child, columns=[ck]) \
            .map_batches(check, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
        n = int(part["n"].sum())
        n_orph = int(part["n_orphan"].sum())
        dist = len(np.unique(np.concatenate(
            [np.asarray(x, np.int64) for x in part["keys"]]))) \
            if n_orph else 0
        rows.append((f"{child}.{ck}->{parent}.{pk}", n, n_orph, dist))
    return pa.table({
        "fk": pa.array([r[0] for r in rows], pa.string()),
        "n_child_rows": pa.array([r[1] for r in rows], pa.int64()),
        "n_orphans": pa.array([r[2] for r in rows], pa.int64()),
        "n_orphan_keys": pa.array([r[3] for r in rows], pa.int64())})


def sql_ri_audit() -> str:
    sels = []
    for child, ck, parent, pk in RI_FKS:
        sels.append(
            f"SELECT '{child}.{ck}->{parent}.{pk}' AS fk, "
            f"CAST(count(*) AS BIGINT) AS n_child_rows, "
            f"CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_orphans, "
            f"CAST(count(DISTINCT CASE WHEN p.{pk} IS NULL "
            f"THEN c.{ck} END) AS BIGINT) AS n_orphan_keys "
            f"FROM {child} c LEFT JOIN {parent} p ON p.{pk} = c.{ck}")
    return " UNION ALL ".join(sels)


# -------- systematic sampling --------

SYS_K = 10   # take every K-th row of the sorted order


def q_systematic_sample(sf_dir: str):
    """Systematic (every K-th) sampling of orders in (totalprice,
    orderkey) sorted order — the equal-spacing design survey
    statistics prefers over Bernoulli when the sort key correlates
    with the measure (it stratifies implicitly).  Global 1-based
    ranks come from the sorted-block rank carry; the K-th predicate
    is a stateless map; the output summary proves the spacing
    (count, sum) without shipping the sample.

    Completes the sampling family: Bernoulli (q_sample), weighted
    (q_weighted_sample), stratified, universe (q_universe_sample),
    half-sample replicates — this is the ordered design."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"g": np.zeros(b.num_rows, np.int64),
                         "cents": scale_col(
                             b["o_totalprice"].to_numpy(
                                 zero_copy_only=False), 100.0),
                         "okey": b["o_orderkey"].cast(pa.int64())})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True)
    ranked = rank_per_group(rows, key="g", order=["cents", "okey"],
                            descending=[False, False])

    def pick(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False)
        m = r % SYS_K == 0
        return pa.table({"okey": b["okey"].to_numpy(
            zero_copy_only=False)[m],
            "cents": b["cents"].to_numpy(zero_copy_only=False)[m]})

    sam = ranked.map_batches(pick, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    return pa.table({
        "n_sample": pa.array([sam.count()], pa.int64()),
        "sum_e2": pa.array([int(sam.sum("cents") or 0)], pa.int64()),
        "min_okey": pa.array([int(sam.min("okey"))], pa.int64()),
        "max_okey": pa.array([int(sam.max("okey"))], pa.int64())})


def sql_systematic_sample() -> str:
    return (
        "WITH o AS (SELECT o_orderkey AS okey, "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents "
        "FROM orders), "
        "r AS (SELECT okey, cents, row_number() OVER "
        "(ORDER BY cents, okey) AS rk FROM o), "
        f"s AS (SELECT * FROM r WHERE rk % {SYS_K} = 0) "
        "SELECT CAST(count(*) AS BIGINT) AS n_sample, "
        "CAST(sum(cents) AS BIGINT) AS sum_e2, "
        "CAST(min(okey) AS BIGINT) AS min_okey, "
        "CAST(max(okey) AS BIGINT) AS max_okey FROM s")


# -------- exact higher-moment sums (skewness/kurtosis inputs) --------

def q_moments_quantity(sf_dir: str):
    """Exact raw-moment sums S1..S4 of lineitem quantity per return
    flag — the sufficient statistics for skewness and kurtosis, kept
    as INTEGER sums (quantity <= 50, so x^4 <= 6.25e6 and the sums
    stay well inside int64 at any scale factor) the way q_group_stats
    keeps the variance moments: the float skew/kurt derive downstream
    with no cross-engine ulp exposure.  ONE pass, one groupby — the
    distributed-moments pattern (parallel Welford's raw-sum form)."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity"])

    def pre(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"flag": b["l_returnflag"],
                         "s1": q, "s2": q * q, "s3": q * q * q,
                         "s4": q * q * q * q})

    return li.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("flag").aggregate(
            Count(alias_name="n"),
            Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"),
            Sum("s3", alias_name="s3"), Sum("s4", alias_name="s4"))


def sql_moments_quantity() -> str:
    return (
        "SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1, "
        "CAST(sum(CAST(l_quantity AS BIGINT)**2) AS BIGINT) AS s2, "
        "CAST(sum(CAST(l_quantity AS BIGINT)**3) AS BIGINT) AS s3, "
        "CAST(sum(CAST(l_quantity AS BIGINT)**4) AS BIGINT) AS s4 "
        "FROM lineitem GROUP BY l_returnflag")


# -------- one-to-many nesting (document building) --------

def nest_per_key(ds, *, key: str, order: list[str],
                 pack_cols: list[str]):
    """Collect each key's rows (in ``order``) into LIST columns — the
    one-to-many nesting operator behind document export (orders with
    their line items as nested arrays, pages with their links).
    Plan: one sort by (key, *order); each sorted block packs its
    complete key runs vectorized (np.split on run boundaries); the
    single possibly-split run at each block edge is repaired by ONE
    tiny boundary pass over the O(blocks) first/last fragments — the
    sorted-block-carry pattern of rank_per_group/cumsum_per_key
    applied to list building.  Returns (key, <col>_list ...,
    n_items)."""
    import ray as _ray

    srt = ds.sort([key, *order]).materialize()
    refs = srt.to_arrow_refs()
    if not refs:
        return rd.from_arrow(pa.table({key: pa.array([], pa.int64())}))

    @_ray.remote(num_returns=2)
    def pack_block(tbl: pa.Table):
        n = tbl.num_rows
        empty = pa.table({
            key: pa.array([], pa.int64()),
            **{f"{c}_list": pa.array([], pa.list_(pa.int64()))
               for c in pack_cols},
            "n_items": pa.array([], pa.int64())})
        if n == 0:
            return empty, None
        k = tbl[key].to_numpy(zero_copy_only=False)
        new_run = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new_run)
        # interior runs = complete; first and last run go to the
        # boundary pass (they may continue in neighbor blocks)
        cols = {c: tbl[c].to_numpy(zero_copy_only=False)
                for c in pack_cols}
        first_end = starts[1] if len(starts) > 1 else n
        last_start = starts[-1]
        inner = {}
        if len(starts) > 2:
            mids = starts[1:-1]
            bounds = np.r_[mids, last_start]
            inner[key] = k[mids].astype(np.int64)
            for c in pack_cols:
                inner[f"{c}_list"] = [
                    cols[c][bounds[i]:bounds[i + 1]].tolist()
                    for i in range(len(mids))]
            inner["n_items"] = (bounds[1:] - bounds[:-1]).astype(np.int64)
            inner_t = pa.table({
                key: pa.array(inner[key]),
                **{f"{c}_list": pa.array(inner[f"{c}_list"],
                                         pa.list_(pa.int64()))
                   for c in pack_cols},
                "n_items": pa.array(inner["n_items"])})
        else:
            inner_t = pa.table({
                key: pa.array([], pa.int64()),
                **{f"{c}_list": pa.array([], pa.list_(pa.int64()))
                   for c in pack_cols},
                "n_items": pa.array([], pa.int64())})
        edge = {
            "first_key": int(k[0]),
            "first": {c: cols[c][:first_end].tolist()
                      for c in pack_cols},
            "last_key": int(k[-1]),
            "last": {c: cols[c][last_start:].tolist()
                     for c in pack_cols},
            "one_run": bool(len(starts) == 1),
        }
        return inner_t, edge

    parts = [pack_block.remote(r) for r in refs]
    inner_tables = [p[0] for p in parts]
    edges = _ray.get([p[1] for p in parts])

    # boundary repair: stitch fragments of runs split across blocks
    frag_rows = []
    cur_key, cur = None, None
    for e in edges:
        if e is None:
            continue
        segs = ([(e["first_key"], e["first"])]
                if e["one_run"]
                else [(e["first_key"], e["first"]),
                      (e["last_key"], e["last"])])
        for kk, data in segs:
            if cur_key is not None and kk == cur_key:
                for c in pack_cols:
                    cur[c].extend(data[c])
            else:
                if cur_key is not None:
                    frag_rows.append((cur_key, cur))
                cur_key, cur = kk, {c: list(data[c])
                                    for c in pack_cols}
    if cur_key is not None:
        frag_rows.append((cur_key, cur))
    frag_t = pa.table({
        key: pa.array([r[0] for r in frag_rows], pa.int64()),
        **{f"{c}_list": pa.array([r[1][c] for r in frag_rows],
                                 pa.list_(pa.int64()))
           for c in pack_cols},
        "n_items": pa.array([len(r[1][pack_cols[0]])
                             for r in frag_rows], pa.int64())})
    out = rd.from_arrow_refs(inner_tables)
    return out.union(rd.from_arrow(frag_t))


def q_nest_orders(sf_dir: str):
    """Order documents: each order's line items nested as list
    columns (linenumber, quantity) in line order — the one-to-many
    document-building export (q_unpivot's inverse direction).  The
    SQL-hashable surface is the per-order summary (n_items, checksum
    of the packed quantities with positional weights, so ORDER inside
    the list is verified, not just membership)."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "okey": b["l_orderkey"].cast(pa.int64()),
            "ln": b["l_linenumber"].cast(pa.int64()),
            "qty": b["l_quantity"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})

    rows = li.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)
    # (okey, ln) is NOT unique in the synthetic lineitem — qty joins
    # the order key so the within-list order is total (equal (ln,
    # qty) rows are interchangeable for the checksum)
    nested = nest_per_key(rows, key="okey", order=["ln", "qty"],
                          pack_cols=["ln", "qty"])

    def summ(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        ck = []
        for lst in b["qty_list"].to_pylist():
            a = np.asarray(lst, np.int64)
            ck.append(int(((np.arange(len(a)) + 1) * a).sum()))
        return pa.table({"orderkey": b["okey"].cast(pa.int64()),
                         "n_items": b["n_items"].cast(pa.int64()),
                         "qty_checksum": pa.array(ck, pa.int64())})

    return nested.map_batches(summ, batch_format="pyarrow")


def sql_nest_orders() -> str:
    return (
        "WITH l AS (SELECT l_orderkey AS okey, l_linenumber AS ln, "
        "CAST(l_quantity AS BIGINT) AS qty FROM lineitem), "
        "r AS (SELECT okey, qty, row_number() OVER "
        "(PARTITION BY okey ORDER BY ln, qty) AS pos FROM l) "
        "SELECT CAST(okey AS BIGINT) AS orderkey, "
        "CAST(count(*) AS BIGINT) AS n_items, "
        "CAST(sum(pos * qty) AS BIGINT) AS qty_checksum "
        "FROM r GROUP BY okey")


# -------- sequence pattern matching (MATCH_RECOGNIZE analog) --------

SEQ_PATTERNS = [
    ("click_views_purchase", "cv+p"),
    ("signup_then_purchase", "s[cve]*p"),
    ("error_retry_error", "e[cvs]?e"),
]


def q_seq_match(sf_dir: str):
    """Row-pattern matching over event sequences — the
    MATCH_RECOGNIZE / complex-event-processing class: each user's
    events in (ts, event_id) order become a symbol string (first
    letter of the event type), and each registered regex pattern is
    counted per user with standard non-overlapping leftmost
    semantics (identical in Python re and DuckDB's RE2 for these
    patterns — alternation-free, greedy quantifiers).

    Scale shape: the ordered symbol string per user comes from the
    one-to-many nesting stage (nest_per_key — one sort + boundary
    repair, no window state); pattern scanning is then a stateless
    per-user map over strings whose lengths are bounded by per-user
    event counts.  Output: per pattern, matching-user count and
    total match count."""
    import re as _re
    from igpm_pem_ray.stages.temporal import cumsum_per_key  # noqa: F401

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])

    def pre(b: pa.Table) -> pa.Table:
        et = np.asarray(
            [t[0] for t in b["event_type"].to_pylist()], dtype=object)
        # symbol = first letter, encoded as its byte so the nested
        # list stays int64 (nest_per_key packs int64 columns)
        sym = np.asarray([ord(c) for c in et], np.int64)
        return pa.table({"okey": b["user_id"].cast(pa.int64()),
                         "us": b["ts"].cast(pa.int64()),
                         "eid": b["event_id"].cast(pa.int64()),
                         "sym": sym})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)
    nested = nest_per_key(rows, key="okey", order=["us", "eid"],
                          pack_cols=["sym"])
    pats = [(name, _re.compile(rx)) for name, rx in SEQ_PATTERNS]

    def scan(b: pa.Table) -> pa.Table:
        names, users, matches = [], [], []
        for lst in b["sym_list"].to_pylist():
            s = "".join(chr(x) for x in lst)
            for name, rx in pats:
                m = len(rx.findall(s))
                names.append(name)
                users.append(1 if m else 0)
                matches.append(m)
        return pa.table({"pattern": pa.array(names, pa.string()),
                         "u": pa.array(users, pa.int64()),
                         "m": pa.array(matches, pa.int64())})

    return nested.map_batches(scan, batch_format="pyarrow") \
        .groupby("pattern").aggregate(
            Sum("u", alias_name="n_users_matched"),
            Sum("m", alias_name="n_matches"))


def sql_seq_match() -> str:
    seq = ("WITH s AS (SELECT user_id, "
           "string_agg(substr(event_type, 1, 1), '' "
           "ORDER BY epoch_us(ts), event_id) AS seq "
           "FROM events GROUP BY user_id)")
    sels = []
    for name, rx in SEQ_PATTERNS:
        sels.append(
            f"SELECT '{name}' AS pattern, "
            "CAST(sum(CASE WHEN len(regexp_extract_all(seq, "
            f"'{rx}')) > 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_users_matched, "
            f"CAST(sum(len(regexp_extract_all(seq, '{rx}'))) "
            "AS BIGINT) AS n_matches FROM s")
    return f"{seq} {' UNION ALL '.join(sels)}"


# -------- columnar encoding advisor --------

ENC_COLS = ["l_orderkey", "l_partkey", "l_quantity"]


def q_encoding_advisor(sf_dir: str):
    """Storage-layout encoding advisor — the write-path optimization
    every columnar store runs per column chunk: in physical row
    order, count value RUNS (RLE viability), the maximum absolute
    successive DELTA (delta-encoding width), and exact distinct
    counts (dictionary viability), then recommend rle / delta /
    dict / plain by the same deterministic rule in both engines.

    Scale shape: runs and deltas are per-block vectorized diffs plus
    an O(blocks) boundary stitch (each block ships only its first
    and last value — the sorted-block-carry pattern applied to
    PHYSICAL order, no sort at all since file order is the layout
    being measured); distinct counts are one groupby per column."""
    import ray as _ray

    rows = []
    for col in ENC_COLS:
        ds = read_table(sf_dir, "lineitem", columns=[col]).materialize()

        @_ray.remote
        def block_stats(t: pa.Table, _c=col):
            v = t[_c].to_numpy(zero_copy_only=False).astype(np.int64)
            if not len(v):
                return None
            d = np.abs(np.diff(v))
            return {"n": len(v), "runs": int((np.diff(v) != 0).sum()) + 1,
                    "maxd": int(d.max()) if len(d) else 0,
                    "first": int(v[0]), "last": int(v[-1])}

        parts = [s for s in _ray.get(
            [block_stats.remote(r) for r in ds.to_arrow_refs()])
            if s is not None]
        n = sum(p["n"] for p in parts)
        runs = sum(p["runs"] for p in parts)
        maxd = max((p["maxd"] for p in parts), default=0)
        # boundary stitch: adjacent blocks merge a run / add a delta
        for a, b in zip(parts, parts[1:]):
            gap = abs(b["first"] - a["last"])
            maxd = max(maxd, gap)
            if gap == 0:
                runs -= 1
        nd = ds.groupby(col).aggregate(Count(alias_name="_n")).count()
        if runs * 4 < n:
            rec = "rle"
        elif maxd < 65_536:
            rec = "delta"
        elif nd * 16 < n:
            rec = "dict"
        else:
            rec = "plain"
        rows.append((col, n, runs, maxd, nd, rec))
    return pa.table({
        "column": pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "n_runs": pa.array([r[2] for r in rows], pa.int64()),
        "max_abs_delta": pa.array([r[3] for r in rows], pa.int64()),
        "n_distinct": pa.array([r[4] for r in rows], pa.int64()),
        "encoding": pa.array([r[5] for r in rows], pa.string())})


def sql_encoding_advisor() -> str:
    sels = []
    for col in ENC_COLS:
        ex = f"CAST({col} AS BIGINT)"
        sels.append(
            'SELECT "column", n_rows, n_runs, max_abs_delta, '
            "n_distinct, "
            "CASE WHEN n_runs * 4 < n_rows THEN 'rle' "
            "WHEN max_abs_delta < 65536 THEN 'delta' "
            "WHEN n_distinct * 16 < n_rows THEN 'dict' "
            "ELSE 'plain' END AS encoding FROM ("
            f"SELECT '{col}' AS \"column\", "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(sum(CASE WHEN v <> pv OR pv IS NULL THEN 1 ELSE 0 "
            "END) AS BIGINT) AS n_runs, "
            "CAST(COALESCE(max(abs(v - pv)), 0) AS BIGINT) "
            "AS max_abs_delta, "
            "CAST(count(DISTINCT v) AS BIGINT) AS n_distinct FROM ("
            f"SELECT {ex} AS v, lag({ex}) OVER (ORDER BY rid) AS pv "
            f"FROM (SELECT {ex} AS {col}, row_number() OVER () AS rid "
            "FROM lineitem)) )")
    return " UNION ALL ".join(sels)


# -------- FD-based data repair --------

def q_fd_repair(sf_dir: str):
    """Functional-dependency REPAIR — the cleaning step after
    q_fd_discovery's detection: enforce l_orderkey -> l_returnflag by
    rewriting every minority row to its group's majority flag
    (ties to the lexicographically smallest flag, the deterministic
    Holoclean-style convention), and report the per-flag census of
    the repaired column with kept/repaired row counts — g3 made
    concrete.

    Scale shape: one (key, value) counting groupby; the per-key
    majority is ONE packed groupby-max (count << 8 | (255 -
    ascii(flag)) — argmax-with-tie-break as a plain max); the census
    is an O(flags) groupby.  No row-level rewrite is materialized
    here (the census is the value-hashable surface); the rewrite
    itself is the same broadcast join every repair writer runs."""
    t = read_table(sf_dir, "lineitem",
                   columns=["l_orderkey", "l_returnflag"])
    xy = t.groupby(["l_orderkey", "l_returnflag"]).aggregate(
        Count(alias_name="c"))

    def packed(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        fl = np.asarray([ord(x) for x in
                         b["l_returnflag"].to_pylist()], np.int64)
        return pa.table({"okey": b["l_orderkey"].cast(pa.int64()),
                         "pk": c << 8 | (255 - fl),
                         "c": c})

    per_key = xy.map_batches(packed, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("okey").aggregate(Max("pk", alias_name="pk"),
                                   Sum("c", alias_name="n_rows"))

    def census(b: pa.Table) -> pa.Table:
        pk = b["pk"].to_numpy(zero_copy_only=False)
        maj = pk >> 8
        fl = 255 - (pk & 255)
        flags = np.asarray([chr(int(x)) for x in fl], dtype=object)
        n = b["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"flag": pa.array(flags, pa.string()),
                         "n_rows_after": n,
                         "n_kept": maj.astype(np.int64),
                         "n_repaired": (n - maj).astype(np.int64)})

    return per_key.map_batches(census, batch_format="pyarrow") \
        .groupby("flag").aggregate(
            Sum("n_rows_after", alias_name="n_rows_after"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("n_repaired", alias_name="n_repaired"))


def sql_fd_repair() -> str:
    return (
        "WITH xy AS (SELECT l_orderkey AS okey, l_returnflag AS fl, "
        "count(*) AS c FROM lineitem GROUP BY 1, 2), "
        "pk AS (SELECT okey, max(c * 256 + (255 - ascii(fl))) AS p, "
        "sum(c) AS n FROM xy GROUP BY okey), "
        "m AS (SELECT chr(CAST(255 - (p % 256) AS INT)) AS flag, "
        "p // 256 AS maj, n FROM pk) "
        "SELECT flag, CAST(sum(n) AS BIGINT) AS n_rows_after, "
        "CAST(sum(maj) AS BIGINT) AS n_kept, "
        "CAST(sum(n - maj) AS BIGINT) AS n_repaired "
        "FROM m GROUP BY flag")


# -------- k-anonymity generalization search --------

ANON_K = 10


def q_anonymize_lattice(sf_dir: str):
    """k-anonymization SYNTHESIS (Samarati's generalization lattice,
    the step after q_k_anonymity's audit): walk the 2x2 lattice of
    quasi-identifier generalizations — nation either raw or coarsened
    to its region, priority either raw or coarsened to its urgency
    digit — in fixed minimal-first order, and report for EVERY level
    the equivalence-class count, minimum class size, suppressed rows
    (classes below k) and whether the level satisfies k-anonymity
    with zero suppression; the chosen level is the first satisfying
    one.  Exact integers; the census per level is one groupby.

    Scale shape: all four lattice levels share ONE joined scan
    (orders |x| customer |x| nation), each level is an independent
    two-key counting groupby over it — the lattice walk fans out as
    four parallel aggregations, not four scans."""
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey"])
    nat = read_table(sf_dir, "nation",
                     columns=["n_nationkey", "n_regionkey"]).to_pandas()
    import ray as _ray
    n2r = np.full(int(nat["n_nationkey"].max()) + 1, -1, np.int64)
    n2r[nat["n_nationkey"].to_numpy()] = nat["n_regionkey"].to_numpy()
    ref = _ray.put(n2r)
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority"])
    j = orders.join(cust, join_type="inner", num_partitions=4,
                    on=("o_custkey",), right_on=("c_custkey",))

    def qi(b: pa.Table, _ref=ref) -> pa.Table:
        lut = _ray.get(_ref)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pr = np.asarray(b["o_orderpriority"].to_pylist(), dtype=object)
        urg = np.asarray([int(p.split("-", 1)[0]) for p in pr],
                         np.int64)
        return pa.table({"nat": nk, "reg": lut[nk],
                         "prio": pa.array(pr, pa.string()),
                         "urg": urg})

    base = j.map_batches(qi, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    levels = [("nat+prio", "nat", "prio"), ("nat+urg", "nat", "urg"),
              ("reg+prio", "reg", "prio"), ("reg+urg", "reg", "urg")]
    out = []
    chosen_done = False
    for name, a, bcol in levels:
        cls = base.groupby([a, bcol]).aggregate(
            Count(alias_name="n")).to_pandas()
        sizes = cls["n"].to_numpy().astype(np.int64)
        n_cls = len(sizes)
        mn = int(sizes.min()) if n_cls else 0
        supp = int(sizes[sizes < ANON_K].sum())
        ok = 1 if (n_cls and mn >= ANON_K) else 0
        chosen = 1 if (ok and not chosen_done) else 0
        if chosen:
            chosen_done = True
        out.append((name, n_cls, mn, supp, ok, chosen))
    return pa.table({
        "level": pa.array([o[0] for o in out], pa.string()),
        "n_classes": pa.array([o[1] for o in out], pa.int64()),
        "min_class": pa.array([o[2] for o in out], pa.int64()),
        "n_suppressed": pa.array([o[3] for o in out], pa.int64()),
        "satisfies_k": pa.array([o[4] for o in out], pa.int64()),
        "chosen": pa.array([o[5] for o in out], pa.int64())})


def sql_anonymize_lattice() -> str:
    base = ("b AS (SELECT c.c_nationkey AS nat, n.n_regionkey AS reg, "
            "o.o_orderpriority AS prio, "
            "CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS urg "
            "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey)")
    lv = []
    for name, a, bcol in [("nat+prio", "nat", "prio"),
                          ("nat+urg", "nat", "urg"),
                          ("reg+prio", "reg", "prio"),
                          ("reg+urg", "reg", "urg")]:
        lv.append(
            f"SELECT '{name}' AS level, "
            "CAST(count(*) AS BIGINT) AS n_classes, "
            "CAST(min(n) AS BIGINT) AS min_class, "
            f"CAST(sum(CASE WHEN n < {ANON_K} THEN n ELSE 0 END) "
            "AS BIGINT) AS n_suppressed, "
            f"CAST(CASE WHEN min(n) >= {ANON_K} THEN 1 ELSE 0 END "
            "AS BIGINT) AS satisfies_k "
            f"FROM (SELECT {a}, {bcol}, count(*) AS n FROM b "
            f"GROUP BY {a}, {bcol})")
    order = ("CASE level WHEN 'nat+prio' THEN 1 WHEN 'nat+urg' THEN 2 "
             "WHEN 'reg+prio' THEN 3 ELSE 4 END")
    return (
        f"WITH {base}, lv AS ({' UNION ALL '.join(lv)}), "
        f"r AS (SELECT *, {order} AS ord FROM lv), "
        "f AS (SELECT min(ord) AS first_ok FROM r WHERE satisfies_k = 1) "
        "SELECT level, n_classes, min_class, n_suppressed, satisfies_k, "
        "CAST(CASE WHEN satisfies_k = 1 AND ord = (SELECT first_ok "
        "FROM f) THEN 1 ELSE 0 END AS BIGINT) AS chosen FROM r")


# -------- queueing-delay replay (Lindley recurrence) --------

QD_SVC_US = 60_000_000  # service-time unit (1 minute)


def q_queue_delay(sf_dir: str):
    """Single-server queueing replay per event type — arrivals are
    the type's events in (ts, event_id) order, service times are the
    deterministic (1 + event_id mod 5) minutes, and each job starts
    at max(arrival, previous finish) (the Lindley recurrence).  The
    sequential recurrence VECTORIZES exactly: with C = prefix sum of
    service and M = prefix max of (arrival - C_prev),
    finish_i = C_i + M_i — so the whole simulation is one
    cumsum_per_key + one cummax_per_key + stateless arithmetic,
    the same two scan stages the drawdown query uses.  Output per
    type: job count, total and max waiting time (exact microseconds).

    The replay class behind latency SLO what-ifs ('what if this
    stream were processed by one worker') — analytical M/M/1 gives
    means; the replay gives the exact trajectory."""
    from igpm_pem_ray.stages.temporal import cummax_per_key, cumsum_per_key

    ev = read_table(sf_dir, "events",
                    columns=["event_type", "ts", "event_id"])

    def pre(b: pa.Table) -> pa.Table:
        et = np.asarray(b["event_type"].to_pylist(), dtype=object)
        tk = pd.util.hash_array(et.astype(str).astype(object)) \
            .astype(np.int64) >> 1
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({"key": tk % 1_000_003,
                         "etype": b["event_type"],
                         "us": b["ts"].cast(pa.int64()),
                         "eid": eid,
                         "val": (eid % 5 + 1) * QD_SVC_US})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    # collision guard: key = hash % 1_000_003 — a collision between
    # two distinct event types would silently merge their queues.
    # O(types) check: #distinct (key, etype) pairs == #distinct keys.
    kt = rows.groupby(["key", "etype"]).aggregate(
        Count(alias_name="_n")).materialize()
    nk = kt.groupby("key").aggregate(Count(alias_name="_n")).count()
    if kt.count() != nk:
        raise RuntimeError(
            "event_type hash collision in queue_delay "
            f"({kt.count()} (key,type) pairs vs {nk} keys)")
    c = cumsum_per_key(rows, payload_cols=["etype", "eid", "val"],
                       order_cols=("us", "eid"))
    m_in = c.map_batches(
        lambda b: pa.table({
            "key": b["key"], "us": b["us"], "eid": b["eid"],
            "etype": b["etype"],
            "arr": b["us"],
            "c_i": b["cum_val"],
            "svc": b["val"],
            "val": pa.compute.subtract(
                b["us"], pa.compute.subtract(b["cum_val"], b["val"]))}),
        batch_format="pyarrow")
    m = cummax_per_key(m_in, payload_cols=["etype", "arr", "c_i", "svc"],
                       order_cols=("us", "eid"))

    def wait(b: pa.Table) -> pa.Table:
        fin = b["c_i"].to_numpy(zero_copy_only=False) \
            + b["cum_max"].to_numpy(zero_copy_only=False)
        w = fin - b["svc"].to_numpy(zero_copy_only=False) \
            - b["arr"].to_numpy(zero_copy_only=False)
        return pa.table({"etype": b["etype"], "w": w.astype(np.int64)})

    return m.map_batches(wait, batch_format="pyarrow") \
        .groupby("etype").aggregate(
            Count(alias_name="n_jobs"),
            Sum("w", alias_name="total_wait_us"),
            Max("w", alias_name="max_wait_us")) \
        .rename_columns({"etype": "event_type"})


def sql_queue_delay() -> str:
    return (
        "WITH e AS (SELECT event_type AS t, "
        "CAST(epoch_us(ts) AS BIGINT) AS a, event_id AS eid, "
        f"(event_id % 5 + 1) * {QD_SVC_US} AS s FROM events), "
        "c AS (SELECT t, a, eid, s, sum(s) OVER w AS ci FROM e "
        "WINDOW w AS (PARTITION BY t ORDER BY a, eid "
        "ROWS UNBOUNDED PRECEDING)), "
        "m AS (SELECT t, a, s, ci, max(a - (ci - s)) OVER w AS mi "
        "FROM c WINDOW w AS (PARTITION BY t ORDER BY a, eid "
        "ROWS UNBOUNDED PRECEDING)) "
        "SELECT t AS event_type, CAST(count(*) AS BIGINT) AS n_jobs, "
        "CAST(sum(ci + mi - s - a) AS BIGINT) AS total_wait_us, "
        "CAST(max(ci + mi - s - a) AS BIGINT) AS max_wait_us "
        "FROM m GROUP BY t")


# -------- two-sample Kolmogorov-Smirnov (exact integer D) --------

KS_PACK = 1 << 31


def q_ks_test(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov drift test between the order-
    total distributions of the two order-date halves — the
    continuous-distribution sibling of q_score_drift's binned chi2,
    and EXACT: D = max |F1 - F2| evaluated as the integer numerator
    max |c1*n2 - c2*n1| over the pooled sorted support (denominator
    n1*n2 reported alongside, ks_e6 as the floor fixed point).  No
    binning, no floats, no ties ambiguity (D is evaluated at
    distinct values, counts are cumulative-inclusive in both
    engines).

    Scale shape: one per-value counting groupby packs (c1, c2) into
    one int64 (c1 * 2^31 + c2, both halves < 2^31 rows); ONE
    distributed prefix sum (cumsum_per_key, constant key) yields
    both cumulative counts; the max is a stateless map + tiny
    aggregate — the decision_stump plan shape applied to
    distribution testing."""
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    orders = read_table(sf_dir, "orders",
                        columns=["o_totalprice", "o_orderdate"])

    def pre(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        return pa.table({"cents": scale_col(
            b["o_totalprice"].to_numpy(zero_copy_only=False), 100.0),
            "day": day})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    lo, hi = int(rows.min("day")), int(rows.max("day"))
    mid = (lo + hi) // 2

    packed = rows.map_batches(
        lambda b: (lambda d: pa.table({
            "cents": b["cents"],
            "p": np.where(d <= mid, np.int64(KS_PACK), np.int64(1))}))(
            b["day"].to_numpy(zero_copy_only=False)),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("cents").aggregate(Sum("p", alias_name="p")) \
        .map_batches(
            lambda b: pa.table({
                "key": np.zeros(b.num_rows, np.int64),
                "us": b["cents"].cast(pa.int64()),
                "cents": b["cents"].cast(pa.int64()),
                "val": b["p"].cast(pa.int64())}),
            batch_format="pyarrow")
    cum = cumsum_per_key(packed, payload_cols=["cents"]).materialize()
    tot = int(cum.max("cum_val"))
    n1, n2 = tot >> 31, tot & (KS_PACK - 1)

    def dnum(b: pa.Table) -> pa.Table:
        cv = b["cum_val"].to_numpy(zero_copy_only=False)
        c1 = cv >> 31
        c2 = cv & (KS_PACK - 1)
        d = np.abs(c1 * n2 - c2 * n1)
        return pa.table({"d": d.astype(np.int64)})

    dmax = int(cum.map_batches(dnum, batch_format="pyarrow")
               .max("d"))
    ks_e6 = dmax * 1_000_000 // (n1 * n2) if n1 and n2 else 0
    return pa.table({
        "n_first": pa.array([n1], pa.int64()),
        "n_second": pa.array([n2], pa.int64()),
        "d_numerator": pa.array([dmax], pa.int64()),
        "ks_e6": pa.array([ks_e6], pa.int64())})


def sql_ks_test() -> str:
    return (
        "WITH o AS (SELECT "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents, "
        f"CAST(epoch_us(o_orderdate) AS BIGINT) // {DAY_US} AS day "
        "FROM orders), "
        "b AS (SELECT min(day) AS lo, max(day) AS hi FROM o), "
        "g AS (SELECT cents, "
        "sum(CASE WHEN day <= ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 THEN 1 ELSE 0 END) AS a1, "
        "sum(CASE WHEN day > ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 THEN 1 ELSE 0 END) AS a2 FROM o GROUP BY cents), "
        "c AS (SELECT cents, CAST(sum(a1) OVER w AS BIGINT) AS c1, "
        "CAST(sum(a2) OVER w AS BIGINT) AS c2 FROM g "
        "WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)), "
        "t AS (SELECT CAST(sum(a1) AS BIGINT) AS n1, "
        "CAST(sum(a2) AS BIGINT) AS n2 FROM g), "
        "d AS (SELECT max(abs(c1 * (SELECT n2 FROM t) "
        "- c2 * (SELECT n1 FROM t))) AS dm FROM c) "
        "SELECT (SELECT n1 FROM t) AS n_first, "
        "(SELECT n2 FROM t) AS n_second, "
        "(SELECT CAST(dm AS BIGINT) FROM d) AS d_numerator, "
        "CAST((SELECT dm FROM d) * 1000000 // "
        "((SELECT n1 FROM t) * (SELECT n2 FROM t)) AS BIGINT) "
        "AS ks_e6")


# -------- two-sample Cramer-von Mises (two-limb exact sum) --------

CVM_LIMB = 1 << 32


def q_cvm_test(sf_dir: str):
    """Two-sample Cramer-von Mises drift statistic over the same
    split as q_ks_test — the EDF test that integrates ALL the CDF
    gap, not just its max: T_num = sum over pooled distinct values of
    (c1*n2 - c2*n1)^2.  The squares pass 2^63 in aggregate, so the
    sum is carried EXACTLY in two int64 limbs (lo = sum of x^2 mod
    2^32, hi = sum of x^2 >> 32; x^2 <= 5.1e16 keeps both limb sums
    in range to ~10^5 distinct values, asserted) — the big-integer-
    free exact-accumulation trick, hash-comparable as two BIGINT
    columns with the identical limb arithmetic in the oracle.

    Scale shape: identical to q_ks_test — one counting groupby, one
    packed prefix sum, one stateless map + two scalar sums."""
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    orders = read_table(sf_dir, "orders",
                        columns=["o_totalprice", "o_orderdate"])

    def pre(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        return pa.table({"cents": scale_col(
            b["o_totalprice"].to_numpy(zero_copy_only=False), 100.0),
            "day": day})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    lo, hi = int(rows.min("day")), int(rows.max("day"))
    mid = (lo + hi) // 2

    packed = rows.map_batches(
        lambda b: (lambda d: pa.table({
            "cents": b["cents"],
            "p": np.where(d <= mid, np.int64(KS_PACK), np.int64(1))}))(
            b["day"].to_numpy(zero_copy_only=False)),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("cents").aggregate(Sum("p", alias_name="p")) \
        .map_batches(
            lambda b: pa.table({
                "key": np.zeros(b.num_rows, np.int64),
                "us": b["cents"].cast(pa.int64()),
                "cents": b["cents"].cast(pa.int64()),
                "val": b["p"].cast(pa.int64())}),
            batch_format="pyarrow")
    cum = cumsum_per_key(packed, payload_cols=["cents"]).materialize()
    tot = int(cum.max("cum_val"))
    n1, n2 = tot >> 31, tot & (KS_PACK - 1)

    def limbs(b: pa.Table) -> pa.Table:
        cv = b["cum_val"].to_numpy(zero_copy_only=False)
        c1 = cv >> 31
        c2 = cv & (KS_PACK - 1)
        x = np.abs(c1 * n2 - c2 * n1)
        x2 = x * x
        return pa.table({"lo": (x2 % CVM_LIMB).astype(np.int64),
                         "hi": (x2 // CVM_LIMB).astype(np.int64)})

    t = cum.map_batches(limbs, batch_format="pyarrow").materialize()
    s_lo = int(t.sum("lo") or 0)
    s_hi = int(t.sum("hi") or 0)
    # normalize: carry lo overflow into hi so the limb pair is unique
    s_hi += s_lo // CVM_LIMB
    s_lo = s_lo % CVM_LIMB
    return pa.table({
        "n_first": pa.array([n1], pa.int64()),
        "n_second": pa.array([n2], pa.int64()),
        "cvm_hi": pa.array([s_hi], pa.int64()),
        "cvm_lo": pa.array([s_lo], pa.int64())})


def sql_cvm_test() -> str:
    return (
        "WITH o AS (SELECT "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents, "
        f"CAST(epoch_us(o_orderdate) AS BIGINT) // {DAY_US} AS day "
        "FROM orders), "
        "b AS (SELECT min(day) AS lo, max(day) AS hi FROM o), "
        "g AS (SELECT cents, "
        "sum(CASE WHEN day <= ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 THEN 1 ELSE 0 END) AS a1, "
        "sum(CASE WHEN day > ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 THEN 1 ELSE 0 END) AS a2 FROM o GROUP BY cents), "
        "c AS (SELECT CAST(sum(a1) OVER w AS BIGINT) AS c1, "
        "CAST(sum(a2) OVER w AS BIGINT) AS c2 FROM g "
        "WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)), "
        "t AS (SELECT CAST(sum(a1) AS BIGINT) AS n1, "
        "CAST(sum(a2) AS BIGINT) AS n2 FROM g), "
        "x AS (SELECT abs(c1 * (SELECT n2 FROM t) "
        "- c2 * (SELECT n1 FROM t)) AS v FROM c), "
        f"s AS (SELECT CAST(sum((v*v) % {CVM_LIMB}) AS BIGINT) AS lo, "
        f"CAST(sum((v*v) // {CVM_LIMB}) AS BIGINT) AS hi FROM x) "
        "SELECT (SELECT n1 FROM t) AS n_first, "
        "(SELECT n2 FROM t) AS n_second, "
        f"CAST(s.hi + s.lo // {CVM_LIMB} AS BIGINT) AS cvm_hi, "
        f"CAST(s.lo % {CVM_LIMB} AS BIGINT) AS cvm_lo FROM s")


# -------- 1-D Wasserstein-1 distance (exact two-limb sum) --------

def q_wasserstein1(sf_dir: str):
    """Two-sample 1-D Wasserstein-1 (earth mover's) distance over the
    q_ks_test split — completing the EDF-distance trio (KS = max gap,
    Cramer-von Mises = squared gaps, W1 = gap mass x transport
    distance): W1_num = sum over consecutive pooled support values of
    |c1*n2 - c2*n1| * (v_next - v), with denominator n1*n2 —
    the distribution-shift measure optimal-transport courses start
    from, exact via the q_cvm_test two-limb int64 accumulation.

    Scale shape: the ks plan + one per-block next-value diff with an
    O(blocks) boundary carry (each term needs its successor value, so
    blocks ship only their first row — the lead()-window sibling of
    the cumsum carry)."""
    import ray as _ray
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    orders = read_table(sf_dir, "orders",
                        columns=["o_totalprice", "o_orderdate"])

    def pre(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        return pa.table({"cents": scale_col(
            b["o_totalprice"].to_numpy(zero_copy_only=False), 100.0),
            "day": day})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    lo, hi = int(rows.min("day")), int(rows.max("day"))
    mid = (lo + hi) // 2

    packed = rows.map_batches(
        lambda b: (lambda d: pa.table({
            "cents": b["cents"],
            "p": np.where(d <= mid, np.int64(KS_PACK), np.int64(1))}))(
            b["day"].to_numpy(zero_copy_only=False)),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("cents").aggregate(Sum("p", alias_name="p")) \
        .map_batches(
            lambda b: pa.table({
                "key": np.zeros(b.num_rows, np.int64),
                "us": b["cents"].cast(pa.int64()),
                "cents": b["cents"].cast(pa.int64()),
                "val": b["p"].cast(pa.int64())}),
            batch_format="pyarrow")
    cum = cumsum_per_key(packed, payload_cols=["cents"]).materialize()
    tot = int(cum.max("cum_val"))
    n1, n2 = tot >> 31, tot & (KS_PACK - 1)

    # per-block terms; the last row of each block needs the NEXT
    # block's first value -> O(blocks) first-value carry
    refs = cum.to_arrow_refs()
    firsts = _ray.get([_ray.remote(
        lambda t: (int(t["cents"][0].as_py()), t.num_rows)
        if t.num_rows else None).remote(r) for r in refs])

    @_ray.remote
    def block_limbs(t: pa.Table, next_first):
        if not t.num_rows:
            return 0, 0
        v = t["cents"].to_numpy(zero_copy_only=False)
        cv = t["cum_val"].to_numpy(zero_copy_only=False)
        c1 = cv >> 31
        c2 = cv & (KS_PACK - 1)
        gap = np.abs(c1 * n2 - c2 * n1)
        nxt = np.empty_like(v)
        nxt[:-1] = v[1:]
        nxt[-1] = next_first if next_first is not None else v[-1]
        term = gap * (nxt - v)
        return int((term % CVM_LIMB).sum()), int((term // CVM_LIMB).sum())

    nxt_first = []
    for i in range(len(refs)):
        nf = None
        for j in range(i + 1, len(refs)):
            if firsts[j] is not None:
                nf = firsts[j][0]
                break
        nxt_first.append(nf)
    parts = _ray.get([block_limbs.remote(r, nf)
                      for r, nf in zip(refs, nxt_first)])
    s_lo = sum(p[0] for p in parts)
    s_hi = sum(p[1] for p in parts)
    s_hi += s_lo // CVM_LIMB
    s_lo = s_lo % CVM_LIMB
    return pa.table({
        "n_first": pa.array([n1], pa.int64()),
        "n_second": pa.array([n2], pa.int64()),
        "w1_hi": pa.array([s_hi], pa.int64()),
        "w1_lo": pa.array([s_lo], pa.int64())})


def sql_wasserstein1() -> str:
    return (
        "WITH o AS (SELECT "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents, "
        f"CAST(epoch_us(o_orderdate) AS BIGINT) // {DAY_US} AS day "
        "FROM orders), "
        "b AS (SELECT min(day) AS lo, max(day) AS hi FROM o), "
        "g AS (SELECT cents, "
        "sum(CASE WHEN day <= ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 THEN 1 ELSE 0 END) AS a1, "
        "sum(CASE WHEN day > ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 THEN 1 ELSE 0 END) AS a2 FROM o GROUP BY cents), "
        "c AS (SELECT cents, CAST(sum(a1) OVER w AS BIGINT) AS c1, "
        "CAST(sum(a2) OVER w AS BIGINT) AS c2, "
        "lead(cents) OVER (ORDER BY cents) AS nxt FROM g "
        "WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)), "
        "t AS (SELECT CAST(sum(a1) AS BIGINT) AS n1, "
        "CAST(sum(a2) AS BIGINT) AS n2 FROM g), "
        "x AS (SELECT abs(c1 * (SELECT n2 FROM t) "
        "- c2 * (SELECT n1 FROM t)) "
        "* (COALESCE(nxt, cents) - cents) AS v FROM c), "
        f"s AS (SELECT CAST(sum(v % {CVM_LIMB}) AS BIGINT) AS lo, "
        f"CAST(sum(v // {CVM_LIMB}) AS BIGINT) AS hi FROM x) "
        "SELECT (SELECT n1 FROM t) AS n_first, "
        "(SELECT n2 FROM t) AS n_second, "
        f"CAST(s.hi + s.lo // {CVM_LIMB} AS BIGINT) AS w1_hi, "
        f"CAST(s.lo % {CVM_LIMB} AS BIGINT) AS w1_lo FROM s")


# -------- dispersion index (count-data overdispersion) --------

HOUR_US = 3_600_000_000


def q_dispersion_index(sf_dir: str):
    """Index of dispersion (variance-to-mean ratio) of hourly event
    counts per type — the Poisson-ness / burstiness diagnostic
    (D = 1 for a Poisson stream, > 1 overdispersed): with n = the
    global hour-span (zero hours count, as in the SQL densified
    grid), S1 = sum of counts and S2 = sum of squared counts,
    D = (n*S2 - S1^2) / ((n-1)*S1) exactly, emitted as the e6
    floor fixed point next to the raw sufficient statistics.

    Scale shape: ONE (type, hour) counting groupby + one per-type
    sum — the empty grid hours contribute only to the scalar n, so
    no densification rows are materialized at all (unlike
    q_densify_hours, which is the point when the grid is the
    output)."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({"etype": b["event_type"],
                         "hr": b["ts"].cast(pa.int64()).to_numpy(
                             zero_copy_only=False) // HOUR_US})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    lo, hi = int(rows.min("hr")), int(rows.max("hr"))
    n = hi - lo + 1
    per_hr = rows.groupby(["etype", "hr"]).aggregate(
        Count(alias_name="c"))
    sums = per_hr.map_batches(
        lambda b: (lambda c: pa.table({
            "etype": b["etype"], "s1": c, "s2": c * c}))(
            b["c"].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow") \
        .groupby("etype").aggregate(Sum("s1", alias_name="s1"),
                                    Sum("s2", alias_name="s2"))

    def disp(b: pa.Table) -> pa.Table:
        s1 = b["s1"].to_numpy(zero_copy_only=False).astype(np.int64)
        s2 = b["s2"].to_numpy(zero_copy_only=False).astype(np.int64)
        num = n * s2 - s1 * s1
        den = (n - 1) * s1
        d = np.where(den > 0, num * 1_000_000 // np.maximum(den, 1),
                     np.int64(-1))
        return pa.table({"event_type": b["etype"],
                         "n_hours": np.full(len(s1), n, np.int64),
                         "s1": s1, "s2": s2,
                         "dispersion_e6": d.astype(np.int64)})

    return sums.map_batches(disp, batch_format="pyarrow")


def sql_dispersion_index() -> str:
    return (
        "WITH e AS (SELECT event_type AS t, "
        f"CAST(epoch_us(ts) AS BIGINT) // {HOUR_US} AS hr FROM events), "
        "b AS (SELECT max(hr) - min(hr) + 1 AS n FROM e), "
        "g AS (SELECT t, hr, count(*) AS c FROM e GROUP BY t, hr), "
        "s AS (SELECT t, CAST(sum(c) AS BIGINT) AS s1, "
        "CAST(sum(c*c) AS BIGINT) AS s2 FROM g GROUP BY t) "
        "SELECT t AS event_type, "
        "CAST((SELECT n FROM b) AS BIGINT) AS n_hours, s1, s2, "
        "CAST(CASE WHEN ((SELECT n FROM b) - 1) * s1 > 0 THEN "
        "((SELECT n FROM b) * s2 - s1 * s1) * 1000000 "
        "// (((SELECT n FROM b) - 1) * s1) ELSE -1 END AS BIGINT) "
        "AS dispersion_e6 FROM s")


# -------- split-conformal prediction coverage --------

CONF_ALPHA_NUM, CONF_ALPHA_DEN = 9, 10   # 90% target coverage


def q_conformal_coverage(sf_dir: str):
    """Split-conformal prediction (Vovk; the distribution-free
    uncertainty-quantification recipe): calibration half = events
    with even event_id, point predictor = the calibration LOWER
    MEDIAN value per event type (rank (n+1)//2 order statistic),
    nonconformity = |value - prediction|, and the interval radius is
    the ceil((n_cal+1) * 9/10)-th smallest calibration score — the
    finite-sample-valid quantile.  Reported per type with the exact
    covered-count on the held-out odd half (coverage_e6 as floor
    fixed point).  Everything is rank selection + counting — no
    distributional assumption and no floats, which is the point of
    conformal.

    Scale shape: two rank_per_group passes over the calibration half
    (median, then score quantile) + one broadcast of the O(types)
    cutoff table to score the test half statelessly."""
    from igpm_pem_ray.stages.ranked import rank_per_group
    import ray as _ray

    ev = read_table(sf_dir, "events",
                    columns=["event_type", "event_id", "value"])

    def pre(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({"etype": b["event_type"],
                         "eid": eid,
                         "v": scale_col(b["value"].to_numpy(
                             zero_copy_only=False), 100.0),
                         "cal": (eid % 2 == 0).astype(np.int64)})

    rows = ev.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    cal = rows.filter(expr="cal == 1").materialize()

    # per-type lower median of the calibration half
    et_key = cal.map_batches(
        lambda b: pa.table({
            "key": pd.util.hash_array(
                np.asarray(b["etype"].to_pylist(), dtype=object)
                .astype(str).astype(object)).astype(np.int64) >> 1,
            "etype": b["etype"], "v": b["v"], "eid": b["eid"]}),
        batch_format="pyarrow").materialize()
    sizes = et_key.groupby("key").aggregate(Count(alias_name="n")) \
        .to_pandas()
    # collision guard: a 63-bit hash collision between two distinct
    # types would silently merge their calibration sets — fail loudly
    # instead (O(types) check)
    n_pairs = et_key.groupby(["key", "etype"]).aggregate(
        Count(alias_name="_n")).count()
    if n_pairs != len(sizes):
        raise RuntimeError(
            "event_type hash collision in conformal_coverage "
            f"({n_pairs} (key,type) pairs vs {len(sizes)} keys)")
    nmap = dict(zip(sizes["key"].astype(np.int64),
                    sizes["n"].astype(np.int64)))
    ranked = rank_per_group(et_key, key="key", order=["v", "eid"],
                            descending=[False, False])
    nref = _ray.put(nmap)

    def med_pick(b: pa.Table, _r=nref) -> pa.Table:
        nm = _ray.get(_r)
        k = b["key"].to_numpy(zero_copy_only=False)
        r = b["rank"].to_numpy(zero_copy_only=False)
        tgt = np.asarray([(nm[int(x)] + 1) // 2 for x in k], np.int64)
        m = r == tgt
        return pa.table({"mkey": k[m], "med": b["v"].to_numpy(
            zero_copy_only=False)[m],
            "metype": b["etype"].filter(pa.array(m))})

    meds = ranked.map_batches(med_pick, batch_format="pyarrow") \
        .to_pandas()
    medmap = dict(zip(meds["mkey"].astype(np.int64),
                      meds["med"].astype(np.int64)))
    mref = _ray.put(medmap)

    # calibration nonconformity scores -> per-type conformal cutoff
    def scores(b: pa.Table, _m=mref) -> pa.Table:
        mm = _ray.get(_m)
        k = b["key"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        med = np.asarray([mm[int(x)] for x in k], np.int64)
        return pa.table({"key": k, "etype": b["etype"],
                         "eid": b["eid"],
                         "v": np.abs(v - med)})

    sc = et_key.map_batches(scores, batch_format="pyarrow") \
        .materialize()
    rk2 = rank_per_group(sc, key="key", order=["v", "eid"],
                         descending=[False, False])

    def cut_pick(b: pa.Table, _r=nref) -> pa.Table:
        nm = _ray.get(_r)
        k = b["key"].to_numpy(zero_copy_only=False)
        r = b["rank"].to_numpy(zero_copy_only=False)
        # ceil((n+1) * 9/10) via the positive-only (a + b - 1) // b
        # form (negative floor-division ceil tricks differ across
        # engines), capped at n
        tgt = np.asarray(
            [min(((nm[int(x)] + 1) * CONF_ALPHA_NUM
                  + CONF_ALPHA_DEN - 1) // CONF_ALPHA_DEN,
                 nm[int(x)]) for x in k],
            np.int64)
        m = r == tgt
        return pa.table({"ckey": k[m],
                         "cut": b["v"].to_numpy(
                             zero_copy_only=False)[m]})

    cuts = rk2.map_batches(cut_pick, batch_format="pyarrow").to_pandas()
    cutmap = dict(zip(cuts["ckey"].astype(np.int64),
                      cuts["cut"].astype(np.int64)))
    cref = _ray.put((medmap, cutmap))

    def cover(b: pa.Table, _r=cref) -> pa.Table:
        mm, cm = _ray.get(_r)
        et = np.asarray(b["etype"].to_pylist(), dtype=object)
        k = pd.util.hash_array(et.astype(str).astype(object)) \
            .astype(np.int64) >> 1
        v = b["v"].to_numpy(zero_copy_only=False)
        cal = b["cal"].to_numpy(zero_copy_only=False)
        # a type with ZERO calibration rows has no median/cutoff —
        # the oracle's inner joins drop it; mask before lookup
        # instead of KeyError-ing
        known = np.asarray([int(x) in mm and int(x) in cm for x in k],
                           bool)
        if not known.all():
            b = b.filter(pa.array(known))
            k, v, cal = k[known], v[known], cal[known]
        m = cal == 0
        med = np.asarray([mm[int(x)] for x in k], np.int64)
        cut = np.asarray([cm[int(x)] for x in k], np.int64)
        cov = (np.abs(v - med) <= cut) & m
        return pa.table({"etype": b["etype"],
                         "t": m.astype(np.int64),
                         "c": cov.astype(np.int64),
                         "cut": np.where(m, cut, 0)})

    agg = rows.map_batches(cover, batch_format="pyarrow") \
        .groupby("etype").aggregate(
            Sum("t", alias_name="n_test"),
            Sum("c", alias_name="n_covered"),
            Max("cut", alias_name="cutoff_e2"))

    def fin(b: pa.Table) -> pa.Table:
        t = b["n_test"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["n_covered"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "event_type": b["etype"],
            "n_test": t, "n_covered": c,
            "cutoff_e2": b["cutoff_e2"].cast(pa.int64()),
            "coverage_e6": np.where(
                t > 0, c * 1_000_000 // np.maximum(t, 1),
                np.int64(-1)).astype(np.int64)})

    return agg.map_batches(fin, batch_format="pyarrow")


def sql_conformal_coverage() -> str:
    return (
        "WITH e AS (SELECT event_type AS t, event_id AS eid, "
        "CAST(floor(value*100.0+0.5) AS BIGINT) AS v, "
        "CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS cal "
        "FROM events), "
        "calset AS (SELECT * FROM e WHERE cal = 1), "
        "mr AS (SELECT t, v, row_number() OVER "
        "(PARTITION BY t ORDER BY v, eid) AS rk, "
        "count(*) OVER (PARTITION BY t) AS n FROM calset), "
        "med AS (SELECT t, v AS med FROM mr WHERE rk = (n + 1) // 2), "
        "sc AS (SELECT c.t, c.eid, abs(c.v - m.med) AS s "
        "FROM calset c JOIN med m ON m.t = c.t), "
        "sr AS (SELECT t, s, row_number() OVER "
        "(PARTITION BY t ORDER BY s, eid) AS rk, "
        "count(*) OVER (PARTITION BY t) AS n FROM sc), "
        "cut AS (SELECT t, s AS cut FROM sr WHERE rk = least("
        f"((n + 1) * {CONF_ALPHA_NUM} + {CONF_ALPHA_DEN} - 1) "
        f"// {CONF_ALPHA_DEN}, n)), "
        "tst AS (SELECT e.t, "
        "CASE WHEN abs(e.v - m.med) <= c.cut THEN 1 ELSE 0 END AS cov, "
        "c.cut FROM e JOIN med m ON m.t = e.t "
        "JOIN cut c ON c.t = e.t WHERE e.cal = 0) "
        "SELECT t AS event_type, CAST(count(*) AS BIGINT) AS n_test, "
        "CAST(sum(cov) AS BIGINT) AS n_covered, "
        "CAST(max(cut) AS BIGINT) AS cutoff_e2, "
        "CAST(CASE WHEN count(*) > 0 THEN sum(cov) * 1000000 "
        "// count(*) ELSE -1 END AS BIGINT) AS coverage_e6 "
        "FROM tst GROUP BY t")


# -------- energy distance (exact inter-point two-sample statistic) --------

def q_energy_distance(sf_dir: str):
    """Two-sample energy-distance numerators (Szekely-Rizzo) over the
    q_ks_test split — the INTER-POINT-distance statistic (E = 2 E|X-Y|
    - E|X-X'| - E|Y-Y'|) that detects differences EDF sups can miss,
    computed exactly: each pairwise-distance sum collapses to one
    pass over the sorted support, where the gap between consecutive
    values contributes gap * (#pairs straddling it) — cross pairs
    c1*(n1-c1)... no, cross = c1*(n2-c2) + c2*(n1-c1), within-X =
    c1*(n1-c1), within-Y = c2*(n2-c2) — all from the SAME packed
    prefix-sum table as ks/cvm/w1, accumulated in the two-limb int64
    convention (outputs are the three raw pair-distance sums as
    (hi, lo) limb pairs; the normalized statistic divides by
    n1*n2, C(n1,2), C(n2,2) downstream).

    Scale shape: identical to q_wasserstein1 — counting groupby,
    packed prefix sum, per-block lead-value carry, tiny limb sums."""
    import ray as _ray
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    orders = read_table(sf_dir, "orders",
                        columns=["o_totalprice", "o_orderdate"])

    def pre(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        return pa.table({"cents": scale_col(
            b["o_totalprice"].to_numpy(zero_copy_only=False), 100.0),
            "day": day})

    rows = orders.map_batches(pre, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    lo, hi = int(rows.min("day")), int(rows.max("day"))
    mid = (lo + hi) // 2

    packed = rows.map_batches(
        lambda b: (lambda d: pa.table({
            "cents": b["cents"],
            "p": np.where(d <= mid, np.int64(KS_PACK), np.int64(1))}))(
            b["day"].to_numpy(zero_copy_only=False)),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("cents").aggregate(Sum("p", alias_name="p")) \
        .map_batches(
            lambda b: pa.table({
                "key": np.zeros(b.num_rows, np.int64),
                "us": b["cents"].cast(pa.int64()),
                "cents": b["cents"].cast(pa.int64()),
                "val": b["p"].cast(pa.int64())}),
            batch_format="pyarrow")
    cum = cumsum_per_key(packed, payload_cols=["cents"]).materialize()
    tot = int(cum.max("cum_val"))
    n1, n2 = tot >> 31, tot & (KS_PACK - 1)

    refs = cum.to_arrow_refs()
    firsts = _ray.get([_ray.remote(
        lambda t: int(t["cents"][0].as_py()) if t.num_rows else None)
        .remote(r) for r in refs])

    @_ray.remote
    def block_limbs(t: pa.Table, next_first):
        if not t.num_rows:
            return (0,) * 6
        v = t["cents"].to_numpy(zero_copy_only=False)
        cv = t["cum_val"].to_numpy(zero_copy_only=False)
        c1 = cv >> 31
        c2 = cv & (KS_PACK - 1)
        nxt = np.empty_like(v)
        nxt[:-1] = v[1:]
        nxt[-1] = next_first if next_first is not None else v[-1]
        gap = nxt - v
        cross = c1 * (n2 - c2) + c2 * (n1 - c1)
        wx = c1 * (n1 - c1)
        wy = c2 * (n2 - c2)
        out = []
        for w in (cross, wx, wy):
            term = w * gap
            out += [int((term % CVM_LIMB).sum()),
                    int((term // CVM_LIMB).sum())]
        return tuple(out)

    nxt_first = []
    for i in range(len(refs)):
        nf = None
        for j in range(i + 1, len(refs)):
            if firsts[j] is not None:
                nf = firsts[j]
                break
        nxt_first.append(nf)
    parts = _ray.get([block_limbs.remote(r, nf)
                      for r, nf in zip(refs, nxt_first)])
    sums = [sum(p[i] for p in parts) for i in range(6)]
    cols = {"n_first": n1, "n_second": n2}
    for name, (i_lo, i_hi) in [("cross", (0, 1)), ("within_x", (2, 3)),
                               ("within_y", (4, 5))]:
        s_lo, s_hi = sums[i_lo], sums[i_hi]
        s_hi += s_lo // CVM_LIMB
        s_lo = s_lo % CVM_LIMB
        cols[f"{name}_hi"] = s_hi
        cols[f"{name}_lo"] = s_lo
    return pa.table({k: pa.array([v], pa.int64())
                     for k, v in cols.items()})


def sql_energy_distance() -> str:
    return (
        "WITH o AS (SELECT "
        "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT) AS cents, "
        f"CAST(epoch_us(o_orderdate) AS BIGINT) // {DAY_US} AS day "
        "FROM orders), "
        "b AS (SELECT min(day) AS lo, max(day) AS hi FROM o), "
        "g AS (SELECT cents, "
        "sum(CASE WHEN day <= ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 THEN 1 ELSE 0 END) AS a1, "
        "sum(CASE WHEN day > ((SELECT lo FROM b) + (SELECT hi FROM b)) "
        "// 2 THEN 1 ELSE 0 END) AS a2 FROM o GROUP BY cents), "
        "c AS (SELECT cents, CAST(sum(a1) OVER w AS BIGINT) AS c1, "
        "CAST(sum(a2) OVER w AS BIGINT) AS c2, "
        "lead(cents) OVER (ORDER BY cents) AS nxt FROM g "
        "WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)), "
        "t AS (SELECT CAST(sum(a1) AS BIGINT) AS n1, "
        "CAST(sum(a2) AS BIGINT) AS n2 FROM g), "
        "x AS (SELECT (COALESCE(nxt, cents) - cents) AS gap, "
        "c1 * ((SELECT n2 FROM t) - c2) "
        "+ c2 * ((SELECT n1 FROM t) - c1) AS wc, "
        "c1 * ((SELECT n1 FROM t) - c1) AS wx, "
        "c2 * ((SELECT n2 FROM t) - c2) AS wy FROM c), "
        f"s AS (SELECT "
        f"CAST(sum((wc*gap) % {CVM_LIMB}) AS BIGINT) AS c_lo, "
        f"CAST(sum((wc*gap) // {CVM_LIMB}) AS BIGINT) AS c_hi, "
        f"CAST(sum((wx*gap) % {CVM_LIMB}) AS BIGINT) AS x_lo, "
        f"CAST(sum((wx*gap) // {CVM_LIMB}) AS BIGINT) AS x_hi, "
        f"CAST(sum((wy*gap) % {CVM_LIMB}) AS BIGINT) AS y_lo, "
        f"CAST(sum((wy*gap) // {CVM_LIMB}) AS BIGINT) AS y_hi FROM x) "
        "SELECT (SELECT n1 FROM t) AS n_first, "
        "(SELECT n2 FROM t) AS n_second, "
        f"CAST(s.c_hi + s.c_lo // {CVM_LIMB} AS BIGINT) AS cross_hi, "
        f"CAST(s.c_lo % {CVM_LIMB} AS BIGINT) AS cross_lo, "
        f"CAST(s.x_hi + s.x_lo // {CVM_LIMB} AS BIGINT) AS within_x_hi, "
        f"CAST(s.x_lo % {CVM_LIMB} AS BIGINT) AS within_x_lo, "
        f"CAST(s.y_hi + s.y_lo // {CVM_LIMB} AS BIGINT) AS within_y_hi, "
        f"CAST(s.y_lo % {CVM_LIMB} AS BIGINT) AS within_y_lo FROM s")
