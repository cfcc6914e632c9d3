"""Distributed analytics operators with DuckDB oracles — round 3.

Extends the reference's aggregate surface (`gray/aggregator.py:13-52`
COUNT/MIN/MAX/SUM/AVG, `query/Grouping.py:26-41` groupBy) with the
aggregation patterns a 100-TB training-data pipeline needs and the
reference never had: sufficient-statistics moments (variance without a
second pass), distinct counting, histograms, multi-table star joins,
pivot/rollup, and an explicitly salted two-stage aggregate for hot
keys (the north rule's skew requirement, SURVEY.md section 4).

Every operator is paired with ANSI SQL for the driver's side-by-side
DuckDB gate; float columns use the shared scaled-int convention
(``pipelines/common.scale_col``) so value-hashes are reduction-order
independent.

Scale notes (why each plan holds at 1000x):
- all partials are computed per block with numpy (np.unique/reduceat)
  BEFORE any shuffle, so shuffled rows are O(groups x blocks), not
  O(rows);
- derived statistics (variance) are integer formulas over the tiny
  post-aggregate table — exact, no float reduction order anywhere;
- the star join broadcasts only the filtered dimension keys (ray.put
  once) and ships facts through one hash join on the fact key;
- the salted aggregate shows the two-stage (key, salt) -> key plan
  that bounds any single reducer's input at rows/16 per block-source.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from igpm_pem_ray.pipelines.common import read_table, scale_col, sql_scale


# ---------------- grouped moments: variance via sufficient statistics ----

def q_group_stats(sf_dir: str):
    """Per-(returnflag, linestatus) count/sum/sum-of-squares of
    l_quantity in ONE pass, then population variance derived from the
    sufficient statistics with exact integer math: no second
    mean-subtraction pass over the data (Welford-by-moments, the
    standard distributed form).

    var_pop_e4 = (n*ss - s*s) // (n*n) on scaled-e2 quantities — the
    numerator is >= 0 by Cauchy-Schwarz, so truncating and flooring
    division agree between numpy/Python and DuckDB.
    """
    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def pre(b: pa.Table) -> pa.Table:
        q = scale_col(b["l_quantity"].to_numpy(zero_copy_only=False), 100.0)
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "l_linestatus": b["l_linestatus"],
                         "q_e2": q, "q_sq_e4": q * q})

    agg = li.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Count(alias_name="n_rows"),
            Sum("q_e2", alias_name="sum_q_e2"),
            Sum("q_sq_e4", alias_name="sum_q_sq_e4"))
    pdf = agg.to_pandas()
    # tiny result (one row per group): exact arbitrary-precision int
    # math on the driver, immune to int64 overflow at any sf
    n = pdf["n_rows"].astype(object)
    s = pdf["sum_q_e2"].astype(object)
    ss = pdf["sum_q_sq_e4"].astype(object)
    pdf["var_pop_e4"] = [(int(ni) * int(ssi) - int(si) * int(si))
                         // (int(ni) * int(ni))
                         for ni, si, ssi in zip(n, s, ss)]
    pdf["var_pop_e4"] = pdf["var_pop_e4"].astype("int64")
    pdf["n_rows"] = pdf["n_rows"].astype("int64")
    return pa.Table.from_pandas(pdf, preserve_index=False)


def sql_group_stats() -> str:
    q = sql_scale("l_quantity", "100.0")
    return (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(sum({q}) AS BIGINT) AS sum_q_e2, "
        f"CAST(sum({q}*{q}) AS BIGINT) AS sum_q_sq_e4, "
        f"CAST((count(*)*sum({q}*{q}) - sum({q})*sum({q})) "
        "  // (count(*)*count(*)) AS BIGINT) AS var_pop_e4 "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus")


# ---------------- exact distinct count per group ----------------

def q_distinct_parts(sf_dir: str):
    """count(DISTINCT l_partkey) per supplier — the two-shuffle exact
    plan: per-block unique (supp, part) pairs (np.unique collapses
    duplicates BEFORE the wire), groupby-distinct on the pair, then a
    count per supplier.  At 100 TB the first shuffle carries only the
    per-block-distinct pairs; an approximate variant would swap stage
    one for a per-block HLL sketch merged in the groupby."""
    li = read_table(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])

    def pairs(b: pa.Table) -> pa.Table:
        s = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # pack (supp, part) into one int64 for a single-key unique —
        # partkeys fit 32 bits in TPC-H-ish data (asserted)
        assert p.max(initial=0) < (1 << 31) and s.max(initial=0) < (1 << 31)
        packed = (s << 32) | p
        u = np.unique(packed)
        return pa.table({"l_suppkey": (u >> 32), "l_partkey": u & 0x7FFFFFFF})

    return li.map_batches(pairs, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["l_suppkey", "l_partkey"]).aggregate(Count(alias_name="_c")) \
        .map_batches(lambda b: pa.table({"l_suppkey": b["l_suppkey"]}),
                     batch_format="pyarrow") \
        .groupby("l_suppkey").aggregate(Count(alias_name="n_parts")) \
        .map_batches(lambda b: pa.table({
            "l_suppkey": b["l_suppkey"].cast(pa.int64()),
            "n_parts": b["n_parts"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_distinct_parts() -> str:
    return ("SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey, "
            "CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts "
            "FROM lineitem GROUP BY l_suppkey")


# ---------------- fixed-width histogram ----------------

BUCKET_E2 = 1_000_000  # $10,000 buckets on e2-scaled totalprice


def q_histogram_orders(sf_dir: str):
    """Order-value histogram: bucket = scaled-price // width, counted
    with per-block partials (np.unique) so the shuffle carries one row
    per (block, bucket) — O(buckets) wire traffic regardless of row
    count.  The standard first step of any quality-score / length
    distribution over a 100-TB corpus."""
    od = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        e2 = scale_col(b["o_totalprice"].to_numpy(zero_copy_only=False), 100.0)
        bucket, n = np.unique(e2 // BUCKET_E2, return_counts=True)
        return pa.table({"bucket": bucket, "n": n.astype(np.int64)})

    return od.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("bucket").aggregate(Sum("n", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "bucket": b["bucket"], "n": b["n"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_histogram_orders() -> str:
    e2 = sql_scale("o_totalprice", "100.0")
    return (f"SELECT {e2} // {BUCKET_E2} AS bucket, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM orders GROUP BY 1")


# ---------------- 3-table star join + top-k (TPC-H Q3 shape) ----------

def q_star_join(sf_dir: str):
    """BUILDING-segment customers |> orders |> lineitem, revenue per
    order, top 10.  Plan: the filtered dimension's keys are broadcast
    ONCE via ray.put (customer is the small side even at 10^12 docs of
    fact data), orders filtered by np.isin in map_batches — no shuffle
    for the dimension hop; the single fact-fact hop (orders x
    lineitem) is the one hash join; then groupby-sum and a tiny
    sorted-limit merge.  J1 broadcast + J2 hash-join composition
    (SURVEY 2.4) in one pipeline."""
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"])
    key_blocks = [
        b["c_custkey"].to_numpy(zero_copy_only=False)
        for b in cust.map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
            .select(["c_custkey"]),
            batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    ]
    ckeys = np.sort(np.concatenate(key_blocks)) if key_blocks \
        else np.empty(0, np.int64)
    ckeys_ref = ray.put(ckeys)

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def filt_orders(b: pa.Table) -> pa.Table:
        keys = ray.get(ckeys_ref)
        keep = np.isin(b["o_custkey"].to_numpy(zero_copy_only=False), keys,
                       assume_unique=False)
        return pa.table({
            "o_orderkey": b["o_orderkey"].to_numpy(zero_copy_only=False)[keep]})

    sel = orders.map_batches(filt_orders, batch_format="pyarrow",
                             zero_copy_batch=True)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "rev_e2": scale_col(price * (1.0 - disc), 100.0)})

    j = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True) \
        .join(sel, join_type="inner", num_partitions=8,
              on=("l_orderkey",), right_on=("o_orderkey",))
    return j.groupby("l_orderkey").aggregate(
        Sum("rev_e2", alias_name="revenue_e2")) \
        .sort(["revenue_e2", "l_orderkey"], descending=[True, False]) \
        .limit(10) \
        .map_batches(lambda b: pa.table({
            "l_orderkey": b["l_orderkey"],
            "revenue_e2": b["revenue_e2"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_star_join() -> str:
    rev = sql_scale("l_extendedprice*(1.0-l_discount)", "100.0")
    return (
        "SELECT l_orderkey, "
        f"CAST(sum({rev}) AS BIGINT) AS revenue_e2 "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "GROUP BY l_orderkey "
        "ORDER BY revenue_e2 DESC, l_orderkey LIMIT 10")


# ---------------- pivot (conditional aggregation) ----------------

def q_pivot_status(sf_dir: str):
    """Linestatus pivoted to columns per returnflag: indicator columns
    computed vectorized per block, ONE groupby-sum — the
    `sum(CASE WHEN ...)` plan, which at scale beats a groupby on the
    (flag, status) pair + driver re-shape because the wide result is
    produced directly and the shuffle key stays low-cardinality."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus",
                             "l_extendedprice"])

    def pre(b: pa.Table) -> pa.Table:
        e2 = scale_col(b["l_extendedprice"].to_numpy(zero_copy_only=False),
                       100.0)
        is_f = pc.equal(b["l_linestatus"], "F").to_numpy(
            zero_copy_only=False).astype(np.int64)
        is_o = 1 - is_f
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "n_f": is_f, "n_o": is_o,
                         "rev_f_e2": e2 * is_f, "rev_o_e2": e2 * is_o})

    return li.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("l_returnflag").aggregate(
            Sum("n_f", alias_name="n_f"), Sum("n_o", alias_name="n_o"),
            Sum("rev_f_e2", alias_name="rev_f_e2"),
            Sum("rev_o_e2", alias_name="rev_o_e2")) \
        .map_batches(lambda b: pa.table({
            "l_returnflag": b["l_returnflag"],
            "n_f": b["n_f"].cast(pa.int64()),
            "n_o": b["n_o"].cast(pa.int64()),
            "rev_f_e2": b["rev_f_e2"].cast(pa.int64()),
            "rev_o_e2": b["rev_o_e2"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_pivot_status() -> str:
    e2 = sql_scale("l_extendedprice", "100.0")
    return (
        "SELECT l_returnflag, "
        "CAST(sum(CASE WHEN l_linestatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f, "
        "CAST(sum(CASE WHEN l_linestatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o, "
        f"CAST(sum(CASE WHEN l_linestatus='F' THEN {e2} ELSE 0 END) AS BIGINT) AS rev_f_e2, "
        f"CAST(sum(CASE WHEN l_linestatus='O' THEN {e2} ELSE 0 END) AS BIGINT) AS rev_o_e2 "
        "FROM lineitem GROUP BY l_returnflag")


# ---------------- salted two-stage aggregate (hot-key plan) ----------

SALT_BITS = 4


def q_group_agg_salted(sf_dir: str):
    """Revenue per returnflag via the EXPLICIT hot-key plan: 600k rows
    collapse onto 3 keys, so a naive groupby funnels everything into 3
    reducers.  Stage one groups on (key, salt16) — 48 reducers, each
    bounded at ~rows/16 — stage two merges the 48 partials on the bare
    key.  Identical answer, bounded per-reducer input; the salt column
    is derived from l_orderkey so it needs no extra entropy source
    (same two-column-salt shape as stages/partition.py).
    """
    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_orderkey",
                             "l_extendedprice", "l_discount"])

    def pre(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "salt": (ok * 2654435761 % (1 << 32)) >> (32 - SALT_BITS),
            "rev_e2": scale_col(price * (1.0 - disc), 100.0),
            "n": np.ones(b.num_rows, dtype=np.int64)})

    partial = li.map_batches(pre, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["l_returnflag", "salt"]).aggregate(
            Sum("n", alias_name="n"), Sum("rev_e2", alias_name="rev_e2"))
    return partial.map_batches(
        lambda b: pa.table({"l_returnflag": b["l_returnflag"],
                            "n": b["n"], "rev_e2": b["rev_e2"]}),
        batch_format="pyarrow") \
        .groupby("l_returnflag").aggregate(
            Sum("n", alias_name="n_rows"),
            Sum("rev_e2", alias_name="revenue_e2")) \
        .map_batches(lambda b: pa.table({
            "l_returnflag": b["l_returnflag"],
            "n_rows": b["n_rows"].cast(pa.int64()),
            "revenue_e2": b["revenue_e2"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_group_agg_salted() -> str:
    rev = sql_scale("l_extendedprice*(1.0-l_discount)", "100.0")
    return ("SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(sum({rev}) AS BIGINT) AS revenue_e2 "
            "FROM lineitem GROUP BY l_returnflag")


# ---------------- unnest / explode a list column ----------------

UNNEST_MAX_ID = 50


def q_unnest_embed(sf_dir: str):
    """Explode the embedding list column to (vec_id, pos, val_e6) rows
    — zero-copy Arrow list flatten (offsets + one values buffer, no
    Python loop).  The schema step every embedding-level op (per-dim
    stats, quantization) starts from; bounded here to vec_id <
    UNNEST_MAX_ID so the oracle result stays hashable."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def explode(b: pa.Table) -> pa.Table:
        keep = pc.less(b["vec_id"], UNNEST_MAX_ID)
        b = b.filter(keep)
        col = b["embedding"].combine_chunks()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        vals = col.flatten().to_numpy(zero_copy_only=False)
        ids = np.repeat(b["vec_id"].to_numpy(zero_copy_only=False), lens)
        # 1-based positions to match SQL generate_subscripts — fully
        # vectorized: global arange minus each row's start offset
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) \
            if len(lens) else np.empty(0, np.int64)
        pos = np.arange(len(vals)) - np.repeat(starts, lens) + 1
        return pa.table({"vec_id": ids.astype(np.int64),
                         "pos": pos.astype(np.int64),
                         "val_e6": scale_col(vals, 1e6)})

    return emb.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_unnest_embed() -> str:
    return (
        "SELECT CAST(vec_id AS BIGINT) AS vec_id, "
        "CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos, "
        "CAST(floor(CAST(unnest(embedding) AS DOUBLE)*1e6+0.5) AS BIGINT) "
        "  AS val_e6 "
        f"FROM embeddings WHERE vec_id < {UNNEST_MAX_ID}")


# ---------------- vectorized string kernels ----------------

def q_string_funcs(sf_dir: str):
    """Per-part string features via Arrow compute kernels (utf8_upper,
    count_substring, split_pattern) — the all-columnar form of the
    text-side per-record maps (M12 analog on a structured column); no
    Python-level string loop anywhere."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])

    def f(b: pa.Table) -> pa.Table:
        name = b["p_name"]
        n_tokens = pc.add(pc.count_substring(name, " "), 1)
        first = pc.list_element(pc.split_pattern(name, " "), 0)
        return pa.table({
            "p_partkey": b["p_partkey"],
            "name_upper": pc.utf8_upper(name),
            "name_len": pc.utf8_length(name).cast(pa.int64()),
            "n_tokens": n_tokens.cast(pa.int64()),
            "first_tok": first,
        })

    return part.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sql_string_funcs() -> str:
    return (
        "SELECT p_partkey, upper(p_name) AS name_upper, "
        "CAST(length(p_name) AS BIGINT) AS name_len, "
        "CAST(length(p_name) - length(replace(p_name, ' ', '')) + 1 "
        "  AS BIGINT) AS n_tokens, "
        "split_part(p_name, ' ', 1) AS first_tok "
        "FROM part")


# ---------------- rollup (hierarchy totals) ----------------

def q_rollup_revenue(sf_dir: str):
    """Revenue by returnflag plus the grand-total row (GROUP BY ROLLUP
    shape): the total is the exact integer sum of the 3 per-flag
    partials, computed on the already-aggregated tiny table — no
    second pass over the facts."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice", "l_discount"])

    def pre(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "rev_e2": scale_col(price * (1.0 - disc), 100.0)})

    agg = li.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("l_returnflag").aggregate(
            Count(alias_name="n_rows"), Sum("rev_e2", alias_name="revenue_e2"))
    pdf = agg.to_pandas()
    total = {"l_returnflag": "ALL",
             "n_rows": int(pdf["n_rows"].sum()),
             "revenue_e2": int(pdf["revenue_e2"].sum())}
    pdf = pdf.astype({"n_rows": "int64", "revenue_e2": "int64"})
    import pandas as pd
    pdf = pd.concat([pdf, pd.DataFrame([total])], ignore_index=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


def sql_rollup_revenue() -> str:
    rev = sql_scale("l_extendedprice*(1.0-l_discount)", "100.0")
    return (
        "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(sum({rev}) AS BIGINT) AS revenue_e2 "
        "FROM lineitem GROUP BY ROLLUP(l_returnflag)")


# ---------------- exact n-gram Jaccard near-dup pairs ----------------

JACCARD_E6_MIN = 500_000  # similarity >= 0.5
JACCARD_N = 3


def q_jaccard_pairs(sf_dir: str):
    """Exact word-3-gram Jaccard near-duplicate pairs over the FULL
    documents table — the inverted-index plan: explode each doc to its
    distinct grams (one row per doc, so per-doc set() makes the
    (doc_id, gram) table globally distinct with NO dedup shuffle),
    self-join on gram, count intersections per ordered pair, then
    |A∩B| / (|A| + |B| - |A∩B|).

    Same similarity metric as ``text/dedup.ngram_jaccard`` (the
    MinHash-LSH verify step, `dedup.py:250`), but exact, full-corpus.
    Scale note: the self-join is Σ_gram df² — fine while grams are
    rare (hottest gram here touches ~25 docs); at web scale the
    production route is the LSH prefilter (`near_dup_groups`) +
    `verify_pairs`, or a document-frequency cut on hot grams before
    the join.
    """
    out = _gram_pair_counts(sf_dir)

    def jac(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        e6 = np.floor(c * 1e6 / (na + nb - c) + 0.5).astype(np.int64)
        keep = e6 >= JACCARD_E6_MIN
        return pa.table({
            "doc_a": t["doc_a"].to_numpy(zero_copy_only=False)[keep],
            "doc_b": t["doc_b"].to_numpy(zero_copy_only=False)[keep],
            "jaccard_e6": e6[keep]})

    return out.map_batches(jac, batch_format="pyarrow", zero_copy_batch=True)


def _gram_pair_counts(sf_dir: str):
    """Shared inverted-index pair-count plan: Dataset of
    (doc_a, doc_b, c=|A∩B|, n_a=|A|, n_b=|B|) over distinct word
    JACCARD_N-grams, ordered doc_a < doc_b.  Exact integers — the
    final similarity metric (Jaccard / containment) is one stateless
    map on top."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def grams(b: pa.Table) -> pa.Table:
        ids_out, grams_out = [], []
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            w = (txt or "").split()
            if not w:
                continue
            if len(w) < JACCARD_N:
                gset = {" ".join(w)}
            else:
                gset = {" ".join(w[i:i + JACCARD_N])
                        for i in range(len(w) - JACCARD_N + 1)}
            gset.discard("")
            ids_out.extend([did] * len(gset))
            grams_out.extend(gset)
        return pa.table({"doc_id": np.asarray(ids_out, dtype=np.int64),
                         "gram": pa.array(grams_out, type=pa.string())})

    gd = docs.map_batches(grams, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    sizes = gd.groupby("doc_id").aggregate(Count(alias_name="n"))
    ga = gd.map_batches(lambda t: t.rename_columns(["doc_a", "gram"]),
                        batch_format="pyarrow")
    gb = gd.map_batches(lambda t: t.rename_columns(["doc_b", "gram_b"]),
                        batch_format="pyarrow")
    j = ga.join(gb, join_type="inner", num_partitions=8,
                on=("gram",), right_on=("gram_b",))

    def ordered(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        c = t["doc_b"].to_numpy(zero_copy_only=False)
        keep = a < c
        return pa.table({"doc_a": a[keep], "doc_b": c[keep]})

    inter = j.map_batches(ordered, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="c"))
    sa = sizes.map_batches(lambda t: t.rename_columns(["doc_a", "n_a"]),
                           batch_format="pyarrow")
    sb = sizes.map_batches(lambda t: t.rename_columns(["doc_b", "n_b"]),
                           batch_format="pyarrow")
    return inter.join(sa, join_type="inner", num_partitions=8, on=("doc_a",)) \
                .join(sb, join_type="inner", num_partitions=8, on=("doc_b",))


CONTAIN_E6_MIN = 600_000  # containment >= 0.6


def q_containment_pairs(sf_dir: str):
    """Exact n-gram CONTAINMENT near-duplicate pairs: |A∩B| / min(|A|,
    |B|) over the same distinct word-3-gram sets as `jaccard_pairs`.
    Containment is the asymmetric dedup signal Jaccard misses — a
    short document fully embedded in a long one (quote, boilerplate
    wrapper, truncated mirror) scores ~1.0 here but arbitrarily low
    Jaccard (Broder's resemblance-vs-containment distinction,
    SEQUENCES'97).  Same inverted-index plan + one stateless metric
    map; integer-exact e6 fixed point, floor(x+0.5) in both engines."""
    out = _gram_pair_counts(sf_dir)

    def cont(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        e6 = np.floor(c * 1e6 / np.minimum(na, nb) + 0.5).astype(np.int64)
        keep = e6 >= CONTAIN_E6_MIN
        return pa.table({
            "doc_a": t["doc_a"].to_numpy(zero_copy_only=False)[keep],
            "doc_b": t["doc_b"].to_numpy(zero_copy_only=False)[keep],
            "containment_e6": e6[keep]})

    return out.map_batches(cont, batch_format="pyarrow",
                           zero_copy_batch=True)


TOP_TOKENS_K = 20


def q_top_tokens(sf_dir: str):
    """Corpus vocabulary top-k: most frequent whitespace tokens over
    all documents.  Per-block partial counts (np.unique over the
    block's concatenated token stream) mean the shuffle carries one
    row per (block, distinct-token) — O(vocab) wire traffic — then one
    groupby-sum and a tiny sorted-limit merge.  Deterministic
    tie-break (count desc, token asc)."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = []
        for txt in b["text"].to_pylist():
            toks.extend((txt or "").split())
        if not toks:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table({"token": pa.array(list(u), type=pa.string()),
                         "n": c.astype(np.int64)})

    return docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("token").aggregate(Sum("n", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "token": b["token"], "n": b["n"].cast(pa.int64())}),
            batch_format="pyarrow") \
        .sort(["n", "token"], descending=[True, False]).limit(TOP_TOKENS_K)


def sql_top_tokens() -> str:
    return (
        r"WITH tok AS (SELECT unnest(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
        "FROM documents) "
        "SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok "
        "GROUP BY token ORDER BY n DESC, token "
        f"LIMIT {TOP_TOKENS_K}")


BIGRAM_K = 20


def q_word_bigrams(sf_dir: str):
    """Corpus top-k word bigrams — the n-gram language-model
    statistics pass every training corpus gets.  Same partial-count
    shape as ``q_top_tokens``: a document lives wholly in one row so
    bigram extraction needs NO shuffle; the wire carries one row per
    (block, distinct-bigram) into a single groupby-sum, then a tiny
    sorted-limit merge.  Deterministic tie-break (count desc, bigram
    asc)."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        grams: list[str] = []
        for txt in b["text"].to_pylist():
            t = (txt or "").split()
            grams.extend(f"{x} {y}" for x, y in zip(t[:-1], t[1:]))
        if not grams:
            return pa.table({"bigram": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        u, c = np.unique(np.asarray(grams, dtype=object), return_counts=True)
        return pa.table({"bigram": pa.array(list(u), type=pa.string()),
                         "n": c.astype(np.int64)})

    return docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("bigram").aggregate(Sum("n", alias_name="n")) \
        .map_batches(lambda b: pa.table({
            "bigram": b["bigram"], "n": b["n"].cast(pa.int64())}),
            batch_format="pyarrow") \
        .sort(["n", "bigram"], descending=[True, False]).limit(BIGRAM_K)


def sql_word_bigrams() -> str:
    return (
        r"WITH t AS (SELECT list_filter(string_split_regex(text, '\s+'), "
        r"x -> x <> '') AS toks FROM documents), "
        "ix AS (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i "
        "FROM t WHERE len(toks) >= 2), "
        "g AS (SELECT toks[i] || ' ' || toks[i+1] AS bigram FROM ix) "
        "SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM g "
        "GROUP BY bigram ORDER BY n DESC, bigram "
        f"LIMIT {BIGRAM_K}")


def q_textrank_terms(sf_dir: str):
    """TextRank keyword extraction: integer dyadic-damping PageRank
    over the adjacent-token word graph (text/textrank.py) — the
    corpus-side twin of the link-graph PageRank family, exact under
    any reduction order so the unrolled oracle matches bit for bit."""
    from igpm_pem_ray.text.textrank import textrank_terms

    docs = read_table(sf_dir, "documents", columns=["text"])
    return textrank_terms(docs)


def sql_textrank(n_iters: int | None = None, k: int | None = None) -> str:
    from igpm_pem_ray.text.textrank import (TEXTRANK_ITERS, TEXTRANK_K,
                                            TEXTRANK_S)

    n_iters = TEXTRANK_ITERS if n_iters is None else n_iters
    k = TEXTRANK_K if k is None else k
    parts = [
        r"t AS (SELECT list_filter(string_split_regex(text, '\s+'), "
        r"x -> x <> '') AS toks FROM documents)",
        "ix AS (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i "
        "FROM t WHERE len(toks) >= 2)",
        "wp AS (SELECT toks[i] AS a, toks[i+1] AS b FROM ix "
        "WHERE toks[i] <> toks[i+1])",
        "up AS (SELECT DISTINCT CASE WHEN a < b THEN a ELSE b END AS a, "
        "CASE WHEN a < b THEN b ELSE a END AS b FROM wp)",
        "we AS (SELECT a, b FROM up UNION ALL SELECT b AS a, a AS b FROM up)",
        "deg AS (SELECT a AS w, CAST(count(*) AS BIGINT) AS d "
        "FROM we GROUP BY a)",
        f"r0 AS (SELECT w, CAST({TEXTRANK_S} AS BIGINT) AS r FROM deg)",
    ]
    for i in range(1, n_iters + 1):
        p = f"r{i - 1}"
        parts.append(
            f"c{i} AS (SELECT r.w, r.r // d.d AS c FROM {p} r "
            f"JOIN deg d ON r.w = d.w), "
            f"m{i} AS (SELECT e.b AS w, SUM(c.c) AS m FROM we e "
            f"JOIN c{i} c ON e.a = c.w GROUP BY e.b), "
            f"r{i} AS (SELECT d.w, {TEXTRANK_S} // 8 + "
            f"(7 * COALESCE(m.m, 0)) // 8 AS r FROM deg d "
            f"LEFT JOIN m{i} m ON d.w = m.w)")
    body = ", ".join(parts)
    return (f"WITH {body} SELECT w AS term, CAST(r AS BIGINT) AS rank "
            f"FROM r{n_iters} ORDER BY rank DESC, term LIMIT {k}")


def q_doc_tokens_bpe(sf_dir: str):
    """BPE-ish regex token count per document (words incl. simple
    contractions + individual punctuation, `text/analysis._TOKEN`) —
    the driver-brief 'whitespace + BPE-ish regex' token-counting pair
    with `doc_tokens`.  Regex compiled once at module import; pandas
    str.findall is the vectorized hot path."""
    import pandas as pd

    from igpm_pem_ray.text.analysis import bpe_ish_token_count

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "n_tokens_bpe": bpe_ish_token_count(df["text"])})

    return docs.map_batches(f, batch_format="pandas")


def sql_doc_tokens_bpe() -> str:
    from igpm_pem_ray.text.analysis import _TOKEN

    pat = _TOKEN.pattern.replace("'", "''")  # same RE2-compatible regex
    return ("SELECT doc_id, CAST(length(regexp_extract_all(text, "
            f"'{pat}')) AS BIGINT) AS n_tokens_bpe FROM documents")


def q_tfidf_terms(sf_dir: str):
    """Document-term frequency statistics — the TF-IDF sufficient
    statistics table (doc_id, token, tf, df, n_docs) over the corpus.

    The distributed work is all here: per-block tokenize + per-doc
    term counts (each document lives wholly in one row, so tf needs
    NO shuffle), one vocab-partitioned groupby for df (O(doc-term
    pairs) wire traffic), one hash join tf x df on token.  The float
    score tf*ln(n_docs/df) is deliberately NOT emitted: per the
    repo's integer-exact convention (see jaccard link prediction —
    libm ln is not bit-stable across engines) the exact integer
    sufficient statistics ARE the contract, and scoring is a trivial
    stateless post-map the caller applies.

    Scale notes: df join is keyed on token so a 100M-term vocabulary
    hash-partitions instead of broadcasting; n_docs is a scalar
    aggregate shipped by closure, not a crossed column."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = read_table(sf_dir, "documents", columns=["doc_id"]).count()

    def tf_part(b: pa.Table) -> pa.Table:
        ids, toks, tfs = [], [], []
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            t = (txt or "").split()
            if not t:
                continue
            u, c = np.unique(np.asarray(t, dtype=object), return_counts=True)
            ids.append(np.full(len(u), did, dtype=np.int64))
            toks.append(u)
            tfs.append(c.astype(np.int64))
        if not ids:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "token": pa.array([], type=pa.string()),
                             "tf": pa.array([], type=pa.int64())})
        return pa.table({"doc_id": np.concatenate(ids),
                         "token": pa.array(list(np.concatenate(toks)),
                                           type=pa.string()),
                         "tf": np.concatenate(tfs)})

    tf = docs.map_batches(tf_part, batch_format="pyarrow",
                          zero_copy_batch=True)
    df = tf.groupby("token").aggregate(Count(alias_name="df")) \
           .map_batches(lambda b: pa.table({
               "token_df": b["token"], "df": b["df"].cast(pa.int64())}),
               batch_format="pyarrow")
    joined = tf.join(df, join_type="inner", num_partitions=8,
                     on=("token",), right_on=("token_df",))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"], "token": b["token"],
            "tf": b["tf"], "df": b["df"],
            "n_docs": np.full(b.num_rows, n_docs, dtype=np.int64)})

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_tfidf_terms() -> str:
    return (
        r"WITH tok AS (SELECT doc_id, unnest(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
        "FROM documents), "
        "tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY doc_id, token), "
        "df AS (SELECT token, CAST(count(*) AS BIGINT) AS df "
        "FROM tf GROUP BY token) "
        "SELECT tf.doc_id, tf.token, tf.tf, df.df, "
        "(SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs "
        "FROM tf JOIN df USING (token)")


def q_approx_distinct_users(sf_dir: str):
    """Approximate distinct users per event type — mergeable HLL
    sketch (`text/sketch.py`): per-block register partials, one
    Max-merge groupby, driver estimate over groups x 1024 rows.  No
    SQL oracle (DuckDB's approx_count_distinct uses a different
    sketch); accuracy is pytest-bounded against the exact count
    (tests/test_text.py)."""
    from igpm_pem_ray.text.sketch import approx_distinct_per_group

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    return approx_distinct_per_group(ev, "event_type", "user_id")


def sql_jaccard_pairs() -> str:
    return (
        r"WITH t AS (SELECT doc_id, "
        r"list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks "
        "FROM documents), "
        "ix AS (SELECT doc_id, toks, "
        f"unnest(generate_series(1, greatest(len(toks)-{JACCARD_N - 1}, 1))) "
        "AS i FROM t), "
        f"g AS (SELECT doc_id, CASE WHEN len(toks) < {JACCARD_N} "
        "THEN array_to_string(toks, ' ') "
        f"ELSE array_to_string(toks[i:i+{JACCARD_N - 1}], ' ') END AS gram "
        "FROM ix), "
        "gd AS (SELECT DISTINCT doc_id, gram FROM g WHERE gram <> ''), "
        "sz AS (SELECT doc_id, count(*) AS n FROM gd GROUP BY 1), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "count(*) AS c FROM gd a JOIN gd b ON a.gram = b.gram "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, "
        "CAST(floor(i.c*1e6/(sa.n + sb.n - i.c)+0.5) AS BIGINT) AS jaccard_e6 "
        "FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a "
        "JOIN sz sb ON sb.doc_id = i.doc_b "
        "WHERE CAST(floor(i.c*1e6/(sa.n + sb.n - i.c)+0.5) AS BIGINT) "
        f">= {JACCARD_E6_MIN}")


def sql_containment_pairs() -> str:
    return (
        r"WITH t AS (SELECT doc_id, "
        r"list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks "
        "FROM documents), "
        "ix AS (SELECT doc_id, toks, "
        f"unnest(generate_series(1, greatest(len(toks)-{JACCARD_N - 1}, 1))) "
        "AS i FROM t), "
        f"g AS (SELECT doc_id, CASE WHEN len(toks) < {JACCARD_N} "
        "THEN array_to_string(toks, ' ') "
        f"ELSE array_to_string(toks[i:i+{JACCARD_N - 1}], ' ') END AS gram "
        "FROM ix), "
        "gd AS (SELECT DISTINCT doc_id, gram FROM g WHERE gram <> ''), "
        "sz AS (SELECT doc_id, count(*) AS n FROM gd GROUP BY 1), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "count(*) AS c FROM gd a JOIN gd b ON a.gram = b.gram "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, "
        "CAST(floor(i.c*1e6/least(sa.n, sb.n)+0.5) AS BIGINT) "
        "AS containment_e6 "
        "FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a "
        "JOIN sz sb ON sb.doc_id = i.doc_b "
        "WHERE CAST(floor(i.c*1e6/least(sa.n, sb.n)+0.5) AS BIGINT) "
        f">= {CONTAIN_E6_MIN}")


# -------- BM25 ranking (log-free ratio-idf variant) --------

BM25_TERMS = ["join", "hash", "stream"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def q_bm25_topk(sf_dir: str):
    """Top-k documents for a fixed 3-term query under BM25 with the
    RATIO idf variant idf(t) = (N - df + 0.5) / (df + 0.5) — log-free
    per the repo's bit-stability convention (libm ln differs across
    engines in the last ulp; see q_tfidf_terms / jaccard link
    prediction).  The per-term score expression and the 3-term sum
    are written in ONE fixed parse order in both engines, so the e6
    fixed-point hashes match.

    Plan (shuffle-minimal): one tokenize map computes per-doc
    (dl, tf per query term) — a doc lives in one row, NO shuffle;
    the global (df per term, total tokens, n_docs) are a 3-row + two
    scalar aggregate broadcast by closure; a second stateless map
    scores; sort + limit merges top-k."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms = BM25_TERMS

    def tf_dl(b: pa.Table) -> pa.Table:
        cols = {"doc_id": [], "dl": []}
        tf_cols = {t: [] for t in terms}
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            toks = (txt or "").split()
            cols["doc_id"].append(did)
            cols["dl"].append(len(toks))
            if toks:
                u, c = np.unique(np.asarray(toks, dtype=object),
                                 return_counts=True)
                lut = dict(zip(u.tolist(), c.tolist()))
            else:
                lut = {}
            for t in terms:
                tf_cols[t].append(int(lut.get(t, 0)))
        out = {"doc_id": pa.array(cols["doc_id"], pa.int64()),
               "dl": pa.array(cols["dl"], pa.int64())}
        for t in terms:
            out[f"tf_{t}"] = pa.array(tf_cols[t], pa.int64())
        return pa.table(out)

    stats_ds = docs.map_batches(tf_dl, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    # tiny global aggregates (3 dfs + 2 scalars), shipped by closure
    from ray.data.aggregate import Sum

    aggs = [Sum("dl", alias_name="total_tokens")]
    pdf = stats_ds.map_batches(
        lambda b: pa.table(
            {"dl": b["dl"],
             **{f"has_{t}": (b[f"tf_{t}"].to_numpy(zero_copy_only=False)
                             > 0).astype(np.int64) for t in terms}}),
        batch_format="pyarrow") \
        .sum(["dl"] + [f"has_{t}" for t in terms])
    total_tokens = float(pdf["sum(dl)"])
    df = {t: float(pdf[f"sum(has_{t})"]) for t in terms}
    n_docs = float(docs.count())
    avgdl = total_tokens / n_docs

    def score(b: pa.Table) -> pa.Table:
        dl = b["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = None
        for t in terms:  # fixed order: s1 + s2 + s3
            tf = b[f"tf_{t}"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            st = idf * (tf * (BM25_K1 + 1.0)) \
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
            s = st if s is None else s + st
        return pa.table({"doc_id": b["doc_id"],
                         "score_e6": scale_col(s, 1e6)})

    ranked = stats_ds.map_batches(score, batch_format="pyarrow") \
        .sort(["score_e6", "doc_id"], descending=[True, False]) \
        .limit(BM25_TOPK)
    t = pa.Table.from_pandas(ranked.to_pandas(), preserve_index=False)
    return t.select(["doc_id", "score_e6"])


def sql_bm25_topk() -> str:
    k1, bb = repr(BM25_K1), repr(BM25_B)
    tok = (r"tok AS (SELECT doc_id, unnest(list_filter("
           r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
           "FROM documents), "
           "dl AS (SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS DOUBLE) "
           "AS dl FROM documents d LEFT JOIN (SELECT doc_id, count(*) "
           "AS n FROM tok GROUP BY doc_id) c ON c.doc_id = d.doc_id), "
           "g AS (SELECT CAST(sum(dl) AS DOUBLE) AS total, "
           "CAST(count(*) AS DOUBLE) AS n, "
           "CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl "
           "FROM dl)")
    parts = [tok]
    for t in BM25_TERMS:
        parts.append(
            f"tf_{t} AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf "
            f"FROM tok WHERE token = '{t}' GROUP BY doc_id), "
            f"df_{t} AS (SELECT CAST(count(*) AS DOUBLE) AS df "
            f"FROM tf_{t})")
    term_exprs = []
    for t in BM25_TERMS:
        term_exprs.append(
            f"(((SELECT n FROM g) - (SELECT df FROM df_{t}) + 0.5)"
            f"/((SELECT df FROM df_{t}) + 0.5)) "
            f"* (COALESCE(tf_{t}.tf, 0.0) * ({k1} + 1.0)) "
            f"/ (COALESCE(tf_{t}.tf, 0.0) + {k1} * (1.0 - {bb} "
            f"+ {bb} * dl.dl / (SELECT avgdl FROM g)))")
    joins = " ".join(
        f"LEFT JOIN tf_{t} ON tf_{t}.doc_id = dl.doc_id"
        for t in BM25_TERMS)
    score = " + ".join(term_exprs)
    return (f"WITH {', '.join(parts)} "
            f"SELECT dl.doc_id, "
            f"CAST(floor(({score})*1e6 + 0.5) AS BIGINT) AS score_e6 "
            f"FROM dl {joins} "
            f"ORDER BY score_e6 DESC, dl.doc_id LIMIT {BM25_TOPK}")


# -------- 5-table chain join (TPC-H Q5 shape) --------

def q_region_revenue(sf_dir: str):
    """Revenue per nation of one region through the full dimension
    chain region -> nation -> customer -> orders -> lineitem.  Plan:
    the region/nation hop is a broadcast scalar map (tiny tables,
    ray.put once); customer -> (custkey, nationkey) filtered by
    np.isin against the broadcast nation keys; TWO hash joins chain
    the fact hops (orders |x| customer, lineitem |x| orders) keyed on
    their natural keys; one low-cardinality groupby-sum ends it.
    The multi-hop composition stresses join chaining the single-hop
    queries don't."""
    nat = read_table(sf_dir, "nation",
                     columns=["n_nationkey", "n_name", "n_regionkey"]) \
        .to_pandas()
    reg = read_table(sf_dir, "region",
                     columns=["r_regionkey", "r_name"]).to_pandas()
    asia = int(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    nat = nat[nat["n_regionkey"] == asia]
    nkeys = np.sort(nat["n_nationkey"].to_numpy().astype(np.int64))
    nname = {int(k): v for k, v in zip(nat["n_nationkey"], nat["n_name"])}
    nref = ray.put((nkeys, nname))

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey"])

    def filt_cust(b: pa.Table) -> pa.Table:
        keys, _ = ray.get(nref)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(nk, keys)
        return pa.table({"c_custkey2": b["c_custkey"].to_numpy(
                             zero_copy_only=False)[keep],
                         "nationkey": nk[keep].astype(np.int64)})

    cu = cust.map_batches(filt_cust, batch_format="pyarrow",
                          zero_copy_batch=True)
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    oc = orders.join(cu, join_type="inner", num_partitions=8,
                     on=("o_custkey",), right_on=("c_custkey2",)) \
        .select_columns(["o_orderkey", "nationkey"])

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "rev_e2": scale_col(price * (1.0 - disc), 100.0)})

    j = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True) \
        .join(oc, join_type="inner", num_partitions=8,
              on=("l_orderkey",), right_on=("o_orderkey",))
    agg = j.groupby("nationkey").aggregate(
        Sum("rev_e2", alias_name="revenue_e2"))

    def name(b: pa.Table) -> pa.Table:
        _, lut = ray.get(nref)
        nk = b["nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([lut[int(k)] for k in nk], pa.string()),
            "revenue_e2": b["revenue_e2"].cast(pa.int64())})

    return agg.map_batches(name, batch_format="pyarrow")


def sql_region_revenue() -> str:
    rev = sql_scale("l_extendedprice*(1.0-l_discount)", "100.0")
    return (
        "SELECT n_name, "
        f"CAST(sum({rev}) AS BIGINT) AS revenue_e2 "
        "FROM region JOIN nation ON n_regionkey = r_regionkey "
        "JOIN customer ON c_nationkey = n_nationkey "
        "JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE r_name = 'ASIA' "
        "GROUP BY n_name ORDER BY n_name")


# -------- per-group mode (argmax count, deterministic ties) --------

def q_mode_priority(sf_dir: str):
    """Most frequent o_orderpriority per o_orderstatus (ties -> the
    smallest value) — the argmax-per-group pattern as a standalone
    relational operator: one (group, value) count groupby shrinks the
    data to O(groups x values); the final argmax over that tiny table
    is a driver sort (the same shape LP's argmax uses)."""
    from ray.data.aggregate import Count

    od = read_table(sf_dir, "orders",
                    columns=["o_orderstatus", "o_orderpriority"])
    counts = od.groupby(["o_orderstatus", "o_orderpriority"]) \
        .aggregate(Count(alias_name="n"))
    pdf = counts.to_pandas()
    pdf = pdf.sort_values(["o_orderstatus", "n", "o_orderpriority"],
                          ascending=[True, False, True])
    top = pdf.groupby("o_orderstatus", as_index=False).first()
    return pa.table({"o_orderstatus": top["o_orderstatus"].to_numpy(),
                     "mode_priority": top["o_orderpriority"].to_numpy(),
                     "n": top["n"].to_numpy().astype(np.int64)})


def sql_mode_priority() -> str:
    return (
        "WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n "
        "FROM orders GROUP BY o_orderstatus, o_orderpriority), "
        "r AS (SELECT o_orderstatus, o_orderpriority, n, row_number() "
        "OVER (PARTITION BY o_orderstatus ORDER BY n DESC, "
        "o_orderpriority) AS rn FROM c) "
        "SELECT o_orderstatus, o_orderpriority AS mode_priority, "
        "CAST(n AS BIGINT) AS n FROM r WHERE rn = 1 ORDER BY o_orderstatus")


# -------- grouped Pearson correlation (sufficient statistics) --------

def q_corr_price_qty(sf_dir: str):
    """Pearson correlation of (l_quantity, l_extendedprice) per
    l_returnflag via exact integer sufficient statistics (n, Sx, Sy,
    Sxy, Sxx, Syy over e2-scaled ints — same no-naive-float plan as
    assortativity/group_stats) + ONE fixed-order float expression per
    group, e6."""
    from ray.data.aggregate import Count, Sum

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])

    def pre(b: pa.Table) -> pa.Table:
        x = scale_col(b["l_quantity"].to_numpy(zero_copy_only=False), 100.0)
        y = scale_col(b["l_extendedprice"].to_numpy(zero_copy_only=False),
                      100.0)
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "x": x, "y": y, "xy": x * y,
                         "xx": x * x, "yy": y * y})

    agg = li.map_batches(pre, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("l_returnflag").aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"), Sum("y", alias_name="sy"),
            Sum("xy", alias_name="sxy"), Sum("xx", alias_name="sxx"),
            Sum("yy", alias_name="syy"))
    pdf = agg.to_pandas().sort_values("l_returnflag")
    n = pdf["n"].to_numpy().astype(np.float64)
    sx = pdf["sx"].to_numpy().astype(np.float64)
    sy = pdf["sy"].to_numpy().astype(np.float64)
    sxy = pdf["sxy"].to_numpy().astype(np.float64)
    sxx = pdf["sxx"].to_numpy().astype(np.float64)
    syy = pdf["syy"].to_numpy().astype(np.float64)
    r = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx)
                                      * (n * syy - sy * sy))
    return pa.table({
        "l_returnflag": pdf["l_returnflag"].to_numpy(),
        "n": pdf["n"].to_numpy().astype(np.int64),
        "corr_e6": np.floor(r * 1e6 + 0.5).astype(np.int64)})


def sql_corr_price_qty() -> str:
    x = "CAST(floor(l_quantity*100.0+0.5) AS BIGINT)"
    y = "CAST(floor(l_extendedprice*100.0+0.5) AS BIGINT)"
    return (
        f"WITH s AS (SELECT l_returnflag, "
        f"CAST(count(*) AS DOUBLE) AS n, "
        f"CAST(sum({x}) AS DOUBLE) AS sx, "
        f"CAST(sum({y}) AS DOUBLE) AS sy, "
        f"CAST(sum({x}*{y}) AS DOUBLE) AS sxy, "
        f"CAST(sum({x}*{x}) AS DOUBLE) AS sxx, "
        f"CAST(sum({y}*{y}) AS DOUBLE) AS syy "
        f"FROM lineitem GROUP BY l_returnflag) "
        f"SELECT l_returnflag, CAST(n AS BIGINT) AS n, "
        f"CAST(floor((n*sxy - sx*sy)/sqrt((n*sxx - sx*sx)"
        f"*(n*syy - sy*sy))*1e6 + 0.5) AS BIGINT) AS corr_e6 "
        f"FROM s ORDER BY l_returnflag")


# -------- grouped OLS (normal equations on sufficient statistics) --------

def q_ols_price_qty(sf_dir: str):
    """Per-returnflag least-squares fit extendedprice ~ quantity from
    the SAME exact integer sufficient statistics as the correlation
    operator; slope/intercept are one fixed-order float expression
    each (e6)."""
    from ray.data.aggregate import Count, Sum

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])

    def pre(b: pa.Table) -> pa.Table:
        x = scale_col(b["l_quantity"].to_numpy(zero_copy_only=False), 100.0)
        y = scale_col(b["l_extendedprice"].to_numpy(zero_copy_only=False),
                      100.0)
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "x": x, "y": y, "xy": x * y, "xx": x * x})

    agg = li.map_batches(pre, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("l_returnflag").aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"), Sum("y", alias_name="sy"),
            Sum("xy", alias_name="sxy"), Sum("xx", alias_name="sxx"))
    pdf = agg.to_pandas().sort_values("l_returnflag")
    n = pdf["n"].to_numpy().astype(np.float64)
    sx = pdf["sx"].to_numpy().astype(np.float64)
    sy = pdf["sy"].to_numpy().astype(np.float64)
    sxy = pdf["sxy"].to_numpy().astype(np.float64)
    sxx = pdf["sxx"].to_numpy().astype(np.float64)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pa.table({
        "l_returnflag": pdf["l_returnflag"].to_numpy(),
        "n": pdf["n"].to_numpy().astype(np.int64),
        "slope_e6": np.floor(slope * 1e6 + 0.5).astype(np.int64),
        "intercept_e6": np.floor(intercept * 1e6 + 0.5).astype(np.int64)})


def sql_ols_price_qty() -> str:
    x = "CAST(floor(l_quantity*100.0+0.5) AS BIGINT)"
    y = "CAST(floor(l_extendedprice*100.0+0.5) AS BIGINT)"
    return (
        f"WITH s AS (SELECT l_returnflag, "
        f"CAST(count(*) AS DOUBLE) AS n, "
        f"CAST(sum({x}) AS DOUBLE) AS sx, "
        f"CAST(sum({y}) AS DOUBLE) AS sy, "
        f"CAST(sum({x}*{y}) AS DOUBLE) AS sxy, "
        f"CAST(sum({x}*{x}) AS DOUBLE) AS sxx "
        f"FROM lineitem GROUP BY l_returnflag), "
        f"fit AS (SELECT l_returnflag, n, "
        f"(n*sxy - sx*sy)/(n*sxx - sx*sx) AS slope, sx, sy FROM s) "
        f"SELECT l_returnflag, CAST(n AS BIGINT) AS n, "
        f"CAST(floor(slope*1e6 + 0.5) AS BIGINT) AS slope_e6, "
        f"CAST(floor((sy - slope*sx)/n*1e6 + 0.5) AS BIGINT) "
        f"AS intercept_e6 FROM fit ORDER BY l_returnflag")


# -------- per-dimension embedding statistics (vector columnar) --------

def q_embed_dim_stats(sf_dir: str):
    """Per-dimension mean of the embedding vectors — the vector-
    columnar aggregate: each block computes ONE (d,) partial sum via
    a zero-copy Arrow list flatten + reshape (embeddings are fixed
    width), so the shuffle is O(blocks x d) scalars, never row data.
    (dim, n, sum_e6, mean_e6)."""
    emb = read_table(sf_dir, "embeddings", columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        flat = col.combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        n = b.num_rows
        d = len(flat) // max(n, 1)
        x = flat.reshape(n, d) if n else np.zeros((0, 0))
        s = scale_col(x, 1e6).sum(axis=0) if n else np.zeros(0, np.int64)
        return pa.table({"dim": np.arange(d, dtype=np.int64),
                         "n": np.full(d, n, np.int64),
                         "sum_e6": s})

    from ray.data.aggregate import Sum as _Sum

    agg = emb.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("dim").aggregate(_Sum("n", alias_name="n"),
                                  _Sum("sum_e6", alias_name="sum_e6"))
    pdf = agg.to_pandas().sort_values("dim")
    n = pdf["n"].to_numpy().astype(np.int64)
    s = pdf["sum_e6"].to_numpy().astype(np.int64)
    mean = s.astype(np.float64) / n.astype(np.float64)
    return pa.table({"dim": pdf["dim"].to_numpy().astype(np.int64),
                     "n": n, "sum_e6": s,
                     "mean_e6": np.floor(mean + 0.5).astype(np.int64)})


def sql_embed_dim_stats() -> str:
    return (
        "WITH u AS (SELECT unnest(embedding) AS x, "
        "generate_subscripts(embedding, 1) - 1 AS dim FROM embeddings) "
        "SELECT CAST(dim AS BIGINT) AS dim, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(floor(x*1e6+0.5) AS BIGINT)) AS BIGINT) "
        "AS sum_e6, "
        "CAST(floor(CAST(sum(CAST(floor(x*1e6+0.5) AS BIGINT)) "
        "AS DOUBLE)/CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) "
        "AS mean_e6 FROM u GROUP BY dim ORDER BY dim")


# -------- data-quality constraint validation --------

def q_dq_checks(sf_dir: str):
    """Distributed data-quality audit — one row per constraint with
    its violation count: FK orphan check (orders.o_custkey must exist
    in customer — broadcast key filter, the anti-join shape), range
    check (l_quantity in [1, 50]), positivity (o_totalprice > 0),
    key-uniqueness (duplicate o_orderkey count via groupby), null
    check (events.ts).  Composes the engine's own primitives; each
    check is a per-block vectorized partial + scalar aggregate."""
    import ray as _ray

    rows = []

    cust_keys = np.sort(read_table(sf_dir, "customer",
                                   columns=["c_custkey"])
                        .to_pandas()["c_custkey"].to_numpy())
    kref = _ray.put(cust_keys)
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey",
                                 "o_totalprice"]).materialize()

    def fk_viol(b: pa.Table) -> pa.Table:
        keys = _ray.get(kref)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        n = int((~np.isin(ck, keys)).sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    rows.append(("orders_custkey_fk",
                 int(orders.map_batches(fk_viol, batch_format="pyarrow")
                     .sum("n") or 0)))

    def price_viol(b: pa.Table) -> pa.Table:
        tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int((tp <= 0).sum())], pa.int64())})

    rows.append(("orders_totalprice_positive",
                 int(orders.map_batches(price_viol, batch_format="pyarrow")
                     .sum("n") or 0)))

    from ray.data.aggregate import Count

    dup = orders.groupby("o_orderkey").aggregate(Count(alias_name="c")) \
        .filter(expr="c > 1")

    def dup_extra(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int((c - 1).sum())], pa.int64())})

    rows.append(("orders_orderkey_unique",
                 int(dup.map_batches(dup_extra, batch_format="pyarrow")
                     .sum("n") or 0)))

    li = read_table(sf_dir, "lineitem", columns=["l_quantity"])

    def qty_viol(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(
            [int(((q < 1) | (q > 50)).sum())], pa.int64())})

    rows.append(("lineitem_quantity_range",
                 int(li.map_batches(qty_viol, batch_format="pyarrow")
                     .sum("n") or 0)))

    ev = read_table(sf_dir, "events", columns=["ts"])

    def null_viol(b: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array(
            [int(b["ts"].null_count)], pa.int64())})

    rows.append(("events_ts_not_null",
                 int(ev.map_batches(null_viol, batch_format="pyarrow")
                     .sum("n") or 0)))

    rows.sort()
    return pa.table({"check_name": pa.array([r[0] for r in rows],
                                            pa.string()),
                     "n_violations": pa.array([r[1] for r in rows],
                                              pa.int64())})


def sql_dq_checks() -> str:
    return (
        "SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations "
        "FROM ("
        "SELECT 'orders_custkey_fk' AS check_name, "
        "(SELECT count(*) FROM orders o WHERE NOT EXISTS "
        "(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) "
        "AS n_violations "
        "UNION ALL SELECT 'orders_totalprice_positive', "
        "(SELECT count(*) FROM orders WHERE o_totalprice <= 0) "
        "UNION ALL SELECT 'orders_orderkey_unique', "
        "(SELECT COALESCE(sum(c - 1), 0) FROM (SELECT count(*) AS c "
        "FROM orders GROUP BY o_orderkey HAVING count(*) > 1)) "
        "UNION ALL SELECT 'lineitem_quantity_range', "
        "(SELECT count(*) FROM lineitem WHERE l_quantity < 1 "
        "OR l_quantity > 50) "
        "UNION ALL SELECT 'events_ts_not_null', "
        "(SELECT count(*) FROM events WHERE ts IS NULL)"
        ") ORDER BY check_name")


# -------- table diff (version comparison) --------

def q_table_diff(sf_dir: str):
    """Diff two versions of the orders table — v2 is a deterministic
    derivation (every 7th order dropped, every 5th price bumped 10%)
    — into (status, n) counts {added, removed, changed, unchanged}.
    Executed as a tagged union + ONE groupby(key) aggregate carrying
    each side's value hash (the join-as-aggregation shape from
    q_join_outer): at 10^12 rows this is one shuffle, no driver
    state."""
    from ray.data.aggregate import Count, Sum

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def v1(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        v = scale_col(b["o_totalprice"].to_numpy(zero_copy_only=False),
                      100.0)
        return pa.table({"k": k, "v1": v, "v2": np.zeros(len(k), np.int64),
                         "side": np.ones(len(k), np.int64)})

    def v2(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        v = scale_col(b["o_totalprice"].to_numpy(zero_copy_only=False),
                      100.0)
        keep = k % 7 != 0
        k, v = k[keep], v[keep]
        v = np.where(k % 5 == 0,
                     np.floor(v * 1.1 + 0.5).astype(np.int64), v)
        return pa.table({"k": k, "v1": np.zeros(len(k), np.int64),
                         "v2": v, "side": np.full(len(k), 2, np.int64)})

    left = orders.map_batches(v1, batch_format="pyarrow",
                              zero_copy_batch=True)
    right = orders.map_batches(v2, batch_format="pyarrow",
                               zero_copy_batch=True)
    merged = left.union(right).groupby("k").aggregate(
        Sum("v1", alias_name="v1"), Sum("v2", alias_name="v2"),
        Sum("side", alias_name="side"))

    def classify(b: pa.Table) -> pa.Table:
        side = b["side"].to_numpy(zero_copy_only=False)
        v1c = b["v1"].to_numpy(zero_copy_only=False)
        v2c = b["v2"].to_numpy(zero_copy_only=False)
        status = np.where(side == 1, "removed",
                          np.where(side == 2, "added",
                                   np.where(v1c == v2c, "unchanged",
                                            "changed")))
        return pa.table({"status": pa.array(status.tolist(), pa.string())})

    return merged.map_batches(classify, batch_format="pyarrow") \
        .groupby("status").aggregate(Count(alias_name="n"))


def sql_table_diff() -> str:
    v = "CAST(floor(o_totalprice*100.0+0.5) AS BIGINT)"
    return (
        f"WITH v1 AS (SELECT o_orderkey AS k, {v} AS val FROM orders), "
        f"v2 AS (SELECT o_orderkey AS k, CASE WHEN o_orderkey % 5 = 0 "
        f"THEN CAST(floor({v} * 1.1 + 0.5) AS BIGINT) ELSE {v} END AS val "
        f"FROM orders WHERE o_orderkey % 7 <> 0), "
        f"d AS (SELECT COALESCE(v1.k, v2.k) AS k, "
        f"CASE WHEN v2.k IS NULL THEN 'removed' "
        f"WHEN v1.k IS NULL THEN 'added' "
        f"WHEN v1.val = v2.val THEN 'unchanged' ELSE 'changed' END "
        f"AS status FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k) "
        f"SELECT status, CAST(count(*) AS BIGINT) AS n FROM d "
        f"GROUP BY status ORDER BY status")


# -------- CUBE grouping sets --------

def q_cube_revenue(sf_dir: str):
    """Revenue by CUBE(returnflag, linestatus) — all four grouping
    sets from ONE pre-aggregated (flag, status) partial: the fine
    groupby runs once over the fact table, the three coarser sets
    re-aggregate the tiny partial (no second fact scan), 'ALL'
    sentinel for rolled-up dimensions."""
    from ray.data.aggregate import Sum as _Sum

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus",
                             "l_extendedprice"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "f": b["l_returnflag"], "s": b["l_linestatus"],
            "rev_e2": scale_col(
                b["l_extendedprice"].to_numpy(zero_copy_only=False),
                100.0)})

    fine = li.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["f", "s"]).aggregate(_Sum("rev_e2", alias_name="rev")) \
        .to_pandas()
    rows = []
    for _, r in fine.iterrows():
        rows.append((r["f"], r["s"], int(r["rev"])))
    import collections

    agg_f = collections.Counter()
    agg_s = collections.Counter()
    total = 0
    for f, s_, v in rows:
        agg_f[f] += v
        agg_s[s_] += v
        total += v
    out = rows \
        + [(f, "ALL", v) for f, v in sorted(agg_f.items())] \
        + [("ALL", s_, v) for s_, v in sorted(agg_s.items())] \
        + [("ALL", "ALL", total)]
    out.sort()
    return pa.table({
        "l_returnflag": pa.array([r[0] for r in out], pa.string()),
        "l_linestatus": pa.array([r[1] for r in out], pa.string()),
        "revenue_e2": pa.array([r[2] for r in out], pa.int64())})


def sql_cube_revenue() -> str:
    rev = "CAST(sum(CAST(floor(l_extendedprice*100.0+0.5) AS BIGINT)) " \
          "AS BIGINT)"
    return (
        f"SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
        f"COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
        f"{rev} AS revenue_e2 "
        f"FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) "
        f"ORDER BY l_returnflag, l_linestatus")


# -------- market-basket association rules --------

ASSOC_TOPK = 20


def q_assoc_rules(sf_dir: str):
    """Top-ASSOC_TOPK part pairs by order co-occurrence support, with
    both directed confidences — market-basket mining on the lineitem
    basket table: pair supports = the (non-distinct) co-occurrence
    multigraph counted once, item supports = one distinct-per-order
    count, confidences integer-exact e6 ratios.  (a, b, support,
    conf_ab_e6, conf_ba_e6), deterministic (support desc, a, b)."""
    from ray.data.aggregate import Count

    from igpm_pem_ray.pipelines.common import cooccurrence_pairs_multi

    pairs = cooccurrence_pairs_multi(sf_dir) \
        .groupby(["src", "dst"]).aggregate(Count(alias_name="support"))
    top = pairs.sort(["support", "src", "dst"],
                     descending=[True, False, False]) \
        .limit(ASSOC_TOPK).to_pandas()

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    item = li.groupby(["l_partkey", "l_orderkey"]) \
        .aggregate(Count(alias_name="_c")).groupby("l_partkey") \
        .aggregate(Count(alias_name="n_orders")).to_pandas()
    lut = dict(zip(item["l_partkey"].astype("int64"),
                   item["n_orders"].astype("int64")))
    a = top["src"].to_numpy().astype(np.int64)
    b = top["dst"].to_numpy().astype(np.int64)
    sup = top["support"].to_numpy().astype(np.int64)
    na = np.array([lut[int(x)] for x in a], np.float64)
    nb = np.array([lut[int(x)] for x in b], np.float64)
    conf_ab = np.floor(sup * 1e6 / na + 0.5).astype(np.int64)
    conf_ba = np.floor(sup * 1e6 / nb + 0.5).astype(np.int64)
    return pa.table({"a": a, "b": b, "support": sup,
                     "conf_ab_e6": conf_ab, "conf_ba_e6": conf_ba})


def sql_assoc_rules() -> str:
    from igpm_pem_ray.pipelines.common import PAIRS_MULTI_SQL

    return (
        f"WITH pairs AS ({PAIRS_MULTI_SQL}), "
        "sup AS (SELECT src AS a, dst AS b, count(*) AS support "
        "FROM pairs GROUP BY src, dst), "
        f"top AS (SELECT * FROM sup ORDER BY support DESC, a, b "
        f"LIMIT {ASSOC_TOPK}), "
        "item AS (SELECT l_partkey, count(DISTINCT l_orderkey) "
        "AS n_orders FROM lineitem GROUP BY l_partkey) "
        "SELECT t.a, t.b, CAST(t.support AS BIGINT) AS support, "
        "CAST(floor(t.support*1e6/ia.n_orders + 0.5) AS BIGINT) "
        "AS conf_ab_e6, "
        "CAST(floor(t.support*1e6/ib.n_orders + 0.5) AS BIGINT) "
        "AS conf_ba_e6 "
        "FROM top t JOIN item ia ON ia.l_partkey = t.a "
        "JOIN item ib ON ib.l_partkey = t.b "
        "ORDER BY support DESC, a, b")


LIFT_K = 50
LIFT_MIN_COUNT = 5


def q_bigram_lift(sf_dir: str):
    """Corpus adjacent-pair association (PMI without the log — exact
    integer 'lift'): lift(x,y) = P(x,y) / (P(x) P(y)) over bigram
    positions, e6 fixed point with floor division, computed in
    arbitrary-precision Python ints so no 64-bit product overflows
    (c_xy * N * 10^6 can exceed 2^63; the oracle uses HUGEINT for the
    same reason).  Counting is the distributed part (per-block partial
    bigram counts -> one groupby-sum, the q_word_bigrams plan); the
    lift arithmetic runs on the aggregated table, which is bounded by
    vocab^2 rows — O(1000) here, and capped by construction at any
    corpus size with a bounded vocabulary.  Top-LIFT_K by (lift desc,
    x, y), pairs with n >= LIFT_MIN_COUNT."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        xs: list[str] = []
        ys: list[str] = []
        for txt in b["text"].to_pylist():
            t = (txt or "").split()
            xs.extend(t[:-1])
            ys.extend(t[1:])
        if not xs:
            return pa.table({"x": pa.array([], type=pa.string()),
                             "y": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        import pandas as pd

        vc = pd.DataFrame({"x": xs, "y": ys}) \
            .groupby(["x", "y"], sort=False).size().reset_index(name="n")
        return pa.table({"x": pa.array(vc["x"], type=pa.string()),
                         "y": pa.array(vc["y"], type=pa.string()),
                         "n": vc["n"].to_numpy().astype(np.int64)})

    agg = docs.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby(["x", "y"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()  # vocab^2-bounded by construction (see docstring)
    if len(agg) == 0:
        return pa.table({"x": pa.array([], pa.string()),
                         "y": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "lift_e6": pa.array([], pa.int64())})
    n = agg["n"].astype("int64")
    total = int(n.sum())
    cx = agg.groupby("x")["n"].transform("sum").astype("int64")
    cy = agg.groupby("y")["n"].transform("sum").astype("int64")
    # Python-int exact floor division (object dtype; no 64-bit overflow)
    lift = [(int(a) * total * 1_000_000) // (int(b) * int(c))
            for a, b, c in zip(n, cx, cy)]
    agg = agg.assign(lift_e6=np.asarray(lift, dtype=np.int64))
    agg = agg[n.to_numpy() >= LIFT_MIN_COUNT] \
        .sort_values(["lift_e6", "x", "y"],
                     ascending=[False, True, True]).head(LIFT_K) \
        .reset_index(drop=True)
    return pa.table({"x": agg["x"].to_numpy(),
                     "y": agg["y"].to_numpy(),
                     "n": agg["n"].to_numpy().astype(np.int64),
                     "lift_e6": agg["lift_e6"].to_numpy()})


def sql_bigram_lift() -> str:
    return (
        r"WITH t AS (SELECT list_filter(string_split_regex(text, '\s+'), "
        r"x -> x <> '') AS toks FROM documents), "
        "ix AS (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i "
        "FROM t WHERE len(toks) >= 2), "
        "g AS (SELECT toks[i] AS x, toks[i+1] AS y FROM ix), "
        "c AS (SELECT x, y, count(*) AS n FROM g GROUP BY x, y), "
        "tot AS (SELECT sum(n) AS nn FROM c), "
        "m1 AS (SELECT x, sum(n) AS cx FROM c GROUP BY x), "
        "m2 AS (SELECT y, sum(n) AS cy FROM c GROUP BY y) "
        "SELECT c.x, c.y, CAST(c.n AS BIGINT) AS n, "
        "CAST((CAST(c.n AS HUGEINT) * (SELECT nn FROM tot) * 1000000) "
        "// (CAST(m1.cx AS HUGEINT) * m2.cy) AS BIGINT) AS lift_e6 "
        "FROM c JOIN m1 USING (x) JOIN m2 USING (y) "
        f"WHERE c.n >= {LIFT_MIN_COUNT} "
        f"ORDER BY lift_e6 DESC, c.x, c.y LIMIT {LIFT_K}")


CONTAM_N = 5          # token n-gram length (13 in the GPT-3 rule;
                      # 5 keeps the unrolled SQL oracle readable —
                      # the plumbing is length-independent)
CONTAM_EVERY = 100    # benchmark set = first n-gram of every 100th doc


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (Brown et al. GPT-3 appendix C
    shape): flag every document sharing a token CONTAM_N-gram with a
    benchmark set.  The benchmark here is derived deterministically
    from the corpus itself (the leading n-gram of every
    CONTAM_EVERY-th doc) — no external data, same rule in the oracle.

    Scale shape: the benchmark set is SMALL by construction, so it is
    collected once and broadcast into the stage closure (ray.put via
    capture); each batch explodes its docs' n-grams vectorized-ish
    (token lists are tiny per doc) and counts hits with a hash-set
    probe — no shuffle except the final per-doc sum, which only
    carries matching rows.  Output: (doc_id, n_hits) for contaminated
    docs, self-matches included (they prove the plumbing)."""
    import ray

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_grams(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sel = ids % CONTAM_EVERY == 0
        out = []
        for txt in np.asarray(b["text"].to_pylist(), dtype=object)[sel]:
            t = (txt or "").split()
            if len(t) >= CONTAM_N:
                out.append(" ".join(t[:CONTAM_N]))
        return pa.table({"gram": pa.array(sorted(set(out)), pa.string())})

    bench = set(docs.map_batches(bench_grams, batch_format="pyarrow",
                                 zero_copy_batch=True)
                .to_pandas()["gram"])  # small by construction
    bench_ref = ray.put(bench)

    def probe(b: pa.Table, _r=bench_ref) -> pa.Table:
        bs = ray.get(_r) if isinstance(_r, ray.ObjectRef) else _r
        ids_out: list[int] = []
        hits_out: list[int] = []
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            t = (txt or "").split()
            n = 0
            for i in range(len(t) - CONTAM_N + 1):
                if " ".join(t[i:i + CONTAM_N]) in bs:
                    n += 1
            if n:
                ids_out.append(did)
                hits_out.append(n)
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "n_hits": pa.array(hits_out, pa.int64())})

    return docs.map_batches(probe, batch_format="pyarrow",
                            zero_copy_batch=True)


def sql_decontaminate() -> str:
    gram_i = " || ' ' || ".join(f"t.toks[g.i+{j}]" for j in range(CONTAM_N))
    gram_1 = " || ' ' || ".join(f"toks[{j + 1}]" for j in range(CONTAM_N))
    return (
        r"WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, "
        r"'\s+'), x -> x <> '') AS toks FROM documents), "
        f"bench AS (SELECT DISTINCT {gram_1} AS gram FROM t "
        f"WHERE doc_id % {CONTAM_EVERY} = 0 AND len(toks) >= {CONTAM_N}), "
        f"grams AS (SELECT t.doc_id, {gram_i} AS gram FROM t, "
        f"unnest(generate_series(1, len(t.toks)-{CONTAM_N - 1})) AS g(i) "
        f"WHERE len(t.toks) >= {CONTAM_N}) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(count(*) AS BIGINT) AS n_hits FROM grams "
        "WHERE gram IN (SELECT gram FROM bench) "
        "GROUP BY doc_id ORDER BY doc_id")


# ---------------- unigram-LM rarity score (perplexity proxy) ----------

def q_doc_rarity(sf_dir: str):
    """Per-document mean inverse token frequency — the integer-exact
    stand-in for a unigram-LM perplexity filter (the CCNet/KenLM
    curation step, Wenzek et al. 1911.00359 §3.3, with rarity
    ``N // c(w)`` replacing ``-log p(w)`` so the score is bit-exact
    under any reduction order and SQL-expressible).  High score =
    rare-token-heavy document (boilerplate scores low).

    Scale shape: per-doc tf partials FIRST (shuffle carries O(doc x
    distinct-token) rows, not O(tokens)); ONE vocab-keyed groupby for
    corpus counts; corpus total N is a driver SCALAR (one tiny
    aggregate); tf joins counts on the token key (both sides already
    vocab-keyed) and the final per-doc sum is one groupby."""
    from ray.data.aggregate import Sum as _Sum

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tf(df):
        import pandas as pd
        e = pd.DataFrame({"doc_id": df["doc_id"],
                          "token": df["text"].str.split()}).explode(
            "token", ignore_index=True)
        e = e[e["token"].notna()]
        g = e.groupby(["doc_id", "token"], sort=False).size()
        out = g.reset_index(name="tf")
        out["tf"] = out["tf"].astype(np.int64)
        # hand back Arrow: downstream join/rename Projects operate on
        # blocks and Ray 2.49 chokes on pandas blocks there
        return pa.Table.from_pandas(out, preserve_index=False)

    tfd = docs.map_batches(tf, batch_format="pandas").materialize()
    counts = tfd.groupby("token").aggregate(
        _Sum("tf", alias_name="c")).materialize()
    n_total = int(counts.sum("c"))
    np_join = 1 if n_total < 200_000 else 16
    j = tfd.join(counts.rename_columns({"token": "token2"}),
                 join_type="inner", num_partitions=np_join,
                 on=("token",), right_on=("token2",))

    def score(b: pa.Table) -> pa.Table:
        tfv = b["tf"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": b["doc_id"],
                         "n_toks": tfv,
                         "rarity_sum": tfv * (n_total // c)})

    per_doc = j.map_batches(score, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(_Sum("n_toks", alias_name="n_tokens"),
                                     _Sum("rarity_sum", alias_name="rs"))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        rs = b["rs"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": n,
                         "rarity_mean": rs // n})

    return per_doc.map_batches(finish, batch_format="pyarrow") \
        .sort("doc_id")


def sql_doc_rarity() -> str:
    return (
        r"WITH e AS (SELECT doc_id, unnest(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
        "FROM documents), "
        "tf AS (SELECT doc_id, token, count(*) AS tf "
        "FROM e GROUP BY doc_id, token), "
        "c AS (SELECT token, sum(tf) AS c FROM tf GROUP BY token), "
        "n AS (SELECT sum(c) AS n_total FROM c) "
        "SELECT CAST(tf.doc_id AS BIGINT) AS doc_id, "
        "CAST(sum(tf.tf) AS BIGINT) AS n_tokens, "
        "CAST(sum(tf.tf * (n.n_total // c.c)) // sum(tf.tf) AS BIGINT) "
        "AS rarity_mean "
        "FROM tf JOIN c USING (token) CROSS JOIN n "
        "GROUP BY tf.doc_id ORDER BY doc_id")


# ---------------- inverted index (posting lists) ----------------

PIDX_K = 30     # emit the top-K document-frequency terms
PIDX_CAP = 25   # postings truncated to the first CAP doc ids (df exact)


def q_inverted_index(sf_dir: str):
    """Search-engine posting lists: for the PIDX_K highest-df terms,
    the ascending doc-id posting list (truncated at PIDX_CAP entries —
    web-scale hot terms would otherwise make one group unbounded; df
    stays EXACT) rendered as a comma-joined string so the driver's
    value-hash compares engine-independently.

    Scale shape: per-batch distinct (token, doc_id) partials, one
    groupby for exact df, posting truncation via the sort+block-rank
    plan (stages/ranked.topk_per_group) so no reducer ever holds a hot
    term's full posting list, tiny top-K merge at the end."""
    from igpm_pem_ray.stages.ranked import topk_per_group

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(df):
        import pandas as pd
        e = pd.DataFrame({"doc_id": df["doc_id"],
                          "token": df["text"].str.split()}).explode(
            "token", ignore_index=True)
        e = e[e["token"].notna()].drop_duplicates()
        return pa.Table.from_pandas(e[["token", "doc_id"]],
                                    preserve_index=False)

    e = docs.map_batches(pairs, batch_format="pandas") \
        .groupby(["token", "doc_id"]).aggregate(
            Count(alias_name="_n")).drop_columns(["_n"]).materialize()
    df_tbl = e.groupby("token").aggregate(Count(alias_name="df"))
    top = topk_per_group(e, key="token", order=["doc_id"],
                         descending=[False], k=PIDX_CAP)

    def assemble(g):
        import pandas as pd
        ids = sorted(int(x) for x in g["doc_id"])
        return pa.table({"token": [str(g["token"].iloc[0])],
                         "postings": [",".join(map(str, ids))]})

    post = top.groupby("token").map_groups(assemble, batch_format="pandas")
    # vocab-keyed join: partitions scale with the vocab, tiny inputs
    # collapse to one (Ray 2.49 zero-block hash-join pitfall)
    n_vocab = df_tbl.count()
    j = df_tbl.join(post.rename_columns({"token": "token2"}),
                    join_type="inner",
                    num_partitions=1 if n_vocab < 100_000 else 16,
                    on=("token",), right_on=("token2",))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"token": b["token"],
                         "df": b["df"].cast(pa.int64()),
                         "postings": b["postings"]})

    return j.map_batches(fin, batch_format="pyarrow") \
        .sort(["df", "token"], descending=[True, False]).limit(PIDX_K)


def sql_inverted_index() -> str:
    return (
        r"WITH e AS (SELECT DISTINCT doc_id, unnest(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
        "FROM documents), "
        "df AS (SELECT token, count(*) AS df FROM e GROUP BY token), "
        "r AS (SELECT token, doc_id, row_number() OVER "
        "(PARTITION BY token ORDER BY doc_id) AS rn FROM e), "
        "p AS (SELECT token, string_agg(CAST(doc_id AS VARCHAR), ',' "
        f"ORDER BY doc_id) AS postings FROM r WHERE rn <= {PIDX_CAP} "
        "GROUP BY token) "
        "SELECT d.token, CAST(d.df AS BIGINT) AS df, p.postings "
        "FROM df d JOIN p USING (token) "
        f"ORDER BY df DESC, token LIMIT {PIDX_K}")


# ---------------- embedding covariance (PCA sufficient statistics) ----

def q_embed_covariance(sf_dir: str):
    """Upper-triangle population covariance matrix of the embedding
    columns — the sufficient-statistics step of distributed
    PCA/whitening: each block emits ONE (d+1)x(d+1) integer Gram
    partial (the constant-1 augmentation makes X'^T X' carry Sxy, Sx
    and n together), so the shuffle is O(blocks x d^2) scalars and
    the driver merge is a d^2-size groupby — row data never moves.
    cov numerator n*Sxy - Sx*Sy on e3-scaled values is exact int64;
    the division truncates toward zero in BOTH engines (numpy floors
    negatives, DuckDB's // truncates — sign*(|num|//den) pins them).
    Output (i, j, n, cov_e6), i <= j."""
    from ray.data.aggregate import Sum as _Sum

    emb = read_table(sf_dir, "embeddings", columns=["embedding"])

    def gram(b: pa.Table) -> pa.Table:
        col = b["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = b.num_rows
        if n == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "g": pa.array([], pa.int64())})
        d = len(flat) // n
        x = scale_col(flat, 1e3).reshape(n, d)
        aug = np.concatenate([x, np.ones((n, 1), np.int64)], axis=1)
        gm = aug.T @ aug                    # exact int64 Gram
        iu, ju = np.triu_indices(d + 1)
        return pa.table({"i": iu.astype(np.int64),
                         "j": ju.astype(np.int64),
                         "g": gm[iu, ju]})

    agg = emb.map_batches(gram, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["i", "j"]).aggregate(_Sum("g", alias_name="g"))
    pdf = agg.to_pandas()                  # O(d^2) rows
    d = int(pdf["i"].max())                # augmented col index == d
    G = np.zeros((d + 1, d + 1), dtype=np.int64)
    G[pdf["i"].to_numpy(), pdf["j"].to_numpy()] = \
        pdf["g"].to_numpy().astype(np.int64)
    n = G[d, d]
    sx = G[:d, d]
    iu, ju = np.triu_indices(d)
    num = n * G[iu, ju] - sx[iu] * sx[ju]
    cov = np.sign(num) * (np.abs(num) // (n * n))
    return pa.table({"i": iu.astype(np.int64), "j": ju.astype(np.int64),
                     "n": np.full(len(iu), n, np.int64),
                     "cov_e6": cov})


def sql_embed_covariance() -> str:
    return (
        "WITH u AS (SELECT vec_id, "
        "generate_subscripts(embedding, 1) - 1 AS dim, "
        "CAST(floor(unnest(embedding)*1e3+0.5) AS BIGINT) AS x "
        "FROM embeddings), "
        "p AS (SELECT a.dim AS i, b.dim AS j, sum(a.x*b.x) AS sxy, "
        "count(*) AS n FROM u a JOIN u b ON a.vec_id = b.vec_id "
        "AND a.dim <= b.dim GROUP BY a.dim, b.dim), "
        "s AS (SELECT dim, sum(x) AS sx FROM u GROUP BY dim) "
        "SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j, "
        "CAST(p.n AS BIGINT) AS n, "
        "CAST((p.n*p.sxy - si.sx*sj.sx) // (p.n*p.n) AS BIGINT) "
        "AS cov_e6 "
        "FROM p JOIN s si ON si.dim = p.i JOIN s sj ON sj.dim = p.j "
        "ORDER BY i, j")


# -------- chi-square independence test (lang x source) --------

CHI2_E6 = 10**6


def q_lang_source_chi2(sf_dir: str):
    """Pearson chi-square independence statistic between
    ``documents.lang`` and ``documents.source`` — the categorical
    drift / balance check a corpus pipeline runs before mixing
    sources.  ONE (lang, source) count groupby (O(cells) shuffle);
    margins and the statistic in exact arbitrary-precision Python
    ints on the tiny contingency table: per cell over the FULL
    margin cross product (zero-observed cells included),

        term_e6 = floor((o*n - r*c)^2 * 1e6 / (r*c*n) + 0.5)
                = (2*(o*n - r*c)^2 * 1e6 + r*c*n) // (2*r*c*n)

    then an integer sum — reduction-order-free, bit-identical to the
    HUGEINT oracle ((o*n)^2 overflows BIGINT at sf0.1, the
    bigram_lift convention).  Returns (chi2_e6, dof)."""
    from ray.data.aggregate import Count

    docs = read_table(sf_dir, "documents", columns=["lang", "source"])
    cells = docs.groupby(["lang", "source"]) \
        .aggregate(Count(alias_name="o")).to_pandas()
    obs = {(l, s): int(o) for l, s, o in
           zip(cells["lang"], cells["source"], cells["o"])}
    langs = sorted({k[0] for k in obs})
    srcs = sorted({k[1] for k in obs})
    row = {l: sum(v for (a, _), v in obs.items() if a == l) for l in langs}
    col = {s: sum(v for (_, b), v in obs.items() if b == s) for s in srcs}
    n = sum(obs.values())
    chi2_e6 = 0
    for l in langs:
        for s in srcs:
            o = obs.get((l, s), 0)
            num = (o * n - row[l] * col[s]) ** 2 * CHI2_E6
            den = row[l] * col[s] * n
            chi2_e6 += (2 * num + den) // (2 * den)
    dof = (len(langs) - 1) * (len(srcs) - 1)
    return pa.table({"chi2_e6": pa.array([chi2_e6], pa.int64()),
                     "dof": pa.array([dof], pa.int64())})


def sql_lang_source_chi2() -> str:
    return (
        "WITH o AS (SELECT lang, source, count(*) AS o "
        "FROM documents GROUP BY 1, 2), "
        "r AS (SELECT lang, count(*) AS r FROM documents GROUP BY 1), "
        "c AS (SELECT source, count(*) AS c FROM documents GROUP BY 1), "
        "n AS (SELECT count(*) AS n FROM documents), "
        "cells AS (SELECT r.lang, c.source, "
        "COALESCE(o.o, 0) AS o, r.r, c.c, (SELECT n FROM n) AS n "
        "FROM r CROSS JOIN c LEFT JOIN o "
        "ON o.lang = r.lang AND o.source = c.source), "
        "terms AS (SELECT (2*power_num + den) // (2*den) AS t FROM ("
        "SELECT (CAST(o AS HUGEINT)*n - CAST(r AS HUGEINT)*c)"
        "*(CAST(o AS HUGEINT)*n - CAST(r AS HUGEINT)*c)"
        f"*{CHI2_E6} AS power_num, "
        "CAST(r AS HUGEINT)*c*n AS den FROM cells) q), "
        "dof AS (SELECT (CAST((SELECT count(*) FROM r) AS BIGINT)-1)"
        "*(CAST((SELECT count(*) FROM c) AS BIGINT)-1) AS dof) "
        "SELECT CAST((SELECT sum(t) FROM terms) AS BIGINT) AS chi2_e6, "
        "(SELECT dof FROM dof) AS dof")


# ---------- TF-weighted cosine near-dup pairs (inverted index) ----------

def q_cosine_gram_pairs(sf_dir: str):
    """TF-weighted cosine near-duplicate pairs over word-3-gram COUNT
    vectors — the weighted sibling of `jaccard_pairs` (set Jaccard
    ignores repetition; cosine over tf vectors catches boilerplate
    that repeats the same shingles).  Threshold cos >= 0.5 applied as
    the INTEGER cross-multiplication 4*dot^2 >= |A|^2*|B|^2 (dot >= 0),
    so no sqrt and no fixed-point boundary exists anywhere; outputs
    are the raw exact integers (dot, n2_a, n2_b).

    Same inverted-index scale shape as `_gram_pair_counts`: per-doc tf
    needs no shuffle (a doc lives in one row), the gram self-join is
    Sigma_gram df^2 (hot grams cut by the LSH prefilter route at web
    scale), one groupby-sum per pair, two size joins, one stateless
    integer filter.  Pair arithmetic in object ints: 4*dot^2 can pass
    2^63 on long documents (the oracle uses HUGEINT)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def gram_tf(b: pa.Table) -> pa.Table:
        from collections import Counter

        ids_out, grams_out, tf_out = [], [], []
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            w = (txt or "").split()
            if not w:
                continue
            if len(w) < JACCARD_N:
                cnt = Counter([" ".join(w)])
            else:
                cnt = Counter(" ".join(w[i:i + JACCARD_N])
                              for i in range(len(w) - JACCARD_N + 1))
            cnt.pop("", None)
            ids_out.extend([did] * len(cnt))
            grams_out.extend(cnt.keys())
            tf_out.extend(cnt.values())
        return pa.table({"doc_id": np.asarray(ids_out, dtype=np.int64),
                         "gram": pa.array(grams_out, type=pa.string()),
                         "tf": np.asarray(tf_out, dtype=np.int64)})

    gd = docs.map_batches(gram_tf, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    def sq(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"], "t2": tf * tf})

    norms = gd.map_batches(sq, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("doc_id").aggregate(Sum("t2", alias_name="n2"))

    # join partitions scale with the posting count (the self-join
    # fan-out is Sigma_gram df^2, much larger than the input)
    n_gd = gd.count()
    np_join = 1 if n_gd < 65_536 else min(64, max(8, n_gd // 100_000))

    ga = gd.rename_columns({"doc_id": "doc_a", "tf": "tf_a"})
    gb = gd.rename_columns({"doc_id": "doc_b", "gram": "gram_b",
                            "tf": "tf_b"})
    j = ga.join(gb, join_type="inner", num_partitions=np_join,
                on=("gram",), right_on=("gram_b",))

    def prod(t: pa.Table) -> pa.Table:
        # per-block combiner: partial dot sums per pair before the
        # global groupby (pairs repeat once per shared gram)
        import pandas as pd

        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        keep = a < b
        ta = t["tf_a"].to_numpy(zero_copy_only=False)[keep]
        tb = t["tf_b"].to_numpy(zero_copy_only=False)[keep]
        g = pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep],
                          "p": (ta * tb).astype(np.int64)}) \
            .groupby(["doc_a", "doc_b"], sort=False)["p"].sum() \
            .reset_index()
        return pa.table({"doc_a": g["doc_a"].to_numpy(),
                         "doc_b": g["doc_b"].to_numpy(),
                         "p": g["p"].to_numpy().astype(np.int64)})

    partials = j.map_batches(prod, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def _cos_keep(dot, n2a, n2b):
        return np.array([4 * int(d) * int(d) >= int(x) * int(y)
                         for d, x, y in zip(dot, n2a, n2b)], dtype=bool) \
            if len(dot) else np.zeros(0, dtype=bool)

    if partials.count() <= 20_000_000:
        # single-task finish: Ray's sort-based two-key groupby on a
        # multi-million-row partial table measured ~50x slower than
        # one vectorized reduce task; norms attach as an O(docs) dict
        # (the mirror-kernel merge strategy, graph/mirror.py)
        import pandas as pd
        import ray as _ray

        nmp = norms.to_pandas()  # O(docs) in the single-task regime
        norms_tbl = pa.table({"doc_id": nmp["doc_id"].astype("int64"),
                              "n2": nmp["n2"].astype("int64")})

        @_ray.remote
        def _reduce(norms_t: pa.Table, *parts: pa.Table) -> pa.Table:
            z = np.empty(0, np.int64)
            if not parts or not sum(p.num_rows for p in parts):
                return pa.table({"doc_a": z, "doc_b": z, "dot": z,
                                 "n2_a": z, "n2_b": z})
            pdf = pa.concat_tables(parts).to_pandas()
            g = pdf.groupby(["doc_a", "doc_b"], sort=False)["p"].sum() \
                .reset_index()
            n2 = dict(zip(norms_t["doc_id"].to_pylist(),
                          norms_t["n2"].to_pylist()))
            dot = g["p"].to_numpy().astype(np.int64)
            n2a = g["doc_a"].map(n2).to_numpy().astype(np.int64)
            n2b = g["doc_b"].map(n2).to_numpy().astype(np.int64)
            keep = _cos_keep(dot, n2a, n2b)
            return pa.table({
                "doc_a": g["doc_a"].to_numpy()[keep].astype(np.int64),
                "doc_b": g["doc_b"].to_numpy()[keep].astype(np.int64),
                "dot": dot[keep], "n2_a": n2a[keep], "n2_b": n2b[keep]})

        return rd.from_arrow_refs(
            [_reduce.remote(norms_tbl, *partials.to_arrow_refs())])

    dots = partials.groupby(["doc_a", "doc_b"]) \
        .aggregate(Sum("p", alias_name="dot"))
    na = norms.rename_columns({"doc_id": "_da", "n2": "n2_a"})
    nb = norms.rename_columns({"doc_id": "_db", "n2": "n2_b"})
    full = dots.join(na, join_type="inner", num_partitions=np_join,
                     on=("doc_a",), right_on=("_da",)) \
               .join(nb, join_type="inner", num_partitions=np_join,
                     on=("doc_b",), right_on=("_db",))

    def cos_filter(t: pa.Table) -> pa.Table:
        dot = t["dot"].to_numpy(zero_copy_only=False).astype(np.int64)
        n2a = t["n2_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        n2b = t["n2_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _cos_keep(dot, n2a, n2b)
        return pa.table({
            "doc_a": t["doc_a"].to_numpy(zero_copy_only=False)[keep],
            "doc_b": t["doc_b"].to_numpy(zero_copy_only=False)[keep],
            "dot": dot[keep], "n2_a": n2a[keep], "n2_b": n2b[keep]})

    return full.map_batches(cos_filter, batch_format="pyarrow",
                            zero_copy_batch=True)


def sql_cosine_gram_pairs() -> str:
    return (
        r"WITH t AS (SELECT doc_id, "
        r"list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks "
        "FROM documents), "
        "ix AS (SELECT doc_id, toks, "
        f"unnest(generate_series(1, greatest(len(toks)-{JACCARD_N - 1}, 1))) "
        "AS i FROM t), "
        f"g AS (SELECT doc_id, CASE WHEN len(toks) < {JACCARD_N} "
        "THEN array_to_string(toks, ' ') "
        f"ELSE array_to_string(toks[i:i+{JACCARD_N - 1}], ' ') END AS gram "
        "FROM ix), "
        "tf AS (SELECT doc_id, gram, count(*) AS tf FROM g "
        "WHERE gram <> '' GROUP BY 1, 2), "
        "nm AS (SELECT doc_id, sum(tf*tf) AS n2 FROM tf GROUP BY 1), "
        "d AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "sum(a.tf*b.tf) AS dot FROM tf a JOIN tf b ON a.gram = b.gram "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, CAST(dot AS BIGINT) AS dot, "
        "CAST(na.n2 AS BIGINT) AS n2_a, CAST(nb.n2 AS BIGINT) AS n2_b "
        "FROM d JOIN nm na ON d.doc_a = na.doc_id "
        "JOIN nm nb ON d.doc_b = nb.doc_id "
        "WHERE 4*CAST(dot AS HUGEINT)*CAST(dot AS HUGEINT) "
        ">= CAST(na.n2 AS HUGEINT)*CAST(nb.n2 AS HUGEINT)")


# --------------- phrase search (positional inverted index) ---------------

PHRASE = ("data", "join")


def q_phrase_search(sf_dir: str):
    """Exact phrase search: documents containing the query phrase as
    CONSECUTIVE tokens, with occurrence counts — the positional-
    inverted-index operator (an unordered term index, `inverted_index`
    / `bm25_topk`, cannot distinguish "data join" from "join data").

    Plan: explode docs to (doc_id, pos, token) FILTERED to the phrase
    terms at extraction (for ad-hoc phrases over a stored corpus the
    production route materializes the full positional index once and
    prunes by term at read); one hash join per phrase gap on the
    composite key (doc_id, pos) after shifting term i's positions by
    -i, so surviving rows are exactly the phrase start positions; one
    groupby counts occurrences per doc.  Join fan-out is bounded by
    term frequency — no position ever joins more than once per term.
    """
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms = list(PHRASE)

    def positions(b: pa.Table) -> pa.Table:
        ids, ps, ws = [], [], []
        want = set(terms)
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            for i, w in enumerate((txt or "").split()):
                if w in want:
                    ids.append(did)
                    ps.append(i)
                    ws.append(w)
        return pa.table({"doc_id": np.asarray(ids, dtype=np.int64),
                         "p": np.asarray(ps, dtype=np.int64),
                         "w": pa.array(ws, type=pa.string())})

    ix = docs.map_batches(positions, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    # tiny postings collapse the joins to one partition (Ray 2.49
    # zero-block hash-join pitfall); hot-term phrases scale out
    np_join = 1 if ix.count() < 65_536 else 16

    def term_ds(i: int):
        def pick(t: pa.Table, _w=terms[i], _i=i) -> pa.Table:
            keep = pc.equal(t["w"], _w)
            f = t.filter(keep)
            return pa.table({
                "doc_id": f["doc_id"],
                "p": pc.subtract(f["p"], pa.scalar(_i, pa.int64()))})
        return ix.map_batches(pick, batch_format="pyarrow",
                              zero_copy_batch=True)

    cur = term_ds(0)
    for i in range(1, len(terms)):
        nxt = term_ds(i).rename_columns({"doc_id": "d2", "p": "p2"})
        cur = cur.join(nxt, join_type="inner", num_partitions=np_join,
                       on=("doc_id", "p"), right_on=("d2", "p2"))
    return cur.groupby("doc_id").aggregate(Count(alias_name="n_occ")) \
        .map_batches(lambda b: pa.table({
            "doc_id": b["doc_id"], "n_occ": b["n_occ"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_phrase_search() -> str:
    conds = " AND ".join(
        f"toks[i+{k}] = '{t}'" for k, t in enumerate(PHRASE))
    return (
        r"WITH t AS (SELECT doc_id, "
        r"list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks "
        "FROM documents), "
        "ix AS (SELECT doc_id, toks, "
        f"unnest(generate_series(1, len(toks)-{len(PHRASE) - 1})) AS i "
        f"FROM t WHERE len(toks) >= {len(PHRASE)}) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occ FROM ix "
        f"WHERE {conds} GROUP BY doc_id")


# ------------- per-source boilerplate terms (df-ratio filter) -------------

BOILER_PCT = 90


def q_boilerplate_terms(sf_dir: str):
    """Per-source boilerplate terms: tokens present in >= 90% of a
    source's documents — the CCNet/C4-style per-domain boilerplate
    detector (terms a template stamps on nearly every page of a site
    carry no content signal and are stripped or down-weighted before
    training).  Integer threshold via cross-multiplication
    (c*100 >= 90*n_docs), no ratio fixed point.

    Scale shape: per-doc distinct terms explode with NO dedup shuffle
    (a doc lives in one row, set() inside the batch), one
    (source, term) groupby-count, one O(sources) count join, one
    stateless filter — all traffic O(distinct (source, term))."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source",
                                                    "text"])

    def terms(b: pa.Table) -> pa.Table:
        src_out, w_out = [], []
        for src, txt in zip(b["source"].to_pylist(),
                            b["text"].to_pylist()):
            ws = set((txt or "").split())
            src_out.extend([src] * len(ws))
            w_out.extend(ws)
        return pa.table({"source": pa.array(src_out, pa.string()),
                         "w": pa.array(w_out, pa.string())})

    df = docs.map_batches(terms, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["source", "w"]).aggregate(Count(alias_name="c"))
    nd = docs.groupby("source").aggregate(Count(alias_name="n_docs")) \
        .rename_columns({"source": "_s"})
    j = df.join(nd, join_type="inner", num_partitions=1,
                on=("source",), right_on=("_s",))

    def keep(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = c * 100 >= BOILER_PCT * n
        return pa.table({
            "source": t["source"].to_numpy(zero_copy_only=False)[m],
            "w": t["w"].to_numpy(zero_copy_only=False)[m],
            "c": c[m], "n_docs": n[m]})

    return j.map_batches(keep, batch_format="pyarrow",
                         zero_copy_batch=True)


def sql_boilerplate_terms() -> str:
    return (
        r"WITH dt AS (SELECT DISTINCT doc_id, source, "
        r"unnest(list_filter(string_split_regex(text, '\s+'), "
        "x -> x <> '')) AS w FROM documents), "
        "df AS (SELECT source, w, count(*) AS c FROM dt GROUP BY 1, 2), "
        "nd AS (SELECT source, count(*) AS n_docs FROM documents "
        "GROUP BY 1) "
        "SELECT df.source, df.w, CAST(df.c AS BIGINT) AS c, "
        "CAST(nd.n_docs AS BIGINT) AS n_docs "
        "FROM df JOIN nd ON df.source = nd.source "
        f"WHERE df.c*100 >= {BOILER_PCT}*nd.n_docs")


# --------------- sequence packing (concat-then-chunk layout) ---------------

PACK_BUDGET = 2048


def q_pack_docs(sf_dir: str):
    """Training-batch sequence packing, concat-then-chunk layout: all
    documents are conceptually concatenated in doc_id order and cut
    into PACK_BUDGET-token chunks; each doc gets its global start
    offset, owning chunk id, and the number of chunks it spans — the
    standard LLM pretraining pack (GPT-style token-stream chunking),
    computed as ONE distributed prefix sum (stages/temporal.
    cumsum_per_key with a constant key: per-block vectorized cumsum +
    O(1)-per-block driver carry), never a driver-side loop."""
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def lens(b: pa.Table) -> pa.Table:
        nt = np.asarray([len((t or "").split())
                         for t in b["text"].to_pylist()], dtype=np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "key": np.zeros(len(nt), np.int64),
                         "us": b["doc_id"].cast(pa.int64()),
                         "val": nt, "n_tokens": nt})

    cum = cumsum_per_key(
        docs.map_batches(lens, batch_format="pyarrow",
                         zero_copy_batch=True),
        payload_cols=["doc_id", "n_tokens"])

    def fin(t: pa.Table) -> pa.Table:
        c = t["cum_val"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = c - n
        chunk = start // PACK_BUDGET
        endc = np.where(n > 0, (c - 1) // PACK_BUDGET, chunk)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n,
                         "start_off": start, "chunk_id": chunk,
                         "n_chunks": (endc - chunk + 1).astype(np.int64)})

    return cum.map_batches(fin, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_pack_docs() -> str:
    return (
        r"WITH t AS (SELECT doc_id, CAST(len(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) "
        "AS n_tokens FROM documents), "
        "c AS (SELECT doc_id, n_tokens, sum(n_tokens) OVER "
        "(ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t) "
        "SELECT doc_id, n_tokens, "
        "CAST(cum - n_tokens AS BIGINT) AS start_off, "
        f"CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS chunk_id, "
        "CAST(CASE WHEN n_tokens > 0 THEN "
        f"(cum - 1) // {PACK_BUDGET} - (cum - n_tokens) // {PACK_BUDGET} "
        "+ 1 ELSE 1 END AS BIGINT) AS n_chunks FROM c")


# ------------- int8 scalar quantization calibration (ANN infra) -------------

def q_embed_quantize(sf_dir: str):
    """Per-dimension int8 scalar-quantizer calibration + code checksum
    — the compression pass ANN indexes run before storing vectors
    (min/max per dim -> code = round(255*(x-min)/(max-min))).  All
    arithmetic integer-exact: values go to e6 fixed point FIRST, the
    code rounding is the pure-integer half-up
    ``(2*diff*255 + span) // (2*span)``, so both engines agree
    bit-for-bit with no float-division boundary anywhere.

    Scale shape: two passes — (1) per-block (d,)-vector min/max/count
    partials -> one O(blocks x d) groupby; (2) the tiny (d,)
    calibration broadcast back into a stateless map that emits
    per-block code-sum partials -> one more O(blocks x d) groupby.
    Row data never shuffles."""
    from ray.data.aggregate import Max, Min, Sum as _Sum

    emb = read_table(sf_dir, "embeddings", columns=["embedding"]) \
        .materialize()

    def _vecs(b: pa.Table) -> np.ndarray:
        flat = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        d = len(flat) // max(b.num_rows, 1)
        return scale_col(flat, 1e6).reshape(b.num_rows, d) if b.num_rows \
            else np.zeros((0, 0), np.int64)

    def mm_partial(b: pa.Table) -> pa.Table:
        x = _vecs(b)
        d = x.shape[1]
        return pa.table({"dim": np.arange(d, dtype=np.int64),
                         "mn": x.min(axis=0), "mx": x.max(axis=0),
                         "n": np.full(d, x.shape[0], np.int64)})

    calib = emb.map_batches(mm_partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("dim").aggregate(Min("mn", alias_name="mn"),
                                  Max("mx", alias_name="mx"),
                                  _Sum("n", alias_name="n")).take_all()
    mn = np.asarray([r["mn"] for r in sorted(calib,
                                             key=lambda r: r["dim"])],
                    dtype=np.int64)
    mx = np.asarray([r["mx"] for r in sorted(calib,
                                             key=lambda r: r["dim"])],
                    dtype=np.int64)
    n = {r["dim"]: r["n"] for r in calib}

    def code_partial(b: pa.Table, _mn=mn, _mx=mx) -> pa.Table:
        x = _vecs(b)
        d = x.shape[1]
        span = _mx - _mn
        diff = x - _mn[None, :]
        codes = np.where(span[None, :] > 0,
                         (2 * diff * 255 + span[None, :])
                         // np.maximum(2 * span[None, :], 1), 0)
        return pa.table({"dim": np.arange(d, dtype=np.int64),
                         "cs": codes.sum(axis=0).astype(np.int64)})

    sums = emb.map_batches(code_partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("dim").aggregate(_Sum("cs", alias_name="code_sum"))

    def fin(t: pa.Table, _mn=mn, _mx=mx, _n=n) -> pa.Table:
        dims = t["dim"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "dim": dims,
            "min_e6": _mn[dims], "max_e6": _mx[dims],
            "n": np.asarray([_n[int(d)] for d in dims], np.int64),
            "code_sum": t["code_sum"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})

    return sums.map_batches(fin, batch_format="pyarrow",
                            zero_copy_batch=True)


def sql_embed_quantize() -> str:
    x = "CAST(floor(CAST(unnest(embedding) AS DOUBLE)*1e6+0.5) AS BIGINT)"
    return (
        f"WITH u AS (SELECT {x} AS x_e6, "
        "generate_subscripts(embedding, 1) - 1 AS dim FROM embeddings), "
        "mm AS (SELECT dim, min(x_e6) AS mn, max(x_e6) AS mx, "
        "count(*) AS n FROM u GROUP BY 1) "
        "SELECT CAST(u.dim AS BIGINT) AS dim, "
        "CAST(mm.mn AS BIGINT) AS min_e6, CAST(mm.mx AS BIGINT) AS max_e6, "
        "CAST(mm.n AS BIGINT) AS n, "
        "CAST(sum(CASE WHEN mm.mx > mm.mn THEN "
        "(2*(u.x_e6 - mm.mn)*255 + (mm.mx - mm.mn)) "
        "// (2*(mm.mx - mm.mn)) ELSE 0 END) AS BIGINT) AS code_sum "
        "FROM u JOIN mm ON u.dim = mm.dim "
        "GROUP BY u.dim, mm.mn, mm.mx, mm.n")


# ------------- kNN label agreement (mislabel detection) -------------

KNN_AGREE_K = 5
KNN_AGREE_MAX_ID = 300  # oracle cost is O(n^2 d); cap the checked subset


def q_knn_label_agreement(sf_dir: str):
    """Per-label kNN label-agreement stats over the embedding table
    (ann/label_noise.py): for every vector, how many of its 5 nearest
    neighbors share its label; vectors with majority disagreement are
    flagged as probable label noise (Wilson-editing / dataset-
    curation).  Distances are exact integers (e6 fixed point before
    squaring), so the neighbor ranking is bit-identical to the SQL
    oracle's — no float tie ambiguity.  Subset vec_id < 300 keeps the
    oracle's O(n^2 d) pair join bounded; the kernel itself takes any
    Dataset."""
    from igpm_pem_ray.ann.label_noise import knn_label_agreement

    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding", "label"]) \
        .filter(expr=f"vec_id < {KNN_AGREE_MAX_ID}")
    out = knn_label_agreement(emb, k=KNN_AGREE_K)
    return out.map_batches(lambda b: pa.table({
        "label": b["label"].cast(pa.int64()),
        "n_vecs": b["n_vecs"].cast(pa.int64()),
        "agree_sum": b["agree_sum"].cast(pa.int64()),
        "n_flagged": b["n_flagged"].cast(pa.int64())}),
        batch_format="pyarrow")


def sql_knn_label_agreement() -> str:
    e6 = "CAST(floor(CAST(unnest(embedding) AS DOUBLE)*1e6+0.5) AS BIGINT)"
    return (
        f"WITH u AS (SELECT vec_id, label, {e6} AS x, "
        "generate_subscripts(embedding, 1) AS dim FROM embeddings "
        f"WHERE vec_id < {KNN_AGREE_MAX_ID}), "
        "d AS (SELECT a.vec_id AS qa, b.vec_id AS qb, "
        "sum((a.x-b.x)*(a.x-b.x)) AS d2 FROM u a JOIN u b "
        "ON a.dim = b.dim AND a.vec_id <> b.vec_id GROUP BY 1, 2), "
        "r AS (SELECT qa, qb, row_number() OVER "
        "(PARTITION BY qa ORDER BY d2, qb) AS rn FROM d), "
        "v AS (SELECT DISTINCT vec_id, label FROM u), "
        "j AS (SELECT r.qa, va.label AS la, vb.label AS lb FROM r "
        "JOIN v va ON va.vec_id = r.qa JOIN v vb ON vb.vec_id = r.qb "
        f"WHERE r.rn <= {KNN_AGREE_K}), "
        "g AS (SELECT qa, any_value(la) AS label, "
        "sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS agree "
        "FROM j GROUP BY qa) "
        "SELECT CAST(label AS BIGINT) AS label, "
        "CAST(count(*) AS BIGINT) AS n_vecs, "
        "CAST(sum(agree) AS BIGINT) AS agree_sum, "
        f"CAST(sum(CASE WHEN 2*agree < {KNN_AGREE_K} THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_flagged FROM g GROUP BY label")


# ------------------ Heaps-law vocabulary growth curve ------------------

def q_vocab_growth(sf_dir: str):
    """Vocabulary growth (Heaps' law): distinct tokens seen after
    processing documents 0..d in doc_id order, one row per doc_id that
    INTRODUCES vocabulary — the corpus-statistics curve data teams use
    to size tokenizers and detect corpus drift.

    Plan with ZERO sequential work over the corpus: each token's first
    appearance is min(doc_id) (one groupby over exploded distinct
    (token, doc) pairs — per-doc set() needs no dedup shuffle), counts
    of first-appearances per doc feed ONE distributed prefix sum
    (stages/temporal.cumsum_per_key, constant key), giving the
    cumulative vocabulary size at every introducing doc."""
    from igpm_pem_ray.stages.temporal import cumsum_per_key
    from ray.data.aggregate import Min, Count

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def toks(b: pa.Table) -> pa.Table:
        ids, ws = [], []
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            s = set((txt or "").split())
            ids.extend([did] * len(s))
            ws.extend(s)
        return pa.table({"doc_id": np.asarray(ids, np.int64),
                         "w": pa.array(ws, pa.string())})

    first = docs.map_batches(toks, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("w").aggregate(Min("doc_id", alias_name="first_doc"))
    intro = first.groupby("first_doc").aggregate(
        Count(alias_name="n_new")) \
        .map_batches(lambda b: pa.table({
            "doc_id": b["first_doc"].cast(pa.int64()),
            "key": np.zeros(b.num_rows, np.int64),
            "us": b["first_doc"].cast(pa.int64()),
            "val": b["n_new"].cast(pa.int64())}), batch_format="pyarrow")
    cum = cumsum_per_key(intro, payload_cols=["doc_id"])
    return cum.map_batches(lambda t: pa.table({
        "doc_id": t["doc_id"],
        "vocab_size": t["cum_val"].cast(pa.int64())}),
        batch_format="pyarrow")


def sql_vocab_growth() -> str:
    return (
        r"WITH dt AS (SELECT DISTINCT doc_id, "
        r"unnest(list_filter(string_split_regex(text, '\s+'), "
        "x -> x <> '')) AS w FROM documents), "
        "f AS (SELECT w, min(doc_id) AS first_doc FROM dt GROUP BY 1), "
        "i AS (SELECT first_doc AS doc_id, count(*) AS n_new FROM f "
        "GROUP BY 1) "
        "SELECT doc_id, CAST(sum(n_new) OVER (ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size FROM i")


# ---------------- bigram-LM familiarity score ----------------

def q_bigram_lm(sf_dir: str):
    """Per-document mean corpus-bigram frequency — the bigram
    extension of `q_doc_rarity`'s unigram-LM filter (the KenLM-style
    curation score, Wenzek et al. 1911.00359 section 3.3, in the
    integer-exact no-log convention: fam_mean = sum(tf * c(bigram)) //
    n_bigrams, where c is the corpus count of the bigram).  LOW score
    = improbable token transitions (gibberish / shuffled text); high =
    boilerplate-like.  Docs with < 2 tokens emit no bigrams and are
    absent from the output, matching the SQL groupby.

    Scale shape (same as doc_rarity, on bigram keys): per-doc tf
    partials first — the shuffle carries O(doc x distinct-bigram)
    rows, not O(tokens); ONE bigram-keyed groupby for corpus counts;
    one join on the bigram key; one per-doc groupby for the score.
    The tf stage is the explode+shift vectorization of the bigram
    window: tokens of one doc are contiguous after explode, so
    "token + shifted token where the shifted row is the same doc"
    enumerates exactly the adjacent pairs with no per-row loop."""
    from ray.data.aggregate import Sum as _Sum

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tf(df):
        import pandas as pd
        e = pd.DataFrame({"doc_id": df["doc_id"],
                          "token": df["text"].str.split()}).explode(
            "token", ignore_index=True)
        e = e[e["token"].notna()]
        same = e["doc_id"].eq(e["doc_id"].shift(-1))
        g = pd.DataFrame({
            "doc_id": e["doc_id"][same],
            "bigram": e["token"][same] + " " + e["token"].shift(-1)[same]})
        if len(g) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "bigram": pa.array([], type=pa.string()),
                             "tf": pa.array([], type=pa.int64())})
        out = g.groupby(["doc_id", "bigram"], sort=False).size() \
            .reset_index(name="tf")
        return pa.table({"doc_id": out["doc_id"].to_numpy(np.int64),
                         "bigram": pa.array(out["bigram"].tolist(),
                                            pa.string()),
                         "tf": out["tf"].to_numpy(np.int64)})

    tfd = docs.map_batches(tf, batch_format="pandas").materialize()
    counts = tfd.groupby("bigram").aggregate(
        _Sum("tf", alias_name="c")).materialize()
    np_join = 1 if counts.count() < 200_000 else 16
    j = tfd.join(counts.rename_columns({"bigram": "bigram2"}),
                 join_type="inner", num_partitions=np_join,
                 on=("bigram",), right_on=("bigram2",))

    def score(b: pa.Table) -> pa.Table:
        tfv = b["tf"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": b["doc_id"],
                         "n_bigrams": tfv,
                         "fam_sum": tfv * c})

    per_doc = j.map_batches(score, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(_Sum("n_bigrams", alias_name="n_bigrams"),
                                     _Sum("fam_sum", alias_name="fs"))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        fs = b["fs"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "n_bigrams": n,
                         "fam_mean": fs // n})

    return per_doc.map_batches(finish, batch_format="pyarrow") \
        .sort("doc_id")


def sql_bigram_lm() -> str:
    return (
        r"WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, "
        r"'\s+'), x -> x <> '') AS toks FROM documents), "
        "ix AS (SELECT doc_id, toks, "
        "unnest(generate_series(1, len(toks)-1)) AS i "
        "FROM t WHERE len(toks) >= 2), "
        "g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram "
        "FROM ix), "
        "tf AS (SELECT doc_id, bigram, count(*) AS tf FROM g "
        "GROUP BY doc_id, bigram), "
        "c AS (SELECT bigram, sum(tf) AS c FROM tf GROUP BY bigram) "
        "SELECT CAST(tf.doc_id AS BIGINT) AS doc_id, "
        "CAST(sum(tf.tf) AS BIGINT) AS n_bigrams, "
        "CAST(sum(tf.tf * c.c) // sum(tf.tf) AS BIGINT) AS fam_mean "
        "FROM tf JOIN c USING (bigram) "
        "GROUP BY tf.doc_id ORDER BY doc_id")


# ---------------- DSIR importance weights ----------------

DSIR_SCALE = 1_000_000   # e6 fixed-point for the count ratio
DSIR_CAP = 1_000_000     # saturate counts so SCALE*(c+1) stays < 2^63
DSIR_TARGET_LANG = "en"  # the target corpus: English documents


def q_dsir_weights(sf_dir: str):
    """DSIR-style importance weights (Xie et al. 2023, Data Selection
    with Importance Resampling, arXiv:2302.03169) in the repo's
    integer-exact no-log convention: the target corpus is the lang=en
    slice, the raw corpus is everything else, and each document scores
    the tf-weighted mean of the Laplace-smoothed per-token count
    ratio

        ratio_e6(w) = (SCALE * min(c_tgt(w)+1, CAP))
                       // min(c_raw(w)+1, CAP)

    — the monotone integer stand-in for the hashed-n-gram
    log-likelihood ratio the paper samples by (high = target-like
    vocabulary).  Counts saturate at CAP on BOTH sides so
    SCALE*(c+1) cannot overflow int64 at any corpus size (tokens past
    1M occurrences are distribution-defining boilerplate whose true
    ratio the cap barely moves).

    Scale shape: per-doc tf partials carry an is-target split from
    the SAME batch (no lang join); ONE vocab-keyed groupby produces
    both conditional counts; one token-keyed join; one per-doc
    groupby.  Identical op order in the SQL oracle."""
    from ray.data.aggregate import Sum as _Sum

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "lang"])

    def tf(df):
        import pandas as pd
        e = pd.DataFrame({"doc_id": df["doc_id"],
                          "tgt": (df["lang"] == DSIR_TARGET_LANG),
                          "token": df["text"].str.split()}).explode(
            "token", ignore_index=True)
        e = e[e["token"].notna()]
        g = e.groupby(["doc_id", "tgt", "token"], sort=False).size() \
            .reset_index(name="tf")
        tfv = g["tf"].to_numpy(np.int64)
        tgt = g["tgt"].to_numpy(bool)
        return pa.table({"doc_id": g["doc_id"].to_numpy(np.int64),
                         "token": pa.array(g["token"].tolist(), pa.string()),
                         "tf": tfv,
                         "tft": np.where(tgt, tfv, 0),
                         "tfr": np.where(tgt, 0, tfv)})

    tfd = docs.map_batches(tf, batch_format="pandas").materialize()
    counts = tfd.groupby("token").aggregate(
        _Sum("tft", alias_name="ct"), _Sum("tfr", alias_name="cr")) \
        .materialize()
    np_join = 1 if counts.count() < 200_000 else 16
    j = tfd.select_columns(["doc_id", "token", "tf"]) \
        .join(counts.rename_columns({"token": "token2"}),
              join_type="inner", num_partitions=np_join,
              on=("token",), right_on=("token2",))

    def score(b: pa.Table) -> pa.Table:
        tfv = b["tf"].to_numpy(zero_copy_only=False)
        ct = np.minimum(b["ct"].to_numpy(zero_copy_only=False) + 1, DSIR_CAP)
        cr = np.minimum(b["cr"].to_numpy(zero_copy_only=False) + 1, DSIR_CAP)
        return pa.table({"doc_id": b["doc_id"],
                         "n_toks": tfv,
                         "ws": tfv * ((DSIR_SCALE * ct) // cr)})

    per_doc = j.map_batches(score, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(_Sum("n_toks", alias_name="n_tokens"),
                                     _Sum("ws", alias_name="ws"))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        ws = b["ws"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": n,
                         "dsir_e6": ws // n})

    return per_doc.map_batches(finish, batch_format="pyarrow") \
        .sort("doc_id")


def sql_dsir_weights() -> str:
    return (
        r"WITH e AS (SELECT doc_id, lang = '" + DSIR_TARGET_LANG + "' AS "
        r"tgt, unnest(list_filter(string_split_regex(text, '\s+'), "
        r"x -> x <> '')) AS token FROM documents), "
        "tf AS (SELECT doc_id, tgt, token, count(*) AS tf "
        "FROM e GROUP BY doc_id, tgt, token), "
        "c AS (SELECT token, sum(CASE WHEN tgt THEN tf ELSE 0 END) AS ct, "
        "sum(CASE WHEN tgt THEN 0 ELSE tf END) AS cr "
        "FROM tf GROUP BY token), "
        "s AS (SELECT tf.doc_id, tf.tf, "
        f"tf.tf * (({DSIR_SCALE} * least(c.ct + 1, {DSIR_CAP})) "
        f"// least(c.cr + 1, {DSIR_CAP})) AS ws "
        "FROM tf JOIN c USING (token)) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(sum(tf) AS BIGINT) AS n_tokens, "
        "CAST(sum(ws) // sum(tf) AS BIGINT) AS dsir_e6 "
        "FROM s GROUP BY doc_id ORDER BY doc_id")


# ---------------- domain-mix quota resampling ----------------

_MIX_SHARES = {"src1": 120, "src2": 80}   # permille of the output
_MIX_DEFAULT = 40                         # every other source
_MIX_M = (1 << 31) - 1                    # hash pre-reduction modulus


def q_domain_mix_sample(sf_dir: str):
    """EXACT quota resampling of the corpus to a target domain mix
    (the DoReMi / Pile domain-reweighting step, Xie et al.
    arXiv:2305.10429 applied as selection): given target permille
    shares per source, budget = min over sources of N_s*1000//share_s
    (the largest output for which every source can fill its share),
    take_s = share_s*budget//1000, and the kept documents are the
    take_s smallest by the RNG-free hash ring ((doc_id % M) *
    2654435761 % M, doc_id) — deterministic across engines and reruns,
    and the quota is EXACT, not binomial (the difference from
    `stratified_sample`, whose per-row coin keeps a random-sized
    sample at fixed rates).

    Scale shape: one O(sources) count groupby (driver sees only the
    per-source totals); the per-source k-smallest selection is
    stages/ranked.topk_per_group — one global (source, h) sort plus
    O(blocks) boundary offsets, no per-group Python.  At 100 TB the
    sort can be replaced by per-source threshold refinement (2-3
    histogram passes) at the cost of two extra scans; the sort form
    is the exact single-shuffle default."""
    from igpm_pem_ray.stages.ranked import topk_per_group

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    cnt = docs.groupby("source").count().to_pandas()
    shares = {s: _MIX_SHARES.get(s, _MIX_DEFAULT) for s in cnt["source"]}
    budget = min(int(n) * 1000 // shares[s]
                 for s, n in zip(cnt["source"], cnt["count()"]))
    take = {s: shares[s] * budget // 1000 for s in shares}

    def pre(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        h = ((did % _MIX_M) * 2654435761) % _MIX_M
        return pa.table({"source": b["source"], "doc_id": did, "h": h})

    ranked = topk_per_group(
        docs.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True),
        key="source", order=["h", "doc_id"],
        descending=[False, False], k=max(take.values()))

    def quota(b: pa.Table) -> pa.Table:
        src = b["source"].to_pylist()
        rk = b["rank"].to_numpy(zero_copy_only=False)
        keep = rk <= np.array([take[s] for s in src], np.int64)
        return pa.table({
            "source": pa.array([s for s, kp in zip(src, keep) if kp],
                               pa.string()),
            "doc_id": b["doc_id"].to_numpy(zero_copy_only=False)[keep]})

    return ranked.map_batches(quota, batch_format="pyarrow") \
        .sort(["source", "doc_id"])


def sql_domain_mix_sample() -> str:
    named = " UNION ALL ".join(
        f"SELECT '{s}' AS source, {p} AS share"
        for s, p in _MIX_SHARES.items())
    return (
        f"WITH named AS ({named}), "
        "c AS (SELECT source, count(*) AS n FROM documents GROUP BY source), "
        "sh AS (SELECT c.source, c.n, "
        f"COALESCE(named.share, {_MIX_DEFAULT}) AS share "
        "FROM c LEFT JOIN named USING (source)), "
        "b AS (SELECT min(n * 1000 // share) AS budget FROM sh), "
        "t AS (SELECT source, share * b.budget // 1000 AS take_s "
        "FROM sh, b), "
        "r AS (SELECT source, doc_id, row_number() OVER ("
        "PARTITION BY source ORDER BY "
        f"((doc_id % {_MIX_M}) * 2654435761) % {_MIX_M}, doc_id) AS rn "
        "FROM documents) "
        "SELECT r.source, CAST(r.doc_id AS BIGINT) AS doc_id "
        "FROM r JOIN t USING (source) WHERE r.rn <= t.take_s "
        "ORDER BY source, doc_id")


# ---------------- Flesch reading-ease readability scoring ----------------

_RE_WORD = r"[^ \t\n\r\f]+"        # RE2-safe explicit whitespace class
_RE_SENT = r"[.!?]+"               # sentence-terminator runs
_RE_SYL = r"[aeiouy]+"             # vowel groups on lowered text


def q_readability(sf_dir: str):
    """Per-document Flesch reading-ease score as an e3 fixed-point
    integer — the classic corpus-quality readability signal (filtering
    gibberish / keyword-stuffed pages before LLM training).  The three
    counts (words, sentence-terminator runs, vowel-group syllable
    proxy) are non-overlapping regex match counts, vectorized via
    pandas str.count per block; the score

        fre_e3 = 206835 - (1015*words)//sentences - (84600*syl)//words

    uses only integer division on nonnegative terms so both engines
    agree bit-for-bit regardless of reduction order.  Corpora without
    terminator punctuation (the driver's synthetic documents) fall
    back to fixed 16-word segments as the sentence proxy — expressed
    identically in both engines.  No shuffle: one stateless map over
    the documents table."""
    import pandas as pd

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.count(_RE_WORD).to_numpy(np.int64)
        sents = df["text"].str.count(_RE_SENT).to_numpy(np.int64)
        sents = np.where(sents == 0, 1 + words // 16, sents)
        syl = df["text"].str.lower().str.count(_RE_SYL).to_numpy(np.int64)
        keep = (words >= 1) & (sents >= 1)
        w, s, y = words[keep], sents[keep], syl[keep]
        fre = 206_835 - (1_015 * w) // s - (84_600 * y) // w
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
            "words": w, "sentences": s, "syllables": y, "fre_e3": fre})

    return docs.map_batches(f, batch_format="pandas")


def sql_readability() -> str:
    return (
        "WITH c AS (SELECT doc_id, "
        f"CAST(length(regexp_extract_all(text, '{_RE_WORD}')) AS BIGINT) AS words, "
        f"CAST(CASE WHEN length(regexp_extract_all(text, '{_RE_SENT}')) = 0 "
        f"THEN 1 + length(regexp_extract_all(text, '{_RE_WORD}')) // 16 "
        f"ELSE length(regexp_extract_all(text, '{_RE_SENT}')) END AS BIGINT) AS sentences, "
        f"CAST(length(regexp_extract_all(lower(text), '{_RE_SYL}')) AS BIGINT) AS syllables "
        "FROM documents) "
        "SELECT doc_id, words, sentences, syllables, "
        "CAST(206835 - (1015*words)//sentences - (84600*syllables)//words "
        "AS BIGINT) AS fre_e3 "
        "FROM c WHERE words >= 1 AND sentences >= 1")


# ---------------- <=1-edit-distance pair join (SymSpell deletion join) ----------------

def q_edit_dist_pairs(sf_dir: str):
    """All customer-name pairs within Levenshtein distance 1 — the
    fuzzy-match / entity-resolution join (typo'd usernames, OCR'd ids)
    done WITHOUT an all-pairs scan: each name emits itself plus its
    single-character deletions (SymSpell deletion neighborhood), one
    Dataset hash self-join on the variant key proposes candidates, and
    a fully vectorized byte-matrix verification (text/editdist.py)
    keeps exact distances only.  Sequential 'Customer#NNNNNNNNN' names
    make single-digit-substitution pairs plentiful and irregular.
    Candidates found via several shared variants collapse through one
    (pair)-keyed groupby-min.  The brute-force O(n^2) levenshtein scan
    lives only in the DuckDB oracle."""
    import pandas as pd

    from igpm_pem_ray.text.editdist import deletion_variants, lev_le1

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def variants(df: pd.DataFrame) -> pa.Table:
        out = deletion_variants(df["c_name"],
                                df["c_custkey"].to_numpy(np.int64))
        return pa.table({"v": pa.array(out["v"], type=pa.string()),
                         "key": out["key"].to_numpy(np.int64),
                         "name": pa.array(out["name"], type=pa.string())})

    va = cust.map_batches(variants, batch_format="pandas")
    left = va.rename_columns({"key": "custkey_a", "name": "na"})
    right = va.rename_columns({"v": "v2", "key": "custkey_b", "name": "nb"})
    j = left.join(right, join_type="inner", num_partitions=16,
                  on=("v",), right_on=("v2",))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["custkey_a"].to_numpy() < df["custkey_b"].to_numpy()
        df = df[keep]
        if not len(df):
            return pd.DataFrame({"custkey_a": pd.Series([], dtype="int64"),
                                 "custkey_b": pd.Series([], dtype="int64"),
                                 "dist": pd.Series([], dtype="int64")})
        d = lev_le1(df["na"], df["nb"])
        ok = d >= 0
        return pd.DataFrame({
            "custkey_a": df["custkey_a"].to_numpy(np.int64)[ok],
            "custkey_b": df["custkey_b"].to_numpy(np.int64)[ok],
            "dist": d[ok]})

    return (j.map_batches(verify, batch_format="pandas")
            .groupby(["custkey_a", "custkey_b"])
            .aggregate(Min(on="dist", alias_name="dist"))
            .map_batches(lambda b: pa.table({
                "custkey_a": b["custkey_a"].cast(pa.int64()),
                "custkey_b": b["custkey_b"].cast(pa.int64()),
                "dist": b["dist"].cast(pa.int64())}),
                batch_format="pyarrow"))


def sql_edit_dist_pairs() -> str:
    return (
        "SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b, "
        "CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist "
        "FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey "
        "WHERE levenshtein(a.c_name, b.c_name) <= 1")


# ---------------- lexical diversity (type-token ratio) ----------------

def q_lexical_diversity(sf_dir: str):
    """Per-document type-token ratio (distinct tokens / tokens, e6
    fixed point) — the lexical-diversity quality signal (template spam
    and keyword stuffing score low; TTR complements the Gopher
    repetition ratios).  Whitespace tokenization shared with
    tfidf_terms; each document lives wholly in one row so the whole
    computation is one stateless shuffle-free map (np.unique per doc,
    the tf_part precedent)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def ttr(b: pa.Table) -> pa.Table:
        ids, uu, tt = [], [], []
        for did, txt in zip(b["doc_id"].to_pylist(),
                            b["text"].to_pylist()):
            t = (txt or "").split()
            if not t:
                continue
            ids.append(did)
            uu.append(len(np.unique(np.asarray(t, dtype=object))))
            tt.append(len(t))
        ids = np.asarray(ids, dtype=np.int64)
        u = np.asarray(uu, dtype=np.int64)
        t = np.asarray(tt, dtype=np.int64)
        return pa.table({
            "doc_id": ids, "n_types": u, "n_tokens": t,
            "ttr_e6": np.floor(u * 1e6 / t + 0.5).astype(np.int64)})

    return docs.map_batches(ttr, batch_format="pyarrow",
                            zero_copy_batch=True)


def sql_lexical_diversity() -> str:
    return (
        r"WITH tok AS (SELECT doc_id, unnest(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
        "FROM documents), "
        "a AS (SELECT doc_id, CAST(count(DISTINCT token) AS BIGINT) AS "
        "n_types, CAST(count(*) AS BIGINT) AS n_tokens FROM tok "
        "GROUP BY doc_id) "
        "SELECT doc_id, n_types, n_tokens, "
        "CAST(floor(n_types * 1e6 / n_tokens + 0.5) AS BIGINT) AS ttr_e6 "
        "FROM a")


# ---------------- vocabulary overlap between sources ----------------

def q_source_vocab_overlap(sf_dir: str):
    """Jaccard overlap of the distinct-token vocabularies of every
    source pair — the corpus-similarity / domain-drift diagnostic
    (two mirrors of one site overlap near 1; distinct domains don't).
    Exact set algebra with one shuffle: distinct (source, token) pairs
    via groupby, then per-token source lists fold into pair
    intersection counts (tokens appear in at most |sources| lists, so
    the per-token pair fan-out is tiny); union sizes come from the
    per-source distinct counts by inclusion-exclusion.  jac_e6 uses
    the shared e6 half-up convention."""
    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def toks(b: pa.Table) -> pa.Table:
        srcs, tok = [], []
        for s, txt in zip(b["source"].to_pylist(), b["text"].to_pylist()):
            t = np.unique(np.asarray((txt or "").split(), dtype=object))
            srcs.append(np.full(len(t), s, dtype=object))
            tok.append(t)
        if not srcs:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "token": pa.array([], type=pa.string())})
        return pa.table({
            "source": pa.array(list(np.concatenate(srcs)),
                               type=pa.string()),
            "token": pa.array(list(np.concatenate(tok)),
                              type=pa.string())})

    st = docs.map_batches(toks, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["source", "token"]).aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"]).materialize()

    sizes = {r["source"]: r["n"] for r in
             st.groupby("source").aggregate(Count(alias_name="n"))
             .take_all()}

    def pairs(df) -> "pd.DataFrame":
        # one group per token (groupby co-locates a token's sources);
        # fan-out is |sources|^2 per token — tiny and bounded
        import pandas as pd
        out_a, out_b = [], []
        ss = sorted(df["source"].unique())
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                out_a.append(ss[i])
                out_b.append(ss[j])
        return pd.DataFrame({"src_a": out_a, "src_b": out_b})

    inter = st.groupby("token").map_groups(pairs, batch_format="pandas") \
        .groupby(["src_a", "src_b"]).aggregate(Count(alias_name="n_inter")) \
        .to_pandas()
    a = inter["src_a"].to_numpy()
    b = inter["src_b"].to_numpy()
    ni = inter["n_inter"].to_numpy(np.int64)
    na = np.asarray([sizes[s] for s in a], dtype=np.int64)
    nb = np.asarray([sizes[s] for s in b], dtype=np.int64)
    un = na + nb - ni
    return pa.table({
        "src_a": a, "src_b": b, "n_inter": ni, "n_union": un,
        "jac_e6": np.floor(ni * 1e6 / un + 0.5).astype(np.int64)})


def sql_source_vocab_overlap() -> str:
    return (
        r"WITH st AS (SELECT DISTINCT source, unnest(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
        "FROM documents), "
        "sz AS (SELECT source, count(*) AS n FROM st GROUP BY source), "
        "i AS (SELECT a.source AS src_a, b.source AS src_b, "
        "count(*) AS n_inter FROM st a JOIN st b ON a.token = b.token "
        "AND a.source < b.source GROUP BY a.source, b.source) "
        "SELECT i.src_a, i.src_b, CAST(i.n_inter AS BIGINT) AS n_inter, "
        "CAST(x.n + y.n - i.n_inter AS BIGINT) AS n_union, "
        "CAST(floor(i.n_inter * 1e6 / (x.n + y.n - i.n_inter) + 0.5) "
        "AS BIGINT) AS jac_e6 "
        "FROM i JOIN sz x ON x.source = i.src_a "
        "JOIN sz y ON y.source = i.src_b")


# ---------------- per-label embedding centroid statistics ----------------

def q_label_centroids(sf_dir: str):
    """Per-(label, dimension) integer centroid sufficient statistics
    (n, sum_e6) of the embedding vectors — the class-separation /
    cluster-profile primitive (LDA-style between-class geometry,
    per-class drift monitoring).  Each block computes one
    (labels x d) partial via the zero-copy list flatten + reshape and
    an O(labels-in-block) add loop, so the shuffle is
    O(blocks x labels x d) scalars, never row data; e6 scaling happens
    per element BEFORE any sum so both engines agree bit for bit."""
    emb = read_table(sf_dir, "embeddings", columns=["embedding", "label"])

    def partial(b: pa.Table) -> pa.Table:
        flat = b["embedding"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        n = b.num_rows
        if not n:
            z = np.zeros(0, dtype=np.int64)
            return pa.table({"label": z, "dim": z, "n": z, "sum_e6": z})
        d = len(flat) // n
        x = scale_col(flat, 1e6).reshape(n, d)
        labels = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        outs_l, outs_dim, outs_n, outs_s = [], [], [], []
        for lb in np.unique(labels):           # O(labels) per block
            m = labels == lb
            outs_l.append(np.full(d, lb, np.int64))
            outs_dim.append(np.arange(d, dtype=np.int64))
            outs_n.append(np.full(d, int(m.sum()), np.int64))
            outs_s.append(x[m].sum(axis=0))
        return pa.table({
            "label": np.concatenate(outs_l),
            "dim": np.concatenate(outs_dim),
            "n": np.concatenate(outs_n),
            "sum_e6": np.concatenate(outs_s)})

    return emb.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby(["label", "dim"]).aggregate(
            Sum("n", alias_name="n"), Sum("sum_e6", alias_name="sum_e6")) \
        .map_batches(lambda b: pa.table({
            "label": b["label"].cast(pa.int64()),
            "dim": b["dim"].cast(pa.int64()),
            "n": b["n"].cast(pa.int64()),
            "sum_e6": b["sum_e6"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_label_centroids() -> str:
    return (
        "WITH u AS (SELECT label, unnest(embedding) AS x, "
        "generate_subscripts(embedding, 1) - 1 AS dim FROM embeddings) "
        "SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(floor(x*1e6+0.5) AS BIGINT)) AS BIGINT) AS sum_e6 "
        "FROM u GROUP BY label, dim")


# ---------------- hapax legomena ratio per source ----------------

def q_hapax_ratio(sf_dir: str):
    """Per-source fraction of vocabulary words that occur exactly once
    in that source (hapax legomena) — the long-tail vocabulary-health
    signal (template/boilerplate corpora have few hapaxes, organic
    text ~40-60%).  One (source, token) count groupby carries the
    whole corpus weight; the vocabulary-sized result folds into
    per-source (vocab, n_hapax) with a second tiny groupby.  e6
    half-up ratio."""
    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def toks(b: pa.Table) -> pa.Table:
        srcs, tok = [], []
        for s, txt in zip(b["source"].to_pylist(), b["text"].to_pylist()):
            t = np.asarray((txt or "").split(), dtype=object)
            srcs.append(np.full(len(t), s, dtype=object))
            tok.append(t)
        if not srcs:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "token": pa.array([], type=pa.string())})
        return pa.table({
            "source": pa.array(list(np.concatenate(srcs)),
                               type=pa.string()),
            "token": pa.array(list(np.concatenate(tok)),
                              type=pa.string())})

    counts = docs.map_batches(toks, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby(["source", "token"]).aggregate(Count(alias_name="c"))

    def fold(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False)
        return pa.table({"source": b["source"],
                         "vocab": np.ones(len(c), np.int64),
                         "n_hapax": (c == 1).astype(np.int64)})

    agg = counts.map_batches(fold, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("source").aggregate(Sum("vocab", alias_name="vocab"),
                                     Sum("n_hapax", alias_name="n_hapax")) \
        .to_pandas()
    v = agg["vocab"].to_numpy(np.int64)
    h = agg["n_hapax"].to_numpy(np.int64)
    return pa.table({
        "source": agg["source"].to_numpy(),
        "vocab": v, "n_hapax": h,
        "hapax_e6": np.floor(h * 1e6 / v + 0.5).astype(np.int64)})


def sql_hapax_ratio() -> str:
    return (
        r"WITH tok AS (SELECT source, unnest(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
        "FROM documents), "
        "c AS (SELECT source, token, count(*) AS c FROM tok "
        "GROUP BY source, token), "
        "a AS (SELECT source, count(*) AS vocab, "
        "sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax "
        "FROM c GROUP BY source) "
        "SELECT source, CAST(vocab AS BIGINT) AS vocab, "
        "CAST(n_hapax AS BIGINT) AS n_hapax, "
        "CAST(floor(n_hapax * 1e6 / vocab + 0.5) AS BIGINT) AS hapax_e6 "
        "FROM a")


# ---------------- ratio-to-parent revenue shares ----------------

def q_revenue_share(sf_dir: str):
    """Each nation's share of its region's revenue and each region's
    share of the total — the ratio-to-parent / ratio-to-report window
    pair that powers drill-down dashboards.  The fact scan is one
    orders |x| customer join + nation groupby-sum; the 25-row nation
    table then folds through region and grand totals on the driver
    (O(nations) scalars).  e6 half-up shares on integer e2 revenue."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey",
                                                   "c_nationkey"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey",
                                                   "o_totalprice"])
    nat = read_table(sf_dir, "nation",
                     columns=["n_nationkey", "n_regionkey"]).to_pandas()
    n2r = dict(zip(nat["n_nationkey"].astype(np.int64),
                   nat["n_regionkey"].astype(np.int64)))

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "rev_e2": scale_col(
                b["o_totalprice"].to_numpy(zero_copy_only=False), 100.0)})

    j = orders.map_batches(pre, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .join(cust, join_type="inner", num_partitions=4,
              on=("o_custkey",), right_on=("c_custkey",))
    per_nation = j.groupby("c_nationkey").aggregate(
        Sum("rev_e2", alias_name="rev_e2")).to_pandas()
    nk = per_nation["c_nationkey"].to_numpy(np.int64)
    rev = per_nation["rev_e2"].to_numpy(np.int64)
    rk = np.asarray([n2r[k] for k in nk], dtype=np.int64)
    region_tot = {}
    for r, v in zip(rk, rev):
        region_tot[int(r)] = region_tot.get(int(r), 0) + int(v)
    total = int(rev.sum())
    rtot = np.asarray([region_tot[int(r)] for r in rk], dtype=np.int64)
    return pa.table({
        "nationkey": nk, "regionkey": rk, "rev_e2": rev,
        "nation_share_e6": np.floor(rev * 1e6 / rtot + 0.5)
        .astype(np.int64),
        "region_share_e6": np.floor(rtot * 1e6 / total + 0.5)
        .astype(np.int64)})


def sql_revenue_share() -> str:
    return (
        "WITH nrev AS (SELECT c.c_nationkey AS nationkey, "
        "n.n_regionkey AS regionkey, "
        "sum(CAST(floor(o.o_totalprice*100.0+0.5) AS BIGINT)) AS rev_e2 "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON n.n_nationkey = c.c_nationkey "
        "GROUP BY c.c_nationkey, n.n_regionkey), "
        "rr AS (SELECT regionkey, sum(rev_e2) AS rtot FROM nrev "
        "GROUP BY regionkey), "
        "t AS (SELECT sum(rev_e2) AS total FROM nrev) "
        "SELECT CAST(nrev.nationkey AS BIGINT) AS nationkey, "
        "CAST(nrev.regionkey AS BIGINT) AS regionkey, "
        "CAST(nrev.rev_e2 AS BIGINT) AS rev_e2, "
        "CAST(floor(nrev.rev_e2 * 1e6 / rr.rtot + 0.5) AS BIGINT) "
        "AS nation_share_e6, "
        "CAST(floor(rr.rtot * 1e6 / t.total + 0.5) AS BIGINT) "
        "AS region_share_e6 "
        "FROM nrev JOIN rr USING (regionkey), t")


# ---------------- conjunctive boolean retrieval (AND query) ----------------

BOOL_TERMS = ("data", "join", "table")


def q_bool_and_search(sf_dir: str):
    """Documents containing ALL of three query terms — conjunctive
    boolean retrieval over the same per-doc distinct-token explode the
    inverted index uses: filter to the query terms at tokenize time
    (the postings never leave the block unfiltered), one (doc_id)
    groupby counting distinct matched terms, keep count == |terms|.
    Output (doc_id, n_terms_matched) for the matching docs."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms = set(BOOL_TERMS)

    def hits(b: pa.Table) -> pa.Table:
        ids, toks = [], []
        for did, txt in zip(b["doc_id"].to_pylist(),
                            b["text"].to_pylist()):
            present = terms.intersection((txt or "").split())
            ids.extend([did] * len(present))
            toks.extend(sorted(present))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "token": pa.array(toks, type=pa.string())})

    return docs.map_batches(hits, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("doc_id").aggregate(Count(alias_name="n_terms_matched")) \
        .map_batches(lambda b: b.filter(
            pc.equal(b["n_terms_matched"], len(BOOL_TERMS))),
            batch_format="pyarrow") \
        .map_batches(lambda b: pa.table({
            "doc_id": b["doc_id"].cast(pa.int64()),
            "n_terms_matched": b["n_terms_matched"].cast(pa.int64())}),
            batch_format="pyarrow")


def sql_bool_and_search() -> str:
    lst = ", ".join(f"'{t}'" for t in BOOL_TERMS)
    return (
        r"WITH tok AS (SELECT DISTINCT doc_id, unnest(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
        "FROM documents) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched "
        f"FROM tok WHERE token IN ({lst}) GROUP BY doc_id "
        f"HAVING count(*) = {len(BOOL_TERMS)}")


# ---------------- pairwise label-centroid distances ----------------

def q_centroid_distances(sf_dir: str):
    """Squared L2 distance between every pair of per-label embedding
    centroids — the class-separation geometry (which classes are
    confusable, embedding-drift tripwire).  Centroid components use
    the TRUNCATING-division convention m_e6 = trunc(sum_e6 / n)
    (DuckDB's integer `//` truncates toward zero on negative sums
    where numpy floors — emulated explicitly), so the pairwise
    distance is integer-exact end to end — no float summation-order
    hazard across dims.  The distributed work is the label_centroids
    partial plan; the (labels x d) result is tiny and pairs fold in
    one numpy step."""
    stats = q_label_centroids(sf_dir).to_pandas()
    piv = stats.pivot(index="label", columns="dim", values="sum_e6")
    ns = stats.pivot(index="label", columns="dim", values="n")
    s = piv.to_numpy(np.int64)
    n = ns.to_numpy(np.int64)
    m = np.sign(s) * (np.abs(s) // n)    # trunc-toward-zero like SQL //
    labels = piv.index.to_numpy(np.int64)
    la, lb, d2 = [], [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            diff = m[i] - m[j]
            la.append(labels[i])
            lb.append(labels[j])
            d2.append(int((diff * diff).sum()))
    return pa.table({"label_a": np.asarray(la, dtype=np.int64),
                     "label_b": np.asarray(lb, dtype=np.int64),
                     "d2_e12": np.asarray(d2, dtype=np.int64)})


def sql_centroid_distances() -> str:
    return (
        "WITH u AS (SELECT label, unnest(embedding) AS x, "
        "generate_subscripts(embedding, 1) - 1 AS dim FROM embeddings), "
        "c AS (SELECT label, dim, "
        "sum(CAST(floor(x*1e6+0.5) AS BIGINT)) // count(*) AS m "
        "FROM u GROUP BY label, dim) "
        "SELECT CAST(a.label AS BIGINT) AS label_a, "
        "CAST(b.label AS BIGINT) AS label_b, "
        "CAST(sum((a.m - b.m) * (a.m - b.m)) AS BIGINT) AS d2_e12 "
        "FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label "
        "GROUP BY a.label, b.label")


# ---------------- entity-resolution identity clusters ----------------

def q_name_clusters(sf_dir: str):
    """End-to-end entity resolution: the SymSpell <=1-edit-distance
    pair join (q_edit_dist_pairs — blocking + exact verification)
    composed with connected-component closure (components_auto: dense
    kernel small, shuffle CC large) into identity clusters
    (custkey, cluster = min member key) — dedupe of typo'd /
    OCR-variant entity names, the full ER pipeline in three
    Dataset stages.  Only customers in >= 1 pair appear (singletons
    are their own identity trivially)."""
    from igpm_pem_ray.graph.components import components_auto

    pairs = q_edit_dist_pairs(sf_dir)
    edges = pairs.map_batches(
        lambda b: pa.table({"src": b["custkey_a"].cast(pa.int64()),
                            "dst": b["custkey_b"].cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    comp = components_auto(edges)
    return comp.map_batches(
        lambda b: pa.table({"custkey": b["vid"].cast(pa.int64()),
                            "cluster": b["component"].cast(pa.int64())}),
        batch_format="pyarrow")


def sql_name_clusters() -> str:
    return (
        "WITH RECURSIVE p AS (SELECT a.c_custkey AS src, "
        "b.c_custkey AS dst FROM customer a JOIN customer b "
        "ON a.c_custkey < b.c_custkey "
        "WHERE levenshtein(a.c_name, b.c_name) <= 1), "
        "ue AS (SELECT src, dst FROM p "
        "UNION SELECT dst AS src, src AS dst FROM p), "
        "verts AS (SELECT DISTINCT src AS vid FROM ue), "
        "reach(a, b) AS (SELECT vid, vid FROM verts "
        "UNION SELECT r.a, e.dst FROM reach r JOIN ue e ON r.b = e.src) "
        "SELECT CAST(a AS BIGINT) AS custkey, "
        "CAST(MIN(b) AS BIGINT) AS cluster FROM reach GROUP BY a")


# ---------------- sequential market-basket pair counts ----------------

SEQ_BASKET_MIN = 2


def q_seq_baskets(sf_dir: str):
    """Cross-order sequential association counts: part a in a
    customer's order k and part b in their NEXT order k+1 — the
    sequential-recommendation signal same-basket association rules
    (assoc_rules) cannot see.  Consecutive order pairs come from the
    sorted-block rank + (custkey, rank) self-join (the distributed-lag
    shape); two lineitem joins expand the baskets (bounded basket
    sizes keep the fan-out linear); one (a, b) groupby with a
    min-support filter."""
    from ray.data.aggregate import Count

    from igpm_pem_ray.stages.ranked import rank_per_group

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderdate"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey",
                                                 "l_partkey"])

    def pre(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"ck": b["o_custkey"].cast(pa.int64()),
                         "day": pc.divide(us, 86_400_000_000),
                         "okey": b["o_orderkey"].cast(pa.int64())})

    ranked = rank_per_group(
        orders.map_batches(pre, batch_format="pyarrow",
                           zero_copy_batch=True),
        key="ck", order=["day", "okey"],
        descending=[False, False]).materialize()
    nxt = ranked.map_batches(
        lambda b: pa.table({"ck2": b["ck"],
                            "prev_rank": b["rank"].to_numpy(
                                zero_copy_only=False) - 1,
                            "okey_b": b["okey"]}),
        batch_format="pyarrow")
    pairs = ranked.join(nxt, join_type="inner", num_partitions=4,
                        on=("ck", "rank"), right_on=("ck2", "prev_rank")) \
        .map_batches(lambda b: pa.table({"okey_a": b["okey"],
                                         "okey_b": b["okey_b"]}),
                     batch_format="pyarrow").materialize()
    la = li.rename_columns({"l_orderkey": "ka", "l_partkey": "part_a"})
    lb = li.rename_columns({"l_orderkey": "kb", "l_partkey": "part_b"})
    j = pairs.join(la, join_type="inner", num_partitions=4,
                   on=("okey_a",), right_on=("ka",)) \
        .join(lb, join_type="inner", num_partitions=4,
              on=("okey_b",), right_on=("kb",))
    counts = j.groupby(["part_a", "part_b"]).aggregate(
        Count(alias_name="n"))
    return counts.map_batches(lambda b: b.filter(
        pa.compute.greater_equal(b["n"], SEQ_BASKET_MIN)),
        batch_format="pyarrow") \
        .map_batches(lambda b: pa.table({
            "part_a": b["part_a"].cast(pa.int64()),
            "part_b": b["part_b"].cast(pa.int64()),
            "n": b["n"].cast(pa.int64())}), batch_format="pyarrow")


def sql_seq_baskets() -> str:
    return (
        "WITH o AS (SELECT o_custkey AS ck, o_orderkey AS okey, "
        "epoch_us(o_orderdate) // 86400000000 AS day FROM orders), "
        "p AS (SELECT okey AS okey_a, lead(okey) OVER ("
        "PARTITION BY ck ORDER BY day, okey) AS okey_b FROM o), "
        "q AS (SELECT okey_a, okey_b FROM p WHERE okey_b IS NOT NULL), "
        "j AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b "
        "FROM q JOIN lineitem a ON a.l_orderkey = q.okey_a "
        "JOIN lineitem b ON b.l_orderkey = q.okey_b) "
        "SELECT CAST(part_a AS BIGINT) AS part_a, "
        "CAST(part_b AS BIGINT) AS part_b, "
        "CAST(count(*) AS BIGINT) AS n FROM j "
        f"GROUP BY part_a, part_b HAVING count(*) >= {SEQ_BASKET_MIN}")


# ---------------- trend detection between time halves ----------------

TREND_TOPK = 20


def q_part_trends(sf_dir: str):
    """Top-20 parts by popularity change between the first and second
    halves of the order-date range — the riser/faller trend screen.
    The epoch split point is derived from two scalar aggregates
    (min/max order day, midpoint by integer floor); per-part
    conditional sums need one join + one groupby; the global top-k by
    (|delta| DESC, part ASC) is a per-block partial selection + one
    tiny merge, never a global sort."""
    from ray.data.aggregate import Sum

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey",
                                                 "l_partkey"])

    def pre(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"okey": b["o_orderkey"].cast(pa.int64()),
                         "day": pc.divide(us, 86_400_000_000)})

    od = orders.map_batches(pre, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    lo, hi = int(od.min("day")), int(od.max("day"))
    mid = (lo + hi) // 2

    j = li.join(od, join_type="inner", num_partitions=4,
                on=("l_orderkey",), right_on=("okey",))

    def halves(b: pa.Table) -> pa.Table:
        d = b["day"].to_numpy(zero_copy_only=False)
        first = (d <= mid).astype(np.int64)
        return pa.table({"part": b["l_partkey"].cast(pa.int64()),
                         "n1": first, "n2": 1 - first})

    agg = j.map_batches(halves, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .groupby("part").aggregate(Sum("n1", alias_name="n_first"),
                                   Sum("n2", alias_name="n_second"))

    def partial(b: pa.Table) -> pa.Table:
        p = b["part"].to_numpy(zero_copy_only=False).astype(np.int64)
        n1 = b["n_first"].to_numpy(zero_copy_only=False).astype(np.int64)
        n2 = b["n_second"].to_numpy(zero_copy_only=False).astype(np.int64)
        delta = n2 - n1
        order = np.lexsort((p, -np.abs(delta)))[:TREND_TOPK]
        return pa.table({"part": p[order], "n_first": n1[order],
                         "n_second": n2[order], "delta": delta[order]})

    return (agg.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
            .repartition(1)
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True))


def sql_part_trends() -> str:
    return (
        "WITH o AS (SELECT o_orderkey AS okey, "
        "epoch_us(o_orderdate) // 86400000000 AS day FROM orders), "
        "b AS (SELECT (min(day) + max(day)) // 2 AS mid FROM o), "
        "c AS (SELECT l.l_partkey AS part, "
        "sum(CASE WHEN o.day <= b.mid THEN 1 ELSE 0 END) AS n_first, "
        "sum(CASE WHEN o.day > b.mid THEN 1 ELSE 0 END) AS n_second "
        "FROM lineitem l JOIN o ON o.okey = l.l_orderkey, b "
        "GROUP BY l.l_partkey) "
        "SELECT CAST(part AS BIGINT) AS part, "
        "CAST(n_first AS BIGINT) AS n_first, "
        "CAST(n_second AS BIGINT) AS n_second, "
        "CAST(n_second - n_first AS BIGINT) AS delta FROM c "
        f"ORDER BY abs(n_second - n_first) DESC, part LIMIT {TREND_TOPK}")


# ---------------- item-item collaborative filtering ----------------

ITEM_CF_TOPK = 20


def q_item_cf(sf_dir: str):
    """Item-item collaborative filtering over the order-part incidence
    (binary implicit feedback): cosine similarity of two parts' order
    sets is co / sqrt(da*db), ranked here by the EXACT integer
    cos^2 * 1e6 = 1e6*co*co // (da*db) — no sqrt, no float, so the
    hash is reduction-order-robust.  Plan: distinct incidence groupby,
    bounded order-key self-join for co-counts, one degree groupby
    broadcast into the scorer, global top-k as per-block partial
    selection + tiny merge (never a global sort)."""
    from ray.data.aggregate import Count
    from igpm_pem_ray.pipelines.common import read_table
    import ray as _ray

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    inc = li.groupby(["l_orderkey", "l_partkey"]) \
        .aggregate(Count(alias_name="_n")).drop_columns(["_n"]) \
        .map_batches(lambda b: pa.table({
            "k": b["l_orderkey"].cast(pa.int64()),
            "p": b["l_partkey"].cast(pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

    degp = inc.groupby("p").aggregate(Count(alias_name="d")).to_pandas()
    dv = np.zeros(int(degp["p"].max()) + 1, np.int64)
    dv[degp["p"].to_numpy()] = degp["d"].to_numpy()
    deg_ref = _ray.put(dv)

    right = inc.map_batches(
        lambda b: pa.table({"k2": b["k"], "p2": b["p"]}),
        batch_format="pyarrow")
    co = inc.join(right, join_type="inner", num_partitions=8,
                  on=("k",), right_on=("k2",)) \
        .map_batches(lambda b: (lambda a, c, m: pa.table({
            "pa_": a[m], "pb": c[m]}))(
            b["p"].to_numpy(zero_copy_only=False),
            b["p2"].to_numpy(zero_copy_only=False),
            b["p"].to_numpy(zero_copy_only=False)
            < b["p2"].to_numpy(zero_copy_only=False)),
            batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["pa_", "pb"]).aggregate(Count(alias_name="co"))

    def score(b: pa.Table, _ref=deg_ref) -> pa.Table:
        d = _ray.get(_ref)
        a = b["pa_"].to_numpy(zero_copy_only=False)
        c = b["pb"].to_numpy(zero_copy_only=False)
        n = b["co"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = (1_000_000 * n * n) // (d[a] * d[c])
        order = np.lexsort((c, a, -s))[:ITEM_CF_TOPK]
        return pa.table({"part_a": a[order], "part_b": c[order],
                         "co": n[order], "cos2_e6": s[order]})

    def select_topk(b: pa.Table) -> pa.Table:
        a = b["part_a"].to_numpy(zero_copy_only=False)
        c = b["part_b"].to_numpy(zero_copy_only=False)
        n = b["co"].to_numpy(zero_copy_only=False)
        s = b["cos2_e6"].to_numpy(zero_copy_only=False)
        o = np.lexsort((c, a, -s))[:ITEM_CF_TOPK]
        return pa.table({"part_a": a[o], "part_b": c[o], "co": n[o],
                         "cos2_e6": s[o]})

    return (co.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1)
            .map_batches(select_topk, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True))


def sql_item_cf() -> str:
    return (
        "WITH inc AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p "
        "FROM lineitem), "
        "deg AS (SELECT p, count(*) AS d FROM inc GROUP BY p), "
        "co AS (SELECT a.p AS part_a, b.p AS part_b, count(*) AS co "
        "FROM inc a JOIN inc b ON a.k = b.k AND a.p < b.p "
        "GROUP BY a.p, b.p) "
        "SELECT CAST(co.part_a AS BIGINT) AS part_a, "
        "CAST(co.part_b AS BIGINT) AS part_b, "
        "CAST(co.co AS BIGINT) AS co, "
        "CAST((1000000 * co.co * co.co) // (da.d * db.d) AS BIGINT) "
        "AS cos2_e6 "
        "FROM co JOIN deg da ON da.p = co.part_a "
        "JOIN deg db ON db.p = co.part_b "
        "ORDER BY cos2_e6 DESC, part_a, part_b "
        f"LIMIT {ITEM_CF_TOPK}")


# ---------------- greedy set cover ----------------

SETCOVER_ROUNDS = 3


def q_set_cover(sf_dir: str):
    """Greedy set cover (the ln(n)-approximation): suppliers are sets,
    the parts they ship are elements; each round picks the supplier
    covering the most still-uncovered parts (tie -> smallest key).
    Returns (round, suppkey, gain, covered_total) — the selection
    transcript, exact integers.  Plan: distinct (supplier, part)
    incidence once; per round the covered set is broadcast (ray.put)
    into a vectorized np.isin filter + one count groupby, and the
    argmax is a per-block top-1 partial + tiny merge.  At 10^12
    elements the covered set becomes a Dataset and the filter an
    anti-join — same round structure, documented here."""
    from ray.data.aggregate import Count
    from igpm_pem_ray.pipelines.common import read_table
    import ray as _ray

    li = read_table(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])
    inc = li.groupby(["l_suppkey", "l_partkey"]) \
        .aggregate(Count(alias_name="_n")).drop_columns(["_n"]) \
        .map_batches(lambda b: pa.table({
            "s": b["l_suppkey"].cast(pa.int64()),
            "p": b["l_partkey"].cast(pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

    covered = np.array([], np.int64)
    out_round, out_supp, out_gain, out_tot = [], [], [], []
    for rnd in range(1, SETCOVER_ROUNDS + 1):
        cov_ref = _ray.put(np.sort(covered))

        def gains(b: pa.Table, _ref=cov_ref) -> pa.Table:
            cov = _ray.get(_ref)
            s = b["s"].to_numpy(zero_copy_only=False)
            p = b["p"].to_numpy(zero_copy_only=False)
            m = ~np.isin(p, cov)
            return pa.table({"s": s[m],
                             "one": np.ones(int(m.sum()), np.int64)})

        g = inc.map_batches(gains, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .groupby("s").aggregate(Count(alias_name="c"))

        def top1(b: pa.Table) -> pa.Table:
            s = b["s"].to_numpy(zero_copy_only=False)
            c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            if not len(s):
                return pa.table({"s": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            o = np.lexsort((s, -c))[:1]
            return pa.table({"s": s[o], "c": c[o]})

        pick = g.map_batches(top1, batch_format="pyarrow",
                             zero_copy_batch=True) \
            .repartition(1) \
            .map_batches(top1, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True).to_pandas()
        if not len(pick):
            break
        sp, gain = int(pick["s"][0]), int(pick["c"][0])

        def new_parts(b: pa.Table, _ref=cov_ref, _sp=sp) -> pa.Table:
            cov = _ray.get(_ref)
            s = b["s"].to_numpy(zero_copy_only=False)
            p = b["p"].to_numpy(zero_copy_only=False)
            m = (s == _sp) & ~np.isin(p, cov)
            return pa.table({"p": p[m]})

        fresh = inc.map_batches(new_parts, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
        covered = np.union1d(covered, fresh["p"].to_numpy())
        out_round.append(rnd)
        out_supp.append(sp)
        out_gain.append(gain)
        out_tot.append(int(len(covered)))
    return pa.table({"round": pa.array(out_round, pa.int64()),
                     "suppkey": pa.array(out_supp, pa.int64()),
                     "gain": pa.array(out_gain, pa.int64()),
                     "covered_total": pa.array(out_tot, pa.int64())})


def sql_set_cover() -> str:
    parts = ["inc AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p "
             "FROM lineitem)",
             "cov0 AS (SELECT CAST(NULL AS BIGINT) AS p WHERE 1=0)"]
    selects = []
    for k in range(1, SETCOVER_ROUNDS + 1):
        parts.append(
            f"cnt{k} AS (SELECT s, count(*) AS c FROM inc "
            f"WHERE p NOT IN (SELECT p FROM cov{k-1}) GROUP BY s)")
        parts.append(
            f"pick{k} AS (SELECT s, c FROM cnt{k} "
            "ORDER BY c DESC, s LIMIT 1)")
        parts.append(
            f"cov{k} AS (SELECT p FROM cov{k-1} UNION "
            f"SELECT p FROM inc WHERE s = (SELECT s FROM pick{k}))")
        selects.append(
            f"SELECT {k} AS round, "
            f"(SELECT CAST(s AS BIGINT) FROM pick{k}) AS suppkey, "
            f"(SELECT CAST(c AS BIGINT) FROM pick{k}) AS gain, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM cov{k}) "
            "AS covered_total "
            # the greedy loop stops when nothing is left to cover --
            # suppress the round entirely, matching the Ray break
            f"WHERE EXISTS (SELECT 1 FROM pick{k})")
    return ("WITH " + ", ".join(parts) + " " +
            " UNION ALL ".join(selects) + " ORDER BY round")


# ---------------- AGMS sketch join-size estimation ----------------

AGMS_K = 64  # independent +/-1 estimators (averaged)
AGMS_DIV_OFF = 1 << 40  # makes the mean's numerator positive: python
# floor-div and DuckDB // (truncation) agree on non-negative operands
AGMS_MULT = 1_103_515_245
AGMS_P = 2_147_483_647  # 2^31 - 1 (prime): h*h stays under 2^62, int64-exact


def _agms_signs(keys: np.ndarray, k: int) -> np.ndarray:
    """(len(keys), ) array of +/-1 for estimator k.  A purely affine
    hash is ADVERSARIAL here: consecutive keys map to an arithmetic
    progression mod the ring whose target bit is far more balanced
    than random (low discrepancy), which collapses every estimator
    toward 0 — measured mean ~100 vs true 6000 before the fix.  The
    quadratic mix (h*h + h) mod p breaks the progression (AMS needs
    ~4-wise independence; x -> x^2 + x mod p is the cheapest step with
    the right behavior), identical integer expression in the SQL
    oracle."""
    h = (keys * AGMS_MULT + 12_345 * (k + 1)) % AGMS_P
    h = (h * h + h) % AGMS_P
    return 2 * ((h >> 15) & 1) - 1


def q_join_size_sketch(sf_dir: str):
    """AGMS (Alon-Gilbert-Matias-Szegedy) sketch estimate of an
    equi-join size |orders x lineitem on orderkey| from one streaming
    pass over EACH side: per estimator k, S_k(R) = sum of sign_k(key)
    over R's rows; E[S_k(R) * S_k(S)] = true join size.  Reports the
    AGMS_K-estimator mean (floored), the exact join size for
    comparison, and the signed per-side sketch sums are exact int64 —
    the whole estimator is integer arithmetic end to end, so the
    oracle hash-matches bit for bit.  Each side's sketch is a
    per-block vectorized partial (+/-1 sums) merged by one tiny
    groupby — the canonical 'sketch the stream, never shuffle the
    rows' shape."""
    from igpm_pem_ray.pipelines.common import read_table

    orders = read_table(sf_dir, "orders", columns=["o_orderkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])

    def sketch(col: str):
        def f(b: pa.Table) -> pa.Table:
            keys = b[col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            sums = np.array([_agms_signs(keys, k).sum()
                             for k in range(AGMS_K)], np.int64)
            return pa.table({"k": np.arange(AGMS_K, dtype=np.int64),
                             "s": sums})
        return f

    so = orders.map_batches(sketch("o_orderkey"), batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("k").aggregate(Sum("s", alias_name="so")).to_pandas()
    sl = li.map_batches(sketch("l_orderkey"), batch_format="pyarrow",
                        zero_copy_batch=True) \
        .groupby("k").aggregate(Sum("s", alias_name="sl")).to_pandas()
    so = so.sort_values("k")["so"].to_numpy().astype(np.int64)
    sl = sl.sort_values("k")["sl"].to_numpy().astype(np.int64)
    est = int(((so * sl).sum() + AGMS_DIV_OFF * AGMS_K)) // AGMS_K \
        - AGMS_DIV_OFF

    # exact join size: every lineitem row joins its (unique) order row
    def ones(b: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([b.num_rows], pa.int64())})

    import ray.data as rd  # noqa: F401 (symmetry with siblings)
    exact = int(li.map_batches(ones, batch_format="pyarrow",
                               zero_copy_batch=True).sum("n") or 0)
    return pa.table({"est_join_size": pa.array([est], pa.int64()),
                     "true_join_size": pa.array([exact], pa.int64())})


def sql_join_size_sketch() -> str:
    def side(table: str, col: str, alias: str) -> str:
        terms = []
        for k in range(AGMS_K):
            h = f"(({col} * {AGMS_MULT} + {12_345 * (k + 1)}) % {AGMS_P})"
            terms.append(
                f"SELECT {k} AS k, sum(2 * (((({h} * {h} + {h}) "
                f"% {AGMS_P}) >> 15) & 1) - 1) AS s FROM {table}")
        return f"{alias} AS ({' UNION ALL '.join(terms)})"

    return (
        "WITH " + side("orders", "o_orderkey", "so") + ", " +
        side("lineitem", "l_orderkey", "sl") + " "
        "SELECT CAST(((SELECT sum(so.s * sl.s) FROM so JOIN sl "
        f"ON so.k = sl.k) + {AGMS_DIV_OFF * AGMS_K}) // {AGMS_K} "
        f"- {AGMS_DIV_OFF} AS BIGINT) AS est_join_size, "
        "(SELECT CAST(count(*) AS BIGINT) FROM lineitem) "
        "AS true_join_size")


# ---------------- top principal direction (integer power iteration) -------

PCA_POWER_ITERS = 3
PCA_POWER_NORM = 1 << 20  # per-round max-abs renormalization target


def q_pca_power(sf_dir: str):
    """Top principal direction of the embedding covariance via
    fixed-round INTEGER power iteration — distributed PCA whose every
    step is exact int64, so the unrolled SQL oracle hash-matches: the
    covariance comes from q_embed_covariance's one-Gram-partial-per-
    block pass (row data never moves), then v <- trunc(C v / s) for
    PCA_POWER_ITERS rounds, where s = max(1, max|C v| // 2^20) keeps
    the products inside int64 (64 dims * 1e6-scale cov * 2^21-bounded
    v < 2^48).  Truncation toward zero is pinned on both engines
    (numpy sign*(abs//s); DuckDB // truncates).  Output: (dim,
    v_fixed) — the fixed-point eigendirection after the last round;
    consumers rescale at will."""
    cov_t = q_embed_covariance(sf_dir)
    i = cov_t["i"].to_numpy()
    j = cov_t["j"].to_numpy()
    c = cov_t["cov_e6"].to_numpy()
    d = int(i.max()) + 1
    C = np.zeros((d, d), np.int64)
    C[i, j] = c
    C[j, i] = c
    v = np.ones(d, np.int64)
    for _ in range(PCA_POWER_ITERS):
        mv = C @ v
        s = max(1, int(np.abs(mv).max()) // PCA_POWER_NORM)
        v = np.sign(mv) * (np.abs(mv) // s)
    return pa.table({"dim": np.arange(d, dtype=np.int64), "v_fixed": v})


def sql_pca_power() -> str:
    parts = [
        "u AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 "
        "AS dim, CAST(floor(unnest(embedding)*1e3+0.5) AS BIGINT) AS x "
        "FROM embeddings)",
        "p AS (SELECT a.dim AS i, b.dim AS j, sum(a.x*b.x) AS sxy, "
        "count(*) AS n FROM u a JOIN u b ON a.vec_id = b.vec_id "
        "GROUP BY a.dim, b.dim)",
        "s AS (SELECT dim, sum(x) AS sx FROM u GROUP BY dim)",
        # full symmetric matrix; trunc-div matches numpy sign*(abs//den)
        "c AS (SELECT p.i, p.j, (p.n*p.sxy - si.sx*sj.sx) // (p.n*p.n) "
        "AS cv FROM p JOIN s si ON si.dim = p.i "
        "JOIN s sj ON sj.dim = p.j)",
        "v0 AS (SELECT DISTINCT dim, CAST(1 AS BIGINT) AS v FROM u)",
    ]
    for k in range(1, PCA_POWER_ITERS + 1):
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT c.i AS dim, "
            f"sum(c.cv * v.v) AS mv FROM c JOIN v{k-1} v ON v.dim = c.j "
            "GROUP BY c.i)")
        parts.append(
            f"n{k} AS (SELECT greatest(1, max(abs(mv)) // "
            f"{PCA_POWER_NORM}) AS s FROM m{k})")
        parts.append(
            f"v{k} AS (SELECT dim, mv // (SELECT s FROM n{k}) AS v "
            f"FROM m{k})")
    return ("WITH " + ", ".join(parts) +
            f" SELECT CAST(dim AS BIGINT) AS dim, "
            f"CAST(v AS BIGINT) AS v_fixed FROM v{PCA_POWER_ITERS} "
            "ORDER BY dim")


# ---------------- survivorship (golden-record merge) ----------------

SURV_BAL_OFF = 1_000_000   # c_acctbal cents offset -> non-negative
SURV_KEY_CAP = 1 << 30     # custkey inverted under this for packed min


def q_survivorship(sf_dir: str):
    """Golden-record selection (MDM survivorship) on top of the
    entity-resolution clusters (q_name_clusters): within each identity
    cluster the surviving record is chosen by rule precedence —
    highest account balance, then longest name, then lowest key.  The
    whole precedence is packed into ONE int64 sort key ((bal+off)<<35
    | namelen<<30 | (cap-custkey)), so the argmax is a single
    groupby(max) with no per-rule passes, and unpacking recovers the
    winner — identical bit layout in the SQL oracle.  Output:
    (cluster, golden_custkey, n_members, best_bal_e2)."""
    from ray.data.aggregate import Count as _Count, Max as _Max
    from igpm_pem_ray.pipelines.common import read_table

    nc = q_name_clusters(sf_dir).materialize()
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_name", "c_acctbal"])

    def pack(b: pa.Table) -> pa.Table:
        bal = scale_col(b["c_acctbal"].to_numpy(zero_copy_only=False),
                        100.0) + SURV_BAL_OFF
        nlen = pc.utf8_length(b["c_name"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        key = b["c_custkey"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"ck": key,
                         "packed": (bal << 35) | (nlen << 30)
                         | (SURV_KEY_CAP - key)})

    j = nc.join(cust.map_batches(pack, batch_format="pyarrow",
                                 zero_copy_batch=True),
                join_type="inner", num_partitions=4,
                on=("custkey",), right_on=("ck",))
    agg = j.groupby("cluster").aggregate(
        _Max("packed", alias_name="best"),
        _Count(alias_name="n_members"))

    def unpack(b: pa.Table) -> pa.Table:
        best = b["best"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cluster": b["cluster"].cast(pa.int64()),
            "golden_custkey": SURV_KEY_CAP - (best & (SURV_KEY_CAP - 1)),
            "n_members": b["n_members"].cast(pa.int64()),
            "best_bal_e2": (best >> 35) - SURV_BAL_OFF})

    return agg.map_batches(unpack, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_survivorship() -> str:
    return (
        "WITH RECURSIVE p AS (SELECT a.c_custkey AS src, "
        "b.c_custkey AS dst FROM customer a JOIN customer b "
        "ON a.c_custkey < b.c_custkey "
        "WHERE levenshtein(a.c_name, b.c_name) <= 1), "
        "ue AS (SELECT src, dst FROM p "
        "UNION SELECT dst AS src, src AS dst FROM p), "
        "verts AS (SELECT DISTINCT src AS vid FROM ue), "
        "reach(a, b) AS (SELECT vid, vid FROM verts "
        "UNION SELECT r.a, e.dst FROM reach r JOIN ue e ON r.b = e.src), "
        "nc AS (SELECT a AS custkey, MIN(b) AS cluster FROM reach "
        "GROUP BY a), "
        "pk AS (SELECT nc.cluster, "
        "((CAST(floor(c.c_acctbal*100.0+0.5) AS BIGINT) "
        f"+ {SURV_BAL_OFF}) << 35) | (length(c.c_name) << 30) | "
        f"({SURV_KEY_CAP} - c.c_custkey) AS packed "
        "FROM nc JOIN customer c ON c.c_custkey = nc.custkey) "
        "SELECT CAST(cluster AS BIGINT) AS cluster, "
        f"CAST({SURV_KEY_CAP} - (max(packed) & {SURV_KEY_CAP - 1}) "
        "AS BIGINT) AS golden_custkey, "
        "CAST(count(*) AS BIGINT) AS n_members, "
        f"CAST((max(packed) >> 35) - {SURV_BAL_OFF} AS BIGINT) "
        "AS best_bal_e2 "
        "FROM pk GROUP BY cluster")


# ---------------- TPC-H Q3 analog (shipping-priority top orders) ----------

DAY_US = 86_400_000_000
Q3_SEGMENT = "BUILDING"
Q3_CUT = "1998-06-30"  # orders before, shipments after (mid-range date)
Q3_TOPK = 10


def q_q3_shipping(sf_dir: str):
    """TPC-H Q3 shape on the testdata tables: unshipped-revenue top
    orders for one market segment — customer |x| orders |x| lineitem
    with date predicates on both fact tables, revenue =
    extendedprice*(1-discount) scaled to int64 PER ROW before any sum
    (the repo's float convention), grouped by (orderkey, orderdate),
    global top-10 by (revenue DESC, orderkey) as per-block partials +
    tiny merge.  The classic 3-way join + filter + agg + topk
    benchmark plan, with the dimension side broadcast-free (customer
    filter pushed into one hash join)."""
    from igpm_pem_ray.pipelines.common import read_table

    cut_day = int(np.datetime64(Q3_CUT).astype("datetime64[D]")
                  .astype(np.int64))
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda b: (lambda k, m: pa.table({"ck": k[m]}))(
            b["c_custkey"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            pc.equal(b["c_mktsegment"], Q3_SEGMENT).to_numpy(
                zero_copy_only=False)),
            batch_format="pyarrow", zero_copy_batch=True)

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(lambda b: (lambda k, c, d, m: pa.table({
            "okey": k[m], "cust": c[m], "oday": d[m]}))(
            b["o_orderkey"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            b["o_custkey"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False) // DAY_US,
            (b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
             .to_numpy(zero_copy_only=False) // DAY_US) < cut_day),
            batch_format="pyarrow", zero_copy_batch=True)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice",
                             "l_discount", "l_shipdate"]) \
        .map_batches(lambda b: (lambda k, r, m: pa.table({
            "lkey": k[m], "rev_e4": r[m]}))(
            b["l_orderkey"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            scale_col(b["l_extendedprice"].to_numpy(zero_copy_only=False)
                      * (1.0 - b["l_discount"].to_numpy(
                          zero_copy_only=False)), 1e4),
            (b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
             .to_numpy(zero_copy_only=False) // DAY_US) > cut_day),
            batch_format="pyarrow", zero_copy_batch=True)

    oc = orders.join(cust, join_type="inner", num_partitions=4,
                     on=("cust",), right_on=("ck",))
    j = li.join(oc, join_type="inner", num_partitions=4,
                on=("lkey",), right_on=("okey",))
    agg = j.groupby(["lkey", "oday"]).aggregate(
        Sum("rev_e4", alias_name="revenue_e4"))

    def topk(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        d = b["order_day"].to_numpy(zero_copy_only=False)
        r = b["revenue_e4"].to_numpy(zero_copy_only=False)
        o = np.lexsort((k, -r))[:Q3_TOPK]
        return pa.table({"o_orderkey": k[o], "order_day": d[o],
                         "revenue_e4": r[o]})

    named = agg.rename_columns({"lkey": "o_orderkey",
                                "oday": "order_day"})
    return (named.map_batches(topk, batch_format="pyarrow",
                              zero_copy_batch=True)
            .repartition(1)
            .map_batches(topk, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True))


def sql_q3_shipping() -> str:
    return (
        "WITH li AS (SELECT l_orderkey, "
        "CAST(floor(l_extendedprice*(1.0-l_discount)*1e4+0.5) AS BIGINT) "
        "AS rev_e4 FROM lineitem "
        f"WHERE epoch_us(l_shipdate) // {86_400_000_000} > "
        f"epoch_us(TIMESTAMP '{Q3_CUT}') // {86_400_000_000}), "
        "o AS (SELECT o_orderkey, o_custkey, "
        f"epoch_us(o_orderdate) // {86_400_000_000} AS order_day "
        "FROM orders WHERE epoch_us(o_orderdate) // "
        f"{86_400_000_000} < epoch_us(TIMESTAMP '{Q3_CUT}') "
        f"// {86_400_000_000}) "
        "SELECT CAST(li.l_orderkey AS BIGINT) AS o_orderkey, "
        "CAST(o.order_day AS BIGINT) AS order_day, "
        "CAST(sum(li.rev_e4) AS BIGINT) AS revenue_e4 "
        "FROM li JOIN o ON o.o_orderkey = li.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        f"AND c.c_mktsegment = '{Q3_SEGMENT}' "
        "GROUP BY li.l_orderkey, o.order_day "
        f"ORDER BY revenue_e4 DESC, o_orderkey LIMIT {Q3_TOPK}")


# ---------------- MinHash sketch accuracy evaluation ----------------

MH_K = 32
MH_P = 2_147_483_647
MH_DOC_MOD = 17  # deterministic doc subset cap for the eval
MH_N = 3          # word-n-gram shingles (q_jaccard_pairs convention)


def q_minhash_acc(sf_dir: str):
    """MinHash sketch accuracy audit — 'verify the sketch against
    ground truth' for the near-dup family: on a deterministic doc
    subset, build K=32 minhash components per doc (md5-based gram
    hash, so both engines hash identically; the production near-dup
    path uses the faster non-SQL-replicable hash_array and is
    rows-only for that reason), and report per pair the TRUE shingle
    intersection/union next to the number of matching components —
    E[matches]/K estimates Jaccard.  Signatures stay a (doc, k, h)
    Dataset: per-component mins via one groupby, matches via one
    (k, h) self-join, truth via the inverted-index gram join."""
    import hashlib
    from ray.data.aggregate import Count, Min as _Min

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(lambda b: (lambda d, m: pa.table({
            "doc_id": d[m], "text": b["text"].filter(pa.array(m))}))(
            b["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            b["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            % MH_DOC_MOD == 0),
            batch_format="pyarrow", zero_copy_batch=True)

    def grams(b: pa.Table) -> pa.Table:
        ids, gs = [], []
        for did, txt in zip(b["doc_id"].to_pylist(),
                            b["text"].to_pylist()):
            toks = [t for t in (txt or "").split() if t]
            if len(toks) < MH_N:
                cand = {" ".join(toks)} if toks else set()
            else:
                cand = {" ".join(toks[i:i + MH_N])
                        for i in range(len(toks) - MH_N + 1)}
            for g in cand:
                ids.append(did)
                gs.append(g)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "gram": pa.array(gs, pa.string())})

    gd = docs.map_batches(grams, batch_format="pyarrow").materialize()

    def hashed(b: pa.Table) -> pa.Table:
        m = np.array([int(hashlib.md5(g.encode()).hexdigest()[:12], 16)
                      for g in b["gram"].to_pylist()], np.int64)
        ks = np.arange(MH_K, dtype=np.int64)
        h = (m[:, None] * (2 * ks + 1)[None, :]
             + (10_007 * ks)[None, :]) % MH_P
        return pa.table({
            "doc_id": np.repeat(
                b["doc_id"].to_numpy(zero_copy_only=False), MH_K),
            "k": np.tile(ks, b.num_rows),
            "h": h.ravel()})

    sig = gd.map_batches(hashed, batch_format="pyarrow") \
        .groupby(["doc_id", "k"]).aggregate(_Min("h", alias_name="h")) \
        .materialize()

    est = sig.join(sig.rename_columns({"doc_id": "doc_b", "k": "k2",
                                       "h": "h2"}),
                   join_type="inner", num_partitions=4,
                   on=("k", "h"), right_on=("k2", "h2")) \
        .map_batches(lambda b: (lambda a, c, m: pa.table({
            "da": a[m], "db": c[m]}))(
            b["doc_id"].to_numpy(zero_copy_only=False),
            b["doc_b"].to_numpy(zero_copy_only=False),
            b["doc_id"].to_numpy(zero_copy_only=False)
            < b["doc_b"].to_numpy(zero_copy_only=False)),
            batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["da", "db"]).aggregate(Count(alias_name="est_matches"))

    sz = gd.groupby("doc_id").aggregate(Count(alias_name="n"))
    inter = gd.join(gd.rename_columns({"doc_id": "doc_b",
                                       "gram": "gram2"}),
                    join_type="inner", num_partitions=4,
                    on=("gram",), right_on=("gram2",)) \
        .map_batches(lambda b: (lambda a, c, m: pa.table({
            "da": a[m], "db": c[m]}))(
            b["doc_id"].to_numpy(zero_copy_only=False),
            b["doc_b"].to_numpy(zero_copy_only=False),
            b["doc_id"].to_numpy(zero_copy_only=False)
            < b["doc_b"].to_numpy(zero_copy_only=False)),
            batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["da", "db"]).aggregate(Count(alias_name="inter"))

    # the doc subset is capped (MH_DOC_MOD), so the per-pair frames
    # are O(subset^2) tiny — merge them on the driver (the distributed
    # work above is the gram/signature construction over the corpus)
    pi = inter.to_pandas()
    pe = est.to_pandas()
    ps = sz.to_pandas()
    if not len(pi):  # empty groupby -> column-less frame (gotcha)
        return pa.table({c: pa.array([], pa.int64())
                         for c in ("doc_a", "doc_b", "inter",
                                   "union_n", "est_matches")})
    szm = dict(zip(ps["doc_id"].astype(np.int64),
                   ps["n"].astype(np.int64)))
    em = {(int(a), int(b)): int(c) for a, b, c in
          zip(pe.get("da", []), pe.get("db", []),
              pe.get("est_matches", []))}
    da = pi["da"].to_numpy().astype(np.int64)
    db = pi["db"].to_numpy().astype(np.int64)
    ic = pi["inter"].to_numpy().astype(np.int64)
    return pa.table({
        "doc_a": da, "doc_b": db, "inter": ic,
        "union_n": np.array([szm[a] + szm[b] for a, b in zip(da, db)],
                            np.int64) - ic,
        "est_matches": np.array([em.get((a, b), 0)
                                 for a, b in zip(da, db)], np.int64)})


def sql_minhash_acc() -> str:
    return (
        r"WITH docs AS (SELECT doc_id, text FROM documents "
        f"WHERE doc_id % {MH_DOC_MOD} = 0), "
        r"t AS (SELECT doc_id, "
        r"list_filter(string_split_regex(text, '\s+'), x -> x <> '') "
        "AS toks FROM docs), "
        "ix AS (SELECT doc_id, toks, "
        f"unnest(generate_series(1, greatest(len(toks)-{MH_N - 1}, 1))) "
        "AS i FROM t), "
        f"g AS (SELECT doc_id, CASE WHEN len(toks) < {MH_N} "
        "THEN array_to_string(toks, ' ') "
        f"ELSE array_to_string(toks[i:i+{MH_N - 1}], ' ') END AS gram "
        "FROM ix), "
        "gd AS (SELECT DISTINCT doc_id, gram FROM g WHERE gram <> ''), "
        "mh AS (SELECT doc_id, k.range AS k, "
        "min((CAST(concat('0x', substr(md5(gram), 1, 12)) AS BIGINT) "
        f"* (2*k.range + 1) + 10007*k.range) % {MH_P}) AS h "
        f"FROM gd, range({MH_K}) k GROUP BY doc_id, k.range), "
        "est AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c "
        "FROM mh a JOIN mh b ON a.k = b.k AND a.h = b.h "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2), "
        "sz AS (SELECT doc_id, count(*) AS n FROM gd GROUP BY 1), "
        "inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c "
        "FROM gd a JOIN gd b ON a.gram = b.gram "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT CAST(i.da AS BIGINT) AS doc_a, "
        "CAST(i.db AS BIGINT) AS doc_b, "
        "CAST(i.c AS BIGINT) AS inter, "
        "CAST(sa.n + sb.n - i.c AS BIGINT) AS union_n, "
        "CAST(coalesce(e.c, 0) AS BIGINT) AS est_matches "
        "FROM inter i JOIN sz sa ON sa.doc_id = i.da "
        "JOIN sz sb ON sb.doc_id = i.db "
        "LEFT JOIN est e ON e.da = i.da AND e.db = i.db")


# -------- reciprocal-rank fusion (hybrid retrieval) --------
#
# Rank-aggregation class: fuse two rankings of the same corpus —
# sparse BM25 (the q_bm25_topk scoring convention) and a query-term
# DENSITY ranking (total query tf scaled by inverse doc length, the
# length-bias-free signal BM25's saturation hides) — with Cormack's
# reciprocal-rank fusion: rrf(d) = sum over lists of 1/(K + rank_d).
# Kept exact-integer as RRF_SCALE // (K + rank) so the fused score is
# identical in the kernel and the SQL oracle (no float fraction sums).

RRF_K = 60
RRF_SCALE = 1_000_000_000
RRF_DEPTH = 50   # per-list candidate depth
RRF_TOPK = 20


def q_rrf_fusion(sf_dir: str):
    """Hybrid-retrieval fusion of two rankings over documents for the
    fixed BM25_TERMS query.  Plan: ONE tokenize pass emits per-doc
    (dl, tf per term) — a doc lives in one row, no shuffle; the BM25
    ranking reuses the q_bm25_topk float expression (fixed parse
    order, e6 fixed point) and the density ranking is pure int64
    (sum tf * 1e6 // dl); each list is a Dataset sort + limit(DEPTH)
    whose tiny (doc_id, rank) head is merged driver-side (O(DEPTH));
    the fused integer RRF scores re-rank, top TOPK returned."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms = BM25_TERMS

    def tf_dl(b: pa.Table) -> pa.Table:
        cols = {"doc_id": [], "dl": []}
        tf_cols = {t: [] for t in terms}
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            toks = (txt or "").split()
            cols["doc_id"].append(did)
            cols["dl"].append(len(toks))
            if toks:
                u, c = np.unique(np.asarray(toks, dtype=object),
                                 return_counts=True)
                lut = dict(zip(u.tolist(), c.tolist()))
            else:
                lut = {}
            for t in terms:
                tf_cols[t].append(int(lut.get(t, 0)))
        out = {"doc_id": pa.array(cols["doc_id"], pa.int64()),
               "dl": pa.array(cols["dl"], pa.int64())}
        for t in terms:
            out[f"tf_{t}"] = pa.array(tf_cols[t], pa.int64())
        return pa.table(out)

    stats_ds = docs.map_batches(tf_dl, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    pdf = stats_ds.map_batches(
        lambda b: pa.table(
            {"dl": b["dl"],
             **{f"has_{t}": (b[f"tf_{t}"].to_numpy(zero_copy_only=False)
                             > 0).astype(np.int64) for t in terms}}),
        batch_format="pyarrow") \
        .sum(["dl"] + [f"has_{t}" for t in terms])
    total_tokens = float(pdf["sum(dl)"])
    df = {t: float(pdf[f"sum(has_{t})"]) for t in terms}
    n_docs = float(docs.count())
    avgdl = total_tokens / n_docs

    def score(b: pa.Table) -> pa.Table:
        dl = b["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        dli = b["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = None
        tf_sum = np.zeros(len(dl), np.int64)
        for t in terms:  # fixed order: s1 + s2 + s3
            tfi = b[f"tf_{t}"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            tf = tfi.astype(np.float64)
            tf_sum = tf_sum + tfi
            idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            st = idf * (tf * (BM25_K1 + 1.0)) \
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
            s = st if s is None else s + st
        dens = np.where(dli > 0, tf_sum * 1_000_000 // np.maximum(dli, 1),
                        np.int64(0))
        return pa.table({"doc_id": b["doc_id"],
                         "score_e6": scale_col(s, 1e6),
                         "dens_e6": dens.astype(np.int64)})

    scored = stats_ds.map_batches(score, batch_format="pyarrow") \
        .materialize()
    la = scored.sort(["score_e6", "doc_id"], descending=[True, False]) \
        .limit(RRF_DEPTH).to_pandas()
    lb = scored.sort(["dens_e6", "doc_id"], descending=[True, False]) \
        .limit(RRF_DEPTH).to_pandas()

    rrf: dict[int, list[int]] = {}
    for lst, slot in ((la, 0), (lb, 1)):
        for r, did in enumerate(lst["doc_id"].to_numpy(), start=1):
            e = rrf.setdefault(int(did), [0, 0])
            e[slot] = r
    rows = []
    for did, (ra, rb) in rrf.items():
        sc = (RRF_SCALE // (RRF_K + ra) if ra else 0) \
            + (RRF_SCALE // (RRF_K + rb) if rb else 0)
        rows.append((did, ra, rb, sc))
    rows.sort(key=lambda x: (-x[3], x[0]))
    rows = rows[:RRF_TOPK]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "rank_bm25": pa.array([r[1] for r in rows], pa.int64()),
        "rank_density": pa.array([r[2] for r in rows], pa.int64()),
        "rrf_score": pa.array([r[3] for r in rows], pa.int64())})


def sql_rrf_fusion() -> str:
    k1, bb = repr(BM25_K1), repr(BM25_B)
    tok = (r"tok AS (SELECT doc_id, unnest(list_filter("
           r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
           "FROM documents), "
           "dl AS (SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS DOUBLE) "
           "AS dl, CAST(COALESCE(c.n, 0) AS BIGINT) AS dli "
           "FROM documents d LEFT JOIN (SELECT doc_id, count(*) "
           "AS n FROM tok GROUP BY doc_id) c ON c.doc_id = d.doc_id), "
           "g AS (SELECT CAST(sum(dl) AS DOUBLE) AS total, "
           "CAST(count(*) AS DOUBLE) AS n, "
           "CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl "
           "FROM dl)")
    parts = [tok]
    for t in BM25_TERMS:
        parts.append(
            f"tf_{t} AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf "
            f"FROM tok WHERE token = '{t}' GROUP BY doc_id), "
            f"df_{t} AS (SELECT CAST(count(*) AS DOUBLE) AS df "
            f"FROM tf_{t})")
    term_exprs = []
    for t in BM25_TERMS:
        term_exprs.append(
            f"(((SELECT n FROM g) - (SELECT df FROM df_{t}) + 0.5)"
            f"/((SELECT df FROM df_{t}) + 0.5)) "
            f"* (COALESCE(tf_{t}.tf, 0.0) * ({k1} + 1.0)) "
            f"/ (COALESCE(tf_{t}.tf, 0.0) + {k1} * (1.0 - {bb} "
            f"+ {bb} * dl.dl / (SELECT avgdl FROM g)))")
    joins = " ".join(
        f"LEFT JOIN tf_{t} ON tf_{t}.doc_id = dl.doc_id"
        for t in BM25_TERMS)
    score = " + ".join(term_exprs)
    tfsum = " + ".join(
        f"CAST(COALESCE(tf_{t}.tf, 0.0) AS BIGINT)" for t in BM25_TERMS)
    return (
        f"WITH {', '.join(parts)}, "
        f"sc AS (SELECT dl.doc_id, "
        f"CAST(floor(({score})*1e6 + 0.5) AS BIGINT) AS score_e6, "
        f"CASE WHEN dl.dli > 0 THEN ({tfsum}) * 1000000 // dl.dli "
        f"ELSE 0 END AS dens_e6 FROM dl {joins}), "
        "ra AS (SELECT doc_id, row_number() OVER "
        "(ORDER BY score_e6 DESC, doc_id) AS r FROM sc), "
        "rb AS (SELECT doc_id, row_number() OVER "
        "(ORDER BY dens_e6 DESC, doc_id) AS r FROM sc), "
        f"raf AS (SELECT * FROM ra WHERE r <= {RRF_DEPTH}), "
        f"rbf AS (SELECT * FROM rb WHERE r <= {RRF_DEPTH}), "
        "u AS (SELECT doc_id FROM raf UNION SELECT doc_id FROM rbf), "
        "f AS (SELECT u.doc_id, "
        "CAST(COALESCE(raf.r, 0) AS BIGINT) AS rank_bm25, "
        "CAST(COALESCE(rbf.r, 0) AS BIGINT) AS rank_density, "
        f"(CASE WHEN raf.r IS NOT NULL THEN {RRF_SCALE} // ({RRF_K} + raf.r) "
        "ELSE 0 END) + "
        f"(CASE WHEN rbf.r IS NOT NULL THEN {RRF_SCALE} // ({RRF_K} + rbf.r) "
        "ELSE 0 END) AS rrf_score "
        "FROM u LEFT JOIN raf ON raf.doc_id = u.doc_id "
        "LEFT JOIN rbf ON rbf.doc_id = u.doc_id) "
        "SELECT doc_id, rank_bm25, rank_density, "
        "CAST(rrf_score AS BIGINT) AS rrf_score FROM f "
        f"ORDER BY rrf_score DESC, doc_id LIMIT {RRF_TOPK}")


# -------- SemDeDup: cluster-then-dedup over embeddings --------

SEM_K = 8            # centroid count (first-K-by-id seeds)
SEM_E3 = 1_000.0     # per-component e3 quantization
# cos >= 0.35 as the integer cross-multiplication 400*dot^2 >= 49*n2a*n2b
SEM_NUM, SEM_DEN = 400, 49


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023, arXiv 2303.09540): semantic
    deduplication that first buckets embeddings into K clusters, then
    removes rows with a near-duplicate EARLIER row (smaller vec_id)
    in the SAME cluster — the clustering bounds the pairwise scope
    that makes naive semantic dedup quadratic.  Deterministic
    convention: centroids = the K smallest vec_ids, assignment =
    argmin integer squared L2 over e3-quantized components (ties to
    the smaller centroid id), duplicate = exists earlier same-cluster
    row with dot > 0 and cos >= 0.35 applied as the exact integer
    cross-multiplication (no sqrt, no fixed-point boundary).

    Scale shape (distributed end to end — this is the point of
    SemDeDup): centroids are the O(K) `sort.limit(K)` head, broadcast
    once via ray.put; assignment is ONE (batch x K) int64 matmul per
    block (squared-L2 via the |y|^2 - 2yC + |c|^2 expansion, exact in
    int64); the duplicate check then runs INSIDE each cluster via
    groupby(cluster).map_groups — a (g x g) int64 matmul per group,
    never a whole-table driver materialization or an all-pairs
    broadcast.  Partitioning assumption (standard for SemDeDup): K is
    chosen so a cluster's (g x dim) matrix fits one worker; at corpus
    scale K grows with N (the paper uses ~N/1000 clusters)."""
    import ray as _ray

    from igpm_pem_ray.ann.knn import _batch_matrix

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # centroids = the K smallest vec_ids — O(K) driver rows only
    cent = emb.sort("vec_id").limit(SEM_K).to_pandas()
    cids = cent["vec_id"].to_numpy().astype(np.int64)
    C = np.floor(np.stack(cent["embedding"].to_numpy()) * SEM_E3
                 + 0.5).astype(np.int64)
    cref = _ray.put((cids, C))
    dim = C.shape[1]

    def assign(b: pa.Table, _r=cref) -> pa.Table:
        cids_, C_ = _ray.get(_r)
        Y = np.floor(_batch_matrix(b) * SEM_E3 + 0.5).astype(np.int64)
        # argmin squared L2, tie -> first index == smallest cid
        # (centroids are id-sorted); exact int64 expansion
        d2 = (Y * Y).sum(1)[:, None] - 2 * (Y @ C_.T) \
            + (C_ * C_).sum(1)[None, :]
        asg = np.argmin(d2, axis=1)
        return pa.table({
            "vec_id": b["vec_id"].cast(pa.int64()),
            "cluster": pa.array(cids_[asg], pa.int64()),
            "x": pa.FixedSizeListArray.from_arrays(
                pa.array(Y.ravel(), pa.int64()), Y.shape[1])})

    assigned = emb.map_batches(assign, batch_format="pyarrow",
                               zero_copy_batch=True)

    def dedup_group(g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        X = g["x"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).astype(np.int64) \
            .reshape(len(ids), dim)[order]
        dots = X @ X.T                           # (g, g)
        n2 = (X * X).sum(1)
        close = (dots > 0) & (SEM_NUM * dots * dots
                              >= SEM_DEN * n2[:, None] * n2[None, :])
        # earlier = strictly smaller vec_id = lower triangle after sort
        dup = (close & np.tri(len(ids), k=-1, dtype=bool)).any(1)
        return pa.table({
            "cluster": pa.array([int(g["cluster"][0].as_py())],
                                pa.int64()),
            "n_items": pa.array([len(ids)], pa.int64()),
            "n_removed": pa.array([int(dup.sum())], pa.int64())})

    return assigned.groupby("cluster").map_groups(
        dedup_group, batch_format="pyarrow")


def sql_semdedup() -> str:
    return (
        "WITH e AS MATERIALIZED (SELECT vec_id, d.range + 1 AS d, "
        "CAST(floor(embedding[CAST(d.range + 1 AS INT)]*1000.0+0.5) "
        "AS BIGINT) AS x FROM embeddings, range(64) d), "
        "cent AS MATERIALIZED (SELECT * FROM e WHERE vec_id IN "
        f"(SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {SEM_K})), "
        "dist AS (SELECT e.vec_id, c.vec_id AS cid, "
        "sum((e.x - c.x)*(e.x - c.x)) AS d2 FROM e "
        "JOIN cent c ON c.d = e.d GROUP BY e.vec_id, c.vec_id), "
        "asg AS MATERIALIZED (SELECT vec_id, cid AS cluster FROM "
        "(SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY d2, cid) AS rn FROM dist) WHERE rn = 1), "
        "n2 AS MATERIALIZED (SELECT vec_id, sum(x*x) AS n2 FROM e "
        "GROUP BY vec_id), "
        "dots AS MATERIALIZED (SELECT a.vec_id AS va, b.vec_id AS vb, "
        "sum(ea.x * eb.x) AS dot FROM asg a JOIN asg b "
        "ON a.cluster = b.cluster AND b.vec_id < a.vec_id "
        "JOIN e ea ON ea.vec_id = a.vec_id "
        "JOIN e eb ON eb.vec_id = b.vec_id AND eb.d = ea.d "
        "GROUP BY a.vec_id, b.vec_id), "
        "rm AS (SELECT DISTINCT d.va AS vec_id FROM dots d "
        "JOIN n2 na ON na.vec_id = d.va "
        "JOIN n2 nb ON nb.vec_id = d.vb "
        f"WHERE d.dot > 0 AND {SEM_NUM} * d.dot * d.dot >= "
        f"{SEM_DEN} * na.n2 * nb.n2) "
        "SELECT CAST(a.cluster AS BIGINT) AS cluster, "
        "CAST(count(*) AS BIGINT) AS n_items, "
        "CAST(sum(CASE WHEN rm.vec_id IS NOT NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_removed "
        "FROM asg a LEFT JOIN rm ON rm.vec_id = a.vec_id "
        "GROUP BY a.cluster")


# -------- hashing-trick linear quality classifier --------

QC_F = 64                    # hashed feature buckets
QC_A = 2_654_435_761         # Knuth multiplicative weight seed
QC_MOD = 1_001               # weights in [-500, 500]


def q_quality_classifier(sf_dir: str):
    """FastText-style linear classifier INFERENCE with the hashing
    trick (Weinberger et al. ICML 2009): every token hashes into one
    of QC_F feature buckets (md5 prefix — the SQL-replicable hash
    convention q_minhash_acc documents; the production sibling would
    use hash_array), bucket weights are a fixed deterministic table
    w_b = (b * QC_A) mod QC_MOD - 500, and a document's score is the
    tf-weighted integer weight sum — the exact shape of applying a
    trained linear quality model (CCNet / fastText lang-quality
    filters) at corpus scale, with the model broadcast as a constant.

    Scale shape: per-doc scores need NO shuffle (a doc lives in one
    row); the tokenize/explode/segment-sum path is vectorized pandas +
    numpy, and md5 runs only on DISTINCT tokens per batch with a
    per-ACTOR vocab cache (stateful actor-pool stage) — Zipf makes
    the distinct set a tiny fraction of the token stream, so the hash
    cost amortizes to vocabulary size, not corpus size.  The only
    exchange is the O(sources) summary groupby.  Empty-token docs are
    absent, matching the SQL token-table groupby."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "source"])
    # autoscaling pool (min 1): a FIXED pool of 4 would reserve every
    # CPU of a 4-CPU session before the read produced a block —
    # deadlock (read backpressured forever)
    return docs.map_batches(_QCScorer, concurrency=(1, 4),
                            batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("source").aggregate(
            _Count(alias_name="n_docs"),
            _Sum("sc", alias_name="sum_score"),
            _Sum("pos", alias_name="n_positive"))


class _QCScorer:
    """Actor-pool scorer: token->weight vocab cache built once per
    actor and reused across batches (the 'model state' of the hashing
    trick); per batch everything is vectorized except one md5 per
    CACHE-MISS distinct token."""

    _CACHE_CAP = 1_000_000   # vocab entries per actor before reset

    def __init__(self):
        self._cache: dict[str, int] = {}

    def _weights(self, uniq: np.ndarray) -> np.ndarray:
        import hashlib
        cache = self._cache
        if len(cache) > self._CACHE_CAP:
            cache.clear()
        w = np.empty(len(uniq), np.int64)
        for i, t in enumerate(uniq):
            v = cache.get(t)
            if v is None:
                bkt = int(hashlib.md5(t.encode()).hexdigest()[:12],
                          16) % QC_F
                v = (bkt * QC_A) % QC_MOD - 500
                cache[t] = v
            w[i] = v
        return w

    def __call__(self, b: pa.Table) -> pa.Table:
        txt = b["text"].to_pandas().fillna("").reset_index(drop=True)
        tok = txt.str.split().explode()
        keep = tok.notna().to_numpy() & (tok != "").to_numpy()
        doc_idx = tok.index.to_numpy()[keep]          # nondecreasing
        flat = tok.to_numpy()[keep].astype(object)
        if not len(flat):
            return pa.table({"source": pa.array([], pa.string()),
                             "sc": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        uniq, inv = np.unique(flat, return_inverse=True)
        w_tok = self._weights(uniq)[inv]
        # segment sum over the sorted doc index (docs with no tokens
        # produce no segment — absent, like the SQL groupby)
        starts = np.concatenate(
            [[0], np.nonzero(np.diff(doc_idx))[0] + 1])
        sc = np.add.reduceat(w_tok, starts)
        seg_docs = doc_idx[starts]
        return pa.table({
            "source": b["source"].take(pa.array(seg_docs, pa.int64())),
            "sc": pa.array(sc, pa.int64()),
            "pos": (sc > 0).astype(np.int64)})


def sql_quality_classifier() -> str:
    return (
        r"WITH tok AS (SELECT doc_id, unnest(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
        "FROM documents), "
        "w AS (SELECT doc_id, "
        "(CAST(concat('0x', substr(md5(token), 1, 12)) AS BIGINT) "
        f"% {QC_F} * {QC_A}) % {QC_MOD} - 500 AS w FROM tok), "
        "d AS (SELECT doc_id, sum(w) AS sc FROM w GROUP BY doc_id) "
        "SELECT s.source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(d.sc) AS BIGINT) AS sum_score, "
        "CAST(sum(CASE WHEN d.sc > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_positive "
        "FROM d JOIN documents s ON s.doc_id = d.doc_id "
        "GROUP BY s.source")


# -------- rank correlation (Kendall tau / Spearman footrule) --------

RC_TOP = 100   # evaluation slice: top-RC_TOP docs by BM25


def q_rank_corr(sf_dir: str):
    """Rank-correlation audit between two retrieval rankings — the
    evaluation primitive behind 'did the cheap ranker approximate
    the expensive one': Kendall concordant/discordant pair counts
    and the Spearman footrule distance between the BM25 ranking and
    the term-density ranking (q_rrf_fusion's two lists), computed on
    the top-RC_TOP BM25 slice with both ranks re-assigned WITHIN the
    slice (row_number order shared with the SQL oracle).  Kendall
    tau is emitted as the shifted fixed point (C - D + P) * 1e6 //
    (2P) in [0, 1e6] so no negative floor division exists in either
    engine.

    Scale shape: scoring is the q_bm25_topk no-shuffle tokenize map;
    the slice is one sort + limit; the O(TOP^2) pair census runs on
    the tiny driver-side slice (4950 pairs)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms = BM25_TERMS

    def tf_dl(b: pa.Table) -> pa.Table:
        cols = {"doc_id": [], "dl": []}
        tf_cols = {t: [] for t in terms}
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            toks = (txt or "").split()
            cols["doc_id"].append(did)
            cols["dl"].append(len(toks))
            if toks:
                u, c = np.unique(np.asarray(toks, dtype=object),
                                 return_counts=True)
                lut = dict(zip(u.tolist(), c.tolist()))
            else:
                lut = {}
            for t in terms:
                tf_cols[t].append(int(lut.get(t, 0)))
        out = {"doc_id": pa.array(cols["doc_id"], pa.int64()),
               "dl": pa.array(cols["dl"], pa.int64())}
        for t in terms:
            out[f"tf_{t}"] = pa.array(tf_cols[t], pa.int64())
        return pa.table(out)

    stats_ds = docs.map_batches(tf_dl, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    pdf = stats_ds.map_batches(
        lambda b: pa.table(
            {"dl": b["dl"],
             **{f"has_{t}": (b[f"tf_{t}"].to_numpy(zero_copy_only=False)
                             > 0).astype(np.int64) for t in terms}}),
        batch_format="pyarrow") \
        .sum(["dl"] + [f"has_{t}" for t in terms])
    total_tokens = float(pdf["sum(dl)"])
    df = {t: float(pdf[f"sum(has_{t})"]) for t in terms}
    n_docs = float(docs.count())
    avgdl = total_tokens / n_docs

    def score(b: pa.Table) -> pa.Table:
        dl = b["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        dli = b["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = None
        tf_sum = np.zeros(len(dl), np.int64)
        for t in terms:
            tfi = b[f"tf_{t}"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            tf = tfi.astype(np.float64)
            tf_sum = tf_sum + tfi
            idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            st = idf * (tf * (BM25_K1 + 1.0)) \
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
            s = st if s is None else s + st
        dens = np.where(dli > 0, tf_sum * 1_000_000 // np.maximum(dli, 1),
                        np.int64(0))
        return pa.table({"doc_id": b["doc_id"],
                         "score_e6": scale_col(s, 1e6),
                         "dens_e6": dens.astype(np.int64)})

    top = stats_ds.map_batches(score, batch_format="pyarrow") \
        .sort(["score_e6", "doc_id"], descending=[True, False]) \
        .limit(RC_TOP).to_pandas()

    # within-slice ranks (deterministic total orders)
    a = np.lexsort((top["doc_id"].to_numpy(),
                    -top["score_e6"].to_numpy()))
    b_ = np.lexsort((top["doc_id"].to_numpy(),
                     -top["dens_e6"].to_numpy()))
    n = len(top)
    ra = np.empty(n, np.int64)
    rb = np.empty(n, np.int64)
    ra[a] = np.arange(1, n + 1)
    rb[b_] = np.arange(1, n + 1)
    da = ra[:, None] - ra[None, :]
    db = rb[:, None] - rb[None, :]
    iu = np.triu_indices(n, 1)
    prod = da[iu] * db[iu]
    conc = int((prod > 0).sum())
    disc = int((prod < 0).sum())
    foot = int(np.abs(ra - rb).sum())
    P = n * (n - 1) // 2
    tau_shift = (conc - disc + P) * 1_000_000 // (2 * P) if P else 0
    return pa.table({"n": pa.array([n], pa.int64()),
                     "concordant": pa.array([conc], pa.int64()),
                     "discordant": pa.array([disc], pa.int64()),
                     "footrule": pa.array([foot], pa.int64()),
                     "tau_shift_e6": pa.array([tau_shift], pa.int64())})


def sql_rank_corr() -> str:
    k1, bb = repr(BM25_K1), repr(BM25_B)
    tok = (r"tok AS (SELECT doc_id, unnest(list_filter("
           r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
           "FROM documents), "
           "dl AS (SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS DOUBLE) "
           "AS dl, CAST(COALESCE(c.n, 0) AS BIGINT) AS dli "
           "FROM documents d LEFT JOIN (SELECT doc_id, count(*) "
           "AS n FROM tok GROUP BY doc_id) c ON c.doc_id = d.doc_id), "
           "g AS (SELECT CAST(sum(dl) AS DOUBLE) AS total, "
           "CAST(count(*) AS DOUBLE) AS n, "
           "CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl "
           "FROM dl)")
    parts = [tok]
    for t in BM25_TERMS:
        parts.append(
            f"tf_{t} AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf "
            f"FROM tok WHERE token = '{t}' GROUP BY doc_id), "
            f"df_{t} AS (SELECT CAST(count(*) AS DOUBLE) AS df "
            f"FROM tf_{t})")
    term_exprs = []
    for t in BM25_TERMS:
        term_exprs.append(
            f"(((SELECT n FROM g) - (SELECT df FROM df_{t}) + 0.5)"
            f"/((SELECT df FROM df_{t}) + 0.5)) "
            f"* (COALESCE(tf_{t}.tf, 0.0) * ({k1} + 1.0)) "
            f"/ (COALESCE(tf_{t}.tf, 0.0) + {k1} * (1.0 - {bb} "
            f"+ {bb} * dl.dl / (SELECT avgdl FROM g)))")
    joins = " ".join(
        f"LEFT JOIN tf_{t} ON tf_{t}.doc_id = dl.doc_id"
        for t in BM25_TERMS)
    score = " + ".join(term_exprs)
    tfsum = " + ".join(
        f"CAST(COALESCE(tf_{t}.tf, 0.0) AS BIGINT)" for t in BM25_TERMS)
    return (
        f"WITH {', '.join(parts)}, "
        f"sc AS (SELECT dl.doc_id, "
        f"CAST(floor(({score})*1e6 + 0.5) AS BIGINT) AS score_e6, "
        f"CASE WHEN dl.dli > 0 THEN ({tfsum}) * 1000000 // dl.dli "
        f"ELSE 0 END AS dens_e6 FROM dl {joins}), "
        "top AS (SELECT * FROM sc "
        f"ORDER BY score_e6 DESC, doc_id LIMIT {RC_TOP}), "
        "rk AS (SELECT doc_id, row_number() OVER "
        "(ORDER BY score_e6 DESC, doc_id) AS ra, row_number() OVER "
        "(ORDER BY dens_e6 DESC, doc_id) AS rb FROM top), "
        "pairs AS (SELECT (a.ra - b.ra) * (a.rb - b.rb) AS prod "
        "FROM rk a JOIN rk b ON a.doc_id < b.doc_id), "
        "s AS (SELECT CAST(count(*) FILTER (prod > 0) AS BIGINT) AS c, "
        "CAST(count(*) FILTER (prod < 0) AS BIGINT) AS d, "
        "CAST(count(*) AS BIGINT) AS p FROM pairs) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM rk) AS n, "
        "s.c AS concordant, s.d AS discordant, "
        "(SELECT CAST(sum(abs(ra - rb)) AS BIGINT) FROM rk) "
        "AS footrule, "
        "CAST(CASE WHEN s.p > 0 THEN (s.c - s.d + s.p) * 1000000 "
        "// (2 * s.p) ELSE 0 END AS BIGINT) AS tau_shift_e6 FROM s")


# -------- RAG chunking: sliding token windows with overlap --------

CHUNK_W = 32   # window length (tokens)
CHUNK_S = 24   # stride (tokens) -> 8-token overlap


def q_chunk_overlap(sf_dir: str):
    """Retrieval-chunking operator: every document splits into
    fixed-width token windows (W = 32) advanced by stride S = 24 so
    adjacent chunks share W - S = 8 tokens of context — the RAG
    ingestion shape (LangChain/LlamaIndex sliding splitter), distinct
    from q_pack_docs (concat-then-chunk, no overlap, cross-doc).
    Convention shared with the oracle: chunk starts at token offsets
    0, S, 2S, ... while start < n_tokens; the tail chunk may be
    short; docs with zero tokens emit nothing.

    Scale shape: pure per-doc arithmetic — chunk counts and the
    boundary checksum need only each doc's token count, so the map
    is stateless and shuffle-free; the output is the per-source
    chunking census (n_docs, n_chunks, n_tokens, padded token cost),
    one O(sources) groupby."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "source"])

    def chunks(b: pa.Table) -> pa.Table:
        srcs, ntok, nchk, cost = [], [], [], []
        for src, txt in zip(b["source"].to_pylist(),
                            b["text"].to_pylist()):
            n = len([t for t in (txt or "").split() if t])
            if n == 0:
                continue
            k = (n + CHUNK_S - 1) // CHUNK_S  # starts: 0, S, ... < n
            srcs.append(src)
            ntok.append(n)
            nchk.append(k)
            # emitted token cost: full windows + the short tail
            cost.append(sum(min(CHUNK_W, n - i * CHUNK_S)
                            for i in range(k)))
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "n_tokens": pa.array(ntok, pa.int64()),
                         "n_chunks": pa.array(nchk, pa.int64()),
                         "emitted": pa.array(cost, pa.int64())})

    return docs.map_batches(chunks, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("source").aggregate(
            _Count(alias_name="n_docs"),
            _Sum("n_tokens", alias_name="n_tokens"),
            _Sum("n_chunks", alias_name="n_chunks"),
            _Sum("emitted", alias_name="emitted_tokens"))


def sql_chunk_overlap() -> str:
    return (
        r"WITH t AS (SELECT doc_id, source, len(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS n "
        "FROM documents), "
        "d AS (SELECT doc_id, source, n, "
        f"(n + {CHUNK_S} - 1) // {CHUNK_S} AS k FROM t WHERE n > 0), "
        "x AS (SELECT doc_id, n, k, "
        "unnest(generate_series(0, k - 1)) AS i FROM d), "
        f"e AS (SELECT doc_id, sum(least({CHUNK_W}, "
        f"n - i * {CHUNK_S})) AS emitted FROM x GROUP BY doc_id) "
        "SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(d.n) AS BIGINT) AS n_tokens, "
        "CAST(sum(d.k) AS BIGINT) AS n_chunks, "
        "CAST(sum(e.emitted) AS BIGINT) AS emitted_tokens "
        "FROM d JOIN e ON e.doc_id = d.doc_id GROUP BY d.source")


# -------- compression-ratio quality signal (rows-only) --------

COMP_E6 = 1_000_000
COMP_REPETITIVE_E6 = 300_000   # ratio below this = highly repetitive


def q_doc_compress_ratio(sf_dir: str):
    """Per-source compression-ratio profile: ratio = zlib(text) bytes
    * 1e6 // raw bytes — the classic repetition / boilerplate signal
    (a cousin of the Gopher repetition rules in q_gopher_quality:
    zlib catches LONG-range duplication the n-gram ratios miss).
    Rows-only: no SQL engine exposes deflate, so the oracle is a
    direct single-process zlib replay in tests/test_text.py.

    Scale shape: zlib is called once per doc inside the batch map
    (CPU-bound C code, the kind of per-doc work actor pools exist
    for), followed by ONE O(sources) groupby; ratios stay int64."""
    import zlib
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    docs = read_table(sf_dir, "documents", columns=["text", "source"])

    def ratio(b: pa.Table) -> pa.Table:
        srcs, rats, reps = [], [], []
        for src, txt in zip(b["source"].to_pylist(),
                            b["text"].to_pylist()):
            raw = (txt or "").encode("utf-8")
            if not raw:
                continue
            r = len(zlib.compress(raw, 6)) * COMP_E6 // len(raw)
            srcs.append(src)
            rats.append(r)
            reps.append(1 if r < COMP_REPETITIVE_E6 else 0)
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "r": pa.array(rats, pa.int64()),
                         "rep": pa.array(reps, pa.int64())})

    return docs.map_batches(ratio, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("source").aggregate(
            _Count(alias_name="n_docs"),
            _Sum("r", alias_name="sum_ratio_e6"),
            _Sum("rep", alias_name="n_repetitive"))


# -------- retrieval evaluation (P@k, recall, MRR) --------

REVAL_K = 10
REVAL_E6 = 1_000_000


def q_retrieval_eval(sf_dir: str):
    """Retrieval-effectiveness evaluation — precision@k, recall@k and
    MRR for the BM25 ranking against the conjunctive ground truth
    (relevant = documents containing ALL query terms, the
    q_bool_and_search set): the ranking-quality half the rank_corr /
    auc family doesn't cover.  MRR's 1/rank is kept exact as the
    floor fixed point REVAL_E6 // rank (one query, so MRR = that of
    the single reciprocal rank; the convention matches the oracle).

    Scale shape: scoring is the q_bm25_topk no-shuffle tokenize map;
    relevance is a vectorized all-terms flag in the same pass; the
    top-k slice is one sort + limit and the metrics are O(k) driver
    arithmetic plus one scalar relevant-count aggregate."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms = BM25_TERMS

    def tf_dl(b: pa.Table) -> pa.Table:
        cols = {"doc_id": [], "dl": []}
        tf_cols = {t: [] for t in terms}
        for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            toks = (txt or "").split()
            cols["doc_id"].append(did)
            cols["dl"].append(len(toks))
            if toks:
                u, c = np.unique(np.asarray(toks, dtype=object),
                                 return_counts=True)
                lut = dict(zip(u.tolist(), c.tolist()))
            else:
                lut = {}
            for t in terms:
                tf_cols[t].append(int(lut.get(t, 0)))
        out = {"doc_id": pa.array(cols["doc_id"], pa.int64()),
               "dl": pa.array(cols["dl"], pa.int64())}
        for t in terms:
            out[f"tf_{t}"] = pa.array(tf_cols[t], pa.int64())
        return pa.table(out)

    stats_ds = docs.map_batches(tf_dl, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    pdf = stats_ds.map_batches(
        lambda b: pa.table(
            {"dl": b["dl"],
             **{f"has_{t}": (b[f"tf_{t}"].to_numpy(zero_copy_only=False)
                             > 0).astype(np.int64) for t in terms}}),
        batch_format="pyarrow") \
        .sum(["dl"] + [f"has_{t}" for t in terms])
    total_tokens = float(pdf["sum(dl)"])
    df = {t: float(pdf[f"sum(has_{t})"]) for t in terms}
    n_docs = float(docs.count())
    avgdl = total_tokens / n_docs

    def score(b: pa.Table) -> pa.Table:
        dl = b["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = None
        rel = np.ones(len(dl), bool)
        for t in terms:
            tfi = b[f"tf_{t}"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            rel &= tfi > 0
            tf = tfi.astype(np.float64)
            idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            st = idf * (tf * (BM25_K1 + 1.0)) \
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
            s = st if s is None else s + st
        return pa.table({"doc_id": b["doc_id"],
                         "score_e6": scale_col(s, 1e6),
                         "rel": rel.astype(np.int64)})

    scored = stats_ds.map_batches(score, batch_format="pyarrow") \
        .materialize()
    n_rel = int(scored.sum("rel") or 0)
    top = scored.sort(["score_e6", "doc_id"], descending=[True, False]) \
        .limit(REVAL_K).to_pandas()
    rels = top["rel"].to_numpy().astype(np.int64)
    hits = int(rels.sum())
    first = int(np.argmax(rels)) + 1 if hits else 0
    mrr = REVAL_E6 // first if first else 0
    prec = hits * REVAL_E6 // REVAL_K
    rec = hits * REVAL_E6 // n_rel if n_rel else 0
    return pa.table({
        "k": pa.array([REVAL_K], pa.int64()),
        "n_relevant": pa.array([n_rel], pa.int64()),
        "hits_at_k": pa.array([hits], pa.int64()),
        "precision_e6": pa.array([prec], pa.int64()),
        "recall_e6": pa.array([rec], pa.int64()),
        "mrr_e6": pa.array([mrr], pa.int64())})


def sql_retrieval_eval() -> str:
    k1, bb = repr(BM25_K1), repr(BM25_B)
    tok = (r"tok AS (SELECT doc_id, unnest(list_filter("
           r"string_split_regex(text, '\s+'), x -> x <> '')) AS token "
           "FROM documents), "
           "dl AS (SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS DOUBLE) "
           "AS dl FROM documents d LEFT JOIN (SELECT doc_id, count(*) "
           "AS n FROM tok GROUP BY doc_id) c ON c.doc_id = d.doc_id), "
           "g AS (SELECT CAST(sum(dl) AS DOUBLE) AS total, "
           "CAST(count(*) AS DOUBLE) AS n, "
           "CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl "
           "FROM dl)")
    parts = [tok]
    for t in BM25_TERMS:
        parts.append(
            f"tf_{t} AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf "
            f"FROM tok WHERE token = '{t}' GROUP BY doc_id), "
            f"df_{t} AS (SELECT CAST(count(*) AS DOUBLE) AS df "
            f"FROM tf_{t})")
    term_exprs = []
    for t in BM25_TERMS:
        term_exprs.append(
            f"(((SELECT n FROM g) - (SELECT df FROM df_{t}) + 0.5)"
            f"/((SELECT df FROM df_{t}) + 0.5)) "
            f"* (COALESCE(tf_{t}.tf, 0.0) * ({k1} + 1.0)) "
            f"/ (COALESCE(tf_{t}.tf, 0.0) + {k1} * (1.0 - {bb} "
            f"+ {bb} * dl.dl / (SELECT avgdl FROM g)))")
    joins = " ".join(
        f"LEFT JOIN tf_{t} ON tf_{t}.doc_id = dl.doc_id"
        for t in BM25_TERMS)
    score = " + ".join(term_exprs)
    relflag = " AND ".join(
        f"COALESCE(tf_{t}.tf, 0.0) > 0" for t in BM25_TERMS)
    return (
        f"WITH {', '.join(parts)}, "
        f"sc AS (SELECT dl.doc_id, "
        f"CAST(floor(({score})*1e6 + 0.5) AS BIGINT) AS score_e6, "
        f"CASE WHEN {relflag} THEN 1 ELSE 0 END AS rel "
        f"FROM dl {joins}), "
        "nr AS (SELECT CAST(sum(rel) AS BIGINT) AS n_rel FROM sc), "
        "top AS (SELECT rel, row_number() OVER "
        "(ORDER BY score_e6 DESC, doc_id) AS rk FROM sc "
        f"ORDER BY score_e6 DESC, doc_id LIMIT {REVAL_K}), "
        "h AS (SELECT CAST(sum(rel) AS BIGINT) AS hits, "
        "CAST(min(CASE WHEN rel = 1 THEN rk END) AS BIGINT) AS fr "
        "FROM top) "
        f"SELECT CAST({REVAL_K} AS BIGINT) AS k, "
        "(SELECT n_rel FROM nr) AS n_relevant, "
        "h.hits AS hits_at_k, "
        f"CAST(h.hits * {REVAL_E6} // {REVAL_K} AS BIGINT) "
        "AS precision_e6, "
        f"CAST(CASE WHEN (SELECT n_rel FROM nr) > 0 THEN "
        f"h.hits * {REVAL_E6} // (SELECT n_rel FROM nr) ELSE 0 END "
        "AS BIGINT) AS recall_e6, "
        f"CAST(CASE WHEN h.fr IS NOT NULL THEN {REVAL_E6} // h.fr "
        "ELSE 0 END AS BIGINT) AS mrr_e6 FROM h")


# -------- token-window document chunking (training-data prep) --------

CHUNK_C = 128       # tokens per chunk
CHUNK_S = 96        # stride (overlap = C - S = 32 tokens)


def q_doc_chunks(sf_dir: str):
    """Fixed-token-window chunking with overlap — the context-window
    packing step every LLM training-data pipeline runs before
    tokenization proper (chunk c of a doc covers token positions
    [c*S, c*S + C); the final partial window is kept; empty docs
    produce no chunks).  Output per (doc_id, chunk_id): token count
    and an exact position-weighted length checksum
    sum over the window of len(tok) * (pos_in_chunk + 1) — a
    content-and-order fingerprint both engines compute exactly.

    Scale shape: a doc lives in one row, so chunking is per-batch
    vectorized numpy — token lengths -> two prefix sums (W1 = cumsum
    len, W2 = cumsum len*(pos+1)) turn every window checksum into two
    subtractions; chunk rows stream out with NO shuffle at all (the
    output is already keyed by doc)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(b: pa.Table) -> pa.Table:
        txt = b["text"].to_pandas().fillna("").reset_index(drop=True)
        tok = txt.str.split().explode()
        keep = tok.notna().to_numpy() & (tok != "").to_numpy()
        doc_idx = tok.index.to_numpy()[keep]
        tlen = tok.str.len().to_numpy()[keep].astype(np.int64)
        dids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_d, out_c, out_n, out_s = [], [], [], []
        if len(doc_idx):
            starts = np.concatenate(
                [[0], np.nonzero(np.diff(doc_idx))[0] + 1])
            ends = np.concatenate([starts[1:], [len(doc_idx)]])
            for st, en in zip(starts, ends):
                n = en - st
                ln = tlen[st:en]
                w1 = np.concatenate([[0], np.cumsum(ln)])
                w2 = np.concatenate(
                    [[0], np.cumsum(ln * (np.arange(n) + 1))])
                n_chunks = 1 + max(0, -(-(n - CHUNK_C) // CHUNK_S)) \
                    if n > CHUNK_C else 1
                cs = np.arange(n_chunks, dtype=np.int64) * CHUNK_S
                ce = np.minimum(cs + CHUNK_C, n)
                ntok = ce - cs
                # sum len*(p - start + 1) over [start, end)
                csum = (w2[ce] - w2[cs]) - cs * (w1[ce] - w1[cs])
                out_d.append(np.full(n_chunks, dids[doc_idx[st]],
                                     np.int64))
                out_c.append(np.arange(n_chunks, dtype=np.int64))
                out_n.append(ntok.astype(np.int64))
                out_s.append(csum.astype(np.int64))
        if not out_d:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64()),
                             "n_tok": pa.array([], pa.int64()),
                             "csum": pa.array([], pa.int64())})
        return pa.table({"doc_id": np.concatenate(out_d),
                         "chunk_id": np.concatenate(out_c),
                         "n_tok": np.concatenate(out_n),
                         "csum": np.concatenate(out_s)})

    return docs.map_batches(chunks, batch_format="pyarrow",
                            zero_copy_batch=True)


def sql_doc_chunks() -> str:
    return (
        r"WITH t AS (SELECT doc_id, list_filter(string_split_regex("
        r"text, '\s+'), x -> x <> '') AS toks FROM documents), "
        "tok AS (SELECT doc_id, "
        "CAST(generate_subscripts(toks, 1) AS BIGINT) - 1 AS p, "
        "CAST(length(unnest(toks)) AS BIGINT) AS ln FROM t), "
        "n AS (SELECT doc_id, count(*) AS nt FROM tok GROUP BY doc_id), "
        "ch AS (SELECT n.doc_id, "
        "unnest(generate_series(0, CAST(CASE WHEN n.nt > "
        f"{CHUNK_C} THEN (n.nt - {CHUNK_C} + {CHUNK_S} - 1) "
        f"// {CHUNK_S} ELSE 0 END AS BIGINT))) AS cid FROM n) "
        "SELECT c.doc_id, CAST(c.cid AS BIGINT) AS chunk_id, "
        "CAST(count(*) AS BIGINT) AS n_tok, "
        f"CAST(sum(k.ln * (k.p - c.cid * {CHUNK_S} + 1)) AS BIGINT) "
        "AS csum "
        "FROM ch c JOIN tok k ON k.doc_id = c.doc_id "
        f"AND k.p >= c.cid * {CHUNK_S} "
        f"AND k.p < c.cid * {CHUNK_S} + {CHUNK_C} "
        "GROUP BY c.doc_id, c.cid")


# -------- concat-then-split sequence packing (sample packing) --------

PACK_W = 2048       # context-window size in tokens


def q_pack_windows(sf_dir: str):
    """GPT-style sequence packing: concatenate every document's token
    stream in doc_id order and split at fixed PACK_W-token context
    windows — each doc lands at global token offset P(d) (the exact
    prefix sum of earlier docs' token counts) and so touches packs
    P//W .. (P+len-1)//W.  Output per doc: token count, first pack,
    offset inside it, and packs spanned — the exact bookkeeping a
    packed-pretraining dataloader needs.

    Scale shape: per-doc token counts are a stateless batch map; the
    GLOBAL ordered prefix sum is ONE sorted-block carry pass
    (stages/temporal.cumsum_per_key with a constant key — O(blocks)
    boundary stitch on the driver, never a whole-corpus array); the rest
    is stateless arithmetic."""
    from igpm_pem_ray.stages.temporal import cumsum_per_key

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(b: pa.Table) -> pa.Table:
        txt = b["text"].to_pandas().fillna("")
        nt = txt.str.split().map(
            lambda l: sum(1 for t in l if t)).to_numpy()
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": np.zeros(len(did), np.int64),
                         "us": did, "doc_id": did,
                         "val": nt.astype(np.int64)})

    rows = docs.map_batches(counts, batch_format="pyarrow",
                            zero_copy_batch=True)
    c = cumsum_per_key(rows, payload_cols=["doc_id", "val"],
                       order_cols=("us",))

    def pack(b: pa.Table) -> pa.Table:
        cum = b["cum_val"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["val"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = cum - n                        # prefix sum BEFORE this doc
        first = p // PACK_W
        last = np.where(n > 0, (p + n - 1) // PACK_W, first)
        return pa.table({
            "doc_id": b["doc_id"].cast(pa.int64()),
            "n_tok": n,
            "pack_first": first,
            "pack_off": p % PACK_W,
            "n_packs": last - first + 1})

    return c.map_batches(pack, batch_format="pyarrow")


def sql_pack_windows() -> str:
    return (
        r"WITH t AS (SELECT doc_id, CAST(len(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) "
        "AS n FROM documents), "
        "c AS (SELECT doc_id, n, "
        "CAST(COALESCE(sum(n) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS BIGINT) AS p FROM t) "
        "SELECT doc_id, n AS n_tok, "
        f"p // {PACK_W} AS pack_first, "
        f"p % {PACK_W} AS pack_off, "
        f"CAST(CASE WHEN n > 0 THEN (p + n - 1) // {PACK_W} "
        f"ELSE p // {PACK_W} END - p // {PACK_W} + 1 AS BIGINT) "
        "AS n_packs "
        "FROM c")
