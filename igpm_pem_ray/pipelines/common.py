"""Shared helpers for the queries()/oracle_sql() surface.

Float results are returned as scaled BIGINTs (``floor(x*scale+0.5)``)
in BOTH the Ray pipelines and the DuckDB oracle SQL: the driver
value-hashes results, and double aggregates computed in different
reduction orders differ in the last ulps — scaled-int rounding makes
the comparison robust while keeping 6-9 significant digits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def scale_col(x: np.ndarray, scale: float) -> np.ndarray:
    """floor(x*scale+0.5) as int64 — match sql_scale() exactly."""
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5).astype(np.int64)


def sql_scale(expr: str, scale: str) -> str:
    return f"CAST(floor(({expr})*{scale}+0.5) AS BIGINT)"


# --- the co-occurrence graph: the SQL-expressible edge table every graph
# query runs on (parts that appear in the same order, directed low->high
# key).  Non-bipartite, power-law-ish, deterministic, identical in both
# engines. ---

EDGES_SQL = (
    "SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst "
    "FROM lineitem a JOIN lineitem b "
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
)


def cooccurrence_edges(sf_dir: str, *, num_partitions: int = 16):
    """Ray build of EDGES_SQL: self hash-join of lineitem on l_orderkey
    (Dataset.join shuffle), vectorized src<dst filter, distinct via
    hash aggregate.  Order groups are small (1-7 items), so the join
    fan-out is bounded; at larger scale num_partitions rises with the
    input."""
    from ray.data.aggregate import Count

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    left = li.rename_columns({"l_orderkey": "k", "l_partkey": "src"})
    right = li.rename_columns({"l_orderkey": "k2", "l_partkey": "dst"})
    j = left.join(right, join_type="inner", num_partitions=num_partitions,
                  on=("k",), right_on=("k2",))

    def lt(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = s < d
        return pa.table({"src": s[keep], "dst": d[keep]})

    pairs = j.map_batches(lt, batch_format="pyarrow", zero_copy_batch=True)
    return pairs.groupby(["src", "dst"]).aggregate(Count(alias_name="_n")).drop_columns(["_n"])


def cooccurrence_pairs_multi(sf_dir: str, *, num_partitions: int = 16):
    """The NON-deduplicated co-occurrence pairs: one row per ordered
    lineitem pair sharing an order (canonical src<dst), so each
    (src, dst) appears with multiplicity = number of shared orders.
    This IS the integer-weighted graph in multigraph form — the dense
    substrate's reduceat sums parallel edges natively, so weighted
    kernels need no per-edge weight column at all."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    left = li.rename_columns({"l_orderkey": "k", "l_partkey": "src"})
    right = li.rename_columns({"l_orderkey": "k2", "l_partkey": "dst"})
    j = left.join(right, join_type="inner", num_partitions=num_partitions,
                  on=("k",), right_on=("k2",))

    def lt(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = s < d
        return pa.table({"src": s[keep], "dst": d[keep]})

    return j.map_batches(lt, batch_format="pyarrow", zero_copy_batch=True)


PAIRS_MULTI_SQL = (
    "SELECT a.l_partkey AS src, b.l_partkey AS dst "
    "FROM lineitem a JOIN lineitem b "
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey")
