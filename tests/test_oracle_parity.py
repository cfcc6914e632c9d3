"""Mirror of the driver's correctness gate: run every queries() entry
and compare against its oracle_sql() via DuckDB — row count + schema +
order-insensitive values.

Default scale factor is sf0.001 (fast, every commit).  Set
``GRAFT_PARITY_SF=0.01`` (or any available sf dir suffix) to reproduce
the driver's exact per-round protocol in one command:

    GRAFT_PARITY_SF=0.01 python -m pytest tests/test_oracle_parity.py
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = f"/root/testdata/sf{os.environ.get('GRAFT_PARITY_SF', '0.001')}"


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(name, ducks):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = _normalize(_to_pandas(q(SF_DIR)))
    exp = _normalize(ducks.execute(sql).fetchdf())
    assert list(got.columns) == list(exp.columns), f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind in "iu" or b.dtype.kind in "iu":
            assert (a.astype("int64") == b.astype("int64")).all(), f"{name}.{c} differs"
        else:
            assert (a == b).all(), f"{name}.{c} differs"


def test_rows_only_queries_run():
    """Queries without SQL oracles must still run and return rows."""
    qs = entrymod.queries()
    rows_only = [k for k in qs if k not in entrymod.oracle_sql()]
    assert rows_only, "expected some rows-only queries"
    for name in ["pagerank", "rwr", "simhash", "doc_fingerprint"]:
        got = _to_pandas(qs[name](SF_DIR))
        assert len(got) > 0, name


def test_entry_runs():
    out = _to_pandas(entrymod.entry())
    assert len(out) > 0
    assert set(out.columns) == {"vid", "rank_e8"}


def test_registry_lint(ducks):
    """Registry invariants for the driver contract: every oracle key
    has a query, every oracle SQL at least PLANS in DuckDB against
    the real views (catches schema drift and typos without paying
    execution), and query keys are unique non-empty snake_case."""
    import re

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(re.fullmatch(r"[a-z0-9_]+", k) for k in qs)
    for name, sql in oracles.items():
        ducks.execute(f"EXPLAIN {sql}")  # plans or raises
