"""Edge-case regressions for the round-4 ADVICE fixes — the sf tables
masked these bugs (no nulls, long day span, every type calibrated), so
each test synthesizes a tiny table that EXERCISES the fixed path and
cross-checks against the same DuckDB oracle SQL on that table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb
import pytest


def _oracle(tmpdir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ["orders", "events"]:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmpdir}/{t}.parquet')")
        except duckdb.IOException:
            pass
    return con.execute(sql).fetchdf()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _cmp(got, exp):
    got, exp = _norm(got), _norm(exp)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind in "iu" or b.dtype.kind in "iu":
            assert (a.astype("int64") == b.astype("int64")).all(), c
        else:
            assert (a == b).all(), c


def test_profile_table_partial_null_batches(ray_session, tmp_path):
    """Null counting must be exact when 0 < nulls < rows in a batch
    (the old per-row nn//len spread truncated to 0)."""
    from igpm_pem_ray.pipelines.relational import (
        q_profile_table, sql_profile_table)
    n = 500
    rng = np.random.default_rng(7)
    ck = rng.integers(1, 100, n).astype("float64")
    ck[rng.random(n) < 0.13] = np.nan  # 0 < nulls < rows
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(
            [None if np.isnan(x) else int(x) for x in ck], pa.int64()),
        "o_orderstatus": pa.array(["O", "F", "P"][i % 3] for i in range(n)),
        "o_totalprice": pa.array(rng.uniform(10, 9000, n)),
        "o_orderpriority": pa.array(["1-URGENT"] * n),
    }), tmp_path / "orders.parquet")
    got = q_profile_table(str(tmp_path)).to_pandas()
    assert int(got.loc[got["column"] == "o_custkey", "n_null"].iloc[0]) > 0
    _cmp(got, _oracle(str(tmp_path), sql_profile_table()))


def _write_events(path, etype, eid, ts_us, value):
    pq.write_table(pa.table({
        "event_id": pa.array(np.asarray(eid, np.int64)),
        "ts": pa.array(np.asarray(ts_us, np.int64)).cast(
            pa.timestamp("us")),
        "user_id": pa.array(np.zeros(len(eid), np.int64)),
        "event_type": pa.array(list(etype), pa.string()),
        "value": pa.array(np.asarray(value, np.float64)),
        "props": pa.array([""] * len(eid), pa.string()),
    }), path)


def test_seasonal_naive_short_span(ray_session, tmp_path):
    """Day span under 8 days: seasonal lag indices go negative — the
    oracle's inner join drops those test days; no wraparound."""
    from igpm_pem_ray.pipelines.relational import (
        q_seasonal_naive, sql_seasonal_naive, DAY_US)
    rng = np.random.default_rng(3)
    days = rng.integers(0, 5, 300)  # 5-day span < 8
    _write_events(tmp_path / "events.parquet",
                  [("click", "view")[i % 2] for i in range(300)],
                  np.arange(300), days * DAY_US + 1234, np.ones(300))
    got = q_seasonal_naive(str(tmp_path)).to_pandas()
    exp = _oracle(str(tmp_path), sql_seasonal_naive())
    _cmp(got, exp)
    # every test day lacks a day-7 lag -> the oracle's empty inner
    # join yields ZERO rows
    assert len(got) == 0


def test_seasonal_naive_partial_lag_window(ray_session, tmp_path):
    """10-day span: test days idx 3..9, but only idx >= 7 have a
    day-7 lag — the oracle keeps just those; no wraparound on the
    rest."""
    from igpm_pem_ray.pipelines.relational import (
        q_seasonal_naive, sql_seasonal_naive, DAY_US)
    rng = np.random.default_rng(5)
    days = rng.integers(0, 10, 600)
    days[:2] = [0, 9]  # pin the span
    _write_events(tmp_path / "events.parquet",
                  [("click", "view", "buy")[i % 3] for i in range(600)],
                  np.arange(600), days * DAY_US + 99, np.ones(600))
    got = q_seasonal_naive(str(tmp_path)).to_pandas()
    exp = _oracle(str(tmp_path), sql_seasonal_naive())
    assert len(got) == 3
    _cmp(got, exp)


def test_conformal_coverage_uncalibrated_type(ray_session, tmp_path):
    """An event type whose rows are ALL odd event_ids has zero
    calibration rows — the oracle's inner joins drop it; the Ray path
    must mask (not KeyError)."""
    from igpm_pem_ray.pipelines.relational import (
        q_conformal_coverage, sql_conformal_coverage)
    rng = np.random.default_rng(11)
    # 'normal' gets both halves; 'oddball' only odd ids (test half)
    et, eid = [], []
    for i in range(400):
        et.append("normal")
        eid.append(i)
    for i in range(40):
        et.append("oddball")
        eid.append(1000 + 2 * i + 1)  # all odd -> never calibration
    n = len(et)
    _write_events(tmp_path / "events.parquet", et, eid,
                  np.arange(n) * 1_000_000,
                  rng.uniform(1, 500, n))
    got = q_conformal_coverage(str(tmp_path)).to_pandas()
    exp = _oracle(str(tmp_path), sql_conformal_coverage())
    assert "oddball" not in set(got["event_type"])
    _cmp(got, exp)


def test_queue_delay_collision_guard(ray_session, tmp_path):
    """Distinct types that share key = hash % 1_000_003 must raise
    loudly instead of silently merging queues."""
    from igpm_pem_ray.pipelines.relational import q_queue_delay
    # find two short strings colliding mod 1_000_003
    seen: dict[int, str] = {}
    pair = None
    i = 0
    while pair is None:
        s = f"t{i}"
        k = int(pd.util.hash_array(
            np.asarray([s], dtype=object)).astype(np.int64)[0] >> 1) \
            % 1_000_003
        if k in seen and seen[k] != s:
            pair = (seen[k], s)
        seen[k] = s
        i += 1
    a, b = pair
    _write_events(tmp_path / "events.parquet",
                  [a, b] * 10, np.arange(20),
                  np.arange(20) * 1_000_000, np.ones(20))
    with pytest.raises(RuntimeError, match="collision"):
        q_queue_delay(str(tmp_path)).materialize()


def test_semdedup_cluster_scoping_planted(ray_session, tmp_path):
    """The distributed SemDeDup must remove a near-dup pair only when
    both rows land in the SAME cluster — a planted cross-cluster
    near-dup pair must survive, and exactly ONE removal happens.
    Cross-checked against the SQL oracle on the same planted table."""
    from igpm_pem_ray.pipelines.analytics import (
        q_semdedup, sql_semdedup, SEM_K)

    dim = 64
    rows = []
    # SEM_K centroid seeds (ids 0..K-1 = the sort.limit(K) head):
    # strongly separated axis directions on dims 0..K-1
    for i in range(SEM_K):
        v = np.zeros(dim); v[i] = 10.0
        rows.append((i, v))
    # planted points carry their mass on NON-centroid dims (>= K), so
    # none is a near-dup of its own centroid (cos ~= 0.11 < 0.35):
    # same-cluster pair -> cluster 0, cosine ~= 1 -> one removal
    p100 = np.zeros(dim); p100[0] = 1.0; p100[8] = 9.0
    rows.append((100, p100))
    rows.append((101, p100 * 1.001))
    # cross-cluster pair: cosine 81/82 ~= 0.99 with each other but the
    # unit anchor on dims 2 vs 3 assigns them to DIFFERENT clusters
    p200 = np.zeros(dim); p200[2] = 1.0; p200[9] = 9.0
    p201 = np.zeros(dim); p201[3] = 1.0; p201[9] = 9.0
    rows.append((200, p200))
    rows.append((201, p201))
    ids = [r[0] for r in rows]
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r[1].astype("float32").tolist()
                               for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(ids), pa.int32()),
    }), tmp_path / "embeddings.parquet")
    got = q_semdedup(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    exp = con.execute(sql_semdedup()).fetchdf()
    _cmp(got, exp)
    # exactly the same-cluster dup is removed; the cross-cluster
    # near-dup pair survives (clustering bounds the pair scope)
    assert int(got["n_removed"].sum()) == 1
