"""Aggregator / Grouping / Ordering post-ops (SURVEY.md A1/A2/O1).

Reference analogs:
- ``Aggregator`` COUNT/MIN/MAX/SUM/AVG over "OP:sym.prop" specs with
  float coercion (/root/reference/patternmatching/gray/aggregator.py:
  13-52);
- ``Grouping.groupBy`` by node-prop keys (query/Grouping.py:26-41 —
  broken as written in the reference: it uses a list as a dict key;
  the intended tuple-key semantics are implemented here);
- ``Ordering.orderBy`` (query/Ordering.py:22-26).

Ray-Data-first: specs compile once to ``ray.data.aggregate`` objects;
grouped variants are one ``groupby().aggregate`` shuffle; ordering is
``Dataset.sort``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count, Max, Mean, Min, Sum

_OPS = {"COUNT", "MIN", "MAX", "SUM", "AVG"}


def parse_agg_spec(spec: str) -> tuple[str, str]:
    """"SUM:x.score" -> ("SUM", "score"); bare prop names allowed.
    Mirrors the reference's option format (README.md:40-49)."""
    op, _, target = spec.partition(":")
    op = op.upper()
    if op not in _OPS:
        raise ValueError(f"unknown aggregate op {op!r} (have {_OPS})")
    prop = target.split(".")[-1] if target else ""
    return op, prop


def _to_ray_agg(op: str, col: str, alias: str):
    return {
        "COUNT": lambda: Count(alias_name=alias),
        "MIN": lambda: Min(col, alias_name=alias),
        "MAX": lambda: Max(col, alias_name=alias),
        "SUM": lambda: Sum(col, alias_name=alias),
        "AVG": lambda: Mean(col, alias_name=alias),
    }[op]()


def aggregate(ds, specs: list[str], *, group_by: list[str] | None = None):
    """Apply "OP:prop" specs globally or per group.

    Column naming: ``op_prop`` lowercased (e.g. ``sum_score``) —
    deterministic and SQL-mirrorable.  Numeric-string props are
    float-coerced first (the reference coerces at evaluation,
    aggregator.py:30-33).
    """
    parsed = [parse_agg_spec(s) for s in specs]
    need_cols = sorted({p for _, p in parsed if p})

    def coerce(df: pd.DataFrame) -> pd.DataFrame:
        for c in need_cols:
            if c in df.columns and not pd.api.types.is_numeric_dtype(df[c]):
                df[c] = pd.to_numeric(df[c], errors="coerce")
        return df

    if need_cols:
        ds = ds.map_batches(coerce, batch_format="pandas")
    aggs = [_to_ray_agg(op, prop, f"{op.lower()}_{prop}" if prop else "count")
            for op, prop in parsed]
    if group_by:
        return ds.groupby(group_by).aggregate(*aggs)
    # global path: bare Count() (no column) returns 0 in Ray 2.49 —
    # use Dataset.count() for it and aggregate the rest
    out: dict = {}
    rest = [a for (op, prop), a in zip(parsed, aggs) if op != "COUNT" or prop]
    if rest:
        out.update(ds.aggregate(*rest))
    if any(op == "COUNT" and not prop for op, prop in parsed):
        out["count"] = ds.count()
    return out


def group_by(ds, key_cols: list[str]):
    """A2: group rows by key columns -> (key..., rows) per group via a
    vectorized count (the reference's intended tuple-key semantics)."""
    return ds.groupby(key_cols).aggregate(Count(alias_name="n_rows"))


def order_by(ds, keys: list[str], *, descending: bool | list[bool] = False,
             limit: int | None = None):
    """O1/O2: sort (+ optional top-k limit)."""
    out = ds.sort(keys, descending=descending)
    return out.limit(limit) if limit is not None else out
