"""Schema-evolution union: combine Datasets whose schemas drifted.

Long-lived crawl/corpus stores accumulate parquet generations with
added, dropped and widened columns; a plain ``Dataset.union`` (or one
``read_parquet`` over the mixed directory) fails or silently
misaligns.  ``union_by_name`` aligns blocks TO A TARGET SCHEMA by
column NAME — missing columns become typed nulls, extra columns drop,
and safely-castable columns (int32 -> int64, float -> double,
timestamp unit changes) widen — the UNION BY NAME / mergeSchema
semantics of the big SQL engines, done as a stateless per-block map
so nothing shuffles and nothing materializes.

Reference context: the reference loads graph snapshots written by
different tool generations (/root/reference/patternmatching loaders
accept both node-link and edge-list shapes); this is the columnar
generalization.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Widest common schema across inputs: the union of field names
    in first-seen order; conflicting types resolve via
    ``pa.unify_schemas`` promotion (permissive mode) — int32/int64 ->
    int64, float/double -> double; irreconcilable types raise."""
    if not schemas:
        return pa.schema([])
    return pa.unify_schemas(list(schemas), promote_options="permissive")


def conform_block(block: pa.Table, target: pa.Schema) -> pa.Table:
    """Project one Arrow block onto ``target``: reorder by name, cast
    where needed, fill absent columns with typed nulls.  Pure Arrow —
    zero-copy when a column already matches."""
    cols = []
    for field in target:
        if field.name in block.column_names:
            col = block[field.name]
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(block.num_rows, field.type))
    return pa.Table.from_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
         for c in cols],
        schema=target)


def union_by_name(datasets: list, target: pa.Schema | None = None):
    """Union Datasets with drifted schemas by column name.

    ``target`` defaults to the unified (widest) schema across inputs.
    Each input gets ONE stateless ``map_batches`` that conforms its
    blocks, then the results chain through ``Dataset.union`` — lazy,
    streaming, no shuffle.  Returns the combined Dataset.
    """
    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    if target is None:
        schemas = []
        for d in datasets:
            s = d.schema()
            schemas.append(s.base_schema if hasattr(s, "base_schema")
                           else s)
        target = unify_schemas(schemas)

    def conform(b: pa.Table, _t=target) -> pa.Table:
        return conform_block(b, _t)

    out = None
    for d in datasets:
        c = d.map_batches(conform, batch_format="pyarrow",
                          zero_copy_batch=True)
        out = c if out is None else out.union(c)
    return out
