"""Edge-list readers/writers (SURVEY.md S2/S3/S4/S6).

Reference analogs:
- ``load_edgelist`` (/root/reference/load_edgelist.py:6-41): space-
  delimited ``src dst`` rows; synthetic timestamp ``add = row // tm_size``.
- ``load_edgelist_timestamp`` (load_edgelist_timestamp.py:16-42):
  ``src dst epoch_sec`` -> whole days, re-based to the minimum.
- ``load_edgelist_dataverse`` (load_edgelist_dataverse.py:9-46): quoted
  CSV with '%Y-%m-%d %H:%M:%S' datetimes -> days.

Ray-Data-first: ``read_csv`` with explicit schema/options, vectorized
timestamp math in ``map_batches``; the row-offset stamping uses a
global row index computed from per-block counts (deterministic, no
driver loop over rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data as rd

DAY_SEC = 86_400


def _read_space_delimited(path: str, column_names: list[str]):
    return rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=column_names),
        parse_options=pacsv.ParseOptions(delimiter=" "),
    )


def load_edgelist(path: str, *, tm_size: int = 1):
    """S2: ``src dst`` rows -> (src, dst, ts) with ts = row_index //
    tm_size (the reference's synthetic batch stamping,
    load_edgelist.py:25-33).

    The global row index is assigned deterministically: per-block row
    counts are collected once (metadata-sized), prefix-summed on the
    driver, and each block stamps ``offset + arange(len)`` — no
    driver-side row loop, stable across executions.
    """
    import ray

    ds = _read_space_delimited(path, ["src", "dst"]).materialize()
    refs = ds.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    return rd.from_arrow_refs(
        [_stamp_block.remote(ref, int(off), tm_size)
         for ref, off in zip(refs, offsets)])


def load_edgelist_timestamp(path: str):
    """S3: ``src dst epoch_sec`` -> ts in whole days re-based to the
    global min (load_edgelist_timestamp.py:25-35)."""
    ds = _read_space_delimited(path, ["src", "dst", "epoch"])
    mn = ds.min("epoch")
    mn_day = int(mn) // DAY_SEC

    def rebase(batch: pa.Table) -> pa.Table:
        days = batch["epoch"].to_numpy(zero_copy_only=False) // DAY_SEC - mn_day
        return pa.table({"src": batch["src"], "dst": batch["dst"],
                         "ts": pa.array(days.astype(np.int64))})

    return ds.map_batches(rebase, batch_format="pyarrow", zero_copy_batch=True)


def load_edgelist_datetime(path: str, *, fmt: str = "%Y-%m-%d %H:%M:%S"):
    """S4: quoted CSV ``src,dst,"YYYY-mm-dd HH:MM:SS"`` -> day ts
    re-based to min (load_edgelist_dataverse.py:9-46)."""
    import pyarrow.compute as pc

    ds = rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=["src", "dst", "dt"]),
        parse_options=pacsv.ParseOptions(delimiter=","),
    )

    def to_epoch(batch: pa.Table) -> pa.Table:
        ts = pc.strptime(batch["dt"], format=fmt, unit="s")
        epoch = ts.cast(pa.int64())
        return pa.table({"src": batch["src"], "dst": batch["dst"], "epoch": epoch})

    with_epoch = ds.map_batches(to_epoch, batch_format="pyarrow")
    mn_day = int(with_epoch.min("epoch")) // DAY_SEC

    def rebase(batch: pa.Table) -> pa.Table:
        days = batch["epoch"].to_numpy(zero_copy_only=False) // DAY_SEC - mn_day
        return pa.table({"src": batch["src"], "dst": batch["dst"],
                         "ts": pa.array(days.astype(np.int64))})

    return with_epoch.map_batches(rebase, batch_format="pyarrow")


def write_edgelist(edges_ds, out_dir: str):
    """S6: space-delimited edge-list writer (generator.py:137-141) —
    partitioned CSV directory, not one giant file."""
    edges_ds.write_csv(out_dir)
    return out_dir


import ray  # noqa: E402


@ray.remote
def _nrows(block: pa.Table) -> int:
    return block.num_rows


@ray.remote
def _stamp_block(block: pa.Table, offset: int, tm_size: int) -> pa.Table:
    idx = offset + np.arange(block.num_rows, dtype=np.int64)
    return pa.table({"src": block["src"], "dst": block["dst"],
                     "ts": pa.array(idx // tm_size)})
