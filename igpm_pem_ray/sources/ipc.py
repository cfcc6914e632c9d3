"""Arrow IPC (Feather v2) source/sink.

The interchange format for handing blocks to other Arrow-native tools
(DuckDB, polars, pandas) without a parquet encode/decode: each input
block streams to one `.arrow` file (RecordBatchFileWriter), and
reading maps each file back as ONE zero-copy batch — Arrow IPC is the
memory layout, so `read_ipc` is effectively mmap + pointer fixup, the
cheapest possible source for warm local caches.

Same sink conventions as ``write_jsonl`` / ``write_warc``: one file
per block, named by (content hash, block ordinal) — idempotent
re-runs, no intra-run collisions — written via tmp + rename so a
killed run never leaves a torn file.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd


def write_ipc(ds, out_dir: str) -> int:
    """Dataset -> `.arrow` (Feather v2 / IPC file format) shards;
    returns the row count."""
    import hashlib

    import ray as _ray

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for i, ref in enumerate(ds.to_arrow_refs()):
        tbl = _ray.get(ref)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, tbl.schema) as w:
            w.write_table(tbl)
        buf = sink.getvalue()
        h = hashlib.blake2b(buf, digest_size=10)
        h.update(str(i).encode())
        path = os.path.join(out_dir, f"part-{h.hexdigest()}.arrow")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(buf)
        os.replace(tmp, path)
        n += tbl.num_rows
    return n


def read_ipc(paths) -> "rd.Dataset":
    """`.arrow` file(s)/dir -> Dataset; each file becomes its own
    block via one read task (read_binary_files parallelism), decoded
    by pa.ipc.open_file — no row-level parsing at all."""
    raw = rd.read_binary_files(paths)

    def parse(b: pa.Table) -> pa.Table:
        tables = []
        for blob in b["bytes"].to_pylist():
            with pa.ipc.open_file(pa.BufferReader(blob)) as r:
                tables.append(r.read_all())
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)

    return raw.map_batches(parse, batch_format="pyarrow",
                           zero_copy_batch=True)
