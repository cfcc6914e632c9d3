"""JSONL (newline-delimited JSON) source/sink.

The interchange format of LLM data pipelines (one JSON object per
line).  Reading uses ``ray.data.read_json`` (Arrow JSON reader,
block-parallel).  Writing happens INSIDE the map tasks — each block
serializes itself with pandas' C serializer and writes one
``part-<digest>.jsonl`` (tmp + atomic rename; the digest is the
content hash, so a re-run of a failed job rewrites the same file
names idempotently instead of appending duplicates).  Only per-file
row counts flow back to the driver.

No reference analog (the reference reads node-link JSON graphs only,
SURVEY.md section 2.1 S1); this rounds out the source formats a
training-data pipeline ingests.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data as rd


def read_jsonl(path: str, **kwargs):
    """Directory of .jsonl files (or one file) -> Dataset."""
    return rd.read_json(path, **kwargs)


def write_jsonl(ds, out_dir: str) -> int:
    """Dataset -> partitioned .jsonl files (one per block, written by
    the block's own task); returns rows written."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        pdf = batch.to_pandas()
        payload = pdf.to_json(orient="records", lines=True,
                              force_ascii=False)
        if payload and not payload.endswith("\n"):
            payload += "\n"
        digest = hashlib.sha1(payload.encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{digest}.jsonl")
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, path)
        return pa.table({"rows": pa.array([len(pdf)], pa.int64())})

    counts = ds.map_batches(write_block, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    return int(counts["rows"].sum())
