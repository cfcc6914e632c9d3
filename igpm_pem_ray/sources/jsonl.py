"""JSONL (newline-delimited JSON) source/sink.

The interchange format of LLM data pipelines (one JSON object per
line).  Reading uses ``ray.data.read_json`` (Arrow JSON reader,
block-parallel).  Writing happens in per-block remote tasks — each
block serializes itself with pandas' C serializer and writes one
``part-<ordinal>-<digest>.jsonl`` (tmp + atomic rename; the digest is
the content hash and the ordinal is the block's position, so a
deterministic re-run rewrites the same file names idempotently while
two byte-identical blocks in one run still land in distinct files).
Only per-file row counts flow back to the driver.

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
    a remote task colocated with the block); returns rows written.

    Filenames mix the block ORDINAL into the content digest
    (``part-<ordinal>-<digest>.jsonl``): a bare content hash would
    collide two byte-identical blocks in ONE run (silent row loss on
    read-back); with the ordinal, intra-run duplicates get distinct
    files while deterministic re-runs (same source, same blocking)
    still rewrite the same file names idempotently."""
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_block(batch: pa.Table, ordinal: int) -> int:
        pdf = batch.to_pandas()
        payload = pdf.to_json(orient="records", lines=True,
                              force_ascii=False)
        if payload and not payload.endswith("\n"):
            payload += "\n"
        digest = hashlib.sha1(payload.encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{ordinal:06d}-{digest}.jsonl")
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, path)
        return len(pdf)

    # to_arrow_refs hands back the materialized blocks without moving
    # them; each write task runs next to its block's object.
    refs = [write_block.remote(ref, i)
            for i, ref in enumerate(ds.to_arrow_refs())]
    return int(sum(ray.get(refs)))
