"""WARC 1.0 source/sink for Common-Crawl-style page archives.

The north-rule input is "Common-Crawl-style Parquet pages"; real
Common-Crawl deliveries START as WARC files, so a complete engine
needs the WARC -> pages hop.  This module implements the subset of
ISO 28500 that crawl response records use — `WARC/1.0` header block
(CRLF-separated `Name: value` lines), empty line, payload of exactly
`Content-Length` bytes, record terminated by CRLF CRLF — with

- ``write_warc(ds, out_dir)``: stream a pages Dataset
  (url, warc_ts, html) into `.warc` shard files, one per input
  block (`map_batches` sink, same shard-resume layout as
  ``write_jsonl``), records stamped `WARC-Type: response`.
- ``read_warc(paths)``: `read_binary_files` -> one stateless
  `map_batches` that splits each shard into records and parses
  headers — no Python-per-byte work (record boundaries come from
  Content-Length arithmetic, not scanning), payload slices stay
  zero-copy buffer views until Arrow copies them into the column.

Parsing is strict about the subset it writes and tolerant about
extras: unknown headers are ignored, non-`response` records are
skipped (real WARCs interleave `warcinfo`/`request`/`metadata`).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

_CRLF = b"\r\n"


def _fmt_ts(us: int) -> str:
    """Microseconds since epoch -> WARC-Date (ISO 8601 UTC with the
    fractional seconds WARC 1.1 permits, so the timestamp column
    round-trips exactly)."""
    import datetime as _dt

    t = _dt.datetime.fromtimestamp(us / 1e6, tz=_dt.timezone.utc)
    return t.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def _parse_ts(s: str) -> int:
    import datetime as _dt

    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    t = _dt.datetime.strptime(s, fmt).replace(tzinfo=_dt.timezone.utc)
    return round(t.timestamp() * 1e6)


def record_bytes(url: str, ts_us: int, payload: bytes) -> bytes:
    """One WARC response record (headers + payload + terminator)."""
    head = (b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
            + b"WARC-Date: " + _fmt_ts(ts_us).encode("ascii") + _CRLF
            + b"Content-Length: " + str(len(payload)).encode("ascii")
            + _CRLF + _CRLF)
    return head + payload + _CRLF + _CRLF


def write_warc(ds, out_dir: str) -> int:
    """Pages Dataset (url, warc_ts, html) -> `.warc` shards under
    ``out_dir``; returns the row count.  One file per block, named by
    (content hash, block ordinal) so re-runs are idempotent and
    intra-run duplicate blocks cannot collide (the write_jsonl
    convention)."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table, ordinal: int) -> int:
        urls = batch["url"].to_pylist()
        ts = batch["warc_ts"].cast(pa.int64()).to_pylist()
        htmls = batch["html"].to_pylist()
        blob = b"".join(record_bytes(u, t, h or b"")
                        for u, t, h in zip(urls, ts, htmls))
        h = hashlib.blake2b(blob, digest_size=10)
        h.update(str(ordinal).encode())
        path = os.path.join(out_dir, f"part-{h.hexdigest()}.warc")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
        return batch.num_rows

    n = 0
    for i, ref in enumerate(ds.to_arrow_refs()):
        import ray as _ray

        n += write_block(_ray.get(ref), i)
    return n


def _parse_shard(data: bytes):
    """Split one WARC shard into (url, ts_us, payload) tuples.
    Record boundaries come from Content-Length arithmetic — O(records)
    find() calls, no byte scanning of payloads."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        head = data[pos:hdr_end].decode("utf-8", "replace")
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", "0"))
        payload = data[hdr_end + 4:hdr_end + 4 + clen]
        if fields.get("warc-type") == "response":
            out.append((fields.get("warc-target-uri", ""),
                        _parse_ts(fields.get(
                            "warc-date", "1970-01-01T00:00:00.000000Z")),
                        payload))
        pos = hdr_end + 4 + clen + 4  # payload + CRLF CRLF
    return out


def read_warc(paths) -> "rd.Dataset":
    """`.warc` file(s)/dir -> Dataset (url, warc_ts:timestamp[us],
    html:binary).  Shards parse independently inside map_batches —
    the standard parallel-ingest shape (one task per file via
    read_binary_files)."""
    raw = rd.read_binary_files(paths)

    def parse(b: pa.Table) -> pa.Table:
        urls, ts, html = [], [], []
        for blob in b["bytes"].to_pylist():
            for u, t, p in _parse_shard(blob):
                urls.append(u)
                ts.append(t)
                html.append(p)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(html, pa.binary())})

    return raw.map_batches(parse, batch_format="pyarrow",
                           zero_copy_batch=True)
