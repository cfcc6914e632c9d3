"""Deterministic vertex-id assignment (url -> int64) and dense indexing.

The reference keeps integer node ids from its JSON inputs
(/root/reference/patternmatching/gray/query_call.py:91-99); at web scale
ids must be derived from the url itself so extraction tasks can emit
(src, dst) pairs without any coordination.  We use the first 8 bytes of
blake2b(url) masked to 63 bits — stable across processes/machines
(unlike Python's ``hash``), collision-checked in tests.

63-bit SIGNED ids on purpose: values above int64-max degrade to
pickled-object Arrow extension columns on pandas round-trips inside
shuffle operators (observed with Ray 2.49 groupby), and DuckDB/Polars
oracles prefer int64.  The collision-probability loss of one bit is
irrelevant (2^63 key space).

Dense indexing (vid -> 0..V-1) is needed by the iterative kernels to
use numpy vectors for per-vertex state.  At sandbox scale the sorted
vid array is broadcast (``ray.put``) and mapped via ``np.searchsorted``;
at 10^12-page scale the same mapping becomes a hash join of the edge
table against the vertices table on vid (Dataset.join) — callers only
touch the mapping through this module, keeping that swap local.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK63 = (1 << 63) - 1


def url_to_vid(url: str) -> int:
    """Stable 63-bit non-negative id for one url."""
    raw = int.from_bytes(hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "big")
    return raw & _MASK63


def urls_to_vids(urls) -> np.ndarray:
    """Batch url hashing (int64).

    blake2b is not an Arrow kernel, so this is a Python loop over the
    batch — but it runs inside map_batches workers (parallel across
    blocks) and each digest is C code; amortized against HTML parsing
    in the extraction stage.
    """
    out = np.empty(len(urls), dtype=np.int64)
    b2b = hashlib.blake2b
    for i, u in enumerate(urls):
        out[i] = int.from_bytes(b2b(u.encode("utf-8"), digest_size=8).digest(), "big") & _MASK63
    return out


def to_dense(sorted_vids: np.ndarray, vids: np.ndarray) -> np.ndarray:
    """Map raw vids -> dense indices via binary search against the sorted
    unique id array (broadcast once per job, not per batch)."""
    return np.searchsorted(sorted_vids, vids)
