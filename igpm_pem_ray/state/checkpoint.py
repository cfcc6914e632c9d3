"""Per-iteration checkpoints with lineage manifests (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

Reference analog: ad-hoc per-pid pickles reloaded on worker start
(/root/reference/patternmatching/gray/parallel/gray_mp_rl.py:29-35,79-81
and rwr.py:34-54).  Here: each iteration K of an iterative kernel writes

    <dir>/iter=0000K/part-*.parquet     (vid, value) vector state, chunked
    <dir>/iter=0000K/manifest.json      written LAST = commit marker

The manifest carries the iteration number, the convergence metric, a
params fingerprint (so a resume with different kernel parameters
refuses the stale state), and per-partition lineage/metrics (rows,
value checksum, wall time).  A crash mid-write leaves no manifest ->
the partial directory is ignored and the iteration re-runs
idempotently.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ROWS_PER_FILE = 1_000_000  # never one giant file; partitioned output layout


def params_fingerprint(params: dict) -> str:
    return hashlib.sha256(json.dumps(params, sort_keys=True).encode()).hexdigest()[:16]


def _iter_dir(base: str, iteration: int) -> str:
    return os.path.join(base, f"iter={iteration:05d}")


def save_vector(base_dir: str, iteration: int, vids: np.ndarray, values: np.ndarray,
                *, metric_name: str, metric_value: float, params: dict,
                value_col: str = "value") -> str:
    """Write (vid, value) state for one iteration, manifest-committed."""
    d = _iter_dir(base_dir, iteration)
    os.makedirs(d, exist_ok=True)
    partitions = []
    n = len(vids)
    nfiles = max(1, (n + _ROWS_PER_FILE - 1) // _ROWS_PER_FILE)
    for f in range(nfiles):
        lo, hi = f * _ROWS_PER_FILE, min(n, (f + 1) * _ROWS_PER_FILE)
        t0 = time.perf_counter()
        tbl = pa.table({"vid": vids[lo:hi], value_col: values[lo:hi]})
        path = os.path.join(d, f"part-{f:05d}.parquet")
        pq.write_table(tbl, path)
        partitions.append({
            "file": os.path.basename(path),
            "rows": hi - lo,
            "vid_range": [int(vids[lo]), int(vids[hi - 1])] if hi > lo else None,
            "checksum": hashlib.sha256(values[lo:hi].tobytes()).hexdigest()[:16],
            "write_sec": round(time.perf_counter() - t0, 6),
        })
    manifest = {
        "iteration": iteration,
        "metric": {metric_name: float(metric_value)},
        "params_fingerprint": params_fingerprint(params),
        "params": params,
        "num_rows": n,
        "value_col": value_col,
        "partitions": partitions,   # per-partition lineage + metrics
        "completed": True,
    }
    tmp = os.path.join(d, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(d, "manifest.json"))  # atomic commit
    return d


def save_state_ds(base_dir: str, iteration: int, state_ds, *,
                  metric_name: str, metric_value: float, params: dict,
                  extra: dict | None = None) -> str:
    """Dataset-native checkpoint for the shuffle-resident kernels: the
    whole point of those kernels is that no process holds a V-array, so
    the state TABLE streams straight to partitioned parquet (one file
    per block — resumable, never one giant file) and only per-file
    lineage (rows, bytes) lands in the manifest.

    ``extra``: small JSON-serializable kernel metadata stored verbatim
    in the manifest (e.g. hyperball's accumulated N(d) series) — NOT
    part of the params fingerprint, so it can evolve per iteration."""
    import shutil

    d = _iter_dir(base_dir, iteration)
    shutil.rmtree(d, ignore_errors=True)  # write_parquet APPENDS otherwise
    os.makedirs(d, exist_ok=True)
    t0 = time.perf_counter()
    state_ds.write_parquet(d)
    partitions = []
    n = 0
    for f in sorted(os.listdir(d)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(d, f)).metadata
        partitions.append({"file": f, "rows": md.num_rows,
                           "bytes": os.path.getsize(os.path.join(d, f))})
        n += md.num_rows
    manifest = {
        "iteration": iteration,
        "metric": {metric_name: float(metric_value)},
        "params_fingerprint": params_fingerprint(params),
        "params": params,
        "num_rows": n,
        "state_kind": "dataset",
        "write_sec": round(time.perf_counter() - t0, 6),
        "partitions": partitions,   # per-partition lineage + metrics
        "extra": extra or {},
        "completed": True,
    }
    tmp = os.path.join(d, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(d, "manifest.json"))  # atomic commit
    return d


def save_table(base_dir: str, iteration: int, table: pa.Table, *,
               metric_name: str, metric_value: float, params: dict) -> str:
    """Arbitrary-schema pa.Table state (e.g. the incremental matcher's
    seen-set), same manifest-commit protocol as ``save_vector``."""
    d = _iter_dir(base_dir, iteration)
    os.makedirs(d, exist_ok=True)
    partitions = []
    n = table.num_rows
    nfiles = max(1, (n + _ROWS_PER_FILE - 1) // _ROWS_PER_FILE)
    t0 = time.perf_counter()
    for f in range(nfiles):
        lo, hi = f * _ROWS_PER_FILE, min(n, (f + 1) * _ROWS_PER_FILE)
        path = os.path.join(d, f"part-{f:05d}.parquet")
        pq.write_table(table.slice(lo, hi - lo), path)
        partitions.append({"file": os.path.basename(path), "rows": hi - lo,
                           "bytes": os.path.getsize(path)})
    manifest = {
        "iteration": iteration,
        "metric": {metric_name: float(metric_value)},
        "params_fingerprint": params_fingerprint(params),
        "params": params,
        "num_rows": n,
        "state_kind": "table",
        "write_sec": round(time.perf_counter() - t0, 6),
        "partitions": partitions,
        "completed": True,
    }
    tmp = os.path.join(d, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(d, "manifest.json"))  # atomic commit
    return d


def latest_table(base_dir: str, params: dict):
    """Most recent committed ``save_table`` checkpoint matching
    ``params``; returns (iteration, pa.Table, manifest) or None."""
    if not base_dir or not os.path.isdir(base_dir):
        return None
    fp = params_fingerprint(params)
    iters = sorted(
        (int(name.split("=")[1]) for name in os.listdir(base_dir)
         if name.startswith("iter=")),
        reverse=True,
    )
    for k in iters:
        d = _iter_dir(base_dir, k)
        mpath = os.path.join(d, "manifest.json")
        if not os.path.exists(mpath):
            continue
        with open(mpath) as fh:
            m = json.load(fh)
        if not m.get("completed") or m.get("params_fingerprint") != fp \
                or m.get("state_kind") != "table":
            continue
        parts = sorted(p["file"] for p in m["partitions"])
        tbl = pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in parts])
        return k, tbl, m
    return None


def latest_state_ds(base_dir: str, params: dict):
    """Most recent committed Dataset checkpoint matching ``params``;
    returns (iteration, Dataset, manifest) or None.  The state is
    READ lazily — resuming never materializes it on the driver."""
    import ray.data as rd

    if not base_dir or not os.path.isdir(base_dir):
        return None
    fp = params_fingerprint(params)
    iters = sorted(
        (int(name.split("=")[1]) for name in os.listdir(base_dir)
         if name.startswith("iter=")),
        reverse=True,
    )
    for k in iters:
        d = _iter_dir(base_dir, k)
        mpath = os.path.join(d, "manifest.json")
        if not os.path.exists(mpath):
            continue  # uncommitted partial write — ignore
        with open(mpath) as fh:
            m = json.load(fh)
        if not m.get("completed") or m.get("params_fingerprint") != fp \
                or m.get("state_kind") != "dataset":
            continue
        files = [os.path.join(d, p["file"]) for p in m["partitions"]]
        return k, rd.read_parquet(files), m
    return None


def latest_checkpoint(base_dir: str, params: dict):
    """Most recent committed iteration matching ``params``; None if absent.

    Returns (iteration, vids, values, manifest).
    """
    if not base_dir or not os.path.isdir(base_dir):
        return None
    fp = params_fingerprint(params)
    iters = sorted(
        (int(name.split("=")[1]) for name in os.listdir(base_dir)
         if name.startswith("iter=")),
        reverse=True,
    )
    for k in iters:
        d = _iter_dir(base_dir, k)
        mpath = os.path.join(d, "manifest.json")
        if not os.path.exists(mpath):
            continue  # uncommitted partial write — ignore
        with open(mpath) as fh:
            m = json.load(fh)
        if not m.get("completed") or m.get("params_fingerprint") != fp:
            continue
        parts = sorted(p["file"] for p in m["partitions"])
        tbl = pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in parts])
        vids = tbl["vid"].to_numpy(zero_copy_only=False)
        values = tbl[m["value_col"]].to_numpy(zero_copy_only=False)
        return k, vids, values, m
    return None
