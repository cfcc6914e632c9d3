"""Distributed deterministic synthetic edge table (scaling workload).

Generates n_edges (src, dst) rows as a Ray Dataset without any
driver-side materialization: ``ray.data.range`` -> per-block vectorized
hash mixing (splitmix64, a public-domain mixer), so generation itself
scales with the cluster.  Degree skew: dst is drawn with a power-law-ish
transform (u^k concentrates mass on low ids -> hub vertices), matching
the BA-graph skew of the pages fixture at sizes where rendering HTML
would dominate the benchmark.

Pure function of (n_edges, n_vertices, seed): identical at any
parallelism level — required for the two-cluster-size scaling
comparison (BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_MASK64 = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK64)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK64)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK64)
    return z ^ (z >> np.uint64(31))


def synth_edges(n_edges: int, n_vertices: int, *, seed: int = 42,
                skew: float = 2.0, target_blocks: int | None = None):
    """Dataset of (src:int64, dst:int64); dst skewed toward low ids."""
    if target_blocks is None:
        import ray

        target_blocks = max(8, 2 * int(ray.cluster_resources().get("CPU", 8)))

    def gen(batch) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h1 = _splitmix64(i * np.uint64(2) + np.uint64(seed))
        h2 = _splitmix64(i * np.uint64(2) + np.uint64(1) + np.uint64(seed))
        src = (h1 % np.uint64(n_vertices)).astype(np.int64)
        u = (h2 >> np.uint64(11)).astype(np.float64) / float(1 << 53)  # [0,1)
        dst = np.minimum((u ** skew * n_vertices).astype(np.int64), n_vertices - 1)
        return pa.table({"src": src, "dst": dst})

    return rd.range(n_edges, override_num_blocks=target_blocks) \
             .map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)
