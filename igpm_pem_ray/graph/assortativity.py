"""Degree assortativity: Pearson correlation of endpoint degrees over
the (symmetrized) undirected edge list — "do hubs link to hubs?", a
standard whole-graph statistic for web link graphs (Newman 2002,
"Assortative mixing in networks", Phys. Rev. Lett. 89 — public).

Same integer-exact convention as the rest of the repo: the kernel
returns exact int64 sufficient statistics (m, sx, sxx, sxy) computed
with a degree groupby + two hash joins + per-block moment partials,
and the coefficient is a single deterministic float64 expression over
those four scalars — so the cross-engine hash check never sees a
float reduction.

Scale notes: degrees are ONE groupby over the exploded endpoints
(O(V) result); the two joins hash-partition on src / dst so nothing
is broadcast; per-block partials mean the final "sum" aggregate
ships 4 ints per block.  sxx/sxy can overflow int64 only past
~10^18 (edge count x max-degree^2) — assert-guarded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Count


def degree_moments(edges_ds, *, num_partitions: int | None = None) -> dict[str, int]:
    """Canonical undirected edges (src<dst, distinct) -> exact integer
    moments over the symmetrized endpoint-degree pairs:
    m = 2|E|, sx = sum(dx+dy), sxx = sum(dx^2+dy^2), sxy = sum(2*dx*dy).

    num_partitions sizes the two hash joins; default follows the
    repo-wide convention (linkpred.py): cpus//2 capped at 16, so the
    chained shuffle never over-allocates aggregators on small
    sessions."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(16, cpus // 2))

    def both(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": np.concatenate([s, d])})

    # deg feeds BOTH join branches: materialize it (O(V) rows, narrow)
    # so the plan is two independent joins, not a diamond that makes
    # the streaming executor re-run the groupby shuffle inside each
    # branch of one DAG (observed to wedge Ray 2.49's hash-shuffle
    # aggregators on small sessions).
    deg = edges_ds.map_batches(both, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby("vid").aggregate(Count(alias_name="degree")) \
        .materialize()
    degx = deg.rename_columns({"vid": "vx", "degree": "dx"})
    degy = deg.rename_columns({"vid": "vy", "degree": "dy"})
    j = edges_ds.join(degx, join_type="inner", num_partitions=num_partitions,
                      on=("src",), right_on=("vx",))
    j = j.join(degy, join_type="inner", num_partitions=num_partitions,
               on=("dst",), right_on=("vy",))

    def part(b: pa.Table) -> pa.Table:
        x = b["dx"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["dy"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "m": np.array([2 * len(x)], dtype=np.int64),
            "sx": np.array([int((x + y).sum())], dtype=np.int64),
            "sxx": np.array([int((x * x).sum() + (y * y).sum())],
                            dtype=np.int64),
            "sxy": np.array([int(2 * (x * y).sum())], dtype=np.int64),
        })

    parts = j.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    agg = parts.sum(["m", "sx", "sxx", "sxy"])
    return {k: int(agg[f"sum({k})"]) for k in ("m", "sx", "sxx", "sxy")}


def coefficient(mom: dict[str, int]) -> float:
    """r from the integer moments — ONE fixed-order float64 expression
    (mirrored verbatim in the SQL oracle)."""
    m, sx, sxx, sxy = (float(mom[k]) for k in ("m", "sx", "sxx", "sxy"))
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    return num / den if den != 0.0 else 0.0


def assortativity(edges_ds, *, num_partitions: int | None = None):
    mom = degree_moments(edges_ds, num_partitions=num_partitions)
    return mom, coefficient(mom)
