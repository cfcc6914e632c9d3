"""k-core decomposition — core number per vertex of the simple
undirected graph.

No direct reference analog (the closest is the reference's
degree-threshold "star" invariant, gray_incremental.py:194,202 — a
single-k, single-round version); cores are the standard link-graph
robustness/spam-farm signal, so the engine carries them as a
first-class kernel.

Two strategies, mirroring the triangle kernel's split:
- "dense" (default while the simple edge set fits one process): the
  O(E) Batagelj-Zaversnik bucket peel on a driver CSR built from a
  per-block canon+unique combiner pass — exact core numbers in one
  sweep.
- "peel" (the unbounded-V shape): iterative Dataset rounds — drop all
  vertices with current degree < k, recompute degrees (one groupby per
  round), repeat until stable, then raise k; emits the k-core
  membership per level.  O(max_core x diameter-ish) rounds of
  degree-groupby shuffles; every per-vertex structure stays a Dataset.
  Used for the `max_k` membership question rather than full
  decomposition (asking for every vertex's core number that way would
  pay the full peel per k).

Correctness: tests/test_kernels.py pins the dense kernel to an
independent set-based peeling oracle and pins strategy parity
(dense core>=k membership == peel output) on random graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum


def _canon_unique(batch: pa.Table) -> pa.Table:
    s = batch["src"].to_numpy(zero_copy_only=False)
    d = batch["dst"].to_numpy(zero_copy_only=False)
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    keep = lo != hi
    arr = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    return pa.table({"src": arr[:, 0], "dst": arr[:, 1]})


def core_numbers(edges_ds, *, stats: dict | None = None):
    """edges Dataset (src,dst raw vids, multigraph OK) -> Dataset
    (vid, core): the largest k such that vid belongs to the k-core.

    Batagelj-Zaversnik linear peel: vertices processed in increasing
    current-degree order via a bucket queue; removing a vertex
    decrements its unprocessed neighbors and moves them one bucket
    down.  Exact, O(E); driver V/E-bounded like the dense kernel
    family (`graph/dense.py`) — beyond that envelope use
    ``kcore_membership`` (Dataset-resident)."""
    pdf = edges_ds.select_columns(["src", "dst"]).map_batches(
        _canon_unique, batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas()
    if not len(pdf):
        return rd.from_arrow(pa.table({
            "vid": pa.array([], type=pa.int64()),
            "core": pa.array([], type=pa.int64())}))
    pairs = np.unique(pdf[["src", "dst"]].to_numpy(), axis=0)
    vids = np.unique(pairs)
    V = len(vids)
    s = np.searchsorted(vids, pairs[:, 0])
    d = np.searchsorted(vids, pairs[:, 1])
    # symmetric CSR
    heads = np.concatenate([s, d])
    tails = np.concatenate([d, s])
    order = np.argsort(heads, kind="stable")
    heads, tails = heads[order], tails[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.add.at(indptr, heads + 1, 1)
    indptr = np.cumsum(indptr)
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64)

    # vectorized cascade peel: for k = 0..max, repeatedly remove every
    # vertex whose current degree <= k (whole waves at once), assign
    # core = k, and decrement neighbor degrees via one CSR ragged
    # gather + bincount per wave.  Each vertex is removed exactly once
    # and its adjacency scanned exactly once -> O(E) total numpy work,
    # no per-edge Python.
    core = np.zeros(V, dtype=np.int64)
    layer = np.zeros(V, dtype=np.int64)
    layer_no = 0
    alive = np.ones(V, dtype=bool)
    deg_cur = deg.copy()
    md = int(deg.max(initial=0))
    for k in range(md + 1):
        while True:
            sel = alive & (deg_cur <= k)
            removed = np.flatnonzero(sel)
            if len(removed) == 0:
                break
            layer_no += 1
            core[removed] = k
            layer[removed] = layer_no
            alive[removed] = False
            lens = indptr[removed + 1] - indptr[removed]
            total = int(lens.sum())
            if total:
                seg_starts = np.cumsum(lens) - lens
                seg = np.arange(total, dtype=np.int64) \
                    - np.repeat(seg_starts, lens)
                nbrs = tails[np.repeat(indptr[removed], lens) + seg]
                deg_cur -= np.bincount(nbrs, minlength=V)
        if not alive.any():
            break
    if stats is not None:
        stats.update({"num_vertices": V, "num_simple_edges": len(pairs),
                      "max_core": int(core.max(initial=0)),
                      "n_layers": layer_no})
    # layer = the global peel-wave number (onion decomposition,
    # Hebert-Dufresne et al. 2016): rides along for free — each wave
    # of the cascade IS one onion layer
    return rd.from_arrow(pa.table({"vid": vids.astype(np.int64),
                                   "core": core.astype(np.int64),
                                   "layer": layer.astype(np.int64)}))


def kcore_membership(edges_ds, k: int, *, num_partitions: int | None = None,
                     max_rounds: int = 10_000, stats: dict | None = None):
    """Dataset-resident k-core membership (the unbounded-V strategy):
    iteratively delete vertices whose simple degree < k until a fixed
    point.  Each round is ONE degree groupby + ONE semi-join-style
    filter against the surviving vertex set (broadcast while small,
    join otherwise kept simple here via join); the driver sees only
    O(1) scalars.  Returns the Dataset of surviving (vid,) rows."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(8, cpus // 4))

    edges = edges_ds.select_columns(["src", "dst"]).map_batches(
        _canon_unique, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["src", "dst"]).aggregate(Sum("src", alias_name="_s")) \
        .map_batches(lambda b: pa.table({"src": b["src"], "dst": b["dst"]}),
                     batch_format="pyarrow").materialize()
    rounds = 0
    n_prev = None
    for _ in range(max_rounds):
        def deg_partial(b: pa.Table) -> pa.Table:
            both = np.concatenate([
                b["src"].to_numpy(zero_copy_only=False),
                b["dst"].to_numpy(zero_copy_only=False)])
            u, c = np.unique(both, return_counts=True)
            return pa.table({"vid": u, "c": c.astype(np.int64)})

        keep = edges.map_batches(deg_partial, batch_format="pyarrow",
                                 zero_copy_batch=True) \
            .groupby("vid").aggregate(Sum("c", alias_name="deg")) \
            .filter(expr=f"deg >= {int(k)}") \
            .map_batches(lambda b: pa.table({"vid": b["vid"]}),
                         batch_format="pyarrow").materialize()
        n = keep.count()
        rounds += 1
        if n == n_prev or n == 0:
            break
        n_prev = n
        ka = keep.map_batches(lambda b: pa.table({"ka": b["vid"]}),
                              batch_format="pyarrow")
        kb = keep.map_batches(lambda b: pa.table({"kb": b["vid"]}),
                              batch_format="pyarrow")
        edges = edges.join(ka, join_type="inner",
                           num_partitions=num_partitions,
                           on=("src",), right_on=("ka",)) \
                     .join(kb, join_type="inner",
                           num_partitions=num_partitions,
                           on=("dst",), right_on=("kb",)) \
                     .materialize()
    if stats is not None:
        stats.update({"rounds": rounds, "k": k,
                      "survivors": 0 if n_prev is None else n})
    return keep
