"""k-core decomposition — core number per vertex of the simple
undirected graph.

No direct reference analog (the closest is the reference's
degree-threshold "star" invariant, gray_incremental.py:194,202 — a
single-k, single-round version); cores are the standard link-graph
robustness/spam-farm signal, so the engine carries them as a
first-class kernel.

Three strategies, mirroring the triangle kernel's split:
- "dense" (default while the simple edge set fits one process): the
  O(E) Batagelj-Zaversnik bucket peel on a driver CSR built from a
  per-block canon+unique combiner pass — exact core numbers in one
  sweep.
- "peel" (the unbounded-V shape for ONE k): iterative Dataset rounds —
  drop all vertices with current degree < k, recompute degrees (one
  groupby per round), repeat until stable (``kcore_membership``).
- "hindex" (the unbounded-V shape for the FULL decomposition):
  ``core_numbers_hindex`` — the Lu et al. 2016 h-index fixpoint,
  per-vertex state a (vid, h) Dataset, every round pure
  joins/aggregates, exact same core numbers as the dense peel.

Correctness: tests/test_kernels.py pins the dense kernel to an
independent set-based peeling oracle and pins strategy parity
(dense core>=k membership == peel output; dense core == hindex core)
on random graphs.
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


def core_numbers_hindex(edges_ds, *, num_partitions: int | None = None,
                        max_rounds: int = 10_000,
                        checkpoint_dir: str | None = None,
                        checkpoint_every: int = 5,
                        resume: bool = False,
                        stats: dict | None = None):
    """Dataset-resident FULL k-core decomposition via the h-index
    fixpoint (Lu, Zhou, Zhang, Stanley, Nature Physics 2016 "The
    H-index of a network node"): h_0(v) = deg(v), h_{t+1}(v) = H-index
    of the neighbors' h_t, which converges monotonically DOWN to the
    exact core number of every vertex at once — the published
    unbounded-V alternative to the driver-CSR Batagelj-Zaversnik peel
    (``core_numbers``), completing the two-path story for the full
    decomposition (``kcore_membership`` answers only a fixed k).

    The per-vertex H-index is computed with PURE Dataset ops (no
    driver arrays, no map_groups) via the rank identity

        H(v) = max over desc-sorted neighbor values of min(h_i, i)

    — i.e. ONE edges-state join, ONE (vid, hval desc) sort with
    O(blocks) boundary rank offsets (stages/ranked.topk_per_group,
    the same plan as the windowed row_number operator), and ONE
    Max groupby: 3 all-to-all exchanges per round.  Rank ties among
    equal hval don't affect the max, so the sort needs no secondary
    key.  (The equivalent distinct-value identity H = max over c of
    min(c, N>=(c)) gives a join/aggregate-only form, but costs 6
    exchanges per round and a distinct-value self-join whose fan-out
    is sum_v distinct_h(v)^2 — measured 1.3x slower end-to-end even
    after the clamp below.)

    Termination is exact and O(1) on the driver: sum_v h(v) is a
    monotone non-increasing integer series, so "sum unchanged" IS the
    fixpoint (the hyperball_shuffle register-sum trick).  Checkpoints
    stream the (vid, h) state via ``save_state_ds`` every
    ``checkpoint_every`` rounds; synchronous rounds depend only on the
    previous state, so resume reproduces the uncheckpointed run
    exactly."""
    from ray.data.aggregate import Max

    from igpm_pem_ray.stages.ranked import topk_per_group
    from igpm_pem_ray.state import checkpoint as ckpt

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(8, cpus // 4))

    edges = edges_ds.select_columns(["src", "dst"]).map_batches(
        _canon_unique, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["src", "dst"]).aggregate(Sum("src", alias_name="_s")) \
        .map_batches(lambda b: pa.table({"src": b["src"], "dst": b["dst"]}),
                     batch_format="pyarrow")

    def sym(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.concatenate([s, d]),
                         "dst": np.concatenate([d, s])})

    sym_edges = edges.map_batches(sym, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(b["src"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"vid": u, "c": c.astype(np.int64)})

    state = sym_edges.map_batches(deg_partial, batch_format="pyarrow",
                                  zero_copy_batch=True) \
        .groupby("vid").aggregate(Sum("c", alias_name="h")).materialize()

    # h_0 = min(deg, B) with B = the H-index of the DEGREE SEQUENCE
    # (>= max core number, computable from the O(distinct-degrees)
    # histogram).  Any pointwise bound c <= h_0 <= deg converges to
    # the same fixpoint: the H-operator T is monotone, T(h_0) <= h_0
    # (H <= #neighbors and H <= max neighbor value <= B), so the
    # trajectory is still monotone decreasing and sandwiched between
    # core and T^k(deg).  The clamp is what kills the round-1 hub
    # blowup: the distinct-value self-join fan-out per vertex drops
    # from deg(hub)^2 to min(deg, B)^2 (measured 122 s -> see
    # BASELINE.md at sf0.1/3 rounds).
    hist = state.groupby("h").count().to_pandas()
    degs = hist["h"].to_numpy()
    cnts = hist["count()"].to_numpy()
    order = np.argsort(-degs)
    cum = np.cumsum(cnts[order])
    bound = int(np.maximum(0, np.minimum(degs[order], cum)).max(initial=0))

    def clamp(b: pa.Table) -> pa.Table:
        return pa.table({"vid": b["vid"],
                         "h": np.minimum(
                             b["h"].to_numpy(zero_copy_only=False),
                             bound)})

    state = state.map_batches(clamp, batch_format="pyarrow").materialize()

    if state.count() == 0:
        if stats is not None:
            stats.update({"rounds": 0, "h_sum": 0})
        return rd.from_arrow(pa.table({
            "vid": pa.array([], type=pa.int64()),
            "core": pa.array([], type=pa.int64())}))

    params = {"kernel": "kcore_hindex", "V": state.count()}
    start_round = 0
    if resume and checkpoint_dir:
        found = ckpt.latest_state_ds(checkpoint_dir, params)
        if found is not None:
            start_round, state2, _m = found
            state = state2.materialize()

    h_sum = int(state.sum("h"))
    rounds = start_round
    for k in range(start_round, max_rounds):
        msgs = sym_edges.join(state, join_type="inner",
                              num_partitions=num_partitions,
                              on=("src",), right_on=("vid",)) \
            .map_batches(lambda b: pa.table({"vid": b["dst"],
                                             "hval": b["h"]}),
                         batch_format="pyarrow")
        ranked = topk_per_group(msgs, key="vid", order=["hval"],
                                descending=[True], k=None)
        hnew = ranked.map_batches(lambda b: pa.table({
                "vid": b["vid"],
                "k": np.minimum(b["hval"].to_numpy(zero_copy_only=False),
                                b["rank"].to_numpy(zero_copy_only=False))}),
                                  batch_format="pyarrow") \
            .groupby("vid").aggregate(Max("k", alias_name="h")) \
            .materialize()
        rounds += 1
        s_new = int(hnew.sum("h"))
        state = hnew
        if checkpoint_dir and rounds % checkpoint_every == 0:
            ckpt.save_state_ds(checkpoint_dir, rounds, state,
                               metric_name="h_sum", metric_value=s_new,
                               params=params)
        if s_new == h_sum:
            break
        h_sum = s_new
    if stats is not None:
        stats.update({"rounds": rounds, "h_sum": h_sum})
    return state.map_batches(
        lambda b: pa.table({"vid": b["vid"], "core": b["h"]}),
        batch_format="pyarrow")
