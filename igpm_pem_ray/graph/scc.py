"""Strongly connected components — the directed companion of WCC
(kernel K2 family).  The reference only ever computes WEAK components
(/root/reference/patternmatching/gray/rwr.py:26,56-61); on a web link
graph the directed structure (giant SCC + IN/OUT tendrils, the
Broder et al. 2000 "bow-tie") needs SCC proper.

Algorithm: trim + forward-coloring + backward-reach ("coloring" SCC,
Orzan 2004 / Slota-Rajamanickam-Madduri 2014 — public), expressed on
the repo's dense message-passing substrate (`graph/dense.py`), i.e.
every sweep is one `msg_pass` = per-partition gather+reduceat tasks
over pinned Arrow blocks + a driver merge:

1. **Trim**: iteratively assign vertices with zero in- or out-degree
   within the active set (their SCC is trivially themselves).  On
   web-shaped graphs this peels the IN/OUT tendrils, which is most of
   the non-giant-SCC mass.
2. **Forward min-coloring**: color[v] = min active vid that reaches v,
   propagated along out-edges to fixpoint (reduce=min sweeps).
   Inactive vertices carry +inf so they transmit no-ops — removing an
   SCC never changes the remaining SCCs (a cycle through a removed
   vertex would put it in the same SCC, contradiction).
3. **Backward reach, all colors in parallel**: roots are v with
   color[v]==v; u joins if some out-neighbor w is reached with
   color[w]==color[u].  Because forward coloring guarantees
   color[w] <= color[u] along u->w, a reduce=max over
   (reached ? color : -1) equals color[u] IFF such a neighbor exists
   — one sweep per BFS level, no per-color loop.
4. Assign reached vertices scc=color (the MIN raw vid in the SCC —
   same deterministic label convention as WCC), deactivate, re-trim,
   repeat while any vertex is active.

Scale notes: driver state is O(V) int64/bool arrays (the dense-kernel
family envelope, V < 2^31 asserted at build); every sweep is a full
O(E) distributed pass with no shuffle (partition-local reduceat +
disjoint-slice merge).  Outer rounds = number of SCC "levels" peeled;
worst case O(V) on a path-of-cycles, typically a handful on web
graphs after trimming.  `strongly_connected_components_shuffle` is
the Dataset-resident analog for V beyond driver arrays (same
two-strategy story as K1-K3 in `shuffle_kernels.py`): state is a
(vid, scc, color, reached) Dataset, every sweep is one edges|X|state
join + a groupby + a join back, the driver sees O(1) scalars, and the
scc table streams to parquet checkpoints at outer-round boundaries.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, msg_pass

_INF = np.iinfo(np.int64).max


def _trim(g: DenseGraph, active: np.ndarray, scc: np.ndarray,
          idx: np.ndarray) -> int:
    """Peel zero in-/out-degree (within active) vertices; own-vid SCC.
    Returns the number of vertices trimmed."""
    n = 0
    while True:
        a64 = active.astype(np.int64)
        # active in-neighbor count lands at dst; out-count at src.
        indeg = msg_pass(g, a64, reduce="sum", init=0, directions="out")
        outdeg = msg_pass(g, a64, reduce="sum", init=0, directions="in")
        trim = active & ((indeg == 0) | (outdeg == 0))
        if not trim.any():
            return n
        scc[trim] = idx[trim]
        active[trim] = False
        n += int(trim.sum())


def strongly_connected_components_dense(g: DenseGraph, *,
                                        stats: dict | None = None
                                        ) -> np.ndarray:
    """Dense per-vertex SCC labels (root = min dense index in the SCC;
    vids are sorted at build, so min index == min raw vid)."""
    V = g.num_vertices
    idx = np.arange(V, dtype=np.int64)
    scc = np.full(V, -1, dtype=np.int64)
    active = np.ones(V, dtype=bool)
    t0 = time.perf_counter()
    sweeps = 0
    rounds = 0
    trimmed = _trim(g, active, scc, idx)
    while active.any():
        rounds += 1
        # 1. forward min-coloring to fixpoint
        color = np.where(active, idx, _INF)
        while True:
            sweeps += 1
            msgs = msg_pass(g, color, reduce="min", init=_INF,
                            directions="out")
            new = np.where(active, np.minimum(color, msgs), color)
            if np.array_equal(new, color):
                break
            color = new
        # 2. backward reach from roots, all colors at once
        reached = active & (color == idx)
        while True:
            sweeps += 1
            vals = np.where(reached, color, np.int64(-1))
            msgs = msg_pass(g, vals, reduce="max", init=np.int64(-1),
                            directions="in")
            newly = active & ~reached & (msgs == color)
            if not newly.any():
                break
            reached |= newly
        # 3. assign + peel
        scc[reached] = color[reached]
        active[reached] = False
        trimmed += _trim(g, active, scc, idx)
    if stats is not None:
        stats.update({"rounds": rounds, "sweeps": sweeps,
                      "trimmed": trimmed, "num_vertices": V,
                      "num_edges": g.num_edges,
                      "wall_sec": time.perf_counter() - t0})
    return scc


def strongly_connected_components(edges_ds, *,
                                  stats: dict | None = None) -> pa.Table:
    """Directed edges (src,dst raw vids) -> (vid, scc) with scc = min
    raw vid in the strongly connected component (exact-match
    testable, same convention as `connected_components`)."""
    g = build_dense_graph(edges_ds)
    labels = strongly_connected_components_dense(g, stats=stats)
    return pa.table({"vid": g.vids, "scc": g.vids[labels]})


# ---------- Dataset-resident variant (the 10^12-V path) ----------

def _np(t: pa.Table, c: str) -> np.ndarray:
    return t[c].to_numpy(zero_copy_only=False)


def strongly_connected_components_shuffle(
        edges_ds, *, max_rounds: int = 10_000,
        num_partitions: int | None = None,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        stats: dict | None = None):
    """Same trim + coloring + backward-reach algorithm with ALL
    per-vertex state in Ray Datasets — nothing V-bounded on any single
    process (the 10^12-V strategy, same two-path story as the K1-K3
    shuffle kernels).  Every sweep is one edges|X|values join on one
    endpoint, a groupby-aggregate merging messages at the other
    endpoint, and a join back into the state table; the driver only
    ever sees O(1) scalars (changed/active counts).

    All label columns stay pure int64 end-to-end (a float64 round-trip
    would lose precision on 63-bit hashed vids — same rule as
    ``connected_components_shuffle``).  ``scc = -1`` marks an
    unassigned (active) vertex.  Checkpoints stream the (vid, scc)
    table to partitioned parquet at outer-round boundaries
    (``save_state_ds``); a resumed run re-enters the outer loop with
    already-peeled SCCs frozen — sound because removing a whole SCC
    never changes the remaining SCCs.

    Returns a Dataset (vid, scc), scc = min raw vid in the component
    (identical convention to the dense variant; parity-tested).
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from igpm_pem_ray.graph.shuffle_kernels import _vertices_ds
    from igpm_pem_ray.state import checkpoint as ckpt

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(8, cpus // 4))
    t0 = time.perf_counter()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_blocks = max(num_partitions, cpus // 2)
    edges = edges_ds.select_columns(["src", "dst"]) \
        .repartition(n_blocks).materialize()

    state = _vertices_ds(edges, num_partitions).map_batches(
        lambda b: pa.table({"vid": b["vid"],
                            "scc": np.full(b.num_rows, -1, np.int64)}),
        batch_format="pyarrow").repartition(n_blocks).materialize()
    V = state.count()
    params = {"kernel": "scc_shuffle", "V": V}
    start_round = 0
    if resume and checkpoint_dir:
        found = ckpt.latest_state_ds(checkpoint_dir, params)
        if found is not None:
            start_round, state_ds2, _m = found
            state = state_ds2.materialize()

    NEG1 = pa.scalar(-1, pa.int64())

    def active_count(st) -> int:
        if V == 0:
            return 0
        return int(st.map_batches(
            lambda b: pa.table({"a": (_np(b, "scc") < 0).astype(np.int64)}),
            batch_format="pyarrow").sum("a"))

    def msg_join(values, on: str, to: str, agg, alias: str):
        """(vid, v) values joined onto edges at endpoint `on`, message
        lands at endpoint `to`, merged by `agg` — one directed pass."""
        return edges.join(values, join_type="inner",
                          num_partitions=num_partitions,
                          on=(on,), right_on=("vid",)) \
            .map_batches(lambda b, t=to: pa.table({"vid": b[t], "v": b["v"]}),
                         batch_format="pyarrow") \
            .groupby("vid").aggregate(agg("v", alias_name=alias))

    def trim(st, n_active: int):
        """Peel zero active-in/out-degree vertices (own-vid SCC) to
        fixpoint; returns (state, n_trimmed, n_active_after)."""
        total = 0
        while n_active > 0:
            # materialized: feeds TWO hash-shuffle joins (diamond)
            flags = st.map_batches(
                lambda b: pa.table({
                    "vid": b["vid"],
                    "v": (_np(b, "scc") < 0).astype(np.int64)}),
                batch_format="pyarrow").materialize()
            indeg = msg_join(flags, "src", "dst", Sum, "ind")
            outdeg = msg_join(flags, "dst", "src", Sum, "outd")
            st = st.join(indeg, join_type="left_outer",
                         num_partitions=num_partitions, on=("vid",)) \
                .join(outdeg, join_type="left_outer",
                      num_partitions=num_partitions, on=("vid",)) \
                .map_batches(lambda b: pa.table({
                    "vid": b["vid"],
                    "scc": np.where(
                        (_np(b, "scc") < 0)
                        & ((pc.coalesce(b["ind"], NEG1).to_numpy(
                            zero_copy_only=False) <= 0)
                           | (pc.coalesce(b["outd"], NEG1).to_numpy(
                               zero_copy_only=False) <= 0)),
                        _np(b, "vid"), _np(b, "scc")),
                }), batch_format="pyarrow").materialize()
            now = active_count(st)
            if now == n_active:
                break
            total += n_active - now
            n_active = now
        return st, total, n_active

    sweeps = 0
    rounds = start_round
    n_active = active_count(state)
    state, trimmed, n_active = trim(state, n_active)
    while n_active > 0 and rounds < max_rounds:
        rounds += 1
        # 1. forward min-coloring to fixpoint along out-edges; inactive
        # vertices carry +inf and never update (act rides along)
        color = state.map_batches(
            lambda b: pa.table({
                "vid": b["vid"],
                "color": np.where(_np(b, "scc") < 0, _np(b, "vid"), _INF),
                "act": (_np(b, "scc") < 0),
            }), batch_format="pyarrow").materialize()
        while True:
            sweeps += 1
            vals = color.map_batches(
                lambda b: pa.table({"vid": b["vid"], "v": b["color"]}),
                batch_format="pyarrow")
            msgs = msg_join(vals, "src", "dst", Min, "m")
            stepped = color.join(msgs, join_type="left_outer",
                                 num_partitions=num_partitions,
                                 on=("vid",)).map_batches(
                lambda b: pa.table({
                    "vid": b["vid"],
                    "color_old": b["color"],
                    "color": np.where(
                        _np(b, "act"),
                        np.minimum(
                            _np(b, "color"),
                            pc.coalesce(b["m"], pa.scalar(
                                int(_INF), pa.int64())).to_numpy(
                                    zero_copy_only=False)),
                        _np(b, "color")),
                    "act": b["act"],
                }), batch_format="pyarrow").materialize()
            changed = int(stepped.map_batches(
                lambda b: pa.table({"c": (
                    _np(b, "color") != _np(b, "color_old")).astype(np.int64)}),
                batch_format="pyarrow").sum("c"))
            color = stepped.select_columns(["vid", "color", "act"])
            if changed == 0:
                break
        # 2. backward reach from roots (color == vid), all colors in
        # parallel: u joins iff max over out-neighbors w of
        # (reached[w] ? color[w] : -1) equals color[u]
        work = state.join(color, join_type="inner",
                          num_partitions=num_partitions,
                          on=("vid",)).map_batches(
            lambda b: pa.table({
                "vid": b["vid"],
                "scc": b["scc"],
                "color": b["color"],
                "reached": (_np(b, "act")
                            & (_np(b, "color") == _np(b, "vid"))),
            }), batch_format="pyarrow").materialize()
        while True:
            sweeps += 1
            vals = work.map_batches(
                lambda b: pa.table({
                    "vid": b["vid"],
                    "v": np.where(_np(b, "reached"), _np(b, "color"),
                                  np.int64(-1))}),
                batch_format="pyarrow")
            msgs = msg_join(vals, "dst", "src", Max, "m")
            stepped = work.join(msgs, join_type="left_outer",
                                num_partitions=num_partitions,
                                on=("vid",)).map_batches(
                lambda b: pa.table({
                    "vid": b["vid"], "scc": b["scc"], "color": b["color"],
                    "reached": (_np(b, "reached")
                                | ((_np(b, "scc") < 0)
                                   & (pc.coalesce(b["m"], NEG1).to_numpy(
                                       zero_copy_only=False)
                                      == _np(b, "color")))),
                    "newly": ((~_np(b, "reached"))
                              & (_np(b, "scc") < 0)
                              & (pc.coalesce(b["m"], NEG1).to_numpy(
                                  zero_copy_only=False)
                                 == _np(b, "color"))).astype(np.int64),
                }), batch_format="pyarrow").materialize()
            newly = int(stepped.sum("newly"))
            work = stepped.select_columns(["vid", "scc", "color", "reached"])
            if newly == 0:
                break
        # 3. assign + peel + re-trim
        state = work.map_batches(
            lambda b: pa.table({
                "vid": b["vid"],
                "scc": np.where(_np(b, "reached"), _np(b, "color"),
                                _np(b, "scc"))}),
            batch_format="pyarrow").materialize()
        n_active = active_count(state)
        state, k, n_active = trim(state, n_active)
        trimmed += k
        if checkpoint_dir:
            ckpt.save_state_ds(checkpoint_dir, rounds, state,
                               metric_name="active",
                               metric_value=float(n_active), params=params)
    if stats is not None:
        stats.update({"rounds": rounds, "sweeps": sweeps,
                      "trimmed": trimmed, "num_vertices": V,
                      "strategy": "shuffle",
                      "wall_sec": time.perf_counter() - t0})
    return state
