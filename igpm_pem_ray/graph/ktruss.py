"""k-truss decomposition — the edge analog of k-core.

An edge belongs to the k-truss iff it participates in >= k-2
triangles inside the k-truss subgraph; ``truss(e)`` is the largest k
for which e survives.  Computed by support peeling: enumerate
triangles on the degeneracy-oriented graph, drop edges below the
support threshold, repeat to fixpoint, then raise k (Cohen 2008).

Two paths, mirroring `graph/kcore`:

- ``truss_numbers``: like `kcore.core_numbers`, the full decomposition
  peels on driver numpy arrays over the distributed-built simple edge
  table (the cascade is a tight data-dependent loop; V+E driver arrays
  are the same envelope the dense kernels already assume).  All
  per-round work is vectorized: the wedge expansion is the
  repeat/offset trick (no per-vertex Python), triangle closure is a
  searchsorted against the packed oriented edge set, and support is
  one bincount over edge ids.
- ``ktruss_membership``: like `kcore.kcore_membership`, fixed-k
  membership stays Dataset-resident end to end (joins + groupby
  shuffles per round, O(1) driver scalars) — the unbounded-E strategy.

No reference analog (SURVEY.md section 2); k-truss is the standard
cohesive-subgraph operator for community cores at web scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _collect_simple_edges(edges_ds) -> np.ndarray:
    """Distinct canonical (a < b) pairs as an (E, 2) int64 array
    (distributed canon + distinct; self-loops dropped)."""
    from ray.data.aggregate import Count

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"src": np.minimum(s, d), "dst": np.maximum(s, d)})

    pdf = edges_ds.map_batches(canon, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"]).to_pandas()
    if len(pdf) == 0:  # empty groupby output is COLUMN-less
        return np.empty((0, 2), dtype=np.int64)
    return np.stack([pdf["src"].to_numpy().astype(np.int64),
                     pdf["dst"].to_numpy().astype(np.int64)], axis=1)


def _edge_supports(a: np.ndarray, b: np.ndarray, vids: np.ndarray):
    """Per-edge triangle support of the simple graph given by
    canonical dense pairs (a < b are dense indices).  Returns int64[E].
    Degeneracy-style orientation by (degree, vid) rank bounds the
    wedge expansion."""
    E = len(a)
    V = len(vids)
    deg = np.bincount(a, minlength=V) + np.bincount(b, minlength=V)
    rank = np.empty(V, dtype=np.int64)
    rank[np.lexsort((np.arange(V), deg))] = np.arange(V)
    # orient each edge low-rank -> high-rank
    flip = rank[a] > rank[b]
    u = np.where(flip, b, a)
    w = np.where(flip, a, b)
    # oriented CSR sorted by (u, rank(w)) — neighbor lists rank-sorted
    order = np.lexsort((rank[w], u))
    u_s, w_s = u[order], w[order]
    # edge id per oriented position = original edge index
    eid_s = np.arange(E)[order]
    indptr = np.searchsorted(u_s, np.arange(V + 1))
    # wedge expansion: position p (edge u->v) pairs v with every LATER
    # neighbor of u (higher rank) — repeat/offset trick, no Python loop
    end_of_u = indptr[u_s + 1]
    rem = end_of_u - np.arange(E) - 1
    total = int(rem.sum())
    support = np.zeros(E, dtype=np.int64)
    if total == 0:
        return support
    first = np.repeat(np.arange(E), rem)
    offs = np.arange(total) - np.repeat(np.cumsum(rem) - rem, rem)
    second = first + 1 + offs
    v_w = w_s[first]   # lower-rank wedge tip
    w_w = w_s[second]  # higher-rank wedge tip
    # close the wedge: is (v_w, w_w) an oriented edge?
    packed = (rank[u_s].astype(np.int64) << 31) | rank[w_s]
    pk_sorted = np.sort(packed)
    pk_order = np.argsort(packed, kind="stable")
    key = (rank[v_w].astype(np.int64) << 31) | rank[w_w]
    pos = np.searchsorted(pk_sorted, key)
    pos = np.minimum(pos, len(pk_sorted) - 1)
    hit = pk_sorted[pos] == key
    # support increments for the three edges of each found triangle
    e_uv = eid_s[first[hit]]
    e_uw = eid_s[second[hit]]
    e_vw = eid_s[pk_order[pos[hit]]]
    np.add.at(support, e_uv, 1)
    np.add.at(support, e_uw, 1)
    np.add.at(support, e_vw, 1)
    return support


def truss_numbers(edges_ds) -> pa.Table:
    """(src, dst, truss): the largest k such that the edge survives
    k-truss peeling (truss >= 2 for every edge; triangle-free edges
    get exactly 2)."""
    pairs = _collect_simple_edges(edges_ds)
    if len(pairs) == 0:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "truss": pa.array([], pa.int64())})
    vids = np.unique(pairs)
    a = np.searchsorted(vids, pairs[:, 0])
    b = np.searchsorted(vids, pairs[:, 1])
    E = len(a)
    truss = np.full(E, 2, dtype=np.int64)
    alive = np.arange(E)
    k = 3
    while len(alive):
        # peel at level k to fixpoint (edges dropped at ANY round of
        # this level keep their previous truss value k-1; survivors
        # are only labeled AFTER the fixpoint — a mid-level label
        # would stick to edges dropped in a later round)
        while True:
            sup = _edge_supports(a[alive], b[alive], vids)
            drop = sup < k - 2
            if not drop.any():
                break
            alive = alive[~drop]
            if len(alive) == 0:
                break
        if len(alive):
            truss[alive] = k
            k += 1
    return pa.table({"src": vids[a].astype(np.int64),
                     "dst": vids[b].astype(np.int64),
                     "truss": truss})



def _truss_support(edges, np_r: int):
    """ONE support round of the Dataset-resident peel: per-edge
    triangle support of the surviving canonical simple graph.
    Returns the (ea, eb, sup) Dataset, or None when the graph closes
    no triangle at all.  Plan (shared by ``ktruss_membership`` and
    ``truss_decompose_shuffle``): degree groupby -> two degree joins
    to (deg, vid)-orient each edge -> wedge self-join on the low-rank
    endpoint -> closure join -> per-edge support groupby."""
    from ray.data.aggregate import Count, Sum

    def deg_partial(b: pa.Table) -> pa.Table:
        both = np.concatenate([
            b["src"].to_numpy(zero_copy_only=False),
            b["dst"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"dv": u, "c": c.astype(np.int64)})

    deg = edges.map_batches(deg_partial, batch_format="pyarrow",
                            zero_copy_batch=True)         .groupby("dv").aggregate(Sum("c", alias_name="deg"))

    withdeg = edges.join(deg, join_type="inner",
                         num_partitions=np_r,
                         on=("src",), right_on=("dv",)) \
        .rename_columns({"deg": "deg_s"}) \
        .join(deg, join_type="inner",
              num_partitions=np_r,
              on=("dst",), right_on=("dv",)) \
        .rename_columns({"deg": "deg_d"})

    def orient(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        ds_ = b["deg_s"].to_numpy(zero_copy_only=False)
        dd = b["deg_d"].to_numpy(zero_copy_only=False)
        src_first = (ds_ < dd) | ((ds_ == dd) & (s < d))
        u = np.where(src_first, s, d)
        w = np.where(src_first, d, s)
        return pa.table({"u": u, "w": w})

    oriented = withdeg.map_batches(orient, batch_format="pyarrow") \
                      .materialize()
    left = oriented.rename_columns({"u": "ju", "w": "v"})
    right = oriented.rename_columns({"u": "ju2", "w": "w"})
    wedges = left.join(right, join_type="inner",
                       num_partitions=np_r,
                       on=("ju",), right_on=("ju2",))

    def half(b: pa.Table) -> pa.Table:
        # both tip orders (v, w) and (w, v) are kept: the closure
        # edge is stored in orientation order only, so exactly ONE
        # of the two candidate orders can match — each triangle is
        # closed once, at its lowest-rank vertex
        u = b["ju"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        keep = v != w
        return pa.table({"tu": u[keep], "tv": v[keep], "tw": w[keep]})

    cand = wedges.map_batches(half, batch_format="pyarrow") \
                 .materialize()
    if cand.count() == 0:
        return None
    closed = cand.join(oriented, join_type="inner",
                       num_partitions=np_r,
                       on=("tv", "tw"), right_on=("u", "w"))

    def tri_edges(b: pa.Table) -> pa.Table:
        u = b["tu"].to_numpy(zero_copy_only=False)
        v = b["tv"].to_numpy(zero_copy_only=False)
        w = b["tw"].to_numpy(zero_copy_only=False)
        a = np.concatenate([np.minimum(u, v), np.minimum(u, w),
                            np.minimum(v, w)])
        bb = np.concatenate([np.maximum(u, v), np.maximum(u, w),
                             np.maximum(v, w)])
        return pa.table({"ea": a, "eb": bb})

    return closed.map_batches(tri_edges, batch_format="pyarrow") \
        .groupby(["ea", "eb"]).aggregate(Count(alias_name="sup")) \
        .materialize()


def ktruss_membership(edges_ds, k: int, *, num_partitions: int | None = None,
                      max_rounds: int = 10_000, stats: dict | None = None):
    """Dataset-resident k-truss membership (the unbounded-V strategy,
    mirroring `kcore.kcore_membership`): iteratively drop edges whose
    triangle support in the surviving subgraph is < k-2 until a fixed
    point.  Returns the Dataset of surviving canonical (src, dst) rows
    — exactly the edges `truss_numbers` labels with truss >= k.

    Each round is the per-edge form of the triangle-count join plan
    (`triangles.triangle_count` strategy="join"): a degree groupby,
    two degree joins to (deg, vid)-orient every edge (bounds wedge
    fan-out on power-law graphs), one wedge self-join on the shared
    low-rank endpoint, one closure join on the (v, w) pair, a support
    groupby over the three edges of each closed triangle, and one
    left-outer filter join back onto the edge table.  The driver only
    ever sees O(1) scalars (edge count per round); vids stay raw
    63-bit ints throughout (no dense index, nothing V-bounded).
    """
    import ray

    from ray.data.aggregate import Count, Sum

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(8, cpus // 4))

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"src": np.minimum(s, d), "dst": np.maximum(s, d)})

    edges = edges_ds.select_columns(["src", "dst"]).map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda b: pa.table({"src": b["src"], "dst": b["dst"]}),
                     batch_format="pyarrow").materialize()
    n_prev = edges.count()
    rounds = 0
    thresh = int(k) - 2
    for _ in range(max_rounds):
        rounds += 1
        if n_prev == 0:
            break
        # ray 2.49 hash joins break on a partition whose LEFT side got
        # zero blocks (schema-less table inside Acero, same quirk as
        # graph/walks.py): collapse to one partition once the
        # surviving edge set is small enough that a partition can be
        # left empty
        np_r = 1 if n_prev < 64 * num_partitions else num_partitions
        support = _truss_support(edges, np_r)

        if support is None or support.count() == 0:
            if thresh > 0:
                edges = edges.limit(0).materialize()
                n = 0
            else:
                n = n_prev
        else:
            surv = edges.join(support, join_type="left_outer",
                              num_partitions=np_r,
                              on=("src", "dst"), right_on=("ea", "eb"))

            def keep_fn(b: pa.Table) -> pa.Table:
                sup = b["sup"].to_numpy(zero_copy_only=False)
                sup = np.nan_to_num(sup.astype(np.float64),
                                    nan=0.0).astype(np.int64)
                keep = sup >= thresh
                return pa.table({
                    "src": b["src"].to_numpy(zero_copy_only=False)[keep],
                    "dst": b["dst"].to_numpy(zero_copy_only=False)[keep]})

            edges = surv.map_batches(keep_fn, batch_format="pyarrow") \
                        .materialize()
            n = edges.count()
        if n == n_prev:
            break
        n_prev = n
    if stats is not None:
        stats.update({"rounds": rounds, "k": int(k),
                      "survivors": int(n_prev)})
    if n_prev == 0:
        # an emptied-out pipeline loses its schema (column-less
        # blocks); hand back an explicit empty (src, dst) table
        import ray.data as rd

        return rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                       "dst": pa.array([], pa.int64())}))
    return edges


def truss_decompose_shuffle(edges_ds, *, num_partitions: int | None = None,
                            max_rounds: int = 10_000,
                            checkpoint_dir: str | None = None,
                            resume: bool = False,
                            stats: dict | None = None):
    """FULL k-truss decomposition with the edge table Dataset-resident
    end to end (round-4 verdict "What's missing" #1: the unbounded-E
    sibling of ``truss_numbers``, which peels driver numpy arrays).

    Same recurrence as ``truss_numbers`` (parity-tested at every k):
    peel level k to its fixpoint with ``_truss_support`` rounds —
    an edge dropped at ANY round of level k has truss k-1 and is
    appended to the labeled output at peel time (the kcore_hindex
    pattern); survivors are never labeled early.  The driver only
    sees O(1) scalars (per-round survivor counts).

    Checkpoints stream ONE combined table per finished level k —
    labeled rows plus the still-alive edges marked truss = -1 — via
    ``save_state_ds``; ``resume=True`` restarts at the next level
    (levels are sequential, so the resumed trajectory is exact)."""
    import ray
    import ray.data as rd
    import time as _time

    from ray.data.aggregate import Count

    from igpm_pem_ray.state import checkpoint as ckpt

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(8, cpus // 4))
    t0 = _time.perf_counter()

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"src": np.minimum(s, d), "dst": np.maximum(s, d)})

    edges = edges_ds.select_columns(["src", "dst"]).map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda b: pa.table({"src": b["src"],
                                         "dst": b["dst"]}),
                     batch_format="pyarrow").materialize()
    labeled = None          # accumulating (src, dst, truss) Dataset
    n_alive = edges.count()
    params = {"kernel": "truss_shuffle", "E": n_alive}
    k = 3
    if resume and checkpoint_dir:
        found = ckpt.latest_state_ds(checkpoint_dir, params)
        if found is not None:
            done_k, combined, _m = found
            combined = combined.materialize()
            labeled = combined.filter(expr="truss >= 0") \
                .select_columns(["src", "dst", "truss"]).materialize()
            edges = combined.filter(expr="truss < 0") \
                .select_columns(["src", "dst"]).materialize()
            n_alive = edges.count()
            k = done_k + 1
            if labeled.count() == 0:
                labeled = None

    rounds = 0
    while n_alive > 0 and rounds < max_rounds:
        thresh = k - 2
        level_done = False
        # peel level k to fixpoint; drops are labeled k-1 at peel time
        while n_alive > 0 and rounds < max_rounds:
            rounds += 1
            np_r = 1 if n_alive < 64 * num_partitions else num_partitions
            support = _truss_support(edges, np_r)
            if support is None or support.count() == 0:
                # no triangles left: every edge's support is 0 < thresh
                dropped = edges.map_batches(
                    lambda b, _t=k - 1: pa.table({
                        "src": b["src"], "dst": b["dst"],
                        "truss": np.full(len(b), _t, np.int64)}),
                    batch_format="pyarrow").materialize()
                labeled = dropped if labeled is None else \
                    labeled.union(dropped).repartition(
                        num_partitions).materialize()
                edges = rd.from_arrow(pa.table({
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64())}))
                n_alive = 0
                level_done = True
                break
            surv = edges.join(support, join_type="left_outer",
                              num_partitions=np_r,
                              on=("src", "dst"),
                              right_on=("ea", "eb")).materialize()

            def split(b: pa.Table, _keep: bool, _t: int) -> pa.Table:
                sup = b["sup"].to_numpy(zero_copy_only=False)
                sup = np.nan_to_num(sup.astype(np.float64),
                                    nan=0.0).astype(np.int64)
                m = (sup >= thresh) if _keep else (sup < thresh)
                out = {"src": b["src"].to_numpy(
                    zero_copy_only=False)[m],
                    "dst": b["dst"].to_numpy(zero_copy_only=False)[m]}
                if not _keep:
                    out["truss"] = np.full(int(m.sum()), _t, np.int64)
                return pa.table(out)

            dropped = surv.map_batches(
                lambda b, _t=k - 1: split(b, False, _t),
                batch_format="pyarrow").materialize()
            n_drop = dropped.count()
            if n_drop == 0:
                level_done = True
                break       # level-k fixpoint reached with survivors
            labeled = dropped if labeled is None else \
                labeled.union(dropped).repartition(
                    num_partitions).materialize()
            edges = surv.map_batches(
                lambda b: split(b, True, 0),
                batch_format="pyarrow").materialize()
            n_alive = edges.count()
        if not level_done:
            break           # round budget exhausted MID-level: no
            # checkpoint (a level-k stamp implies its fixpoint)
        if checkpoint_dir:
            alive_marked = edges.map_batches(
                lambda b: pa.table({
                    "src": b["src"], "dst": b["dst"],
                    "truss": np.full(len(b), -1, np.int64)}),
                batch_format="pyarrow")
            combined = alive_marked if labeled is None else \
                labeled.union(alive_marked)
            ckpt.save_state_ds(checkpoint_dir, k, combined,
                               metric_name="alive",
                               metric_value=n_alive, params=params)
        k += 1
    if stats is not None:
        stats.update({"rounds": rounds, "k_max": k - 1,
                      "wall_sec": _time.perf_counter() - t0,
                      "strategy": "shuffle"})
    if labeled is None:
        return rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                       "dst": pa.array([], pa.int64()),
                                       "truss": pa.array([], pa.int64())}))
    return labeled
