"""Exact triangle count (kernel K4) via degree orientation + wedge join.

Reference semantics: ``sum(nx.triangles(nx.Graph(g)).values()) / 3`` on
the SIMPLE undirected graph — parallel edges and self loops dropped
first (/root/reference/patternmatching/gray/incremental/
gray_incremental.py:193,201).  Exact integer equality is the test
criterion.

Plan (SURVEY.md J6/K4):
1. canonicalize + dedup edges to simple undirected (min,max) pairs
   (groupby shuffle on the pair);
2. degree-orient each edge from the (degree, vid)-smaller endpoint to
   the larger — every triangle becomes exactly ONE directed wedge
   u->v->w with a closing oriented edge u->w, and per-vertex wedge
   work is O(sqrt(E)) even on power-law graphs (the standard hub-skew
   mitigation for triangle counting);
3. wedge join: oriented ⋈ oriented on (left.dst = right.src) —
   Dataset.join hash shuffle;
4. close: semi-join candidates (u,w) against oriented edges on
   (src,dst) and count.

Degrees are computed distributed and broadcast (V-bounded array) for
the orientation step.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from igpm_pem_ray.graph.build import dedup_edges
from igpm_pem_ray.graph.dense import build_dense_graph


def _orient(batch: pa.Table, deg_ref) -> pa.Table:
    deg = ray.get(deg_ref)
    s = batch["src"].to_numpy(zero_copy_only=False)
    d = batch["dst"].to_numpy(zero_copy_only=False)
    # rank = (degree, vid) lexicographic, packed into one int64 key
    ks = (deg[s].astype(np.int64) << 31) | s
    kd = (deg[d].astype(np.int64) << 31) | d
    lo_first = ks < kd
    a = np.where(lo_first, s, d)
    b = np.where(lo_first, d, s)
    return pa.table({"src": a.astype(np.int64), "dst": b.astype(np.int64)})


BROADCAST_MAX_EDGES = 50_000_000  # above this the CSR no longer broadcasts


@ray.remote
def _wedge_count_span(u, v, indptr, indices, packed_edges) -> int:
    """Count closed wedges for one span of oriented edges against the
    broadcast oriented CSR + sorted packed edge array.  Fully
    vectorized: segment-gather of successors(v), pack (u,w) into one
    int64, membership via searchsorted."""
    if len(u) == 0:
        return 0
    lens = indptr[v + 1] - indptr[v]
    total = int(lens.sum())
    if total == 0:
        return 0
    # vectorized ragged gather: positions of each successor of each v
    seg_starts = np.cumsum(lens) - lens
    seg = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, lens)
    w = indices[np.repeat(indptr[v], lens) + seg]
    u_rep = np.repeat(u, lens)
    packed = (u_rep.astype(np.int64) << 31) | w
    pos = np.searchsorted(packed_edges, packed)
    pos = np.minimum(pos, len(packed_edges) - 1)
    return int((packed_edges[pos] == packed).sum())


def triangle_count(edges_ds, *, num_partitions: int | None = None,
                   strategy: str = "auto",
                   stats: dict | None = None) -> int:
    """edges Dataset (src,dst raw vids, multigraph OK) -> global triangle count.

    strategy="broadcast" (default while the simple oriented graph fits
    the object store, < BROADCAST_MAX_EDGES): broadcast the oriented
    CSR + sorted packed edge set once, then one map over edge blocks
    counts closed wedges — no shuffle joins.  strategy="join": the
    two-chained-hash-join plan (the 10^12-scale path where nothing
    broadcasts).  num_partitions (join path) defaults to half the
    cluster CPUs — each join spawns that many shuffle aggregators and
    two run concurrently."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(16, cpus // 2))
    t0 = time.perf_counter()
    if strategy == "auto":
        # upper bound on the simple edge count decides the plan before
        # anything moves (multigraph count >= simple count)
        strategy = "broadcast" if edges_ds.count() <= BROADCAST_MAX_EDGES \
            else "join"

    if strategy == "broadcast":
        # E fits one process (same envelope the CSR broadcast needs
        # anyway), so skip the distributed dedup/deg shuffles entirely:
        # one per-block canon+unique combiner pass, then driver numpy —
        # measured 3x faster than the groupby pipeline at sf0.1
        def canon_unique(batch: pa.Table) -> pa.Table:
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            lo = np.minimum(s, d)
            hi = np.maximum(s, d)
            keep = lo != hi
            arr = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
            return pa.table({"src": arr[:, 0], "dst": arr[:, 1]})

        pdf = edges_ds.select_columns(["src", "dst"]).map_batches(
            canon_unique, batch_format="pyarrow", zero_copy_batch=True) \
            .to_pandas()
        if not len(pdf):
            if stats is not None:
                stats.update({"wall_sec": time.perf_counter() - t0,
                              "triangles": 0})
            return 0
        pairs = np.unique(pdf[["src", "dst"]].to_numpy(), axis=0)
        vids = np.unique(pairs)
        V = len(vids)
        assert V < 2**31, "orientation packing assumes V < 2^31"
        s = np.searchsorted(vids, pairs[:, 0])
        d = np.searchsorted(vids, pairs[:, 1])
        deg = np.bincount(np.concatenate([s, d]), minlength=V)
        ks = (deg[s].astype(np.int64) << 31) | s
        kd = (deg[d].astype(np.int64) << 31) | d
        lo_first = ks < kd
        a = np.where(lo_first, s, d).astype(np.int64)
        b = np.where(lo_first, d, s).astype(np.int64)
        order = np.argsort(a, kind="stable")
        a_s, b_s = a[order], b[order]
        indptr = np.zeros(V + 2, dtype=np.int64)
        np.add.at(indptr, a_s + 1, 1)
        indptr = np.cumsum(indptr)
        packed = np.sort((a << 31) | b)
        ip_ref, ix_ref, pk_ref = ray.put(indptr), ray.put(b_s), ray.put(packed)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        spans = np.array_split(np.arange(len(a)), max(1, min(4 * cpus,
                                                             len(a) // 1024 + 1)))
        futs = [_wedge_count_span.remote(a[sp], b[sp], ip_ref, ix_ref, pk_ref)
                for sp in spans if len(sp)]
        n = sum(ray.get(futs))
        if stats is not None:
            stats.update({"wall_sec": time.perf_counter() - t0,
                          "triangles": int(n), "num_vertices": V,
                          "num_simple_edges": len(pairs),
                          "strategy": "broadcast"})
        return int(n)

    # join plan (the 10^12-scale path): distributed dedup + dense build
    # + orient + two chained hash joins — nothing driver-resident
    simple = dedup_edges(edges_ds, undirected=True, drop_self_loops=True)
    g = build_dense_graph(simple, sort=False)
    V = g.num_vertices
    if V == 0 or g.num_edges == 0:
        if stats is not None:
            stats.update({"wall_sec": time.perf_counter() - t0, "triangles": 0})
        return 0

    # undirected degree per vertex over canonical rows: count both endpoints
    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([batch["src"].to_numpy(zero_copy_only=False),
                               batch["dst"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"v": u, "c": c.astype(np.int64)})

    pdf = g.edges.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True) \
                 .groupby("v").aggregate(Sum("c", alias_name="c")).to_pandas()
    deg = np.zeros(V, dtype=np.int64)
    deg[pdf["v"].to_numpy()] = pdf["c"].to_numpy()
    deg_ref = ray.put(deg)

    oriented = g.edges.map_batches(lambda b: _orient(b, deg_ref),
                                   batch_format="pyarrow", zero_copy_batch=True) \
                      .materialize()

    left = oriented.rename_columns(["u", "v"])
    right = oriented.rename_columns(["v2", "w"])
    wedges = left.join(right, join_type="inner", num_partitions=num_partitions,
                       on=("v",), right_on=("v2",))
    # wedge u->v->w closes with an oriented edge (u,w).  Projection via
    # map_batches (select+rename can race with lazy schema resolution on
    # empty join outputs — observed ValueError on zero-wedge graphs).
    cand = wedges.map_batches(
        lambda b: pa.table({"src": b["u"], "dst": b["w"]}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    if cand.count() == 0:  # zero wedges -> empty schema would break the join
        if stats is not None:
            stats.update({"wall_sec": time.perf_counter() - t0, "triangles": 0})
        return 0
    closed = cand.join(oriented, join_type="inner", num_partitions=num_partitions,
                       on=("src", "dst"))
    n = closed.count()
    if stats is not None:
        stats.update({"wall_sec": time.perf_counter() - t0, "triangles": int(n),
                      "num_vertices": V, "num_simple_edges": g.num_edges})
    return int(n)


@ray.remote
def _wedge_match_span(u, v, indptr, indices, packed_edges):
    """Like _wedge_count_span but returns the matched (u, v, w)
    triangle triples for the span (per-vertex counting needs the
    vertices, not just the count)."""
    empty = (np.empty(0, np.int64),) * 3
    if len(u) == 0:
        return empty
    lens = indptr[v + 1] - indptr[v]
    total = int(lens.sum())
    if total == 0:
        return empty
    seg_starts = np.cumsum(lens) - lens
    seg = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, lens)
    w = indices[np.repeat(indptr[v], lens) + seg]
    u_rep = np.repeat(u, lens)
    v_rep = np.repeat(v, lens)
    packed = (u_rep.astype(np.int64) << 31) | w
    pos = np.searchsorted(packed_edges, packed)
    pos = np.minimum(pos, len(packed_edges) - 1)
    hit = packed_edges[pos] == packed
    return u_rep[hit], v_rep[hit], w[hit]


def per_vertex_triangles(edges_ds, *, num_partitions: int | None = None,
                         strategy: str = "auto"):
    """edges Dataset -> Dataset (vid, degree, n_triangles) over the
    simple undirected graph: every vertex of the edge set, its simple
    degree, and the number of triangles through it (the nx.triangles
    per-vertex map the reference sums at gray_incremental.py:193).

    Same two strategies as triangle_count; the join path keeps the
    wedge midpoint through the closing join and explodes each found
    triangle to its 3 vertices before ONE count shuffle."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(16, cpus // 2))
    if strategy == "auto":
        strategy = "broadcast" if edges_ds.count() <= BROADCAST_MAX_EDGES \
            else "join"

    if strategy == "broadcast":
        def canon_unique(batch: pa.Table) -> pa.Table:
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            lo = np.minimum(s, d)
            hi = np.maximum(s, d)
            keep = lo != hi
            arr = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
            return pa.table({"src": arr[:, 0], "dst": arr[:, 1]})

        pdf = edges_ds.select_columns(["src", "dst"]).map_batches(
            canon_unique, batch_format="pyarrow", zero_copy_batch=True) \
            .to_pandas()
        import ray.data as rd
        if not len(pdf):
            return rd.from_arrow(pa.table({
                "vid": pa.array([], type=pa.int64()),
                "degree": pa.array([], type=pa.int64()),
                "n_triangles": pa.array([], type=pa.int64())}))
        pairs = np.unique(pdf[["src", "dst"]].to_numpy(), axis=0)
        vids = np.unique(pairs)
        V = len(vids)
        assert V < 2**31, "orientation packing assumes V < 2^31"
        s = np.searchsorted(vids, pairs[:, 0])
        d = np.searchsorted(vids, pairs[:, 1])
        deg = np.bincount(np.concatenate([s, d]), minlength=V)
        ks = (deg[s].astype(np.int64) << 31) | s
        kd = (deg[d].astype(np.int64) << 31) | d
        lo_first = ks < kd
        a = np.where(lo_first, s, d).astype(np.int64)
        b = np.where(lo_first, d, s).astype(np.int64)
        order = np.argsort(a, kind="stable")
        a_s, b_s = a[order], b[order]
        indptr = np.zeros(V + 2, dtype=np.int64)
        np.add.at(indptr, a_s + 1, 1)
        indptr = np.cumsum(indptr)
        packed = np.sort((a << 31) | b)
        ip_ref, ix_ref, pk_ref = ray.put(indptr), ray.put(b_s), ray.put(packed)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        spans = np.array_split(np.arange(len(a)),
                               max(1, min(4 * cpus, len(a) // 1024 + 1)))
        futs = [_wedge_match_span.remote(a[sp], b[sp], ip_ref, ix_ref, pk_ref)
                for sp in spans if len(sp)]
        tcount = np.zeros(V, dtype=np.int64)
        for uu, vv, ww in ray.get(futs):
            for arr in (uu, vv, ww):
                np.add.at(tcount, arr, 1)
        return rd.from_arrow(pa.table({
            "vid": vids.astype(np.int64),
            "degree": deg.astype(np.int64),
            "n_triangles": tcount}))

    # join plan: wedge join keeping the midpoint, close, explode, count
    simple = dedup_edges(edges_ds, undirected=True, drop_self_loops=True)
    g = build_dense_graph(simple, sort=False)
    V = g.num_vertices
    import ray.data as rd
    empty = rd.from_arrow(pa.table({
        "vid": pa.array([], type=pa.int64()),
        "degree": pa.array([], type=pa.int64()),
        "n_triangles": pa.array([], type=pa.int64())}))
    if V == 0 or g.num_edges == 0:
        return empty

    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([batch["src"].to_numpy(zero_copy_only=False),
                               batch["dst"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"v": u, "c": c.astype(np.int64)})

    pdf = g.edges.map_batches(deg_partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
                 .groupby("v").aggregate(Sum("c", alias_name="c")).to_pandas()
    deg = np.zeros(V, dtype=np.int64)
    deg[pdf["v"].to_numpy()] = pdf["c"].to_numpy()
    deg_ref = ray.put(deg)

    oriented = g.edges.map_batches(lambda b: _orient(b, deg_ref),
                                   batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    left = oriented.rename_columns(["u", "v"])
    right = oriented.rename_columns(["v2", "w"])
    wedges = left.join(right, join_type="inner",
                       num_partitions=num_partitions,
                       on=("v",), right_on=("v2",))
    cand = wedges.map_batches(
        lambda b: pa.table({"src": b["u"], "mid": b["v"], "dst": b["w"]}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    vid_map_ref = ray.put(g.vids)
    if cand.count() == 0:
        tri_counts = None
    else:
        closed = cand.join(oriented, join_type="inner",
                           num_partitions=num_partitions,
                           on=("src", "dst"))

        def explode(b: pa.Table) -> pa.Table:
            tri = np.concatenate([
                b["src"].to_numpy(zero_copy_only=False),
                b["mid"].to_numpy(zero_copy_only=False),
                b["dst"].to_numpy(zero_copy_only=False)])
            u, c = np.unique(tri, return_counts=True)
            return pa.table({"v": u, "t": c.astype(np.int64)})

        tri_counts = closed.map_batches(explode, batch_format="pyarrow",
                                        zero_copy_batch=True) \
            .groupby("v").aggregate(Sum("t", alias_name="n_triangles"))

    # dense index -> raw vid, attach degree; left join for tri-less verts
    deg_ds = rd.from_arrow(pa.table({
        "v": np.arange(V, dtype=np.int64), "degree": deg}))
    if tri_counts is None:
        joined = deg_ds.map_batches(
            lambda b: b.append_column(
                "n_triangles", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow")
    else:
        joined = deg_ds.join(tri_counts, join_type="left_outer",
                             num_partitions=num_partitions, on=("v",))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vmap = ray.get(vid_map_ref)
        t = pc.fill_null(b["n_triangles"].cast(pa.int64()), 0)
        return pa.table({
            "vid": vmap[b["v"].to_numpy(zero_copy_only=False)],
            "degree": b["degree"].cast(pa.int64()),
            "n_triangles": t})

    return joined.map_batches(finish, batch_format="pyarrow")


def star_count(edges_ds, *, min_degree: int = 4,
               strategy: str = "auto") -> int:
    """Vertices with simple-graph degree >= min_degree — the reference's
    "star" ground-truth invariant (gray_incremental.py:194,202).

    Same two plans as triangle_count: per-block canon+unique combiner +
    driver bincount while E fits one process, else the distributed
    dedup + degree groupby."""
    if strategy == "auto":
        strategy = "broadcast" if edges_ds.count() <= BROADCAST_MAX_EDGES \
            else "join"
    if strategy == "broadcast":
        def canon_unique(batch: pa.Table) -> pa.Table:
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            lo = np.minimum(s, d)
            hi = np.maximum(s, d)
            keep = lo != hi
            arr = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
            return pa.table({"src": arr[:, 0], "dst": arr[:, 1]})

        pdf = edges_ds.select_columns(["src", "dst"]).map_batches(
            canon_unique, batch_format="pyarrow", zero_copy_batch=True) \
            .to_pandas()
        if not len(pdf):
            return 0
        pairs = np.unique(pdf[["src", "dst"]].to_numpy(), axis=0)
        vids, counts = np.unique(pairs.ravel(), return_counts=True)
        return int((counts >= min_degree).sum())

    simple = dedup_edges(edges_ds, undirected=True, drop_self_loops=True)

    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([batch["src"].to_numpy(zero_copy_only=False),
                               batch["dst"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"v": u, "c": c.astype(np.int64)})

    deg = simple.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True) \
                .groupby("v").aggregate(Sum("c", alias_name="deg"))
    return deg.filter(expr=f"deg >= {int(min_degree)}").count()
