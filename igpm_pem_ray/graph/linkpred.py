"""Common-neighbor link prediction: top-k NON-adjacent vertex pairs
ranked by shared-neighbor count.

Reference context: the reference ranks candidate vertices by RWR
proximity when growing matches (/root/reference/patternmatching/gray/
gray_multiple.py:421-441); this operator is the batch-analytics analog
over the whole graph — exact integer shared-neighbor counts (no
log-weighted Adamic-Adar: libm rounding isn't bit-stable across
engines) so a DuckDB oracle can pin it bit-for-bit, with a
deterministic (count desc, src, dst) order.  :func:`jaccard_topk`
adds the ratio-weighted variant with the same bit-stability: integer
numerator/denominator, one IEEE division for ranking.

Two strategies, same shape as triangles.py (K4):

- ``broadcast`` (default while the simple graph < BROADCAST_MAX_EDGES):
  symmetrized CSR broadcast once via ``ray.put``; span tasks enumerate
  wedges a-v-w (a<w) with the same vectorized ragged gather as the
  triangle counter, drop adjacent pairs via searchsorted on the packed
  canonical edge set, pre-aggregate with ``np.unique``, and HASH-
  PARTITION the (pair, count) partials into ``_REDUCE_BUCKETS``
  separate return objects (``num_returns``) so each candidate pair's
  partial counts land with exactly one reducer.  Bucket reducer TASKS
  sum counts and keep only their local top-k; the driver merges
  R x k rows — it never touches the O(sum deg^2) candidate set.
  (The earlier design reduced all candidates driver-side: ~11M rows
  at a 400k-edge graph, measured 141 s of driver wall on a slow-DRAM
  box vs ~4 s for the span phase — and O(candidates) driver memory
  is exactly the anti-pattern the 100-TB story forbids.)

- ``join``: the Dataset-native plan (symmetrize -> hash self-join on
  the middle vertex -> groupby count -> left_anti vs the edge set ->
  sort/limit) for graphs whose CSR does not fit one process.  Every
  stage is a streaming Dataset op; the only driver residue is the
  k-row result.

Hub caveat (inherent to every exact common-neighbor plan, both
strategies): work is sum(deg^2) over vertices — a 10^6-degree hub is
quadratic.  At web scale, cap or sample hub neighborhoods upstream
(see stages/partition.py salting notes); semantics here are exact, so
no cap is applied.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray

BROADCAST_MAX_EDGES = 50_000_000  # above this the CSR no longer broadcasts
_REDUCE_BUCKETS = 16              # pair-hash reducer fan-out (power of two)

_EMPTY = pa.table({"src": pa.array([], pa.int64()),
                   "dst": pa.array([], pa.int64()),
                   "n_common": pa.array([], pa.int64())})

_EMPTY_J = pa.table({"src": pa.array([], pa.int64()),
                     "dst": pa.array([], pa.int64()),
                     "n_common": pa.array([], pa.int64()),
                     "n_union": pa.array([], pa.int64())})

_EMPTY_RA = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64()),
                      "ra_e6": pa.array([], pa.int64())})

RA_SCALE = 1_000_000  # per-term integer weight: RA term = RA_SCALE // deg(z)


def _bucket_of(packed: np.ndarray) -> np.ndarray:
    """Multiplicative hash -> top log2(R) bits: pairs sharing a hub
    endpoint still spread across reducers (low-bit modulo would not)."""
    h = packed.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return (h >> np.uint64(64 - _REDUCE_BUCKETS.bit_length() + 1)).astype(np.int64)


@ray.remote
def _pair_count_span(a, v, indptr, indices, packed_edges, wvals=None):
    """Partial common-neighbor counts for one span of directed
    symmetric edges (a -> v): segment-gather N(v), emit pairs (a, w)
    with a < w, drop pairs already adjacent, np.unique-count within
    the span, then hash-partition into _REDUCE_BUCKETS (pairs, counts)
    return objects.  Each (pair, middle-vertex) wedge is produced
    exactly once globally: the mirror edge (w -> v) generates (w, a)
    which the a < w filter discards.

    With ``wvals`` (int64 per-vertex weight, indexed by the MIDDLE
    vertex), each wedge contributes wvals[v] instead of 1 — the
    resource-allocation span (sums stay exact int64)."""
    R = _REDUCE_BUCKETS
    e64 = np.empty(0, np.int64)
    empty = [(e64, e64)] * R
    if len(a) == 0:
        return empty
    lens = indptr[v + 1] - indptr[v]
    total = int(lens.sum())
    if total == 0:
        return empty
    seg_starts = np.cumsum(lens) - lens
    seg = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, lens)
    w = indices[np.repeat(indptr[v], lens) + seg]
    u = np.repeat(a, lens)
    keep = u < w
    u, w = u[keep], w[keep]
    wt = np.repeat(wvals[v], lens)[keep] if wvals is not None else None
    if not len(u):
        return empty
    packed = (u << 31) | w
    if len(packed_edges):
        pos = np.minimum(np.searchsorted(packed_edges, packed),
                         len(packed_edges) - 1)
        non_adj = packed_edges[pos] != packed
        packed = packed[non_adj]
        if wt is not None:
            wt = wt[non_adj]
    if wt is None:
        pairs, counts = np.unique(packed, return_counts=True)
        counts = counts.astype(np.int64)
    else:
        o = np.argsort(packed, kind="stable")
        pk_s, wt_s = packed[o], wt[o]
        bnd = np.flatnonzero(np.r_[True, pk_s[1:] != pk_s[:-1]])
        pairs = pk_s[bnd]
        counts = np.add.reduceat(wt_s, bnd).astype(np.int64) \
            if len(bnd) else np.empty(0, np.int64)
    b = _bucket_of(pairs)
    order = np.argsort(b, kind="stable")
    pairs, counts, b = pairs[order], counts[order], b[order]
    cuts = np.searchsorted(b, np.arange(R + 1))
    return [(pairs[cuts[i]:cuts[i + 1]], counts[cuts[i]:cuts[i + 1]])
            for i in range(R)]


def _select_topk_packed(up, uc, key, k):
    """Deterministic top-k over (packed pair, count, rank key):
    np.partition to the k-th key, lexsort the survivor tie-set by
    (key desc, packed asc) — packed asc == (src asc, dst asc) because
    the 31-bit packing is order-preserving."""
    if len(up) > k:
        kstar = np.partition(key, len(key) - k)[len(key) - k]
        m = key >= kstar
        up, uc, key = up[m], uc[m], key[m]
    sel = np.lexsort((up, -key))[:k]
    return up[sel], uc[sel], key[sel]


@ray.remote
def _reduce_bucket_topk(k, mode, indptr, *parts):
    """Sum per-pair partial counts for ONE hash bucket (every pair's
    partials land here and only here) and return the bucket-local
    top-k — the union of bucket top-k's contains the global top-k.
    mode 'common' ranks by count; 'jaccard' by count / (deg_a + deg_b
    - count) with degrees read off the broadcast CSR indptr."""
    ps = [p for p, _ in parts if len(p)]
    e64 = np.empty(0, np.int64)
    if not ps:
        return e64, e64, np.empty(0, np.float64), 0
    allp = np.concatenate(ps)
    allc = np.concatenate([c for _, c in parts if len(c)])
    o = np.argsort(allp, kind="stable")
    allp, allc = allp[o], allc[o]
    bounds = np.flatnonzero(np.r_[True, allp[1:] != allp[:-1]])
    up, uc = allp[bounds], np.add.reduceat(allc, bounds)
    if mode == "jaccard":
        nv = len(indptr) - 2
        deg = (indptr[1:nv + 1] - indptr[:nv]).astype(np.int64)
        aa = (up >> 31).astype(np.int64)
        bb = (up & ((1 << 31) - 1)).astype(np.int64)
        key = uc / (deg[aa] + deg[bb] - uc)
    else:
        key = uc
    up, uc, key = _select_topk_packed(up, uc, key, k)
    return up, uc, key.astype(np.float64), len(bounds)


def _broadcast_topk(edges_ds, k: int, mode: str, stats: dict | None,
                    t0: float) -> pa.Table:
    """Shared broadcast-CSR plan: driver builds the CSR once (O(E)),
    span tasks enumerate + pre-aggregate + hash-partition wedge pairs,
    bucket reducers each own a disjoint pair subset and return local
    top-k; the driver merges R x k rows only."""
    empty = {"common": _EMPTY, "jaccard": _EMPTY_J, "ra": _EMPTY_RA}[mode]

    def canon_unique(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        kp = lo != hi
        arr = np.unique(np.stack([lo[kp], hi[kp]], axis=1), axis=0)
        return pa.table({"src": arr[:, 0], "dst": arr[:, 1]})

    pdf = edges_ds.select_columns(["src", "dst"]).map_batches(
        canon_unique, batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas()
    if not len(pdf):
        if stats is not None:
            stats.update({"wall_sec": time.perf_counter() - t0,
                          "strategy": "broadcast", "pairs": 0})
        return empty
    pairs = np.unique(pdf[["src", "dst"]].to_numpy(), axis=0)
    vids = np.unique(pairs)
    V = len(vids)
    assert V < 2**31, "pair packing assumes V < 2^31"
    s = np.searchsorted(vids, pairs[:, 0]).astype(np.int64)
    d = np.searchsorted(vids, pairs[:, 1]).astype(np.int64)
    x = np.concatenate([s, d])
    y = np.concatenate([d, s])
    order = np.argsort(x, kind="stable")
    x_s, y_s = x[order], y[order]
    indptr = np.zeros(V + 2, dtype=np.int64)
    np.add.at(indptr, x_s + 1, 1)
    indptr = np.cumsum(indptr)
    packed_edges = np.sort((s << 31) | d)
    ip_ref, ix_ref, pk_ref = (ray.put(indptr), ray.put(y_s),
                              ray.put(packed_edges))
    wv_ref = None
    if mode == "ra":
        deg = (indptr[1:V + 1] - indptr[:V]).astype(np.int64)
        wv_ref = ray.put(RA_SCALE // np.maximum(deg, 1))
    cpus = int(ray.cluster_resources().get("CPU", 8))
    R = _REDUCE_BUCKETS
    spans = np.array_split(np.arange(len(x_s)),
                           max(1, min(2 * cpus, len(x_s) // 1024 + 1)))
    span_refs = [_pair_count_span.options(num_returns=R)
                 .remote(x_s[sp], y_s[sp], ip_ref, ix_ref, pk_ref, wv_ref)
                 for sp in spans if len(sp)]
    if not span_refs:
        if stats is not None:
            stats.update({"wall_sec": time.perf_counter() - t0,
                          "strategy": "broadcast", "pairs": 0})
        return empty
    # "ra" reduces exactly like "common": sum int64 partials, rank by
    # the sum (which IS ra_e6 — the per-term integer weights were
    # applied in the span)
    red = [_reduce_bucket_topk.remote(k, "jaccard" if mode == "jaccard"
                                      else "common", ip_ref,
                                      *[sr[b] for sr in span_refs])
           for b in range(R)]
    tops = ray.get(red)
    up = np.concatenate([t[0] for t in tops])
    uc = np.concatenate([t[1] for t in tops])
    key = np.concatenate([t[2] for t in tops])
    n_pairs = int(sum(t[3] for t in tops))
    if not len(up):
        if stats is not None:
            stats.update({"wall_sec": time.perf_counter() - t0,
                          "strategy": "broadcast", "num_vertices": V,
                          "num_simple_edges": len(pairs), "pairs": 0})
        return empty
    up, uc, key = _select_topk_packed(up, uc, key, k)
    aa = (up >> 31).astype(np.int64)
    bb = (up & ((1 << 31) - 1)).astype(np.int64)
    if mode == "jaccard":
        deg = (indptr[1:V + 1] - indptr[:V]).astype(np.int64)
        out = pa.table({"src": vids[aa], "dst": vids[bb], "n_common": uc,
                        "n_union": deg[aa] + deg[bb] - uc})
    elif mode == "ra":
        out = pa.table({"src": vids[aa], "dst": vids[bb], "ra_e6": uc})
    else:
        out = pa.table({"src": vids[aa], "dst": vids[bb], "n_common": uc})
    if stats is not None:
        stats.update({"wall_sec": time.perf_counter() - t0,
                      "strategy": "broadcast", "num_vertices": V,
                      "num_simple_edges": len(pairs), "pairs": n_pairs})
    return out


def jaccard_topk(edges_ds, k: int = 20, *,
                 strategy: str = "auto",
                 num_partitions: int | None = None,
                 stats: dict | None = None) -> pa.Table:
    """Jaccard-coefficient link prediction: top-k NON-adjacent pairs by
    |N(a) ∩ N(b)| / |N(a) ∪ N(b)| on the simple undirected graph.

    Bit-stable across engines where Adamic-Adar is not (see module
    docstring): the score's numerator/denominator are exact integers
    (n_common, n_union = deg_a + deg_b - n_common) and only ONE IEEE
    double division ranks them — division is correctly rounded and
    deterministic in both numpy and any ANSI-SQL engine, unlike libm
    ln().  Output columns are pure int64 (src, dst, n_common, n_union);
    order is (jaccard desc, src, dst).

    Same two strategies as :func:`common_neighbors_topk`:
    ``broadcast`` (CSR via ``ray.put``, wedge spans, bucketed reducer
    top-k, degrees read off ``indptr``) under BROADCAST_MAX_EDGES,
    else ``join`` (the common-neighbor Dataset plan plus two hash
    joins against the degree table).  Partitioning assumption of the
    join plan: wedge join keyed on the middle vertex — hub vertices
    fan out quadratically, cap/sample hubs upstream at web scale."""
    t0 = time.perf_counter()
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(16, cpus // 2))
    edges_ds = edges_ds.select_columns(["src", "dst"]).materialize()
    if strategy == "auto":
        strategy = "broadcast" if edges_ds.count() <= BROADCAST_MAX_EDGES \
            else "join"

    if strategy == "broadcast":
        return _broadcast_topk(edges_ds, k, "jaccard", stats, t0)

    # join plan: common-neighbor candidates + two degree joins, all
    # Dataset-resident until the k-row result
    from ray.data.aggregate import Count as CountAgg

    edges, ue = _canonical_and_symmetric(edges_ds)
    deg = ue.groupby("x").aggregate(CountAgg(alias_name="deg")) \
        .rename_columns({"x": "v"}).materialize()
    left = ue.map_batches(lambda b: pa.table({"a": b["x"], "v": b["y"]}),
                          batch_format="pyarrow")
    right = ue.map_batches(lambda b: pa.table({"v2": b["x"], "b": b["y"]}),
                           batch_format="pyarrow")
    wedge = left.join(right, join_type="inner",
                      num_partitions=num_partitions,
                      on=("v",), right_on=("v2",))

    def ordered(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        c = t["b"].to_numpy(zero_copy_only=False)
        kp = a < c
        return pa.table({"a": a[kp], "b": c[kp]})

    cand = wedge.map_batches(ordered, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["a", "b"]).aggregate(CountAgg(alias_name="n_common"))
    non_adj = cand.join(edges, join_type="left_anti",
                        num_partitions=num_partitions,
                        on=("a", "b"), right_on=("src", "dst"))
    with_da = non_adj.join(deg, join_type="inner",
                           num_partitions=num_partitions,
                           on=("a",), right_on=("v",))
    with_db = with_da.rename_columns({"deg": "deg_a"}) \
        .join(deg, join_type="inner", num_partitions=num_partitions,
              on=("b",), right_on=("v",))

    def score(t: pa.Table) -> pa.Table:
        cn = t["n_common"].to_numpy(zero_copy_only=False).astype(np.int64)
        un = (t["deg_a"].to_numpy(zero_copy_only=False).astype(np.int64)
              + t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
              - cn)
        return pa.table({"a": t["a"], "b": t["b"], "n_common": cn,
                         "n_union": un, "jac": cn / un})

    top = with_db.map_batches(score, batch_format="pyarrow") \
        .sort(["jac", "a", "b"], descending=[True, False, False]) \
        .limit(k).to_pandas()
    if stats is not None:
        stats.update({"wall_sec": time.perf_counter() - t0,
                      "strategy": "join"})
    return pa.table({"src": top["a"].to_numpy().astype("int64"),
                     "dst": top["b"].to_numpy().astype("int64"),
                     "n_common": top["n_common"].to_numpy().astype("int64"),
                     "n_union": top["n_union"].to_numpy().astype("int64")})


def resource_allocation_topk(edges_ds, k: int = 20, *,
                             strategy: str = "auto",
                             num_partitions: int | None = None,
                             stats: dict | None = None) -> pa.Table:
    """Resource-allocation link prediction (Zhou/Lu/Zhang, EPJ B 2009):
    top-k NON-adjacent pairs by RA(a,b) = sum over common neighbors z
    of 1/deg(z) — hubs as intermediaries count less, which beats raw
    common-neighbor counts on web-like degree distributions.

    Bit-stable across engines by the same per-term integer convention
    as the repo's TF-IDF (no libm): each term is RA_SCALE // deg(z)
    in INTEGER division, summed in int64 — the SQL oracle states the
    identical expression, so ra_e6 hashes bit-for-bit.  Output
    (src, dst, ra_e6), order (ra_e6 desc, src, dst).

    Same two strategies and partitioning assumptions as
    :func:`common_neighbors_topk` (wedges keyed on the middle vertex;
    hub neighborhoods are the quadratic term)."""
    t0 = time.perf_counter()
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(16, cpus // 2))
    edges_ds = edges_ds.select_columns(["src", "dst"]).materialize()
    if strategy == "auto":
        strategy = "broadcast" if edges_ds.count() <= BROADCAST_MAX_EDGES \
            else "join"

    if strategy == "broadcast":
        return _broadcast_topk(edges_ds, k, "ra", stats, t0)

    # join plan: the common-neighbor Dataset plan with the middle
    # vertex's integer weight attached on the right side of the wedge
    from ray.data.aggregate import Count as CountAgg
    from ray.data.aggregate import Sum as SumAgg

    edges, ue = _canonical_and_symmetric(edges_ds)
    deg = ue.groupby("x").aggregate(CountAgg(alias_name="deg")) \
        .rename_columns({"x": "v"}).materialize()
    left = ue.map_batches(lambda b: pa.table({"a": b["x"], "v": b["y"]}),
                          batch_format="pyarrow")
    right = ue.join(deg, join_type="inner", num_partitions=num_partitions,
                    on=("x",), right_on=("v",)) \
        .map_batches(lambda b: pa.table({
            "v2": b["x"], "b": b["y"],
            "w": RA_SCALE // b["deg"].to_numpy(zero_copy_only=False)
            .astype(np.int64)}), batch_format="pyarrow")
    wedge = left.join(right, join_type="inner",
                      num_partitions=num_partitions,
                      on=("v",), right_on=("v2",))

    def ordered(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        c = t["b"].to_numpy(zero_copy_only=False)
        kp = a < c
        return pa.table({"a": a[kp], "b": c[kp],
                         "w": t["w"].to_numpy(zero_copy_only=False)[kp]})

    cand = wedge.map_batches(ordered, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["a", "b"]).aggregate(SumAgg("w", alias_name="ra_e6"))
    non_adj = cand.join(edges, join_type="left_anti",
                        num_partitions=num_partitions,
                        on=("a", "b"), right_on=("src", "dst"))
    top = non_adj.sort(["ra_e6", "a", "b"],
                       descending=[True, False, False]).limit(k).to_pandas()
    if stats is not None:
        stats.update({"wall_sec": time.perf_counter() - t0,
                      "strategy": "join"})
    return pa.table({"src": top["a"].to_numpy().astype("int64"),
                     "dst": top["b"].to_numpy().astype("int64"),
                     "ra_e6": top["ra_e6"].to_numpy().astype("int64")})


def _canonical_and_symmetric(edges_ds):
    """(canonical deduped simple edges, symmetrized ue) Datasets —
    the shared front of the join plans."""
    from ray.data.aggregate import Count as CountAgg

    def canon(batch: pa.Table) -> pa.Table:
        sc = batch["src"].to_numpy(zero_copy_only=False)
        dc = batch["dst"].to_numpy(zero_copy_only=False)
        lo = np.minimum(sc, dc)
        hi = np.maximum(sc, dc)
        kp = lo != hi
        return pa.table({"src": lo[kp], "dst": hi[kp]})

    edges = edges_ds.select_columns(["src", "dst"]).map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["src", "dst"]).aggregate(CountAgg(alias_name="_n")) \
        .drop_columns(["_n"]).materialize()

    def sym(b: pa.Table) -> pa.Table:
        sc = b["src"].to_numpy(zero_copy_only=False)
        dc = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"x": np.concatenate([sc, dc]),
                         "y": np.concatenate([dc, sc])})

    ue = edges.map_batches(sym, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    return edges, ue


def common_neighbors_topk(edges_ds, k: int = 20, *,
                          strategy: str = "auto",
                          num_partitions: int | None = None,
                          stats: dict | None = None) -> pa.Table:
    """edges Dataset (src, dst raw vids; multigraph OK) -> top-k
    non-adjacent pairs by common-neighbor count on the SIMPLE
    undirected graph.  Returns a k-row Arrow table
    (src, dst, n_common), src < dst."""
    t0 = time.perf_counter()
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(16, cpus // 2))
    # one upstream execution: the auto-strategy count() and the real
    # pass both read the materialized blocks (an un-materialized input
    # would re-run its whole lineage twice)
    edges_ds = edges_ds.select_columns(["src", "dst"]).materialize()
    if strategy == "auto":
        strategy = "broadcast" if edges_ds.count() <= BROADCAST_MAX_EDGES \
            else "join"

    if strategy == "broadcast":
        return _broadcast_topk(edges_ds, k, "common", stats, t0)

    # join plan: everything Dataset-resident, nothing broadcast
    from ray.data.aggregate import Count as CountAgg

    edges, ue = _canonical_and_symmetric(edges_ds)
    left = ue.map_batches(lambda b: pa.table({"a": b["x"], "v": b["y"]}),
                          batch_format="pyarrow")
    right = ue.map_batches(lambda b: pa.table({"v2": b["x"], "b": b["y"]}),
                           batch_format="pyarrow")
    wedge = left.join(right, join_type="inner",
                      num_partitions=num_partitions,
                      on=("v",), right_on=("v2",))

    def ordered(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        c = t["b"].to_numpy(zero_copy_only=False)
        kp = a < c
        return pa.table({"a": a[kp], "b": c[kp]})

    cand = wedge.map_batches(ordered, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["a", "b"]).aggregate(CountAgg(alias_name="n_common"))
    non_adj = cand.join(edges, join_type="left_anti",
                        num_partitions=num_partitions,
                        on=("a", "b"), right_on=("src", "dst"))
    top = non_adj.sort(["n_common", "a", "b"],
                       descending=[True, False, False]).limit(k).to_pandas()
    if stats is not None:
        stats.update({"wall_sec": time.perf_counter() - t0,
                      "strategy": "join"})
    return pa.table({"src": top["a"].to_numpy().astype("int64"),
                     "dst": top["b"].to_numpy().astype("int64"),
                     "n_common": top["n_common"].to_numpy().astype("int64")})
