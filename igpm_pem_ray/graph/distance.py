"""Distance-based graph analytics: distance histogram, neighborhood
function, harmonic centrality, effective diameter.

Two strategies, parity-tested against each other (the K1-K3 two-path
story):

- ``exact``: bit-parallel multi-source BFS.  Sources are processed in
  chunks of ``64*chunk_words`` bits; one chunk rides a single
  ``uint64[V, W]`` bitset through ``msg_pass(reduce="or")`` rounds
  over the pinned dense partitions (the classic bit-parallel APSP —
  each OR-gather covers 64*W sources at once, so a sweep is
  ``ceil(V / 64W)`` independent chunk passes of O(E * W) vectorized
  work each).  Nothing V^2 is ever materialized: per-chunk state is
  V*W*8 bytes and chunks are independent (restartable / fan-out-able).

- ``hll``: HyperBall (Boldi, Rosa, Vigna, "HyperANF" WWW 2011 /
  HyperBall 2013): per-vertex HyperLogLog registers (``uint8[V, m]``)
  propagated by ``msg_pass(reduce="max")``; after round d the row
  estimate approximates |ball(v, d)|.  O(E * m) work per round and
  V*m bytes of state TOTAL for all sources simultaneously — the
  10^12-vertex strategy for effective-diameter estimation, where the
  exact sweep's V/64W chunk passes are no longer affordable.

The graph is treated as undirected WITHOUT materializing the
symmetrized edge set: every exchange runs ``directions="both"`` over
the directed build (same convention as graph/bfs.py).

No reference analog (the reference computes no distance statistics —
SURVEY.md section 2); this is a web-graph analytics operator
(effective diameter / centrality are standard Common-Crawl-scale
measurements).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, msg_pass
from igpm_pem_ray.text.sketch import _hash64

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount_rows(bits: np.ndarray) -> np.ndarray:
    """Per-row popcount of a (V, W) uint64 bitset, int64 out."""
    return _POP8[bits.view(np.uint8).reshape(bits.shape[0], -1)] \
        .sum(axis=1, dtype=np.int64)


def _as_graph(edges) -> DenseGraph:
    if isinstance(edges, DenseGraph):
        return edges
    from igpm_pem_ray.graph.betweenness import WIDE_KERNEL_BLOCKS

    # coarse blocks: every bitset/register pass ships the whole
    # (V, W) array per task, so traffic scales with partition count
    # (see betweenness.WIDE_KERNEL_BLOCKS)
    return build_dense_graph(edges, target_blocks=WIDE_KERNEL_BLOCKS)


def distance_stats(edges, *, max_depth: int, chunk_words: int = 16,
                   harmonic_scale: int = 1_000_000,
                   checkpoint_dir: str | None = None,
                   resume: bool = False):
    """One exact bit-parallel sweep -> (hist, harmonic, ecc, nreach,
    sumd).

    ``checkpoint_dir``: after every completed source chunk the running
    accumulators are committed via the manifest protocol
    (state/checkpoint.save_table; iteration = chunks done), so
    ``resume=True`` skips finished chunks — the sweep's unit of
    restart is the chunk, matching its unit of parallelism.

    hist: int64[max_depth+1]; hist[d] = number of ORDERED vertex pairs
    (u, v), u != v, with undirected distance exactly d (1-indexed;
    hist[0] unused).  harmonic: int64[V] where harmonic[i] =
    sum over u reached at depth d <= max_depth of
    round(harmonic_scale / d) — integer-exact harmonic centrality of
    vids[i] (depth-capped), safe to hash across engines.  ecc:
    int64[V] — depth-capped eccentricity (max observed distance from
    vids[i] to any vertex within max_depth).

    Memory: per chunk the broadcast bitset is V * chunk_words * 8
    bytes (128 B/vertex at the default); at larger V lower
    chunk_words and/or fan chunks out as parallel jobs — chunks share
    nothing but the pinned graph blocks.
    """
    g = _as_graph(edges)
    V = g.num_vertices
    hist = np.zeros(max_depth + 1, dtype=np.int64)
    harmonic = np.zeros(V, dtype=np.int64)
    ecc = np.zeros(V, dtype=np.int64)
    nreach = np.zeros(V, dtype=np.int64)
    sumd = np.zeros(V, dtype=np.int64)
    if V == 0:
        return hist, harmonic, ecc, nreach, sumd
    inv = np.zeros(max_depth + 1, dtype=np.int64)
    for d in range(1, max_depth + 1):
        inv[d] = int(np.floor(harmonic_scale / d + 0.5))
    span = 64 * chunk_words
    n_chunks = (V + span - 1) // span
    params = {"kernel": "distance_stats", "max_depth": max_depth,
              "chunk_words": chunk_words, "V": V, "E": g.num_edges,
              "harmonic_scale": harmonic_scale}
    start_chunk = 0
    if resume and checkpoint_dir:
        from igpm_pem_ray.state import checkpoint as ckpt

        found = ckpt.latest_table(checkpoint_dir, params)
        if found is not None:
            start_chunk, tbl, _ = found
            key = tbl["key"].to_numpy()
            hrow = tbl["harmonic"].to_numpy()
            hist_rows = key < 0
            hist[-key[hist_rows]] = hrow[hist_rows]
            vrows = ~hist_rows
            harmonic[key[vrows]] = hrow[vrows]
            ecc[key[vrows]] = tbl["ecc"].to_numpy()[vrows]
            nreach[key[vrows]] = tbl["nreach"].to_numpy()[vrows]
            sumd[key[vrows]] = tbl["sumd"].to_numpy()[vrows]

    def _save(chunks_done: int) -> None:
        if not checkpoint_dir:
            return
        from igpm_pem_ray.state import checkpoint as ckpt

        # hist rides along as key=-d rows in the harmonic column
        key = np.concatenate([np.arange(V, dtype=np.int64),
                              -np.arange(1, max_depth + 1,
                                         dtype=np.int64)])
        hcol = np.concatenate([harmonic, hist[1:]])
        pad = np.zeros(max_depth, dtype=np.int64)
        tbl = pa.table({"key": key, "harmonic": hcol,
                        "ecc": np.concatenate([ecc, pad]),
                        "nreach": np.concatenate([nreach, pad]),
                        "sumd": np.concatenate([sumd, pad])})
        ckpt.save_table(checkpoint_dir, chunks_done, tbl,
                        metric_name="chunks_done",
                        metric_value=float(chunks_done), params=params)

    for ci in range(start_chunk, n_chunks):
        start = ci * span
        chunk = np.arange(start, min(start + span, V))
        w = (len(chunk) + 63) // 64
        reach = np.zeros((V, w), dtype=np.uint64)
        loc = chunk - start
        reach[chunk, loc // 64] = np.uint64(1) << (loc % 64).astype(np.uint64)
        rowpop = _popcount_rows(reach)
        for d in range(1, max_depth + 1):
            nxt = reach | msg_pass(g, reach, reduce="or", init=0,
                                   directions="both")
            newpop = _popcount_rows(nxt)
            new = newpop - rowpop
            n_new = int(new.sum())
            if n_new == 0:
                break
            hist[d] += n_new
            harmonic += new * inv[d]
            # max across chunks too — each source chunk restarts d at 1
            np.maximum(ecc, np.where(new > 0, d, 0), out=ecc)
            nreach += new
            sumd += new * d
            reach, rowpop = nxt, newpop
        _save(ci + 1)
    return hist, harmonic, ecc, nreach, sumd


def _require_dataset(edges, strategy: str):
    if isinstance(edges, DenseGraph):
        raise ValueError(f"strategy {strategy!r} takes an edge Dataset, "
                         "not a DenseGraph")


def distance_histogram(edges, *, max_depth: int, chunk_words: int = 16,
                       strategy: str = "exact") -> pa.Table:
    """(d, n_pairs) for d = 1..max_depth (ordered pairs at exact
    undirected distance d); zero-count depths included so the output
    schema/rowcount is input-independent.

    ``strategy="shuffle"``: the Dataset-resident sweep
    (``shuffle_kernels.msbfs_shuffle``) — integer-exact same output,
    per-chunk bitset state as a (vid, bits) Dataset instead of driver
    numpy (the 10^12-V path)."""
    if strategy == "shuffle":
        from igpm_pem_ray.graph.shuffle_kernels import msbfs_shuffle

        _require_dataset(edges, strategy)
        return msbfs_shuffle(edges, max_depth=max_depth,
                             chunk_words=chunk_words)[0]
    hist = distance_stats(edges, max_depth=max_depth,
                          chunk_words=chunk_words)[0]
    d = np.arange(1, max_depth + 1, dtype=np.int64)
    return pa.table({"d": d, "n_pairs": hist[1:]})


def harmonic_centrality(edges, *, max_depth: int, chunk_words: int = 16,
                        scale: int = 1_000_000,
                        strategy: str = "exact") -> pa.Table:
    """(vid, harmonic_e6): depth-capped harmonic centrality
    sum_{u: d(u,v) <= max_depth} round(1e6 / d(u,v)) — exact int64.

    ``strategy="shuffle"``: Dataset-resident sweep, bit-for-bit the
    same integers (returns a sorted pa.Table for small outputs; at
    scale call ``msbfs_shuffle`` directly and keep the Dataset)."""
    if strategy == "shuffle":
        from igpm_pem_ray.graph.shuffle_kernels import msbfs_shuffle

        _require_dataset(edges, strategy)
        _, acc = msbfs_shuffle(edges, max_depth=max_depth,
                               chunk_words=chunk_words,
                               harmonic_scale=scale)
        import ray

        refs = acc.select_columns(["vid", "harmonic"]) \
                  .rename_columns({"harmonic": "harmonic_e6"}) \
                  .sort("vid").to_arrow_refs()
        return pa.concat_tables([ray.get(r) for r in refs])
    g = _as_graph(edges)
    harm = distance_stats(g, max_depth=max_depth,
                          chunk_words=chunk_words,
                          harmonic_scale=scale)[1]
    return pa.table({"vid": g.vids.astype(np.int64), "harmonic_e6": harm})


# ---------- HyperBall (HLL) scale path ----------

_HB_M = 64  # registers/vertex: ~13% per-row standard error, tight
            # for the SUM over rows used by the neighborhood function


def _init_registers(vids: np.ndarray, m: int = _HB_M) -> np.ndarray:
    """Each vertex's singleton-{vid} HLL: one register set to the rank
    of its hash suffix (same splitmix64 + p-bit bucket scheme as
    text/sketch.py)."""
    h = _hash64(vids.astype(np.uint64))
    p = int(np.log2(m))
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    suffix = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    lz = np.zeros(len(h), dtype=np.int64)
    s = suffix.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = s < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        s[mask] = s[mask] << np.uint64(shift)
    regs = np.zeros((len(vids), m), dtype=np.uint8)
    regs[np.arange(len(vids)), reg] = (lz + 1).astype(np.uint8)
    return regs


def _hll_row_estimates(regs: np.ndarray) -> np.ndarray:
    """Vectorized per-row HLL estimate with linear-counting
    correction (float64[V])."""
    m = regs.shape[1]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
    est[small] = lin[small]
    return est


def neighborhood_function_hll(edges, *, max_depth: int,
                              m: int = _HB_M) -> pa.Table:
    """HyperBall: (d, approx_pairs) where approx_pairs ~ number of
    ordered pairs (u, v), u != v, within distance <= d (cumulative,
    the classic neighborhood function N(d)).  One msg_pass(max) per
    round over ALL sources at once; state is uint8[V, m]."""
    g = _as_graph(edges)
    V = g.num_vertices
    if V == 0:
        return pa.table({"d": pa.array([], pa.int64()),
                         "approx_pairs": pa.array([], pa.int64())})
    regs = _init_registers(g.vids, m)
    rows = []
    for d in range(1, max_depth + 1):
        nbr = msg_pass(g, regs, reduce="max", init=0, directions="both")
        nxt = np.maximum(regs, nbr)
        # ball estimate includes the vertex itself -> subtract V for
        # the distinct-pair convention shared with the exact sweep
        n = float(_hll_row_estimates(nxt).sum()) - V
        rows.append((d, max(int(round(n)), 0)))
        if np.array_equal(nxt, regs):
            break
        regs = nxt
    return pa.table({"d": pa.array([r[0] for r in rows], pa.int64()),
                     "approx_pairs": pa.array([r[1] for r in rows],
                                              pa.int64())})


def effective_diameter(edges, *, q: float = 0.9, max_depth: int = 64,
                       strategy: str = "hll") -> dict:
    """Smallest d with N(d) >= q * N(max); interpolated like HyperANF
    reports it is NOT — we return the integer convention (smallest
    whole d) so both strategies agree exactly on discrete inputs.

    Returns {"effective_diameter": d, "n_pairs_total": N(max),
    "depth_converged": last d that added pairs}.
    """
    if strategy in ("hll", "hll_shuffle"):
        if strategy == "hll_shuffle":
            # Dataset-resident registers (shuffle_kernels.hyperball_
            # shuffle): bit-identical register evolution, so the same
            # N(d) series up to float-summation order — the path for
            # vertex sets that fit no driver.
            from igpm_pem_ray.graph.shuffle_kernels import hyperball_shuffle

            if isinstance(edges, DenseGraph):
                raise ValueError("hll_shuffle takes an edge Dataset, "
                                 "not a DenseGraph")
            t = hyperball_shuffle(edges, max_depth=max_depth)
        else:
            t = neighborhood_function_hll(edges, max_depth=max_depth)
        cum = t["approx_pairs"].to_numpy().astype(np.int64)
        # HLL row estimates are not guaranteed monotone in d (an
        # estimate can dip when registers cross the linear-counting /
        # raw-estimator switch), and searchsorted on a non-sorted
        # array returns an arbitrary index — force the running max,
        # the HyperANF convention (the exact path is monotone by
        # construction).
        cum = np.maximum.accumulate(cum)
        depths = t["d"].to_numpy()
    elif strategy == "exact":
        hist = distance_stats(edges, max_depth=max_depth)[0]
        cum = np.cumsum(hist[1:])
        depths = np.arange(1, max_depth + 1)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    if len(cum) == 0 or cum[-1] == 0:
        return {"effective_diameter": 0, "n_pairs_total": 0,
                "depth_converged": 0}
    total = int(cum[-1])
    idx = int(np.searchsorted(cum, q * total))
    grew = np.flatnonzero(np.diff(np.r_[0, cum]))
    return {"effective_diameter": int(depths[min(idx, len(depths) - 1)]),
            "n_pairs_total": total,
            "depth_converged": int(depths[grew[-1]]) if len(grew) else 0}


def _msbfs_acc_table(edges, *, max_depth: int, chunk_words: int,
                     columns: dict[str, str]) -> pa.Table:
    """Run the Dataset-resident sweep and collect selected accumulator
    columns sorted by vid (small-output convenience; at scale keep the
    Dataset from ``msbfs_shuffle`` directly)."""
    import ray

    from igpm_pem_ray.graph.shuffle_kernels import msbfs_shuffle

    _, acc = msbfs_shuffle(edges, max_depth=max_depth,
                           chunk_words=chunk_words)
    refs = acc.select_columns(["vid", *columns]) \
              .rename_columns(columns).sort("vid").to_arrow_refs()
    return pa.concat_tables([ray.get(r) for r in refs])


def eccentricity(edges, *, max_depth: int, chunk_words: int = 16,
                 strategy: str = "exact") -> pa.Table:
    """(vid, ecc): depth-capped eccentricity from the same exact
    bit-parallel sweep (max distance from each vertex to anything it
    reaches within max_depth).  ``strategy="shuffle"``: the
    Dataset-resident sweep, integer-exact same output."""
    if strategy == "shuffle":
        _require_dataset(edges, strategy)
        return _msbfs_acc_table(edges, max_depth=max_depth,
                                chunk_words=chunk_words,
                                columns={"ecc": "ecc"})
    g = _as_graph(edges)
    ecc = distance_stats(g, max_depth=max_depth,
                         chunk_words=chunk_words)[2]
    return pa.table({"vid": g.vids.astype(np.int64), "ecc": ecc})


def closeness_stats(edges, *, max_depth: int, chunk_words: int = 16,
                    strategy: str = "exact") -> pa.Table:
    """(vid, n_reached, sum_d): exact closeness-centrality sufficient
    statistics within max_depth (closeness = n_reached/sum_d, or the
    Wasserman-Faust (n_reached^2)/((V-1)*sum_d) — left to the caller
    as a stateless post-map, keeping the contract integer-exact).
    ``strategy="shuffle"``: the Dataset-resident sweep, integer-exact
    same output."""
    if strategy == "shuffle":
        _require_dataset(edges, strategy)
        return _msbfs_acc_table(edges, max_depth=max_depth,
                                chunk_words=chunk_words,
                                columns={"nreach": "n_reached",
                                         "sumd": "sum_d"})
    g = _as_graph(edges)
    _, _, _, nreach, sumd = distance_stats(g, max_depth=max_depth,
                                           chunk_words=chunk_words)
    return pa.table({"vid": g.vids.astype(np.int64),
                     "n_reached": nreach, "sum_d": sumd})
