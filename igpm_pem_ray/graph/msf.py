"""Minimum spanning forest — distributed Boruvka over the undirected
simple view of an edge Dataset.

No reference analog (the reference has no weighted-graph optimization
kernels at all — SURVEY.md §2); MSF is the classic log-round
distributed graph kernel (Boruvka 1926; the GHS distributed form), so
the engine carries it alongside SSSP as the weighted-kernel pair.

Edge weights use the shared deterministic convention from
``graph/sssp.py`` — ``w(u, v) = 1 + (u + v) mod 7`` on RAW vids —
and ties are broken by the STRICT total order ``(w, min_vid,
max_vid)``: every undirected edge gets a distinct key, so the MSF is
UNIQUE and the kernel is comparable edge-for-edge against an
independent Kruskal oracle (tests/test_kernels.py).

Plan (the dense-envelope member of the family, like
``kcore.core_numbers`` / ``ktruss.truss_numbers``):
- distinct canonical edges via the per-block canon+unique combiner
  (shuffled rows are per-block-distinct, not per-row);
- Boruvka rounds on driver arrays: each component selects its
  minimum-key incident edge (one lexsort + stable-argsort
  first-per-group — no Python loop), selected edges are contracted by
  vectorized hash-to-min pointer jumping.  O(log V) rounds, O(E)
  memory, V < 2^31 by the dense-family envelope.
At 10^12 V each round maps 1:1 onto Dataset primitives (edges⋈comp
join, per-comp min via rank_per_group, cc_shuffle-style contraction);
the dense kernel is the oracle-checked recurrence for that plan.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.sssp import edge_weights


def _canon_unique(batch: pa.Table) -> pa.Table:
    s = batch["src"].to_numpy(zero_copy_only=False)
    d = batch["dst"].to_numpy(zero_copy_only=False)
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    keep = lo != hi
    arr = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    return pa.table({"src": arr[:, 0], "dst": arr[:, 1]})


def _hash_to_min(n_labels_domain: int, a: np.ndarray, b: np.ndarray,
                 base: np.ndarray) -> np.ndarray:
    """Contract the (a, b) pseudo-forest into ``base`` labels:
    vectorized min-label propagation + pointer jumping until fixpoint.
    ``a``/``b`` are current component labels (dense ids)."""
    m = base
    while True:
        prev = m
        m = m.copy()
        lo = np.minimum(m[a], m[b])
        np.minimum.at(m, a, lo)
        np.minimum.at(m, b, lo)
        m = m[m]  # pointer jump
        if np.array_equal(m, prev):
            return m


def msf_arrays(u: np.ndarray, v: np.ndarray, w: np.ndarray,
               n_vertices: int, *, stats: dict | None = None):
    """Boruvka on dense-index arrays.  Edge keys (w, u, v) must be
    distinct rows (guaranteed after canon+unique: u < v unique pairs).
    Returns (forest edge index array into u/v/w, final component
    labels)."""
    comp = np.arange(n_vertices, dtype=np.int64)
    forest: list[np.ndarray] = []
    rounds = 0
    eids = np.arange(len(u), dtype=np.int64)
    while True:
        cu, cv = comp[u], comp[v]
        live = cu != cv
        if not live.any():
            break
        rounds += 1
        lu, lv, lw = u[live], v[live], w[live]
        lids, lcu, lcv = eids[live], cu[live], cv[live]
        # rank edges by the strict key (w, u, v); both endpoint
        # components see the edge, each takes its minimum-ranked one
        # (sorting (comp, key-rank) jointly — a stable argsort over the
        # concatenated halves would keep the cu half ahead of the cv
        # half and pick non-minimal edges, which CAN close cycles)
        key_order = np.lexsort((lv, lu, lw))
        n_live = len(key_order)
        rank = np.empty(n_live, dtype=np.int64)
        rank[key_order] = np.arange(n_live)
        c2 = np.concatenate([lcu, lcv])
        r2 = np.tile(rank, 2)
        pos2 = np.tile(np.arange(n_live, dtype=np.int64), 2)
        order = np.lexsort((r2, c2))
        c2s = c2[order]
        first = np.flatnonzero(np.r_[True, c2s[1:] != c2s[:-1]])
        chosen = np.unique(pos2[order][first])    # positions into live view
        forest.append(lids[chosen])
        comp = _hash_to_min(n_vertices, lcu[chosen], lcv[chosen], comp)
        # drop settled edges so each round scans the shrinking frontier
        keep = comp[u] != comp[v]
        u, v, w, eids = u[keep], v[keep], w[keep], eids[keep]
    sel = (np.concatenate(forest) if forest
           else np.array([], dtype=np.int64))
    if stats is not None:
        stats.update({"rounds": rounds, "n_forest_edges": int(len(sel))})
    return sel, comp


def msf(edges_ds, *, stats: dict | None = None) -> pa.Table:
    """edges Dataset (src, dst raw vids, multigraph OK) -> the unique
    minimum spanning forest under the strict key (w(u,v), u, v):
    (src, dst, w) with src < dst, sorted by (w, src, dst)."""
    t0 = time.perf_counter()
    pdf = edges_ds.select_columns(["src", "dst"]).map_batches(
        _canon_unique, batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas()
    if not len(pdf):
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "w": pa.array([], pa.int64())})
    arr = np.unique(np.stack([pdf["src"].to_numpy(),
                              pdf["dst"].to_numpy()], axis=1), axis=0)
    lo, hi = arr[:, 0].astype(np.int64), arr[:, 1].astype(np.int64)
    vids = np.unique(np.concatenate([lo, hi]))
    assert len(vids) < 2**31, "dense index packing assumes V < 2^31"
    u = np.searchsorted(vids, lo)
    v = np.searchsorted(vids, hi)
    w = edge_weights(lo, hi)
    sel, comp = msf_arrays(u, v, w, len(vids), stats=stats)
    fs, fd, fw = lo[sel], hi[sel], w[sel]
    order = np.lexsort((fd, fs, fw))
    if stats is not None:
        stats.update({"total_weight": int(fw.sum()),
                      "n_components": int(len(np.unique(comp))),
                      "wall_sec": time.perf_counter() - t0})
    return pa.table({"src": fs[order], "dst": fd[order], "w": fw[order]})
