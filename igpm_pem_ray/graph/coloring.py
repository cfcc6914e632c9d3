"""Greedy distributed graph coloring — Jones-Plassmann with
deterministic hash priorities.

Jones & Plassmann (1993): an uncolored vertex colors itself in the
round where its priority exceeds every uncolored neighbor's, taking
the smallest color absent from its already-colored neighborhood.
Rounds are O(log V / log log V) expected with random priorities; ours
are the RNG-free packed (hash, rank) priorities shared with Luby MIS
(``graph/mis._priorities`` — unique tie-break, identical at any vid
magnitude), so the coloring is a pure function of the edge set and
reruns / engines agree exactly.

This is the dense-envelope member (driver CSR + vectorized rounds,
like ``kcore.core_numbers`` / ``ktruss.truss_numbers``): per round,
the local-max test is one ``maximum.reduceat`` over the CSR and the
smallest-absent-color (mex) for ALL winners is computed together —
sort the (winner, neighbor-color) pairs, dedupe, and find the first
gap per group — no per-vertex Python.  The Dataset-resident shape
would be the MIS exchange (two msg_pass waves) plus a per-winner
color-set join; the recurrence here is the oracle for it.

No reference analog (SURVEY.md §2); coloring is the classic
scheduling/symmetry-breaking companion to MIS.  Rows-only query
(sequential mex has no tractable SQL form); correctness is pinned by
an independent pure-Python reference implementing the same published
rule plus properness/determinism checks (tests/test_kernels.py).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.mis import _priorities


def _canon_unique(batch: pa.Table) -> pa.Table:
    s = batch["src"].to_numpy(zero_copy_only=False)
    d = batch["dst"].to_numpy(zero_copy_only=False)
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    keep = lo != hi
    arr = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    return pa.table({"src": arr[:, 0], "dst": arr[:, 1]})


def _mex_per_winner(wid: np.ndarray, col: np.ndarray,
                    n_winners: int) -> np.ndarray:
    """Vectorized minimum-excluded-color: for each winner id in
    [0, n_winners), the smallest non-negative int absent from its
    (wid, col) rows.  Winners with no rows get 0."""
    out = np.zeros(n_winners, dtype=np.int64)
    if not len(wid):
        return out
    order = np.lexsort((col, wid))
    w, c = wid[order], col[order]
    keep = np.r_[True, (w[1:] != w[:-1]) | (c[1:] != c[:-1])]
    w, c = w[keep], c[keep]
    starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
    lens = np.diff(np.r_[starts, len(w)])
    pos = np.arange(len(w)) - np.repeat(starts, lens)
    # colors per group are sorted unique, so c >= pos; the mex is the
    # first position where c > pos, else the group length
    gap = np.where(c > pos, pos, np.int64(1) << 40)
    first_gap = np.minimum.reduceat(gap, starts)
    mex = np.minimum(first_gap, lens)
    out[w[starts]] = mex
    return out


def greedy_coloring(edges_ds, *, stats: dict | None = None) -> pa.Table:
    """edges Dataset (src, dst raw vids, multigraph OK) -> (vid,
    color): the deterministic Jones-Plassmann coloring.  Proper by
    construction (winners of one round are pairwise non-adjacent and
    exclude colored neighbors' colors); colors are 0-based."""
    t0 = time.perf_counter()
    pdf = edges_ds.select_columns(["src", "dst"]).map_batches(
        _canon_unique, batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas()
    if not len(pdf):
        return pa.table({"vid": pa.array([], pa.int64()),
                         "color": pa.array([], pa.int64())})
    arr = np.unique(np.stack([pdf["src"].to_numpy(),
                              pdf["dst"].to_numpy()], axis=1), axis=0)
    lo, hi = arr[:, 0].astype(np.int64), arr[:, 1].astype(np.int64)
    vids = np.unique(np.concatenate([lo, hi]))
    V = len(vids)
    assert V < 2**31, "dense index packing assumes V < 2^31"
    u = np.searchsorted(vids, lo).astype(np.int64)
    v = np.searchsorted(vids, hi).astype(np.int64)
    # undirected CSR (both directions)
    eu = np.concatenate([u, v])
    ev = np.concatenate([v, u])
    order = np.argsort(eu, kind="stable")
    eu, ev = eu[order], ev[order]
    starts = np.searchsorted(eu, np.arange(V))

    prio = _priorities(vids, 0)          # static JP priority, unique
    color = np.full(V, -1, dtype=np.int64)
    rounds = 0
    while (color < 0).any():
        rounds += 1
        # max priority over UNCOLORED neighbors (colored -> -1)
        nbr_p = np.where(color[ev] < 0, prio[ev], np.int64(-1))
        seg_max = np.maximum.reduceat(nbr_p, starts) if len(eu) else \
            np.full(V, -1, dtype=np.int64)
        seg_max[np.diff(np.r_[starts, len(eu)]) == 0] = -1
        winners = (color < 0) & (prio > seg_max)
        if not winners.any():  # isolated-in-CSR can't happen; safety
            raise AssertionError("JP round produced no winner")
        # mex over colored-neighbor colors, all winners at once
        widx = np.full(V, -1, dtype=np.int64)
        widx[winners] = np.arange(int(winners.sum()))
        m = winners[eu] & (color[ev] >= 0)
        mex = _mex_per_winner(widx[eu[m]], color[ev[m]],
                              int(winners.sum()))
        color[winners] = mex
    if stats is not None:
        stats.update({"rounds": rounds,
                      "n_colors": int(color.max()) + 1,
                      "wall_sec": time.perf_counter() - t0})
    return pa.table({"vid": vids, "color": color})
