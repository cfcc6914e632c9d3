"""Distributed incremental graph invariants (exact triangles / stars).

The reference prints exact triangle and >=4-star counts per ingest
batch (gray_incremental.py:193-202) by recomputing ``nx.triangles`` on
its whole in-memory graph.  The driver-dict analog in
:class:`igpm_pem_ray.graph.incremental.IncrementalInvariants` keeps
that envelope (O(E) driver memory).  This module is the scale path the
round-2 verdict asked for: the accumulated SIMPLE-graph adjacency is a
hash-partitioned index resident in the Ray object store (driver holds
only ObjectRefs), and each ingest batch costs four waves of P parallel
tasks:

1. membership  — canonical batch pairs routed to ``owner(lo)``; pairs
   already present are dropped (parallel edges are not simple);
2. insert      — both orientations of each NEW pair appended at their
   endpoint owners; each owner also reports its local >=k-degree
   crossings (a vertex's full neighbor list lives at its owner, so the
   star delta needs no communication);
3. wedge emit  — for each new edge e=(lo,hi), ``owner(lo)`` enumerates
   w in N'(lo) and emits candidate pairs (w,hi), pre-filtered by the
   ordering predicate below, split per destination owner
   (``num_returns=P`` so candidate chunks flow task-to-task without a
   driver round-trip);
4. wedge check — ``owner(w)`` tests (w,hi) membership + the ordering
   predicate and returns one scalar count.

Exactness with multi-new-edge triangles: every stored pair carries the
batch number it arrived in; edge order is ``key(e) = (batch, lo, hi)``
and a triangle is counted exactly once, by its maximal edge under that
order (both other edges must test ``key < key(e)``).  This reproduces
the sequential-insertion semantics of the driver-dict counter without
any sequencing.

Per-batch cost: O(batch) driver work (canonicalize + route), O(batch x
avg-degree) candidate traffic, and an O(partition) append per touched
partition (state objects are immutable; each insert publishes a new
partition object — the checkpoint-friendly tradeoff, matching the
module policy that cross-step state never lives in actor memory).
"""

from __future__ import annotations

import numpy as np
import ray

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _owner(v: np.ndarray, P: int) -> np.ndarray:
    """Skew-resistant vertex -> partition routing (multiplicative mix;
    dense indices would otherwise land contiguously)."""
    return ((v.astype(np.uint64) * _MIX) >> np.uint64(40)).astype(np.int64) % P


def _empty_state() -> dict:
    z = np.empty(0, dtype=np.int64)
    return {"a": z, "b": z, "t": z}


def _pair_merge(qa: np.ndarray, qb: np.ndarray, sa: np.ndarray, sb: np.ndarray,
                st: np.ndarray):
    """Vectorized membership of query pairs (qa,qb) against stored
    pairs (sa,sb): -> (present_mask, batch_of_match).  pandas hash join
    (C kernels), no sort requirement on the stored arrays."""
    import pandas as pd

    if not len(sa) or not len(qa):
        return np.zeros(len(qa), dtype=bool), np.full(len(qa), -1, dtype=np.int64)
    q = pd.DataFrame({"a": qa, "b": qb})
    s = pd.DataFrame({"a": sa, "b": sb, "t": st})
    m = q.merge(s, on=["a", "b"], how="left")
    t = m["t"].to_numpy()
    present = ~np.isnan(t)
    out_t = np.full(len(qa), -1, dtype=np.int64)
    out_t[present] = t[present].astype(np.int64)
    return present, out_t


@ray.remote
def _inv_membership(state: dict, qa: np.ndarray, qb: np.ndarray) -> np.ndarray:
    present, _ = _pair_merge(qa, qb, state["a"], state["b"], state["t"])
    return present


@ray.remote(num_returns=2)
def _inv_insert(state: dict, na: np.ndarray, nb: np.ndarray, cur: int, k: int):
    """Append new pairs owned here (a-side) and report the star delta
    (# owned vertices whose simple degree crosses k)."""
    old_a = state["a"]
    if len(na):
        touched, inc = np.unique(na, return_counts=True)
        if len(old_a):
            ua, ca = np.unique(old_a, return_counts=True)
            pos = np.searchsorted(ua, touched)
            pos_c = np.minimum(pos, max(0, len(ua) - 1))
            hit = (pos < len(ua)) & (ua[pos_c] == touched)
            before = np.where(hit, ca[pos_c], 0)
        else:
            before = np.zeros(len(touched), dtype=np.int64)
        after = before + inc
        star_delta = int(np.count_nonzero((before < k) & (after >= k)))
        new_state = {
            "a": np.concatenate([old_a, na.astype(np.int64)]),
            "b": np.concatenate([state["b"], nb.astype(np.int64)]),
            "t": np.concatenate([state["t"],
                                 np.full(len(na), cur, dtype=np.int64)]),
        }
        return new_state, star_delta
    return state, 0


def _key_lt(l1, h1, t1, l2, h2, t2):
    """key(e1) < key(e2) under (batch, lo, hi) lexicographic order."""
    return (t1 < t2) | ((t1 == t2) & ((l1 < l2) | ((l1 == l2) & (h1 < h2))))


@ray.remote
def _inv_wedges(state: dict, e_lo: np.ndarray, e_hi: np.ndarray, cur: int,
                P: int) -> list:
    """For new edges e with owner(e_lo) == this partition: emit
    (w, e_lo, e_hi) for every w in N'(e_lo) whose edge (e_lo,w)
    satisfies key < key(e); split per owner(w)."""
    import pandas as pd

    empty = (np.empty(0, dtype=np.int64),) * 3
    if not len(e_lo) or not len(state["a"]):
        return [empty] * P
    q = pd.DataFrame({"a": e_lo, "e_lo": e_lo, "e_hi": e_hi})
    s = pd.DataFrame({"a": state["a"], "w": state["b"], "t": state["t"]})
    m = q.merge(s, on="a", how="inner")
    if not len(m):
        return [empty] * P
    w = m["w"].to_numpy()
    lo = m["e_lo"].to_numpy()
    hi = m["e_hi"].to_numpy()
    t = m["t"].to_numpy()
    p_lo = np.minimum(lo, w)
    p_hi = np.maximum(lo, w)
    keep = _key_lt(p_lo, p_hi, t, lo, hi, cur) & (w != hi)
    w, lo, hi = w[keep], lo[keep], hi[keep]
    own = _owner(w, P)
    out = []
    for p in range(P):
        sel = own == p
        out.append((w[sel], lo[sel], hi[sel]) if sel.any() else empty)
    return out


@ray.remote
def _inv_check(state: dict, cur: int, *chunks) -> int:
    """Candidate (w, e_lo, e_hi) triples routed to owner(w): count those
    whose closing edge (w, e_hi) exists with key < key(e)."""
    if not chunks:
        return 0
    w = np.concatenate([c[0] for c in chunks])
    lo = np.concatenate([c[1] for c in chunks])
    hi = np.concatenate([c[2] for c in chunks])
    if not len(w):
        return 0
    present, t = _pair_merge(w, hi, state["a"], state["b"], state["t"])
    p_lo = np.minimum(w, hi)
    p_hi = np.maximum(w, hi)
    ok = present & _key_lt(p_lo, p_hi, t, lo, hi, cur)
    return int(np.count_nonzero(ok))


class DistributedInvariants:
    """Drop-in for :class:`IncrementalInvariants` with object-store
    partitioned state.  Attributes ``triangles`` / ``stars`` mirror the
    reference's per-step printed ground truth."""

    def __init__(self, min_star_degree: int = 4,
                 num_partitions: int | None = None) -> None:
        if num_partitions is None:
            num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
        self.P = num_partitions
        self.min_star_degree = min_star_degree
        self.triangles = 0
        self.stars = 0
        self._batch_no = 0
        self._state = [ray.put(_empty_state()) for _ in range(self.P)]

    def update(self, src: np.ndarray, dst: np.ndarray) -> None:
        cur = self._batch_no
        self._batch_no += 1
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        keep = lo != hi
        if not keep.any():
            return
        pairs = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
        lo, hi = pairs[:, 0], pairs[:, 1]
        own = _owner(lo, self.P)

        # wave 1: membership at owner(lo) -> new-edge mask
        sels = [own == p for p in range(self.P)]
        masks = ray.get([_inv_membership.remote(self._state[p], lo[s], hi[s])
                         for p, s in enumerate(sels)])
        new_mask = np.zeros(len(lo), dtype=bool)
        for s, m in zip(sels, masks):
            new_mask[s] = ~m
        lo, hi = lo[new_mask], hi[new_mask]
        if not len(lo):
            return

        # wave 2: insert both orientations at their a-side owners
        ins_a = np.concatenate([lo, hi])
        ins_b = np.concatenate([hi, lo])
        ins_own = _owner(ins_a, self.P)
        star_refs = []
        for p in range(self.P):
            s = ins_own == p
            ref, sd = _inv_insert.remote(self._state[p], ins_a[s], ins_b[s],
                                         cur, self.min_star_degree)
            self._state[p] = ref
            star_refs.append(sd)
        self.stars += sum(ray.get(star_refs))

        # wave 3+4: wedge enumeration at owner(lo), closure check at
        # owner(w); chunk refs flow task-to-task (no driver gather)
        e_own = _owner(lo, self.P)
        cand: list[list] = []
        for p in range(self.P):
            s = e_own == p
            cand.append(_inv_wedges.options(num_returns=self.P).remote(
                self._state[p], lo[s], hi[s], cur, self.P))
        counts = [_inv_check.remote(self._state[q], cur,
                                    *[cand[p][q] for p in range(self.P)])
                  for q in range(self.P)]
        self.triangles += sum(ray.get(counts))
