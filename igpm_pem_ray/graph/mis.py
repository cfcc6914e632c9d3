"""Maximal independent set — Luby's algorithm with deterministic
per-round hash priorities.

Luby (STOC 1985): each round, an undecided vertex joins the MIS iff
its priority is STRICTLY greater than every undecided neighbor's;
neighbors of new members drop out.  Expected O(log V) rounds.  The
priority is an RNG-free affine hash
``((vid mod 2^31-1) * 1103515245 + round * 12345) mod (2^31 - 1)`` so
both engines (and reruns) agree bit for bit at any vid magnitude;
hash ties just defer both vertices to a later round (strict
comparison keeps independence).

Execution shape per round (the standard distributed-MIS exchange):
two ``msg_pass(max)`` calls over the pinned dense partitions — one
carrying undecided-neighbor priorities, one carrying the new-member
indicator for the exclusion wave.  Per-vertex state is one int8
V-array on the driver, broadcast per pass like every dense kernel.

No reference analog (SURVEY.md section 2); MIS is the classic
symmetry-breaking primitive for graph coloring / scheduling at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, msg_pass

UNDECIDED, IN_MIS, EXCLUDED = 0, 1, 2
_A, _B, _M = 1_103_515_245, 12_345, (1 << 31) - 1


def _priorities(vids: np.ndarray, round_no: int) -> np.ndarray:
    """Packed (hash, rank) priority: the low 31 bits are the vertex's
    rank in the sorted vid domain — a UNIQUE tie-break, so the
    per-round order is total and Luby provably terminates (a bare
    hash tie between adjacent vids would persist forever: the round
    term shifts both sides equally).  < 2^62, int64-safe, and
    SQL-expressible (row_number() over vid).

    The vid is reduced mod 2^31-1 BEFORE the multiply: a raw
    ``vid * _A`` wraps numpy int64 for vids above ~8.4e9 (the hashed
    63-bit link-graph ids) while DuckDB raises on BIGINT overflow —
    the pre-reduction keeps both engines in exact agreement at any
    vid magnitude (mathematically identical mod _M, overflow-free:
    (2^31-1) * _A < 2^62)."""
    h = ((vids.astype(np.int64) % _M) * _A + round_no * _B) % _M
    return (h << 31) | np.arange(len(vids), dtype=np.int64)


def maximal_independent_set(edges, *, max_rounds: int | None = None,
                            stats: dict | None = None) -> pa.Table:
    """(vid, state): Luby MIS on the undirected simple view of the
    edge table.  ``max_rounds=None`` runs to the fixed point (every
    vertex decided — state 1 or 2); a fixed ``max_rounds`` returns
    the intermediate state (0/1/2), which is what the SQL-unrolled
    oracle checks."""
    # drop_self_loops: a self-looped vertex would receive its OWN
    # priority as an undecided neighbor and stay undecided forever
    # (independence is a simple-graph notion; the reference web graph
    # has self-links).  A DenseGraph passed directly must be
    # self-loop-free.
    g = edges if isinstance(edges, DenseGraph) \
        else build_dense_graph(edges, drop_self_loops=True)
    V = g.num_vertices
    state = np.full(V, UNDECIDED, dtype=np.int8)
    rounds = 0
    while (state == UNDECIDED).any():
        if max_rounds is not None and rounds >= max_rounds:
            break
        rounds += 1
        p = _priorities(g.vids, rounds)
        und = state == UNDECIDED
        # max undecided-neighbor priority (-1 where none)
        nb_p = msg_pass(g, np.where(und, p, -1), reduce="max",
                        init=np.int64(-1), directions="both")
        new_in = und & (p > nb_p)
        if not new_in.any():
            continue  # all-ties round; next round re-hashes
        state[new_in] = IN_MIS
        # exclusion wave: undecided neighbors of new members
        hit = msg_pass(g, new_in.astype(np.int64), reduce="max",
                       init=np.int64(0), directions="both")
        state[(state == UNDECIDED) & (hit > 0)] = EXCLUDED
    if stats is not None:
        stats.update({"rounds": rounds,
                      "mis_size": int((state == IN_MIS).sum())})
    return pa.table({"vid": g.vids.astype(np.int64),
                     "state": state.astype(np.int64)})
