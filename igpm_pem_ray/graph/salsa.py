"""SALSA (Stochastic Approach for Link-Structure Analysis) hub /
authority scores on a directed edge Dataset — integer fixed-point.

Reference context: the reference's vertex-importance signal is RWR
(/root/reference/patternmatching/gray/rwr.py:132-190, a degree-
normalized random walk); SALSA (Lempel & Moran, WWW 2000) is the
random-walk counterpart of HITS — the authority chain alternates one
backward and one forward step, each normalized by the local degree:

    a_k(j) = sum_{(i,j) in E} h_{k-1}(i) / outdeg(i)
    h_k(i) = sum_{(i,j) in E} a_k(j)     / indeg(j)

Semantics pinned for the SQL oracle: scores are int64 fixed-point
(h_0 = SALSA_SCALE for every vertex) and the per-edge term uses
FLOOR DIVISION before the sum — ``h // outdeg`` then sum — so every
intermediate is an exact integer and the result is identical under
ANY reduction order and in any engine (the same no-float convention
as katz_shuffle's dyadic-alpha rework; DuckDB's ``//`` on BIGINT is
the same floor division for the non-negative values here).  Scores
are therefore ~1 ulp-free: rankings match the textbook float variant
up to the deliberate SCALE quantization.

Plan: dense fast-path substrate — per iteration one elementwise
int64 floor-divide (O(V), driver) and one ``msg_pass(sum)`` exchange
per direction over the pinned partition preps (forward for auth,
reverse preps for hub; no symmetrized edge set); msg_pass preserves
the int64 dtype so the exchange is exact.  V < 2^31 asserted at
build.  The V-unbounded Dataset-resident analog is the
``shuffle_kernels`` join+groupby recurrence family (identical
integer message algebra — see katz_shuffle).

Overflow envelope: total mass is non-increasing (floor division only
loses mass), so every score is <= V * SALSA_SCALE; with SCALE=1e9
that stays int64-safe (and float64-exact in numpy reducers) up to
V ~ 9e9 vertices per component of the driver-dense path.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph, msg_pass

SALSA_SCALE = 10**9


def salsa_dense(g: DenseGraph, *, n_iters: int = 3,
                scale: int = SALSA_SCALE,
                stats: dict | None = None) -> tuple[np.ndarray, np.ndarray]:
    """(hub, auth) int64 fixed-point arrays after ``n_iters`` rounds."""
    if g.symmetric:
        raise ValueError("SALSA is a directed kernel: build the graph "
                         "with symmetric=False")
    V = g.num_vertices
    t0 = time.perf_counter()
    ones = np.ones(V, dtype=np.int64)
    # outdeg(i): reverse flow delivers 1 per out-edge back to src;
    # indeg(j): forward flow delivers 1 per in-edge to dst.
    outdeg = msg_pass(g, ones, reduce="sum", init=0, directions="in")
    indeg = msg_pass(g, ones, reduce="sum", init=0, directions="out")
    od = np.maximum(outdeg, 1)  # guarded: h//od only read where outdeg>0
    idg = np.maximum(indeg, 1)
    hub = np.full(V, scale, dtype=np.int64)
    auth = np.zeros(V, dtype=np.int64)
    for _ in range(n_iters):
        t = np.where(outdeg > 0, hub // od, 0)
        auth = msg_pass(g, t, reduce="sum", init=0, directions="out")
        s = np.where(indeg > 0, auth // idg, 0)
        hub = msg_pass(g, s, reduce="sum", init=0, directions="in")
    if stats is not None:
        stats.update({"iterations": n_iters,
                      "wall_sec": time.perf_counter() - t0})
    return hub, auth


def salsa(edges_ds, *, n_iters: int = 3, scale: int = SALSA_SCALE,
          stats: dict | None = None) -> pa.Table:
    """edges Dataset (src, dst raw vids) -> (vid, hub_q, auth_q)
    int64 fixed-point, sorted by vid."""
    g = build_dense_graph(edges_ds)
    hub, auth = salsa_dense(g, n_iters=n_iters, scale=scale, stats=stats)
    return pa.table({"vid": g.vids.astype(np.int64),
                     "hub_q": hub, "auth_q": auth})
