"""Synchronous label propagation — community assignment (kernel K3).

Reference analog: recursive Louvain community detection used to choose
recompute node sets (/root/reference/patternmatching/gray/incremental/
query_call.py:130-177, rl_model.py:13-69).  The north rule replaces it
with deterministic synchronous label propagation:

    label_0(v) = vid(v)
    label_{t+1}(v) = the most frequent label among v's (undirected)
                     neighbors; ties broken by the SMALLEST label;
                     isolated vertices keep their label.

Execution: messages (dst, src_label) are pre-counted per pinned
partition (np.unique over packed (dst,label) int64 codes inside raw
Ray tasks — dense.lp_count_pass), merged on the driver, then reduced
to one winner per dst by packing (count, -label) into a single int64
max key (np.maximum.at).  At 10^11+ vertex scale the merge becomes the
``groupby(["dst","label"]).sum()`` + packed-max shuffle described in
SURVEY.md K3 — the per-partition combiner output is identical, only
the merge transport changes.  Convergence: zero label changes, or
``max_rounds`` (sync LP can 2-cycle on bipartite structures; the cap +
deterministic tie-break keeps the output well-defined — tests pin the
same spec).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray

from igpm_pem_ray.graph.dense import DenseGraph, build_dense_graph
from igpm_pem_ray.state import checkpoint as ckpt

_LBL_BITS = 31  # dense labels < 2^31 (asserted at graph build)


def _lp_round(g, labels: np.ndarray) -> np.ndarray:
    """One synchronous round on the fast path: per-partition packed
    (dst,label) counts (lp_count_pass), then a vectorized distributed-
    deterministic argmax — maximize (count, -label) by packing both
    into one int64 key and np.maximum.at per dst."""
    from igpm_pem_ray.graph.dense import lp_count_pass

    mask = (1 << _LBL_BITS) - 1
    codes, counts = lp_count_pass(g, labels, lbl_bits=_LBL_BITS)
    new = labels.copy()
    if not len(codes):  # no edges -> no label updates
        return new
    dst = (codes >> _LBL_BITS).astype(np.int64)
    lab = (codes & mask).astype(np.int64)
    key = (counts << _LBL_BITS) | (mask - lab)
    best = np.full(len(labels), -1, dtype=np.int64)
    np.maximum.at(best, dst, key)
    got = best >= 0
    new[got] = mask - (best[got] & mask)
    return new


def label_propagation_dense(g: DenseGraph, *, max_rounds: int = 20,
                            checkpoint_dir: str | None = None,
                            checkpoint_every: int = 5, resume: bool = False,
                            stats: dict | None = None) -> np.ndarray:
    V = g.num_vertices
    labels = np.arange(V, dtype=np.int64)
    params = {"kernel": "lp", "V": V, "E": g.num_edges, "max_rounds": max_rounds}
    start = 0
    if resume and checkpoint_dir:
        found = ckpt.latest_checkpoint(checkpoint_dir, params)
        if found is not None:
            start, _, labels, _ = found
            labels = np.asarray(labels, dtype=np.int64)
    t0 = time.perf_counter()
    rounds = start
    for k in range(start, max_rounds):
        new = _lp_round(g, labels)
        changed = int((new != labels).sum())
        labels = new
        rounds = k + 1
        if checkpoint_dir and (rounds % checkpoint_every == 0 or changed == 0):
            ckpt.save_vector(checkpoint_dir, rounds, g.vids, labels,
                             metric_name="changed", metric_value=changed,
                             params=params)
        if changed == 0:
            break
    if stats is not None:
        stats.update({"rounds": rounds, "wall_sec": time.perf_counter() - t0})
    return labels


def label_propagation(edges_ds, *, max_rounds: int = 20,
                      checkpoint_dir: str | None = None, resume: bool = False,
                      stats: dict | None = None) -> pa.Table:
    """edges -> (vid, label) with label = raw vid of the winning
    community representative (deterministic)."""
    g = build_dense_graph(edges_ds, symmetric=True)
    labels = label_propagation_dense(g, max_rounds=max_rounds,
                                     checkpoint_dir=checkpoint_dir,
                                     resume=resume, stats=stats)
    return pa.table({"vid": g.vids, "label": g.vids[labels]})


def expand_to_communities(labels_tbl: pa.Table, affected_vids) -> np.ndarray:
    """The reference's get_seeds community expansion
    (incremental/query_call.py:168-177): all vertices sharing a label
    with any affected vertex."""
    import pyarrow.compute as pc

    aff = pa.array(np.asarray(affected_vids))
    hit_labels = pc.unique(labels_tbl.filter(pc.is_in(labels_tbl["vid"], value_set=aff))["label"])
    out = labels_tbl.filter(pc.is_in(labels_tbl["label"], value_set=hit_labels))["vid"]
    return out.to_numpy(zero_copy_only=False)
