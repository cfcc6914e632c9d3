"""kNN label-agreement — mislabeled-example detection over an
embedding table: for every vector, how many of its k nearest
neighbors carry the SAME label (low agreement flags probable label
noise; the classic editing rule of Wilson 1972 / the "noisy label"
filters modern dataset-curation pipelines run before training).

Exactness across engines: embeddings go to e6 fixed point FIRST and
squared-L2 distances are computed on those integers — every product
and sum stays far below 2^53, so the float64 matmul is bit-exact
integer arithmetic and the (d2, vec_id) neighbor ranking admits no
float tie ambiguity against the SQL oracle.

Scale shape: this is the brute-force BASELINE path — the candidate
set is broadcast once (``ray.put``) and every block computes one
vectorized (block x n_cand) distance matrix + per-row top-k, then
per-label integer partials -> one O(labels) groupby.  It is exact and
right while the candidate set fits a worker (the same envelope as
``knn.brute_force_topk``); at corpus scale the LSH/IVF-bucketed
variants (ann/knn.py) bound the candidate set per bucket and this
kernel runs unchanged inside each bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ray.data.aggregate import Sum


def _e6_matrix(b: pa.Table) -> np.ndarray:
    flat = b["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False)
    d = len(flat) // max(b.num_rows, 1)
    x = np.floor(flat.astype(np.float64) * 1e6 + 0.5)
    return x.reshape(b.num_rows, d)


def knn_label_agreement(emb_ds, *, k: int = 5):
    """-> Dataset (label, n_vecs, agree_sum, n_flagged): per label,
    the number of vectors, the total same-label neighbors among each
    vector's k nearest (excluding itself; ties broken by vec_id), and
    how many vectors have majority disagreement (2*agree < k)."""
    emb_ds = emb_ds.materialize()

    def cand(b: pa.Table) -> pa.Table:
        return pa.table({"vec_id": b["vec_id"].cast(pa.int64()),
                         "label": b["label"].cast(pa.int64()),
                         "e": pa.array(_e6_matrix(b).tolist(),
                                       pa.list_(pa.float64()))})

    rows = emb_ds.map_batches(cand, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    c_ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    c_lab = np.asarray([r["label"] for r in rows], dtype=np.int64)
    c_mat = np.asarray([r["e"] for r in rows], dtype=np.float64)
    bcast = ray.put((c_ids, c_lab, c_mat,
                     np.square(c_mat).sum(axis=1)))

    def agree(b: pa.Table) -> pa.Table:
        ids2, lab2, m2, n2 = ray.get(bcast)
        x = _e6_matrix(b)
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return pa.table({"label": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64()),
                             "agree_sum": pa.array([], pa.int64()),
                             "n_flagged": pa.array([], pa.int64())})
        # exact integer squared-L2 in float64 (all terms << 2^53)
        d2 = (np.square(x).sum(1)[:, None] - 2.0 * (x @ m2.T)
              + n2[None, :])
        d2[ids[:, None] == ids2[None, :]] = np.inf  # exclude self
        kk = min(k, d2.shape[1] - 1)
        ag = np.empty(len(ids), dtype=np.int64)
        for i in range(len(ids)):
            top = np.lexsort((ids2, d2[i]))[:kk]
            ag[i] = int((lab2[top] == lab[i]).sum())
        import pandas as pd

        g = pd.DataFrame({"label": lab, "a": ag,
                          "f": (2 * ag < k).astype(np.int64)}) \
            .groupby("label").agg(n_vecs=("a", "size"),
                                  agree_sum=("a", "sum"),
                                  n_flagged=("f", "sum")).reset_index()
        return pa.table({"label": g["label"].to_numpy().astype(np.int64),
                         "n_vecs": g["n_vecs"].to_numpy().astype(np.int64),
                         "agree_sum": g["agree_sum"].to_numpy()
                         .astype(np.int64),
                         "n_flagged": g["n_flagged"].to_numpy()
                         .astype(np.int64)})

    return emb_ds.map_batches(agree, batch_format="pyarrow") \
        .groupby("label").aggregate(
            Sum("n_vecs", alias_name="n_vecs"),
            Sum("agree_sum", alias_name="agree_sum"),
            Sum("n_flagged", alias_name="n_flagged"))
