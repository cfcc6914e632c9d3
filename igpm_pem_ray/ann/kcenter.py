"""Greedy k-center (Gonzalez) diversity sampling over an embedding
column — the coreset-selection operator training-data curation uses to
pick a maximally-spread subset (dedup keeps one of each near-identical
group; k-center additionally covers the SPACE: every point ends within
the returned radius of a chosen center; the greedy is the classic
2-approximation, Gonzalez 1985).

Scale shape: k rounds, each ONE pass — the current center matrix
(k x d, tiny) is broadcast into a stateless map_batches; every block
reduces to a single (candidate id, distance, vector) row (O(blocks)
rows and one d-vector each to the driver per round; the winner's
vector rides along, so no second fetch pass), the driver takes the
global argmax with a deterministic (dist desc, vec_id asc) tie-break.
No pairwise matrix, no row data beyond the per-block candidate ever
leaves the object store; cost is k passes of one vectorized
(n_block x k) matmul each.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _block_vecs(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = b["vec_id"].to_numpy(zero_copy_only=False)
    col = b["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    d = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), d).astype(np.float64)


_EMPTY = pa.table({"vec_id": pa.array([], pa.int64()),
                   "d2": pa.array([], pa.float64()),
                   "v": pa.array([], pa.list_(pa.float64()))})


def kcenter_sample(emb_ds, k: int):
    """-> pyarrow Table (sel_order, vec_id, dist_e6): the k greedy
    centers in selection order; ``dist_e6`` is each center's distance
    to the previously-selected set (the coverage radius AFTER i
    centers is row i+1's dist).  Seeded deterministically at the
    minimum vec_id; squared-L2 geometry, e6 half-up fixed point on
    the reported (not compared) distances."""
    emb_ds = emb_ds.materialize()

    def seed(b: pa.Table) -> pa.Table:
        ids, x = _block_vecs(b)
        if not len(ids):
            return _EMPTY
        i = int(np.argmin(ids))
        return pa.table({"vec_id": [int(ids[i])], "d2": [0.0],
                         "v": [x[i].tolist()]})

    rows = emb_ds.map_batches(seed, batch_format="pyarrow").take_all()
    first = min(rows, key=lambda r: r["vec_id"])
    centers = [(int(first["vec_id"]),
                np.asarray(first["v"], np.float64), 0.0)]

    for _ in range(1, k):
        cmat = np.stack([c[1] for c in centers])

        def far(b: pa.Table, _c=cmat) -> pa.Table:
            ids, x = _block_vecs(b)
            if not len(ids):
                return _EMPTY
            # squared L2 to nearest center: |x|^2 - 2 x.c + |c|^2
            d2 = (np.square(x).sum(1)[:, None]
                  - 2.0 * x @ _c.T
                  + np.square(_c).sum(1)[None, :]).min(axis=1)
            # per-block best candidate: max dist, min id tie-break
            best = int(np.lexsort((ids, -d2))[0])
            return pa.table({"vec_id": [int(ids[best])],
                             "d2": [float(d2[best])],
                             "v": [x[best].tolist()]})

        cands = emb_ds.map_batches(far, batch_format="pyarrow").take_all()
        best = min(cands, key=lambda r: (-r["d2"], r["vec_id"]))
        centers.append((int(best["vec_id"]),
                        np.asarray(best["v"], np.float64),
                        float(np.sqrt(max(best["d2"], 0.0)))))

    return pa.table({
        "sel_order": np.arange(len(centers), dtype=np.int64),
        "vec_id": np.asarray([c[0] for c in centers], dtype=np.int64),
        "dist_e6": np.floor(np.asarray([c[2] for c in centers]) * 1e6
                            + 0.5).astype(np.int64)})
