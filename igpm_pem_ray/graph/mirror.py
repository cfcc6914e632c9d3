"""Mirror detection — vertex pairs with near-identical neighbor sets
(structural equivalence).  The classic web-graph use is mirror-site /
alias-host discovery: two hosts whose outlink-target sets overlap
almost completely are mirrors of one another (Bharat & Broder,
WWW8 1999 "mirror detection on the web"); the same kernel over a
bipartite relation finds entities with near-identical link profiles
(suppliers sharing a part catalog, users sharing an item set).

Reference tie-in: IGPM-PEM has no mirror operator; this generalizes
its neighbor-set machinery (``patternmatching/graph/...`` adjacency
lookups) into a set-similarity self-join, the missing dedup primitive
for a link graph.

Scale shape (the `q_jaccard_pairs` inverted-index plan, applied to
adjacency instead of shingles): the input (v, n) adjacency rows are
already the exploded inverted index — a hash self-join on the
neighbor column yields one row per co-neighbored ordered pair, a
groupby counts |A∩B|, two hash joins attach |A| and |B|, and one
stateless map computes Jaccard.  Cost is Σ_n indeg(n)² over the
*neighbor* side; at web scale hub targets (a neighbor linked by
millions of hosts) dominate, so callers cut them with
``max_neighbor_indeg`` — the standard document-frequency cut: the
metric becomes Jaccard over the discriminative (rare) neighbors,
which is exactly what mirror detection wants (everyone links to the
hub; it carries no signal).  The cut is part of the operator's
definition, so the SQL oracle applies the identical cut.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Count


def neighbor_jaccard_pairs(adj_ds, *, min_jaccard_e6: int = 500_000,
                           max_neighbor_indeg: int | None = None,
                           num_partitions: int = 8):
    """Vertex pairs whose neighbor sets have Jaccard >= threshold.

    ``adj_ds``: Dataset of DISTINCT (v, n) adjacency rows; ``v`` may be
    int64 or string (host names join fine).  Returns a Dataset of
    (v_a, v_b, c, n_a, n_b, jaccard_e6), v_a < v_b, where c = |A∩B|
    and n_a/n_b are the (post-cut) neighbor-set sizes — the raw
    integers ride along so downstream can re-threshold without a
    recompute.  jaccard_e6 = floor(c*1e6/(n_a+n_b-c)+0.5), the repo's
    half-up fixed-point convention (identical in the SQL oracles).
    """
    # normalize blocks to Arrow (rename_columns projections below
    # require Arrow blocks; callers may hand in pandas-block Datasets)
    adj_ds = adj_ds.map_batches(lambda t: t.select(["v", "n"]),
                                batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    # tiny inputs collapse the hash joins to one partition (the Ray
    # 2.49 zero-block hash-join pitfall, same guard as msf_shuffle)
    num_partitions = 1 if adj_ds.count() < 65_536 else num_partitions
    if max_neighbor_indeg is not None:
        indeg = adj_ds.groupby("n").aggregate(Count(alias_name="_id"))
        keep = indeg.filter(
            expr=f"_id <= {int(max_neighbor_indeg)}").drop_columns(["_id"])
        adj_ds = adj_ds.join(keep.rename_columns({"n": "_n"}),
                             join_type="inner",
                             num_partitions=num_partitions,
                             on=("n",), right_on=("_n",)) \
            .select_columns(["v", "n"]).materialize()

    sizes = adj_ds.groupby("v").aggregate(Count(alias_name="sz"))
    a = adj_ds.rename_columns({"v": "v_a"})
    b = adj_ds.rename_columns({"v": "v_b", "n": "n2"})
    j = a.join(b, join_type="inner", num_partitions=num_partitions,
               on=("n",), right_on=("n2",))

    def ordered(t: pa.Table) -> pa.Table:
        va = t["v_a"].to_numpy(zero_copy_only=False)
        vb = t["v_b"].to_numpy(zero_copy_only=False)
        keep = va < vb
        return pa.table({"v_a": va[keep], "v_b": vb[keep]})

    inter = j.map_batches(ordered, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["v_a", "v_b"]).aggregate(Count(alias_name="c"))
    sa = sizes.rename_columns({"v": "_va", "sz": "n_a"})
    sb = sizes.rename_columns({"v": "_vb", "sz": "n_b"})
    full = inter.join(sa, join_type="inner", num_partitions=num_partitions,
                      on=("v_a",), right_on=("_va",)) \
                .join(sb, join_type="inner", num_partitions=num_partitions,
                      on=("v_b",), right_on=("_vb",))

    def jac(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = t["n_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["n_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        e6 = np.floor(c.astype(np.float64) * 1e6 / (na + nb - c)
                      + 0.5).astype(np.int64)
        keep = e6 >= min_jaccard_e6
        cols = {"v_a": t["v_a"].to_numpy(zero_copy_only=False)[keep],
                "v_b": t["v_b"].to_numpy(zero_copy_only=False)[keep],
                "c": c[keep], "n_a": na[keep], "n_b": nb[keep],
                "jaccard_e6": e6[keep]}
        return pa.table(cols)

    return full.map_batches(jac, batch_format="pyarrow",
                            zero_copy_batch=True)
