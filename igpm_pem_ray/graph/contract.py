"""Graph contraction (quotient / coarsened graph): map each vertex to
a group id and collapse edges to weighted group-pair edges.

Reference context: the reference collapses multigraphs to simple
graphs before invariants (/root/reference/patternmatching/gray/
incremental/gray_incremental.py:193-202); contraction is the general
form — collapse by ANY vertex partition (host from URL, community
from label propagation, cluster from k-core...), the standard web-
graph coarsening step.

Two strategies:

- ``broadcast`` (mapping <= BROADCAST_MAX_MAPPING rows): the mapping
  is pulled once, ray.put as two sorted arrays, and every edge block
  translates via searchsorted inside one ``map_batches`` — the
  small-side-lookup pattern (no shuffle join for the translate).
- ``join``: two hash joins edges⋈mapping (src, then dst) for mappings
  too large to broadcast — fully Dataset-resident.

Both end in one groupby-count over canonical group pairs (the single
unavoidable shuffle).  Self-pairs (both endpoints in one group) are
kept as (g, g) rows — dropping them is a trivial post-filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Count

BROADCAST_MAX_MAPPING = 20_000_000  # rows; two int64 arrays ~320MB


def contract(edges_ds, mapping_ds, *, vid_col: str = "vid",
             group_col: str = "group", strategy: str = "auto",
             num_partitions: int = 16,
             directed: bool = False):
    """edges Dataset (src, dst) × mapping Dataset (vid_col, group_col)
    -> Dataset (src_group, dst_group, n_edges).

    Edges whose endpoint is missing from the mapping are dropped
    (inner-join semantics, both strategies).  directed=False
    canonicalizes each group pair to (min, max) before counting."""
    if strategy == "auto":
        strategy = "broadcast" \
            if mapping_ds.count() <= BROADCAST_MAX_MAPPING else "join"

    if strategy == "broadcast":
        mpdf = mapping_ds.select_columns([vid_col, group_col]).to_pandas()
        vids = mpdf[vid_col].to_numpy().astype(np.int64)
        grps = mpdf[group_col].to_numpy()  # int or string group ids
        order = np.argsort(vids, kind="stable")
        vref = ray.put(vids[order])
        gref = ray.put(grps[order])

        def translate(batch: pa.Table) -> pa.Table:
            mv = ray.get(vref)
            mg = ray.get(gref)
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            ps = np.searchsorted(mv, s)
            pd_ = np.searchsorted(mv, d)
            np.clip(ps, 0, len(mv) - 1, out=ps)
            np.clip(pd_, 0, len(mv) - 1, out=pd_)
            ok = (mv[ps] == s) & (mv[pd_] == d) if len(mv) else \
                np.zeros(len(s), dtype=bool)
            gs = mg[ps[ok]]
            gd = mg[pd_[ok]]
            if not directed:
                swap = gs > gd  # elementwise; numeric AND string groups
                gs, gd = np.where(swap, gd, gs), np.where(swap, gs, gd)
            return pa.table({"src_group": pa.array(gs),
                             "dst_group": pa.array(gd)})

        translated = edges_ds.map_batches(translate, batch_format="pyarrow",
                                          zero_copy_batch=True)
    else:
        m_src = mapping_ds.select_columns([vid_col, group_col]) \
            .rename_columns({vid_col: "_sv", group_col: "src_group"})
        m_dst = mapping_ds.select_columns([vid_col, group_col]) \
            .rename_columns({vid_col: "_dv", group_col: "dst_group"})
        j = edges_ds.select_columns(["src", "dst"]) \
            .join(m_src, join_type="inner", num_partitions=num_partitions,
                  on=("src",), right_on=("_sv",)) \
            .join(m_dst, join_type="inner", num_partitions=num_partitions,
                  on=("dst",), right_on=("_dv",))

        def canon(batch: pa.Table) -> pa.Table:
            gs = batch["src_group"].to_numpy(zero_copy_only=False)
            gd = batch["dst_group"].to_numpy(zero_copy_only=False)
            if not directed:
                swap = gs > gd
                gs, gd = np.where(swap, gd, gs), np.where(swap, gs, gd)
            return pa.table({"src_group": pa.array(gs),
                             "dst_group": pa.array(gd)})

        translated = j.map_batches(canon, batch_format="pyarrow",
                                   zero_copy_batch=True)

    return translated.groupby(["src_group", "dst_group"]) \
        .aggregate(Count(alias_name="n_edges"))
