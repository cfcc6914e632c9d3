"""Deterministic random-walk corpus generation (DeepWalk/node2vec
input shape).

Walks are RNG-free so two engines can reproduce them bit for bit: at
step k, walker w standing on v moves to its
``((w mod 2^31-1) * 1000003 + k * 7919) mod deg(v)``-th undirected
neighbor in ascending-vid order (the walker id is reduced mod 2^31-1
BEFORE the multiply so the product never wraps int64 for hashed
63-bit vids — numpy would wrap silently while DuckDB raises; the
reduction is written identically in both engines) — an affine per-(walker, step) hash, the same
determinism convention as the train/val split
(`relational.q_train_val_split`).  For embedding training you'd swap
the hash for a seeded RNG; the plan shape is identical.

Plan (all Dataset-resident — the walker frontier never sits on the
driver): the indexed neighbor table (src, r, dst) and the degree
table are built ONCE via `stages/ranked.rank_per_group` (sort + block
ranks + boundary offsets) and materialized; each step is then one
hash join of the walker state against the degree table (pick the
hashed index) plus one against the neighbor table on (v, r) — the
standard distributed-walk shape (two shuffles per step, walk length
is small and fixed).  At web scale the neighbor table is the
hub-split edge table and the join key is salted like any other
hot-key join (stages/partition).

No reference analog (the reference has no sampling walks —
SURVEY.md section 2); DeepWalk: Perozzi et al., KDD 2014.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Count, Min

_W_MUL = 1_000_003
_K_MUL = 7_919
_M31 = (1 << 31) - 1  # pre-reduce walker ids: no int64 wrap at 63-bit vids


def indexed_neighbors(edges, *, num_partitions: int = 8):
    """Distinct undirected neighbors with 0-based ascending-vid rank:
    (Dataset(src, dst, r), Dataset(dsrc, deg)) — both materialized."""
    def both(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.concatenate([s, d]),
                         "dst": np.concatenate([d, s])})

    from igpm_pem_ray.stages.ranked import rank_per_group

    ue = edges.map_batches(both, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby(["src", "dst"]).aggregate(Min("dst", alias_name="_m")) \
        .drop_columns(["_m"])
    ranked = rank_per_group(ue, key="src", order=["dst"],
                            descending=[False])

    def shift(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False) - 1
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "r": r.astype(np.int64)})

    nbr = ranked.map_batches(shift, batch_format="pyarrow").materialize()
    deg = nbr.groupby("src").aggregate(Count(alias_name="deg")) \
        .rename_columns({"src": "dsrc"}).materialize()
    return nbr, deg


def random_walks(edges, *, walk_len: int, num_partitions: int = 8):
    """Dataset(walker, step, vid): one walk per graph vertex, steps
    0..walk_len (step 0 = the start vertex itself)."""
    nbr, deg = indexed_neighbors(edges, num_partitions=num_partitions)
    # ray 2.49 hash joins break on a partition whose LEFT side got zero
    # blocks (schema-less table inside Acero): collapse to one
    # partition for tiny graphs so no partition can be left-empty
    V = deg.count()
    if V < 64 * num_partitions:
        num_partitions = 1
    state = deg.map_batches(
        lambda b: pa.table({"walker": b["dsrc"], "v": b["dsrc"]}),
        batch_format="pyarrow").materialize()

    def stamp(step: int):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "walker": b["walker"],
                "step": pa.array(np.full(b.num_rows, step, np.int64)),
                "vid": b["v"]})
        return f

    outs = [state.map_batches(stamp(0), batch_format="pyarrow")]
    for k in range(1, walk_len + 1):
        withdeg = state.join(deg, join_type="inner",
                             num_partitions=num_partitions,
                             on=("v",), right_on=("dsrc",))

        def pick(b: pa.Table, _k=k) -> pa.Table:
            w = b["walker"].to_numpy(zero_copy_only=False)
            dg = b["deg"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            i = ((w % _M31) * _W_MUL + _k * _K_MUL) % dg
            return pa.table({"walker": w, "v": v, "i": i.astype(np.int64)})

        chosen = withdeg.map_batches(pick, batch_format="pyarrow")
        state = chosen.join(nbr, join_type="inner",
                            num_partitions=num_partitions,
                            on=("v", "i"), right_on=("src", "r")) \
            .map_batches(lambda b: pa.table({"walker": b["walker"],
                                             "v": b["dst"]}),
                         batch_format="pyarrow").materialize()
        outs.append(state.map_batches(stamp(k), batch_format="pyarrow"))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
