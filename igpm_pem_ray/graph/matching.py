"""Bounded-round greedy maximal matching — edge-centric Luby-style
symmetry breaking, fully Dataset-resident.

Each round every live edge draws a deterministic hash priority; an
edge joins the matching iff it is the (priority, src, dst)-lexic
minimum among the live edges at BOTH endpoints (the edge-local
analogue of Luby's MIS rule — Israeli-Itai 1986 style symmetry
breaking), then all edges touching a matched vertex die.  The
(src, dst) tie-break makes the per-vertex order total, so two edges
can never both claim a vertex.

Everything is Dataset-resident: per round one incidence map (each
edge emits two rows), one per-vertex rank (stages/ranked.py sorted-
block ranker — no per-group Python), two semi-joins to intersect the
endpoint choices, and two anti-joins for the kill wave.  Per-round
state is the live-edge Dataset itself — the same 10^12-edge shape as
the shuffle kernels; no V- or E-sized driver array anywhere.

No reference analog (SURVEY.md section 2); matching is the classic
edge-scheduling / dedup-pairing primitive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_A, _B, _C, _M = 1_103_515_245, 69_069, 12_345, (1 << 31) - 1


def _with_pri(round_no: int):
    def f(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        # mod-_M pre-reduction keeps the multiply overflow-free at any
        # vid magnitude and matches DuckDB BIGINT semantics exactly
        pri = ((s % _M) * _A + (d % _M) * _B + round_no * _C) % _M
        return pa.table({"src": s, "dst": d, "pri": pri})
    return f


def _incidence(b: pa.Table) -> pa.Table:
    s = b["src"].to_numpy(zero_copy_only=False)
    d = b["dst"].to_numpy(zero_copy_only=False)
    p = b["pri"].to_numpy(zero_copy_only=False)
    return pa.table({"v": np.concatenate([s, d]),
                     "pri": np.concatenate([p, p]),
                     "src": np.concatenate([s, s]),
                     "dst": np.concatenate([d, d])})


def maximal_matching(edges, *, rounds: int = 2, num_partitions: int = 4):
    """(src, dst, round) matched-edge Dataset after `rounds` rounds of
    the deterministic greedy rule over a simple undirected edge table
    (canonical src<dst, no duplicates, no self-loops).  More rounds →
    closer to maximal; the SQL oracle unrolls the same rounds."""
    from igpm_pem_ray.stages.ranked import rank_per_group

    live = edges
    won = []
    for r in range(1, rounds + 1):
        pe = live.map_batches(_with_pri(r), batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
        # ray 2.49 hash joins break on a partition with zero blocks
        # (schema-less table inside Acero, see graph/walks.py): collapse
        # to one partition while the live set is small
        if pe.count() < 64 * num_partitions:
            num_partitions = 1
        inc = pe.map_batches(_incidence, batch_format="pyarrow",
                             zero_copy_batch=True)
        ranked = rank_per_group(inc, key="v",
                                order=["pri", "src", "dst"],
                                descending=[False, False, False])

        def choice(b: pa.Table) -> pa.Table:
            keep = b["rank"].to_numpy(zero_copy_only=False) == 1
            return pa.table({
                "src": b["src"].to_numpy(zero_copy_only=False)[keep],
                "dst": b["dst"].to_numpy(zero_copy_only=False)[keep]})

        # an edge chosen by BOTH endpoints appears in exactly two
        # rank-1 rows (one per incidence side): a (src, dst) groupby
        # count == 2 finds winners with no join at all — and therefore
        # no empty-partition hash-join hazard
        from ray.data.aggregate import Count
        winners = ranked.map_batches(choice, batch_format="pyarrow",
                                     zero_copy_batch=True) \
            .groupby(["src", "dst"]).aggregate(Count(alias_name="nc")) \
            .map_batches(lambda b: b.filter(
                pa.compute.equal(b["nc"], 2)).select(["src", "dst"]),
                batch_format="pyarrow") \
            .materialize()
        if winners.count() == 0:
            continue
        won.append(winners.map_batches(
            lambda b, _r=r: pa.table({
                "src": b["src"], "dst": b["dst"],
                "round": pa.array(np.full(b.num_rows, _r, np.int64))}),
            batch_format="pyarrow"))
        mv = winners.map_batches(
            lambda b: pa.table({"mv": np.concatenate([
                b["src"].to_numpy(zero_copy_only=False),
                b["dst"].to_numpy(zero_copy_only=False)])}),
            batch_format="pyarrow").materialize()
        np_kill = 1 if mv.count() < 64 * num_partitions else num_partitions
        live = pe.join(mv, join_type="left_anti",
                       num_partitions=np_kill,
                       on=("src",), right_on=("mv",)) \
            .join(mv, join_type="left_anti",
                  num_partitions=np_kill,
                  on=("dst",), right_on=("mv",)) \
            .select_columns(["src", "dst"]).materialize()
    out = won[0]
    for w in won[1:]:
        out = out.union(w)
    return out


def matching_oracle(edges: list[tuple[int, int]], rounds: int = 2):
    """Plain-Python replay of the identical per-round rule (dict scans)
    — the independent test oracle."""
    live = sorted(set(edges))
    matched = []
    for r in range(1, rounds + 1):
        pri = {(s, d): ((s % _M) * _A + (d % _M) * _B + r * _C) % _M
               for s, d in live}
        best: dict[int, tuple] = {}
        for s, d in live:
            key = (pri[(s, d)], s, d)
            for v in (s, d):
                if v not in best or key < best[v]:
                    best[v] = key
        win = [(s, d) for s, d in live
               if best[s] == (pri[(s, d)], s, d) == best[d]]
        matched += [(s, d, r) for s, d in win]
        dead = {v for s, d in win for v in (s, d)}
        live = [(s, d) for s, d in live
                if s not in dead and d not in dead]
    return matched
