"""Distributed subgraph pattern matching (kernels K5/K6 re-expressed).

Reference analog: G-Ray best-effort matching
(/root/reference/patternmatching/gray/gray_multiple.py:76-489) with
EXTRACT <=3-hop path bridging (gray/extract.py:12,30-109), seeded by a
label scan (query/Condition.py:160-171) and deduplicated by graph
equality (gray_multiple.py:16-37).

Ray-Data-first re-expression: instead of per-seed recursive expansion
with RWR-ranked candidates, the matcher runs a BFS-JOIN — the
partial-match table is a Dataset with one vid column per bound query
symbol, and each query edge is one hash join against the (label-
filtered) edge relation:

    partials(a, ...) |X| edges(u, v)  on a = u    -> bind b = v
    partials(a, b)   |X| edges(u, v)  on (a, b)   -> existence check

``--path`` edges join against a <=3-hop simple-path closure built from
2 chained edge self-joins (MAX_LENGTH = 3, matching extract.py:12);
path intermediates join the result vertex set like the reference's
bridged paths.  Injectivity and label-candidate filtering are
vectorized map_batches; final dedup collapses matches with equal
vertex SETS — exactly the reference's equal_graphs result semantics
(its golden cases in /root/reference/query_test.py list answers as vid
sets).

Divergence, by design: G-Ray is best-effort/approximate (RWR-ranked
argmax candidates, time budgets); this matcher enumerates EXACT
matches, a superset on the reference's own golden cases.  The RWR
ranking survives as the standalone ``rwr`` kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from igpm_pem_ray.functions.conditions import compile_condition
from igpm_pem_ray.match.query import Query

MAX_PATH_LEN = 3  # reference extract.py:12


def _np(t: pa.Table, c: str) -> np.ndarray:
    return t[c].to_numpy(zero_copy_only=False)


class SubgraphMatcher:
    """vertices_ds: (vid, label[, props...]); edges_ds: (src, dst[,
    key, label]).  Small-graph metadata (per-label candidate vid sets,
    per-prop dicts) is broadcast via ray.put; at web scale those
    filters become semi-joins against the vertices Dataset — the join
    loop itself is already Dataset-shaped."""

    def __init__(self, vertices_ds, edges_ds, *, num_partitions: int = 4) -> None:
        self.vertices = vertices_ds
        self.edges = edges_ds
        self.num_partitions = num_partitions
        vp = vertices_ds.to_pandas()
        self._labels = dict(zip(vp["vid"], vp.get("label", "")))
        self._props = {c: dict(zip(vp["vid"], vp[c]))
                       for c in vp.columns if c not in ("vid", "label")}
        self._vp = vp

    # ---- relations ----

    def _edge_rel(self, label: str, directed: bool):
        """(u, v) Dataset for one query edge; empty label = wildcard
        (reference Condition.py:120-125)."""
        ds = self.edges
        if label:
            ds = ds.filter(expr=f"label == '{label}'")

        def proj(b: pa.Table) -> pa.Table:
            u = _np(b, "src")
            v = _np(b, "dst")
            if not directed:
                u, v = np.concatenate([u, v]), np.concatenate([v, u])
            return pa.table({"u": u.astype(np.int64), "v": v.astype(np.int64)})

        return ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)

    def _path_rel(self, label: str, directed: bool):
        """<=3-hop simple-path closure: (u, v, i1, i2), -1 = absent."""
        e = self._edge_rel(label, directed).materialize()

        def hop1(b: pa.Table) -> pa.Table:
            keep = _np(b, "u") != _np(b, "v")
            return pa.table({"u": _np(b, "u")[keep], "v": _np(b, "v")[keep],
                             "i1": np.full(keep.sum(), -1, dtype=np.int64),
                             "i2": np.full(keep.sum(), -1, dtype=np.int64)})

        p1 = e.map_batches(hop1, batch_format="pyarrow", zero_copy_batch=True)

        def extend(p_ds, n_inter: int):
            right = e.map_batches(
                lambda b: pa.table({"m_": b["u"], "w_": b["v"]}),
                batch_format="pyarrow", zero_copy_batch=True)
            j = p_ds.join(right, join_type="inner",
                          num_partitions=self.num_partitions,
                          on=("v",), right_on=("m_",))

            def simple(b: pa.Table) -> pa.Table:
                u, v, w = _np(b, "u"), _np(b, "v"), _np(b, "w_")
                i1 = _np(b, "i1")
                keep = (w != u) & (w != v) & (w != i1)
                new_i1 = np.where(i1[keep] >= 0, i1[keep], v[keep])
                new_i2 = np.where(i1[keep] >= 0, v[keep], -1)
                return pa.table({"u": u[keep], "v": w[keep],
                                 "i1": new_i1.astype(np.int64),
                                 "i2": new_i2.astype(np.int64)})

            return j.map_batches(simple, batch_format="pyarrow", zero_copy_batch=True)

        p2 = extend(p1, 1).materialize()
        p3 = extend(p2, 2)
        return p1.union(p2, p3)

    # ---- candidate sets ----

    def _candidates(self, q: Query, sym: str) -> np.ndarray | None:
        lbl = q.vertex_labels.get(sym)
        if lbl is None:
            return None
        return np.sort(np.array([v for v, l in self._labels.items() if l == lbl],
                                dtype=np.int64))

    # ---- main ----

    def match(self, q: Query) -> pd.DataFrame:
        """-> one row per distinct match; columns = sym vids + path
        intermediate columns ``_p_{name}_{k}`` (-1 = unused)."""
        order = self._plan(q)
        bound: list[str] = []
        inter_cols: list[str] = []
        first = order[0].a if order else (q.syms[0] if q.syms else None)
        if first is None:
            return pd.DataFrame()
        cand = self._candidates(q, first)
        if cand is None:
            cand = np.sort(self._vp["vid"].to_numpy().astype(np.int64))
        partials = ray.data.from_arrow(pa.table({first: pa.array(cand)}))
        bound.append(first)

        for qe in order:
            a_bound, b_bound = qe.a in bound, qe.b in bound
            rel = (self._path_rel(qe.label, q.directed) if qe.is_path
                   else self._edge_rel(qe.label, q.directed))
            rel_cols = ["u", "v"] + (["i1", "i2"] if qe.is_path else [])
            suffix = f"_{qe.name}"
            ren = {c: c + suffix for c in rel_cols}
            rel = rel.map_batches(
                lambda b, ren=ren: pa.table({ren[c]: b[c] for c in ren}),
                batch_format="pyarrow", zero_copy_batch=True)
            u, v = "u" + suffix, "v" + suffix

            if partials.count() == 0:
                return pd.DataFrame(columns=bound + inter_cols)
            if a_bound and b_bound:
                j = partials.join(rel, join_type="inner",
                                  num_partitions=self.num_partitions,
                                  on=(qe.a, qe.b), right_on=(u, v))
            elif a_bound or b_bound:
                src_sym, dst_sym = (qe.a, qe.b) if a_bound else (qe.b, qe.a)
                key = u if a_bound else v
                j = partials.join(rel, join_type="inner",
                                  num_partitions=self.num_partitions,
                                  on=(src_sym,), right_on=(key,))
                newcol = v if a_bound else u
                j = self._bind(j, q, dst_sym, newcol, bound, inter_cols)
                bound.append(dst_sym)
            else:
                raise ValueError(f"query edge {qe.name} disconnected from bound syms")
            if qe.is_path:
                j = self._accept_inters(j, f"i1{suffix}", f"i2{suffix}",
                                        qe.name, bound, inter_cols)
                inter_cols += [f"_p_{qe.name}_1", f"_p_{qe.name}_2"]
            keep_cols = bound + inter_cols
            j = j.map_batches(
                lambda b, kc=tuple(keep_cols): pa.table({c: b[c] for c in kc}),
                batch_format="pyarrow", zero_copy_batch=True)
            # parallel edges create duplicate partial rows: collapse
            partials = j.materialize()

        pdf = partials.to_pandas().drop_duplicates()
        pdf = self._apply_condition(q, pdf)
        return self._dedup_sets(pdf, [s for s in pdf.columns if not s.startswith("_p_")],
                                inter_cols)

    def _plan(self, q: Query):
        """Edge order: always extend from already-bound syms (the
        reference picks the next query edge among touched syms,
        gray_multiple.py:215-258)."""
        remaining = list(q.edges)
        if not remaining:
            return []
        ordered = [remaining.pop(0)]
        bound = {ordered[0].a, ordered[0].b}
        while remaining:
            for i, e in enumerate(remaining):
                if e.a in bound or e.b in bound:
                    ordered.append(remaining.pop(i))
                    bound |= {e.a, e.b}
                    break
            else:
                raise ValueError("disconnected query graph")
        return ordered

    def _bind(self, j, q: Query, sym: str, col: str, bound, inter_cols):
        cand = self._candidates(q, sym)
        cand_ref = ray.put(cand)
        # snapshot: map_batches closures run LAZILY, after the caller
        # has mutated these lists for later steps
        bound = tuple(bound)
        inter_cols = tuple(inter_cols)

        def f(b: pa.Table) -> pa.Table:
            vals = _np(b, col).astype(np.int64)
            keep = np.ones(len(vals), dtype=bool)
            cset = ray.get(cand_ref)
            if cset is not None:
                if len(cset) == 0:
                    keep[:] = False
                else:
                    pos = np.minimum(np.searchsorted(cset, vals), len(cset) - 1)
                    keep &= cset[pos] == vals
            for s in bound:            # injectivity
                keep &= vals != _np(b, s)
            for ic in inter_cols:      # distinct from path intermediates
                iv = _np(b, ic)
                keep &= (iv < 0) | (iv != vals)
            out = {c: b[c].filter(pa.array(keep)) for c in b.column_names}
            out[sym] = pa.array(vals[keep])
            return pa.table(out)

        return j.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    def _accept_inters(self, j, i1col, i2col, name, bound, inter_cols):
        bound = tuple(bound)
        inter_cols = tuple(inter_cols)

        def f(b: pa.Table) -> pa.Table:
            i1, i2 = _np(b, i1col), _np(b, i2col)
            keep = np.ones(len(i1), dtype=bool)
            for s in bound:
                sv = _np(b, s)
                keep &= (i1 < 0) | (i1 != sv)
                keep &= (i2 < 0) | (i2 != sv)
            for ic in inter_cols:
                iv = _np(b, ic)
                keep &= (i1 < 0) | (iv < 0) | (i1 != iv)
                keep &= (i2 < 0) | (iv < 0) | (i2 != iv)
            out = {c: b[c].filter(pa.array(keep)) for c in b.column_names}
            out[f"_p_{name}_1"] = pa.array(i1[keep])
            out[f"_p_{name}_2"] = pa.array(i2[keep])
            return pa.table(out)

        return j.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    def _apply_condition(self, q: Query, pdf: pd.DataFrame) -> pd.DataFrame:
        if not q.condition or not len(pdf):
            return pdf
        df = pdf.copy()
        syms = [c for c in pdf.columns if not c.startswith("_p_")]
        for sym in syms:
            for prop, mapping in self._props.items():
                df[f"{sym}.{prop}"] = pdf[sym].map(mapping)
        mask = compile_condition(q.condition)(df)
        return pdf[mask]

    @staticmethod
    def _dedup_sets(pdf: pd.DataFrame, sym_cols, inter_cols) -> pd.DataFrame:
        """Reference equal_graphs semantics: matches with the same
        vertex SET are one result (gray_multiple.py:16-37)."""
        if not len(pdf):
            return pdf
        def key(row):
            s = {int(row[c]) for c in sym_cols}
            s |= {int(row[c]) for c in inter_cols if int(row[c]) >= 0}
            return tuple(sorted(s))
        pdf = pdf.copy()
        pdf["_vidset"] = pdf.apply(key, axis=1)
        pdf = pdf.drop_duplicates("_vidset")
        return pdf.reset_index(drop=True)


def match_sets(vertices_ds, edges_ds, query_args: list[str]) -> list[tuple[int, ...]]:
    """Convenience: CLI-style args -> sorted list of matched vid sets
    (the reference golden-case result shape, query_test.py:10-50)."""
    from igpm_pem_ray.match.query import parse_query_args

    q = parse_query_args(query_args)
    m = SubgraphMatcher(vertices_ds, edges_ds)
    pdf = m.match(q)
    if not len(pdf):
        return []
    return sorted(pdf["_vidset"].tolist())
