"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) —
PageRank over the word co-occurrence graph.

The reference's RWR recurrence (patternmatching/gray/rwr.py:149-180)
applied to the corpus instead of the link graph: vertices are corpus
tokens, edges connect ADJACENT tokens (window 2, the paper's default),
undirected simple view.  This is the text-side twin of the link-graph
PageRank kernels and shares their conventions:

- tokenization identical to the word-bigram / top-token queries
  (whitespace split, empties dropped);
- damping is DYADIC (d = 7/8) and the recurrence is integer
  end-to-end, the katz_shuffle convention:

      r_0(w)   = S                      (S = 10^12)
      c_t(w)   = r_t(w) // deg(w)       (deg >= 1 on the simple view)
      r_{t+1}  = S//8 + (7 * sum_{u in N(w)} c_t(u)) // 8

  Integer sums are exact under ANY reduction order, so the kernel and
  the unrolled DuckDB oracle (pipelines/analytics.sql_textrank) agree
  bit for bit — no e8 float-rounding boundary to flip (BASELINE.md,
  katz incident).  Bounds: total mass <= V*S ~ 1e17 for a 1e5-word
  vocab, and 7*m < 2^63 up to ~1.3e18 message mass.

Scale story: the pair extraction is the word-bigram partial-count plan
(documents never leave their block; one (a,b) groupby bounded by the
distinct-bigram vocabulary), and the iteration runs on the dense
substrate whose vertex domain is the VOCABULARY, not the corpus — at
100 TB text the vocab is millions of terms, comfortably inside the
dense envelope; a shuffle sibling would be katz_shuffle verbatim on
the same integer messages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TEXTRANK_S = 10**12
TEXTRANK_ITERS = 5
TEXTRANK_K = 50


def word_pair_table(docs_ds) -> "pa.Table":
    """documents(text) -> distinct undirected adjacent-token pairs
    (a < b lexicographically, self-pairs dropped)."""
    from ray.data.aggregate import Count

    def partial(b: pa.Table) -> pa.Table:
        left: list[str] = []
        right: list[str] = []
        for txt in b["text"].to_pylist():
            t = (txt or "").split()
            for x, y in zip(t[:-1], t[1:]):
                if x == y:
                    continue
                a, bb = (x, y) if x < y else (y, x)
                left.append(a)
                right.append(bb)
        if not left:
            return pa.table({"a": pa.array([], type=pa.string()),
                             "b": pa.array([], type=pa.string())})
        # per-block dedup before the shuffle (combiner)
        import pandas as pd

        dd = pd.DataFrame({"a": left, "b": right}).drop_duplicates()
        return pa.table({"a": pa.array(dd["a"], type=pa.string()),
                         "b": pa.array(dd["b"], type=pa.string())})

    return (docs_ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"]))


def textrank_terms(docs_ds, *, n_iters: int = TEXTRANK_ITERS,
                   k: int = TEXTRANK_K) -> pa.Table:
    """-> (term, rank) top-k, rank desc then term asc, integer rank."""
    import ray.data as rd

    from igpm_pem_ray.graph.dense import build_dense_graph, msg_pass

    pairs = word_pair_table(docs_ds).to_pandas()  # vocab-bounded
    if not len(pairs):
        return pa.table({"term": pa.array([], type=pa.string()),
                         "rank": pa.array([], type=pa.int64())})
    words = np.unique(np.concatenate([pairs["a"].to_numpy(dtype=object),
                                      pairs["b"].to_numpy(dtype=object)]))
    ia = np.searchsorted(words, pairs["a"].to_numpy(dtype=object))
    ib = np.searchsorted(words, pairs["b"].to_numpy(dtype=object))
    edges = rd.from_arrow(pa.table({"src": pa.array(ia, pa.int64()),
                                    "dst": pa.array(ib, pa.int64())}))
    g = build_dense_graph(edges, symmetric=True)
    deg = np.asarray(g.outdeg, dtype=np.int64)
    r = np.full(g.num_vertices, TEXTRANK_S, dtype=np.int64)
    for _ in range(n_iters):
        c = r // deg
        m = msg_pass(g, c, reduce="sum", init=0)
        r = TEXTRANK_S // 8 + (7 * m) // 8
    terms = words[np.asarray(g.vids)]
    order = np.lexsort((terms, -r))[:k]
    return pa.table({"term": pa.array(terms[order], type=pa.string()),
                     "rank": pa.array(r[order], pa.int64())})
