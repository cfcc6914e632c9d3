"""Gopher-style repetition quality signals per document.

Reference context: the reference has no corpus-quality stage (its
inputs are graphs); this is part of the training-data-pipeline suite
(like text/analysis.py quality ratios) — the repetition family of
filters from Rae et al., "Scaling Language Models: ... Gopher"
(arXiv:2112.11446, table A1): documents dominated by one repeated
word or phrase are boilerplate/spam and get dropped before training.

Exact integer convention (shared with the DuckDB oracle bit for bit):
fractions are e6 fixed point with FLOOR division —
``top_unigram_frac_e6 = max_unigram_count * 10^6 // n_tokens``,
``top_bigram_frac_e6  = max_adjacent_bigram_count * 10^6 // (n_tokens-1)``,
``distinct_frac_e6    = n_distinct_tokens * 10^6 // n_tokens``
(0 where the denominator is 0).  ``keep`` applies the thresholds
below; both classes are non-empty on the synthetic corpus at every
test scale (measured before pinning).

Per-batch work is pandas C kernels end to end: one ``str.split`` +
``explode`` then hash groupbys over (row, token) and (row, bigram) —
no Python loop over rows or tokens.  Each batch is independent
(per-document stats), so the stage shuffles nothing and scales with
input blocks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# keep iff all three hold (e6 fixed point)
MAX_TOP_UNIGRAM_E6 = 120_000   # <= 12% of tokens are one word
MAX_TOP_BIGRAM_E6 = 60_000     # <= 6% of adjacent pairs are one bigram
MIN_DISTINCT_E6 = 350_000      # >= 35% of tokens are distinct


def repetition_stats(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) -> per-doc repetition signals + keep flag."""
    text = df["text"].fillna("")
    toks = text.str.split()
    out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
    n = len(df)

    ex = toks.reset_index(drop=True).explode().dropna()
    row = ex.index.to_numpy(dtype=np.int64)
    word = ex.to_numpy()

    n_tokens = np.zeros(n, dtype=np.int64)
    if len(row):
        np.add.at(n_tokens, row, 1)

    max_uni = np.zeros(n, dtype=np.int64)
    n_dist = np.zeros(n, dtype=np.int64)
    if len(row):
        vc = pd.DataFrame({"r": row, "w": word}) \
            .groupby(["r", "w"], sort=False).size()
        per_row = vc.groupby(level=0)
        mu = per_row.max()
        nd = per_row.size()
        max_uni[mu.index.to_numpy()] = mu.to_numpy()
        n_dist[nd.index.to_numpy()] = nd.to_numpy()

    max_bi = np.zeros(n, dtype=np.int64)
    if len(row) > 1:
        same = row[1:] == row[:-1]
        if same.any():
            b_row = row[1:][same]
            b = pd.DataFrame({
                "r": b_row,
                "bg": pd.Series(word[:-1][same]).str.cat(
                    pd.Series(word[1:][same]), sep=" ").to_numpy(),
            })
            mb = b.groupby(["r", "bg"], sort=False).size() \
                .groupby(level=0).max()
            max_bi[mb.index.to_numpy()] = mb.to_numpy()

    n_big = np.maximum(n_tokens - 1, 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        top_uni = np.where(n_tokens > 0,
                           max_uni * 1_000_000 // np.maximum(n_tokens, 1), 0)
        top_bi = np.where(n_big > 0,
                          max_bi * 1_000_000 // np.maximum(n_big, 1), 0)
        dist = np.where(n_tokens > 0,
                        n_dist * 1_000_000 // np.maximum(n_tokens, 1), 0)
    out["n_tokens"] = n_tokens
    out["top_unigram_frac_e6"] = top_uni.astype(np.int64)
    out["top_bigram_frac_e6"] = top_bi.astype(np.int64)
    out["distinct_frac_e6"] = dist.astype(np.int64)
    out["keep"] = ((n_tokens > 0)
                   & (top_uni <= MAX_TOP_UNIGRAM_E6)
                   & (top_bi <= MAX_TOP_BIGRAM_E6)
                   & (dist >= MIN_DISTINCT_E6)).astype(np.int64)
    return out


def repetition_table(docs_ds, *, concurrency: int | None = None):
    """documents Dataset (doc_id, text) -> per-doc repetition stats."""
    return docs_ds.map_batches(repetition_stats, batch_format="pandas",
                               concurrency=concurrency)
