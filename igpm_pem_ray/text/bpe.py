"""Distributed BPE merge learning (tokenizer training, Sennrich et
al., arXiv:1508.07909) — the missing half of the doc_tokens_bpe pair:
not just counting tokens with a fixed BPE-ish regex, but LEARNING the
merge table from the corpus.

Reference context: the reference has no tokenizer stage (graph
inputs); this is part of the training-data-pipeline suite.

Scale shape: the corpus-sized work happens ONCE — a token-count
groupby reduces the corpus to the (word, freq) table, which is
vocab-bounded (distinct words, not corpus positions; millions of rows
at web scale, never 10^12).  Every merge round then runs over that
word table as a Dataset: one map_batches emitting freq-weighted
adjacent symbol pairs, one groupby-sum, a top-1 sorted-limit (count
desc, then lexicographic pair — fully deterministic), and one
map_batches rewriting each word's symbol sequence with the winning
merge applied greedily left to right.  The per-word rewrite is a
Python loop over DISTINCT WORDS (vocab-bounded, documented), not
corpus rows.

Symbols per word start as characters + a terminal ``</w>`` marker
(the published formulation), stored as a ``list<string>`` column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

END = "</w>"


def word_counts(docs_ds):
    """documents (text) -> (word, freq) Dataset: per-block partial
    counts then one groupby-sum (the q_top_tokens plan)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split().explode().dropna()
        if len(toks) == 0:
            return pd.DataFrame({"word": pd.Series([], dtype=str),
                                 "freq": pd.Series([], dtype="int64")})
        vc = toks.value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(),
                             "freq": vc.to_numpy().astype(np.int64)})

    return docs_ds.map_batches(partial, batch_format="pandas") \
        .groupby("word").aggregate(Sum("freq", alias_name="freq"))


def _merge_word(syms: list[str], left: str, right: str,
                merged: str) -> list[str]:
    """Apply one merge greedily left to right (the published scan)."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe(docs_ds, n_merges: int, *, stats: dict | None = None) -> pa.Table:
    """documents (text) -> merge table (rank, left, right, n) with
    ``n`` = the freq-weighted pair count the merge won with.  Stops
    early when no pair occurs twice."""
    import time

    t0 = time.perf_counter()
    words = word_counts(docs_ds).map_batches(
        lambda df: pd.DataFrame({
            "syms": [list(w) + [END] for w in df["word"]],
            "freq": df["freq"].astype("int64"),
        }),
        batch_format="pandas").materialize()

    ranks: list[int] = []
    lefts: list[str] = []
    rights: list[str] = []
    ns: list[int] = []
    for r in range(n_merges):
        def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
            ls: list[str] = []
            rs: list[str] = []
            fs: list[int] = []
            for syms, f in zip(df["syms"], df["freq"]):
                for a, b in zip(syms[:-1], syms[1:]):
                    ls.append(a)
                    rs.append(b)
                    fs.append(f)
            if not ls:
                return pd.DataFrame({"l": pd.Series([], dtype=str),
                                     "r": pd.Series([], dtype=str),
                                     "n": pd.Series([], dtype="int64")})
            g = pd.DataFrame({"l": ls, "r": rs, "n": fs}) \
                .groupby(["l", "r"], sort=False)["n"].sum().reset_index()
            return g

        top = words.map_batches(pair_partial, batch_format="pandas") \
            .groupby(["l", "r"]).aggregate(Sum("n", alias_name="n")) \
            .sort(["n", "l", "r"], descending=[True, False, False]) \
            .limit(1).to_pandas()
        if len(top) == 0 or int(top["n"].iloc[0]) < 2:
            break
        left, right, n = str(top["l"].iloc[0]), str(top["r"].iloc[0]), \
            int(top["n"].iloc[0])
        ranks.append(r)
        lefts.append(left)
        rights.append(right)
        ns.append(n)
        merged = left + right

        def apply_merge(df: pd.DataFrame, _l=left, _r=right,
                        _m=merged) -> pd.DataFrame:
            return pd.DataFrame({
                "syms": [_merge_word(s, _l, _r, _m) if _l in s else s
                         for s in df["syms"]],
                "freq": df["freq"].astype("int64"),
            })

        words = words.map_batches(apply_merge,
                                  batch_format="pandas").materialize()
    if stats is not None:
        stats.update({"merges": len(ranks),
                      "wall_sec": time.perf_counter() - t0})
    return pa.table({"rank": pa.array(ranks, pa.int64()),
                     "left": pa.array(lefts, pa.string()),
                     "right": pa.array(rights, pa.string()),
                     "n": pa.array(ns, pa.int64())})


def _encode_word(word: str, rank_of: dict) -> list[str]:
    """Published BPE encode: repeatedly merge the LOWEST-RANK adjacent
    pair present (all its occurrences, greedy left to right) until no
    learned pair remains."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(syms[:-1], syms[1:]):
            r = rank_of.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair[0], best_pair[1],
                           best_pair[0] + best_pair[1])
    return syms


class BpeEncoder:
    """Actor-pool stage: documents (doc_id, text) -> (doc_id,
    n_words, n_bpe_tokens) under a learned merge table.

    Stateful on purpose: the rank dict is built once per actor from
    the (small, broadcast) merge table, and a per-actor word->length
    cache exploits the Zipfian corpus (hot words encode once per
    actor, not once per occurrence)."""

    def __init__(self, merges: pa.Table) -> None:
        self.rank_of = {(l, r): k for k, l, r in
                        zip(merges["rank"].to_pylist(),
                            merges["left"].to_pylist(),
                            merges["right"].to_pylist())}
        self.cache: dict[str, int] = {}

    def _tokens_of(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(_encode_word(word, self.rank_of))
            self.cache[word] = n
        return n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n_words: list[int] = []
        n_bpe: list[int] = []
        for txt in df["text"].fillna(""):
            ws = txt.split()
            n_words.append(len(ws))
            n_bpe.append(sum(self._tokens_of(w) for w in ws))
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_words": pd.Series(n_words, dtype="int64"),
            "n_bpe_tokens": pd.Series(n_bpe, dtype="int64")})


def encode_bpe(docs_ds, merges: pa.Table, *, concurrency=2,
               batch_size: int = 128):
    """documents -> per-doc BPE token counts under ``merges`` (the
    learn_bpe output).  The merge table is tiny and ships once per
    actor via the callable-class constructor arg (fn_constructor_args
    — Ray serializes it into the actor, not per batch)."""
    return docs_ds.map_batches(
        BpeEncoder, fn_constructor_args=(merges,),
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pandas")
