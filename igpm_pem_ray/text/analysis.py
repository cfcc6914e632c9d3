"""Text analysis over a ``documents``-shaped table: token counting,
quality scoring, language id, document fingerprinting.

Large-scale training-data-pipeline ops (driver instruction) expressed
as vectorized ``map_batches`` stages — pandas string kernels / numpy,
no per-row Python in hot paths except where a C-backed loop is the
vectorized form (hashing).  Stateful pieces (compiled regexes, stopword
tables, language profiles) live in actor ``__init__``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# explicit ASCII whitespace class so the DuckDB (RE2) oracle and this
# engine agree on texts with tabs/newlines/unicode spaces (ADVICE r1):
# unicode whitespace is NOT collapsed by either engine.
_WS = re.compile(r"[ \t\n\r\f\v]+")
_TOKEN = re.compile(r"[A-Za-z0-9]+(?:'[a-z]+)?|[^\sA-Za-z0-9]")  # BPE-ish: words+punct

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by".split())

# tiny deterministic n-gram profiles for language id (public-knowledge
# heuristic: characteristic function words per language)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour"},
    "es": {"el", "la", "los", "las", "es", "una", "en", "que", "por", "para"},
}


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count (python str.split semantics: empty ->0)."""
    return texts.fillna("").str.split().str.len().to_numpy(dtype=np.int64)


def bpe_ish_token_count(texts: pd.Series) -> np.ndarray:
    """Regex token count (words + punctuation marks), compiled once."""
    return texts.fillna("").str.findall(_TOKEN).str.len().to_numpy(dtype=np.int64)


class TokenCounter:
    """Actor-pool stage: documents(text) -> + n_tokens, n_tokens_bpe."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_tokens"] = token_count(batch["text"])
        batch["n_tokens_bpe"] = bpe_ish_token_count(batch["text"])
        return batch


class QualityScorer:
    """documents(text) -> quality metrics (reference-free heuristics:
    length, punctuation ratio, stopword ratio, mean word length)."""

    def __init__(self) -> None:
        self.stop = STOPWORDS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_chars = text.str.len().to_numpy(dtype=np.int64)
        toks = text.str.split()
        n_tokens = toks.str.len().to_numpy(dtype=np.int64)
        n_alpha = text.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
        n_punct = text.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
        stop = self.stop
        n_stop = toks.map(lambda ws: sum(1 for w in ws if w in stop) if isinstance(ws, list) else 0)
        batch["n_chars"] = n_chars
        batch["n_tokens"] = n_tokens
        batch["n_stopwords"] = n_stop.to_numpy(dtype=np.int64)
        nt = np.maximum(n_tokens, 1)
        batch["alpha_ratio_e6"] = np.floor(n_alpha / np.maximum(n_chars, 1) * 1e6 + 0.5).astype(np.int64)
        batch["punct_ratio_e6"] = np.floor(n_punct / np.maximum(n_chars, 1) * 1e6 + 0.5).astype(np.int64)
        batch["stop_ratio_e6"] = np.floor(n_stop.to_numpy() / nt * 1e6 + 0.5).astype(np.int64)
        batch["mean_word_len_e6"] = np.floor(
            np.where(n_tokens > 0, (n_chars - np.maximum(n_tokens - 1, 0)) / nt, 0.0) * 1e6 + 0.5
        ).astype(np.int64)
        return batch


class LangId:
    """Marker-word language id (n-gram-heuristic class; deterministic).
    Emits predicted lang + marker hit count; ties broken by language
    code order, no markers -> 'und'."""

    def __init__(self) -> None:
        self.markers = _LANG_MARKERS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs = sorted(self.markers)
        toksets = batch["text"].fillna("").str.lower().str.split().map(set)
        scores = {lg: toksets.map(lambda s, m=self.markers[lg]: len(s & m)).to_numpy()
                  for lg in langs}
        mat = np.stack([scores[lg] for lg in langs], axis=1)
        best = mat.argmax(axis=1)
        best_score = mat.max(axis=1)
        batch["lang_pred"] = np.where(best_score > 0, np.array(langs)[best], "und")
        batch["lang_score"] = best_score.astype(np.int64)
        return batch


def fingerprint64(texts) -> np.ndarray:
    """Deterministic 63-bit document fingerprint (blake2b of the
    whitespace-normalized text) — the exact-dedup key."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        norm = _WS.sub(" ", t or "").strip(" ")
        out[i] = int.from_bytes(
            hashlib.blake2b(norm.encode("utf-8"), digest_size=8).digest(), "big") & ((1 << 63) - 1)
    return out


class Fingerprinter:
    """documents(text) -> + fp64 (content-hash fingerprint)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fp64"] = fingerprint64(batch["text"].tolist())
        return batch


_WINNOW_BASE = np.uint64(1_000_003)


def winnow_fingerprints(text: str, *, k: int = 8, w: int = 16) -> np.ndarray:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): byte-level degree-k polynomial ROLLING hash, then the
    minimum hash of every window of w consecutive k-grams (rightmost
    min per window), deduplicated.  Vectorized: the rolling hashes come
    from two cumulative polynomial prefix products and the windowed
    minimum from a stride-tricks sliding window."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    # h[i] = data[i:i+k] . BASE^{k-1..0}  (mod 2^64) — the k-gram
    # rolling-hash values, vectorized as one sliding-window matmul
    # (k is a small constant, so this IS the rolling recurrence cost)
    weights = _WINNOW_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(data, k)
    h = (win * weights).sum(axis=1, dtype=np.uint64)
    if n <= w:
        return np.array([np.int64(h.min() >> np.uint64(1))])
    hw = np.lib.stride_tricks.sliding_window_view(h, w)
    mins = hw.min(axis=1)
    return np.unique((mins >> np.uint64(1)).astype(np.int64))


class WinnowFingerprinter:
    """documents(text) -> (doc_id, fp) rows, one per selected k-gram
    fingerprint (flat_map shape; the overlap-detection index rows)."""

    def __init__(self, *, k: int = 8, w: int = 16) -> None:
        self.k = k
        self.w = w

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, fps = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            f = winnow_fingerprints(text or "", k=self.k, w=self.w)
            ids.append(np.full(len(f), doc_id, dtype=np.int64))
            fps.append(f)
        return pd.DataFrame({
            "doc_id": np.concatenate(ids) if ids else np.empty(0, np.int64),
            "fp": np.concatenate(fps) if fps else np.empty(0, np.int64),
        })
