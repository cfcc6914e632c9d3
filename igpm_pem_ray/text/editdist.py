"""SymSpell-style <=1-edit-distance pair join primitives.

The deletion-neighborhood trick (Garbe's SymSpell; public domain
algorithm): two strings are within Levenshtein distance 1 iff they
share an element of {s} ∪ deletions(s) AND pass an exact verification
— equality (0), one substitution (equal length, Hamming 1), or one
insertion/deletion (length gap 1, aligned prefix+suffix).  Candidate
generation is a plain equi-join on the variant key, so the whole
near-join is one Dataset hash join instead of an all-pairs scan; the
verification below is fully vectorized over byte matrices (no per-pair
Python).  ASCII/latin-1 corpora only (documented; the byte-matrix
width assumes 1 byte per char).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _byte_mat(s: pd.Series, width: int) -> np.ndarray:
    """(n, width) uint8 matrix of NUL-right-padded latin-1 strings."""
    padded = s.str.ljust(width, "\x00")
    buf = "".join(padded.tolist()).encode("latin-1")
    return np.frombuffer(buf, dtype=np.uint8).reshape(len(s), width)


def deletion_variants(names: pd.Series, keys: np.ndarray) -> pd.DataFrame:
    """Long-format (v, key, name) table: each input string once as
    itself and once per single-character deletion.  One vectorized
    slice+concat per position — max_len+1 pandas ops, no row loop."""
    names = names.astype(object)
    lens = names.str.len()
    max_len = int(lens.max()) if len(names) else 0
    vs = [names]
    ks = [np.asarray(keys, dtype=np.int64)]
    ns = [names]
    for i in range(max_len):
        m = (lens > i).to_numpy()
        if not m.any():
            break
        sub = names[m]
        vs.append(sub.str.slice(0, i) + sub.str.slice(i + 1))
        ks.append(np.asarray(keys, dtype=np.int64)[m])
        ns.append(sub)
    return pd.DataFrame({
        "v": pd.concat(vs, ignore_index=True),
        "key": np.concatenate(ks),
        "name": pd.concat(ns, ignore_index=True)})


def lev_le1(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Exact Levenshtein distance where it is <= 1, else -1 — int64
    array, vectorized.  Equal lengths: Hamming over the byte matrix;
    length gap 1: one aligned (prefix, suffix) split must match, found
    via cumprod prefix/suffix masks.  Gap >= 2: -1 immediately."""
    a = a.reset_index(drop=True).astype(object)
    b = b.reset_index(drop=True).astype(object)
    la = a.str.len().to_numpy(np.int64)
    lb = b.str.len().to_numpy(np.int64)
    dist = np.full(len(a), -1, dtype=np.int64)

    eqlen = np.flatnonzero(la == lb)
    if len(eqlen):
        w = max(int(la[eqlen].max()), 1)
        h = (_byte_mat(a.iloc[eqlen], w) != _byte_mat(b.iloc[eqlen], w)) \
            .sum(axis=1)
        ok = h <= 1
        dist[eqlen[ok]] = h[ok]

    gap1 = np.flatnonzero(np.abs(la - lb) == 1)
    if len(gap1):
        av, bv = a.to_numpy(), b.to_numpy()
        swap = la[gap1] < lb[gap1]
        X = pd.Series(np.where(swap, bv[gap1], av[gap1]))  # longer
        Y = pd.Series(np.where(swap, av[gap1], bv[gap1]))  # shorter
        w = max(int(np.maximum(la, lb)[gap1].max()), 2)
        Xm, Ym = _byte_mat(X, w), _byte_mat(Y, w)
        eq1 = Xm == Ym                       # X[i] == Y[i]
        eq2 = Xm[:, 1:] == Ym[:, :-1]        # X[i+1] == Y[i]
        prefix = np.cumprod(eq1, axis=1).astype(bool)
        suffix = np.flip(np.cumprod(np.flip(eq2, axis=1), axis=1),
                         axis=1).astype(bool)
        # delete X[p]: positions 0..w-1; pads are NUL on both sides so
        # suffix comparison through the pad region stays true
        valid = suffix[:, 0].copy()          # p = 0
        if w > 1:
            mid = prefix[:, :-1] & np.concatenate(
                [suffix[:, 1:], np.ones((len(gap1), 1), dtype=bool)],
                axis=1)
            valid |= mid.any(axis=1)
        dist[gap1[valid]] = 1
    return dist
