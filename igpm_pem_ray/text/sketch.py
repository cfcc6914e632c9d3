"""Mergeable sketches for approximate distinct counting (HyperLogLog).

The exact distinct-count plan (`analytics.q_distinct_parts`) shuffles
every distinct pair; at 10^12 rows the sketch is the honest
alternative: per-block partial registers (a few KB per block,
regardless of row count), one Max-merge groupby, and an O(groups x m)
driver estimate.  Standard HLL (Flajolet et al. 2007) with the small-
range linear-counting correction; m = 2^p registers gives
~1.04/sqrt(m) relative error.

No reference analog (the reference has no approximate aggregation —
SURVEY.md section 2.5); this is a driver-brief training-data operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max

_P = 10  # 1024 registers -> ~3.2% standard error
_M = 1 << _P


def _hash64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 finalizer)."""
    z = x.astype(np.uint64, copy=True)
    z = (z + np.uint64(0x9E3779B97F4A7C15))
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def hll_partial(group: np.ndarray, values: np.ndarray,
                group_col: str = "group") -> pa.Table:
    """Per-block HLL partial: (group, register, rank) rows, one row per
    NON-ZERO register per group — at most groups x m rows out of a
    block of any size.  rank = 1 + leading-zero count of the suffix.
    ``group`` may be any dtype (strings, wide ints): it is factorized
    per block so the packing key can't overflow."""
    h = _hash64(values)
    reg = (h >> np.uint64(64 - _P)).astype(np.int64)
    suffix = (h << np.uint64(_P)) | np.uint64((1 << _P) - 1)
    # leading-zero count, vectorized binary search (6 masked passes)
    lz = np.zeros(len(h), dtype=np.int64)
    s = suffix.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = s < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        s[mask] = s[mask] << np.uint64(shift)
    rank = lz + 1
    # collapse to max rank per (group, register) within the block
    gvals, gcodes = np.unique(group, return_inverse=True)
    packed = gcodes.astype(np.int64) * _M + reg
    order = np.argsort(packed, kind="stable")
    pk, rk = packed[order], rank[order]
    uniq, idx = np.unique(pk, return_index=True)
    mx = np.maximum.reduceat(rk, idx) if len(pk) else np.empty(0, np.int64)
    return pa.table({group_col: pa.array(gvals[uniq // _M]),
                     "reg": uniq % _M, "rank": mx})


def hll_estimate(pdf: pd.DataFrame, group_col: str = "group") -> pd.DataFrame:
    """(group, reg, rank) merged rows -> (group, approx_distinct).
    Missing registers count as rank 0."""
    out = []
    alpha = 0.7213 / (1.0 + 1.079 / _M)
    for g, sub in pdf.groupby(group_col):
        regs = np.zeros(_M, dtype=np.float64)
        regs[sub["reg"].to_numpy()] = sub["rank"].to_numpy()
        est = alpha * _M * _M / np.sum(np.power(2.0, -regs))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * _M and zeros > 0:  # linear counting correction
            est = _M * np.log(_M / zeros)
        out.append({group_col: g, "approx_distinct": int(round(est))})
    return pd.DataFrame(out)


def approx_distinct_per_group(ds, group_col: str, value_col: str):
    """Dataset -> pandas (group, approx_distinct): per-block partials,
    ONE Max-merge shuffle of O(blocks x groups x m) register rows, tiny
    driver estimate.  ``value_col`` must be integer-typed."""
    def partial(b: pa.Table) -> pa.Table:
        return hll_partial(
            b[group_col].to_numpy(zero_copy_only=False),
            b[value_col].to_numpy(zero_copy_only=False).astype(np.int64),
            group_col=group_col)

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby([group_col, "reg"]).aggregate(Max("rank", alias_name="rank"))
    return hll_estimate(merged.to_pandas(), group_col=group_col)


# ---------- DDSketch: mergeable relative-error quantiles ----------

def dd_bucket_partial(values: np.ndarray, *, alpha: float = 0.01) -> pa.Table:
    """Per-block DDSketch partial (Masson, Rim, Lee — VLDB 2019):
    log-spaced bucket counts with relative accuracy ``alpha``
    (gamma = (1+a)/(1-a); bucket = ceil(log_gamma x)).  Positive
    values only; zeros/negatives are counted in the reserved bucket
    INT64_MIN and surface as "below sketch range".  O(distinct
    buckets) rows out of a block of any size — mergeable by summing
    counts, the same partial->groupby shape as the HLL sketch."""
    x = np.asarray(values, dtype=np.float64)
    gamma = (1.0 + alpha) / (1.0 - alpha)
    pos = x > 0.0
    b = np.ceil(np.log(x[pos]) / np.log(gamma)).astype(np.int64)
    if (~pos).any():
        b = np.concatenate([b, np.full(int((~pos).sum()),
                                       np.iinfo(np.int64).min, np.int64)])
    uniq, cnt = np.unique(b, return_counts=True)
    return pa.table({"bucket": uniq, "n": cnt.astype(np.int64)})


def dd_quantiles(buckets: np.ndarray, counts: np.ndarray,
                 qs: list[float], *, alpha: float = 0.01) -> np.ndarray:
    """Merged (bucket, count) rows -> quantile estimates (each within
    relative error alpha of the true value for positive data)."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    order = np.argsort(buckets)
    b, c = buckets[order], counts[order]
    cum = np.cumsum(c)
    total = cum[-1] if len(cum) else 0
    out = np.empty(len(qs))
    for i, q in enumerate(qs):
        if total == 0:
            out[i] = np.nan
            continue
        target = max(int(np.ceil(q * total)), 1)
        j = int(np.searchsorted(cum, target))
        # bucket midpoint 2*gamma^b/(gamma+1) halves the worst-case
        # log-bucket width -> the alpha guarantee
        out[i] = 2.0 * gamma ** b[j] / (gamma + 1.0)
    return out


def approx_quantiles(ds, *, col: str, qs: list[float],
                     alpha: float = 0.01) -> pa.Table:
    """Dataset -> (q_e6, approx) DDSketch quantiles of ``col``:
    per-block bucket partials, ONE O(buckets) groupby-sum shuffle,
    O(buckets) driver estimate — constant state per block regardless
    of row count (the 10^12-row alternative to the exact rank-
    selection plan in relational.q_quantile_events)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        return dd_bucket_partial(
            b[col].to_numpy(zero_copy_only=False), alpha=alpha)

    merged = ds.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("bucket").aggregate(Sum("n", alias_name="n"))
    pdf = merged.to_pandas()
    if len(pdf) == 0:
        est = np.full(len(qs), np.nan)
    else:
        est = dd_quantiles(pdf["bucket"].to_numpy().astype(np.int64),
                           pdf["n"].to_numpy().astype(np.int64),
                           qs, alpha=alpha)
    return pa.table({"q_e6": np.floor(np.asarray(qs) * 1e6 + 0.5)
                     .astype(np.int64),
                     "approx": est})


# ---------- Misra-Gries: mergeable heavy hitters ----------

def mg_partial(items: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries summary of one block: <= k (item, counter) pairs.
    Vectorized: exact block counts, then the classic decrement —
    subtract the (k+1)-th largest count from all and keep positives
    (equivalent to running the streaming algorithm over the block).
    Guarantee: true_count - n_block/(k+1) <= counter <= true_count."""
    u, c = np.unique(items, return_counts=True)
    if len(u) > k:
        thresh = np.partition(c, len(c) - (k + 1))[len(c) - (k + 1)]
        c = c - thresh
        keep = c > 0
        u, c = u[keep], c[keep]
    return u, c.astype(np.int64)


def mg_merge(parts: list[tuple[np.ndarray, np.ndarray]],
             k: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge MG summaries (Agarwal et al., PODS 2012): sum counters
    by item, then decrement by the (k+1)-th largest — errors add, so
    the merged summary keeps the n_total/(k+1) guarantee."""
    if not parts:
        return np.empty(0, dtype=object), np.empty(0, np.int64)
    items = np.concatenate([p[0] for p in parts])
    counts = np.concatenate([p[1] for p in parts])
    u, inv = np.unique(items, return_inverse=True)
    c = np.zeros(len(u), dtype=np.int64)
    np.add.at(c, inv, counts)
    if len(u) > k:
        thresh = np.partition(c, len(c) - (k + 1))[len(c) - (k + 1)]
        c = c - thresh
        keep = c > 0
        u, c = u[keep], c[keep]
    return u, c


def heavy_hitters(ds, *, col: str, k: int = 64,
                  tokenize: bool = False) -> pa.Table:
    """(item, est_count) Misra-Gries heavy hitters of ``col`` (or of
    its whitespace tokens with tokenize=True): per-block <= k-row
    summaries, one tiny driver merge — O(blocks * k) wire traffic
    regardless of stream length, the bounded-memory alternative to
    the exact `q_top_tokens` vocabulary shuffle.  Every item with
    frequency > n/(k+1) is guaranteed present; estimates undershoot
    by at most n/(k+1)."""
    def partial(b: pa.Table) -> pa.Table:
        vals = b[col].to_pylist()
        if tokenize:
            toks: list = []
            for v in vals:
                toks.extend((v or "").split())
            arr = np.asarray(toks, dtype=object)
        else:
            arr = np.asarray(vals, dtype=object)
        if len(arr) == 0:
            return pa.table({"item": pa.array([], pa.string()),
                             "mg_count": pa.array([], pa.int64())})
        u, c = mg_partial(arr, k)
        return pa.table({"item": pa.array(list(u), pa.string()),
                         "mg_count": c})

    parts_pdf = ds.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True).to_pandas()
    u, c = mg_merge([(parts_pdf["item"].to_numpy(),
                      parts_pdf["mg_count"].to_numpy())], k)
    order = np.lexsort((np.asarray(u, dtype=object), -c))
    return pa.table({"item": pa.array([u[i] for i in order], pa.string()),
                     "est_count": pa.array(c[order], pa.int64())})


# ---------- Count-Min: mergeable point-frequency sketch ----------

CMS_D, CMS_W = 4, 2048  # depth x width: overcount <= e*N/W w.p. 1-e^-D
_CMS_SALTS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def _cms_hash_items(items: np.ndarray) -> np.ndarray:
    """Stable uint64 per item (pandas SipHash-1-3, the repo's string
    hash convention — ids.py / text/dedup.py)."""
    return pd.util.hash_array(np.asarray(items, dtype=object),
                              categorize=False)


def cms_partial(items: np.ndarray, *, d: int = CMS_D,
                w: int = CMS_W) -> np.ndarray:
    """(d, w) int64 counter matrix of one block.  Count-Min (Cormode
    & Muthukrishnan, J.Alg 2005) is a LINEAR sketch: the merge is an
    elementwise sum, exact under any grouping/order — per-block
    partials then one groupby-sum reproduce the single-pass sketch
    bit for bit (unlike MG, whose merge only preserves the bound)."""
    tab = np.zeros((d, w), dtype=np.int64)
    if len(items) == 0:
        return tab
    h = _cms_hash_items(items)
    for r in range(d):
        hr = _hash64(h ^ _CMS_SALTS[r]) % np.uint64(w)
        np.add.at(tab[r], hr.astype(np.int64), 1)
    return tab


def cms_query(tab: np.ndarray, probes: np.ndarray) -> np.ndarray:
    """Point-frequency estimates: min over the d rows.  Never
    undercounts; overcounts by <= e*N/w with prob 1 - e^-d."""
    d, w = tab.shape
    h = _cms_hash_items(probes)
    ests = np.empty((d, len(probes)), dtype=np.int64)
    for r in range(d):
        hr = _hash64(h ^ _CMS_SALTS[r]) % np.uint64(w)
        ests[r] = tab[r][hr.astype(np.int64)]
    return ests.min(axis=0)


def approx_token_freq(ds, *, col: str, probes: list[str],
                      tokenize: bool = True,
                      d: int = CMS_D, w: int = CMS_W) -> pa.Table:
    """(token, est_count) Count-Min frequency estimates for the probe
    tokens over ``col`` (whitespace-tokenized by default): per-block
    (row, slot, count) sparse partials, ONE groupby-sum bounded by
    O(d*w) rows regardless of stream length, driver assembles the
    d x w table and answers the probes.  The bounded-memory point-
    lookup companion to `heavy_hitters` (which finds WHICH items are
    hot; this answers HOW OFTEN for a known item)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        vals = b[col].to_pylist()
        if tokenize:
            toks: list = []
            for v in vals:
                toks.extend((v or "").split())
            arr = np.asarray(toks, dtype=object)
        else:
            arr = np.asarray(vals, dtype=object)
        tab = cms_partial(arr, d=d, w=w)
        r, s = np.nonzero(tab)
        return pa.table({"slot": (r * w + s).astype(np.int64),
                         "c": tab[r, s]})

    pdf = ds.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("slot").aggregate(Sum("c", alias_name="c")).to_pandas()
    tab = np.zeros((d, w), dtype=np.int64)
    if len(pdf):
        slots = pdf["slot"].to_numpy()
        tab[slots // w, slots % w] = pdf["c"].to_numpy()
    est = cms_query(tab, np.asarray(probes, dtype=object))
    return pa.table({"token": pa.array(probes, pa.string()),
                     "est_count": pa.array(est, pa.int64())})
