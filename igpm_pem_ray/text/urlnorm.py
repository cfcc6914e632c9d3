"""URL canonicalization + SURT sort keys (webtext plumbing).

Reference context: the reference consumes pre-built edge lists and
has no URL handling; this is training-corpus / crawl-index plumbing —
the canonicalization every web pipeline runs before URL-keyed dedup,
and the SURT (Sort-friendly URI Reordering Transform) key Common
Crawl's CDX index orders by, which clusters one registered domain's
pages contiguously under a range partitioner.

Canonicalization spec (deterministic, documented here and enforced by
the independent stdlib-urllib oracle in tests):
- scheme and host lowercased; default port dropped (``:80`` for http,
  ``:443`` for https); fragment dropped;
- query parameters sorted bytewise; tracking parameters removed
  (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``); an emptied query
  loses its ``?``;
- empty path becomes ``/``;  path segments are NOT dot-resolved
  (that is the href-resolution step, done at extraction time).

SURT key: ``com,example,sub)/path?sorted-query`` — host labels
reversed and comma-joined, scheme dropped, built FROM the canonical
form.

Hot path: one compiled regex ``str.extract`` splits every URL into
components vectorized; only rows that actually carry a query string
enter the per-row sort loop (rare on real corpora, and the loop is
over that subset only).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/?#:]*)(?::(?P<port>\d+))?"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)

_TRACKING = re.compile(r"^(utm_|gclid$|fbclid$|msclkid$)")

_DEFAULT_PORT = {"http": "80", "https": "443"}


def _clean_query(q: str) -> str:
    """Sort params bytewise, drop tracking params (kernel AND oracle
    share this helper's spec, not its code)."""
    parts = [p for p in q.split("&") if p]
    kept = [p for p in parts
            if not _TRACKING.match(p.split("=", 1)[0].lower())]
    return "&".join(sorted(kept))


def normalize_urls(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization; non-URL rows pass through
    unchanged (identity for anything the regex rejects)."""
    s = urls.fillna("").astype(str)
    parts = s.str.extract(_URL_RE)
    ok = parts["scheme"].notna()
    if not ok.any():
        return s

    scheme = parts["scheme"].str.lower()
    host = parts["host"].str.lower()
    port = parts["port"]
    default = scheme.map(_DEFAULT_PORT)
    keep_port = port.notna() & (port != default)
    hostport = host.where(~keep_port, host + ":" + port)
    path = parts["path"].replace("", "/")

    query = parts["query"]
    has_q = ok & query.notna() & (query != "")
    if has_q.any():
        cleaned = query[has_q].map(_clean_query)  # subset-only loop
        query = query.copy()
        query[has_q] = cleaned
    qsuffix = np.where(query.notna() & (query != ""), "?" + query.fillna(""), "")

    rebuilt = scheme + "://" + hostport + path + pd.Series(qsuffix, index=s.index)
    return rebuilt.where(ok, s)


def surt_keys(urls: pd.Series) -> pd.Series:
    """Canonical form -> SURT key; non-URL rows map to ''."""
    canon = normalize_urls(urls)
    parts = canon.str.extract(_URL_RE)
    ok = parts["scheme"].notna()
    host = parts["host"].fillna("")
    rev = host.str.split(".").map(lambda ls: ",".join(reversed(ls)))
    port = parts["port"]
    rev = rev.where(port.isna(), rev + ":" + port.fillna(""))
    path = parts["path"].replace("", "/")
    q = parts["query"]
    qsuffix = np.where(q.notna() & (q != ""), "?" + q.fillna(""), "")
    out = rev + ")" + path + pd.Series(qsuffix, index=canon.index)
    return out.where(ok, "")


def url_canonical_table(urls_ds, *, url_col: str = "url"):
    """Dataset with a url column -> (url, canonical, surt) Dataset,
    one vectorized map_batches — no shuffle; sort by surt downstream
    to cluster domains (the CDX layout)."""
    def f(df: pd.DataFrame) -> pd.DataFrame:
        u = df[url_col]
        return pd.DataFrame({"url": u,
                             "canonical": normalize_urls(u),
                             "surt": surt_keys(u)})

    return urls_ds.map_batches(f, batch_format="pandas")
