"""Distributed deterministic pages generator (large-scale fixture).

``sources.pages`` renders every page on the driver — right for unit
fixtures, wrong for benchmark scale.  This generator renders pages
INSIDE ``map_batches`` over ``ray.data.range`` (pure function of the
page index + seed), so fixture creation scales with the cluster like a
real crawl ingest would, and writes partitioned Parquet.

Pages are realistic-crawl-sized (default ~16 KB html): a per-page
unique prefix + a shared filler body + ``links_per_page`` anchors whose
targets follow a power-law-ish skew (low page ids are hubs) via
splitmix64 hashing — the same shape the BA fixture gives at small
scale.  The ``text`` column again holds the independently composed
expected extraction output (parse-vs-compose invariant).
"""

from __future__ import annotations

import html as _html
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from igpm_pem_ray.sources.pages import N_SITES, _BASE_TS_US, page_url
from igpm_pem_ray.sources.synth_edges import _splitmix64

_FILLER_TOKENS = 2000


def _filler(body_tokens: int) -> str:
    return " ".join(f"tok{k % 4096}" for k in range(body_tokens))


def expected_links(i: int, n_pages: int, links_per_page: int, seed: int,
                   skew: float = 2.0) -> list[int]:
    """Deterministic link targets of page i (shared by generator, tests
    and any closed-form oracle)."""
    j = np.arange(links_per_page, dtype=np.uint64)
    h = _splitmix64(np.uint64(i) * np.uint64(links_per_page) + j + np.uint64(seed))
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    return list(np.minimum((u ** skew * n_pages).astype(np.int64), n_pages - 1))


class PageRenderer:
    """Actor-pool batch renderer: index -> full page row."""

    def __init__(self, n_pages: int, links_per_page: int, seed: int,
                 body_tokens: int = _FILLER_TOKENS) -> None:
        self.n_pages = n_pages
        self.links_per_page = links_per_page
        self.seed = seed
        self.filler = _filler(body_tokens)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        urls, htmls, texts, langs, ts = [], [], [], [], []
        esc = _html.escape
        for i in ids:
            i = int(i)
            title = f"Page {i}"
            prefix = f"doc {i} site {i % N_SITES}"
            targets = expected_links(i, self.n_pages, self.links_per_page, self.seed)
            parts = ["<!DOCTYPE html><html><head><title>", esc(title), "</title>",
                     "<style>body { margin: 0; }</style></head><body><h1>", esc(title),
                     "</h1><p>", esc(prefix), " ", esc(self.filler), "</p>"]
            anchor_texts = []
            for j, t in enumerate(targets):
                at = f"link {j}"
                anchor_texts.append(at)
                parts += ['<a href="', esc(page_url(t), quote=True), '">', esc(at), "</a> "]
            parts.append("</body></html>")
            urls.append(page_url(i))
            htmls.append("".join(parts).encode("utf-8"))
            texts.append(" ".join([title, title, prefix, self.filler] + anchor_texts))
            langs.append("en")
            ts.append(_BASE_TS_US + i)
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        })


def write_pages_dist(out_dir: str, n_pages: int, *, links_per_page: int = 12,
                     seed: int = 42, body_tokens: int = _FILLER_TOKENS,
                     concurrency: int | tuple[int, int] = 8) -> str:
    """Generate + write the pages table (idempotent via _DONE marker)."""
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rd.range(n_pages).map_batches(
        PageRenderer, batch_format="pyarrow", batch_size=2048,
        fn_constructor_kwargs={"n_pages": n_pages, "links_per_page": links_per_page,
                               "seed": seed, "body_tokens": body_tokens},
        concurrency=concurrency, num_cpus=0.7,
    ).write_parquet(out_dir)
    open(marker, "w").write("ok")
    return out_dir
