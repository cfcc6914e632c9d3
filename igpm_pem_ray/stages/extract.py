"""HTML extraction stage: pages -> (url, text, links[], n_links).

Reference analog: none line-for-line — this is the north-rule addition
(SURVEY.md M12): hyperlink-edge extraction from Common-Crawl-style
Parquet pages.  Expressed as a stateful **actor pool** over zero-copy
Arrow batches: the parser state (compiled regexes + any future real
HTML parser instance) is built once per actor in ``__init__`` and
reused per batch in ``__call__``.

Scale notes:
- html payloads are MBs-wide; the stage is placed immediately after the
  read and drops ``html`` from its output so only narrow columns flow on
  (SURVEY.md section 7.4 "very wide rows").
- output schema keeps links as ``large_list<string>`` per page; the
  explode to (src,dst) rows is a separate vectorized map (see
  graph/build.py) so text-only consumers never pay for it.
"""

from __future__ import annotations

import pyarrow as pa

from igpm_pem_ray import html_extract


class HtmlExtractor:
    """Actor-pool callable for ``map_batches``.

    pages batch (url, html[, warc_ts, lang]) ->
    (url, text, links: list<string>[, warc_ts, lang])
    """

    def __init__(self) -> None:
        # Parser state lives per actor.  The regexes are module-level
        # compiled; a heavier DOM parser would be constructed here.
        self._extract_text = html_extract.extract_text
        self._extract_hrefs = html_extract.extract_hrefs

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        texts = [self._extract_text(h) for h in htmls]
        links = [self._extract_hrefs(h, u) for h, u in zip(htmls, urls)]
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "url": batch["url"],
            "text": pa.array(texts, type=pa.string()),
            "links": pa.array(links, type=pa.list_(pa.string())),
            "n_links": pa.array([len(l) for l in links], type=pa.int64()),
        }
        for extra in ("warc_ts", "lang"):
            if extra in batch.column_names:
                cols[extra] = batch[extra]
        return pa.table(cols)


def extract_pages(pages_ds, *, concurrency: int | tuple[int, int] = 4,
                  batch_size: int = 256, num_cpus: float = 0.5):
    """pages Dataset -> extracted Dataset via the actor pool.

    ``batch_size`` is deliberately small: rows are MB-wide (html binary),
    so batch_size*row_width must fit the worker heap (SURVEY.md
    "Memory-aware").  ``num_cpus=0.5`` per actor: a pool that reserves
    every CPU slot starves the read and shuffle stages of the same
    pipeline and the streaming executor deadlocks (observed at
    concurrency == num_cpus).  Callers at larger scale tune all three.
    """
    return pages_ds.map_batches(
        HtmlExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        zero_copy_batch=True,
    )


class AnchorExtractor:
    """Actor-pool callable: pages batch (url, html) -> one row per
    anchor element, (src_url, dst_url, anchor).  Separate stage from
    HtmlExtractor because the anchor-text index re-parses for the
    <a ...>inner</a> SPAN (href + inner text), which the (text, links)
    surface deliberately does not carry; pipelines that need both run
    both pools over the same pages read.
    """

    def __init__(self) -> None:
        self._pairs = html_extract.extract_anchor_pairs

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        dsts: list[str] = []
        anchors: list[str] = []
        for u, h in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            for dst, text in self._pairs(h, u):
                srcs.append(u)
                dsts.append(dst)
                anchors.append(text)
        return pa.table({"src_url": pa.array(srcs, type=pa.string()),
                         "dst_url": pa.array(dsts, type=pa.string()),
                         "anchor": pa.array(anchors, type=pa.string())})


def extract_anchors(pages_ds, *, concurrency: int | tuple[int, int] = 4,
                    batch_size: int = 256, num_cpus: float = 0.5):
    """pages Dataset -> (src_url, dst_url, anchor) Dataset (same pool
    sizing rationale as extract_pages)."""
    return pages_ds.map_batches(
        AnchorExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        zero_copy_batch=True,
    )
