"""Deterministic synthetic ``pages`` table (BASELINE.json input_hint).

Schema: url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string — one row per Common-Crawl-style web page.  The HTML embeds
a Barabási–Albert preferential-attachment link structure (the published
algorithm, seeded — mirroring the reference's seeded generators at
/root/reference/generator.py:10-37 in *spirit*, reimplemented from the
paper's description), so the downstream edge table and kernel outputs
are known in closed form.

The ``text`` column holds the expected extracted text, composed
independently from the parts that are rendered into the HTML (tags
become spaces, entities unescape, whitespace collapses) — the
distributed extractor must recover it byte-identically (parse vs
compose, non-circular).

Edge-case pages are appended deterministically at the tail: no links,
self link, duplicate links, relative hrefs, non-UTF-8 bytes, empty
body (FIXTURES.md section 1).

Everything is a pure function of (n_pages, seed); no external data.
"""

from __future__ import annotations

import html as _html
import random
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_SITES = 16
_BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
_VOCAB = (
    "web graph link page rank crawl index query data stream batch shard "
    "vertex edge node hub site anchor text parse token hash merge sort"
).split()
_LANGS = ["en", "en", "en", "en", "en", "en", "de", "en", "fr", "en", "es", "en"]
N_EDGE_CASE_PAGES = 6


def page_url(i: int) -> str:
    return f"https://site{i % N_SITES}.example/p{i}"


def _ba_out_links(n: int, m: int, rng: random.Random) -> list[list[int]]:
    """Preferential attachment: page i (i >= m) links to m targets among
    0..i-1 sampled proportionally to degree (with replacement collapsed
    to distinct).  Standard BA construction; directed new -> old, which
    is how hyperlinks on a growing web point."""
    out: list[list[int]] = [[] for _ in range(n)]
    repeated: list[int] = list(range(m))  # seed nodes, degree 1 each
    for i in range(m, n):
        targets: set[int] = set()
        while len(targets) < min(m, i):
            targets.add(rng.choice(repeated))
        out[i] = sorted(targets)
        for t in targets:
            repeated.append(t)
            repeated.append(i)
    return out


def _collapse(s: str) -> str:
    return " ".join(s.split())


@dataclass
class SynthPages:
    table: pa.Table                      # the pages table
    expected_edges: pa.Table             # url-level (src_url, dst_url, ts)
    n_pages: int


def _render(title: str, para: str, links: list[tuple[str, str]]) -> tuple[bytes, str]:
    """Compose (html_bytes, expected_text) from parts.  links = [(href, anchor_text)]."""
    esc = _html.escape
    body = [
        "<!DOCTYPE html><html><head><title>", esc(title), "</title>",
        "<style>body { margin: 0; }</style>",
        "<script>var x = 1; // not < text ></script>",
        "</head><body><h1>", esc(title), "</h1>",
        "<!-- synthetic page -->",
        "<p>", esc(para), "</p>",
    ]
    for href, atext in links:
        body += ['<a href="', esc(href, quote=True), '">', esc(atext), "</a> "]
    body.append("</body></html>")
    html_bytes = "".join(body).encode("utf-8")
    expected_text = _collapse(" ".join([title, title, para] + [a for _, a in links]))
    return html_bytes, expected_text


def generate_pages(n_pages: int, seed: int = 42, m: int = 4, num_ts_steps: int = 10) -> SynthPages:
    """Deterministic pages table + expected url-level edge list.

    ``ts`` per edge = source-page arrival step (page order bucketed into
    ``num_ts_steps`` tumbling batches), mirroring the reference's
    ``add = row // tm_size`` stamping (/root/reference/load_edgelist.py:25-33).
    """
    assert n_pages >= 16, "need at least 16 pages (m seed nodes + edge cases)"
    rng = random.Random(seed)
    n_core = n_pages - N_EDGE_CASE_PAGES
    out_links = _ba_out_links(n_core, m, rng)

    urls, htmls, texts, langs, warc_ts = [], [], [], [], []
    e_src: list[str] = []
    e_dst: list[str] = []
    e_ts: list[int] = []

    def add_page(i: int, links: list[tuple[str, str]], para: str,
                 html_override: bytes | None = None, text_override: str | None = None,
                 link_targets: list[str] | None = None) -> None:
        u = page_url(i)
        if html_override is None:
            hb, txt = _render(f"Page {i}", para, links)
        else:
            hb, txt = html_override, text_override or ""
        urls.append(u)
        htmls.append(hb)
        texts.append(txt)
        langs.append(_LANGS[i % len(_LANGS)])
        warc_ts.append(_BASE_TS_US + i * 1_000_000)
        step = i * num_ts_steps // n_pages
        for t in (link_targets if link_targets is not None else [h for h, _ in links]):
            e_src.append(u)
            e_dst.append(t)
            e_ts.append(step)

    for i in range(n_core):
        para = " ".join(rng.choice(_VOCAB) for _ in range(10 + i % 7)) + " & done"
        links = [(page_url(t), f"link {j}") for j, t in enumerate(out_links[i])]
        add_page(i, links, para)

    # --- edge-case pages (deterministic tail) ---
    i0 = n_core
    add_page(i0, [], "no links here")                                   # no links
    add_page(i0 + 1, [(page_url(i0 + 1), "self")], "self link")          # self link
    dup = page_url(0)
    add_page(i0 + 2, [(dup, "a"), (dup, "b")], "duplicate links")        # parallel edges
    rel_target = i0 + 3 - N_SITES  # same site -> relative href resolves to a real page
    add_page(i0 + 3, [(f"p{rel_target}", "rel")], "relative href",
             link_targets=[page_url(rel_target)])
    bad = ("<html><body><p>caf" .encode("utf-8") + b"\xe9" + " bytes</p></body></html>".encode("utf-8"))
    add_page(i0 + 4, [], "", html_override=bad, text_override="caf\ufffd bytes")
    add_page(i0 + 5, [], "", html_override=b"", text_override="")        # empty body

    table = pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })
    edges = pa.table({
        "src_url": pa.array(e_src, type=pa.string()),
        "dst_url": pa.array(e_dst, type=pa.string()),
        "ts": pa.array(e_ts, type=pa.int64()),
    })
    return SynthPages(table=table, expected_edges=edges, n_pages=n_pages)


def write_pages_parquet(out_dir: str, n_pages: int, seed: int = 42, m: int = 4,
                        num_ts_steps: int = 10, rows_per_file: int = 4096) -> str:
    """Write the pages table as a directory of Parquet files (multiple
    files + row groups so multi-block behavior is exercised even at
    small scale).  Returns out_dir."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    sp = generate_pages(n_pages, seed=seed, m=m, num_ts_steps=num_ts_steps)
    t = sp.table
    nfiles = max(1, (t.num_rows + rows_per_file - 1) // rows_per_file)
    for f in range(nfiles):
        chunk = t.slice(f * rows_per_file, rows_per_file)
        pq.write_table(chunk, os.path.join(out_dir, f"part-{f:05d}.parquet"),
                       row_group_size=max(256, rows_per_file // 4))
    return out_dir
