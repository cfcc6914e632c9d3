"""Extraction pipeline: pages -> text + edges, byte-identical invariant."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from igpm_pem_ray import html_extract, ids
from igpm_pem_ray.graph import build
from igpm_pem_ray.sources import pages as pages_mod


@pytest.fixture(scope="module")
def synth():
    return pages_mod.generate_pages(120, seed=42, m=4)


@pytest.fixture(scope="module")
def pages_ds(synth, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    import pyarrow.parquet as pq
    pq.write_table(synth.table, str(d / "pages.parquet"), row_group_size=32)
    return rd.read_parquet(str(d))


def test_extract_text_unit():
    html = b'<html><head><script>var x="<b>";</script></head><body><h1>A &amp; B</h1>\n<p>hi   there</p></body></html>'
    assert html_extract.extract_text(html) == "A & B hi there"
    assert html_extract.extract_text(b"") == ""


def test_extract_hrefs_unit():
    html = (b'<a href="https://x.example/a#frag">a</a>'
            b"<a href='b/c'>rel</a>"
            b'<a href=https://y.example/bare>bare</a>'
            b'<a href="mailto:z@q">no</a>'
            b'<a id="noref">none</a>')
    got = html_extract.extract_hrefs(html, "https://base.example/dir/page")
    assert got == ["https://x.example/a", "https://base.example/dir/b/c",
                   "https://y.example/bare"]


def test_text_byte_identical_per_url(synth, pages_ds):
    """Distributed extraction == fixture's independently composed text."""
    extracted = build.pages_to_extracted(pages_ds, concurrency=2, batch_size=16)
    got = {r["url"]: r["text"] for r in extracted.select_columns(["url", "text"]).take_all()}
    expect = {u.as_py(): t.as_py() for u, t in zip(synth.table["url"], synth.table["text"])}
    assert got == expect  # byte-identical per url


def test_edges_match_expected(synth, pages_ds):
    edges = build.pages_to_edges(pages_ds, concurrency=2, batch_size=16)
    got = sorted((r["src"], r["dst"]) for r in edges.take_all())
    exp = sorted(
        (ids.url_to_vid(s.as_py()), ids.url_to_vid(d.as_py()))
        for s, d in zip(synth.expected_edges["src_url"], synth.expected_edges["dst_url"])
    )
    assert got == exp  # multigraph: duplicates + self-loops preserved


def test_vid_no_collisions(synth):
    urls = synth.table["url"].to_pylist()
    vids = ids.urls_to_vids(urls)
    assert len(np.unique(vids)) == len(urls)
    assert vids[0] == ids.url_to_vid(urls[0])


def test_dedup_edges_undirected(synth, pages_ds):
    edges = build.pages_to_edges(pages_ds, concurrency=2, batch_size=16)
    simple = build.dedup_edges(edges, undirected=True, drop_self_loops=True)
    rows = [(r["src"], r["dst"]) for r in simple.take_all()]
    assert len(rows) == len(set(rows))
    assert all(s < d for s, d in rows)
    # expected from fixture
    exp = set()
    for s, d in zip(synth.expected_edges["src_url"], synth.expected_edges["dst_url"]):
        a, b = ids.url_to_vid(s.as_py()), ids.url_to_vid(d.as_py())
        if a != b:
            exp.add((min(a, b), max(a, b)))
    assert set(rows) == exp


def test_vertices_from_edges(pages_ds):
    ewu = build.extracted_to_edges(build.pages_to_extracted(pages_ds, concurrency=2, batch_size=16),
                                   keep_urls=True)
    verts = build.vertices_from_edges(ewu)
    rows = verts.take_all()
    assert all(ids.url_to_vid(r["url"]) == r["vid"] for r in rows)
    assert len({r["vid"] for r in rows}) == len(rows)


def test_resumable_sharded_extraction(tmp_path):
    """Sharded edge extraction skips _DONE shards on restart and
    produces the same edge multiset as the direct pipeline."""
    import collections
    import os

    import ray.data as rd

    from igpm_pem_ray.graph import build
    from igpm_pem_ray.sources.pages import write_pages_parquet

    pdir = str(tmp_path / "pages")
    write_pages_parquet(pdir, n_pages=600, seed=3, rows_per_file=100)
    out = str(tmp_path / "edges")
    ds, st = build.pages_to_edges_resumable(pdir, out, files_per_shard=2,
                                            concurrency=1, batch_size=64)
    assert st["computed"] == st["shards"] > 1 and st["skipped"] == 0
    direct = build.pages_to_edges(rd.read_parquet(pdir), concurrency=1,
                                  batch_size=64).to_pandas()
    sharded = ds.to_pandas()
    want = collections.Counter(map(tuple, direct[["src", "dst"]].to_numpy()))
    got = collections.Counter(map(tuple, sharded[["src", "dst"]].to_numpy()))
    assert got == want
    # restart: everything skipped, outputs untouched
    mtimes = {f: os.path.getmtime(os.path.join(r, f))
              for r, _, fs in os.walk(out) for f in fs}
    ds2, st2 = build.pages_to_edges_resumable(pdir, out, files_per_shard=2)
    assert st2["skipped"] == st2["shards"] and st2["computed"] == 0
    mtimes2 = {f: os.path.getmtime(os.path.join(r, f))
               for r, _, fs in os.walk(out) for f in fs}
    assert mtimes == mtimes2
    # a shard missing its marker is recomputed, others stay skipped
    os.remove(os.path.join(out, "shard=00000", "_DONE"))
    _, st3 = build.pages_to_edges_resumable(pdir, out, files_per_shard=2,
                                            concurrency=1, batch_size=64)
    assert st3["computed"] == 1 and st3["skipped"] == st3["shards"] - 1


def test_resumable_extraction_manifest_invalidation(tmp_path):
    """Markers fingerprint the shard's input file list + shard size: a
    changed pages directory or files_per_shard invalidates shards
    instead of silently reusing shifted boundaries, and stale shard
    dirs from a larger prior run are pruned (round-2 ADVICE item)."""
    import collections
    import glob
    import os

    import ray.data as rd

    from igpm_pem_ray.graph import build
    from igpm_pem_ray.sources.pages import write_pages_parquet

    pdir = str(tmp_path / "pages")
    write_pages_parquet(pdir, n_pages=600, seed=4, rows_per_file=100)
    out = str(tmp_path / "edges")
    _, st = build.pages_to_edges_resumable(pdir, out, files_per_shard=1,
                                           concurrency=1, batch_size=64)
    n_small = st["shards"]
    assert n_small == 6
    # different files_per_shard: every shard recomputed, extras pruned
    ds2, st2 = build.pages_to_edges_resumable(pdir, out, files_per_shard=3,
                                              concurrency=1, batch_size=64)
    assert st2["shards"] == 2 and st2["skipped"] == 0
    assert st2["stale_recomputed"] == 2  # shard=00000/00001 reused dirs
    assert len(glob.glob(os.path.join(out, "shard=*"))) == 2
    direct = build.pages_to_edges(rd.read_parquet(pdir), concurrency=1,
                                  batch_size=64).to_pandas()
    got = collections.Counter(map(tuple, ds2.to_pandas()[["src", "dst"]].to_numpy()))
    assert got == collections.Counter(map(tuple, direct[["src", "dst"]].to_numpy()))
    # new input file shifts one shard's recorded inputs -> only the
    # affected shard(s) recompute
    write_pages_parquet(str(tmp_path / "pages_extra"), n_pages=100, seed=9,
                        rows_per_file=100)
    extra = glob.glob(str(tmp_path / "pages_extra" / "*.parquet"))[0]
    os.rename(extra, os.path.join(pdir, "zz_extra.parquet"))
    _, st3 = build.pages_to_edges_resumable(pdir, out, files_per_shard=3,
                                            concurrency=1, batch_size=64)
    assert st3["shards"] == 3
    assert st3["skipped"] == 2 and st3["computed"] == 1


def test_host_extraction_and_host_graph():
    """Vectorized host extraction (port/userinfo/relative cases) and
    the host-level contraction of the synthetic page graph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from igpm_pem_ray.graph.build import host_edges, host_of
    from igpm_pem_ray.sources import pages as pages_mod
    from igpm_pem_ray.graph import build as build_mod

    urls = pa.array([
        "https://a.example/p1",
        "http://b.example:8080/x?q=1",
        "ftp://user@c.example/file",
        "https://d.example",
        "/relative/path",
        "not a url",
    ])
    hosts = host_of(urls).to_pylist()
    assert hosts == ["a.example", "b.example", "c.example", "d.example",
                     None, None]

    synth = pages_mod.generate_pages(150, seed=9, m=3)
    pages = rd.from_arrow(synth.table)
    ex = build_mod.pages_to_extracted(pages, concurrency=2, batch_size=64)
    hg = host_edges(ex).to_pandas()
    # oracle: contract the expected url-level edges by string host
    import collections

    exp = collections.Counter()
    for s, d in zip(synth.expected_edges["src_url"].to_pylist(),
                    synth.expected_edges["dst_url"].to_pylist()):
        exp[(s.split("/")[2], d.split("/")[2])] += 1
    got = {(r.src_host, r.dst_host): r.n_links for r in hg.itertuples()}
    assert got == dict(exp)


def test_jsonl_roundtrip(tmp_path):
    """write_jsonl -> read_jsonl reproduces the documents table;
    rewriting is idempotent (content-hash filenames, no duplicate
    parts on re-run)."""
    import os

    import ray.data as rd

    from igpm_pem_ray.sources.jsonl import read_jsonl, write_jsonl

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    out = str(tmp_path / "docs_jsonl")
    n = write_jsonl(docs, out)
    assert n == docs.count()
    files = sorted(os.listdir(out))
    assert files and all(f.endswith(".jsonl") for f in files)

    back = read_jsonl(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    orig = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.shape == orig.shape
    assert (back["doc_id"].to_numpy() == orig["doc_id"].to_numpy()).all()
    assert (back["text"].to_numpy() == orig["text"].to_numpy()).all()

    # idempotent rewrite: same file set, no appends
    n2 = write_jsonl(docs, out)
    assert n2 == n
    assert sorted(os.listdir(out)) == files


def test_hive_partitioned_edge_sink(tmp_path):
    """Partitioned parquet output (hive layout by bucket): one
    directory per key range so a failed run can skip finished
    partitions; read back filtered by partition — only that
    directory's files are touched."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from igpm_pem_ray.stages.partition import assign_buckets

    rng = np.random.RandomState(4)
    src = rng.randint(0, 1000, 5000).astype(np.int64)
    dst = rng.randint(0, 1000, 5000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    bucketed = assign_buckets(ds, key="src", num_buckets=4)
    out = str(tmp_path / "edges_hive")
    bucketed.write_parquet(out, partition_cols=["bucket"])

    dirs = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert len(dirs) == 4

    back = rd.read_parquet(out).count()
    assert back == 5000
    one = rd.read_parquet(os.path.join(out, "bucket=0")).count()
    per_bucket = rd.read_parquet(out).to_pandas()["bucket"] \
        .astype("int64").value_counts().to_dict()
    assert one == per_bucket[0]


def _stdlib_anchor_pairs(html_bytes: bytes, base_url: str):
    """Independent oracle: stdlib html.parser walk collecting
    (resolved href, collapsed anchor text) — a genuinely different
    implementation path from the regex extractor."""
    from html.parser import HTMLParser
    from urllib.parse import urldefrag, urljoin

    class P(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.out = []
            self._stack = []  # (href or None, [text parts])

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                href = dict(attrs).get("href")
                self._stack.append((href, []))

        def handle_data(self, data):
            for _, parts in self._stack:
                parts.append(data)

        def handle_endtag(self, tag):
            if tag == "a" and self._stack:
                href, parts = self._stack.pop()
                if href is None or not href.strip():
                    return
                absu = urldefrag(urljoin(base_url, href.strip()))[0]
                if absu.startswith(("http://", "https://")):
                    self.out.append((absu, " ".join("".join(parts).split())))

    p = P()
    p.feed(html_bytes.decode("utf-8", errors="replace"))
    return p.out


def test_anchor_pairs_match_stdlib_parser(synth):
    """extract_anchor_pairs == the stdlib HTMLParser oracle on every
    fixture page (the malformed-utf8 edge page has no anchors, so the
    decode-path difference never shows)."""
    for u, h in zip(synth.table["url"].to_pylist(),
                    synth.table["html"].to_pylist()):
        got = html_extract.extract_anchor_pairs(h, u)
        want = _stdlib_anchor_pairs(h, u)
        assert got == want, f"anchor pairs diverge on {u}"


def test_anchor_term_counts_vs_oracle(synth, pages_ds):
    """anchor_term_counts == per-(dst vid, term) counts derived from
    the stdlib-parser pairs over the whole fixture."""
    from collections import Counter

    want: Counter = Counter()
    for u, h in zip(synth.table["url"].to_pylist(),
                    synth.table["html"].to_pylist()):
        for dst, text in _stdlib_anchor_pairs(h, u):
            vid = ids.urls_to_vids([dst])[0]
            for term in text.split():
                want[(vid, term)] += 1

    got = build.anchor_term_counts(pages_ds, concurrency=2,
                                   batch_size=64).to_pandas()
    gmap = {(int(r.dst), r.term): int(r.n) for r in got.itertuples()}
    assert gmap == dict(want)
