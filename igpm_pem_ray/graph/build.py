"""pages -> canonical edge / vertex tables (SURVEY.md section 7.1 steps 2-4).

Pipeline shape (all lazy, streaming):

    read_parquet(pages)                       # columns pruned at the read
      -> map_batches(HtmlExtractor, actor pool)   # html -> text + links
      -> explode links (vectorized Arrow list flatten)
      -> url -> vid hashing (blake2b, ids.py)
      -> optional exact dedup (src,dst) / undirected canonicalization

Reference analogs: the edge tables the reference loads whole into
NetworkX (/root/reference/patternmatching/gray/query_call.py:91-99,
load_edgelist.py:6-41); here they stay partitioned Datasets end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from igpm_pem_ray.ids import urls_to_vids
from igpm_pem_ray.stages.extract import extract_pages


def explode_links(batch: pa.Table) -> pa.Table:
    """(url, links: list<string>, [warc_ts]) -> one row per (src_url, dst_url).

    Vectorized: Arrow ``list_parent_indices`` + ``list_flatten`` — no
    Python loop over rows.
    """
    links = batch["links"]
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    parents = pc.list_parent_indices(links)
    flat = pc.list_flatten(links)
    cols = {
        "src_url": pc.take(batch["url"], parents) if isinstance(batch["url"], pa.ChunkedArray) else batch["url"].take(parents),
        "dst_url": flat,
    }
    if "warc_ts" in batch.column_names:
        cols["src_warc_ts"] = pc.take(batch["warc_ts"], parents)
    return pa.table(cols)


def hash_url_edges(batch: pa.Table) -> pa.Table:
    """(src_url, dst_url[, src_warc_ts]) -> (src, dst: uint64[, ts])."""
    src = urls_to_vids(batch["src_url"])
    dst = urls_to_vids(batch["dst_url"])
    cols: dict = {
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
    }
    if "src_warc_ts" in batch.column_names:
        cols["ts"] = batch["src_warc_ts"].cast(pa.int64())
    return pa.table(cols)


def pages_to_extracted(pages_ds, *, concurrency=4, batch_size: int = 256):
    """pages -> (url, text, links, n_links, ...) via the extractor pool."""
    return extract_pages(pages_ds, concurrency=concurrency, batch_size=batch_size)


def extracted_to_edges(extracted_ds, *, keep_urls: bool = False):
    """extracted -> edge table.  ``keep_urls=True`` retains url columns
    (needed to build the vertices table); default drops them so the edge
    table stays narrow (16 bytes/row)."""
    url_edges = extracted_ds.select_columns(["url", "links"]).map_batches(
        explode_links, batch_format="pyarrow", zero_copy_batch=True
    )
    if keep_urls:
        def hash_keep(batch: pa.Table) -> pa.Table:
            t = hash_url_edges(batch)
            return t.append_column("src_url", batch["src_url"]).append_column(
                "dst_url", batch["dst_url"])
        return url_edges.map_batches(hash_keep, batch_format="pyarrow")
    return url_edges.map_batches(hash_url_edges, batch_format="pyarrow", zero_copy_batch=True)


def pages_to_edges(pages_ds, *, concurrency=4, batch_size: int = 256):
    """End-to-end: pages -> (src, dst) edge Dataset (multigraph: parallel
    edges and self loops preserved; dedup is an explicit operator)."""
    return extracted_to_edges(pages_to_extracted(
        pages_ds, concurrency=concurrency, batch_size=batch_size))


def pages_to_edges_resumable(pages_dir: str, out_dir: str, *,
                             files_per_shard: int = 8,
                             concurrency=4, batch_size: int = 256):
    """Restartable extraction: one OUTPUT DIRECTORY PER INPUT SHARD
    with a ``_DONE`` marker committed after the shard's parquet lands
    (driver spec: "write partitioned Parquet ... so a failed run can
    skip finished partitions; never one giant file").

    A restarted run skips every shard whose marker exists AND whose
    recorded manifest (the shard's exact input file list +
    ``files_per_shard``) still matches — if the pages directory gained
    or lost files, or ``files_per_shard`` changed, shard boundaries
    shift and the stale shard is recomputed instead of silently reused
    (same params-fingerprint discipline as state/checkpoint).  Shard
    directories beyond the current shard count (leftovers of a larger
    previous run) are pruned, and only marked current shards feed the
    returned Dataset.  Partial shards (no marker) are rewritten from
    scratch — markers are the only commit protocol.  Each shard runs
    the normal streaming pipeline internally (actor-pool extraction,
    parallel within the shard), so a crash wastes at most one shard of
    work.  Returns the edge Dataset over all shards."""
    import glob
    import json
    import os
    import shutil

    import ray.data as rd

    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {pages_dir}")
    shards = [files[i:i + files_per_shard]
              for i in range(0, len(files), files_per_shard)]
    done = skipped = stale = 0
    shard_dirs = []
    for si, shard in enumerate(shards):
        sd = os.path.join(out_dir, f"shard={si:05d}")
        shard_dirs.append(sd)
        marker = os.path.join(sd, "_DONE")
        manifest = {"files": shard, "files_per_shard": files_per_shard}
        if os.path.exists(marker):
            try:
                with open(marker) as fh:
                    recorded = json.load(fh)
            except (json.JSONDecodeError, OSError):
                recorded = None  # legacy/corrupt marker: recompute
            if recorded == manifest:
                skipped += 1
                continue
            stale += 1
        shutil.rmtree(sd, ignore_errors=True)  # partial or stale shard
        os.makedirs(sd, exist_ok=True)
        edges = pages_to_edges(rd.read_parquet(shard),
                               concurrency=concurrency,
                               batch_size=batch_size)
        edges.write_parquet(sd)
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, marker)  # atomic commit
        done += 1
    for extra in sorted(glob.glob(os.path.join(out_dir, "shard=*"))):
        if extra not in shard_dirs:  # prior larger run's leftovers
            shutil.rmtree(extra, ignore_errors=True)
    out_files = sorted(f for sd in shard_dirs
                       for f in glob.glob(os.path.join(sd, "*.parquet")))
    ds = rd.read_parquet(out_files)
    return ds, {"shards": len(shards), "computed": done, "skipped": skipped,
                "stale_recomputed": stale}


def vertices_from_edges(edges_with_urls_ds):
    """Distinct (vid, url) over both endpoints.

    Shuffle: groupby on vid (SURVEY.md section 7.3 "distinct vertices").
    """
    from ray.data.aggregate import Min

    # single pass emitting both endpoints (NOT srcs.union(dsts): a union
    # of two branches of the same lineage executes the upstream
    # extraction twice and doubles its actor pools); per-batch np.unique
    # combiner shrinks the shuffle input.
    def both_endpoints(batch: pa.Table) -> pa.Table:
        vid = np.concatenate([batch["src"].to_numpy(zero_copy_only=False),
                              batch["dst"].to_numpy(zero_copy_only=False)])
        url = pa.concat_arrays([batch["src_url"].combine_chunks().cast(pa.string()),
                                batch["dst_url"].combine_chunks().cast(pa.string())]) \
            if isinstance(batch["src_url"], pa.ChunkedArray) else \
            pa.concat_arrays([batch["src_url"], batch["dst_url"]])
        uniq, first_idx = np.unique(vid, return_index=True)
        return pa.table({"vid": uniq, "url": url.take(first_idx)})

    # vid<->url is 1:1 (vid = hash(url)), so Min("url") is "the" url —
    # a vectorized hash aggregate, not per-group Python.
    return edges_with_urls_ds.map_batches(both_endpoints, batch_format="pyarrow",
                                          zero_copy_batch=True) \
        .groupby("vid").aggregate(Min("url", alias_name="url"))


def dedup_edges(edges_ds, *, undirected: bool = False, drop_self_loops: bool = False):
    """Exact (src,dst) dedup — the reference's simple-graph collapse
    ``nx.Graph(multigraph)`` (gray_incremental.py:193; SURVEY.md D6).

    ``undirected=True`` canonicalizes to (min,max) first.
    Shuffle key: (src,dst) via groupby.
    """
    def canon(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        if undirected:
            lo = np.minimum(src, dst)
            hi = np.maximum(src, dst)
            src, dst = lo, hi
        if drop_self_loops:
            keep = src != dst
            src, dst = src[keep], dst[keep]
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    from ray.data.aggregate import Count

    canoned = edges_ds.select_columns(["src", "dst"]).map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True)
    # distinct via vectorized hash aggregate (count then drop), not
    # per-group map_groups (Python once per group = hot-path poison).
    # Per-batch np.unique inside `canon` would be a further combiner;
    # groupby already pre-aggregates per block.
    return canoned.groupby(["src", "dst"]).aggregate(Count(alias_name="_n")).drop_columns(["_n"])


_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?(?P<host>[^/:?#]+)"


def host_of(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized host extraction (scheme://[user@]HOST[:port]/...) —
    one pyarrow extract_regex kernel, no Python-string loop; null for
    non-URL strings (relative hrefs)."""
    import pyarrow.compute as pc

    st = pc.extract_regex(urls, _HOST_RE)
    return pc.struct_field(st, "host")


def host_edges(extracted_ds):
    """extracted (url, links) -> host-level link graph
    (src_host, dst_host, n_links): explode hrefs, extract both hosts
    vectorized, drop non-absolute targets, one (host, host) count
    groupby — the domain-graph contraction of the page graph done at
    the STRING level (before vid hashing), the shape Common-Crawl
    host-graph releases use."""
    from ray.data.aggregate import Count

    url_edges = extracted_ds.select_columns(["url", "links"]).map_batches(
        explode_links, batch_format="pyarrow", zero_copy_batch=True)

    def to_hosts(batch: pa.Table) -> pa.Table:
        sh = host_of(batch["src_url"])
        dh = host_of(batch["dst_url"])
        t = pa.table({"src_host": sh, "dst_host": dh})
        return t.drop_null()

    return url_edges.map_batches(to_hosts, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .groupby(["src_host", "dst_host"]) \
        .aggregate(Count(alias_name="n_links"))


def anchor_term_counts(pages_ds, *, concurrency=4, batch_size: int = 256):
    """pages -> anchor-text index: (dst, term, n) — for every target
    page (hashed vid), how often each whitespace term occurs in the
    anchor text of links POINTING AT it.  The classic web-search
    anchor index (target pages are described by their in-link anchors
    better than by their own text).

    Plan: AnchorExtractor actor pool re-parses (href, inner-text)
    spans -> hash dst urls vectorized -> Arrow split_pattern_regex +
    list_parent_indices explode (no Python loop) -> ONE (dst, term)
    count groupby.  Term explosion happens before the shuffle but
    after per-batch counting would gain nothing (terms per anchor are
    tiny); the single groupby is the only all-to-all."""
    from ray.data.aggregate import Count

    from igpm_pem_ray.stages.extract import extract_anchors

    pairs = extract_anchors(pages_ds, concurrency=concurrency,
                            batch_size=batch_size)

    def explode_terms(batch: pa.Table) -> pa.Table:
        dst = pa.array(urls_to_vids(batch["dst_url"]), type=pa.int64())
        toks = pc.split_pattern_regex(batch["anchor"], r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parents = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        t = pa.table({"dst": pc.take(dst, parents), "term": flat})
        return t.filter(pc.not_equal(t["term"], ""))

    return pairs.map_batches(explode_terms, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["dst", "term"]).aggregate(Count(alias_name="n"))
