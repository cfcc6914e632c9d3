"""Driver contract for the graft builder (Ray Data target).

``entry()``: flagship link-graph pipeline (pages -> extraction ->
edge table -> PageRank) on a deterministic synthetic pages table.
``queries()``: one entry per implemented operator/pipeline from
SURVEY.md section 2 (+ the training-data-pipeline operators), each
taking ``sf_dir``.  ``oracle_sql()``: DuckDB-equivalent SQL for every
SQL-expressible query, same column names, floats as per-row scaled
BIGINTs so value-hashes are reduction-order-robust.

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init``/``ray.shutdown`` anywhere in the library.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_ENTRY_PAGES = 2_000
_PAGES_CACHE = "/tmp/igpm_pem_ray_pages"


def _pages_dir(n_pages: int, seed: int = 42) -> str:
    """Deterministic synthetic pages parquet (cached per size/seed)."""
    from igpm_pem_ray.sources.pages import write_pages_parquet

    d = os.path.join(_PAGES_CACHE, f"n{n_pages}_s{seed}")
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        write_pages_parquet(d, n_pages=n_pages, seed=seed, rows_per_file=4096)
        with open(marker, "w") as fh:
            fh.write("ok")
    return d


def entry() -> Any:
    """pages -> HtmlExtractor actor pool -> edge table -> PageRank to
    1e-6 L1 residual; returns (vid, rank_e8) as a pyarrow Table."""
    import ray.data as rd

    from igpm_pem_ray.graph import build
    from igpm_pem_ray.graph.pagerank import pagerank
    from igpm_pem_ray.pipelines.common import scale_col
    import pyarrow as pa

    pages = rd.read_parquet(_pages_dir(_ENTRY_PAGES))
    edges = build.pages_to_edges(pages, concurrency=4, batch_size=256)
    t = pagerank(edges, damping=0.85, tol=1e-6)
    return pa.table({"vid": t["vid"],
                     "rank_e8": scale_col(t["rank"].to_numpy(), 1e8)})


def _link_graph_queries() -> dict[str, Callable[[str], Any]]:
    """Flagship pipelines over the synthetic pages table (rows-only
    checks; kernel parity is proven in tests/ against oracles and, for
    the co-occurrence graph, in the SQL-checked queries below)."""
    import ray.data as rd

    def _edges_for(sf_dir: str):
        from igpm_pem_ray.graph import build

        n = {"0.001": 2_000, "0.01": 8_000, "0.1": 30_000}.get(
            os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf"), 2_000)
        pages = rd.read_parquet(_pages_dir(n))
        return build.pages_to_edges(pages, concurrency=4, batch_size=256)

    def link_extract_edges(sf_dir: str):
        return _edges_for(sf_dir)

    def link_pagerank(sf_dir: str):
        import pyarrow as pa
        from igpm_pem_ray.graph.pagerank import pagerank
        from igpm_pem_ray.pipelines.common import scale_col

        t = pagerank(_edges_for(sf_dir), tol=1e-6)
        return pa.table({"vid": t["vid"], "rank_e8": scale_col(t["rank"].to_numpy(), 1e8)})

    def link_components(sf_dir: str):
        from igpm_pem_ray.graph.components import connected_components

        return connected_components(_edges_for(sf_dir))

    def link_triangles(sf_dir: str):
        import pyarrow as pa
        from igpm_pem_ray.graph.triangles import triangle_count

        return pa.table({"n_triangles": pa.array(
            [triangle_count(_edges_for(sf_dir))], type="int64")})

    def link_text(sf_dir: str):
        from igpm_pem_ray.graph import build

        n = 2_000
        pages = rd.read_parquet(_pages_dir(n))
        return build.pages_to_extracted(pages, concurrency=4, batch_size=256) \
            .select_columns(["url", "text", "n_links"])

    def link_warc_ingest(sf_dir: str):
        """Common-Crawl-shaped ingestion: pages -> WARC shards ->
        read_warc -> extractor -> edge table (sources/warc.py); the
        WARC hop must be lossless, so the edge table equals the
        parquet-path edge table (asserted in tests)."""
        import os
        from igpm_pem_ray.graph import build
        from igpm_pem_ray.sources.warc import read_warc, write_warc

        pdir = _pages_dir(2_000)
        wdir = os.path.join(_PAGES_CACHE, "warc_n2000_s42")
        marker = os.path.join(wdir, "_DONE")
        if not os.path.exists(marker):
            write_warc(rd.read_parquet(pdir)
                       .select_columns(["url", "warc_ts", "html"]), wdir)
            with open(marker, "w") as fh:
                fh.write("ok")
        pages = read_warc([os.path.join(wdir, f)
                           for f in sorted(os.listdir(wdir))
                           if f.endswith(".warc")])
        return build.pages_to_edges(pages, concurrency=4,
                                    batch_size=256)

    def link_anchor_terms(sf_dir: str):
        from igpm_pem_ray.graph import build

        pages = rd.read_parquet(_pages_dir(2_000))
        return build.anchor_term_counts(pages, concurrency=4, batch_size=256)

    def link_surt_index(sf_dir: str):
        """Canonical + SURT keys for every URL in the link graph
        (pages + link targets), sorted by surt — the CDX index layout
        (one registered domain's pages cluster under a range
        partitioner)."""
        import pyarrow as pa
        from igpm_pem_ray.graph import build
        from igpm_pem_ray.text.urlnorm import url_canonical_table

        pages = rd.read_parquet(_pages_dir(2_000))
        ex = build.pages_to_extracted(pages, concurrency=4, batch_size=256)
        edges = build.extracted_to_edges(ex, keep_urls=True)

        def both(b: pa.Table) -> pa.Table:
            import numpy as np
            u = np.concatenate([b["src_url"].to_numpy(zero_copy_only=False),
                                b["dst_url"].to_numpy(zero_copy_only=False)])
            return pa.table({"url": np.unique(u)})

        from ray.data.aggregate import Count

        urls = edges.map_batches(both, batch_format="pyarrow") \
            .groupby("url").aggregate(Count(alias_name="_n")) \
            .drop_columns(["_n"])
        return url_canonical_table(urls).sort("surt")

    def link_host_graph(sf_dir: str):
        from igpm_pem_ray.graph import build

        pages = rd.read_parquet(_pages_dir(2_000))
        ex = build.pages_to_extracted(pages, concurrency=4, batch_size=256)
        return build.host_edges(ex)

    def link_host_rank(sf_dir: str):
        """HostRank: PageRank over the host-level link graph (the
        standard site-authority signal) — host_edges composed with the
        dense kernel; host names hash to vids via the shared id
        convention, ranks joined back to hosts."""
        import numpy as np
        import pyarrow as pa

        from igpm_pem_ray.graph import build
        from igpm_pem_ray.graph.pagerank import pagerank
        from igpm_pem_ray.ids import urls_to_vids

        pages = rd.read_parquet(_pages_dir(2_000))
        ex = build.pages_to_extracted(pages, concurrency=4, batch_size=256)
        hedges = build.host_edges(ex).materialize()

        def to_vids(b: pa.Table) -> pa.Table:
            return pa.table({
                "src": urls_to_vids(b["src_host"].to_pandas()),
                "dst": urls_to_vids(b["dst_host"].to_pandas())})

        ranks = pagerank(hedges.map_batches(to_vids, batch_format="pyarrow"),
                         tol=1e-9)
        # hosts are few: map vid -> host with one driver-side dict
        hp = hedges.to_pandas()
        names = {}
        for col in ("src_host", "dst_host"):
            s = hp[col]
            for h, v in zip(s, urls_to_vids(s)):
                names[int(v)] = h
        host = [names[int(v)] for v in ranks["vid"].to_pylist()]
        return pa.table({"host": pa.array(host, pa.string()),
                         "rank_e9": pa.array(
                             (np.asarray(ranks["rank"].to_pylist())
                              * 1e9 + 0.5).astype(np.int64))}) \
            .sort_by([("rank_e9", "descending"), ("host", "ascending")])

    def link_host_stats(sf_dir: str):
        import pyarrow as pa
        from ray.data.aggregate import Count
        from igpm_pem_ray.graph.build import host_of

        pages = rd.read_parquet(_pages_dir(2_000)) \
            .select_columns(["url", "lang"])

        def to_host(b: pa.Table) -> pa.Table:
            return pa.table({"host": host_of(b["url"]),
                             "lang": b["lang"]})

        return pages.map_batches(to_host, batch_format="pyarrow") \
            .groupby(["host", "lang"]).aggregate(Count(alias_name="n_pages"))

    def link_mirror_hosts(sf_dir: str):
        """Mirror-host discovery (Bharat-Broder): host pairs whose
        outlink-TARGET sets overlap heavily, after cutting hub targets
        (the df-cut that makes the self-join scale and the metric
        discriminative).  Rows-only: hosts come from the synthetic
        pages, not a DuckDB view; the kernel itself is SQL-oracled via
        `mirror_suppliers`."""
        import pyarrow as pa

        from igpm_pem_ray.graph import build
        from igpm_pem_ray.graph.mirror import neighbor_jaccard_pairs

        pages = rd.read_parquet(_pages_dir(2_000))
        ex = build.pages_to_extracted(pages, concurrency=4, batch_size=256)
        adj = build.host_edges(ex).drop_columns(["n_links"]) \
            .rename_columns({"src_host": "v", "dst_host": "n"})
        return neighbor_jaccard_pairs(adj, min_jaccard_e6=300_000,
                                      max_neighbor_indeg=64)

    return {
        "link_extract_edges": link_extract_edges,
        "link_pagerank": link_pagerank,
        "link_components": link_components,
        "link_triangles": link_triangles,
        "link_extract_text": link_text,
        "link_host_graph": link_host_graph,
        "link_anchor_terms": link_anchor_terms,
        "link_warc_ingest": link_warc_ingest,
        "link_surt_index": link_surt_index,
        "link_host_stats": link_host_stats,
        "link_host_rank": link_host_rank,
        "link_mirror_hosts": link_mirror_hosts,
    }


def _text_queries() -> dict[str, Callable[[str], Any]]:
    def near_dup_groups(sf_dir: str):
        from igpm_pem_ray.pipelines.common import read_table
        from igpm_pem_ray.text.dedup import near_dup_groups as ndg

        return ndg(read_table(sf_dir, "documents", columns=["doc_id", "text"]))

    def simhash(sf_dir: str):
        from igpm_pem_ray.pipelines.common import read_table
        from igpm_pem_ray.text.dedup import simhash_table

        return simhash_table(read_table(sf_dir, "documents", columns=["doc_id", "text"]))

    def lang_id(sf_dir: str):
        from ray.data.aggregate import Count
        from igpm_pem_ray.pipelines.common import read_table
        from igpm_pem_ray.text.analysis import LangId

        docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        return docs.map_batches(LangId, batch_format="pandas", concurrency=2) \
                   .groupby("lang_pred").aggregate(Count(alias_name="n_docs"))

    def doc_fingerprint(sf_dir: str):
        from igpm_pem_ray.pipelines.common import read_table
        from igpm_pem_ray.text.analysis import Fingerprinter

        docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        return docs.map_batches(Fingerprinter, batch_format="pandas", concurrency=2) \
                   .select_columns(["doc_id", "fp64"])

    def bpe_merges(sf_dir: str):
        """Learned BPE merge table over the documents corpus
        (text/bpe.py): corpus-scale word-count groupby once, then
        vocab-bounded Dataset merge rounds.  Rows-only (iterative
        argmax; pytest-oracle-backed against the single-process
        Sennrich reference)."""
        from igpm_pem_ray.pipelines.common import read_table
        from igpm_pem_ray.text.bpe import learn_bpe

        docs = read_table(sf_dir, "documents", columns=["text"])
        return learn_bpe(docs, 12)

    def bpe_encode(sf_dir: str):
        """Tokenizer APPLICATION: learn 12 merges, then encode the
        corpus with a BpeEncoder actor pool (rank dict + per-actor
        word cache built once in __init__) -> per-doc word and BPE
        token counts.  Rows-only; exact parity with a single-process
        reference encode is pytest-pinned (tests/test_text.py)."""
        from igpm_pem_ray.pipelines.common import read_table
        from igpm_pem_ray.text.bpe import encode_bpe, learn_bpe

        docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        merges = learn_bpe(docs, 12)
        return encode_bpe(docs, merges)

    def ann_lsh(sf_dir: str):
        import numpy as np
        import pyarrow.parquet as pq
        from igpm_pem_ray.ann.knn import lsh_topk
        from igpm_pem_ray.pipelines.common import read_table

        qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"],
                             filters=[("vec_id", "==", 0)])
        qvec = np.asarray(qtbl["embedding"][0].as_py(), dtype=np.float64)[None, :]
        emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        return lsh_topk(emb, qvec, k=10, nbits=4)

    def ann_ivf(sf_dir: str):
        """IVF ANN over the embeddings table (coarse k-means quantizer
        trained on a deterministic sample; nprobe-bucket scan)."""
        import numpy as np
        import pyarrow.parquet as pq
        from igpm_pem_ray.ann.knn import ivf_topk
        from igpm_pem_ray.pipelines.common import read_table

        qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"],
                             filters=[("vec_id", "==", 0)])
        qvec = np.asarray(qtbl["embedding"][0].as_py(), dtype=np.float64)[None, :]
        emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        return ivf_topk(emb, qvec, k=10, nlist=8, nprobe=3)

    def doc_winnow(sf_dir: str):
        """Winnowing rolling-hash fingerprints (SIGMOD'03), one row per
        selected k-gram — the overlap-detection index."""
        from igpm_pem_ray.pipelines.common import read_table
        from igpm_pem_ray.text.analysis import WinnowFingerprinter

        docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        return docs.map_batches(WinnowFingerprinter, batch_format="pandas",
                                concurrency=2)

    def simhash_near_dup(sf_dir: str):
        """SimHash-band near-dup candidates verified by exact n-gram
        Jaccard (the second dedup sketch family, same verify stage)."""
        import pandas as pd
        from igpm_pem_ray.pipelines.common import read_table
        from igpm_pem_ray.text.dedup import simhash_candidate_pairs, verify_pairs

        docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]) \
            .materialize()
        cand = simhash_candidate_pairs(docs, band_bits=8).materialize()
        if cand.count() == 0:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "jaccard_e6": pd.Series(dtype="int64")})
        return verify_pairs(cand, docs, threshold=0.8)

    def doc_overlap(sf_dir: str):
        """Winnowing-fingerprint overlap pairs (MOSS pattern): docs
        sharing >= 3 selected k-gram fingerprints."""
        from igpm_pem_ray.pipelines.common import read_table
        from igpm_pem_ray.text.dedup import winnow_overlap_pairs

        docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        return winnow_overlap_pairs(docs, min_shared=3)

    def embed_near_dup_groups(sf_dir: str):
        """Cosine-near-dup clusters over the embeddings table (WCC over
        the pair graph; exact-pairs variant)."""
        from igpm_pem_ray.ann.embed_dedup import near_dup_groups_embedding
        from igpm_pem_ray.pipelines.common import read_table
        from igpm_pem_ray.pipelines.relational import EMBED_DUP_T

        emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        return near_dup_groups_embedding(emb, threshold=EMBED_DUP_T)

    def incremental_steps(sf_dir: str):
        """Batch-dynamic replay (K7 analog) over the ts-stamped fixture
        edge stream: one row of metrics per tumbling ts batch."""
        import pyarrow as pa
        import ray.data as rd

        from igpm_pem_ray.graph.build import extracted_to_edges, pages_to_extracted
        from igpm_pem_ray.graph.incremental import IncrementalRunner
        from igpm_pem_ray.sources.pages import generate_pages
        from igpm_pem_ray import ids as ids_mod

        sp = generate_pages(400, seed=42)
        e = sp.expected_edges
        ds = rd.from_arrow(pa.table({
            "src": pa.array(ids_mod.urls_to_vids(e["src_url"].to_pylist())),
            "dst": pa.array(ids_mod.urls_to_vids(e["dst_url"].to_pylist())),
            "ts": e["ts"],
        }))
        steps = IncrementalRunner(ds, base_steps=2).run()
        import pandas as pd

        return pd.DataFrame(steps)

    def multimodal_features(sf_dir: str):
        """Actor-pool image decode over REAL deterministic PNG payloads
        (pure-zlib codec, multimodal/codec.py): binary column in, narrow
        typed features out, payload dropped at the decode stage."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from igpm_pem_ray.multimodal.codec import encode_png
        from igpm_pem_ray.multimodal.decode import decode_images

        rng = np.random.RandomState(13)
        payloads = [encode_png(rng.randint(0, 256, size=(16, 16, 3))
                               .astype(np.uint8)) for _ in range(64)]
        media = rd.from_arrow(pa.table({
            "media_id": pa.array(list(range(64)), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }))
        return decode_images(media, concurrency=2, batch_size=16)

    def schema_evolution_union(sf_dir: str):
        """UNION BY NAME over two drifted page-table generations
        (sources/evolve.py): gen1 lacks lang and carries int32
        n_links, gen2 has the full schema — the merged Dataset
        promotes types and null-fills, then one groupby proves the
        rows survived."""
        import pyarrow as pa
        import ray.data as rd
        from igpm_pem_ray.sources.evolve import union_by_name
        from ray.data.aggregate import Count

        pages = rd.read_parquet(_pages_dir(2_000))
        gen1 = pages.select_columns(["url", "text"]) \
            .map_batches(lambda b: pa.table({
                "url": b["url"],
                "n_links": pa.array([len(t or "") % 7 for t in
                                     b["text"].to_pylist()],
                                    pa.int32())}),
                batch_format="pyarrow")
        gen2 = pages.select_columns(["url", "lang"]) \
            .map_batches(lambda b: pa.table({
                "url": b["url"], "lang": b["lang"],
                "n_links": pa.array([0] * b.num_rows, pa.int64())}),
                batch_format="pyarrow")
        u = union_by_name([gen1, gen2])
        filled = u.map_batches(
            lambda b: b.set_column(
                b.column_names.index("lang"), "lang",
                pa.compute.fill_null(b["lang"], "unknown")),
            batch_format="pyarrow")
        return filled.groupby("lang").aggregate(Count(alias_name="n"))

    def video_scene_cuts(sf_dir: str):
        """Shot-boundary detection over deterministic synthetic
        multi-frame videos with planted hard cuts (multimodal/
        decode.SceneCuts: exact integer SAD over the NPNG container;
        planted-cut recovery is pytest-pinned)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from igpm_pem_ray.multimodal.codec import encode_frames
        from igpm_pem_ray.multimodal.decode import scene_cuts

        rng = np.random.RandomState(5)
        vids = []
        for _ in range(12):
            frames = []
            level = int(rng.randint(0, 200))
            for scene in range(3):
                for j in range(4):
                    img = np.full((8, 8, 3), level, np.uint8)
                    img[0, 0, 0] = (level + j) % 256
                    frames.append(img)
                level = (level + 97) % 256
            vids.append(encode_frames(frames))
        media = rd.from_arrow(pa.table({
            "media_id": pa.array(range(len(vids)), pa.int64()),
            "payload": pa.array(vids, pa.binary())}))
        return scene_cuts(media, concurrency=2, batch_size=4)

    def audio_near_dup(sf_dir: str):
        """Spectral-fingerprint audio near-dup pairs over a
        deterministic synthetic WAV corpus with planted gain-scaled
        copies (multimodal/afp.py: framed rFFT band peaks -> int64
        frame hashes -> the mirror kernel's inverted-index Jaccard
        join)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from igpm_pem_ray.multimodal.afp import audio_near_dup_pairs
        from igpm_pem_ray.multimodal.codec import encode_wav

        rate, n = 16_000, 16_000  # 1 s clips
        t = np.arange(n) / rate
        payloads = []
        for i in range(24):
            f1, f2 = 180.0 + 111.0 * i, 500.0 + 137.0 * i
            x = 0.6 * np.sin(2 * np.pi * f1 * t) \
                + 0.3 * np.sin(2 * np.pi * f2 * t)
            payloads.append(encode_wav(x, rate))
            if i % 4 == 0:  # planted near-dup: volume-scaled copy
                payloads.append(encode_wav(0.5 * x, rate))
        media = rd.from_arrow(pa.table({
            "media_id": pa.array(list(range(len(payloads))), pa.int64()),
            "payload": pa.array(payloads, pa.binary())}))
        return audio_near_dup_pairs(media, min_jaccard_e6=600_000)

    def image_phash_near_dup(sf_dir: str):
        """Perceptual-hash image near-dup pairs over a deterministic
        synthetic corpus with planted edited copies (DCT pHash + 8x8
        band self-join, multimodal/phash.py)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from igpm_pem_ray.multimodal.codec import encode_png
        from igpm_pem_ray.multimodal.phash import phash_near_dup_pairs

        rng = np.random.RandomState(17)
        payloads = []
        for i in range(32):
            base = ((np.arange(24)[:, None, None] * (3 + i)
                     + np.arange(24)[None, :, None] * (7 + i)) % 256) \
                .repeat(3, axis=2).astype(np.uint8)
            payloads.append(encode_png(base))
            if i % 4 == 0:  # planted near-dup: small local edit
                dup = base.copy()
                dup[2:4, 2:4] = 128
                payloads.append(encode_png(dup))
        media = rd.from_arrow(pa.table({
            "media_id": pa.array(list(range(len(payloads))), pa.int64()),
            "payload": pa.array(payloads, pa.binary())}))
        return phash_near_dup_pairs(media, max_hamming=7)

    return {
        "near_dup_groups": near_dup_groups,
        "simhash": simhash,
        "lang_id": lang_id,
        "doc_fingerprint": doc_fingerprint,
        "bpe_merges": bpe_merges,
        "bpe_encode": bpe_encode,
        "ann_lsh": ann_lsh,
        "ann_ivf": ann_ivf,
        "embed_near_dup_groups": embed_near_dup_groups,
        "doc_winnow": doc_winnow,
        "doc_overlap": doc_overlap,
        "simhash_near_dup": simhash_near_dup,
        "pattern_match_approx": pattern_match_approx,
        "incremental_steps": incremental_steps,
        "multimodal_features": multimodal_features,
        "video_scene_cuts": video_scene_cuts,
        "schema_evolution_union": schema_evolution_union,
        "image_phash_near_dup": image_phash_near_dup,
        "audio_near_dup": audio_near_dup,
        "pattern_match": pattern_match,
        "extract_paths": extract_paths,
    }


def pattern_match(sf_dir: str):
    """Subgraph pattern matching (G-Ray analog) on the in-repo sample
    graph (sources/fixtures.py — test1p-equivalent): triangle query.
    Rows-only; full golden parity in tests/test_match.py."""
    import pandas as pd

    from igpm_pem_ray.match.subgraph import match_sets
    from igpm_pem_ray.sources.fixtures import load_sample_graph

    v, e = load_sample_graph()
    sets = match_sets(v, e, "--vertex a b c --edge x:a:b y:b:c z:c:a".split())
    return pd.DataFrame({"match_id": range(len(sets)),
                         "vids": [",".join(map(str, s)) for s in sets]})


def extract_paths(sf_dir: str):
    """EXTRACT best-path scoring (K5 path-choice semantics) on the
    reference's sample graph: RWR-weighted best paths from each label
    seed.  Rows-only; recurrence parity in tests/test_match.py."""
    from igpm_pem_ray.match.extract import Extract
    from igpm_pem_ray.sources.fixtures import load_sample_graph

    _, e = load_sample_graph()
    return Extract(e).best_paths([0, 2, 5])


def pattern_match_approx(sf_dir: str):
    """Approximate (one-edge-missing) pattern matching — the
    reference's num_approx counter surface (gray_incremental.py:
    201-202).  Rows-only; oracle in tests/test_match.py."""
    import pandas as pd

    from igpm_pem_ray.match.query import parse_query_args
    from igpm_pem_ray.match.subgraph import SubgraphMatcher
    from igpm_pem_ray.sources.fixtures import load_sample_graph

    v, e = load_sample_graph()
    q = parse_query_args("--vertex a b c --edge x:a:b y:b:c z:c:a".split())
    approx = SubgraphMatcher(v, e).match_approx(q)
    return pd.DataFrame({
        "match_id": range(len(approx)),
        "vids": [",".join(map(str, s)) for s in approx["_vidset"]],
        "missing": list(approx["_missing"]),
    })


def queries() -> dict[str, Callable[[str], Any]]:
    from igpm_pem_ray.pipelines import analytics as an
    from igpm_pem_ray.pipelines import graph_queries as g
    from igpm_pem_ray.pipelines import relational as r

    out: dict[str, Callable[[str], Any]] = {
        # graph kernels on the SQL-expressible co-occurrence graph
        "graph_edges": g.q_graph_edges,
        "pagerank_fixed": g.q_pagerank_fixed,
        "pagerank": g.q_pagerank,
        "pagerank_shuffle": g.q_pagerank_shuffle,
        "cc_shuffle": g.q_cc_shuffle,
        "lp_shuffle": g.q_lp_shuffle,
        "rwr": g.q_rwr,
        "connected_components": g.q_connected_components,
        "component_sizes": g.q_component_sizes,
        "label_propagation": g.q_label_propagation,
        "triangle_count": g.q_triangle_count,
        "doulion_triangles": g.q_doulion_triangles,
        "salsa": g.q_salsa,
        "star_count": g.q_star_count,
        "clustering_coeff": g.q_clustering_coeff,
        "kcore": g.q_kcore,
        "kcore_hindex": g.q_kcore_hindex,
        "kcore_hindex_r4": g.q_kcore_hindex_r4,
        "link_predict": g.q_link_predict,
        "link_predict_jaccard": g.q_link_predict_jaccard,
        "link_predict_ra": g.q_link_predict_ra,
        "avg_neighbor_degree": g.q_avg_neighbor_degree,
        "knn_curve": g.q_knn_curve,
        "bfs_levels": g.q_bfs_levels,
        "hits": g.q_hits,
        "brand_graph": g.q_brand_graph,
        "assortativity": g.q_assortativity,
        "reciprocity": g.q_reciprocity,
        "two_hop": g.q_two_hop,
        "scc": g.q_scc,
        "scc_shuffle": g.q_scc_shuffle,
        "bowtie": g.q_bowtie,
        "eccentricity": g.q_eccentricity,
        "eccentricity_shuffle": g.q_eccentricity_shuffle,
        "closeness": g.q_closeness,
        "closeness_shuffle": g.q_closeness_shuffle,
        "distance_hist": g.q_distance_hist,
        "distance_hist_shuffle": g.q_distance_hist_shuffle,
        "harmonic_centrality": g.q_harmonic_centrality,
        "harmonic_shuffle": g.q_harmonic_shuffle,
        "harmonic_hll": g.q_harmonic_hll,
        "effective_diameter": g.q_effective_diameter,
        "effective_diameter_shuffle": g.q_effective_diameter_shuffle,
        "random_walks": g.q_random_walks,
        "walk_pairs": g.q_walk_pairs,
        "msf_forest": g.q_msf_forest,
        "msf_shuffle": g.q_msf_shuffle,
        "quad_count": g.q_quad_count,
        "coloring": g.q_coloring,
        "pagerank_weighted": g.q_pagerank_weighted,
        "pagerank_topic": g.q_pagerank_topic,
        "katz": g.q_katz,
        "partition_stats": g.q_partition_stats,
        "negative_samples": g.q_negative_samples,
        "katz_shuffle": g.q_katz_shuffle,
        "modularity": g.q_modularity,
        "louvain": g.q_louvain,
        "spam_mass": g.q_spam_mass,
        "betweenness_k2": g.q_betweenness_k2,
        "betweenness_k2_shuffle": g.q_betweenness_k2_shuffle,
        "betweenness_sampled": g.q_betweenness_sampled,
        "sssp": g.q_sssp,
        "sssp_shuffle": g.q_sssp_shuffle,
        "mis": g.q_mis,
        "mis_shuffle": g.q_mis_shuffle,
        "coloring_check": g.q_coloring_check,
        "msf_check": g.q_msf_check,
        "dag_layers": g.q_dag_layers,
        "rich_club": g.q_rich_club,
        "ktruss": g.q_ktruss,
        "truss_shuffle": g.q_truss_shuffle,
        "truss_peel": g.q_truss_peel,
        "ktruss_members": g.q_ktruss_members,
        "degree_distribution": g.q_degree_distribution,
        # relational / streaming / text-table operators
        "filter_project": r.q_filter_project,
        "group_agg": r.q_group_agg,
        "topk_orders": r.q_topk_orders,
        "join_broadcast": r.q_join_broadcast,
        "join_hash": r.q_join_hash,
        "anti_join": r.q_anti_join,
        "semi_join": r.q_semi_join,
        "join_outer": r.q_join_outer,
        "stratified_sample": r.q_stratified_sample,
        "overlap_join": r.q_overlap_join,
        "props_scrub": r.q_props_scrub,
        "quantile_cont_events": r.q_quantile_cont_events,
        "bloom_semi_join": r.q_bloom_semi_join,
        "corpus_curation": r.q_corpus_curation,
        "quartile_orders": r.q_quartile_orders,
        "event_bigrams": r.q_event_bigrams,
        "kmeans_embed": r.q_kmeans_embed,
        "kcenter_sample": r.q_kcenter_sample,
        "embed_quantize": an.q_embed_quantize,
        "knn_label_agreement": an.q_knn_label_agreement,
        "window_events": r.q_window_events,
        "ts_rebase": r.q_ts_rebase,
        "ts_window_filter": r.q_ts_window_filter,
        "distinct_union": r.q_distinct_union,
        "sessionize_events": r.q_sessionize,
        "event_funnel": r.q_event_funnel,
        "event_gaps": r.q_event_gaps,
        "approx_quantiles_price": r.q_approx_quantiles_price,
        "heavy_hitter_tokens": r.q_heavy_hitter_tokens,
        "approx_token_freq": r.q_approx_token_freq,
        "user_retention": r.q_user_retention,
        "outlier_events": r.q_outlier_events,
        "event_rate_anomaly": r.q_event_rate_anomaly,
        "event_debounce": r.q_event_debounce,
        "rolling_events": r.q_rolling_events,
        "event_trigrams": r.q_event_trigrams,
        "temporal_pairs": r.q_temporal_pairs,
        "temporal_triples": r.q_temporal_triples,
        "phrase_search": an.q_phrase_search,
        "boilerplate_terms": an.q_boilerplate_terms,
        "pack_docs": an.q_pack_docs,
        "percent_rank_orders": r.q_percent_rank_orders,
        "mirror_suppliers": g.q_mirror_suppliers,
        "mirror_clusters": g.q_mirror_clusters,
        "robustness_attack": g.q_robustness_attack,
        "random_attack": g.q_random_attack,
        "degree_gini": g.q_degree_gini,
        "vocab_growth": an.q_vocab_growth,
        "hourly_profile": r.q_hourly_profile,
        "skyline_parts": r.q_skyline_parts,
        "readability": an.q_readability,
        "islands_orders": r.q_islands_orders,
        "edit_dist_pairs": an.q_edit_dist_pairs,
        "name_clusters": an.q_name_clusters,
        "seq_baskets": an.q_seq_baskets,
        "part_trends": an.q_part_trends,
        "decay_counts": r.q_decay_counts,
        "butterflies": g.q_butterflies,
        "temporal_reach": g.q_temporal_reach,
        "dag_paths": g.q_dag_paths,
        "widest_path": g.q_widest_path,
        "target_encode": r.q_target_encode,
        "consistent_hash": r.q_consistent_hash,
        "zorder_keys": r.q_zorder_keys,
        "late_events": r.q_late_events,
        "item_cf": an.q_item_cf,
        "sssp_parents": g.q_sssp_parents,
        "zone_maps": r.q_zone_maps,
        "set_cover": an.q_set_cover,
        "join_size_sketch": an.q_join_size_sketch,
        "pca_power": an.q_pca_power,
        "grouping_sets": r.q_grouping_sets,
        "fd_discovery": r.q_fd_discovery,
        "bloom_fpr": r.q_bloom_fpr,
        "ivm_delta": r.q_ivm_delta,
        "auc_exact": r.q_auc_exact,
        "survivorship": an.q_survivorship,
        "ntile_orders": r.q_ntile_orders,
        "q3_shipping": an.q_q3_shipping,
        "window_distinct": r.q_window_distinct,
        "calibration_bins": r.q_calibration_bins,
        "closure_rate": g.q_closure_rate,
        "score_drift": r.q_score_drift,
        "cohort_matrix": r.q_cohort_matrix,
        "above_own_avg": r.q_above_own_avg,
        "cum_uniques": r.q_cum_uniques,
        "minhash_acc": an.q_minhash_acc,
        "conductance": g.q_conductance,
        "friendship_paradox": g.q_friendship_paradox,
        "except_all": r.q_except_all,
        "kmv_distinct": r.q_kmv_distinct,
        "bipartite_check": g.q_bipartite_check,
        "lorenz_deciles": r.q_lorenz_deciles,
        "median_nation": r.q_median_nation,
        "vertex_cover": g.q_vertex_cover,
        "rrf_fusion": an.q_rrf_fusion,
        "decision_stump": r.q_decision_stump,
        "allen_census": r.q_allen_census,
        "influence_spread": g.q_influence_spread,
        "clique4_count": g.q_clique4_count,
        "attribution_u": r.q_attribution_u,
        "activity_selection": r.q_activity_selection,
        "landmark_distance": g.q_landmark_distance,
        "pointer_jump": g.q_pointer_jump,
        "semdedup": an.q_semdedup,
        "intersect_all": r.q_intersect_all,
        "unpivot_measures": r.q_unpivot,
        "quality_classifier": an.q_quality_classifier,
        "bom_explode": g.q_bom_explode,
        "ppr_push": g.q_ppr_push,
        "l_diversity": r.q_l_diversity,
        "seasonal_naive": r.q_seasonal_naive,
        "rank_corr": an.q_rank_corr,
        "ohlc_daily": r.q_ohlc_daily,
        "transitive_reduce": g.q_transitive_reduce,
        "rfm_segments": r.q_rfm_segments,
        "fifo_allocation": r.q_fifo_allocation,
        "snapshot_asof": r.q_snapshot_asof,
        "shapley_attribution": r.q_shapley_attribution,
        "universe_sample": r.q_universe_sample,
        "config_model": g.q_config_model,
        "diff_in_diff": r.q_diff_in_diff,
        "profile_table": r.q_profile_table,
        "dominating_set": g.q_dominating_set,
        "chunk_overlap": an.q_chunk_overlap,
        "max_drawdown": r.q_max_drawdown,
        "ri_audit": r.q_ri_audit,
        "systematic_sample": r.q_systematic_sample,
        "moments_quantity": r.q_moments_quantity,
        "seeded_labelprop": g.q_seeded_labelprop,
        "doc_compress_ratio": an.q_doc_compress_ratio,
        "nest_orders": r.q_nest_orders,
        "ego_2hop": g.q_ego_2hop,
        "seq_match": r.q_seq_match,
        "retrieval_eval": an.q_retrieval_eval,
        "orbit_counts": g.q_orbit_counts,
        "encoding_advisor": r.q_encoding_advisor,
        "fd_repair": r.q_fd_repair,
        "anonymize_lattice": r.q_anonymize_lattice,
        "critical_path": g.q_critical_path,
        "queue_delay": r.q_queue_delay,
        "ks_test": r.q_ks_test,
        "cvm_test": r.q_cvm_test,
        "wasserstein1": r.q_wasserstein1,
        "dispersion_index": r.q_dispersion_index,
        "conformal_coverage": r.q_conformal_coverage,
        "energy_distance": r.q_energy_distance,
        "ppr_mc": g.q_ppr_mc,
        "matching": g.q_matching,
        "local_bridges": g.q_local_bridges,
        "gnn_features": g.q_gnn_features,
        "interval_cover": r.q_interval_cover,
        "mad_outliers": r.q_mad_outliers,
        "window_topk": r.q_window_topk,
        "weighted_sample": r.q_weighted_sample,
        "benford_prices": r.q_benford_prices,
        "k_anonymity": r.q_k_anonymity,
        "cusum_events": r.q_cusum_events,
        "gini_nation": r.q_gini_nation,
        "funnel_latency": r.q_funnel_latency,
        "daily_autocorr": r.q_daily_autocorr,
        "km_interorder": r.q_km_interorder,
        "max_concurrency": r.q_max_concurrency,
        "priority_transitions": r.q_priority_transitions,
        "tree_rollup": r.q_tree_rollup,
        "precedence_counts": r.q_precedence_counts,
        "winsorized_mean": r.q_winsorized_mean,
        "ship_delay": r.q_ship_delay,
        "upsert_latest": r.q_upsert_latest,
        "scd_intervals": r.q_scd_intervals,
        "journey_paths": r.q_journey_paths,
        "json_extract_stats": r.q_json_extract_stats,
        "densify_hours": r.q_densify_hours,
        "table_checksum": r.q_table_checksum,
        "user_diversity": r.q_user_diversity,
        "user_features": r.q_user_features,
        "adoption_curve": r.q_adoption_curve,
        "ab_test": r.q_ab_test,
        "activity_corr": r.q_activity_corr,
        "halfsample_replicates": r.q_halfsample_replicates,
        "key_skew": r.q_key_skew,
        "dup_payments": r.q_dup_payments,
        "lexical_diversity": an.q_lexical_diversity,
        "source_vocab_overlap": an.q_source_vocab_overlap,
        "label_centroids": an.q_label_centroids,
        "hapax_ratio": an.q_hapax_ratio,
        "revenue_share": an.q_revenue_share,
        "bool_and_search": an.q_bool_and_search,
        "centroid_distances": an.q_centroid_distances,
        "walk_returns": g.q_walk_returns,
        "brand_homophily": g.q_brand_homophily,
        "densest_subgraph": g.q_densest_subgraph,
        "cosine_gram_pairs": an.q_cosine_gram_pairs,
        "transitivity": g.q_transitivity,
        "latest_events": r.q_latest_events,
        "topk_per_customer": r.q_topk_per_customer,
        "sliding_window": r.q_sliding_window,
        "quantile_events": r.q_quantile_events,
        "train_val_split": r.q_train_val_split,
        "asof_attrib": r.q_asof_attrib,
        "range_join_windows": r.q_range_join,
        "cumsum_orders": r.q_cumsum_orders,
        "condition_filter": r.q_condition_filter,
        "sample_orders": r.q_sample,
        "doc_dedup_exact": r.q_doc_dedup_exact,
        "doc_tokens": r.q_doc_tokens,
        "doc_quality": r.q_doc_quality,
        "gopher_quality": r.q_gopher_quality,
        "quality_sample": r.q_quality_sample,
        "span_dedup": r.q_span_dedup,
        "blocklist_filter": r.q_blocklist_filter,
        "lang_dist": r.q_lang_dist,
        "ann_cosine": r.q_ann_cosine,
        "embed_near_dup": r.q_embed_near_dup,
        # round-3 analytics batch (pipelines/analytics.py)
        "group_stats": an.q_group_stats,
        "distinct_parts": an.q_distinct_parts,
        "histogram_orders": an.q_histogram_orders,
        "star_join": an.q_star_join,
        "pivot_status": an.q_pivot_status,
        "group_agg_salted": an.q_group_agg_salted,
        "unnest_embed": an.q_unnest_embed,
        "string_funcs": an.q_string_funcs,
        "rollup_revenue": an.q_rollup_revenue,
        "jaccard_pairs": an.q_jaccard_pairs,
        "containment_pairs": an.q_containment_pairs,
        "top_tokens": an.q_top_tokens,
        "doc_chunks": an.q_doc_chunks,
        "pack_windows": an.q_pack_windows,
        "doc_tokens_bpe": an.q_doc_tokens_bpe,
        "tfidf_terms": an.q_tfidf_terms,
        "bm25_topk": an.q_bm25_topk,
        "region_revenue": an.q_region_revenue,
        "mode_priority": an.q_mode_priority,
        "corr_price_qty": an.q_corr_price_qty,
        "ols_price_qty": an.q_ols_price_qty,
        "embed_dim_stats": an.q_embed_dim_stats,
        "dq_checks": an.q_dq_checks,
        "table_diff": an.q_table_diff,
        "cube_revenue": an.q_cube_revenue,
        "assoc_rules": an.q_assoc_rules,
        "word_bigrams": an.q_word_bigrams,
        "textrank_terms": an.q_textrank_terms,
        "bigram_lift": an.q_bigram_lift,
        "lang_source_chi2": an.q_lang_source_chi2,
        "doc_rarity": an.q_doc_rarity,
        "inverted_index": an.q_inverted_index,
        "embed_covariance": an.q_embed_covariance,
        "decontaminate": an.q_decontaminate,
        "approx_distinct_users": an.q_approx_distinct_users,
        "bigram_lm": an.q_bigram_lm,
        "dsir_weights": an.q_dsir_weights,
        "domain_mix_sample": an.q_domain_mix_sample,
        "kcore_peel": g.q_kcore_peel,
        "eigen_walks": g.q_eigen_walks,
        "triad_census": g.q_triad_census,
        "simrank_mc": g.q_simrank_mc,
        "wl_refinement": g.q_wl_refinement,
        "graph_churn": g.q_graph_churn,
        "pagerank_mc": g.q_pagerank_mc,
        "percolation_curve": g.q_percolation_curve,
    }
    out.update(_link_graph_queries())
    out.update(_text_queries())
    return out


def oracle_sql() -> dict[str, str]:
    from igpm_pem_ray.pipelines import analytics as an
    from igpm_pem_ray.pipelines import graph_queries as g
    from igpm_pem_ray.pipelines import relational as r

    return {
        "graph_edges": g.sql_graph_edges(),
        "pagerank_fixed": g.sql_pagerank_fixed(),
        "pagerank_shuffle": g.sql_pagerank_fixed(),
        "cc_shuffle": g.sql_connected_components(),
        "lp_shuffle": g.sql_label_propagation(),
        "connected_components": g.sql_connected_components(),
        "component_sizes": g.sql_component_sizes(),
        "label_propagation": g.sql_label_propagation(),
        "triangle_count": g.sql_triangle_count(),
        "doulion_triangles": g.sql_doulion_triangles(),
        "salsa": g.sql_salsa(),
        "star_count": g.sql_star_count(),
        "clustering_coeff": g.sql_clustering_coeff(),
        "link_predict": g.sql_link_predict(),
        "link_predict_jaccard": g.sql_link_predict_jaccard(),
        "link_predict_ra": g.sql_link_predict_ra(),
        "avg_neighbor_degree": g.sql_avg_neighbor_degree(),
        "knn_curve": g.sql_knn_curve(),
        "bfs_levels": g.sql_bfs_levels(),
        "hits": g.sql_hits(),
        "brand_graph": g.sql_brand_graph(),
        "assortativity": g.sql_assortativity(),
        "reciprocity": g.sql_reciprocity(),
        "two_hop": g.sql_two_hop(),
        "scc": g.sql_scc(),
        "scc_shuffle": g.sql_scc(),
        "bowtie": g.sql_bowtie(),
        "eccentricity": g.sql_eccentricity(),
        "eccentricity_shuffle": g.sql_eccentricity(),
        "closeness": g.sql_closeness(),
        "closeness_shuffle": g.sql_closeness(),
        "distance_hist": g.sql_distance_hist(),
        "distance_hist_shuffle": g.sql_distance_hist(),
        "harmonic_centrality": g.sql_harmonic_centrality(),
        "harmonic_shuffle": g.sql_harmonic_centrality(),
        "random_walks": g.sql_random_walks(),
        "walk_pairs": g.sql_walk_pairs(),
        "quad_count": g.sql_quad_count(),
        "pagerank_weighted": g.sql_pagerank_weighted(),
        "pagerank_topic": g.sql_pagerank_topic(),
        "katz": g.sql_katz(),
        "partition_stats": g.sql_partition_stats(),
        "negative_samples": g.sql_negative_samples(),
        "katz_shuffle": g.sql_katz(),
        "modularity": g.sql_modularity(),
        "louvain": g.sql_louvain(),
        "spam_mass": g.sql_spam_mass(),
        "betweenness_k2": g.sql_betweenness_k2(),
        "betweenness_k2_shuffle": g.sql_betweenness_k2_shuffle(),
        "sssp": g.sql_sssp(),
        "sssp_shuffle": g.sql_sssp(),
        "mis": g.sql_mis(),
        "mis_shuffle": g.sql_mis(),
        "coloring_check": g.sql_coloring_check(),
        "msf_check": g.sql_msf_check(),
        "dag_layers": g.sql_dag_layers(),
        "rich_club": g.sql_rich_club(),
        "degree_distribution": g.sql_degree_distribution(),
        "filter_project": r.sql_filter_project(),
        "group_agg": r.sql_group_agg(),
        "topk_orders": r.sql_topk_orders(),
        "join_broadcast": r.sql_join_broadcast(),
        "join_hash": r.sql_join_hash(),
        "anti_join": r.sql_anti_join(),
        "semi_join": r.sql_semi_join(),
        "join_outer": r.sql_join_outer(),
        "stratified_sample": r.sql_stratified_sample(),
        "overlap_join": r.sql_overlap_join(),
        "props_scrub": r.sql_props_scrub(),
        "quantile_cont_events": r.sql_quantile_cont_events(),
        "bloom_semi_join": r.sql_bloom_semi_join(),
        "corpus_curation": r.sql_corpus_curation(),
        "quartile_orders": r.sql_quartile_orders(),
        "event_bigrams": r.sql_event_bigrams(),
        "window_events": r.sql_window_events(),
        "ts_rebase": r.sql_ts_rebase(),
        "ts_window_filter": r.sql_ts_window_filter(),
        "distinct_union": r.sql_distinct_union(),
        "sessionize_events": r.sql_sessionize(),
        "event_funnel": r.sql_event_funnel(),
        "event_gaps": r.sql_event_gaps(),
        "latest_events": r.sql_latest_events(),
        "topk_per_customer": r.sql_topk_per_customer(),
        "sliding_window": r.sql_sliding_window(),
        "quantile_events": r.sql_quantile_events(),
        "train_val_split": r.sql_train_val_split(),
        "asof_attrib": r.sql_asof_attrib(),
        "range_join_windows": r.sql_range_join(),
        "cumsum_orders": r.sql_cumsum_orders(),
        "condition_filter": r.sql_condition_filter(),
        "sample_orders": r.sql_sample(),
        "doc_dedup_exact": r.sql_doc_dedup_exact(),
        "doc_tokens": r.sql_doc_tokens(),
        "doc_quality": r.sql_doc_quality(),
        "gopher_quality": r.sql_gopher_quality(),
        "quality_sample": r.sql_quality_sample(),
        "span_dedup": r.sql_span_dedup(),
        "blocklist_filter": r.sql_blocklist_filter(),
        "lang_dist": r.sql_lang_dist(),
        "ann_cosine": r.sql_ann_cosine(),
        "embed_near_dup": r.sql_embed_near_dup(),
        "group_stats": an.sql_group_stats(),
        "distinct_parts": an.sql_distinct_parts(),
        "histogram_orders": an.sql_histogram_orders(),
        "star_join": an.sql_star_join(),
        "pivot_status": an.sql_pivot_status(),
        "group_agg_salted": an.sql_group_agg_salted(),
        "unnest_embed": an.sql_unnest_embed(),
        "string_funcs": an.sql_string_funcs(),
        "rollup_revenue": an.sql_rollup_revenue(),
        "jaccard_pairs": an.sql_jaccard_pairs(),
        "containment_pairs": an.sql_containment_pairs(),
        "top_tokens": an.sql_top_tokens(),
        "doc_chunks": an.sql_doc_chunks(),
        "pack_windows": an.sql_pack_windows(),
        "doc_tokens_bpe": an.sql_doc_tokens_bpe(),
        "tfidf_terms": an.sql_tfidf_terms(),
        "bm25_topk": an.sql_bm25_topk(),
        "region_revenue": an.sql_region_revenue(),
        "mode_priority": an.sql_mode_priority(),
        "corr_price_qty": an.sql_corr_price_qty(),
        "ols_price_qty": an.sql_ols_price_qty(),
        "embed_dim_stats": an.sql_embed_dim_stats(),
        "embed_quantize": an.sql_embed_quantize(),
        "knn_label_agreement": an.sql_knn_label_agreement(),
        "dq_checks": an.sql_dq_checks(),
        "table_diff": an.sql_table_diff(),
        "cube_revenue": an.sql_cube_revenue(),
        "assoc_rules": an.sql_assoc_rules(),
        "word_bigrams": an.sql_word_bigrams(),
        "textrank_terms": an.sql_textrank(),
        "bigram_lift": an.sql_bigram_lift(),
        "lang_source_chi2": an.sql_lang_source_chi2(),
        "user_retention": r.sql_user_retention(),
        "outlier_events": r.sql_outlier_events(),
        "event_rate_anomaly": r.sql_event_rate_anomaly(),
        "event_debounce": r.sql_event_debounce(),
        "rolling_events": r.sql_rolling_events(),
        "event_trigrams": r.sql_event_trigrams(),
        "temporal_pairs": r.sql_temporal_pairs(),
        "temporal_triples": r.sql_temporal_triples(),
        "phrase_search": an.sql_phrase_search(),
        "boilerplate_terms": an.sql_boilerplate_terms(),
        "pack_docs": an.sql_pack_docs(),
        "percent_rank_orders": r.sql_percent_rank_orders(),
        "mirror_suppliers": g.sql_mirror_suppliers(),
        "mirror_clusters": g.sql_mirror_clusters(),
        "robustness_attack": g.sql_robustness_attack(),
        "random_attack": g.sql_random_attack(),
        "degree_gini": g.sql_degree_gini(),
        "vocab_growth": an.sql_vocab_growth(),
        "hourly_profile": r.sql_hourly_profile(),
        "skyline_parts": r.sql_skyline_parts(),
        "readability": an.sql_readability(),
        "islands_orders": r.sql_islands_orders(),
        "edit_dist_pairs": an.sql_edit_dist_pairs(),
        "name_clusters": an.sql_name_clusters(),
        "seq_baskets": an.sql_seq_baskets(),
        "part_trends": an.sql_part_trends(),
        "decay_counts": r.sql_decay_counts(),
        "butterflies": g.sql_butterflies(),
        "temporal_reach": g.sql_temporal_reach(),
        "dag_paths": g.sql_dag_paths(),
        "widest_path": g.sql_widest_path(),
        "target_encode": r.sql_target_encode(),
        "consistent_hash": r.sql_consistent_hash(),
        "zorder_keys": r.sql_zorder_keys(),
        "late_events": r.sql_late_events(),
        "item_cf": an.sql_item_cf(),
        "sssp_parents": g.sql_sssp_parents(),
        "zone_maps": r.sql_zone_maps(),
        "set_cover": an.sql_set_cover(),
        "join_size_sketch": an.sql_join_size_sketch(),
        "pca_power": an.sql_pca_power(),
        "grouping_sets": r.sql_grouping_sets(),
        "fd_discovery": r.sql_fd_discovery(),
        "bloom_fpr": r.sql_bloom_fpr(),
        "ivm_delta": r.sql_ivm_delta(),
        "auc_exact": r.sql_auc_exact(),
        "survivorship": an.sql_survivorship(),
        "ntile_orders": r.sql_ntile_orders(),
        "q3_shipping": an.sql_q3_shipping(),
        "window_distinct": r.sql_window_distinct(),
        "calibration_bins": r.sql_calibration_bins(),
        "closure_rate": g.sql_closure_rate(),
        "score_drift": r.sql_score_drift(),
        "cohort_matrix": r.sql_cohort_matrix(),
        "above_own_avg": r.sql_above_own_avg(),
        "cum_uniques": r.sql_cum_uniques(),
        "minhash_acc": an.sql_minhash_acc(),
        "conductance": g.sql_conductance(),
        "friendship_paradox": g.sql_friendship_paradox(),
        "except_all": r.sql_except_all(),
        "kmv_distinct": r.sql_kmv_distinct(),
        "bipartite_check": g.sql_bipartite_check(),
        "lorenz_deciles": r.sql_lorenz_deciles(),
        "median_nation": r.sql_median_nation(),
        "vertex_cover": g.sql_vertex_cover(),
        "rrf_fusion": an.sql_rrf_fusion(),
        "decision_stump": r.sql_decision_stump(),
        "allen_census": r.sql_allen_census(),
        "influence_spread": g.sql_influence_spread(),
        "clique4_count": g.sql_clique4_count(),
        "attribution_u": r.sql_attribution_u(),
        "activity_selection": r.sql_activity_selection(),
        "landmark_distance": g.sql_landmark_distance(),
        "pointer_jump": g.sql_pointer_jump(),
        "semdedup": an.sql_semdedup(),
        "intersect_all": r.sql_intersect_all(),
        "unpivot_measures": r.sql_unpivot(),
        "quality_classifier": an.sql_quality_classifier(),
        "bom_explode": g.sql_bom_explode(),
        "ppr_push": g.sql_ppr_push(),
        "l_diversity": r.sql_l_diversity(),
        "seasonal_naive": r.sql_seasonal_naive(),
        "rank_corr": an.sql_rank_corr(),
        "ohlc_daily": r.sql_ohlc_daily(),
        "transitive_reduce": g.sql_transitive_reduce(),
        "rfm_segments": r.sql_rfm_segments(),
        "fifo_allocation": r.sql_fifo_allocation(),
        "snapshot_asof": r.sql_snapshot_asof(),
        "shapley_attribution": r.sql_shapley_attribution(),
        "universe_sample": r.sql_universe_sample(),
        "config_model": g.sql_config_model(),
        "diff_in_diff": r.sql_diff_in_diff(),
        "profile_table": r.sql_profile_table(),
        "dominating_set": g.sql_dominating_set(),
        "chunk_overlap": an.sql_chunk_overlap(),
        "max_drawdown": r.sql_max_drawdown(),
        "ri_audit": r.sql_ri_audit(),
        "systematic_sample": r.sql_systematic_sample(),
        "nest_orders": r.sql_nest_orders(),
        "ego_2hop": g.sql_ego_2hop(),
        "seq_match": r.sql_seq_match(),
        "retrieval_eval": an.sql_retrieval_eval(),
        "orbit_counts": g.sql_orbit_counts(),
        "encoding_advisor": r.sql_encoding_advisor(),
        "fd_repair": r.sql_fd_repair(),
        "anonymize_lattice": r.sql_anonymize_lattice(),
        "critical_path": g.sql_critical_path(),
        "queue_delay": r.sql_queue_delay(),
        "ks_test": r.sql_ks_test(),
        "cvm_test": r.sql_cvm_test(),
        "wasserstein1": r.sql_wasserstein1(),
        "dispersion_index": r.sql_dispersion_index(),
        "conformal_coverage": r.sql_conformal_coverage(),
        "energy_distance": r.sql_energy_distance(),
        "moments_quantity": r.sql_moments_quantity(),
        "seeded_labelprop": g.sql_seeded_labelprop(),
        "ppr_mc": g.sql_ppr_mc(),
        "matching": g.sql_matching(),
        "local_bridges": g.sql_local_bridges(),
        "gnn_features": g.sql_gnn_features(),
        "interval_cover": r.sql_interval_cover(),
        "mad_outliers": r.sql_mad_outliers(),
        "window_topk": r.sql_window_topk(),
        "weighted_sample": r.sql_weighted_sample(),
        "benford_prices": r.sql_benford_prices(),
        "k_anonymity": r.sql_k_anonymity(),
        "cusum_events": r.sql_cusum_events(),
        "gini_nation": r.sql_gini_nation(),
        "funnel_latency": r.sql_funnel_latency(),
        "daily_autocorr": r.sql_daily_autocorr(),
        "km_interorder": r.sql_km_interorder(),
        "max_concurrency": r.sql_max_concurrency(),
        "priority_transitions": r.sql_priority_transitions(),
        "tree_rollup": r.sql_tree_rollup(),
        "precedence_counts": r.sql_precedence_counts(),
        "winsorized_mean": r.sql_winsorized_mean(),
        "ship_delay": r.sql_ship_delay(),
        "upsert_latest": r.sql_upsert_latest(),
        "scd_intervals": r.sql_scd_intervals(),
        "journey_paths": r.sql_journey_paths(),
        "json_extract_stats": r.sql_json_extract_stats(),
        "densify_hours": r.sql_densify_hours(),
        "table_checksum": r.sql_table_checksum(),
        "user_diversity": r.sql_user_diversity(),
        "user_features": r.sql_user_features(),
        "adoption_curve": r.sql_adoption_curve(),
        "ab_test": r.sql_ab_test(),
        "activity_corr": r.sql_activity_corr(),
        "halfsample_replicates": r.sql_halfsample_replicates(),
        "key_skew": r.sql_key_skew(),
        "dup_payments": r.sql_dup_payments(),
        "lexical_diversity": an.sql_lexical_diversity(),
        "source_vocab_overlap": an.sql_source_vocab_overlap(),
        "label_centroids": an.sql_label_centroids(),
        "hapax_ratio": an.sql_hapax_ratio(),
        "revenue_share": an.sql_revenue_share(),
        "bool_and_search": an.sql_bool_and_search(),
        "centroid_distances": an.sql_centroid_distances(),
        "walk_returns": g.sql_walk_returns(),
        "brand_homophily": g.sql_brand_homophily(),
        "cosine_gram_pairs": an.sql_cosine_gram_pairs(),
        "transitivity": g.sql_transitivity(),
        "doc_rarity": an.sql_doc_rarity(),
        "inverted_index": an.sql_inverted_index(),
        "embed_covariance": an.sql_embed_covariance(),
        "decontaminate": an.sql_decontaminate(),
        "bigram_lm": an.sql_bigram_lm(),
        "dsir_weights": an.sql_dsir_weights(),
        "domain_mix_sample": an.sql_domain_mix_sample(),
        "kcore_peel": g.sql_kcore_peel(),
        "truss_peel": g.sql_truss_peel(),
        "eigen_walks": g.sql_eigen_walks(),
        "triad_census": g.sql_triad_census(),
        "simrank_mc": g.sql_simrank_mc(),
        "kcore_hindex_r4": g.sql_kcore_hindex_r4(),
        "wl_refinement": g.sql_wl_refinement(),
        "graph_churn": g.sql_graph_churn(),
        "pagerank_mc": g.sql_pagerank_mc(),
        "percolation_curve": g.sql_percolation_curve(),
    }
