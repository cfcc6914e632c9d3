"""Dedup suite + text analysis + ANN over a planted-duplicate corpus."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from igpm_pem_ray.ann.knn import brute_force_topk, lsh_topk
from igpm_pem_ray.text import analysis, dedup


@pytest.fixture(scope="module")
def corpus():
    base = ("the quick brown fox jumps over the lazy dog and then runs far away "
            "into the deep dark forest to find some food for the long winter")
    rows = []
    for i in range(30):
        rows.append((i, f"document number {i} " + base + f" unique tail {i * 7}"))
    # planted near-dups of doc 0 (one word changed) and exact dup of doc 1
    rows.append((100, rows[0][1].replace("quick", "rapid")))
    rows.append((101, rows[1][1]))
    rows.append((102, "completely different tiny text"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_exact_dedup(corpus):
    ds = rd.from_pandas(corpus)
    out = dedup.exact_dedup(ds).to_pandas()
    # exact dup 101 collapses into 1; everything else survives
    assert len(out) == len(corpus) - 1
    assert 1 in out["doc_id"].values and 101 not in out["doc_id"].values


def test_minhash_near_dup_groups(corpus):
    ds = rd.from_pandas(corpus)
    groups = dedup.near_dup_groups(ds, num_perms=64, rows_per_band=4,
                                   threshold=0.6).to_pandas()
    g = dict(zip(groups["doc_id"], groups["group"]))
    assert g[100] == g[0]          # near-dup pair clustered
    assert g[101] == g[1]          # exact dup clustered
    assert g[102] == 102           # singleton stays alone
    # docs 2..29 share the long base text (high overlap by construction);
    # the planted pairs are what we assert, not their absence


def test_ngram_jaccard_bounds():
    assert dedup.ngram_jaccard("a b c d", "a b c d") == 1.0
    assert dedup.ngram_jaccard("a b c d", "x y z w") == 0.0
    assert 0.0 < dedup.ngram_jaccard("a b c d e", "a b c d x") < 1.0


def test_simhash_similarity(corpus):
    ds = rd.from_pandas(corpus)
    sh = dedup.simhash_table(ds, concurrency=1).to_pandas()
    h = dict(zip(sh["doc_id"], sh["simhash"]))
    dist_near = bin(h[0] ^ h[100]).count("1")
    dist_far = bin(h[0] ^ h[102]).count("1")
    assert dist_near < dist_far    # near-dup closer in Hamming space
    assert dist_near <= 12


def test_quality_and_langid(corpus):
    ds = rd.from_pandas(corpus)
    q = ds.map_batches(analysis.QualityScorer, batch_format="pandas",
                       concurrency=1).to_pandas()
    assert (q["n_tokens"] > 0).all()
    # the base corpus is stopword-heavy English; doc 102 has none
    assert (q.loc[q["doc_id"] < 100, "stop_ratio_e6"] > 0).all()
    lid = ds.map_batches(analysis.LangId, batch_format="pandas",
                         concurrency=1).to_pandas()
    assert (lid.loc[lid["doc_id"] < 100, "lang_pred"] == "en").all()


def test_fingerprint_normalizes_whitespace():
    a = analysis.fingerprint64(["hello   world"])
    b = analysis.fingerprint64([" hello world "])
    c = analysis.fingerprint64(["hello worlds"])
    assert a[0] == b[0] != c[0]


def test_ann_brute_force_and_lsh():
    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((200, 16))
    vecs[17] = vecs[0] + 0.01 * rng.standard_normal(16)  # planted neighbor
    tbl = pa.table({"vec_id": pa.array(range(200), type=pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in vecs],
                                          type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    q = vecs[0:1]
    top = brute_force_topk(ds, q, k=3).to_pandas()
    assert top["vec_id"].tolist()[:2] == [0, 17]
    assert top["sim"].iloc[0] == pytest.approx(1.0, abs=1e-5)
    lsh = lsh_topk(ds, q, k=3, nbits=3).to_pandas()
    assert 0 in lsh["vec_id"].tolist()  # bucketed variant finds the identical vector
    # multi-query batch: one dataset pass, per-query top-k
    q2 = vecs[[0, 5]]
    multi = lsh_topk(ds, q2, k=2, nbits=3).to_pandas()
    assert set(multi["query_idx"]) <= {0, 1}
    assert multi.loc[multi["query_idx"] == 0, "vec_id"].iloc[0] == 0


def test_ann_ivf():
    from igpm_pem_ray.ann.knn import ivf_topk, train_ivf_centroids

    rng = np.random.RandomState(8)
    vecs = rng.standard_normal((300, 12))
    vecs[42] = vecs[7] + 0.01 * rng.standard_normal(12)  # planted neighbor
    tbl = pa.table({"vec_id": pa.array(range(300), type=pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in vecs],
                                          type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    cent = train_ivf_centroids(ds, nlist=8)
    assert cent.shape[1] == 12
    # nprobe = nlist -> exhaustive: exact top-k incl. planted neighbor
    full = ivf_topk(ds, vecs[7:8], k=3, nlist=8, nprobe=8,
                    centroids=cent).to_pandas()
    assert full["vec_id"].tolist()[:2] == [7, 42]
    # small nprobe still finds the identical vector (same bucket)
    approx = ivf_topk(ds, vecs[7:8], k=3, nlist=8, nprobe=1,
                      centroids=cent).to_pandas()
    assert 7 in approx["vec_id"].tolist()


def test_embedding_near_dup():
    """Embedding-cosine near-dup: exact pairs vs numpy brute force,
    LSH-bucketed pairs subset with planted duplicates found, cluster
    assignment groups the planted pair."""
    from igpm_pem_ray.ann.embed_dedup import (cosine_pairs,
                                              cosine_pairs_lsh,
                                              near_dup_groups_embedding)

    rng = np.random.RandomState(14)
    vecs = rng.standard_normal((120, 16))
    vecs[77] = vecs[3] + 0.001 * rng.standard_normal(16)  # planted dup
    tbl = pa.table({"vec_id": pa.array(range(120), type=pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in vecs],
                                          type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    thr = 0.95
    got = cosine_pairs(ds, threshold=thr).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # brute-force oracle (float32 storage -> compute in float64 like engine)
    m = np.stack([np.asarray(r, dtype=np.float32).astype(np.float64)
                  for r in tbl["embedding"].to_pylist()])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    want = sorted((i, j) for i in range(120) for j in range(i + 1, 120)
                  if sims[i, j] >= thr)
    assert list(map(tuple, got[["id_a", "id_b"]].to_numpy())) == want
    assert (3, 77) in want
    lsh = cosine_pairs_lsh(ds, threshold=thr, nbits=3).to_pandas()
    lsh_pairs = set(map(tuple, lsh[["id_a", "id_b"]].to_numpy()))
    assert lsh_pairs <= set(want)
    assert (3, 77) in lsh_pairs  # near-identical vectors share buckets
    groups = near_dup_groups_embedding(ds, threshold=thr).to_pandas()
    g = dict(zip(groups["vec_id"], groups["group"]))
    assert g[77] == g[3] == 3
    assert len(groups) == 120


def test_winnow_fingerprints():
    """Winnowing rolling-hash fingerprints: deterministic, shared
    k-grams produce shared fingerprints, disjoint texts share ~none."""
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "prefix junk THEN " + a + " suffix tail"
    c = "zzz completely unrelated material qqq www 123456"
    fa = analysis.winnow_fingerprints(a)
    fb = analysis.winnow_fingerprints(b)
    fc = analysis.winnow_fingerprints(c)
    assert np.array_equal(fa, analysis.winnow_fingerprints(a))  # deterministic
    overlap_ab = len(np.intersect1d(fa, fb)) / max(1, len(fa))
    overlap_ac = len(np.intersect1d(fa, fc)) / max(1, len(fa))
    assert overlap_ab > 0.5 > overlap_ac
    assert analysis.winnow_fingerprints("").size == 0
    assert analysis.winnow_fingerprints("abc", k=8).size == 0  # shorter than k
    # Ray stage: one row per (doc_id, fp)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": [a, c]}))
    rows = ds.map_batches(analysis.WinnowFingerprinter, batch_format="pandas",
                          concurrency=1).to_pandas()
    assert set(rows["doc_id"]) == {1, 2}
    assert len(rows[rows["doc_id"] == 1]) == len(fa)


def test_simhash_candidate_pairs(corpus):
    """SimHash band bucketing: exact dups always collide (all bands
    equal); candidates feed the same Jaccard verify as MinHash-LSH."""
    ds = rd.from_pandas(corpus)
    cand = dedup.simhash_candidate_pairs(ds, band_bits=8).to_pandas()
    pairs = set(map(tuple, cand[["doc_a", "doc_b"]].to_numpy()))
    assert (1, 101) in pairs          # exact dup: all bands equal
    ver = dedup.verify_pairs(
        rd.from_pandas(cand), ds, threshold=0.9).to_pandas()
    vp = set(map(tuple, ver[["doc_a", "doc_b"]].to_numpy()))
    assert (1, 101) in vp


def test_winnow_overlap_pairs():
    """Overlap detection: a doc containing another doc's text shares
    fingerprints with it; unrelated docs don't pass min_shared."""
    a = ("the quick brown fox jumps over the lazy dog while the rain "
         "falls gently on the quiet town throughout the long night")
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [a, "INTRO " + a + " OUTRO", "totally different words here "
                 "about unrelated topics entirely xyz"],
    })
    ds = rd.from_pandas(rows)
    pairs = dedup.winnow_overlap_pairs(ds, min_shared=3).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_embedding_near_dup_lsh_strategy():
    """The large-N branch (strategy="lsh") groups the planted dup
    without the full-matrix broadcast; "auto" picks exact below the
    row threshold (outputs unchanged on small fixtures)."""
    from igpm_pem_ray.ann.embed_dedup import near_dup_groups_embedding

    rng = np.random.RandomState(21)
    vecs = rng.standard_normal((90, 16))
    vecs[55] = vecs[8] + 0.001 * rng.standard_normal(16)
    tbl = pa.table({"vec_id": pa.array(range(90), type=pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in vecs],
                                          type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    lsh = near_dup_groups_embedding(ds, threshold=0.95, strategy="lsh") \
        .to_pandas()
    g = dict(zip(lsh["vec_id"], lsh["group"]))
    assert g[55] == g[8] == 8
    assert len(lsh) == 90
    auto = near_dup_groups_embedding(ds, threshold=0.95).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    exact = near_dup_groups_embedding(ds, threshold=0.95, strategy="exact") \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert auto.equals(exact)


def test_lsh_hot_bucket_cap():
    """Buckets over max_bucket are skipped with a reported drop count
    (never silently); the default cap leaves small corpora unchanged."""
    from igpm_pem_ray.text.dedup import lsh_candidate_pairs

    base = "the quick brown fox jumps over the lazy dog number "
    texts = [base + str(i % 2) for i in range(24)]          # two hot clones
    texts += [f"totally different text body {i} with words {i*7}"
              for i in range(6)]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl)
    stats: dict = {}
    capped = lsh_candidate_pairs(ds, max_bucket=8, stats=stats).to_pandas()
    assert stats["hot_buckets_dropped"] > 0
    assert stats["hot_rows_dropped"] > 0
    # hot-bucket members (the 24 clones) generate no candidate pairs
    hot_ids = set(range(24))
    assert not any(a in hot_ids and b in hot_ids
                   for a, b in zip(capped["doc_a"], capped["doc_b"]))
    stats2: dict = {}
    uncapped = lsh_candidate_pairs(ds, max_bucket=None).to_pandas()
    default = lsh_candidate_pairs(ds, stats=stats2).to_pandas()
    assert stats2 == {"hot_buckets_dropped": 0, "hot_rows_dropped": 0}
    key = lambda df: sorted(map(tuple, df[["doc_a", "doc_b"]].to_numpy()))
    assert key(default) == key(uncapped)
    assert len(key(uncapped)) > len(key(capped))


def test_ann_many_query_stress():
    """Multi-hundred-query batch through lsh_topk / ivf_topk (one
    dataset pass, is_in bucket filter — no O(Q) expr chain): every
    query drawn from the table finds itself with sim ~= 1."""
    from igpm_pem_ray.ann.knn import ivf_topk, lsh_topk

    rng = np.random.RandomState(33)
    n, d, Q = 2000, 16, 300
    vecs = rng.standard_normal((n, d))
    tbl = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in vecs],
                                          type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl).repartition(8).materialize()
    qidx = rng.choice(n, size=Q, replace=False)
    queries = vecs[qidx]

    for fn, kw in ((lsh_topk, {"nbits": 4}),
                   (ivf_topk, {"nlist": 8, "nprobe": 8})):
        out = fn(ds, queries, k=5, **kw).to_pandas()
        assert out.groupby("query_idx").size().max() <= 5
        hits = out[np.isclose(out["sim"], 1.0, atol=1e-5)]
        self_found = {int(q): int(v) for q, v in
                      zip(hits["query_idx"], hits["vec_id"])}
        assert all(self_found.get(i) == int(qidx[i]) for i in range(Q)), fn


def test_hll_approx_distinct_error_bound():
    """HLL sketch estimate within 5x standard error (1.04/sqrt(1024)
    ~= 3.25%) of the exact distinct count, across group cardinalities
    spanning the linear-counting and raw-estimate regimes."""
    import pyarrow as pa
    import ray.data as rd

    from igpm_pem_ray.text.sketch import approx_distinct_per_group

    rng = np.random.RandomState(7)
    groups, values = [], []
    truth = {"small": 50, "mid": 5_000, "big": 40_000}
    for g, n_distinct in truth.items():
        vals = rng.choice(n_distinct * 10, size=n_distinct, replace=False)
        reps = np.concatenate([vals, rng.choice(vals, size=n_distinct)])
        groups.extend([g] * len(reps))
        values.extend(reps.tolist())
    ds = rd.from_arrow(pa.table({
        "g": pa.array(groups, type=pa.string()),
        "v": pa.array(values, type=pa.int64())})).repartition(8)
    out = approx_distinct_per_group(ds, "g", "v").set_index("g")
    for g, n_distinct in truth.items():
        est = int(out.loc[g, "approx_distinct"])
        rel = abs(est - n_distinct) / n_distinct
        assert rel < 0.17, (g, est, n_distinct, rel)


def test_ddsketch_error_bound():
    """DDSketch quantiles within the alpha relative-error guarantee
    on lognormal data, and partial-merge == single-shot."""
    import numpy as np
    import ray.data as rd
    import pyarrow as pa

    from igpm_pem_ray.text.sketch import (approx_quantiles,
                                          dd_bucket_partial, dd_quantiles)

    rng = np.random.RandomState(5)
    x = np.exp(rng.normal(4.0, 1.5, 20_000))
    qs = [0.1, 0.5, 0.9, 0.99]
    alpha = 0.01
    ds = rd.from_arrow(pa.table({"v": x})).repartition(8)
    got = approx_quantiles(ds, col="v", qs=qs, alpha=alpha)["approx"] \
        .to_numpy()
    exact = np.quantile(x, qs)
    rel = np.abs(got - exact) / exact
    # alpha bound + discreteness slack (rank vs interpolated quantile)
    assert (rel < alpha + 0.01).all(), rel

    # mergeability: two half partials summed == one full partial
    p1 = dd_bucket_partial(x[:10_000], alpha=alpha)
    p2 = dd_bucket_partial(x[10_000:], alpha=alpha)
    import pandas as pd

    merged = pd.concat([p1.to_pandas(), p2.to_pandas()]) \
        .groupby("bucket", as_index=False)["n"].sum()
    est_m = dd_quantiles(merged["bucket"].to_numpy(),
                         merged["n"].to_numpy(), qs, alpha=alpha)
    full = dd_bucket_partial(x, alpha=alpha).to_pandas()
    est_f = dd_quantiles(full["bucket"].to_numpy(),
                         full["n"].to_numpy(), qs, alpha=alpha)
    assert np.allclose(est_m, est_f)


def test_ddsketch_nonpositive_and_empty():
    import numpy as np

    from igpm_pem_ray.text.sketch import dd_bucket_partial, dd_quantiles

    t = dd_bucket_partial(np.array([0.0, -3.0, 10.0]))
    assert t.num_rows == 2  # reserved below-range bucket + one real
    est = dd_quantiles(np.empty(0, np.int64), np.empty(0, np.int64),
                       [0.5])
    assert np.isnan(est[0])


def test_misra_gries_guarantee():
    """Planted-skew stream: every item with freq > n/(k+1) must
    surface, estimates within n/(k+1) of truth, and the distributed
    per-block + merge path equals the guarantee too."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from igpm_pem_ray.text.sketch import heavy_hitters, mg_merge, mg_partial

    rng = np.random.RandomState(7)
    heavy = np.repeat([f"hh{i}" for i in range(5)], 400)   # 2000 heavy
    tail = np.array([f"t{i}" for i in rng.randint(0, 3000, 4000)])
    stream = np.concatenate([heavy, tail])
    rng.shuffle(stream)
    truth = collections.Counter(stream.tolist())
    n, k = len(stream), 64

    ds = rd.from_arrow(pa.table({"tok": stream.astype(object)})) \
        .repartition(6)
    t = heavy_hitters(ds, col="tok", k=k)
    est = dict(zip(t["item"].to_pylist(), t["est_count"].to_pylist()))
    bound = n / (k + 1)
    for item, cnt in truth.items():
        if cnt > bound:
            assert item in est, f"missed heavy hitter {item}"
    for item, e in est.items():
        assert truth[item] - bound <= e <= truth[item]

    # pure merge algebra: two halves == one pass (within the bound)
    p1 = mg_partial(stream[: n // 2].astype(object), k)
    p2 = mg_partial(stream[n // 2:].astype(object), k)
    u, c = mg_merge([p1, p2], k)
    m = dict(zip(u.tolist(), c.tolist()))
    for item, cnt in truth.items():
        if cnt > 2 * bound:
            assert item in m


def test_kmeans_matches_numpy_lloyds():
    """Distributed per-block sufficient-statistics k-means ==
    single-process numpy Lloyd's from the same deterministic init."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from igpm_pem_ray.ann.kmeans import kmeans_assign, kmeans_fit

    rng = np.random.RandomState(3)
    n, d, k, iters = 400, 8, 5, 4
    x = np.concatenate([rng.randn(n // 4, d) + c * 3
                        for c in range(4)])[:n]
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "vec_id": ids, "embedding": [row.tolist() for row in x]})) \
        .repartition(6)
    stats: dict = {}
    cents, counts = kmeans_fit(ds, k=k, n_iters=iters, stats=stats)

    # oracle: plain Lloyd's, same init (smallest ids)
    c = x[:k].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for j in range(k):
            if (a == j).any():
                c[j] = x[a == j].mean(axis=0)
    assert np.allclose(cents, c, atol=1e-9)
    exp_counts = np.bincount(a, minlength=k)
    assert (counts == exp_counts).all()
    assert stats["inertia"] > 0

    assign = kmeans_assign(ds, cents).to_pandas()
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assert (assign.sort_values("vec_id")["cluster"].to_numpy()
            == d2.argmin(axis=1)).all()


def test_repetition_stats_edge_cases():
    """Gopher repetition signals: hand-computed fractions, floor-div
    e6 convention, empty / single-token / all-same docs."""
    from igpm_pem_ray.text import repetition as rep

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "a b a b a b",          # 6 toks: max uni 3, 2 distinct, max bigram 'a b' 3/5
            "x",                     # 1 token: no bigrams
            "",                      # empty
            None,                    # null text
            "w w w w",               # all same
        ],
    })
    out = rep.repetition_stats(df).set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 6
    assert out.loc[1, "top_unigram_frac_e6"] == 3 * 1_000_000 // 6
    assert out.loc[1, "top_bigram_frac_e6"] == 3 * 1_000_000 // 5
    assert out.loc[1, "distinct_frac_e6"] == 2 * 1_000_000 // 6
    assert out.loc[2, "n_tokens"] == 1
    assert out.loc[2, "top_bigram_frac_e6"] == 0
    assert out.loc[2, "top_unigram_frac_e6"] == 1_000_000
    for d in (3, 4):
        assert out.loc[d, "n_tokens"] == 0
        assert out.loc[d, "keep"] == 0
    assert out.loc[5, "top_unigram_frac_e6"] == 1_000_000
    assert out.loc[5, "distinct_frac_e6"] == 250_000
    assert out.loc[5, "keep"] == 0


def test_repetition_batch_independence():
    """Per-doc stats are identical whether docs share a batch or not
    (the stage is embarrassingly parallel — no cross-doc state)."""
    from igpm_pem_ray.text import repetition as rep

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["p q p q r", "r r r q"],
    })
    whole = rep.repetition_stats(df)
    split = pd.concat([rep.repetition_stats(df.iloc[[0]]),
                       rep.repetition_stats(df.iloc[[1]])],
                      ignore_index=True)
    pd.testing.assert_frame_equal(whole, split)


def test_learn_bpe_matches_reference_algorithm():
    """learn_bpe == a direct single-process Sennrich reference
    (counter + greedy left-to-right rescan) including the
    deterministic tie-break (count desc, then lexicographic pair) and
    the stop-below-2 rule."""
    from collections import Counter

    from igpm_pem_ray.text.bpe import END, learn_bpe

    texts = [
        "low lower lowest low low",
        "newer newest new new newer",
        "wider wide wide widest",
        "low newer wide",
        "",
    ]

    def reference(texts, k):
        wc = Counter()
        for t in texts:
            wc.update(t.split())
        words = {w: list(w) + [END] for w in wc}
        merges = []
        for r in range(k):
            pc_ = Counter()
            for w, syms in words.items():
                f = wc[w]
                for a, b in zip(syms[:-1], syms[1:]):
                    pc_[(a, b)] += f
            if not pc_:
                break
            (l, rgt), n = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
            if n < 2:
                break
            merges.append((r, l, rgt, n))
            m = l + rgt
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rgt:
                        out.append(m)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
        return merges

    ds = rd.from_arrow(pa.table({"text": texts}))
    got = learn_bpe(ds, 12)
    gm = list(zip(got["rank"].to_pylist(), got["left"].to_pylist(),
                  got["right"].to_pylist(), got["n"].to_pylist()))
    assert gm == reference(texts, 12)
    assert len(gm) > 3  # the corpus supports several merges


def test_url_normalize_vs_stdlib_oracle():
    """normalize_urls / surt_keys == an independent stdlib
    urllib.parse implementation of the same documented spec, over
    adversarial cases + the fixture URL shapes."""
    from urllib.parse import parse_qsl, urlsplit

    from igpm_pem_ray.text.urlnorm import normalize_urls, surt_keys

    cases = [
        "HTTPS://Sub.Example.COM:443/a/b?z=1&utm_source=x&a=2#frag",
        "http://example.com:8080",
        "http://example.com:80/x?gclid=99",
        "https://site0.example/p0",
        "http://h/?b=2&a=1&a=0",
        "https://a.b/c?utm_campaign=z",
        "https://a.b/c?UTM_X=1&k",          # uppercase tracking + bare key
        "http://x.y:81/p?fbclid=1&real=2",
        "https://one/",
        "http://dom.tld/path/with?msclkid=7",
    ]

    def oracle_norm(u):
        sp = urlsplit(u)
        scheme = sp.scheme.lower()
        host = sp.hostname or ""
        port = sp.port
        default = {"http": 80, "https": 443}.get(scheme)
        hostport = host if port is None or port == default else f"{host}:{port}"
        path = sp.path or "/"
        pairs = [p for p in sp.query.split("&") if p]
        kept = sorted(p for p in pairs
                      if not (p.split("=", 1)[0].lower().startswith("utm_")
                              or p.split("=", 1)[0].lower()
                              in ("gclid", "fbclid", "msclkid")))
        q = "&".join(kept)
        return f"{scheme}://{hostport}{path}" + (f"?{q}" if q else "")

    def oracle_surt(u):
        c = urlsplit(oracle_norm(u))
        host = c.hostname or ""
        rev = ",".join(reversed(host.split(".")))
        if c.port is not None:
            rev += f":{c.port}"
        return f"{rev}){c.path or '/'}" + (f"?{c.query}" if c.query else "")

    s = pd.Series(cases)
    assert normalize_urls(s).tolist() == [oracle_norm(u) for u in cases]
    assert surt_keys(s).tolist() == [oracle_surt(u) for u in cases]
    # non-URLs: canonical passes through, surt empty
    junk = pd.Series(["not a url", ""])
    assert normalize_urls(junk).tolist() == ["not a url", ""]
    assert surt_keys(junk).tolist() == ["", ""]


def test_span_dedup_planted_duplicates(ray_session, tmp_path):
    """Planted-corpus semantics: a span repeated across docs survives
    only at its first (doc_id, seg_no) occurrence; unique spans all
    survive; fully-duplicate docs vanish; reassembly preserves
    in-doc order."""
    import pyarrow.parquet as pq

    from igpm_pem_ray.pipelines.relational import SEG_W, q_span_dedup

    dup = " ".join(f"d{i}" for i in range(SEG_W))      # one full span
    uniq = {k: " ".join(f"u{k}_{i}" for i in range(SEG_W))
            for k in range(3)}
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            dup + " " + uniq[0],          # doc0: dup (first) + unique
            uniq[1] + " " + dup,          # doc1: dup again at seg 1
            dup,                          # doc2: ONLY the dup -> gone
            uniq[2] + " tail",            # doc3: unique + short tail
        ], pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))

    out = q_span_dedup(str(d)).to_pandas().set_index("doc_id")
    assert out.loc[0, "clean_text"] == dup + " " + uniq[0]
    assert out.loc[0, "n_kept"] == 2
    assert out.loc[1, "clean_text"] == uniq[1]         # dup removed
    assert out.loc[1, "n_kept"] == 1
    assert 2 not in out.index                          # nothing left
    assert out.loc[3, "clean_text"] == uniq[2] + " tail"
    assert out.loc[3, "n_kept"] == 2                   # partial span kept


def test_count_min_merge_is_exact_linear():
    """CMS is a linear sketch: summing per-chunk partials reproduces
    the single-pass table BIT FOR BIT (stronger than MG's
    bound-preserving merge)."""
    from igpm_pem_ray.text import sketch

    rng = np.random.RandomState(83)
    items = np.asarray([f"tok{v}" for v in
                        rng.zipf(1.5, size=5000) % 400], dtype=object)
    whole = sketch.cms_partial(items)
    merged = sum(sketch.cms_partial(items[i:i + 700])
                 for i in range(0, len(items), 700))
    assert (whole == merged).all()


def test_count_min_never_undercounts_and_overcount_bound():
    from collections import Counter

    from igpm_pem_ray.text import sketch

    rng = np.random.RandomState(89)
    items = np.asarray([f"w{v}" for v in
                        rng.randint(0, 1000, size=20000)], dtype=object)
    true = Counter(items.tolist())
    tab = sketch.cms_partial(items)
    probes = np.asarray(["w1", "w5", "w999", "absent_token"], dtype=object)
    est = sketch.cms_query(tab, probes)
    n, w = len(items), sketch.CMS_W
    for p, e in zip(probes, est):
        t = true.get(str(p), 0)
        assert e >= t                      # CMS never undercounts
        assert e - t <= max(5 * n // w, 8)  # generous e*N/w-style bound


def test_approx_token_freq_dataset_path():
    """Dataset plan (per-block sparse partials -> one groupby-sum ->
    driver probe) equals the single-process sketch exactly, and the
    planted counts come back within the bound."""
    from igpm_pem_ray.text import sketch

    docs = pd.DataFrame({
        "doc_id": range(40),
        "text": ["alpha beta gamma " * 5 + ("hot " * 10 if i % 2 else "")
                 for i in range(40)]})
    ds = rd.from_pandas(docs)
    out = sketch.approx_token_freq(
        ds, col="text", probes=["alpha", "hot", "zzz"]).to_pandas()
    got = dict(zip(out["token"], out["est_count"]))
    # single-process oracle sketch over the same token stream
    toks = []
    for t in docs["text"]:
        toks.extend(t.split())
    tab = sketch.cms_partial(np.asarray(toks, dtype=object))
    ref = sketch.cms_query(tab, np.asarray(["alpha", "hot", "zzz"],
                                           dtype=object))
    assert [got["alpha"], got["hot"], got["zzz"]] == ref.tolist()
    assert got["alpha"] >= 200 and got["hot"] >= 200
    assert got["zzz"] <= 8


def test_encode_bpe_matches_reference_encode():
    """Distributed BpeEncoder == a direct single-process encode under
    the same learned merge table (lowest-rank-first, greedy
    left-to-right within a rank)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from igpm_pem_ray.text.bpe import (END, _merge_word, encode_bpe,
                                       learn_bpe)

    rng = np.random.RandomState(23)
    vocab = ["low", "lower", "lowest", "newer", "wider", "new",
             "widening", "er", "e"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 20)))
             for _ in range(40)]
    docs = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                         "text": texts})
    ds = rd.from_pandas(docs).repartition(5)
    merges = learn_bpe(ds, 10)
    got = encode_bpe(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    rank_of = {(l, r): k for k, l, r in zip(merges["rank"].to_pylist(),
                                            merges["left"].to_pylist(),
                                            merges["right"].to_pylist())}

    def ref_encode(word):
        syms = list(word) + [END]
        while len(syms) > 1:
            cand = [(rank_of[(a, b)], (a, b))
                    for a, b in zip(syms[:-1], syms[1:])
                    if (a, b) in rank_of]
            if not cand:
                break
            _, (a, b) = min(cand)
            syms = _merge_word(syms, a, b, a + b)
        return syms

    for _, row in got.iterrows():
        ws = docs.loc[docs.doc_id == row.doc_id, "text"].iloc[0].split()
        assert row.n_words == len(ws)
        assert row.n_bpe_tokens == sum(len(ref_encode(w)) for w in ws)
    # merges actually compress: some doc must beat char+END length
    raw = docs["text"].str.split().map(
        lambda ws: sum(len(w) + 1 for w in ws))
    assert (got["n_bpe_tokens"].to_numpy() < raw.to_numpy()).any()


def test_textrank_hub_word_ranks_first():
    """A star-shaped word graph: 'hub' is adjacent to 8 distinct
    leaves that only ever touch 'hub', so TextRank must rank 'hub'
    strictly first; leaves all tie (symmetric roles) and the integer
    recurrence makes the tie exact."""
    import pandas as pd
    import ray.data as rd

    from igpm_pem_ray.text.textrank import textrank_terms

    leaves = [f"leaf{i}" for i in range(8)]
    docs = rd.from_pandas(pd.DataFrame({
        "text": [f"hub {w} hub" for w in leaves]}))
    t = textrank_terms(docs, n_iters=5, k=10)
    terms = t["term"].to_pylist()
    ranks = t["rank"].to_pylist()
    assert terms[0] == "hub"
    assert ranks[0] > ranks[1]
    assert len(set(ranks[1:])) == 1


def test_textrank_pair_dedup_and_self_pairs():
    """Repeated and self-adjacent tokens collapse: 'a a b' and
    'b a' yield the single undirected pair (a, b) — two vertices
    with equal rank."""
    import pandas as pd
    import ray.data as rd

    from igpm_pem_ray.text.textrank import textrank_terms, word_pair_table

    docs = rd.from_pandas(pd.DataFrame({"text": ["a a b", "b a"]}))
    pairs = word_pair_table(docs).to_pandas()
    assert sorted(map(tuple, pairs.values.tolist())) == [("a", "b")]
    t = textrank_terms(docs, n_iters=3, k=10)
    assert t["rank"].to_pylist()[0] == t["rank"].to_pylist()[1]


def test_readability_counts_and_fallback():
    """Punctuated text uses real terminator runs; terminator-free text
    falls back to 1 + words//16 segments; the e3 score matches the
    hand-computed integer formula."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from igpm_pem_ray.pipelines import analytics as an

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["The cat sat. The dog ran! Really?? ok",
                 " ".join(["word"] * 40)],
        "lang": ["en", "en"], "source": ["a", "a"],
        "n_chars": [10, 10]})
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        docs.to_parquet(os.path.join(d, "documents.parquet"))
        out = an.q_readability(d).to_pandas().set_index("doc_id")
    # doc 1: 8 whitespace-delimited words (punctuation attaches), 3
    # terminator runs (".", "!", "??"), 9 vowel groups ("really" has 2)
    assert out.loc[1, ["words", "sentences", "syllables"]].tolist() == [8, 3, 9]
    assert out.loc[1, "fre_e3"] == 206835 - (1015 * 8) // 3 - (84600 * 9) // 8
    # doc 2: 40 words, no terminators -> 1 + 40//16 = 3 segments
    assert out.loc[2, "sentences"] == 3


def test_lev_le1_all_edit_classes():
    """Vectorized <=1-distance verification: equality, substitution,
    insertion, deletion, shared-deletion false candidates ('ab'/'ba'),
    gap-2, and last/first-char edits."""
    import numpy as np
    import pandas as pd

    from igpm_pem_ray.text.editdist import deletion_variants, lev_le1

    a = pd.Series(["cat", "cat", "cat", "cats", "ab", "cat", "a",
                   "xcat", "cat", ""])
    b = pd.Series(["cat", "bat", "cut", "cat", "ba", "catss", "",
                   "cat", "ca", "a"])
    got = lev_le1(a, b)
    assert got.tolist() == [0, 1, 1, 1, -1, -1, 1, 1, 1, 1]

    # deletion-neighborhood recall: every true <=1 pair shares a variant
    names = pd.Series(["abc", "abd", "ab", "abcd", "zzz"])
    keys = np.arange(5, dtype=np.int64)
    v = deletion_variants(names, keys)
    bucket = v.groupby("v")["key"].apply(set)
    cand = set()
    for ks in bucket:
        cand |= {(i, j) for i in ks for j in ks if i < j}
    for i in range(5):
        for j in range(i + 1, 5):
            d = lev_le1(pd.Series([names[i]]), pd.Series([names[j]]))[0]
            if d >= 0:
                assert (i, j) in cand, (names[i], names[j])


def test_doc_compress_ratio_oracle(ray_session):
    """q_doc_compress_ratio == a direct single-process zlib replay
    over the same parquet (the rows-only oracle)."""
    import zlib

    import pandas as pd
    import pyarrow.parquet as pq

    from igpm_pem_ray.pipelines.analytics import (COMP_E6,
                                                  COMP_REPETITIVE_E6,
                                                  q_doc_compress_ratio)

    sf = "/root/testdata/sf0.001"
    got = q_doc_compress_ratio(sf).to_pandas() \
        .sort_values("source").reset_index(drop=True)

    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["text", "source"]).to_pandas()
    rows = []
    for src, txt in zip(t["source"], t["text"]):
        raw = (txt or "").encode("utf-8")
        if not raw:
            continue
        r = len(zlib.compress(raw, 6)) * COMP_E6 // len(raw)
        rows.append((src, r, 1 if r < COMP_REPETITIVE_E6 else 0))
    exp = pd.DataFrame(rows, columns=["source", "r", "rep"]) \
        .groupby("source", as_index=False) \
        .agg(n_docs=("r", "size"), sum_ratio_e6=("r", "sum"),
             n_repetitive=("rep", "sum")) \
        .sort_values("source").reset_index(drop=True)
    assert (got["n_docs"] == exp["n_docs"]).all()
    assert (got["sum_ratio_e6"] == exp["sum_ratio_e6"]).all()
    assert (got["n_repetitive"] == exp["n_repetitive"]).all()


def test_scene_cuts_planted(ray_session):
    """SceneCuts recovers exactly the planted shot boundaries of
    synthetic constant-intensity scene videos (integer SAD detector,
    zero false positives inside scenes)."""
    import numpy as np
    import pyarrow as pa_
    import ray.data as rd_

    from igpm_pem_ray.multimodal.codec import encode_frames
    from igpm_pem_ray.multimodal.decode import scene_cuts

    rng = np.random.RandomState(3)
    vids, truth = [], {}
    for mid in range(6):
        frames, cuts = [], []
        level = int(rng.randint(0, 200))
        fidx = 0
        for scene in range(3):
            for _ in range(4):
                img = np.full((8, 8, 3), level, np.uint8)
                img[0, 0, 0] = (level + fidx) % 256  # tiny in-scene jitter
                frames.append(img)
                fidx += 1
            if scene < 2:
                cuts.append(fidx)  # next appended frame starts a new scene
                level = (level + 97) % 256
        vids.append(encode_frames(frames))
        truth[mid] = cuts
    media = rd_.from_arrow(pa_.table({
        "media_id": pa_.array(range(len(vids)), pa_.int64()),
        "payload": pa_.array(vids, pa_.binary())}))
    out = scene_cuts(media, concurrency=2, batch_size=2).to_pandas()
    for mid, cuts in truth.items():
        got = sorted(out[(out["media_id"] == mid) & (out["is_cut"] == 1)]
                     ["frame"].tolist())
        assert got == cuts, (mid, got, cuts)
    # every transition row accounted for: 11 per video
    assert (out.groupby("media_id").size() == 11).all()
