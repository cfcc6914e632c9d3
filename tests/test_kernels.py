"""Kernel parity vs independent oracles (SURVEY.md section 5 test plan)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from igpm_pem_ray.graph import components as cc_mod
from igpm_pem_ray.graph import degrees as deg_mod
from igpm_pem_ray.graph import labelprop as lp_mod
from igpm_pem_ray.graph import pagerank as pr_mod
from igpm_pem_ray.graph import triangles as tri_mod
from igpm_pem_ray.sources import pages as pages_mod
from igpm_pem_ray import ids

from tests import oracles


def _fixture_graph(n_pages=120, seed=42):
    synth = pages_mod.generate_pages(n_pages, seed=seed, m=4)
    edges = [(ids.url_to_vid(s.as_py()), ids.url_to_vid(d.as_py()))
             for s, d in zip(synth.expected_edges["src_url"],
                             synth.expected_edges["dst_url"])]
    vids = sorted({v for e in edges for v in e})
    return edges, vids


@pytest.fixture(scope="module")
def graph():
    edges, vids = _fixture_graph()
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], type=pa.int64()),
        "dst": pa.array([e[1] for e in edges], type=pa.int64()),
    })).repartition(8)
    return edges, vids, ds


def test_pagerank_matches_oracle(graph):
    edges, vids, ds = graph
    stats = {}
    got = pr_mod.pagerank(ds, damping=0.85, tol=1e-10, stats=stats)
    exp = oracles.pagerank_oracle(edges, vids, damping=0.85, tol=1e-10)
    got_map = dict(zip(got["vid"].to_pylist(), got["rank"].to_pylist()))
    assert set(got_map) == set(exp)
    for v in vids:
        assert got_map[v] == pytest.approx(exp[v], abs=1e-6)
    assert stats["iterations"] > 2
    assert abs(sum(got_map.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_dangling_mass_conserved():
    # graph with a dangling sink: 1->2, 3->2 ; vertex 2 has no out-edges
    ds = rd.from_arrow(pa.table({"src": pa.array([1, 3], type=pa.int64()),
                                 "dst": pa.array([2, 2], type=pa.int64())}))
    got = pr_mod.pagerank(ds, tol=1e-12)
    exp = oracles.pagerank_oracle([(1, 2), (3, 2)], [1, 2, 3], tol=1e-12)
    for v, r in zip(got["vid"].to_pylist(), got["rank"].to_pylist()):
        assert r == pytest.approx(exp[v], abs=1e-9)


def test_rwr_reference_parity(graph):
    """Engine RWR == literal transcription of the reference formula
    (reversed adjacency, column-normalized, restart 0.7, L1 tol)."""
    edges, vids, ds = graph
    src = vids[3]
    got = pr_mod.rwr(ds, restart=0.7, tol=1e-8, source_vid=src)
    exp = oracles.rwr_oracle(edges, vids, restart=0.7, tol=1e-8, source=src)
    got_map = dict(zip(got["vid"].to_pylist(), got["score"].to_pylist()))
    for v in vids:
        assert got_map[v] == pytest.approx(exp[v], abs=1e-6)


def test_connected_components_exact(graph):
    edges, vids, ds = graph
    got = cc_mod.connected_components(ds)
    exp = oracles.components_oracle(edges, vids)
    got_map = dict(zip(got["vid"].to_pylist(), got["component"].to_pylist()))
    assert got_map == exp


def test_connected_components_two_islands():
    ds = rd.from_arrow(pa.table({"src": pa.array([1, 2, 10], type=pa.int64()),
                                 "dst": pa.array([2, 3, 11], type=pa.int64())}))
    got = cc_mod.connected_components(ds)
    got_map = dict(zip(got["vid"].to_pylist(), got["component"].to_pylist()))
    assert got_map == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_label_propagation_matches_oracle(graph):
    edges, vids, ds = graph
    got = lp_mod.label_propagation(ds, max_rounds=7)
    # oracle labels are raw vids throughout; engine returns raw too
    exp = oracles.labelprop_oracle(edges, vids, max_rounds=7)
    got_map = dict(zip(got["vid"].to_pylist(), got["label"].to_pylist()))
    assert got_map == exp


def test_triangles_exact(graph):
    edges, vids, ds = graph
    got = tri_mod.triangle_count(ds, num_partitions=4)
    assert got == oracles.triangles_oracle(edges, vids)


def test_triangles_tiny():
    # K4 has 4 triangles; add a parallel edge + self loop (must not count)
    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 2), (2, 2)]
    ds = rd.from_arrow(pa.table({"src": pa.array([a for a, _ in e], type=pa.int64()),
                                 "dst": pa.array([b for _, b in e], type=pa.int64())}))
    assert tri_mod.triangle_count(ds, num_partitions=2) == 4


def test_star_count():
    # star center 0 with 5 leaves -> one vertex with degree >= 4
    e = [(0, i) for i in range(1, 6)]
    ds = rd.from_arrow(pa.table({"src": pa.array([a for a, _ in e], type=pa.int64()),
                                 "dst": pa.array([b for _, b in e], type=pa.int64())}))
    assert tri_mod.star_count(ds, min_degree=4) == 1
    assert tri_mod.star_count(ds, min_degree=5) == 1
    assert tri_mod.star_count(ds, min_degree=6) == 0


def test_degree_distribution(graph):
    edges, vids, ds = graph
    from collections import Counter
    outdeg = Counter()
    for s, _ in edges:
        outdeg[s] += 1
    dist = Counter(outdeg.values())
    got = {r["degree"]: r["n_vertices"]
           for r in deg_mod.degree_distribution(ds, direction="out").take_all()}
    assert got == dict(dist)


def test_vertex_domain_auto_shuffle_fallback(monkeypatch):
    """strategy="auto" must actually route through the shuffle path
    (Dataset.unique) when the per-block-unique funnel exceeds
    DRIVER_MERGE_MAX_V, and both paths must agree exactly."""
    from igpm_pem_ray.graph import dense as dense_mod

    rng = np.random.RandomState(7)
    src = rng.randint(0, 500, size=2000).astype(np.int64)
    dst = rng.randint(0, 500, size=2000).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    expect = np.unique(np.concatenate([src, dst]))
    driver = dense_mod.vertex_domain(edges, strategy="driver")
    assert np.array_equal(driver, expect)

    called = {}
    orig_unique = rd.Dataset.unique

    def spy(self, col):
        called["col"] = col
        return orig_unique(self, col)

    monkeypatch.setattr(rd.Dataset, "unique", spy)
    monkeypatch.setattr(dense_mod, "DRIVER_MERGE_MAX_V", 0)
    auto = dense_mod.vertex_domain(edges, strategy="auto")
    assert called.get("col") == "vid"  # shuffle path actually ran
    assert np.array_equal(auto, expect)

    # above-threshold auto stays on the driver path (no unique call)
    called.clear()
    monkeypatch.setattr(dense_mod, "DRIVER_MERGE_MAX_V", 10**9)
    auto2 = dense_mod.vertex_domain(edges, strategy="auto")
    assert "col" not in called
    assert np.array_equal(auto2, expect)

    with pytest.raises(ValueError):
        dense_mod.vertex_domain(edges, strategy="bogus")


def test_extend_dense_graph_equivalence():
    """Incrementally extended graphs run kernels identically to a fresh
    full build (K7 scale path: no per-step re-sort)."""
    from igpm_pem_ray.graph import dense as dense_mod

    rng = np.random.RandomState(11)
    src = rng.randint(0, 400, size=3000).astype(np.int64)
    dst = rng.randint(0, 400, size=3000).astype(np.int64)
    cuts = [0, 1000, 2000, 3000]

    def mk(lo, hi):
        return rd.from_arrow(pa.table({"src": src[lo:hi], "dst": dst[lo:hi]}))

    for symmetric in (False, True):
        g_inc = dense_mod.build_dense_graph(mk(0, 1000), symmetric=symmetric)
        for i in range(1, 3):
            g_inc = dense_mod.extend_dense_graph(g_inc, mk(cuts[i], cuts[i + 1]))
        g_full = dense_mod.build_dense_graph(mk(0, 3000), symmetric=symmetric)
        assert np.array_equal(g_inc.vids, g_full.vids)
        assert g_inc.num_edges == g_full.num_edges
        assert np.array_equal(g_inc.outdeg, g_full.outdeg)
        if symmetric:
            li = cc_mod.connected_components_dense(g_inc)
            lf = cc_mod.connected_components_dense(g_full)
            assert np.array_equal(li, lf)
        else:
            ri = pr_mod.pagerank_dense(g_inc, tol=1e-10)
            rf = pr_mod.pagerank_dense(g_full, tol=1e-10)
            assert np.allclose(ri, rf, atol=1e-9)


def test_shuffle_kernels_parity():
    """Dataset-resident (shuffle) kernel variants match the dense fast
    path: PageRank allclose(1e-9), WCC exact (VERDICT r1 #7)."""
    from igpm_pem_ray.graph import shuffle_kernels as sk

    rng = np.random.RandomState(23)
    src = rng.randint(0, 150, size=900).astype(np.int64)
    dst = rng.randint(0, 150, size=900).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    dense_pr = pr_mod.pagerank(ds, tol=1e-10)
    got_pr = sk.pagerank_shuffle(ds, tol=1e-10).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    want = dict(zip(dense_pr["vid"].to_pylist(), dense_pr["rank"].to_pylist()))
    assert len(got_pr) == len(want)
    for v, r in zip(got_pr["vid"], got_pr["rank"]):
        assert abs(want[int(v)] - r) < 1e-9

    dense_cc = cc_mod.connected_components(ds)
    got_cc = sk.connected_components_shuffle(ds).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    want_cc = dict(zip(dense_cc["vid"].to_pylist(),
                       dense_cc["component"].to_pylist()))
    assert {int(v): int(c) for v, c in zip(got_cc["vid"], got_cc["component"])} \
        == want_cc


def test_triangle_join_strategy_parity():
    """The join-plan fallback (the >50M-edge path where no CSR
    broadcasts) counts identically to the broadcast-CSR path on a
    denser random graph (VERDICT r1 #10)."""
    rng = np.random.RandomState(77)
    src = rng.randint(0, 300, size=5000).astype(np.int64)
    dst = rng.randint(0, 300, size=5000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    n_bcast = tri_mod.triangle_count(ds, strategy="broadcast")
    n_join = tri_mod.triangle_count(ds, strategy="join", num_partitions=3)
    assert n_join == n_bcast > 0


def test_lp_shuffle_parity():
    """Dataset-resident label propagation matches the dense fast path
    exactly at the same round cap (sync semantics + tie-break pinned)."""
    from igpm_pem_ray.graph import shuffle_kernels as sk

    rng = np.random.RandomState(31)
    src = rng.randint(0, 120, size=700).astype(np.int64)
    dst = rng.randint(0, 120, size=700).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    for rounds in (1, 3):
        want = lp_mod.label_propagation(ds, max_rounds=rounds)
        got = sk.label_propagation_shuffle(ds, max_rounds=rounds).to_pandas() \
            .sort_values("vid").reset_index(drop=True)
        w = dict(zip(want["vid"].to_pylist(), want["label"].to_pylist()))
        assert {int(v): int(l) for v, l in zip(got["vid"], got["label"])} == w


def test_star_count_strategies():
    e = [(0, i) for i in range(1, 6)] + [(1, 2), (0, 1)]  # dup edge + extra
    ds = rd.from_arrow(pa.table({"src": pa.array([a for a, _ in e], type=pa.int64()),
                                 "dst": pa.array([b for _, b in e], type=pa.int64())}))
    for strat in ("broadcast", "join"):
        assert tri_mod.star_count(ds, min_degree=4, strategy=strat) == 1
        assert tri_mod.star_count(ds, min_degree=6, strategy=strat) == 0


def test_extend_compaction_equivalence(monkeypatch):
    """Many small extends trigger the amortized compaction rebuild;
    kernel results stay identical to a fresh full build."""
    from igpm_pem_ray.graph import dense as dense_mod

    monkeypatch.setattr(dense_mod, "COMPACT_MAX_BLOCKS", 6)
    rng = np.random.RandomState(17)
    src = rng.randint(0, 100, size=1200).astype(np.int64)
    dst = rng.randint(0, 100, size=1200).astype(np.int64)

    def mk(lo, hi):
        return rd.from_arrow(pa.table({"src": src[lo:hi], "dst": dst[lo:hi]}))

    g = dense_mod.build_dense_graph(mk(0, 200))
    for i in range(1, 6):
        g = dense_mod.extend_dense_graph(g, mk(200 * i, 200 * (i + 1)))
    g_full = dense_mod.build_dense_graph(mk(0, 1200))
    assert np.array_equal(g.vids, g_full.vids)
    assert g.num_edges == g_full.num_edges
    assert np.array_equal(g.outdeg, g_full.outdeg)
    ri = pr_mod.pagerank_dense(g, tol=1e-10)
    rf = pr_mod.pagerank_dense(g_full, tol=1e-10)
    assert np.allclose(ri, rf, atol=1e-9)


def test_per_vertex_triangles_both_strategies(graph):
    edges, vids, ds = graph
    exp = oracles.per_vertex_triangles_oracle(edges, vids)
    # kernel semantics: vertices of the SIMPLE graph — a vertex whose
    # only edges are self loops has no simple edge and is excluded
    simple_vids = {v for a, b in edges if a != b for v in (a, b)}
    exp = {v: c for v, c in exp.items() if v in simple_vids}
    for strat in ("broadcast", "join"):
        got = tri_mod.per_vertex_triangles(ds, strategy=strat,
                                           num_partitions=4).to_pandas()
        got_map = dict(zip(got["vid"], got["n_triangles"]))
        assert got_map == exp, strat
        # degree column matches the simple undirected degree
        assert int(got["degree"].sum()) == 2 * len(
            {(min(a, b), max(a, b)) for a, b in edges if a != b})


def test_kcore_matches_oracle(graph):
    from igpm_pem_ray.graph import kcore as kcore_mod

    edges, vids, ds = graph
    exp = oracles.kcore_oracle(edges, vids)
    simple_vids = {v for a, b in edges if a != b for v in (a, b)}
    exp = {v: c for v, c in exp.items() if v in simple_vids}
    got = kcore_mod.core_numbers(ds).to_pandas()
    assert dict(zip(got["vid"], got["core"])) == exp


def test_kcore_membership_parity(graph):
    """Dataset-resident peel == dense core>=k membership, several k."""
    from igpm_pem_ray.graph import kcore as kcore_mod

    edges, vids, ds = graph
    core = oracles.kcore_oracle(edges, vids)
    max_core = max(core.values())
    for k in (2, max(3, max_core // 2), max_core):
        surv = kcore_mod.kcore_membership(ds, k, num_partitions=2)
        got = set(surv.to_pandas()["vid"])
        assert got == {v for v, c in core.items() if c >= k}, k


def test_kcore_hindex_parity(graph):
    """Dataset-resident h-index fixpoint (Lu et al. 2016) == dense
    Batagelj-Zaversnik core numbers, every vertex."""
    from igpm_pem_ray.graph import kcore as kcore_mod

    edges, vids, ds = graph
    want = kcore_mod.core_numbers(ds).to_pandas()
    stats: dict = {}
    got = kcore_mod.core_numbers_hindex(ds, num_partitions=2,
                                        stats=stats).to_pandas()
    assert dict(zip(got["vid"], got["core"])) == dict(
        zip(want["vid"], want["core"]))
    assert stats["rounds"] >= 1


def test_kcore_tiny_multigraph():
    """K4 + pendant + parallel edge + self loop: K4 is the 3-core."""
    from igpm_pem_ray.graph import kcore as kcore_mod

    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
         (1, 2), (3, 3)]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in e], type=pa.int64()),
        "dst": pa.array([b for _, b in e], type=pa.int64())}))
    got = dict(zip(*[kcore_mod.core_numbers(ds).to_pandas()[c]
                     for c in ("vid", "core")]))
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 1}


def test_link_predict_strategies_vs_bruteforce():
    """common_neighbors_topk: broadcast-CSR plan == Dataset join plan
    == O(V^2) numpy oracle (counts, pairs, AND deterministic
    (count desc, src, dst) order), non-adjacency enforced."""
    from igpm_pem_ray.graph import linkpred as lpred_mod

    rng = np.random.RandomState(41)
    src = rng.randint(0, 80, size=600).astype(np.int64)
    dst = rng.randint(0, 80, size=600).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    # brute-force oracle on the simple undirected graph
    V = 80
    adj = np.zeros((V, V), dtype=bool)
    keep = src != dst
    adj[src[keep], dst[keep]] = True
    adj[dst[keep], src[keep]] = True
    common = (adj.astype(np.int64) @ adj.astype(np.int64))
    rows = []
    for a in range(V):
        for b in range(a + 1, V):
            if not adj[a, b] and common[a, b] > 0:
                rows.append((int(common[a, b]), a, b))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    k = 15
    want = [(a, b, c) for c, a, b in rows[:k]]

    for strat in ("broadcast", "join"):
        got = lpred_mod.common_neighbors_topk(ds, k=k, strategy=strat,
                                              num_partitions=3)
        triples = list(zip(got["src"].to_pylist(), got["dst"].to_pylist(),
                           got["n_common"].to_pylist()))
        assert triples == want, strat


def test_link_predict_empty_and_tiny():
    from igpm_pem_ray.graph import linkpred as lpred_mod

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    assert lpred_mod.common_neighbors_topk(empty, k=5).num_rows == 0
    # path graph 1-2-3: only (1,3) shares a neighbor and isn't adjacent
    path = rd.from_arrow(pa.table({"src": pa.array([1, 2], pa.int64()),
                                   "dst": pa.array([2, 3], pa.int64())}))
    t = lpred_mod.common_neighbors_topk(path, k=5)
    assert t.to_pydict() == {"src": [1], "dst": [3], "n_common": [1]}


def test_jaccard_topk_strategies_vs_bruteforce():
    """jaccard_topk: broadcast plan == join plan == O(V^2) numpy
    oracle, ranked by cn/(deg_a+deg_b-cn) with (src, dst) tie-break,
    integer n_common/n_union columns, non-adjacency enforced."""
    from igpm_pem_ray.graph import linkpred as lpred_mod

    rng = np.random.RandomState(47)
    src = rng.randint(0, 70, size=500).astype(np.int64)
    dst = rng.randint(0, 70, size=500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    V = 70
    adj = np.zeros((V, V), dtype=bool)
    keep = src != dst
    adj[src[keep], dst[keep]] = True
    adj[dst[keep], src[keep]] = True
    deg = adj.sum(axis=1).astype(np.int64)
    common = adj.astype(np.int64) @ adj.astype(np.int64)
    rows = []
    for a in range(V):
        for b in range(a + 1, V):
            if not adj[a, b] and common[a, b] > 0:
                un = int(deg[a] + deg[b] - common[a, b])
                rows.append((int(common[a, b]) / un, a, b,
                             int(common[a, b]), un))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    k = 15
    want = [(a, b, cn, un) for _, a, b, cn, un in rows[:k]]

    for strat in ("broadcast", "join"):
        got = lpred_mod.jaccard_topk(ds, k=k, strategy=strat,
                                     num_partitions=3)
        quads = list(zip(got["src"].to_pylist(), got["dst"].to_pylist(),
                         got["n_common"].to_pylist(),
                         got["n_union"].to_pylist()))
        assert quads == want, strat


def test_jaccard_topk_empty_and_tiny():
    from igpm_pem_ray.graph import linkpred as lpred_mod

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    assert lpred_mod.jaccard_topk(empty, k=5).num_rows == 0
    # path 1-2-3: pair (1,3), n_common=1, union = 1+1-1 = 1 -> jac 1.0
    path = rd.from_arrow(pa.table({"src": pa.array([1, 2], pa.int64()),
                                   "dst": pa.array([2, 3], pa.int64())}))
    t = lpred_mod.jaccard_topk(path, k=5)
    assert t.to_pydict() == {"src": [1], "dst": [3],
                             "n_common": [1], "n_union": [1]}


def test_resource_allocation_topk_strategies_vs_bruteforce():
    """resource_allocation_topk: broadcast plan == join plan == O(V^2)
    numpy oracle summing RA_SCALE // deg(z) per common neighbor z
    (exact int64), ranked (ra desc, src, dst), non-adjacency
    enforced."""
    from igpm_pem_ray.graph import linkpred as lpred_mod

    rng = np.random.RandomState(53)
    src = rng.randint(0, 70, size=500).astype(np.int64)
    dst = rng.randint(0, 70, size=500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    V = 70
    adj = np.zeros((V, V), dtype=bool)
    keep = src != dst
    adj[src[keep], dst[keep]] = True
    adj[dst[keep], src[keep]] = True
    deg = adj.sum(axis=1).astype(np.int64)
    wv = lpred_mod.RA_SCALE // np.maximum(deg, 1)
    rows = []
    for a in range(V):
        for b in range(a + 1, V):
            if adj[a, b]:
                continue
            zs = np.flatnonzero(adj[a] & adj[b])
            if len(zs):
                rows.append((int(wv[zs].sum()), a, b))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    k = 15
    want = [(a, b, ra) for ra, a, b in rows[:k]]

    for strat in ("broadcast", "join"):
        got = lpred_mod.resource_allocation_topk(ds, k=k, strategy=strat,
                                                 num_partitions=3)
        triples = list(zip(got["src"].to_pylist(), got["dst"].to_pylist(),
                           got["ra_e6"].to_pylist()))
        assert triples == want, strat


def test_resource_allocation_topk_empty_and_tiny():
    from igpm_pem_ray.graph import linkpred as lpred_mod

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    assert lpred_mod.resource_allocation_topk(empty, k=5).num_rows == 0
    # path 1-2-3: pair (1,3) via middle 2 of degree 2 -> RA_SCALE // 2
    path = rd.from_arrow(pa.table({"src": pa.array([1, 2], pa.int64()),
                                   "dst": pa.array([2, 3], pa.int64())}))
    t = lpred_mod.resource_allocation_topk(path, k=5)
    assert t.to_pydict() == {"src": [1], "dst": [3],
                             "ra_e6": [lpred_mod.RA_SCALE // 2]}


def test_degree_correlation_vs_bruteforce():
    """avg_neighbor_degree + knn_curve == numpy oracle on the simple
    undirected graph, exact-integer e6 (the (2e6*s + c) // (2c)
    half-up convention shared with the SQL oracles)."""
    from igpm_pem_ray.graph import degrees as deg_mod2

    rng = np.random.RandomState(59)
    src = rng.randint(0, 60, size=400).astype(np.int64)
    dst = rng.randint(0, 60, size=400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    V = 60
    adj = np.zeros((V, V), dtype=bool)
    keep = src != dst
    adj[src[keep], dst[keep]] = True
    adj[dst[keep], src[keep]] = True
    deg = adj.sum(axis=1).astype(np.int64)

    annd = deg_mod2.avg_neighbor_degree(ds).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    exp_rows = []
    for v in range(V):
        ns = np.flatnonzero(adj[v])
        if not len(ns):
            continue
        s, c = int(deg[ns].sum()), len(ns)
        exp_rows.append((v, int(deg[v]), (2_000_000 * s + c) // (2 * c)))
    got_rows = list(zip(annd["vid"], annd["degree"], annd["annd_e6"]))
    assert got_rows == exp_rows

    knn = deg_mod2.knn_curve(ds).to_pandas() \
        .sort_values("degree").reset_index(drop=True)
    by_k: dict[int, list[int]] = {}
    for v in range(V):
        for u in np.flatnonzero(adj[v]):
            by_k.setdefault(int(deg[v]), []).append(int(deg[u]))
    exp_k = [(kk, (2_000_000 * sum(vs) + len(vs)) // (2 * len(vs)), len(vs))
             for kk, vs in sorted(by_k.items())]
    got_k = list(zip(knn["degree"], knn["knn_e6"], knn["n_endpoints"]))
    assert got_k == exp_k


def test_bfs_levels_vs_oracle():
    """bfs_levels == numpy frontier BFS on the undirected simple
    graph; unreached vertices absent; max_depth cap honored."""
    from igpm_pem_ray.graph import bfs as bfs_mod

    rng = np.random.RandomState(53)
    src = rng.randint(0, 120, size=300).astype(np.int64)
    dst = rng.randint(0, 120, size=300).astype(np.int64)
    # two extra vertices in a far component: 200-201
    src = np.concatenate([src, [200]])
    dst = np.concatenate([dst, [201]])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    # oracle
    V = 202
    adj = [[] for _ in range(V)]
    for a, b in zip(src, dst):
        if a != b:
            adj[a].append(b)
            adj[b].append(a)
    source = int(min(np.concatenate([src, dst])))
    INF = -1
    lvl = [INF] * V
    lvl[source] = 0
    frontier = [source]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for v in frontier:
            for w in adj[v]:
                if lvl[w] == INF:
                    lvl[w] = d
                    nxt.append(w)
        frontier = nxt
    want = {v: l for v, l in enumerate(lvl) if l >= 0}

    got = bfs_mod.bfs_levels(ds)
    gmap = dict(zip(got["vid"].to_pylist(), got["level"].to_pylist()))
    assert gmap == want
    # 200/201 unreachable from the main component's min vid
    assert 200 not in gmap and 201 not in gmap

    capped = bfs_mod.bfs_levels(ds, max_depth=1)
    cmap = dict(zip(capped["vid"].to_pylist(), capped["level"].to_pylist()))
    assert cmap == {v: l for v, l in want.items() if l <= 1}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        bfs_mod.bfs_levels(ds, source=9999)


def test_hits_vs_dense_oracle():
    """hits() == explicit numpy matrix HITS (L1-normalized) to 1e-12;
    pure-source and pure-sink vertices land on the right side."""
    from igpm_pem_ray.graph import hits as hits_mod

    rng = np.random.RandomState(67)
    src = rng.randint(0, 60, size=400).astype(np.int64)
    dst = rng.randint(0, 60, size=400).astype(np.int64)
    # vertex 100: pure hub (only out-edges); 101: pure authority
    src = np.concatenate([src, [100, 100, 0, 1]])
    dst = np.concatenate([dst, [0, 1, 101, 101]])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    t = hits_mod.hits(ds, n_iters=7)
    vids = np.array(t["vid"].to_pylist())
    V = len(vids)
    pos = {v: i for i, v in enumerate(vids)}
    A = np.zeros((V, V))
    for a, b in zip(src, dst):
        A[pos[a], pos[b]] += 1.0
    h = np.full(V, 1.0 / V)
    for _ in range(7):
        a = A.T @ h
        a = a / a.sum()
        h = A @ a
        h = h / h.sum()
    assert np.allclose(np.array(t["hub"].to_pylist()), h, atol=1e-12)
    assert np.allclose(np.array(t["auth"].to_pylist()), a, atol=1e-12)
    assert t["auth"].to_pylist()[pos[100]] == 0.0  # pure hub: no in-edges
    assert t["hub"].to_pylist()[pos[101]] == 0.0   # pure sink: no out-edges


def test_contract_strategies_vs_oracle():
    """Graph contraction: broadcast translate == join plan == Python
    oracle, with string group ids, canonical undirected pairs, and
    unmapped-endpoint drops (inner-join semantics)."""
    from collections import Counter

    from igpm_pem_ray.graph import contract as contract_mod

    rng = np.random.RandomState(71)
    src = rng.randint(0, 50, size=400).astype(np.int64)
    dst = rng.randint(0, 50, size=400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    # vertices 45-49 deliberately unmapped
    mapping = rd.from_arrow(pa.table({
        "vid": pa.array(np.arange(45, dtype=np.int64)),
        "group": pa.array([f"g{v % 7}" for v in range(45)]),
    }))

    want = Counter()
    for a, b in zip(src, dst):
        if a < 45 and b < 45:
            ga, gb = f"g{a % 7}", f"g{b % 7}"
            want[(min(ga, gb), max(ga, gb))] += 1

    for strat in ("broadcast", "join"):
        out = contract_mod.contract(ds, mapping, strategy=strat,
                                    num_partitions=3).to_pandas()
        got = {(r.src_group, r.dst_group): r.n_edges
               for r in out.itertuples()}
        assert got == dict(want), strat

    # directed variant keeps orientation
    out = contract_mod.contract(ds, mapping, strategy="broadcast",
                                directed=True).to_pandas()
    want_dir = Counter()
    for a, b in zip(src, dst):
        if a < 45 and b < 45:
            want_dir[(f"g{a % 7}", f"g{b % 7}")] += 1
    got = {(r.src_group, r.dst_group): r.n_edges for r in out.itertuples()}
    assert got == dict(want_dir)


def test_assortativity_vs_brute_force():
    """degree_moments == exact per-edge brute force; coefficient ==
    np.corrcoef over the symmetrized endpoint-degree pairs (1e-12)."""
    from collections import Counter

    from igpm_pem_ray.graph import assortativity as asst_mod

    rng = np.random.RandomState(11)
    pairs = set()
    while len(pairs) < 300:
        a, b = rng.randint(0, 80, size=2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    src = np.array([a for a, _ in sorted(pairs)], dtype=np.int64)
    dst = np.array([b for _, b in sorted(pairs)], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    mom, r = asst_mod.assortativity(ds, num_partitions=3)

    deg = Counter(src.tolist()) + Counter(dst.tolist())
    x = np.array([deg[a] for a in src], dtype=np.int64)
    y = np.array([deg[b] for b in dst], dtype=np.int64)
    assert mom["m"] == 2 * len(src)
    assert mom["sx"] == int((x + y).sum())
    assert mom["sxx"] == int((x * x + y * y).sum())
    assert mom["sxy"] == int(2 * (x * y).sum())
    xs = np.concatenate([x, y]).astype(float)
    ys = np.concatenate([y, x]).astype(float)
    assert abs(r - np.corrcoef(xs, ys)[0, 1]) < 1e-12


def _tarjan_scc(n_vertices: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan; returns vertex -> min vid in its SCC."""
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]

    def strong(v0: int) -> None:
        work = [(v0, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if not recurse:
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    root = min(comp)
                    for w in comp:
                        out[w] = root
                if work:
                    pv = work[-1][0]
                    low[pv] = min(low[pv], low[v])

    for v in range(n_vertices):
        if v in adj or any(v == b for bs in adj.values() for b in bs):
            if v not in index:
                strong(v)
    return out


def test_scc_vs_tarjan_oracle():
    """trim+coloring+backward-reach SCC == iterative Tarjan on seeded
    random digraphs with planted cycles, tendrils, and a DAG case."""
    from igpm_pem_ray.graph import scc as scc_mod

    rng = np.random.RandomState(5)
    cases = []
    # random digraph (cycles arise naturally at this density)
    e1 = {(int(a), int(b)) for a, b in rng.randint(0, 60, size=(300, 2)) if a != b}
    cases.append((60, sorted(e1)))
    # planted ring + chain tendrils + isolated 2-cycle
    e2 = [(i, (i + 1) % 10) for i in range(10)]           # 10-ring
    e2 += [(10 + i, 11 + i) for i in range(5)]            # chain (trivial sccs)
    e2 += [(15, 10), (20, 21), (21, 20), (5, 15)]         # 2-cycle + bridge
    cases.append((22, e2))
    # pure DAG: all sccs trivial
    e3 = [(a, b) for a in range(12) for b in range(a + 1, 12) if (a + b) % 3 == 0]
    cases.append((12, e3))
    for n, edges in cases:
        want = _tarjan_scc(n, edges)
        src = np.array([a for a, _ in edges], dtype=np.int64)
        dst = np.array([b for _, b in edges], dtype=np.int64)
        ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
        stats: dict = {}
        out = scc_mod.strongly_connected_components(ds, stats=stats)
        got = dict(zip(out["vid"].to_pylist(), out["scc"].to_pylist()))
        assert got == want
        assert stats["sweeps"] >= 0


def test_scc_giant_cycle_and_determinism():
    """One V-cycle is a single SCC labeled by its min vid; repeated
    runs produce identical tables (deterministic reducers)."""
    from igpm_pem_ray.graph import scc as scc_mod

    n = 50
    src = np.arange(n, dtype=np.int64) + 100
    dst = np.roll(src, -1)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    a = scc_mod.strongly_connected_components(ds)
    b = scc_mod.strongly_connected_components(ds)
    assert a.equals(b)
    assert set(a["scc"].to_pylist()) == {100}


def test_scc_shuffle_parity_vs_dense():
    """Dataset-resident SCC == dense SCC on a seeded random digraph
    (both = Tarjan via test_scc_vs_tarjan_oracle)."""
    from igpm_pem_ray.graph import scc as scc_mod

    rng = np.random.RandomState(11)
    e = {(int(a), int(b)) for a, b in rng.randint(0, 40, size=(160, 2)) if a != b}
    t = pa.table({"src": np.array([a for a, _ in sorted(e)], np.int64),
                  "dst": np.array([b for _, b in sorted(e)], np.int64)})
    dense = scc_mod.strongly_connected_components(rd.from_arrow(t))
    want = dict(zip(dense["vid"].to_pylist(), dense["scc"].to_pylist()))
    stats: dict = {}
    sh = scc_mod.strongly_connected_components_shuffle(
        rd.from_arrow(t), stats=stats).to_pandas()
    got = dict(zip(sh["vid"].tolist(), sh["scc"].tolist()))
    assert got == want
    assert stats["strategy"] == "shuffle"


def test_distance_stats_vs_bfs_oracle():
    """Bit-parallel multi-source BFS (hist + harmonic) vs a per-source
    frontier BFS oracle; chunked run must equal the one-chunk run."""
    import collections

    from igpm_pem_ray.graph import distance as dist_mod

    rng = np.random.RandomState(7)
    V, E, MAXD = 250, 700, 5
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    adj = collections.defaultdict(list)
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].append(d)
        adj[d].append(s)
    present = sorted(adj)
    inv = [0] + [int(np.floor(1e6 / d + 0.5)) for d in range(1, MAXD + 1)]
    hist_oracle = np.zeros(MAXD + 1, np.int64)
    harm_oracle = {v: 0 for v in present}
    for s0 in present:
        dist = {s0: 0}
        dq = collections.deque([s0])
        while dq:
            u = dq.popleft()
            if dist[u] >= MAXD:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        for v, dd in dist.items():
            if dd > 0:
                hist_oracle[dd] += 1
                harm_oracle[v] += inv[dd]

    hist, harm, ecc, nreach, sumd = dist_mod.distance_stats(ds, max_depth=MAXD)
    assert (hist == hist_oracle).all()
    # eccentricity oracle from the same BFS runs (receiver view ==
    # source view: the graph is undirected)
    ecc_oracle = {v: 0 for v in present}
    for s0 in present:
        dist = {s0: 0}
        dq = collections.deque([s0])
        while dq:
            u = dq.popleft()
            if dist[u] >= MAXD:
                continue
            for w2 in adj[u]:
                if w2 not in dist:
                    dist[w2] = dist[u] + 1
                    dq.append(w2)
        ecc_oracle[s0] = max(dist.values())
    hc_v = dist_mod.eccentricity(ds, max_depth=MAXD)
    got_ecc = dict(zip(hc_v["vid"].to_numpy().tolist(),
                       hc_v["ecc"].to_numpy().tolist()))
    assert got_ecc == ecc_oracle
    hc = dist_mod.harmonic_centrality(ds, max_depth=MAXD)
    got = dict(zip(hc["vid"].to_numpy().tolist(),
                   hc["harmonic_e6"].to_numpy().tolist()))
    assert got == harm_oracle
    # chunking is an implementation detail: W=1 (64-source chunks)
    # must reproduce the single-chunk sweep bit for bit
    hist1, harm1, ecc1, nr1, sd1 = dist_mod.distance_stats(
        ds, max_depth=MAXD, chunk_words=1)
    assert (hist1 == hist).all() and (harm1 == harm).all()
    assert (ecc1 == ecc).all()
    assert (nr1 == nreach).all() and (sd1 == sumd).all()


def test_hyperball_error_band_and_effective_diameter():
    """HyperBall N(d) within the m=64-register error band of the
    exact neighborhood function; effective diameter agrees with the
    exact strategy on a well-separated input."""
    from igpm_pem_ray.graph import distance as dist_mod

    rng = np.random.RandomState(13)
    V, E, MAXD = 400, 1100, 6
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    keep = src != dst
    ds = rd.from_arrow(pa.table({"src": src[keep], "dst": dst[keep]}))

    hist = dist_mod.distance_stats(ds, max_depth=MAXD)[0]
    exact_cum = np.cumsum(hist[1:])
    t = dist_mod.neighborhood_function_hll(ds, max_depth=MAXD)
    approx = t["approx_pairs"].to_numpy()
    n = min(len(approx), len(exact_cum))
    rel = np.abs(approx[:n] - exact_cum[:n]) / np.maximum(exact_cum[:n], 1)
    # m=64 registers -> ~13% standard error on each |ball(v,d)|; the
    # SUM over 400 rows concentrates, so 25% is a generous band
    assert rel.max() < 0.25, rel

    ed_exact = dist_mod.effective_diameter(ds, strategy="exact",
                                           max_depth=MAXD)
    ed_hll = dist_mod.effective_diameter(ds, strategy="hll",
                                         max_depth=MAXD)
    assert abs(ed_exact["effective_diameter"]
               - ed_hll["effective_diameter"]) <= 1
    assert ed_exact["n_pairs_total"] == exact_cum[-1]


def test_msg_pass_2d_or_and_max():
    """The 2-D msg_pass contract the distance kernels rely on:
    bitwise-OR and elementwise max reduce along axis 0."""
    from igpm_pem_ray.graph.dense import build_dense_graph, msg_pass

    ds = rd.from_arrow(pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                                 "dst": pa.array([1, 2, 0], pa.int64())}))
    g = build_dense_graph(ds)
    vals = np.array([[1, 8], [2, 16], [4, 32]], dtype=np.uint64)
    out = msg_pass(g, vals, reduce="or", init=0)
    # dst=1 gets src 0's row, dst=2 gets src 1's, dst=0 gets src 2's
    assert out.tolist() == [[4, 32], [1, 8], [2, 16]]
    both = msg_pass(g, vals, reduce="or", init=0, directions="both")
    assert both.tolist() == [[2 | 4, 16 | 32], [1 | 4, 8 | 32],
                             [1 | 2, 8 | 16]]
    mx = msg_pass(g, vals.astype(np.int64), reduce="max", init=0,
                  directions="both")
    assert mx.tolist() == [[4, 32], [4, 32], [2, 16]]


def test_random_walks_vs_bruteforce():
    """Dataset-join walk plan vs a per-walker Python oracle (same
    affine-hash step rule); every walk must follow real edges."""
    from igpm_pem_ray.graph import walks as walks_mod

    rng = np.random.RandomState(3)
    V, E, L = 60, 150, 4
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    got = walks_mod.random_walks(ds, walk_len=L).to_pandas() \
        .sort_values(["walker", "step"]).reset_index(drop=True)

    adj: dict = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    rows = []
    for w in sorted(adj):
        v = w
        rows.append((w, 0, v))
        for k in range(1, L + 1):
            nb = sorted(adj[v])
            v = nb[(w * 1_000_003 + k * 7_919) % len(nb)]
            rows.append((w, k, v))
    import pandas as pd

    exp = pd.DataFrame(rows, columns=["walker", "step", "vid"])
    pd.testing.assert_frame_equal(
        got[["walker", "step", "vid"]].astype("int64"),
        exp.astype("int64"))


def test_betweenness_vs_brandes_oracle():
    """Multi-source vectorized Brandes (2-D msg_pass forward/backward)
    vs a pure-Python Brandes oracle; chunking must not change the
    result; sampled variant extrapolates on the same scale."""
    import collections

    from igpm_pem_ray.graph import betweenness as bc_mod

    rng = np.random.RandomState(11)
    V, E = 120, 300
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    adj = collections.defaultdict(set)
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].add(d)
        adj[d].add(s)
    verts = sorted(adj)
    bc = {v: 0.0 for v in verts}
    for s0 in verts:
        order = []
        preds = {v: [] for v in verts}
        sigma = {v: 0.0 for v in verts}
        sigma[s0] = 1.0
        dist = {v: -1 for v in verts}
        dist[s0] = 0
        q = collections.deque([s0])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in verts}
        while order:
            w = order.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s0:
                bc[w] += delta[w]
    oracle = {v: bc[v] / 2.0 for v in verts}

    t = bc_mod.betweenness(ds, chunk_size=37)
    got = dict(zip(t["vid"].to_numpy().tolist(),
                   (t["betweenness_e6"].to_numpy() / 1e6).tolist()))
    assert max(abs(got[v] - oracle[v]) for v in verts) < 2e-5

    t1 = bc_mod.betweenness(ds, chunk_size=1000)
    assert t1["betweenness_e6"].to_numpy().tolist() \
        == t["betweenness_e6"].to_numpy().tolist()

    ts = bc_mod.betweenness(ds, sample_every=4)
    gs = ts["betweenness_e6"].to_numpy() / 1e6
    ex = np.array([oracle[v] for v in sorted(verts)])
    assert np.corrcoef(gs, ex)[0, 1] > 0.85


def test_mis_independence_and_maximality():
    """Run-to-convergence Luby MIS: every vertex decided, the MIS is
    independent (no edge inside) and maximal (every excluded vertex
    has a MIS neighbor); fixed-round prefix matches the converged
    run's early decisions."""
    from igpm_pem_ray.graph import mis as mis_mod

    rng = np.random.RandomState(29)
    V, E = 200, 600
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # include self-loops: the kernel must drop them (a self-looped
    # vertex would otherwise see its own priority and loop forever)
    src = np.r_[src, 5, 17]
    dst = np.r_[dst, 5, 17]
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    stats: dict = {}
    t = mis_mod.maximal_independent_set(ds, stats=stats)
    state = dict(zip(t["vid"].to_numpy().tolist(),
                     t["state"].to_numpy().tolist()))
    assert all(s in (1, 2) for s in state.values())  # converged
    in_mis = {v for v, s in state.items() if s == 1}
    adj: dict = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj.setdefault(s, set())
        adj.setdefault(d, set())
        if s != d:  # independence is a simple-graph notion
            adj[s].add(d)
            adj[d].add(s)
    for u in in_mis:
        assert not (adj[u] & in_mis), "MIS not independent"
    for v, s in state.items():
        if s == 2:
            assert adj[v] & in_mis, "excluded vertex with no MIS neighbor"
    assert stats["rounds"] >= 1 and stats["mis_size"] == len(in_mis)

    # decisions made in the first 2 rounds are final: the truncated
    # run must agree wherever it has decided
    t2 = mis_mod.maximal_independent_set(ds, max_rounds=2)
    st2 = dict(zip(t2["vid"].to_numpy().tolist(),
                   t2["state"].to_numpy().tolist()))
    for v, s in st2.items():
        if s != 0:
            assert state[v] == s


def test_topological_layers_and_cycle_detection():
    from igpm_pem_ray.graph import dag as dag_mod

    # diamond + tail: 0->1, 0->2, 1->3, 2->3, 3->4
    ds = rd.from_arrow(pa.table({
        "src": pa.array([0, 0, 1, 2, 3], pa.int64()),
        "dst": pa.array([1, 2, 3, 3, 4], pa.int64())}))
    stats: dict = {}
    t = dag_mod.topological_layers(ds, stats=stats)
    got = dict(zip(t["vid"].to_pylist(), t["layer"].to_pylist()))
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}
    assert stats["depth"] == 3

    cyc = rd.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64())}))
    with pytest.raises(ValueError, match="cycle"):
        dag_mod.topological_layers(cyc)


def test_ktruss_membership_parity():
    """Dataset-resident fixed-k membership == truss_numbers filtered
    at k, for every k the graph exhibits (plus one past the max and
    the trivial k=2), including the emptied-out schema edge case."""
    from igpm_pem_ray.graph.ktruss import ktruss_membership, truss_numbers

    rng = np.random.RandomState(5)
    src = rng.randint(0, 120, 900).astype(np.int64)
    dst = rng.randint(0, 120, 900).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    tn = truss_numbers(ds).to_pandas()
    ks = sorted(tn["truss"].unique().tolist())
    for k in [2] + ks + [ks[-1] + 1]:
        st: dict = {}
        mem = ktruss_membership(ds, k, stats=st)
        assert mem.schema().names == ["src", "dst"]  # schema survives empty
        exp = tn[tn["truss"] >= k][["src", "dst"]] \
            .sort_values(["src", "dst"]).reset_index(drop=True)
        assert st["survivors"] == len(exp)
        if len(exp):
            # (to_pandas on an EMPTY Dataset drops columns — Ray quirk)
            got = mem.to_pandas().sort_values(["src", "dst"]) \
                .reset_index(drop=True)
            assert got.equals(exp), f"k={k} mismatch"
        else:
            assert mem.count() == 0

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    assert ktruss_membership(empty, 3).count() == 0


def test_truss_numbers_vs_bruteforce_peel():
    """Vectorized wedge-expansion truss decomposition vs a set-based
    per-level peeling oracle."""
    import collections

    from igpm_pem_ray.graph.ktruss import truss_numbers

    rng = np.random.RandomState(21)
    V, E = 60, 240
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    t = truss_numbers(ds)
    got = {(s, d): k for s, d, k in zip(t["src"].to_pylist(),
                                        t["dst"].to_pylist(),
                                        t["truss"].to_pylist())}

    edges = {tuple(sorted((int(s), int(d))))
             for s, d in zip(src, dst) if s != d}

    def support(es):
        adj = collections.defaultdict(set)
        for u, v in es:
            adj[u].add(v)
            adj[v].add(u)
        return {e: len(adj[e[0]] & adj[e[1]]) for e in es}

    oracle = {e: 2 for e in edges}
    cur = set(edges)
    k = 3
    while cur:
        while True:
            sup = support(cur)
            drop = {e for e in cur if sup[e] < k - 2}
            if not drop:
                break
            cur -= drop
        if cur:
            for e in cur:
                oracle[e] = k
            k += 1
    assert got == oracle

    # empty + triangle-free inputs
    tri_free = rd.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 3], pa.int64())}))
    tf = truss_numbers(tri_free)
    assert set(tf["truss"].to_pylist()) == {2}


def test_bowtie_vs_bruteforce():
    """Bow-tie classes vs a transitive-closure oracle on a random
    digraph; IN/OUT disjoint outside the core by construction."""
    from igpm_pem_ray.graph import bowtie as bt_mod

    rng = np.random.RandomState(41)
    V, E = 80, 160
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    stats: dict = {}
    t = bt_mod.bowtie(ds, stats=stats)
    got = dict(zip(t["vid"].to_pylist(), t["cls"].to_pylist()))

    verts = sorted(set(src.tolist()) | set(dst.tolist()))
    adj = {v: set() for v in verts}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].add(d)

    def reach_from(v):
        seen = {v}
        stack = [v]
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        return seen

    fwd = {v: reach_from(v) for v in verts}
    sccs = {}
    for v in verts:
        sccs[v] = min(u for u in fwd[v] if v in fwd[u])
    groups: dict = {}
    for v, l in sccs.items():
        groups.setdefault(l, set()).add(v)
    core_label = sorted(groups, key=lambda l: (-len(groups[l]), l))[0]
    core = groups[core_label]
    exp = {}
    for v in verts:
        if v in core:
            exp[v] = 0
        elif fwd[v] & core:
            exp[v] = 1
        elif any(v in fwd[c] for c in core):
            exp[v] = 2
        else:
            exp[v] = 3
    assert got == exp
    assert stats["n_core"] == len(core)
    assert stats["n_core"] + stats["n_in"] + stats["n_out"] \
        + stats["n_other"] == len(verts)


def test_new_kernels_empty_and_singleton():
    """Degenerate inputs: empty edge table and a single edge must not
    crash any of the round-3 kernels and must return coherent shapes."""
    from igpm_pem_ray.graph import betweenness as bc_mod
    from igpm_pem_ray.graph import dag as dag_mod
    from igpm_pem_ray.graph import distance as dist_mod
    from igpm_pem_ray.graph import mis as mis_mod
    from igpm_pem_ray.graph.ktruss import truss_numbers
    from igpm_pem_ray.graph.walks import random_walks

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    one = rd.from_arrow(pa.table({"src": pa.array([7], pa.int64()),
                                  "dst": pa.array([9], pa.int64())}))

    hist, harm, ecc, nreach, sumd = dist_mod.distance_stats(
        empty, max_depth=3)
    assert hist.sum() == 0 and len(harm) == 0

    hist1, harm1, ecc1, nr1, sd1 = dist_mod.distance_stats(
        one, max_depth=3)
    assert hist1[1] == 2 and hist1[2:].sum() == 0
    assert list(ecc1) == [1, 1] and list(nr1) == [1, 1]

    t = bc_mod.betweenness(empty)
    assert t.num_rows == 0
    t1 = bc_mod.betweenness(one)
    assert t1["betweenness_e6"].to_numpy().tolist() == [0, 0]

    m = mis_mod.maximal_independent_set(one)
    assert sorted(m["state"].to_pylist()) == [1, 2]

    d = dag_mod.topological_layers(one)
    assert dict(zip(d["vid"].to_pylist(),
                    d["layer"].to_pylist())) == {7: 0, 9: 1}

    k = truss_numbers(one)
    assert k["truss"].to_pylist() == [2]
    assert truss_numbers(empty).num_rows == 0

    w = random_walks(one, walk_len=2).to_pandas()
    # 2 walkers x 3 steps; both vertices have exactly one neighbor
    assert len(w) == 6
    assert set(w["vid"]) == {7, 9}

    nf = dist_mod.neighborhood_function_hll(empty, max_depth=3)
    assert nf.num_rows == 0


def test_onion_layers_vs_python_peel():
    """The onion layer (global peel-wave number) riding along with
    core_numbers matches an independent set-based peel."""
    from igpm_pem_ray.graph import kcore as kcore_mod

    rng = np.random.RandomState(33)
    V, E = 80, 220
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    t = kcore_mod.core_numbers(ds).to_pandas()
    got = {int(r.vid): (int(r.core), int(r.layer))
           for r in t.itertuples()}

    adj: dict = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    for v in set(src.tolist()) | set(dst.tolist()):
        adj.setdefault(v, set())
    alive = set(adj)
    deg = {v: len(adj[v]) for v in adj}
    exp = {}
    layer_no = 0
    k = 0
    while alive:
        wave = {v for v in alive if deg[v] <= k}
        if not wave:
            k += 1
            continue
        layer_no += 1
        for v in wave:
            exp[v] = (k, layer_no)
        alive -= wave
        for v in wave:
            for u in adj[v]:
                if u in alive:
                    deg[u] -= 1
    assert got == exp


def test_harmonic_hll_shuffle_vs_register_oracle():
    """Dataset-resident HyperBall harmonic centrality reproduces a
    numpy replay of the same register rounds BIT-EXACTLY (same hash,
    same max-merge, same per-row float ops), and lands within the HLL
    error band of the exact sweep on aggregate."""
    from igpm_pem_ray.graph.distance import (_hll_row_estimates,
                                             _init_registers,
                                             harmonic_centrality)
    from igpm_pem_ray.graph.shuffle_kernels import harmonic_hll_shuffle

    rng = np.random.RandomState(9)
    src = rng.randint(0, 200, 800).astype(np.int64)
    dst = rng.randint(0, 200, 800).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    st: dict = {}
    got = harmonic_hll_shuffle(edges, max_depth=32, stats=st) \
        .to_pandas().sort_values("vid").reset_index(drop=True)

    vids = np.unique(np.concatenate([src, dst]))
    V = len(vids)
    a = np.searchsorted(vids, src)
    b = np.searchsorted(vids, dst)
    regs = _init_registers(vids, 64)
    est = _hll_row_estimates(regs)
    harm = np.zeros(V)
    for d in range(1, 33):
        new = regs.copy()
        np.maximum.at(new, b, regs[a])
        np.maximum.at(new, a, regs[b])
        e2 = _hll_row_estimates(new)
        harm += np.maximum(e2 - est, 0.0) / d
        est = e2
        if np.array_equal(new, regs):
            break
        regs = new
    exp = np.floor(harm * 1e6 + 0.5).astype(np.int64)
    idx = np.searchsorted(vids, got["vid"].to_numpy())
    assert np.array_equal(got["harmonic_e6"].to_numpy(), exp[idx])

    exact = harmonic_centrality(edges, max_depth=32).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    mean_hll = got["harmonic_e6"].mean()
    mean_exact = exact["harmonic_e6"].mean()
    assert abs(mean_hll - mean_exact) / mean_exact < 0.25  # HLL band


def test_hyperball_shuffle_strategy_does_not_leak():
    """Derived datasets share the root's DataContext by reference, so
    the per-round HASH_SHUFFLE flips inside the HyperBall kernels land
    on the caller's edge dataset — the kernels must restore the prior
    strategy on exit (regression: a leaked HASH_SHUFFLE changes how
    every later shuffle on that dataset executes)."""
    from igpm_pem_ray.graph.shuffle_kernels import (harmonic_hll_shuffle,
                                                    hyperball_shuffle)

    edges = rd.from_arrow(pa.table(
        {"src": np.array([0, 1, 2, 3], np.int64),
         "dst": np.array([1, 2, 3, 0], np.int64)}))
    before = edges.context.shuffle_strategy
    hyperball_shuffle(edges, max_depth=8)
    assert edges.context.shuffle_strategy == before
    harmonic_hll_shuffle(edges, max_depth=8).materialize()
    assert edges.context.shuffle_strategy == before


# ---------- Dataset-resident exact multi-source BFS (msbfs_shuffle) ----------

def _msbfs_fixture(v=130, e=420, seed=3):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, v, e).astype(np.int64)
    dst = rng.integers(0, v, e).astype(np.int64)
    keep = src != dst
    return rd.from_arrow(pa.table({"src": src[keep], "dst": dst[keep]}))


def test_msbfs_shuffle_parity_vs_dense():
    """The Dataset-resident sweep is integer-exact equal to the dense
    bit-parallel sweep on every sufficient statistic (hist, harmonic,
    ecc, n_reached/sum_d).  chunk_words=1 forces multiple hash chunks
    (dense chunks are contiguous vid ranges, shuffle chunks are hash
    classes — parity across them proves chunk-partition independence)."""
    from igpm_pem_ray.graph import distance as dist_mod

    edges = _msbfs_fixture()
    md = 6
    for fn, kw in [(dist_mod.distance_histogram, {}),
                   (dist_mod.harmonic_centrality, {}),
                   (dist_mod.eccentricity, {}),
                   (dist_mod.closeness_stats, {})]:
        dense = fn(edges, max_depth=md, **kw)
        if "vid" in dense.column_names:
            dense = dense.sort_by("vid")
        shuf = fn(edges, max_depth=md, chunk_words=1,
                  strategy="shuffle", **kw)
        assert dense.equals(shuf), fn.__name__


def test_msbfs_shuffle_sources_subset():
    """Explicit ``sources=`` sweeps only those sources: every
    accumulator matches a per-source numpy BFS oracle."""
    import ray

    from igpm_pem_ray.graph.shuffle_kernels import msbfs_shuffle

    edges = _msbfs_fixture(v=60, e=150, seed=9)
    tbl = pa.concat_tables([ray.get(r) for r in edges.to_arrow_refs()])
    src = tbl["src"].to_numpy()
    dst = tbl["dst"].to_numpy()
    vids = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        adj[idx[a]].add(idx[b])
        adj[idx[b]].add(idx[a])

    sources = vids[::3]
    md = 5
    hist = np.zeros(md + 1, dtype=np.int64)
    harm = np.zeros(n, dtype=np.int64)
    ecc = np.zeros(n, dtype=np.int64)
    nreach = np.zeros(n, dtype=np.int64)
    sumd = np.zeros(n, dtype=np.int64)
    for s0 in sources:
        dist = {idx[s0]: 0}
        frontier = [idx[s0]]
        for d in range(1, md + 1):
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
            if not frontier:
                break
        for w, d in dist.items():
            if d == 0:
                continue
            hist[d] += 1
            harm[w] += int(np.floor(1e6 / d + 0.5))
            ecc[w] = max(ecc[w], d)
            nreach[w] += 1
            sumd[w] += d

    h_tbl, acc = msbfs_shuffle(edges, max_depth=md, chunk_words=1,
                               sources=sources)
    assert h_tbl["n_pairs"].to_pylist() == hist[1:].tolist()
    got = acc.sort("vid").to_pandas()
    assert got["vid"].to_numpy().tolist() == vids.tolist()
    assert got["harmonic"].to_numpy().tolist() == harm.tolist()
    assert got["ecc"].to_numpy().tolist() == ecc.tolist()
    assert got["nreach"].to_numpy().tolist() == nreach.tolist()
    assert got["sumd"].to_numpy().tolist() == sumd.tolist()


def test_msbfs_shuffle_strategy_does_not_leak():
    """Same contract as the HyperBall kernels: the per-round
    HASH_SHUFFLE flips must not leak onto the caller dataset."""
    from igpm_pem_ray.graph.shuffle_kernels import msbfs_shuffle

    edges = _msbfs_fixture(v=40, e=90, seed=1)
    before = edges.context.shuffle_strategy
    msbfs_shuffle(edges, max_depth=4)
    assert edges.context.shuffle_strategy == before


# ---------- Dataset-resident Brandes betweenness (betweenness_shuffle) ------

def test_betweenness_shuffle_parity_vs_dense():
    """Integer fixed-point dependency (BC_Q floor-division convention)
    vs the dense kernel's float64 sums: identical e6 output on graphs
    whose sigma/delta magnitudes keep the float path exact (diff <= 1
    e6-unit tolerance covers the documented 1/BC_Q quantization)."""
    from igpm_pem_ray.graph.betweenness import betweenness
    from igpm_pem_ray.graph.shuffle_kernels import betweenness_shuffle

    edges = _msbfs_fixture(v=90, e=260, seed=21)
    for kw in ({}, {"max_depth": 2}):
        dense = betweenness(edges, **kw).to_pandas() \
            .sort_values("vid").reset_index(drop=True)
        shuf = betweenness_shuffle(edges, chunk_span=40, **kw) \
            .sort("vid").to_pandas().reset_index(drop=True)
        assert dense["vid"].tolist() == shuf["vid"].tolist()
        diff = np.abs(dense["betweenness_e6"].to_numpy()
                      - shuf["betweenness_e6"].to_numpy())
        assert diff.max() <= 1, kw


def test_betweenness_shuffle_sampled_sources():
    """Explicit sources + V/|S| Brandes-Pich extrapolation matches the
    dense kernel given the same source set."""
    from igpm_pem_ray.graph.betweenness import betweenness
    from igpm_pem_ray.graph.shuffle_kernels import betweenness_shuffle

    edges = _msbfs_fixture(v=70, e=180, seed=4)
    import ray
    tbl = pa.concat_tables([ray.get(r) for r in edges.to_arrow_refs()])
    vids = np.unique(np.concatenate([tbl["src"].to_numpy(),
                                     tbl["dst"].to_numpy()]))
    srcs = vids[::4]
    dense = betweenness(edges, sources=srcs).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    shuf = betweenness_shuffle(edges, sources=srcs, chunk_span=8) \
        .sort("vid").to_pandas().reset_index(drop=True)
    diff = np.abs(dense["betweenness_e6"].to_numpy()
                  - shuf["betweenness_e6"].to_numpy())
    assert diff.max() <= 1


def test_betweenness_shuffle_strategy_does_not_leak():
    from igpm_pem_ray.graph.shuffle_kernels import betweenness_shuffle

    edges = _msbfs_fixture(v=30, e=60, seed=2)
    before = edges.context.shuffle_strategy
    betweenness_shuffle(edges, max_depth=3).materialize()
    assert edges.context.shuffle_strategy == before


def test_sssp_vs_oracle_and_shuffle_parity():
    """sssp == pure-Python bounded-hop Bellman-Ford on the undirected
    weighted view (w = 1 + (u+v) % WEIGHT_MOD); sssp_shuffle returns
    bit-identical distances; hop cap honored; unknown source raises."""
    from igpm_pem_ray.graph import sssp as sssp_mod
    from igpm_pem_ray.graph.shuffle_kernels import sssp_shuffle

    rng = np.random.RandomState(71)
    src = rng.randint(0, 90, size=260).astype(np.int64)
    dst = rng.randint(0, 90, size=260).astype(np.int64)
    src = np.concatenate([src, [300]])   # far component
    dst = np.concatenate([dst, [301]])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    M = sssp_mod.WEIGHT_MOD
    INF = float("inf")
    verts = sorted(set(src.tolist()) | set(dst.tolist()))
    source = verts[0]

    def oracle(n_hops):
        d = {v: INF for v in verts}
        d[source] = 0
        und = set()
        for a, b in zip(src.tolist(), dst.tolist()):
            und.add((a, b))
            und.add((b, a))
        for _ in range(n_hops):
            nd = dict(d)
            for a, b in und:
                w = 1 + (a + b) % M
                if d[a] + w < nd[b]:
                    nd[b] = d[a] + w
            d = nd
        return {v: int(x) for v, x in d.items() if x < INF}

    for k in (1, 3, 8):
        want = oracle(k)
        got = sssp_mod.sssp(ds, n_iters=k)
        gmap = dict(zip(got["vid"].to_pylist(), got["dist"].to_pylist()))
        assert gmap == want, f"dense sssp diverges at n_iters={k}"

    want = oracle(8)
    sh = sssp_shuffle(ds, n_iters=8).to_pandas()
    smap = dict(zip(sh["vid"].astype(int), sh["dist"].astype(int)))
    assert smap == want
    assert 300 not in smap and 301 not in smap

    with pytest.raises(ValueError):
        sssp_mod.sssp(ds, source=9999)


def test_msf_matches_kruskal_oracle():
    """msf == independent pure-Python Kruskal under the shared strict
    edge key (w(u,v), u, v) — the key has no ties, so the forest is
    unique and comparable edge for edge; spans every component; total
    weight minimal; multigraph/self-loop input collapsed."""
    from igpm_pem_ray.graph import msf as msf_mod
    from igpm_pem_ray.graph.sssp import WEIGHT_MOD

    rng = np.random.RandomState(83)
    src = rng.randint(0, 80, size=300).astype(np.int64)
    dst = rng.randint(0, 80, size=300).astype(np.int64)
    # dupes + reversed dupes + self loops + far component
    src = np.concatenate([src, src[:20], dst[:10], [500, 7], [600]])
    dst = np.concatenate([dst, dst[:20], src[:10], [500, 7], [601]])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    und = sorted({(min(a, b), max(a, b))
                  for a, b in zip(src.tolist(), dst.tolist()) if a != b})

    def kruskal():
        keyed = sorted((1 + (a + b) % WEIGHT_MOD, a, b) for a, b in und)
        parent: dict[int, int] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        out = []
        for w, a, b in keyed:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
                out.append((w, a, b))
        return out

    want = kruskal()
    stats = {}
    got = msf_mod.msf(ds, stats=stats)
    gl = list(zip(got["w"].to_pylist(), got["src"].to_pylist(),
                  got["dst"].to_pylist()))
    assert gl == sorted(want)
    verts = {x for a, b in und for x in (a, b)}
    n_comp = stats["n_components"]
    assert len(gl) == len(verts) - n_comp          # spanning forest
    assert stats["total_weight"] == sum(w for w, _, _ in want)
    assert stats["rounds"] >= 1


def test_msf_empty_and_single_edge():
    from igpm_pem_ray.graph import msf as msf_mod

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    assert msf_mod.msf(empty).num_rows == 0

    one = rd.from_arrow(pa.table({"src": pa.array([5], pa.int64()),
                                  "dst": pa.array([2], pa.int64())}))
    t = msf_mod.msf(one)
    assert t["src"].to_pylist() == [2] and t["dst"].to_pylist() == [5]


def test_msf_shuffle_parity_and_resume(tmp_path):
    """msf_shuffle == dense msf edge for edge (the strict key makes
    the forest unique), and a run resumed from a round-1 forest
    checkpoint completes to the identical forest."""
    from igpm_pem_ray.graph import msf as msf_mod
    from igpm_pem_ray.graph.shuffle_kernels import msf_shuffle

    rng = np.random.RandomState(91)
    src = rng.randint(0, 60, size=200).astype(np.int64)
    dst = rng.randint(0, 60, size=200).astype(np.int64)
    src = np.concatenate([src, [400]])
    dst = np.concatenate([dst, [401]])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    want = msf_mod.msf(ds)
    wset = set(zip(want["src"].to_pylist(), want["dst"].to_pylist(),
                   want["w"].to_pylist()))

    stats = {}
    got = msf_shuffle(ds, stats=stats).to_pandas()
    gset = set(zip(got["src"].astype(int), got["dst"].astype(int),
                   got["w"].astype(int)))
    assert gset == wset
    assert stats["rounds"] >= 1
    # live frontier shrinks monotonically
    lp = stats["live_per_round"]
    assert all(a >= b for a, b in zip(lp, lp[1:]))

    ck = str(tmp_path / "msf_ck")
    partial = msf_shuffle(ds, max_rounds=1, checkpoint_dir=ck).to_pandas()
    assert 0 < len(partial) <= len(wset)
    resumed = msf_shuffle(ds, checkpoint_dir=ck, resume=True).to_pandas()
    rset = set(zip(resumed["src"].astype(int), resumed["dst"].astype(int),
                   resumed["w"].astype(int)))
    assert rset == wset


def test_greedy_coloring_vs_reference_rule():
    """greedy_coloring == an independent pure-Python Jones-Plassmann
    with the same published priority rule; proper; bounded by
    maxdeg+1; deterministic across runs."""
    from igpm_pem_ray.graph.coloring import greedy_coloring

    rng = np.random.RandomState(97)
    src = rng.randint(0, 70, size=240).astype(np.int64)
    dst = rng.randint(0, 70, size=240).astype(np.int64)
    src = np.concatenate([src, [900], dst[:15]])   # dupes + far edge
    dst = np.concatenate([dst, [901], src[:15]])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    und = sorted({(min(a, b), max(a, b))
                  for a, b in zip(src.tolist(), dst.tolist()) if a != b})
    verts = sorted({x for e in und for x in e})
    nbrs = {x: set() for x in verts}
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)

    M = (1 << 31) - 1
    rank = {x: i for i, x in enumerate(verts)}
    prio = {x: (((x % M) * 1_103_515_245) % M << 31) | rank[x]
            for x in verts}

    def reference():
        color = {}
        while len(color) < len(verts):
            winners = [x for x in verts if x not in color
                       and all(prio[x] > prio[y] for y in nbrs[x]
                               if y not in color)]
            assert winners
            for x in winners:
                used = {color[y] for y in nbrs[x] if y in color}
                c = 0
                while c in used:
                    c += 1
                color[x] = c
        return color

    want = reference()
    stats = {}
    got = greedy_coloring(ds, stats=stats)
    gmap = dict(zip(got["vid"].to_pylist(), got["color"].to_pylist()))
    assert gmap == want
    for a, b in und:                       # proper
        assert gmap[a] != gmap[b]
    maxdeg = max(len(s) for s in nbrs.values())
    assert stats["n_colors"] <= maxdeg + 1
    again = greedy_coloring(ds)
    assert dict(zip(again["vid"].to_pylist(),
                    again["color"].to_pylist())) == gmap


def test_salsa_vs_exact_integer_oracle():
    """salsa() == an explicit per-edge integer replay of the pinned
    fixed-point recurrence (floor-divide BEFORE the sum), and the
    rankings track float textbook SALSA: top-5 authority sets agree
    on a random multigraph.  Pure hubs get auth 0, pure sinks hub 0."""
    from igpm_pem_ray.graph import salsa as salsa_mod

    rng = np.random.RandomState(73)
    src = rng.randint(0, 50, size=300).astype(np.int64)
    dst = rng.randint(0, 50, size=300).astype(np.int64)
    src = np.concatenate([src, [100, 100]])
    dst = np.concatenate([dst, [0, 1]])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    n_iters, scale = 3, salsa_mod.SALSA_SCALE
    t = salsa_mod.salsa(ds, n_iters=n_iters)
    vids = np.array(t["vid"].to_pylist())
    pos = {v: i for i, v in enumerate(vids)}
    V = len(vids)

    outdeg = np.zeros(V, dtype=np.int64)
    indeg = np.zeros(V, dtype=np.int64)
    for a, b in zip(src, dst):
        outdeg[pos[a]] += 1
        indeg[pos[b]] += 1
    hub = np.full(V, scale, dtype=np.int64)
    fh = np.full(V, 1.0, dtype=np.float64)
    for _ in range(n_iters):
        auth = np.zeros(V, dtype=np.int64)
        fa = np.zeros(V)
        for a, b in zip(src, dst):
            auth[pos[b]] += hub[pos[a]] // outdeg[pos[a]]
            fa[pos[b]] += fh[pos[a]] / outdeg[pos[a]]
        hub = np.zeros(V, dtype=np.int64)
        fh = np.zeros(V)
        for a, b in zip(src, dst):
            hub[pos[a]] += auth[pos[b]] // indeg[pos[b]]
            fh[pos[a]] += fa[pos[b]] / indeg[pos[b]]
    got_h = np.array(t["hub_q"].to_pylist())
    got_a = np.array(t["auth_q"].to_pylist())
    assert (got_h == hub).all()
    assert (got_a == auth).all()
    # fixed-point vs float: same top-5 authorities (loses < 1 unit of
    # SCALE per division, negligible at 1e9)
    ftop = set(np.argsort(-fa)[:5])
    qtop = set(np.argsort(-got_a)[:5])
    assert ftop == qtop
    assert got_a[pos[100]] == 0  # pure hub: no in-edges


def test_doulion_sample_is_exact_subgraph_count():
    """The DOULION query's sampled count equals a brute-force triangle
    count of the hash-sampled edge set (the sampling is the only
    approximation), and the estimate is count * Q^3."""
    from itertools import combinations

    from igpm_pem_ray.graph import triangles as tri_mod
    from igpm_pem_ray.pipelines.graph_queries import (
        DOULION_A, DOULION_B, DOULION_M, DOULION_Q)

    rng = np.random.RandomState(79)
    e = sorted({(int(a), int(b)) for a, b in
                zip(rng.randint(0, 40, 500), rng.randint(0, 40, 500))
                if a < b})
    src = np.array([a for a, _ in e], dtype=np.int64)
    dst = np.array([b for _, b in e], dtype=np.int64)
    h = ((src % DOULION_M) * DOULION_A + (dst % DOULION_M) * 131
         + DOULION_B) % DOULION_M
    keep = (h % DOULION_Q) == 0
    kept = set(zip(src[keep].tolist(), dst[keep].tolist()))
    verts = sorted({v for p in kept for v in p})
    brute = sum(1 for a, b, c in combinations(verts, 3)
                if (a, b) in kept and (b, c) in kept and (a, c) in kept)

    ds = rd.from_arrow(pa.table({"src": src[keep], "dst": dst[keep]}))
    assert tri_mod.triangle_count(ds) == brute


# --------------------------- densest subgraph ---------------------------

def test_densest_subgraph_planted_clique():
    """A K10 planted among sparse noise is recovered exactly (density
    4.5 dominates); stats report the exact rational best density."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from igpm_pem_ray.graph.densest import densest_subgraph

    rng = np.random.RandomState(7)
    clique = list(range(100, 110))
    edges = [(a, b) for i, a in enumerate(clique)
             for b in clique[i + 1:]]
    for v in range(40):  # sparse noise: 2 random edges each
        for _ in range(2):
            w = int(rng.randint(0, 40))
            if w != v:
                edges.append((v, w))
    df = pd.DataFrame(edges, columns=["src", "dst"])
    stats = {}
    out = densest_subgraph(rd.from_pandas(df), stats=stats).to_pandas()
    assert out["vid"].tolist() == clique
    assert (stats["n_vertices"], stats["n_edges"]) == (10, 45)
    assert stats["density_e6"] == 4_500_000


def test_densest_subgraph_half_approx():
    """Greedy density >= 1/2 of the exact optimum (Charikar bound),
    checked against subset enumeration on small random graphs."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from igpm_pem_ray.graph.densest import densest_subgraph

    rng = np.random.RandomState(11)
    for trial in range(3):
        n = 12
        m = rng.rand(n, n) < 0.3
        edges = [(i, j) for i in range(n) for j in range(i + 1, n)
                 if m[i, j]]
        if not edges:
            continue
        eset = set(edges)
        best = 0.0
        verts = list(range(n))
        for r in range(1, n + 1):
            for sub in itertools.combinations(verts, r):
                ss = set(sub)
                e = sum(1 for a, b in eset if a in ss and b in ss)
                best = max(best, e / r)
        stats = {}
        densest_subgraph(
            rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])),
            stats=stats)
        got = stats["n_edges"] / max(stats["n_vertices"], 1)
        assert got >= best / 2 - 1e-9
        assert got <= best + 1e-9


def test_louvain_merges_planted_cliques():
    """Two 4-cliques joined by one bridge edge: after two synchronous
    greedy-modularity rounds every clique collapses to one community
    and the bridge does NOT merge them (the classic Louvain sanity
    case); labels are the smallest-vid representatives by the
    deterministic tie-break."""
    import pandas as pd
    import ray.data as rd

    from igpm_pem_ray.graph.louvain import louvain_communities

    c1 = [(a, b) for i, a in enumerate([0, 1, 2, 3])
          for b in [0, 1, 2, 3][i + 1:]]
    c2 = [(a, b) for i, a in enumerate([10, 11, 12, 13])
          for b in [10, 11, 12, 13][i + 1:]]
    edges = c1 + c2 + [(3, 10)]
    t = louvain_communities(
        rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])),
        max_rounds=4)
    comm = dict(zip(t["vid"].to_pylist(), t["community"].to_pylist()))
    assert len({comm[v] for v in [0, 1, 2, 3]}) == 1
    assert len({comm[v] for v in [10, 11, 12, 13]}) == 1
    assert comm[0] != comm[10]


def test_louvain_improves_or_matches_lp_modularity():
    """On the deterministic BA fixture the greedy-modularity partition
    must score global modularity >= the 2-round LP partition (it
    optimizes Q directly; LP only counts neighbors)."""
    import ray.data as rd

    from igpm_pem_ray.graph.louvain import louvain_communities

    edges, vids, ds = _fixture_edges_cached()
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1

    def q_of(assign: dict[int, int]) -> float:
        m = len(und)
        intra: dict[int, int] = {}
        dsum: dict[int, int] = {}
        for a, b in und:
            if assign[a] == assign[b]:
                intra[assign[a]] = intra.get(assign[a], 0) + 1
        for v, d in deg.items():
            dsum[assign[v]] = dsum.get(assign[v], 0) + d
        return sum(intra.get(c, 0) / m - (dsum[c] / (2 * m)) ** 2
                   for c in dsum)

    louv = louvain_communities(ds, max_rounds=2)
    lp = lp_mod.label_propagation(ds, max_rounds=2)
    a_l = dict(zip(louv["vid"].to_pylist(), louv["community"].to_pylist()))
    a_p = dict(zip(lp["vid"].to_pylist(), lp["label"].to_pylist()))
    assert q_of(a_l) >= q_of(a_p) - 1e-12


def _fixture_edges_cached():
    edges, vids = _fixture_graph()
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], type=pa.int64()),
        "dst": pa.array([e[1] for e in edges], type=pa.int64()),
    })).repartition(8)
    return edges, vids, ds


def test_spam_mass_trusted_seeds_score_low():
    """TrustRank semantics: the whitelisted seeds (vid%10==0) receive
    concentrated restart mass, so their spam mass is non-positive and
    strictly below the untrusted population mean."""
    from igpm_pem_ray.pipelines.graph_queries import q_spam_mass

    t = q_spam_mass("/root/testdata/sf0.001").to_pandas()
    seeds = t[t.vid % 10 == 0]
    rest = t[t.vid % 10 != 0]
    assert (seeds.sm_e6 <= 0).all()
    assert seeds.sm_e6.mean() < rest.sm_e6.mean()
    assert (seeds.is_spam == 0).all()


def test_maximal_matching_oracle_and_disjoint():
    """Dataset matching == plain-Python replay of the identical rule;
    matched edges are vertex-disjoint; more rounds only add edges."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from igpm_pem_ray.graph.matching import maximal_matching, matching_oracle

    rng = np.random.default_rng(11)
    E = sorted({(int(a), int(b))
                for a, b in rng.integers(0, 80, (220, 2)) if a < b})
    ds = rd.from_arrow(pa.table({"src": [s for s, _ in E],
                                 "dst": [d for _, d in E]}))
    got = sorted(map(tuple, maximal_matching(ds, rounds=3)
                     .to_pandas().values))
    assert got == sorted(matching_oracle(E, rounds=3))
    verts = [v for s, d, _ in got for v in (s, d)]
    assert len(verts) == len(set(verts))        # vertex-disjoint
    got2 = sorted(map(tuple, maximal_matching(ds, rounds=1)
                      .to_pandas().values))
    assert set(got2) <= set(got)                # monotone in rounds


def test_mis_shuffle_parity_vs_dense():
    """Dataset-resident Luby MIS matches graph/mis exactly — same
    packed (hash, rank) priorities, same two-wave recurrence — both
    at a bounded round count and at the fixed point."""
    from igpm_pem_ray.graph import mis as mis_mod
    from igpm_pem_ray.graph import shuffle_kernels as sk

    rng = np.random.RandomState(47)
    src = rng.randint(0, 90, size=400).astype(np.int64)
    dst = rng.randint(0, 90, size=400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    for rounds in (1, 2, None):
        want = mis_mod.maximal_independent_set(ds, max_rounds=rounds) \
            .to_pandas().sort_values("vid").reset_index(drop=True)
        stats: dict = {}
        got = sk.mis_shuffle(ds, max_rounds=rounds, stats=stats) \
            .to_pandas().sort_values("vid").reset_index(drop=True)
        assert want.equals(got), f"rounds={rounds}"
    # fixed point really is a valid MIS state: no undecided left
    assert (got["state"] > 0).all()


def test_coloring_shuffle_parity_vs_dense():
    """Dataset-resident Jones-Plassmann coloring matches the dense
    greedy_coloring exactly (same static priorities, same mex)."""
    from igpm_pem_ray.graph import coloring as col_mod
    from igpm_pem_ray.graph import shuffle_kernels as sk

    rng = np.random.RandomState(53)
    src = rng.randint(0, 80, size=350).astype(np.int64)
    dst = rng.randint(0, 80, size=350).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    want = col_mod.greedy_coloring(ds).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    stats: dict = {}
    got = sk.coloring_shuffle(ds, stats=stats).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert want.equals(got)
    assert stats["rounds"] >= 1


def test_truss_decompose_shuffle_parity():
    """Dataset-resident FULL k-truss decomposition equals the dense
    truss_numbers peel at every k (same recurrence, labels emitted at
    peel time)."""
    from igpm_pem_ray.graph import ktruss as kt

    rng = np.random.RandomState(61)
    src = rng.randint(0, 40, size=260).astype(np.int64)
    dst = rng.randint(0, 40, size=260).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    want = kt.truss_numbers(ds).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    stats: dict = {}
    got = kt.truss_decompose_shuffle(ds, stats=stats).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    assert want.equals(got)
    assert stats["k_max"] >= 3
    assert int(got["truss"].max()) == int(want["truss"].max())
