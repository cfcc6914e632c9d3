"""Pattern-matching parity against the reference's golden query cases
(/root/reference/query_test.py:10-50), asserting full vid-set equality
(stronger than the reference harness, which only compares counts).

The sample graphs are vendored under tests/data/static (verbatim
copies of /root/reference/sample/static/*.json) so the suite runs
without the reference checkout mounted."""

from __future__ import annotations

import os

import pytest

from igpm_pem_ray.match.subgraph import match_sets
from igpm_pem_ray.sources.nodelink import load_node_link_json

REF = os.path.join(os.path.dirname(__file__), "data", "static")

CASES = [
    ("test1.json",
     "--vertex a b c d e --edge x:a:b y:b:c z:c:d w:d:e "
     "--vertexlabel a:cyan b:cyan c:cyan d:cyan e:cyan",
     [[0, 1, 2, 3, 4], [0, 2, 3, 4, 5]]),
    ("test1.json",
     "--vertex a b c --edge x:a:b y:b:c z:c:a "
     "--vertexlabel a:cyan b:cyan c:cyan",
     [[0, 1, 3], [2, 4, 5]]),
    ("test1.json",
     "--vertex a b c d --edge x:a:b y:b:c z:c:d w:d:a "
     "--vertexlabel a:cyan b:cyan c:cyan d:cyan",
     [[0, 2, 3, 4]]),
    ("test2.json",
     "--vertex a b c --edge x:a:b y:b:c z:c:a "
     "--vertexlabel a:cyan b:cyan c:magenta",
     [[2, 4, 5]]),
    ("test1p.json",
     "--vertex a b c --edge x:a:b y:b:c z:c:a",
     [[0, 1, 3], [0, 3, 4], [2, 3, 4], [2, 4, 5]]),
    ("test4.json",
     "--vertex a b --edge x:a:b y:a:b --edgelabel x:yes y:no",
     [[0, 1], [2, 4]]),
    ("test1d.json",
     "--vertex a b c --edge x:a:b y:a:c z:b:c --directed "
     "--vertexlabel a:cyan b:cyan c:cyan",
     [[0, 1, 3], [2, 4, 5]]),
    ("test2d.json",
     "--vertex a b c --edge x:a:b y:a:c z:b:c --directed "
     "--vertexlabel a:cyan b:cyan c:magenta",
     [[2, 4, 5]]),
    ("test1p.json",
     "--vertex a b c --edge x:a:b y:a:c z:b:c "
     "--vertexlabel a:cyan b:cyan c:cyan --edgelabel x:yes y:yes z:yes",
     [[0, 3, 4]]),
    ("line.json",
     "--vertex a b --path x:a:b --vertexlabel a:cyan b:cyan --edgelabel x:yes",
     [[0, 1], [0, 1, 2], [0, 1, 2, 3], [1, 2], [1, 2, 3], [2, 3]]),
    ("line.json",
     "--vertex a b c --path x:a:b --edge y:b:c "
     "--vertexlabel a:cyan b:cyan c:cyan --edgelabel x:yes y:yes",
     [[0, 1, 2], [0, 1, 2, 3], [1, 2, 3]]),
    ("test0p.json",
     "--vertex a b c --edge x:a:b y:b:c --path z:a:c "
     "--vertexlabel a:cyan b:cyan c:cyan --edgelabel x:yes y:yes z:yes",
     [[0, 1, 2, 3]]),
    ("test1p.json",
     "--vertex a b c --edge x:a:b y:b:c --path z:c:a "
     "--vertexlabel a:cyan b:cyan c:cyan --edgelabel x:yes y:yes z:yes",
     [[0, 3, 4], [2, 3, 4, 5], [0, 2, 3, 4, 5]]),
]


def brute_force_oracle(v_ds, e_ds, qstr: str) -> list[tuple[int, ...]]:
    """Exact enumeration by exhaustive assignment (tiny graphs only):
    the independent ground truth for non-path queries."""
    from itertools import product

    from igpm_pem_ray.match.query import parse_query_args

    q = parse_query_args(qstr.split())
    vp = v_ds.to_pandas()
    ep = e_ds.to_pandas()
    labels = dict(zip(vp["vid"], vp["label"]))
    edges = set()
    for _, r in ep.iterrows():
        edges.add((int(r["src"]), int(r["dst"]), r["label"]))
        if not q.directed:
            edges.add((int(r["dst"]), int(r["src"]), r["label"]))

    def has_edge(u, w, lbl):
        return any(a == u and b == w and (not lbl or l == lbl)
                   for a, b, l in edges)

    cands = {s: [v for v in labels
                 if s not in q.vertex_labels or labels[v] == q.vertex_labels[s]]
             for s in q.syms}
    out = set()
    for combo in product(*(cands[s] for s in q.syms)):
        if len(set(combo)) != len(combo):
            continue
        m = dict(zip(q.syms, combo))
        if all(has_edge(m[e.a], m[e.b], e.label) for e in q.edges):
            out.add(tuple(sorted(set(combo))))
    return sorted(out)


# The reference's golden lists reflect its BEST-EFFORT matcher: for the
# 5-chain on test1.json (case0) G-Ray's seed/argmax heuristic reports 2
# of the 6 exact matches; for test4.json (case5) its harness counts a
# degree-mismatched "approximate" result ([2,4] has no 'no'-labeled
# edge).  This engine enumerates exact matches, so non-path cases are
# asserted against an independent brute-force oracle, and against the
# reference goldens wherever the goldens are themselves exact.
EXACT_DIVERGENT = {0, 5}


@pytest.mark.parametrize("gfile,qstr,expected", CASES,
                         ids=[f"case{i}" for i in range(len(CASES))])
def test_golden_match_sets(gfile, qstr, expected):
    v, e = load_node_link_json(f"{REF}/{gfile}")
    got = match_sets(v, e, qstr.split())
    idx = CASES.index((gfile, qstr, expected))
    if "--path" not in qstr:
        assert got == brute_force_oracle(v, e, qstr), "vs exact oracle"
    if idx not in EXACT_DIVERGENT:
        assert got == sorted(tuple(sorted(s)) for s in expected), "vs reference golden"


def test_match_post_ops():
    """--groupby/--orderby/--aggregate applied to match output
    (reference gray/query_call.py:381-403 + aggregator.py semantics),
    verified against a hand-computed oracle on test1p.json."""
    from igpm_pem_ray.match.query import parse_query_args
    from igpm_pem_ray.match.subgraph import SubgraphMatcher

    v, e = load_node_link_json(f"{REF}/test1p.json")
    q = parse_query_args(("--vertex a b c --edge x:a:b y:b:c z:c:a "
                          "--groupby a.label --orderby a.score "
                          "--aggregate COUNT --aggregate SUM:a.score "
                          "--aggregate AVG:a.score").split())
    m = SubgraphMatcher(v, e)
    post = m.match_post(q)
    pdf = post["matches"]
    assert len(pdf) > 0
    # oracle: recompute from the matches themselves
    scores = dict(zip(v.to_pandas()["vid"], v.to_pandas()["score"]))
    labels = dict(zip(v.to_pandas()["vid"], v.to_pandas()["label"]))
    a_scores = [float(scores[int(r)]) for r in pdf["a"]]
    assert post["aggregates"]["COUNT"] == len(pdf)
    assert post["aggregates"]["SUM:a.score"] == pytest.approx(sum(a_scores))
    assert post["aggregates"]["AVG:a.score"] == pytest.approx(sum(a_scores) / len(pdf))
    # groups: count of matches per a-label
    import collections
    want = collections.Counter(labels[int(r)] for r in pdf["a"])
    got = dict(zip(post["groups"]["a__label"], post["groups"]["n_rows"]))
    assert got == dict(want)
    # ordered: ascending by a.score
    ordered_scores = [float(s) for s in post["ordered"]["a__score"]]
    assert ordered_scores == sorted(ordered_scores)


# three structurally distinct cases (chain, triangle, labeled pair)
# keep the suite's wall time bounded; the full 13-case golden grid
# already exercises the shared exact plan
@pytest.mark.parametrize("gfile,qstr", [(g, s) for g, s, _
                                        in (CASES[1], CASES[3], CASES[5])],
                         ids=["be_tri", "be_lbl", "be_pair"])
def test_best_effort_subset_and_anytime(gfile, qstr):
    """Best-effort mode (time_limit + RWR-ranked candidate limiting,
    gray_multiple.py:142-144,436-441): results are always a subset of
    exact; with no budget pressure they equal exact."""
    from igpm_pem_ray.match.query import parse_query_args
    from igpm_pem_ray.match.subgraph import SubgraphMatcher

    v, e = load_node_link_json(f"{REF}/{gfile}")
    q = parse_query_args(qstr.split())
    m = SubgraphMatcher(v, e)
    exact = set(m.match(q)["_vidset"]) if len(m.match(q)) else set()
    # generous budget -> equals exact
    full = m.match_best_effort(q, time_limit=0.0)
    got_full = set(full["_vidset"]) if len(full) else set()
    assert got_full == exact
    # tiny budget -> subset (anytime)
    partial = m.match_best_effort(q, time_limit=1e-9, seed_chunk=2)
    got_partial = set(partial["_vidset"]) if len(partial) else set()
    assert got_partial <= exact
    # candidate limiting -> subset
    lim = m.match_best_effort(q, max_candidates=2)
    got_lim = set(lim["_vidset"]) if len(lim) else set()
    assert got_lim <= exact


def test_match_approx_near_misses():
    """Approximate matching (reference num_approx analog): triangle
    query's near-misses are exactly the open wedges — verified against
    a brute-force oracle on test1p.json."""
    from itertools import permutations

    from igpm_pem_ray.match.query import parse_query_args
    from igpm_pem_ray.match.subgraph import SubgraphMatcher

    v, e = load_node_link_json(f"{REF}/test1p.json")
    q = parse_query_args("--vertex a b c --edge x:a:b y:b:c z:c:a".split())
    m = SubgraphMatcher(v, e)
    approx = m.match_approx(q)
    exact_sets = set(m.match(q)["_vidset"])
    got = set(approx["_vidset"]) if len(approx) else set()
    # oracle: vertex triples with >= 2 of the 3 undirected edges but
    # not all 3 (set-deduped)
    ep = e.to_pandas()
    und = {(int(r.src), int(r.dst)) for r in ep.itertuples()} | \
          {(int(r.dst), int(r.src)) for r in ep.itertuples()}
    vids = sorted(v.to_pandas()["vid"])
    want = set()
    for trip in permutations(vids, 3):
        a, b, c = trip
        have = ((a, b) in und) + ((b, c) in und) + ((c, a) in und)
        if have == 2:
            want.add(tuple(sorted(trip)))
    want -= exact_sets
    assert got == want
    assert got and got.isdisjoint(exact_sets)
    assert set(approx["_missing"]) <= {"x", "y", "z"}


def test_condition_filter_on_matches():
    """Condition language applied to match results (reference
    --condition, ConditionParser semantics)."""
    v, e = load_node_link_json(f"{REF}/test1p.json")
    got = match_sets(v, e, ("--vertex a b c --edge x:a:b y:b:c z:c:a "
                            "--condition a.score+b.score+c.score>=7").split())
    # triangles with total score >= 7 only
    base = match_sets(v, e, "--vertex a b c --edge x:a:b y:b:c z:c:a".split())
    assert set(got) <= set(base) and len(got) < len(base)


def test_extract_best_paths():
    """EXTRACT best-path recurrence (K5 path-choice semantics) vs an
    independent dict-based transcription of the published algorithm
    (Tong & Faloutsos KDD'06 center-piece EXTRACT, as realized in the
    reference's computeExtractSingle)."""
    import numpy as np

    from igpm_pem_ray.match.extract import Extract

    v, e = load_node_link_json(f"{REF}/test1p.json")
    ex = Extract(e)

    def oracle_paths(i_vid):
        # straightforward set/dict version, structurally unlike the
        # numpy/heap implementation under test
        ep = e.to_pandas()
        nbrs = {}
        for s, d_ in zip(ep["src"], ep["dst"]):
            nbrs.setdefault(int(s), set()).add(int(d_))
            nbrs.setdefault(int(d_), set()).add(int(s))
        rwr_vec = ex._rwr(i_vid)
        rwr = {int(vid): rwr_vec[k] for k, vid in enumerate(ex.vids)}
        d, l, pre = {i_vid: rwr[i_vid]}, {i_vid: 1}, {i_vid: i_vid}
        V, X = {i_vid}, set()
        while V:
            u, max_d = None, 0.0
            for u_ in V:
                if d[u_] > max_d:
                    u, max_d = u_, d[u_]
            if u is None:
                break
            V.remove(u)
            X.add(u)
            if l[u] >= 3:
                continue
            for w in nbrs.get(u, ()):
                if w not in X:
                    V.add(w)
                dist = (rwr[w] + d[u] * l[u]) / (l[u] + 1)
                if w not in d or d[w] < dist:
                    d[w] = dist
                    l[w] = l[u] + 1
                    pre[w] = u
        out = {}
        for j in pre:
            if j == i_vid:
                continue
            path, x = [], j
            ok = True
            while x != i_vid:
                path.append(x)
                if x not in pre:
                    ok = False
                    break
                x = pre[x]
            if ok and path:
                out[j] = list(reversed(path))
        return out

    for src in [0, 2, 5]:
        assert ex.get_paths(src) == oracle_paths(src)
    # fan-out table agrees with the per-source API
    t = ex.best_paths([0, 2]).to_pandas()
    p0 = ex.get_paths(0)
    got0 = {int(r.dst): [int(x) for x in r.path.split(",")]
            for r in t[t["src"] == 0].itertuples()}
    assert got0 == p0


def test_fixture_matches_reference_sample():
    """The in-repo fixture (sources/fixtures.py) must stay equivalent
    to the reference's test1p sample so the self-contained queries()
    entries keep their golden parity (round-2 verdict item #1)."""
    import os

    from igpm_pem_ray.sources.fixtures import load_sample_graph

    fv, fe = load_sample_graph()
    fvp = fv.to_pandas().sort_values("vid").reset_index(drop=True)
    fep = fe.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    ref = f"{REF}/test1p.json"
    if os.path.exists(ref):
        rv, re_ = load_node_link_json(ref)
        rvp = rv.to_pandas().sort_values("vid").reset_index(drop=True)
        rep = re_.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        assert fvp[["vid", "label", "score"]].equals(rvp[["vid", "label", "score"]])
        assert fep[["src", "dst", "label"]].equals(rep[["src", "dst", "label"]])
    # self-contained golden (independent of the reference checkout)
    got = match_sets(fv, fe, "--vertex a b c --edge x:a:b y:b:c z:c:a".split())
    assert sorted(got) == [(0, 1, 3), (0, 3, 4), (2, 3, 4), (2, 4, 5)]


def test_matcher_scale_guard():
    """Driver-resident constructors refuse web-scale tables cleanly
    instead of OOMing (threshold exercised via the override)."""
    import ray.data as rd

    from igpm_pem_ray.match.extract import Extract
    from igpm_pem_ray.match.subgraph import SubgraphMatcher
    from igpm_pem_ray.sources.fixtures import load_sample_graph

    v, e = load_sample_graph()
    with pytest.raises(ValueError, match="max_driver_vertices"):
        SubgraphMatcher(v, e, max_driver_vertices=3)
    with pytest.raises(ValueError, match="max_driver_edges"):
        Extract(e, max_driver_edges=3)
    # defaults still admit the reference-scale fixture
    assert SubgraphMatcher(v, e)._labels
    assert len(Extract(e).vids) == 6


def test_approx_divergence_vs_reference_semantics():
    """Names the declared K6-approx divergence (SURVEY §8): the
    reference's num_approx stashes candidates on a DEGREE-signature
    mismatch during its assembly order (gray_incremental.py:301-315);
    this engine defines approx as ONE-EDGE-MISSING.  The test pins our
    definition: every reported near-miss binding satisfies exactly
    |E_q|-1 query edges (never all, never fewer), so the counter is
    assembly-order independent."""
    from igpm_pem_ray.match.query import parse_query_args
    from igpm_pem_ray.match.subgraph import SubgraphMatcher
    from igpm_pem_ray.sources.fixtures import load_sample_graph

    v, e = load_sample_graph()
    q = parse_query_args("--vertex a b c --edge x:a:b y:b:c z:c:a".split())
    m = SubgraphMatcher(v, e)
    approx = m.match_approx(q)
    assert len(approx)
    ep = e.to_pandas()
    adj = {(int(r["src"]), int(r["dst"])) for _, r in ep.iterrows()}
    adj |= {(b, a) for a, b in adj}
    exact_sets = set(m.match(q)["_vidset"])
    for _, row in approx.iterrows():
        va, vb, vc = int(row["a"]), int(row["b"]), int(row["c"])
        present = sum(((x, y) in adj)
                      for x, y in ((va, vb), (vb, vc), (vc, va)))
        assert present == 2, row        # exactly one query edge missing
        assert row["_vidset"] not in exact_sets
