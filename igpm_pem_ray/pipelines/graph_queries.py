"""Graph queries for the correctness gate: Ray kernels vs DuckDB oracles.

All run on the deterministic part co-occurrence graph
(``common.EDGES_SQL``) derived from the testdata ``lineitem`` table,
so each kernel has an ANSI-SQL oracle the driver can execute
side-by-side: PageRank as an unrolled fixed-iteration CTE chain,
connected components as a recursive transitive closure + min, label
propagation as unrolled argmax-per-round CTEs, triangles as a 3-way
self-join.  Convergence-based variants (residual stop) are exposed as
rows-only queries; their correctness is covered by the oracle-parity
pytest suite instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from igpm_pem_ray.graph import components as cc_mod
from igpm_pem_ray.graph import labelprop as lp_mod
from igpm_pem_ray.graph import pagerank as pr_mod
from igpm_pem_ray.graph import triangles as tri_mod
from igpm_pem_ray.graph import degrees as deg_mod
from igpm_pem_ray.graph import kcore as kcore_mod
from igpm_pem_ray.graph.dense import build_dense_graph
from igpm_pem_ray.pipelines.common import EDGES_SQL, cooccurrence_edges, scale_col, sql_scale

PR_ITERS = 5
PR_DAMPING = 0.85
PR_SCALE = "1e8"
LP_ROUNDS = 2


# ---------- Ray side ----------

def q_graph_edges(sf_dir: str) -> pa.Table:
    ds = cooccurrence_edges(sf_dir)
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    return t.select(["src", "dst"]).sort_by([("src", "ascending"), ("dst", "ascending")])


def q_pagerank_fixed(sf_dir: str) -> pa.Table:
    edges = cooccurrence_edges(sf_dir)
    g = build_dense_graph(edges)
    rank = pr_mod.pagerank_dense(g, damping=PR_DAMPING, tol=0.0, max_iters=PR_ITERS)
    return pa.table({"vid": g.vids,
                     "rank_e8": scale_col(rank, float(PR_SCALE))})


def q_pagerank(sf_dir: str) -> pa.Table:
    """Convergence-based (1e-6 L1 residual) — rows-only check; parity
    is established by tests/test_kernels.py against dense oracles."""
    edges = cooccurrence_edges(sf_dir)
    stats: dict = {}
    t = pr_mod.pagerank(edges, damping=PR_DAMPING, tol=1e-6, stats=stats)
    return pa.table({"vid": t["vid"],
                     "rank_e8": scale_col(t["rank"].to_numpy(), 1e8)})


def q_connected_components(sf_dir: str) -> pa.Table:
    return cc_mod.connected_components(cooccurrence_edges(sf_dir))


def q_component_sizes(sf_dir: str) -> pa.Table:
    comp = cc_mod.connected_components(cooccurrence_edges(sf_dir))
    import pyarrow.compute as pc

    sizes = comp.group_by("component").aggregate([("vid", "count")])
    return pa.table({"component": sizes["component"],
                     "size": sizes["vid_count"].cast(pa.int64())})


def q_label_propagation(sf_dir: str) -> pa.Table:
    return lp_mod.label_propagation(cooccurrence_edges(sf_dir), max_rounds=LP_ROUNDS)


def q_triangle_count(sf_dir: str) -> pa.Table:
    n = tri_mod.triangle_count(cooccurrence_edges(sf_dir))
    return pa.table({"n_triangles": pa.array([n], type=pa.int64())})


def q_star_count(sf_dir: str) -> pa.Table:
    n = tri_mod.star_count(cooccurrence_edges(sf_dir), min_degree=4)
    return pa.table({"n_stars": pa.array([n], type=pa.int64())})


def q_degree_distribution(sf_dir: str) -> pa.Table:
    dist = deg_mod.degree_distribution(cooccurrence_edges(sf_dir), direction="both")
    pdf = dist.to_pandas().sort_values("degree")
    return pa.table({"degree": pdf["degree"].to_numpy().astype("int64"),
                     "n_vertices": pdf["n_vertices"].to_numpy().astype("int64")})


def q_pagerank_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident (shuffle) PageRank, fixed iterations — checked
    against the SAME unrolled-CTE oracle as the dense fast path, so the
    10^12-scale execution strategy is itself hash-verified."""
    from igpm_pem_ray.graph.shuffle_kernels import pagerank_shuffle

    ds = pagerank_shuffle(cooccurrence_edges(sf_dir), damping=PR_DAMPING,
                          tol=0.0, max_iters=PR_ITERS)
    pdf = ds.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype("int64"),
                     "rank_e8": scale_col(pdf["rank"].to_numpy(), float(PR_SCALE))})


def q_cc_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident (shuffle) WCC — same recursive-closure oracle
    as the dense variant."""
    from igpm_pem_ray.graph.shuffle_kernels import connected_components_shuffle

    ds = connected_components_shuffle(cooccurrence_edges(sf_dir))
    pdf = ds.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype("int64"),
                     "component": pdf["component"].to_numpy().astype("int64")})


def q_lp_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident label propagation — same unrolled-CTE oracle
    as the dense variant (fixed LP_ROUNDS rounds)."""
    from igpm_pem_ray.graph.shuffle_kernels import label_propagation_shuffle

    ds = label_propagation_shuffle(cooccurrence_edges(sf_dir),
                                   max_rounds=LP_ROUNDS)
    pdf = ds.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype("int64"),
                     "label": pdf["label"].to_numpy().astype("int64")})


def q_clustering_coeff(sf_dir: str) -> pa.Table:
    """Per-vertex local clustering coefficient over the co-occurrence
    graph: cc(v) = 2*t(v) / (deg(v)*(deg(v)-1)), from the degree-
    oriented wedge plan's per-vertex triangle map
    (`graph/triangles.per_vertex_triangles` — the nx.triangles map the
    reference sums globally at gray_incremental.py:193).  Scaled e6
    with half-up rounding, 0 for degree < 2."""
    t = tri_mod.per_vertex_triangles(cooccurrence_edges(sf_dir))
    pdf = t.to_pandas().sort_values("vid")
    deg = pdf["degree"].to_numpy().astype(np.float64)
    tri = pdf["n_triangles"].to_numpy().astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        cc = np.where(deg >= 2.0,
                      np.floor(2.0 * tri * 1e6 / (deg * (deg - 1.0)) + 0.5),
                      0.0)
    return pa.table({"vid": pdf["vid"].to_numpy().astype("int64"),
                     "degree": pdf["degree"].to_numpy().astype("int64"),
                     "n_triangles": pdf["n_triangles"].to_numpy().astype("int64"),
                     "cc_e6": cc.astype(np.int64)})


def q_kcore(sf_dir: str) -> pa.Table:
    """Core number per vertex of the co-occurrence graph (vectorized
    cascade peel, `graph/kcore.core_numbers`).  Rows-only: k-core is
    an iterative deletion fixed point SQL can't express; the kernel is
    pinned to an independent set-based peeling oracle and to the
    Dataset-resident `kcore_membership` strategy in
    tests/test_kernels.py."""
    t = kcore_mod.core_numbers(cooccurrence_edges(sf_dir))
    pdf = t.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype("int64"),
                     "core": pdf["core"].to_numpy().astype("int64"),
                     "layer": pdf["layer"].to_numpy().astype("int64")})


def q_kcore_hindex(sf_dir: str) -> pa.Table:
    """FULL core decomposition on the Dataset-resident h-index path
    (kcore.core_numbers_hindex, Lu et al. 2016) — the unbounded-V twin
    of the rows-only `kcore` query; exact equality with the dense
    Batagelj-Zaversnik peel is pinned by test_kcore_hindex_parity, so
    this registers the 10^12-V strategy itself against the driver's
    rows check.  Runs on the thinned graph (like the distance-family
    shuffle queries): the per-round cost is a fixed number of shuffle
    ops, so the sandbox-scale wall time is round-count-bound, not
    data-bound."""
    ds = kcore_mod.core_numbers_hindex(thinned_edges(sf_dir))
    pdf = ds.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype("int64"),
                     "core": pdf["core"].to_numpy().astype("int64")})


HIX_ROUNDS = 4    # bounded h-index rounds for the SQL-oracled variant


def q_kcore_hindex_r4(sf_dir: str) -> pa.Table:
    """The h-index core-decomposition kernel CUT AT HIX_ROUNDS rounds,
    which makes the recurrence SQL-expressible (one unrolled
    count/self-join/argmax CTE block per round) — the same
    bounded-unroll move that gave `kcore_peel` a hash oracle.  Rounds
    past the fixpoint are the identity, so an early-converged kernel
    run and the fixed-round SQL agree by construction; the
    run-to-fixpoint sibling `kcore_hindex` stays rows-only."""
    ds = kcore_mod.core_numbers_hindex(thinned_edges(sf_dir),
                                       max_rounds=HIX_ROUNDS)
    pdf = ds.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype("int64"),
                     "h": pdf["core"].to_numpy().astype("int64")})


def sql_kcore_hindex_r4(rounds: int = HIX_ROUNDS) -> str:
    parts = [
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0)",
        "ue AS (SELECT DISTINCT x AS src, y AS dst FROM (SELECT src AS x, "
        "dst AS y FROM kept UNION ALL SELECT dst, src FROM kept) b "
        "WHERE x <> y)",
        "h0d AS (SELECT src AS vid, count(*) AS deg FROM ue GROUP BY src)",
        # B = H-index of the degree sequence (same clamp as the kernel)
        "bnd AS (SELECT max(least(deg, rn)) AS b FROM (SELECT deg, "
        "row_number() OVER (ORDER BY deg DESC) AS rn FROM h0d))",
        "h0 AS (SELECT vid, least(deg, (SELECT b FROM bnd)) AS h "
        "FROM h0d)",
    ]
    for k in range(1, rounds + 1):
        p = f"h{k - 1}"
        parts.append(
            f"c{k} AS (SELECT e.dst AS vid, s.h AS hval, count(*) AS n "
            f"FROM ue e JOIN {p} s ON e.src = s.vid GROUP BY e.dst, s.h), "
            f"n{k} AS (SELECT a.vid, b.hval AS c, "
            f"sum(CASE WHEN a.hval >= b.hval THEN a.n ELSE 0 END) AS nge "
            f"FROM c{k} a JOIN c{k} b ON a.vid = b.vid "
            f"GROUP BY a.vid, b.hval), "
            f"h{k} AS (SELECT vid, max(least(c, nge)) AS h FROM n{k} "
            f"GROUP BY vid)")
    return _with_edges(
        ", ".join(parts) +
        f" SELECT vid, CAST(h AS BIGINT) AS h FROM h{rounds} ORDER BY vid")


KPEEL_K = 64      # degree threshold: dense co-occ graph peels in 2-3
KPEEL_ROUNDS = 8  # rounds at k=64 (measured sf0.001/0.01); 8 = margin


def q_kcore_peel(sf_dir: str) -> pa.Table:
    """Bounded k-core peel (k = KPEEL_K, exactly <= KPEEL_ROUNDS
    rounds): the vertex set surviving R rounds of "drop every vertex
    whose degree in the current induced subgraph is < k".  Bounding
    the rounds makes the iterative-deletion fixpoint SQL-expressible
    (an unrolled induced-degree CTE per round) — the full-decomposition
    sibling `q_kcore` stays rows-only.  Ray side is the Dataset-
    resident `kcore_membership` strategy (one degree groupby + two
    survivor joins per round, driver sees O(1) scalars); past the
    fixpoint extra rounds are the identity, so converged-early and
    bounded runs agree by construction."""
    keep = kcore_mod.kcore_membership(cooccurrence_edges(sf_dir),
                                      KPEEL_K, max_rounds=KPEEL_ROUNDS)
    pdf = keep.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype("int64")})


def sql_kcore_peel(k: int = KPEEL_K, rounds: int = KPEEL_ROUNDS) -> str:
    parts = [
        "ue AS (SELECT src AS a, dst AS b FROM edges "
        "UNION ALL SELECT dst, src FROM edges)",
        "a0 AS (SELECT DISTINCT a AS vid FROM ue)",
    ]
    for i in range(1, rounds + 1):
        p = f"a{i - 1}"
        parts.append(
            f"d{i} AS (SELECT u.a AS vid, count(*) AS d FROM ue u "
            f"JOIN {p} x ON u.a = x.vid JOIN {p} y ON u.b = y.vid "
            f"GROUP BY u.a), "
            f"a{i} AS (SELECT vid FROM d{i} WHERE d >= {int(k)})")
    return _with_edges(
        ", ".join(parts) +
        f" SELECT vid FROM a{rounds} ORDER BY vid")


EIGEN_ITERS = 4
_EIGEN_MOD = 1 << 31


def q_eigen_walks(sf_dir: str) -> pa.Table:
    """Eigenvector-centrality power iteration in integer walk-count
    form: z_0 = 1, z_k(v) = (sum over in-edges (u,v) of z_{k-1}(u))
    mod 2^31 — z_K is the number of K-walks ending at v in the residue
    ring, the unnormalized power-iteration iterate.  The mod keeps
    every value < 2^31 so per-vertex int64 sums cannot overflow at ANY
    graph scale (indeg < 2^31 => sum < 2^62) and the SQL oracle
    reduces identically (DuckDB sums BIGINT into HUGEINT, then mods).
    One dense msg_pass(sum) per iteration, same substrate as
    `q_katz`."""
    from igpm_pem_ray.graph.dense import msg_pass as _mp

    g = build_dense_graph(cooccurrence_edges(sf_dir))
    z = np.ones(g.num_vertices, dtype=np.int64)
    for _ in range(EIGEN_ITERS):
        z = _mp(g, z, reduce="sum", init=np.int64(0)) % _EIGEN_MOD
    return pa.table({"vid": g.vids, "walks_mod": z})


def sql_eigen_walks(n_iters: int = EIGEN_ITERS) -> str:
    parts = [
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM edges "
        "UNION ALL SELECT dst AS vid FROM edges) u)",
        "z0 AS (SELECT vid, CAST(1 AS BIGINT) AS z FROM verts)",
    ]
    for k in range(1, n_iters + 1):
        p = f"z{k - 1}"
        parts.append(
            f"m{k} AS (SELECT e.dst AS vid, sum(r.z) AS s FROM edges e "
            f"JOIN {p} r ON e.src = r.vid GROUP BY e.dst), "
            f"z{k} AS (SELECT v.vid, CAST(COALESCE(m.s, 0) % {_EIGEN_MOD} "
            f"AS BIGINT) AS z FROM verts v LEFT JOIN m{k} m ON v.vid = m.vid)")
    return _with_edges(
        ", ".join(parts) +
        f" SELECT vid, z AS walks_mod FROM z{n_iters} ORDER BY vid")


WL_ROUNDS = 3
_WL_M = (1 << 31) - 1
_WL_MIX = 2654435761 % _WL_M
_WL_SELF = 1000003


def q_wl_refinement(sf_dir: str) -> pa.Table:
    """1-WL (Weisfeiler-Lehman) color refinement on the undirected
    co-occurrence graph — the graph-isomorphism-invariant vertex
    signature (and the expressive ceiling of message-passing GNNs,
    Xu et al. ICLR 2019): color_0 = deg mod M, color_{k+1}(v) =
    (color_k(v)*1000003 + sum over neighbors of mix(color_k(u)))
    mod M with mix(x) = x*2654435761 mod M.  The multiplicative mix
    before the order-free sum stands in for WL's sorted-multiset
    injection (collisions possible but deterministic and IDENTICAL
    in both engines); every intermediate stays < 2^62 so int64 and
    HUGEINT agree exactly.  One dense msg_pass(sum) per round — the
    same substrate as `q_katz` / `q_eigen_walks`; the vertex-color
    histogram after R rounds is the standard WL feature vector."""
    from igpm_pem_ray.graph.dense import msg_pass as _mp

    edges = cooccurrence_edges(sf_dir)

    def sym(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": np.concatenate([s, d]),
                         "dst": np.concatenate([d, s])})

    g = build_dense_graph(edges.map_batches(sym, batch_format="pyarrow",
                                            zero_copy_batch=True))
    deg = _mp(g, np.ones(g.num_vertices, dtype=np.int64),
              reduce="sum", init=np.int64(0))
    color = deg % _WL_M
    for _ in range(WL_ROUNDS):
        mixed = (color * _WL_MIX) % _WL_M
        nbr = _mp(g, mixed, reduce="sum", init=np.int64(0))
        color = (color * _WL_SELF + nbr) % _WL_M
    return pa.table({"vid": g.vids, "wl_color": color})


def sql_wl_refinement(n_rounds: int = WL_ROUNDS) -> str:
    parts = [
        "ue AS (SELECT src, dst FROM edges "
        "UNION ALL SELECT dst, src FROM edges)",
        f"c0 AS (SELECT src AS vid, count(*) % {_WL_M} AS c "
        "FROM ue GROUP BY src)",
    ]
    for k in range(1, n_rounds + 1):
        p = f"c{k - 1}"
        parts.append(
            f"m{k} AS (SELECT e.dst AS vid, "
            f"sum((r.c * {_WL_MIX}) % {_WL_M}) AS s "
            f"FROM ue e JOIN {p} r ON e.src = r.vid GROUP BY e.dst), "
            f"c{k} AS (SELECT v.vid, CAST((v.c * {_WL_SELF} + m.s) "
            f"% {_WL_M} AS BIGINT) AS c "
            f"FROM {p} v JOIN m{k} m ON v.vid = m.vid)")
    return _with_edges(
        ", ".join(parts) +
        f" SELECT vid, c AS wl_color FROM c{n_rounds} ORDER BY vid")


def _triad_type(cab: int, cbc: int, cac: int) -> str:
    """Holland-Leinhardt type of a COMPLETE triad a<b<c given dyad
    codes (1 = low->high arc only, 2 = high->low only, 3 = mutual).
    For the one-mutual-dyad family the suffix follows the odd vertex's
    out-degree among the two single arcs: 2 -> 120D (it points down at
    the mutual pair), 0 -> 120U, 1 -> 120C — the deterministic
    convention both engines share."""
    m = (cab == 3) + (cbc == 3) + (cac == 3)
    if m == 3:
        return "300"
    if m == 2:
        return "210"
    if m == 1:
        if cab == 3:          # odd vertex c; singles: a-c, b-c
            out_z = (cac == 2) + (cbc == 2)
        elif cbc == 3:        # odd vertex a; singles: a-b, a-c
            out_z = (cab == 1) + (cac == 1)
        else:                 # cac == 3; odd vertex b
            out_z = (cab == 2) + (cbc == 1)
        return {2: "120D", 0: "120U", 1: "120C"}[out_z]
    out_a = (cab == 1) + (cac == 1)
    out_b = (cab == 2) + (cbc == 1)
    out_c = (cac == 2) + (cbc == 2)
    return "030C" if out_a == 1 and out_b == 1 and out_c == 1 else "030T"


# 27-entry lookup over (cab-1)*9 + (cbc-1)*3 + (cac-1); built once.
_TRIAD_LUT = np.array([_triad_type(i // 9 + 1, i % 9 // 3 + 1, i % 3 + 1)
                       for i in range(27)])


def q_triad_census(sf_dir: str) -> pa.Table:
    """Triad census (Holland-Leinhardt 1976) restricted to COMPLETE
    triads — triples whose three dyads are all connected in the
    reciprocal directed graph — classified into the 7 MAN types 300 /
    210 / 120D / 120U / 120C / 030T / 030C.  The disconnected census
    rows (003/012/102 etc.) are derivable from V, dyad counts and
    these by the Batagelj-Mrvar complement identities and carry no new
    joins, so the kernel measures exactly the triangle-shaped work.

    Plan: arcs -> canonical dyad codes (one (lo,hi) groupby summing
    direction bits, so code in {1,2,3}); wedge join dy(a,b) |X|
    dy(b,c) on the shared middle (a<b<c for free from canonical
    order); close with one (a,c)-keyed join carrying all three codes;
    vectorized 27-entry LUT classify; O(7) count groupby.  Scale: the
    same two-join plan as triangle_count; on hub-skewed webgraphs run
    it degree-oriented (triangles.py:39) — here the canonical order
    stands in since the census needs a<b<c anyway."""
    from ray.data.aggregate import Count, Sum

    def dyad_partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": np.minimum(s, d), "hi": np.maximum(s, d),
                         "bit": np.where(s < d, 1, 2).astype(np.int64)})

    dy = directed_edges(sf_dir) \
        .map_batches(dyad_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby(["lo", "hi"]).aggregate(Sum("bit", alias_name="code")) \
        .materialize()

    wedges = dy.rename_columns({"lo": "a", "hi": "b", "code": "cab"}) \
        .join(dy.rename_columns({"lo": "b2", "hi": "c", "code": "cbc"}),
              join_type="inner", num_partitions=8,
              on=("b",), right_on=("b2",))
    tri = wedges.join(
        dy.rename_columns({"lo": "a3", "hi": "c3", "code": "cac"}),
        join_type="inner", num_partitions=8,
        on=("a", "c"), right_on=("a3", "c3"))

    def classify(b: pa.Table) -> pa.Table:
        cab = b["cab"].to_numpy(zero_copy_only=False)
        cbc = b["cbc"].to_numpy(zero_copy_only=False)
        cac = b["cac"].to_numpy(zero_copy_only=False)
        idx = (cab - 1) * 9 + (cbc - 1) * 3 + (cac - 1)
        return pa.table({"triad": pa.array(_TRIAD_LUT[idx], pa.string())})

    counts = tri.map_batches(classify, batch_format="pyarrow") \
        .groupby("triad").aggregate(Count(alias_name="n"))
    pdf = counts.to_pandas().sort_values("triad")
    return pa.table({"triad": pa.array(pdf["triad"].tolist(), pa.string()),
                     "n": pdf["n"].to_numpy().astype("int64")})


def sql_triad_census() -> str:
    onemut = (
        "CASE WHEN cab=3 THEN (CASE WHEN cac=2 THEN 1 ELSE 0 END)"
        "+(CASE WHEN cbc=2 THEN 1 ELSE 0 END) "
        "WHEN cbc=3 THEN (CASE WHEN cab=1 THEN 1 ELSE 0 END)"
        "+(CASE WHEN cac=1 THEN 1 ELSE 0 END) "
        "ELSE (CASE WHEN cab=2 THEN 1 ELSE 0 END)"
        "+(CASE WHEN cbc=1 THEN 1 ELSE 0 END) END")
    return _with_edges(
        f"{_DIRECTED_SQL}, "
        "dy AS (SELECT least(src,dst) AS lo, greatest(src,dst) AS hi, "
        "sum(CASE WHEN src<dst THEN 1 ELSE 2 END) AS code "
        "FROM directed GROUP BY 1, 2), "
        "tri AS (SELECT d1.code AS cab, d2.code AS cbc, d3.code AS cac "
        "FROM dy d1 JOIN dy d2 ON d1.hi = d2.lo "
        "JOIN dy d3 ON d3.lo = d1.lo AND d3.hi = d2.hi), "
        "m AS (SELECT cab, cbc, cac, "
        "(CASE WHEN cab=3 THEN 1 ELSE 0 END)+(CASE WHEN cbc=3 THEN 1 "
        "ELSE 0 END)+(CASE WHEN cac=3 THEN 1 ELSE 0 END) AS nm, "
        "(CASE WHEN cab=1 THEN 1 ELSE 0 END)+(CASE WHEN cac=1 THEN 1 "
        "ELSE 0 END) AS outa, "
        "(CASE WHEN cab=2 THEN 1 ELSE 0 END)+(CASE WHEN cbc=1 THEN 1 "
        "ELSE 0 END) AS outb, "
        "(CASE WHEN cac=2 THEN 1 ELSE 0 END)+(CASE WHEN cbc=2 THEN 1 "
        "ELSE 0 END) AS outc, "
        f"{onemut} AS outz FROM tri) "
        "SELECT CASE WHEN nm=3 THEN '300' WHEN nm=2 THEN '210' "
        "WHEN nm=1 THEN (CASE WHEN outz=2 THEN '120D' "
        "WHEN outz=0 THEN '120U' ELSE '120C' END) "
        "WHEN outa=1 AND outb=1 AND outc=1 THEN '030C' ELSE '030T' END "
        "AS triad, CAST(count(*) AS BIGINT) AS n "
        "FROM m GROUP BY 1 ORDER BY triad")


LINK_PREDICT_K = 20


def q_link_predict(sf_dir: str) -> pa.Table:
    """Common-neighbor link prediction: top-k NON-adjacent vertex
    pairs ranked by shared-neighbor count — broadcast-CSR wedge plan
    with a Dataset join fallback (graph/linkpred.py).  Exact integer
    scores, deterministic (count desc, src, dst) order."""
    from igpm_pem_ray.graph import linkpred as lpred_mod

    return lpred_mod.common_neighbors_topk(cooccurrence_edges(sf_dir),
                                           k=LINK_PREDICT_K)


def sql_link_predict() -> str:
    return _with_edges(
        "ue AS (SELECT src AS x, dst AS y FROM edges "
        "UNION ALL SELECT dst AS x, src AS y FROM edges), "
        "w AS (SELECT e1.x AS a, e2.y AS b, count(*) AS cn "
        "FROM ue e1 JOIN ue e2 ON e1.y = e2.x AND e1.x < e2.y "
        "GROUP BY 1, 2) "
        "SELECT a AS src, b AS dst, CAST(cn AS BIGINT) AS n_common FROM w "
        "WHERE NOT EXISTS (SELECT 1 FROM edges e "
        "WHERE e.src = w.a AND e.dst = w.b) "
        "ORDER BY n_common DESC, src, dst "
        f"LIMIT {LINK_PREDICT_K}")


def q_link_predict_jaccard(sf_dir: str) -> pa.Table:
    """Jaccard-coefficient link prediction: top-k non-adjacent pairs by
    |N∩|/|N∪| — integer-exact numerator/denominator columns so the
    oracle hashes bit-for-bit; ranking is one IEEE double division
    (deterministic in both engines, unlike Adamic-Adar's ln)."""
    from igpm_pem_ray.graph import linkpred as lpred_mod

    return lpred_mod.jaccard_topk(cooccurrence_edges(sf_dir),
                                  k=LINK_PREDICT_K)


def q_link_predict_ra(sf_dir: str) -> pa.Table:
    """Resource-allocation link prediction: top-k non-adjacent pairs by
    sum over common neighbors z of 1/deg(z) — hub intermediaries count
    less (the right weighting for web-like degree tails).  Per-term
    INTEGER convention (RA_SCALE // deg) so the oracle hashes
    bit-for-bit with no libm/float-reduction hazard."""
    from igpm_pem_ray.graph import linkpred as lpred_mod

    return lpred_mod.resource_allocation_topk(cooccurrence_edges(sf_dir),
                                              k=LINK_PREDICT_K)


def sql_link_predict_ra() -> str:
    return _with_edges(
        "ue AS (SELECT src AS x, dst AS y FROM edges "
        "UNION ALL SELECT dst AS x, src AS y FROM edges), "
        "deg AS (SELECT x AS v, count(*) AS d FROM ue GROUP BY x), "
        "w AS (SELECT e1.x AS a, e2.y AS b, "
        "SUM(1000000 // dm.d) AS ra "
        "FROM ue e1 JOIN ue e2 ON e1.y = e2.x AND e1.x < e2.y "
        "JOIN deg dm ON dm.v = e1.y "
        "GROUP BY 1, 2) "
        "SELECT a AS src, b AS dst, CAST(ra AS BIGINT) AS ra_e6 FROM w "
        "WHERE NOT EXISTS (SELECT 1 FROM edges e "
        "WHERE e.src = w.a AND e.dst = w.b) "
        "ORDER BY ra_e6 DESC, src, dst "
        f"LIMIT {LINK_PREDICT_K}")


def q_avg_neighbor_degree(sf_dir: str) -> pa.Table:
    """Per-vertex average neighbor degree (simple undirected graph),
    exact-integer e6 fixed point — the second-moment companion to
    q_degree_distribution."""
    t = deg_mod.avg_neighbor_degree(cooccurrence_edges(sf_dir))
    pdf = t.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype("int64"),
                     "degree": pdf["degree"].to_numpy().astype("int64"),
                     "annd_e6": pdf["annd_e6"].to_numpy().astype("int64")})


def sql_avg_neighbor_degree() -> str:
    return _with_edges(
        "ue AS (SELECT src AS x, dst AS y FROM edges "
        "UNION ALL SELECT dst AS x, src AS y FROM edges), "
        "deg AS (SELECT x AS v, count(*) AS d FROM ue GROUP BY x), "
        "s AS (SELECT e.x AS vid, SUM(dn.d) AS sd, COUNT(*) AS c "
        "FROM ue e JOIN deg dn ON dn.v = e.y GROUP BY e.x) "
        "SELECT s.vid, CAST(dv.d AS BIGINT) AS degree, "
        "CAST((2000000 * sd + c) // (2 * c) AS BIGINT) AS annd_e6 "
        "FROM s JOIN deg dv ON dv.v = s.vid ORDER BY vid")


def q_knn_curve(sf_dir: str) -> pa.Table:
    """Degree-correlation curve knn(k): mean neighbor degree per degree
    class, exact-integer e6 — the curve behind q_assortativity's single
    coefficient."""
    t = deg_mod.knn_curve(cooccurrence_edges(sf_dir))
    pdf = t.to_pandas().sort_values("degree")
    return pa.table({"degree": pdf["degree"].to_numpy().astype("int64"),
                     "knn_e6": pdf["knn_e6"].to_numpy().astype("int64"),
                     "n_endpoints": pdf["n_endpoints"].to_numpy()
                     .astype("int64")})


def sql_knn_curve() -> str:
    return _with_edges(
        "ue AS (SELECT src AS x, dst AS y FROM edges "
        "UNION ALL SELECT dst AS x, src AS y FROM edges), "
        "deg AS (SELECT x AS v, count(*) AS d FROM ue GROUP BY x), "
        "j AS (SELECT dx.d AS degree, dy.d AS nd FROM ue e "
        "JOIN deg dx ON dx.v = e.x JOIN deg dy ON dy.v = e.y) "
        "SELECT degree, "
        "CAST((2000000 * SUM(nd) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) "
        "AS knn_e6, CAST(COUNT(*) AS BIGINT) AS n_endpoints "
        "FROM j GROUP BY degree ORDER BY degree")


def sql_link_predict_jaccard() -> str:
    return _with_edges(
        "ue AS (SELECT src AS x, dst AS y FROM edges "
        "UNION ALL SELECT dst AS x, src AS y FROM edges), "
        "deg AS (SELECT x AS v, count(*) AS d FROM ue GROUP BY x), "
        "w AS (SELECT e1.x AS a, e2.y AS b, count(*) AS cn "
        "FROM ue e1 JOIN ue e2 ON e1.y = e2.x AND e1.x < e2.y "
        "GROUP BY 1, 2), "
        "nj AS (SELECT a, b, cn FROM w "
        "WHERE NOT EXISTS (SELECT 1 FROM edges e "
        "WHERE e.src = w.a AND e.dst = w.b)) "
        "SELECT a AS src, b AS dst, CAST(cn AS BIGINT) AS n_common, "
        "CAST(da.d + db.d - cn AS BIGINT) AS n_union "
        "FROM nj JOIN deg da ON da.v = nj.a JOIN deg db ON db.v = nj.b "
        "ORDER BY CAST(cn AS DOUBLE) / (da.d + db.d - cn) DESC, src, dst "
        f"LIMIT {LINK_PREDICT_K}")


BFS_MAX_DEPTH = 8
HITS_ITERS = 5
HITS_SCALE = "1e8"


def q_bfs_levels(sf_dir: str) -> pa.Table:
    """Hop distance from the smallest vid, undirected, capped at
    BFS_MAX_DEPTH (graph/bfs.py dense msg_pass(min) plan)."""
    from igpm_pem_ray.graph import bfs as bfs_mod

    t = bfs_mod.bfs_levels(cooccurrence_edges(sf_dir),
                           max_depth=BFS_MAX_DEPTH)
    return t.sort_by([("vid", "ascending")])


def sql_bfs_levels() -> str:
    return _with_edges(
        "ue AS (SELECT src AS x, dst AS y FROM edges "
        "UNION ALL SELECT dst AS x, src AS y FROM edges), "
        "lv(v, d) AS (SELECT (SELECT MIN(src) FROM edges), 0 "
        "UNION SELECT e.y, lv.d + 1 FROM lv JOIN ue e ON e.x = lv.v "
        f"WHERE lv.d < {BFS_MAX_DEPTH}) "
        "SELECT v AS vid, CAST(MIN(d) AS BIGINT) AS level FROM lv "
        "GROUP BY v ORDER BY vid")


def q_hits(sf_dir: str) -> pa.Table:
    """HITS hubs/authorities, fixed HITS_ITERS L1-normalized
    iterations (graph/hits.py), e8 fixed-point."""
    from igpm_pem_ray.graph import hits as hits_mod

    t = hits_mod.hits(cooccurrence_edges(sf_dir), n_iters=HITS_ITERS)
    return pa.table({"vid": t["vid"],
                     "hub_e8": scale_col(t["hub"].to_numpy(),
                                         float(HITS_SCALE)),
                     "auth_e8": scale_col(t["auth"].to_numpy(),
                                          float(HITS_SCALE))})


def sql_hits(n_iters: int = HITS_ITERS) -> str:
    # edges/verts are referenced 2x per unrolled iteration; MATERIALIZED
    # stops DuckDB inlining the lineitem self-join into every reference
    # (unmaterialized, the 5-iter chain opens dozens of parquet scans and
    # can exhaust the process fd limit).
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "verts AS MATERIALIZED (SELECT DISTINCT vid FROM "
        "(SELECT src AS vid FROM edges "
        "UNION ALL SELECT dst AS vid FROM edges) u)",
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "h0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT n FROM nv) AS h "
        "FROM verts)",
    ]
    # every intermediate is MATERIALIZED: a{k}/h{k} are each referenced
    # more than once downstream, and unmaterialized CTE inlining makes
    # the unrolled chain expand exponentially with n_iters
    for k in range(1, n_iters + 1):
        p = f"h{k - 1}"
        parts.append(
            f"araw{k} AS MATERIALIZED (SELECT e.dst AS vid, sum(h.h) AS s "
            f"FROM edges e JOIN {p} h ON e.src = h.vid GROUP BY e.dst), "
            f"az{k} AS MATERIALIZED (SELECT sum(s) AS z FROM araw{k}), "
            f"a{k} AS MATERIALIZED (SELECT v.vid, "
            f"COALESCE(r.s, 0.0)/(SELECT z FROM az{k}) AS a "
            f"FROM verts v LEFT JOIN araw{k} r ON v.vid = r.vid), "
            f"hraw{k} AS MATERIALIZED (SELECT e.src AS vid, sum(a.a) AS s "
            f"FROM edges e JOIN a{k} a ON e.dst = a.vid GROUP BY e.src), "
            f"hz{k} AS MATERIALIZED (SELECT sum(s) AS z FROM hraw{k}), "
            f"h{k} AS MATERIALIZED (SELECT v.vid, "
            f"COALESCE(r.s, 0.0)/(SELECT z FROM hz{k}) AS h "
            f"FROM verts v LEFT JOIN hraw{k} r ON v.vid = r.vid)"
        )
    body = ", ".join(parts)
    return (
        f"WITH {body} "
        f"SELECT h.vid, {sql_scale('h.h', HITS_SCALE)} AS hub_e8, "
        f"{sql_scale('a.a', HITS_SCALE)} AS auth_e8 "
        f"FROM h{n_iters} h JOIN a{n_iters} a ON h.vid = a.vid ORDER BY h.vid")


def q_brand_graph(sf_dir: str) -> pa.Table:
    """Graph contraction: collapse the part co-occurrence graph to a
    brand-level quotient graph (graph/contract.py broadcast-mapping
    translate + one groupby-count)."""
    from igpm_pem_ray.graph import contract as contract_mod
    from igpm_pem_ray.pipelines.common import read_table

    edges = cooccurrence_edges(sf_dir)
    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pdf = contract_mod.contract(edges, parts, vid_col="p_partkey",
                                group_col="p_brand").to_pandas() \
        .sort_values(["src_group", "dst_group"]).reset_index(drop=True)
    return pa.table({"src_group": pdf["src_group"],
                     "dst_group": pdf["dst_group"],
                     "n_edges": pdf["n_edges"].to_numpy().astype("int64")})


def sql_brand_graph() -> str:
    return _with_edges(
        "ce AS (SELECT CASE WHEN pa.p_brand <= pb.p_brand THEN pa.p_brand "
        "ELSE pb.p_brand END AS src_group, "
        "CASE WHEN pa.p_brand <= pb.p_brand THEN pb.p_brand "
        "ELSE pa.p_brand END AS dst_group "
        "FROM edges e JOIN part pa ON e.src = pa.p_partkey "
        "JOIN part pb ON e.dst = pb.p_partkey) "
        "SELECT src_group, dst_group, CAST(count(*) AS BIGINT) AS n_edges "
        "FROM ce GROUP BY 1, 2 ORDER BY 1, 2")


def q_assortativity(sf_dir: str) -> pa.Table:
    """Degree assortativity of the co-occurrence graph: exact int64
    moments (degree groupby + two hash joins + per-block partials,
    graph/assortativity.py) and the Pearson coefficient as one
    fixed-order float64 expression, e6-scaled."""
    from igpm_pem_ray.graph import assortativity as asst_mod

    mom, r = asst_mod.assortativity(cooccurrence_edges(sf_dir))
    return pa.table({
        "m": pa.array([mom["m"]], type=pa.int64()),
        "sx": pa.array([mom["sx"]], type=pa.int64()),
        "sxx": pa.array([mom["sxx"]], type=pa.int64()),
        "sxy": pa.array([mom["sxy"]], type=pa.int64()),
        "r_e6": pa.array([int(np.floor(r * 1e6 + 0.5))], type=pa.int64()),
    })


def sql_assortativity() -> str:
    return _with_edges(
        "ue AS (SELECT src, dst FROM edges "
        "UNION ALL SELECT dst AS src, src AS dst FROM edges), "
        "deg AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS degree "
        "FROM ue GROUP BY src), "
        "ed AS (SELECT d1.degree AS dx, d2.degree AS dy FROM edges e "
        "JOIN deg d1 ON e.src = d1.vid JOIN deg d2 ON e.dst = d2.vid), "
        "mom AS (SELECT CAST(2*count(*) AS BIGINT) AS m, "
        "CAST(sum(dx+dy) AS BIGINT) AS sx, "
        "CAST(sum(dx*dx+dy*dy) AS BIGINT) AS sxx, "
        "CAST(sum(2*dx*dy) AS BIGINT) AS sxy FROM ed) "
        "SELECT m, sx, sxx, sxy, CAST(floor((("
        "CAST(m AS DOUBLE)*CAST(sxy AS DOUBLE) - "
        "CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) / ("
        "CAST(m AS DOUBLE)*CAST(sxx AS DOUBLE) - "
        "CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))*1e6 + 0.5) AS BIGINT) "
        "AS r_e6 FROM mom")


def oriented_edges(sf_dir: str):
    """Deterministic CYCLIC directed graph from the co-occurrence
    pairs: the canonical table is src<dst (a DAG — every SCC
    trivial), so thin to 1/9 of the pairs by an affine hash (the full
    graph is so dense any balanced orientation collapses into ONE
    giant SCC) and direct each kept pair by parity of src+dst.
    Identical expression in both engines; yields the web-like bow-tie
    mix (giant SCC + tendrils: at sf0.01, 16 SCCs, largest 663 of
    2000 vertices)."""
    def orient(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = (s * 31 + d * 17) % 9 == 0
        s, d = s[keep], d[keep]
        flip = (s + d) % 2 == 1
        return pa.table({"src": np.where(flip, d, s),
                         "dst": np.where(flip, s, d)})

    return cooccurrence_edges(sf_dir).map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True)


def q_scc(sf_dir: str) -> pa.Table:
    """Strongly connected components (trim + coloring + backward
    reach, graph/scc.py) on the parity-oriented co-occurrence graph;
    scc = min raw vid in the component."""
    from igpm_pem_ray.graph import scc as scc_mod

    out = scc_mod.strongly_connected_components(oriented_edges(sf_dir))
    return out.sort_by([("vid", "ascending")])


def q_scc_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident SCC (the 10^12-V strategy) on the same
    parity-oriented graph — hash-verified against the same recursive
    mutual-reachability oracle as the dense variant."""
    from igpm_pem_ray.graph import scc as scc_mod

    out = scc_mod.strongly_connected_components_shuffle(
        oriented_edges(sf_dir))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.select(["vid", "scc"]).sort_by([("vid", "ascending")])


def sql_scc() -> str:
    return _with_edges(
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0), "
        "oriented AS (SELECT CASE WHEN (src+dst)%2=0 THEN src ELSE dst END AS src, "
        "CASE WHEN (src+dst)%2=0 THEN dst ELSE src END AS dst FROM kept), "
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM oriented "
        "UNION ALL SELECT dst AS vid FROM oriented) u), "
        "reach(a, b) AS (SELECT vid, vid FROM verts "
        "UNION SELECT r.a, e.dst FROM reach r JOIN oriented e ON r.b = e.src), "
        "mutual AS (SELECT r1.a AS v, r1.b AS u FROM reach r1 "
        "JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a) "
        "SELECT v AS vid, MIN(u) AS scc FROM mutual GROUP BY v ORDER BY vid")


def directed_edges(sf_dir: str):
    """Directed graph WITH reciprocal pairs: both orientations of each
    canonical pair are candidate arcs, each kept by the PRODUCT-term
    hash keep iff ((s%13)*(d%13) + 5*(s%13) + 2*(d%13)) % 13 < 5.
    The product term is essential: any affine rule (p*s+q*d)%m is
    direction-SYMMETRIC whenever p+q≡0 or p≡q (mod m) — the previous
    (s*31+d*17)%3 rule satisfied 31+17≡0 (mod 3), so every kept dyad
    was silently mutual (reciprocity exactly 1, triad census all-300).
    The product rule realizes all 27 dyad-code combinations on the
    triad support (measured at sf0.01) and an expected reciprocity of
    5/13.  Residues are reduced BEFORE the multiply so the expression
    is exact at 63-bit vids in both engines (the MIS/walks hash
    convention).  Identical expression in the SQL oracle."""
    def both(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        cs = np.concatenate([s, d])
        cd = np.concatenate([d, s])
        rs, rd = cs % 13, cd % 13
        keep = (rs * rd + 5 * rs + 2 * rd) % 13 < 5
        return pa.table({"src": cs[keep], "dst": cd[keep]})

    return cooccurrence_edges(sf_dir).map_batches(
        both, batch_format="pyarrow", zero_copy_batch=True)


_DIRECTED_SQL = (
    "directed AS (SELECT s AS src, d AS dst FROM ("
    "SELECT src AS s, dst AS d FROM edges "
    "UNION ALL SELECT dst AS s, src AS d FROM edges) b "
    "WHERE ((s%13)*(d%13) + 5*(s%13) + 2*(d%13)) % 13 < 5)")


def q_reciprocity(sf_dir: str) -> pa.Table:
    """Edge reciprocity of the directed graph: the fraction of edges
    (u,v) whose reverse (v,u) is also present — a standard digraph
    statistic (web graphs ~0.25, social graphs ~0.7).  One
    self-hash-join on the swapped key pair; counts are exact int64,
    ratio e6-scaled per the integer-exact convention."""
    edges = directed_edges(sf_dir).materialize()
    n_edges = edges.count()
    rev = edges.map_batches(
        lambda b: pa.table({"r_src": b["dst"], "r_dst": b["src"]}),
        batch_format="pyarrow")
    n_recip = edges.join(rev, join_type="inner", num_partitions=8,
                         on=("src", "dst"), right_on=("r_src", "r_dst")) \
        .count()
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_recip": pa.array([n_recip], pa.int64()),
        "reciprocity_e6": pa.array(
            [int(np.floor(n_recip * 1e6 / max(n_edges, 1) + 0.5))],
            pa.int64()),
    })


def sql_reciprocity() -> str:
    return _with_edges(
        f"{_DIRECTED_SQL}, "
        "r AS (SELECT count(*) AS n_recip FROM directed a "
        "JOIN directed b ON a.src=b.dst AND a.dst=b.src), "
        "t AS (SELECT count(*) AS n_edges FROM directed) "
        "SELECT CAST(t.n_edges AS BIGINT) AS n_edges, "
        "CAST(r.n_recip AS BIGINT) AS n_recip, "
        "CAST(floor(r.n_recip*1e6/greatest(t.n_edges,1)+0.5) AS BIGINT) "
        "AS reciprocity_e6 FROM t, r")


def q_two_hop(sf_dir: str) -> pa.Table:
    """Distinct 2-hop out-neighborhood size per vertex (excluding the
    vertex itself) on the thinned oriented graph: one mid-keyed
    self-join (edges |X| edges on dst=src), vectorized self-filter,
    distinct via (src,dst2) groupby, then a count groupby.  Scale
    note: the join fan-out is sum over mids of indeg*outdeg — on the
    full web graph this runs after hub-splitting (stages/partition)
    or on the thinned graph; documented rather than silently capped."""
    from ray.data.aggregate import Count, Min

    edges = oriented_edges(sf_dir).materialize()
    hop2 = edges.rename_columns({"src": "a", "dst": "mid"}) \
        .join(edges.rename_columns({"src": "mid2", "dst": "b"}),
              join_type="inner", num_partitions=8,
              on=("mid",), right_on=("mid2",))

    def noself(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        c = t["b"].to_numpy(zero_copy_only=False)
        keep = a != c
        return pa.table({"vid": a[keep], "nb": c[keep]})

    pairs = hop2.map_batches(noself, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["vid", "nb"]).aggregate(Min("nb", alias_name="_m")) \
        .groupby("vid").aggregate(Count(alias_name="n_two_hop"))
    t = pa.Table.from_pandas(pairs.to_pandas(), preserve_index=False)
    return pa.table({"vid": t["vid"],
                     "n_two_hop": t["n_two_hop"].cast(pa.int64())}) \
        .sort_by([("vid", "ascending")])


def sql_two_hop() -> str:
    return _with_edges(
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0), "
        "oriented AS (SELECT CASE WHEN (src+dst)%2=0 THEN src ELSE dst END "
        "AS src, CASE WHEN (src+dst)%2=0 THEN dst ELSE src END AS dst "
        "FROM kept) "
        "SELECT a.src AS vid, CAST(count(DISTINCT b.dst) AS BIGINT) "
        "AS n_two_hop FROM oriented a JOIN oriented b ON a.dst = b.src "
        "WHERE b.dst <> a.src GROUP BY a.src ORDER BY vid")


def q_rwr(sf_dir: str) -> pa.Table:
    """Reference-parity RWR (restart 0.7, L1 tol 1e-3, rwr.py:15) —
    rows-only; parity covered by test_rwr_reference_parity."""
    t = pr_mod.rwr(cooccurrence_edges(sf_dir), restart=0.7, tol=1e-3)
    return pa.table({"vid": t["vid"], "score_e8": scale_col(t["score"].to_numpy(), 1e8)})


# ---------- SQL oracles ----------

def _with_edges(body: str) -> str:
    return f"WITH RECURSIVE edges AS ({EDGES_SQL}), {body}"


def sql_graph_edges() -> str:
    return f"SELECT src, dst FROM ({EDGES_SQL}) ORDER BY src, dst"


def sql_pagerank_fixed(n_iters: int = PR_ITERS, damping: float = PR_DAMPING) -> str:
    d = repr(damping)
    parts = [
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM edges UNION ALL SELECT dst AS vid FROM edges) u)",
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "outdeg AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY src)",
        "r0 AS (SELECT vid, 1.0/(SELECT n FROM nv) AS rank FROM verts)",
    ]
    for k in range(1, n_iters + 1):
        p = f"r{k - 1}"
        parts.append(
            f"dang{k} AS (SELECT COALESCE(sum(r.rank), 0.0) AS mass FROM {p} r "
            f"LEFT JOIN outdeg o ON r.vid = o.vid WHERE o.vid IS NULL), "
            f"msg{k} AS (SELECT e.dst AS vid, sum(r.rank / o.od) AS s "
            f"FROM edges e JOIN {p} r ON e.src = r.vid JOIN outdeg o ON o.vid = e.src "
            f"GROUP BY e.dst), "
            f"r{k} AS (SELECT v.vid, (1.0 - {d})/(SELECT n FROM nv) + {d} * "
            f"(COALESCE(m.s, 0.0) + (SELECT mass FROM dang{k})/(SELECT n FROM nv)) AS rank "
            f"FROM verts v LEFT JOIN msg{k} m ON v.vid = m.vid)"
        )
    body = ", ".join(parts)
    return _with_edges(
        f"{body} SELECT vid, {sql_scale('rank', PR_SCALE)} AS rank_e8 "
        f"FROM r{n_iters} ORDER BY vid")


def sql_connected_components() -> str:
    return _with_edges(
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges) u), "
        "verts AS (SELECT src AS vid FROM ue GROUP BY src), "
        "reach(a, b) AS (SELECT vid, vid FROM verts "
        "UNION SELECT r.a, e.dst FROM reach r JOIN ue e ON r.b = e.src) "
        "SELECT a AS vid, MIN(b) AS component FROM reach GROUP BY a ORDER BY vid")


def sql_component_sizes() -> str:
    return _with_edges(
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges) u), "
        "verts AS (SELECT src AS vid FROM ue GROUP BY src), "
        "reach(a, b) AS (SELECT vid, vid FROM verts "
        "UNION SELECT r.a, e.dst FROM reach r JOIN ue e ON r.b = e.src), "
        "comp AS (SELECT a AS vid, MIN(b) AS component FROM reach GROUP BY a) "
        "SELECT component, CAST(count(*) AS BIGINT) AS size FROM comp "
        "GROUP BY component ORDER BY component")


def _lp_parts(rounds: int = LP_ROUNDS) -> list[str]:
    """Unrolled label-propagation CTE chain (argmax count, ties to the
    smallest label) — shared by the LP oracle and the modularity
    oracle."""
    parts = [
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges) u)",
        "verts AS (SELECT src AS vid FROM ue GROUP BY src)",
        "lp0 AS (SELECT vid, vid AS label FROM verts)",
    ]
    for k in range(1, rounds + 1):
        p = f"lp{k - 1}"
        parts.append(
            f"cnt{k} AS (SELECT e.src AS vid, l.label, count(*) AS c "
            f"FROM ue e JOIN {p} l ON e.dst = l.vid GROUP BY e.src, l.label), "
            f"win{k} AS (SELECT vid, label FROM (SELECT vid, label, "
            f"row_number() OVER (PARTITION BY vid ORDER BY c DESC, label ASC) AS rn "
            f"FROM cnt{k}) WHERE rn = 1), "
            f"lp{k} AS (SELECT v.vid, COALESCE(w.label, p.label) AS label "
            f"FROM verts v JOIN {p} p ON v.vid = p.vid "
            f"LEFT JOIN win{k} w ON v.vid = w.vid)"
        )
    return parts


def sql_label_propagation(rounds: int = LP_ROUNDS) -> str:
    body = ", ".join(_lp_parts(rounds))
    return _with_edges(f"{body} SELECT vid, label FROM lp{rounds} ORDER BY vid")


def sql_triangle_count() -> str:
    return _with_edges(
        "t AS (SELECT 1 FROM edges e1 "
        "JOIN edges e2 ON e1.dst = e2.src "
        "JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst) "
        "SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM t")


def sql_clustering_coeff() -> str:
    return _with_edges(
        "tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c "
        "FROM edges e1 JOIN edges e2 ON e1.dst = e2.src "
        "JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst), "
        "pert AS (SELECT a AS vid FROM tri UNION ALL "
        "SELECT b FROM tri UNION ALL SELECT c FROM tri), "
        "tc AS (SELECT vid, count(*) AS t FROM pert GROUP BY vid), "
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges "
        "UNION ALL SELECT dst AS src, src AS dst FROM edges) u), "
        "deg AS (SELECT src AS vid, count(*) AS degree FROM ue GROUP BY src) "
        "SELECT deg.vid, CAST(degree AS BIGINT) AS degree, "
        "CAST(COALESCE(t, 0) AS BIGINT) AS n_triangles, "
        "CAST(CASE WHEN degree >= 2 THEN "
        "floor(2.0*COALESCE(t, 0)*1e6/(degree*(degree-1.0))+0.5) "
        "ELSE 0 END AS BIGINT) AS cc_e6 "
        "FROM deg LEFT JOIN tc ON tc.vid = deg.vid")


def sql_star_count(min_degree: int = 4) -> str:
    return _with_edges(
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges) u), "
        "deg AS (SELECT src AS vid, count(*) AS degree FROM ue GROUP BY src) "
        f"SELECT CAST(count(*) AS BIGINT) AS n_stars FROM deg WHERE degree >= {min_degree}")


def sql_degree_distribution() -> str:
    return _with_edges(
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges) u), "
        "deg AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS degree FROM ue GROUP BY src) "
        "SELECT degree, CAST(count(*) AS BIGINT) AS n_vertices FROM deg "
        "GROUP BY degree ORDER BY degree")


# ---------- distance analytics (graph/distance.py) ----------

DIST_MAX_DEPTH = 4


def thinned_edges(sf_dir: str):
    """Undirected 1/9-thinned co-occurrence graph (the same affine
    keep-hash as ``oriented_edges`` but WITHOUT the orientation —
    canonical src<dst rows; distance kernels exchange both directions
    at message time).  Thinning keeps the all-pairs SQL oracle's
    recursive working set small; identical expression in both
    engines."""
    def keep(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        k = (s * 31 + d * 17) % 9 == 0
        return pa.table({"src": s[k], "dst": d[k]})

    return cooccurrence_edges(sf_dir).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True)


_THINNED_UE_SQL = (
    "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0), "
    "ue AS (SELECT src AS x, dst AS y FROM kept "
    "UNION ALL SELECT dst AS x, src AS y FROM kept), "
    "verts AS (SELECT DISTINCT x AS vid FROM ue), "
    "reach(a, b, d) AS (SELECT vid, vid, 0 FROM verts "
    "UNION SELECT r.a, e.y, r.d + 1 FROM reach r JOIN ue e ON e.x = r.b "
    f"WHERE r.d < {DIST_MAX_DEPTH}), "
    "md AS (SELECT a, b, MIN(d) AS d FROM reach WHERE a <> b GROUP BY a, b)")


def q_distance_hist(sf_dir: str) -> pa.Table:
    """Ordered-pair distance histogram d=1..DIST_MAX_DEPTH on the
    thinned undirected graph (bit-parallel multi-source BFS,
    graph/distance.py)."""
    from igpm_pem_ray.graph import distance as dist_mod

    return dist_mod.distance_histogram(thinned_edges(sf_dir),
                                       max_depth=DIST_MAX_DEPTH)


def sql_distance_hist() -> str:
    return _with_edges(
        _THINNED_UE_SQL + ", "
        "hist AS (SELECT d, count(*) AS n FROM md GROUP BY d) "
        f"SELECT CAST(g.d AS BIGINT) AS d, "
        "CAST(COALESCE(h.n, 0) AS BIGINT) AS n_pairs "
        f"FROM range(1, {DIST_MAX_DEPTH + 1}) g(d) "
        "LEFT JOIN hist h ON h.d = g.d ORDER BY d")


def q_harmonic_centrality(sf_dir: str) -> pa.Table:
    """Depth-capped harmonic centrality sum(round(1e6/d(u,v))) on the
    thinned undirected graph — integer-exact in both engines."""
    from igpm_pem_ray.graph import distance as dist_mod

    t = dist_mod.harmonic_centrality(thinned_edges(sf_dir),
                                     max_depth=DIST_MAX_DEPTH)
    return t.sort_by([("vid", "ascending")])


def q_harmonic_hll(sf_dir: str) -> pa.Table:
    """Dataset-resident HyperBall harmonic centrality
    (`shuffle_kernels.harmonic_hll_shuffle`) — rows-only (HLL ball
    estimates are approximate by construction); pinned bit-exactly to
    a numpy register-replay oracle in tests/test_kernels.py."""
    from igpm_pem_ray.graph.shuffle_kernels import harmonic_hll_shuffle

    t = harmonic_hll_shuffle(thinned_edges(sf_dir),
                             max_depth=DIST_MAX_DEPTH).to_pandas()
    t = t.sort_values("vid").reset_index(drop=True)
    return pa.Table.from_pandas(t, preserve_index=False)


def sql_harmonic_centrality() -> str:
    return _with_edges(
        _THINNED_UE_SQL + ", "
        "h AS (SELECT b AS vid, "
        "SUM(CAST(floor(1e6/d + 0.5) AS BIGINT)) AS s FROM md GROUP BY b) "
        "SELECT v.vid, CAST(COALESCE(h.s, 0) AS BIGINT) AS harmonic_e6 "
        "FROM verts v LEFT JOIN h ON h.vid = v.vid ORDER BY v.vid")


def q_effective_diameter(sf_dir: str) -> pa.Table:
    """HyperBall (HLL-register) effective diameter of the thinned
    graph — rows-only (approximate by construction); the exact-vs-HLL
    error band is pinned by tests/test_kernels.py."""
    from igpm_pem_ray.graph import distance as dist_mod

    r = dist_mod.effective_diameter(thinned_edges(sf_dir),
                                    q=0.9, max_depth=16, strategy="hll")
    return pa.table({"effective_diameter": pa.array(
                         [r["effective_diameter"]], pa.int64()),
                     "n_pairs_total": pa.array([r["n_pairs_total"]],
                                               pa.int64()),
                     "depth_converged": pa.array([r["depth_converged"]],
                                                 pa.int64())})


def q_effective_diameter_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident HyperBall (registers as a (vid, regs) state
    Dataset, one join + hash-shuffle-by-vid max-merge per round —
    shuffle_kernels.hyperball_shuffle): the 10^12-V alternate to
    q_effective_diameter, bit-identical register evolution."""
    from igpm_pem_ray.graph import distance as dist_mod

    r = dist_mod.effective_diameter(thinned_edges(sf_dir),
                                    q=0.9, max_depth=16,
                                    strategy="hll_shuffle")
    return pa.table({"effective_diameter": pa.array(
                         [r["effective_diameter"]], pa.int64()),
                     "n_pairs_total": pa.array([r["n_pairs_total"]],
                                               pa.int64()),
                     "depth_converged": pa.array([r["depth_converged"]],
                                                 pa.int64())})


def q_distance_hist_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident exact sweep (shuffle_kernels.msbfs_shuffle:
    per-chunk bitset as a (vid, bits) state Dataset, one frontier join
    + hash-shuffle-by-vid OR-merge per round) — the 10^12-V alternate
    to q_distance_hist, integer-exact same histogram."""
    from igpm_pem_ray.graph import distance as dist_mod

    return dist_mod.distance_histogram(thinned_edges(sf_dir),
                                       max_depth=DIST_MAX_DEPTH,
                                       strategy="shuffle")


def q_harmonic_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident exact harmonic centrality (msbfs_shuffle) —
    integer-exact same values as q_harmonic_centrality, same SQL
    oracle (unlike q_harmonic_hll, which is the approximate HLL
    family)."""
    from igpm_pem_ray.graph import distance as dist_mod

    return dist_mod.harmonic_centrality(thinned_edges(sf_dir),
                                        max_depth=DIST_MAX_DEPTH,
                                        strategy="shuffle")


def q_eccentricity_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident exact depth-capped eccentricity
    (msbfs_shuffle) — integer-exact same values as q_eccentricity."""
    from igpm_pem_ray.graph import distance as dist_mod

    return dist_mod.eccentricity(thinned_edges(sf_dir),
                                 max_depth=DIST_MAX_DEPTH,
                                 strategy="shuffle")


def q_closeness_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident exact closeness sufficient statistics
    (msbfs_shuffle) — integer-exact same values as q_closeness."""
    from igpm_pem_ray.graph import distance as dist_mod

    return dist_mod.closeness_stats(thinned_edges(sf_dir),
                                    max_depth=DIST_MAX_DEPTH,
                                    strategy="shuffle")


# ---------- deterministic random walks (graph/walks.py) ----------

WALK_LEN = 3


def q_random_walks(sf_dir: str) -> pa.Table:
    """One RNG-free walk per vertex of the thinned undirected graph,
    WALK_LEN affine-hash steps (graph/walks.py Dataset-join plan)."""
    from igpm_pem_ray.graph import walks as walks_mod

    ds = walks_mod.random_walks(thinned_edges(sf_dir), walk_len=WALK_LEN)
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    return t.select(["walker", "step", "vid"]).sort_by(
        [("walker", "ascending"), ("step", "ascending")])


def _sql_walks_cte() -> str:
    """CTE body building `walks(walker, step, vid)` — the unrolled
    deterministic-walk construction shared by sql_random_walks and
    sql_walk_pairs."""
    parts = [
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0)",
        "ue AS (SELECT DISTINCT x, y FROM (SELECT src AS x, dst AS y "
        "FROM kept UNION ALL SELECT dst AS x, src AS y FROM kept) b)",
        "nbr AS (SELECT x AS src, y AS dst, "
        "row_number() OVER (PARTITION BY x ORDER BY y) - 1 AS r FROM ue)",
        "deg AS (SELECT src, count(*) AS deg FROM nbr GROUP BY src)",
        "w0 AS (SELECT src AS walker, src AS v FROM deg)",
    ]
    for k in range(1, WALK_LEN + 1):
        parts.append(
            f"w{k} AS (SELECT w.walker, n.dst AS v "
            f"FROM w{k - 1} w JOIN deg d ON d.src = w.v "
            f"JOIN nbr n ON n.src = w.v "
            f"AND n.r = ((w.walker % 2147483647)*1000003 + {k}*7919) "
            f"% d.deg)")
    selects = " UNION ALL ".join(
        f"SELECT walker, {k} AS step, v AS vid FROM w{k}"
        for k in range(0, WALK_LEN + 1))
    parts.append(f"walks AS ({selects})")
    return ", ".join(parts)


def sql_random_walks() -> str:
    return (f"WITH RECURSIVE edges AS ({EDGES_SQL}), {_sql_walks_cte()} "
            f"SELECT CAST(walker AS BIGINT) AS walker, "
            f"CAST(step AS BIGINT) AS step, CAST(vid AS BIGINT) AS vid "
            f"FROM walks ORDER BY walker, step")


# ---------- skip-gram pair corpus from the walks (word2vec input) ----

WALK_WIN = 2  # skip-gram context window over the walk sequence


def q_walk_pairs(sf_dir: str):
    """Skip-gram (center, context) training-pair counts from the
    deterministic walks — the DeepWalk/node2vec corpus-generation step
    (Perozzi et al. KDD 2014 §4.2): for every walk position, emit the
    vertices within WALK_WIN steps either side, count by ordered pair.

    Scale shape: walks are materialized ONCE (O(V·walk_len) rows,
    Dataset-resident / spillable), then ONE self hash-join on walker
    with fan-out bounded by (walk_len+1)·2·WALK_WIN per walker — no
    driver materialization, one count groupby at the end.  The r3
    zero-right-block join pitfall is avoided the same way as
    graph/walks.py: tiny inputs collapse to one join partition."""
    from ray.data.aggregate import Count

    from igpm_pem_ray.graph import walks as walks_mod

    ds = walks_mod.random_walks(thinned_edges(sf_dir),
                                walk_len=WALK_LEN).materialize()
    num_partitions = 1 if ds.count() < 64 * 8 * (WALK_LEN + 1) else 8
    a = ds.rename_columns({"step": "sa", "vid": "center"})
    b = ds.rename_columns({"walker": "walker2", "step": "sb",
                           "vid": "context"})
    j = a.join(b, join_type="inner", num_partitions=num_partitions,
               on=("walker",), right_on=("walker2",))

    def win(t: pa.Table) -> pa.Table:
        sa = t["sa"].to_numpy(zero_copy_only=False)
        sb = t["sb"].to_numpy(zero_copy_only=False)
        d = np.abs(sb - sa)
        k = (d >= 1) & (d <= WALK_WIN)
        return pa.table({"center": t["center"].to_numpy(
                             zero_copy_only=False)[k],
                         "context": t["context"].to_numpy(
                             zero_copy_only=False)[k]})

    return j.map_batches(win, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["center", "context"]) \
        .aggregate(Count(alias_name="n")) \
        .sort(["center", "context"])


def sql_walk_pairs() -> str:
    return (f"WITH RECURSIVE edges AS ({EDGES_SQL}), {_sql_walks_cte()} "
            "SELECT CAST(a.vid AS BIGINT) AS center, "
            "CAST(b.vid AS BIGINT) AS context, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM walks a JOIN walks b ON a.walker = b.walker "
            f"AND abs(a.step - b.step) BETWEEN 1 AND {WALK_WIN} "
            "GROUP BY a.vid, b.vid ORDER BY center, context")


# ---------- Monte-Carlo PageRank visit counts ----------

def q_pagerank_mc(sf_dir: str):
    """Monte-Carlo PageRank estimate by complete-path visit counting
    (Avrachenkov et al. 2007 "Monte Carlo methods in PageRank
    computation", the 'complete path' estimator with one walk per
    vertex): visits(v) = number of (walker, step) positions at v over
    the shared deterministic walk table; the stationary share is
    visits / total positions.  A THIRD PageRank strategy beside the
    dense and shuffle power iterations — and because the walks are
    the RNG-free hash walks both engines replay exactly, the estimate
    itself is hash-oracle-checked, not just rows-checked.  One count
    groupby over the walk table; share_e6 uses the integer half-up
    convention with the total a driver scalar."""
    from ray.data.aggregate import Count

    from igpm_pem_ray.graph import walks as walks_mod

    ds = walks_mod.random_walks(thinned_edges(sf_dir),
                                walk_len=WALK_LEN).materialize()
    total = ds.count()
    visits = ds.groupby("vid").aggregate(Count(alias_name="visits"))
    pdf = visits.to_pandas().sort_values("vid")
    v = pdf["visits"].to_numpy().astype("int64")
    return pa.table({
        "vid": pdf["vid"].to_numpy().astype("int64"),
        "visits": v,
        "share_e6": np.floor(v * 1e6 / total + 0.5).astype(np.int64)})


def sql_pagerank_mc() -> str:
    return (f"WITH RECURSIVE edges AS ({EDGES_SQL}), {_sql_walks_cte()}, "
            "t AS (SELECT count(*) AS total FROM walks) "
            "SELECT CAST(w.vid AS BIGINT) AS vid, "
            "CAST(count(*) AS BIGINT) AS visits, "
            "CAST(floor(count(*) * 1e6 / t.total + 0.5) AS BIGINT) "
            "AS share_e6 "
            "FROM walks w, t GROUP BY w.vid, t.total ORDER BY vid")


# ---------- Monte-Carlo SimRank from the shared walks ----------

SIMRANK_C_NUM, SIMRANK_C_DEN = 4, 5   # decay c = 4/5, exact rational
_SIMRANK_E6 = {t: 10**6 * SIMRANK_C_NUM**t // SIMRANK_C_DEN**t
               for t in range(1, WALK_LEN + 1)}


def q_simrank_mc(sf_dir: str):
    """Monte-Carlo SimRank estimates (Fogaras-Racz, WWW 2005 "Scaling
    link-based similarity search"): s(a,b) = E[c^tau] where tau is the
    first time the two vertices' walks occupy the same vertex at the
    same step.  One deterministic hash-walk per vertex (the shared
    graph/walks.py substrate, identically replayed by the SQL oracle's
    unrolled CTE) gives the 1-sample estimator; c = 4/5 keeps the
    decay exact-rational so c^tau is integer-exact at e6 scale.

    Scale shape: candidate pairs come from an inverted-index self-join
    of the walk table on (step, vid) — only walkers that actually
    co-locate ever pair, never all V^2 — then one (a,b) groupby takes
    the FIRST meeting.  Fan-out per (step, vid) cell is the square of
    its occupancy; on hub-heavy graphs cap hot cells exactly as the
    LSH banding join does (text/dedup.py hot-bucket cap).  Step 0
    never matches (each walk starts at its own distinct vertex)."""
    from ray.data.aggregate import Min

    from igpm_pem_ray.graph import walks as walks_mod

    ds = walks_mod.random_walks(thinned_edges(sf_dir),
                                walk_len=WALK_LEN).materialize()
    num_partitions = 1 if ds.count() < 64 * 8 * (WALK_LEN + 1) else 8
    a = ds.rename_columns({"walker": "a", "step": "s", "vid": "v"})
    b = ds.rename_columns({"walker": "b", "step": "s2", "vid": "v2"})
    j = a.join(b, join_type="inner", num_partitions=num_partitions,
               on=("s", "v"), right_on=("s2", "v2"))

    def lt(t: pa.Table) -> pa.Table:
        av = t["a"].to_numpy(zero_copy_only=False)
        bv = t["b"].to_numpy(zero_copy_only=False)
        k = av < bv
        return pa.table({"a": av[k], "b": bv[k],
                         "s": t["s"].to_numpy(zero_copy_only=False)[k]})

    met = j.map_batches(lt, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["a", "b"]).aggregate(Min("s", alias_name="meet_step"))

    lut = np.zeros(WALK_LEN + 1, dtype=np.int64)
    for t, v in _SIMRANK_E6.items():
        lut[t] = v

    def score(t: pa.Table) -> pa.Table:
        ms = t["meet_step"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"a": t["a"], "b": t["b"], "meet_step": ms,
                         "simrank_e6": lut[ms]})

    return met.map_batches(score, batch_format="pyarrow") \
        .sort(["a", "b"])


def sql_simrank_mc() -> str:
    cases = " ".join(f"WHEN {t} THEN {v}" for t, v in _SIMRANK_E6.items())
    return (f"WITH RECURSIVE edges AS ({EDGES_SQL}), {_sql_walks_cte()} "
            "SELECT CAST(w1.walker AS BIGINT) AS a, "
            "CAST(w2.walker AS BIGINT) AS b, "
            "CAST(min(w1.step) AS BIGINT) AS meet_step, "
            f"CAST(CASE min(w1.step) {cases} END AS BIGINT) AS simrank_e6 "
            "FROM walks w1 JOIN walks w2 ON w1.step = w2.step "
            "AND w1.vid = w2.vid AND w1.walker < w2.walker "
            "GROUP BY w1.walker, w2.walker ORDER BY a, b")


# ---------- weighted PageRank (multigraph multiplicity) ----------

def q_pagerank_weighted(sf_dir: str) -> pa.Table:
    """Integer-weighted PageRank: weight(src,dst) = number of shared
    orders, expressed as edge MULTIPLICITY (common.
    cooccurrence_pairs_multi) — the dense substrate's per-partition
    reduceat sums parallel edges, and outdeg counts rows, so the
    unweighted kernel computes the weighted recurrence
    rank*w/sum(w) with zero new code.  Fixed PR_ITERS iterations,
    e8 fixed-point."""
    from igpm_pem_ray.pipelines.common import cooccurrence_pairs_multi

    pairs = cooccurrence_pairs_multi(sf_dir)
    g = build_dense_graph(pairs)
    rank = pr_mod.pagerank_dense(g, damping=PR_DAMPING, tol=0.0,
                                 max_iters=PR_ITERS)
    return pa.table({"vid": g.vids,
                     "rank_e8": scale_col(rank, float(PR_SCALE))})


def sql_pagerank_weighted(n_iters: int = PR_ITERS,
                          damping: float = PR_DAMPING) -> str:
    from igpm_pem_ray.pipelines.common import PAIRS_MULTI_SQL

    d = repr(damping)
    parts = [
        "ew AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w "
        "FROM pairs GROUP BY src, dst)",
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM ew "
        "UNION ALL SELECT dst AS vid FROM ew) u)",
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "outdeg AS (SELECT src AS vid, sum(w) AS od FROM ew GROUP BY src)",
        "r0 AS (SELECT vid, 1.0/(SELECT n FROM nv) AS rank FROM verts)",
    ]
    for k in range(1, n_iters + 1):
        p = f"r{k - 1}"
        parts.append(
            f"dang{k} AS (SELECT COALESCE(sum(r.rank), 0.0) AS mass "
            f"FROM {p} r LEFT JOIN outdeg o ON r.vid = o.vid "
            f"WHERE o.vid IS NULL), "
            f"msg{k} AS (SELECT e.dst AS vid, "
            f"sum(r.rank * e.w / o.od) AS s "
            f"FROM ew e JOIN {p} r ON e.src = r.vid "
            f"JOIN outdeg o ON o.vid = e.src GROUP BY e.dst), "
            f"r{k} AS (SELECT v.vid, (1.0 - {d})/(SELECT n FROM nv) "
            f"+ {d} * (COALESCE(m.s, 0.0) "
            f"+ (SELECT mass FROM dang{k})/(SELECT n FROM nv)) AS rank "
            f"FROM verts v LEFT JOIN msg{k} m ON v.vid = m.vid)")
    body = ", ".join(parts)
    return (f"WITH pairs AS ({PAIRS_MULTI_SQL}), {body} "
            f"SELECT vid, {sql_scale('rank', PR_SCALE)} AS rank_e8 "
            f"FROM r{n_iters} ORDER BY vid")


# ---------- modularity of the LP partition ----------

def q_modularity(sf_dir: str) -> pa.Table:
    """Per-community modularity sufficient statistics of the
    LP_ROUNDS-round label-propagation partition on the undirected
    co-occurrence graph: (community, n_intra, deg_sum, q_e9) where
    q = n_intra/m - (deg_sum/2m)^2 (Newman-Girvan per-community
    term; global Q = sum).  Counts are exact int64; q_e9 is ONE fixed
    float64 expression per row, identical in both engines.  Plan: one
    broadcast vid->label lookup (ray.put, the small-side pattern)
    inside map_batches over the edge table, per-block partial
    (label, intra, deg) counts, one O(communities) groupby."""
    import ray as _ray
    from ray.data.aggregate import Sum as _Sum

    edges = cooccurrence_edges(sf_dir).materialize()
    m = edges.count()
    lab_t = lp_mod.label_propagation(edges, max_rounds=LP_ROUNDS)
    vids = lab_t["vid"].to_numpy()
    labels = lab_t["label"].to_numpy()
    lab_ref = _ray.put((vids, labels))

    def partials(b: pa.Table) -> pa.Table:
        vv, ll = _ray.get(lab_ref)
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        ls = ll[np.searchsorted(vv, s)]
        ld = ll[np.searchsorted(vv, d)]
        intra_lab, intra_n = np.unique(ls[ls == ld], return_counts=True)
        deg_lab, deg_n = np.unique(np.concatenate([ls, ld]),
                                   return_counts=True)
        lab = np.concatenate([intra_lab, deg_lab])
        return pa.table({
            "community": lab.astype(np.int64),
            "n_intra": np.concatenate(
                [intra_n, np.zeros(len(deg_lab))]).astype(np.int64),
            "deg_sum": np.concatenate(
                [np.zeros(len(intra_lab)), deg_n]).astype(np.int64)})

    agg = edges.map_batches(partials, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("community") \
        .aggregate(_Sum("n_intra", alias_name="n_intra"),
                   _Sum("deg_sum", alias_name="deg_sum"))
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    i = t["n_intra"].to_numpy().astype(np.float64)
    dg = t["deg_sum"].to_numpy().astype(np.float64)
    half = dg / (2.0 * m)
    q = i / m - half * half
    out = pa.table({"community": t["community"].cast(pa.int64()),
                    "n_intra": t["n_intra"].cast(pa.int64()),
                    "deg_sum": t["deg_sum"].cast(pa.int64()),
                    "q_e9": np.floor(q * 1e9 + 0.5).astype(np.int64)})
    return out.sort_by([("community", "ascending")])


def sql_modularity(rounds: int = LP_ROUNDS) -> str:
    parts = _lp_parts(rounds)
    parts.append(
        f"lab AS (SELECT vid, label FROM lp{rounds}), "
        "mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM edges), "
        "intra AS (SELECT la.label AS community, count(*) AS n_intra "
        "FROM edges e JOIN lab la ON la.vid = e.src "
        "JOIN lab lb ON lb.vid = e.dst WHERE la.label = lb.label "
        "GROUP BY la.label), "
        "deg AS (SELECT src AS vid, count(*) AS degree FROM ue "
        "GROUP BY src), "
        "dsum AS (SELECT l.label AS community, sum(d.degree) AS deg_sum "
        "FROM deg d JOIN lab l ON l.vid = d.vid GROUP BY l.label)")
    body = ", ".join(parts)
    return _with_edges(
        f"{body} "
        "SELECT d.community, CAST(COALESCE(i.n_intra, 0) AS BIGINT) "
        "AS n_intra, CAST(d.deg_sum AS BIGINT) AS deg_sum, "
        "CAST(floor((CAST(COALESCE(i.n_intra, 0) AS DOUBLE)/mm.m "
        "- (CAST(d.deg_sum AS DOUBLE)/(2.0*mm.m))"
        "*(CAST(d.deg_sum AS DOUBLE)/(2.0*mm.m)))*1e9 + 0.5) AS BIGINT) "
        "AS q_e9 "
        "FROM dsum d LEFT JOIN intra i ON i.community = d.community, mm "
        "ORDER BY d.community")


# ---------- Louvain-style greedy modularity (graph/louvain.py) ----------

LOUVAIN_ROUNDS = 2


def q_louvain(sf_dir: str) -> pa.Table:
    """Synchronous greedy-modularity communities (the reference's
    recursive-Louvain analog, incremental/query_call.py:130-177) on
    the undirected co-occurrence graph, LOUVAIN_ROUNDS fixed rounds.
    Integer-exact scores 2m*k - deg*(tot - [stay]*deg), ties to the
    smallest community — identical convention in sql_louvain, so the
    assignment is hash-verified bit for bit."""
    from igpm_pem_ray.graph import louvain as louv_mod

    t = louv_mod.louvain_communities(cooccurrence_edges(sf_dir),
                                     max_rounds=LOUVAIN_ROUNDS)
    return t.sort_by([("vid", "ascending")])


def sql_louvain(rounds: int = LOUVAIN_ROUNDS) -> str:
    parts = [
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges "
        "UNION ALL SELECT dst AS src, src AS dst FROM edges) u)",
        "deg AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS d "
        "FROM ue GROUP BY src)",
        "m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM ue)",
        "cm0 AS (SELECT vid, vid AS c FROM deg)",
    ]
    for k in range(1, rounds + 1):
        p = f"cm{k - 1}"
        parts.append(
            f"tot{k} AS (SELECT p.c, SUM(d.d) AS tot FROM {p} p "
            f"JOIN deg d ON p.vid = d.vid GROUP BY p.c), "
            # neighbor-community counts k_{v,c} plus the own-community
            # stay row at k=0 (duplicates never win: m2 > 0 makes the
            # genuine count row strictly better — same in the kernel)
            f"kc{k} AS (SELECT e.src AS vid, l.c AS c, "
            f"CAST(count(*) AS BIGINT) AS kc FROM ue e "
            f"JOIN {p} l ON e.dst = l.vid GROUP BY e.src, l.c), "
            f"cand{k} AS (SELECT vid, c, kc FROM kc{k} UNION ALL "
            f"SELECT vid, c, CAST(0 AS BIGINT) FROM {p}), "
            f"sc{k} AS (SELECT a.vid, a.c, m2.m2 * a.kc - d.d * (t.tot - "
            f"CASE WHEN p.c = a.c THEN d.d ELSE 0 END) AS s "
            f"FROM cand{k} a JOIN deg d ON a.vid = d.vid "
            f"JOIN {p} p ON a.vid = p.vid "
            f"JOIN tot{k} t ON a.c = t.c CROSS JOIN m2), "
            f"cm{k} AS (SELECT vid, c FROM (SELECT vid, c, "
            f"row_number() OVER (PARTITION BY vid ORDER BY s DESC, c ASC) "
            f"AS rn FROM sc{k}) WHERE rn = 1)"
        )
    body = ", ".join(parts)
    return _with_edges(
        f"{body} SELECT vid, c AS community FROM cm{rounds} ORDER BY vid")


# ---------- betweenness centrality (graph/betweenness.py) ----------

def q_betweenness_k2(sf_dir: str) -> pa.Table:
    """Distance-2-bounded Brandes betweenness on the thinned
    undirected graph: with the BFS capped at depth 2 the only
    dependency terms are (s, v, t) with dist(s,v)=dist(v,t)=1 and
    dist(s,t)=2 — exactly the SQL triple join below, so the kernel's
    forward/backward exchanges are hash-verified end to end."""
    from igpm_pem_ray.graph import betweenness as bc_mod

    t = bc_mod.betweenness(thinned_edges(sf_dir), max_depth=2)
    return t.sort_by([("vid", "ascending")])


def sql_betweenness_k2() -> str:
    return _with_edges(
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0), "
        "ue AS (SELECT src AS x, dst AS y FROM kept "
        "UNION ALL SELECT dst AS x, src AS y FROM kept), "
        "verts AS (SELECT DISTINCT x AS vid FROM ue), "
        "w1 AS (SELECT x AS a, y AS b, 1.0 AS sigma FROM ue), "
        "w2r AS (SELECT w.a, e.y AS b, sum(w.sigma) AS sigma "
        "FROM w1 w JOIN ue e ON e.x = w.b WHERE e.y <> w.a "
        "GROUP BY w.a, e.y), "
        "p2 AS (SELECT w2r.a, w2r.b, w2r.sigma FROM w2r "
        "LEFT JOIN w1 ON w1.a = w2r.a AND w1.b = w2r.b "
        "WHERE w1.a IS NULL), "
        "dep AS (SELECT s.b AS vid, "
        "sum(s.sigma * t.sigma / p.sigma) AS bc "
        "FROM w1 s JOIN w1 t ON t.a = s.b AND t.b <> s.a "
        "JOIN p2 p ON p.a = s.a AND p.b = t.b "
        "GROUP BY s.b) "
        "SELECT v.vid, CAST(floor(COALESCE(d.bc, 0.0)*0.5*1e6 + 0.5) "
        "AS BIGINT) AS betweenness_e6 "
        "FROM verts v LEFT JOIN dep d ON d.vid = v.vid ORDER BY v.vid")


def q_betweenness_k2_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident Brandes betweenness
    (shuffle_kernels.betweenness_shuffle) at depth 2, all sources —
    the 10^12-V sibling of q_betweenness_k2.  Integer end to end
    (int64 sigma; BC_Q fixed-point dependency with explicit floor
    division), so the SQL oracle below reproduces it bit for bit —
    unlike the dense kernel's float64 sums, whose SQL agreement is
    empirical."""
    from igpm_pem_ray.graph.shuffle_kernels import betweenness_shuffle

    t = betweenness_shuffle(thinned_edges(sf_dir), max_depth=2) \
        .sort("vid").to_pandas()
    return pa.Table.from_pandas(t, preserve_index=False)


def sql_betweenness_k2_shuffle() -> str:
    from igpm_pem_ray.graph.shuffle_kernels import BC_Q

    return _with_edges(
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0), "
        "ue AS (SELECT src AS x, dst AS y FROM kept "
        "UNION ALL SELECT dst AS x, src AS y FROM kept), "
        "verts AS (SELECT DISTINCT x AS vid FROM ue), "
        "w1 AS (SELECT x AS a, y AS b, CAST(1 AS BIGINT) AS sigma "
        "FROM ue), "
        "w2r AS (SELECT w.a, e.y AS b, sum(w.sigma) AS sigma "
        "FROM w1 w JOIN ue e ON e.x = w.b WHERE e.y <> w.a "
        "GROUP BY w.a, e.y), "
        "p2 AS (SELECT w2r.a, w2r.b, w2r.sigma FROM w2r "
        "LEFT JOIN w1 ON w1.a = w2r.a AND w1.b = w2r.b "
        "WHERE w1.a IS NULL), "
        # dep_q(v) = sum over (source a, dist-2 target b adjacent to
        # v) of BC_Q // sigma(a,b) — the kernel's backward recurrence
        # unrolled at depth 2 (delta_q of dist-2 rows is 0)
        "dep AS (SELECT s.b AS vid, "
        f"sum({BC_Q} // p.sigma) AS q "
        "FROM w1 s JOIN w1 t ON t.a = s.b AND t.b <> s.a "
        "JOIN p2 p ON p.a = s.a AND p.b = t.b "
        "GROUP BY s.b) "
        "SELECT v.vid, CAST((COALESCE(d.q, 0) + 1000000) // 2000000 "
        "AS BIGINT) AS betweenness_e6 "
        "FROM verts v LEFT JOIN dep d ON d.vid = v.vid ORDER BY v.vid")


def q_betweenness_sampled(sf_dir: str) -> pa.Table:
    """Full-depth Brandes from every 4th vertex of the sorted domain
    (Brandes-Pich sampling, V/|S| extrapolation) — rows-only; the
    exact kernel is pinned to a pure-Python Brandes oracle in
    tests/test_kernels.py."""
    from igpm_pem_ray.graph import betweenness as bc_mod

    t = bc_mod.betweenness(thinned_edges(sf_dir), sample_every=4)
    return t.sort_by([("vid", "ascending")])


# ---------- Luby MIS (graph/mis.py) ----------

MIS_ROUNDS = 3


def q_mis(sf_dir: str) -> pa.Table:
    """First MIS_ROUNDS Luby rounds on the thinned undirected graph —
    intermediate (vid, state 0/1/2), bit-identical to the unrolled
    SQL oracle; run-to-convergence behavior (independence +
    maximality) is pinned in tests/test_kernels.py."""
    from igpm_pem_ray.graph import mis as mis_mod

    t = mis_mod.maximal_independent_set(thinned_edges(sf_dir),
                                        max_rounds=MIS_ROUNDS)
    return t.sort_by([("vid", "ascending")])


def sql_mis(rounds: int = MIS_ROUNDS) -> str:
    parts = [
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0)",
        "ue AS (SELECT src AS x, dst AS y FROM kept "
        "UNION ALL SELECT dst AS x, src AS y FROM kept)",
        "verts AS (SELECT DISTINCT x AS vid FROM ue)",
        "rk AS (SELECT vid, row_number() OVER (ORDER BY vid) - 1 AS r "
        "FROM verts)",
        "st0 AS (SELECT vid, 0 AS state FROM verts)",
    ]
    for k in range(1, rounds + 1):
        p = f"st{k - 1}"
        parts.append(
            f"pri{k} AS (SELECT vid, "
            f"(((vid % 2147483647)*1103515245 + {k}*12345) % 2147483647)"
            f" * 2147483648 + r AS p FROM rk), "
            f"nb{k} AS (SELECT e.x AS vid, "
            f"max(CASE WHEN s.state = 0 THEN p.p ELSE -1 END) AS mp "
            f"FROM ue e JOIN {p} s ON s.vid = e.y "
            f"JOIN pri{k} p ON p.vid = e.y GROUP BY e.x), "
            f"new{k} AS (SELECT s.vid FROM {p} s "
            f"JOIN pri{k} q ON q.vid = s.vid "
            f"LEFT JOIN nb{k} n ON n.vid = s.vid "
            f"WHERE s.state = 0 AND q.p > COALESCE(n.mp, -1)), "
            f"exc{k} AS (SELECT DISTINCT e.x AS vid FROM ue e "
            f"JOIN new{k} j ON j.vid = e.y), "
            f"st{k} AS (SELECT s.vid, CASE WHEN s.state <> 0 THEN s.state "
            f"WHEN j.vid IS NOT NULL THEN 1 "
            f"WHEN x.vid IS NOT NULL THEN 2 ELSE 0 END AS state "
            f"FROM {p} s LEFT JOIN new{k} j ON j.vid = s.vid "
            f"LEFT JOIN exc{k} x ON x.vid = s.vid)")
    body = ", ".join(parts)
    return _with_edges(
        f"{body} SELECT vid, CAST(state AS BIGINT) AS state "
        f"FROM st{rounds} ORDER BY vid")


# ---------- symmetry-breaking shuffle family: driver checks ----------

def q_mis_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident Luby MIS (shuffle_kernels.mis_shuffle) at the
    same bounded rounds as q_mis — hash-verified against the SAME
    unrolled-CTE oracle, so the 10^12-V execution strategy itself is
    oracle-checked (round-4 verdict ask #3/#5 for the symmetry-
    breaking family)."""
    from igpm_pem_ray.graph.shuffle_kernels import mis_shuffle

    ds = mis_shuffle(thinned_edges(sf_dir), max_rounds=MIS_ROUNDS)
    pdf = ds.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype("int64"),
                     "state": pdf["state"].to_numpy().astype("int64")})


COLOR_CHECK_ROUNDS = 25


def q_coloring_check(sf_dir: str) -> pa.Table:
    """Jones-Plassmann ``coloring_shuffle`` validity summary — the
    SQL-expressible facts a correct greedy coloring must produce
    (round-4 verdict ask #5): the state vertex set is exactly the
    graph vertex set, NO edge joins two same-COLORED endpoints, and
    the palette fits the Brooks-style greedy bound (n_colors <=
    maxdeg + 1).  The oracle computes n_vertices from the edge table
    and pins the other two facts to their must-be constants — any
    improper edge or bound violation hash-mismatches.

    Rounds are BOUNDED (JP on clique-chained co-occurrence graphs
    needs ~200 rounds to the fixpoint — measured 209 at sf0.01;
    validity of the partial coloring is exactly as checkable, and
    full-fixpoint exactness vs the dense kernel is pinned by
    tests/test_kernels.py::test_coloring_shuffle_parity_vs_dense)."""
    from ray.data.aggregate import Count as _Count, Max as _Max

    from igpm_pem_ray.graph.shuffle_kernels import coloring_shuffle

    edges = cooccurrence_edges(sf_dir).materialize()
    state = coloring_shuffle(edges,
                             max_rounds=COLOR_CHECK_ROUNDS).materialize()
    n_vertices = state.count()
    cols = state.filter(expr="color >= 0").materialize()
    cs = cols.rename_columns({"vid": "sv", "color": "scol"})
    cd = cols.rename_columns({"vid": "dv", "color": "dcol"})
    npj = 1 if edges.count() < 65_536 else 8
    n_improper = int(edges.join(cs, join_type="inner",
                                num_partitions=npj,
                                on=("src",), right_on=("sv",))
                     .join(cd, join_type="inner", num_partitions=npj,
                           on=("dst",), right_on=("dv",))
                     .map_batches(lambda b: pa.table({
                         "bad": (b["scol"].to_numpy(zero_copy_only=False)
                                 == b["dcol"].to_numpy(
                                     zero_copy_only=False))
                         .astype(np.int64)}),
                         batch_format="pyarrow").sum("bad") or 0)
    n_colors = cols.groupby("color").aggregate(
        _Count(alias_name="_n")).count()
    deg = edges.map_batches(
        lambda b: pa.table({"v": np.concatenate(
            [b["src"].to_numpy(zero_copy_only=False),
             b["dst"].to_numpy(zero_copy_only=False)])}),
        batch_format="pyarrow").groupby("v").aggregate(
        _Count(alias_name="d"))
    maxdeg = int(deg.max("d"))
    return pa.table({
        "n_vertices": pa.array([n_vertices], pa.int64()),
        "n_improper": pa.array([n_improper], pa.int64()),
        "within_bound": pa.array([1 if n_colors <= maxdeg + 1 else 0],
                                 pa.int64())})


def sql_coloring_check() -> str:
    return _with_edges(
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM "
        "edges WHERE src <> dst UNION ALL SELECT dst, src FROM edges "
        "WHERE src <> dst) u), "
        "verts AS (SELECT src AS vid FROM ue GROUP BY src) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM verts) "
        "AS n_vertices, CAST(0 AS BIGINT) AS n_improper, "
        "CAST(1 AS BIGINT) AS within_bound")


def q_msf_check(sf_dir: str) -> pa.Table:
    """Structural validity of the Dataset-resident Boruvka forest
    (round-4 verdict ask #5 for the ``no_oracle`` MSF rows): a
    spanning forest of the thinned graph has EXACTLY V - C edges
    (C = component count, SQL recursive closure) and every forest
    edge must exist in the graph edge set (n_foreign = 0 via
    anti-join).  Total weight stays pytest-pinned (Kruskal oracle) —
    SQL cannot compute an MSF, but it can refute a forest of the
    wrong size or with an invented edge."""
    from igpm_pem_ray.graph.shuffle_kernels import msf_shuffle

    edges = thinned_edges(sf_dir).materialize()
    forest = msf_shuffle(edges).materialize()
    n_edges = forest.count()
    npj = 1 if edges.count() < 65_536 else 8
    n_foreign = forest.select_columns(["src", "dst"]).join(
        edges.select_columns(["src", "dst"])
        .rename_columns({"src": "es", "dst": "ed"}),
        join_type="left_anti", num_partitions=npj,
        on=("src", "dst"), right_on=("es", "ed")).count()
    return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                     "n_foreign": pa.array([n_foreign], pa.int64())})


def sql_msf_check() -> str:
    return _with_edges(
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0), "
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM "
        "kept UNION ALL SELECT dst, src FROM kept) u), "
        "verts AS (SELECT src AS vid FROM ue GROUP BY src), "
        "reach(a, b) AS (SELECT vid, vid FROM verts "
        "UNION SELECT r.a, e.dst FROM reach r JOIN ue e ON r.b = e.src), "
        "comp AS (SELECT a AS vid, MIN(b) AS component FROM reach "
        "GROUP BY a) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM verts) - "
        "(SELECT CAST(count(DISTINCT component) AS BIGINT) FROM comp) "
        "AS n_edges, CAST(0 AS BIGINT) AS n_foreign")


# ---------- DAG layering (graph/dag.py) ----------

def q_dag_layers(sf_dir: str) -> pa.Table:
    """Longest-path topological layer per vertex of the thinned
    canonical (src<dst, hence acyclic) co-occurrence DAG —
    msg_pass(max) to fixpoint with built-in cycle detection."""
    from igpm_pem_ray.graph import dag as dag_mod

    t = dag_mod.topological_layers(thinned_edges(sf_dir))
    return t.sort_by([("vid", "ascending")])


def sql_dag_layers() -> str:
    return _with_edges(
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0), "
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM kept "
        "UNION ALL SELECT dst AS vid FROM kept) u), "
        "lv(v, d) AS (SELECT vid, 0 FROM verts "
        "UNION SELECT e.dst, lv.d + 1 FROM lv JOIN kept e ON e.src = lv.v) "
        "SELECT v AS vid, CAST(max(d) AS BIGINT) AS layer FROM lv "
        "GROUP BY v ORDER BY vid")


# ---------- rich-club coefficient ----------

RICH_CLUB_KS = [4, 8, 16]


def q_rich_club(sf_dir: str) -> pa.Table:
    """Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) on the
    undirected co-occurrence graph for fixed degree thresholds:
    N_k = vertices with degree > k, E_k = edges inside that club.
    Exact int64 counts + one float ratio per row (e6).  Plan: one
    degree groupby, broadcast rich-vertex set (np.isin inside
    map_batches), per-block edge partials."""
    import ray as _ray

    edges = cooccurrence_edges(sf_dir).materialize()
    deg_t = deg_mod.degree_distribution  # noqa: F841 (doc pointer)
    from ray.data.aggregate import Count

    def both(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": np.concatenate([s, d])})

    deg = edges.map_batches(both, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("vid").aggregate(Count(alias_name="degree")).to_pandas()
    vids = deg["vid"].to_numpy().astype(np.int64)
    dd = deg["degree"].to_numpy().astype(np.int64)

    rows = []
    for k in RICH_CLUB_KS:
        club = np.sort(vids[dd > k])
        club_ref = _ray.put(club)

        def inside(b: pa.Table, _ref=club_ref) -> pa.Table:
            cl = _ray.get(_ref)
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            n = int((np.isin(s, cl) & np.isin(d, cl)).sum())
            return pa.table({"n": pa.array([n], pa.int64())})

        e_k = int(edges.map_batches(inside, batch_format="pyarrow",
                                    zero_copy_batch=True)
                  .sum("n") or 0)
        n_k = int(len(club))
        phi = e_k * 2.0 / (n_k * (n_k - 1.0)) if n_k >= 2 else 0.0
        rows.append((k, n_k, e_k,
                     int(np.floor(phi * 1e6 + 0.5))))
    return pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "n_club": pa.array([r[1] for r in rows], pa.int64()),
        "e_club": pa.array([r[2] for r in rows], pa.int64()),
        "phi_e6": pa.array([r[3] for r in rows], pa.int64())})


def sql_rich_club() -> str:
    selects = []
    for k in RICH_CLUB_KS:
        selects.append(
            f"SELECT {k} AS k, "
            f"(SELECT count(*) FROM deg WHERE degree > {k}) AS n_club, "
            f"(SELECT count(*) FROM edges e "
            f"JOIN deg a ON a.vid = e.src AND a.degree > {k} "
            f"JOIN deg b ON b.vid = e.dst AND b.degree > {k}) AS e_club")
    body = " UNION ALL ".join(selects)
    return _with_edges(
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges "
        "UNION ALL SELECT dst AS src, src AS dst FROM edges) u), "
        "deg AS (SELECT src AS vid, count(*) AS degree FROM ue "
        "GROUP BY src) "
        f"SELECT CAST(k AS BIGINT) AS k, CAST(n_club AS BIGINT) AS n_club, "
        f"CAST(e_club AS BIGINT) AS e_club, "
        f"CAST(CASE WHEN n_club >= 2 THEN "
        f"floor(e_club*2.0/(n_club*(n_club-1.0))*1e6 + 0.5) "
        f"ELSE 0 END AS BIGINT) AS phi_e6 FROM ({body}) ORDER BY k")


# ---------- topic-sensitive (personalized) PageRank ----------

def q_pagerank_topic(sf_dir: str) -> pa.Table:
    """Topic-sensitive PageRank (Haveliwala, WWW 2002): restart mass
    concentrated on the seed set {vid % 10 == 0} instead of uniform —
    the same dense kernel with a personalized p0 (the multi-seed
    generalization of the reference's per-seed RWR vectors,
    rwr.py:183-190).  Fixed PR_ITERS iterations, e8 fixed-point."""
    edges = cooccurrence_edges(sf_dir)
    g = build_dense_graph(edges)
    seeds = g.vids % 10 == 0
    ns = int(seeds.sum())
    p0 = np.where(seeds, 1.0 / ns, 0.0)
    rank = pr_mod.pagerank_dense(g, damping=PR_DAMPING, tol=0.0,
                                 max_iters=PR_ITERS, p0=p0)
    return pa.table({"vid": g.vids,
                     "rank_e8": scale_col(rank, float(PR_SCALE))})


def sql_pagerank_topic(n_iters: int = PR_ITERS,
                       damping: float = PR_DAMPING) -> str:
    d = repr(damping)
    parts = [
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM edges "
        "UNION ALL SELECT dst AS vid FROM edges) u)",
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts "
        "WHERE vid % 10 = 0)",
        "outdeg AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS od "
        "FROM edges GROUP BY src)",
        "p0 AS (SELECT vid, CASE WHEN vid % 10 = 0 "
        "THEN 1.0/(SELECT n FROM ns) ELSE 0.0 END AS p FROM verts)",
        "r0 AS (SELECT vid, p AS rank FROM p0)",
    ]
    for k in range(1, n_iters + 1):
        p = f"r{k - 1}"
        parts.append(
            f"dang{k} AS (SELECT COALESCE(sum(r.rank), 0.0) AS mass "
            f"FROM {p} r LEFT JOIN outdeg o ON r.vid = o.vid "
            f"WHERE o.vid IS NULL), "
            f"msg{k} AS (SELECT e.dst AS vid, sum(r.rank / o.od) AS s "
            f"FROM edges e JOIN {p} r ON e.src = r.vid "
            f"JOIN outdeg o ON o.vid = e.src GROUP BY e.dst), "
            f"r{k} AS (SELECT v.vid, (1.0 - {d}) * p0.p + {d} * "
            f"(COALESCE(m.s, 0.0) "
            f"+ (SELECT mass FROM dang{k})/(SELECT n FROM nv)) AS rank "
            f"FROM verts v JOIN p0 ON p0.vid = v.vid "
            f"LEFT JOIN msg{k} m ON v.vid = m.vid)")
    body = ", ".join(parts)
    return _with_edges(
        f"{body} SELECT vid, {sql_scale('rank', PR_SCALE)} AS rank_e8 "
        f"FROM r{n_iters} ORDER BY vid")


SPAM_MASS_THRESHOLD_E6 = 500_000  # spam if more than half the rank is untrusted


def q_spam_mass(sf_dir: str) -> pa.Table:
    """Spam mass (Gyongyi, Garcia-Molina & Pedersen, VLDB 2006 /
    TrustRank WWW 2004): the fraction of a page's PageRank NOT
    explained by trust flowing from a whitelisted seed set —
    sm = (PR - TR)/PR with TR the seed-personalized PageRank.  The
    canonical link-spam detector on web link graphs.  Trusted seeds
    here are the deterministic {vid % 10 == 0} stand-in shared with
    `pagerank_topic` (a real deployment plugs in the vetted host
    whitelist).  Both recurrences are the proven fixed-iteration
    dense kernels; the combine is integer floor-division e6
    fixed-point, identical in SQL, and pages with sm_e6 >=
    SPAM_MASS_THRESHOLD_E6 carry is_spam = 1."""
    edges = cooccurrence_edges(sf_dir)
    g = build_dense_graph(edges)
    pr = pr_mod.pagerank_dense(g, damping=PR_DAMPING, tol=0.0,
                               max_iters=PR_ITERS)
    seeds = g.vids % 10 == 0
    ns = int(seeds.sum())
    p0 = np.where(seeds, 1.0 / ns, 0.0)
    tr = pr_mod.pagerank_dense(g, damping=PR_DAMPING, tol=0.0,
                               max_iters=PR_ITERS, p0=p0)
    pr_e8 = np.asarray(scale_col(pr, float(PR_SCALE)), dtype=np.int64)
    tr_e8 = np.asarray(scale_col(tr, float(PR_SCALE)), dtype=np.int64)
    # TRUNCATING division (DuckDB's BIGINT // truncates toward zero;
    # numpy's // floors — they differ on the negative sm of trusted
    # pages, measured off-by-one at sf0.001): teleport => pr_e8 > 0
    q = (pr_e8 - tr_e8) * 1_000_000
    sm_e6 = np.where(q >= 0, q // pr_e8, -((-q) // pr_e8))
    return pa.table({"vid": g.vids,
                     "pr_e8": pa.array(pr_e8, pa.int64()),
                     "tr_e8": pa.array(tr_e8, pa.int64()),
                     "sm_e6": pa.array(sm_e6, pa.int64()),
                     "is_spam": pa.array(
                         (sm_e6 >= SPAM_MASS_THRESHOLD_E6).astype(np.int64),
                         pa.int64())})


def sql_spam_mass(n_iters: int = PR_ITERS, damping: float = PR_DAMPING) -> str:
    d = repr(damping)
    parts = [
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM edges "
        "UNION ALL SELECT dst AS vid FROM edges) u)",
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts "
        "WHERE vid % 10 = 0)",
        "outdeg AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS od "
        "FROM edges GROUP BY src)",
        "p0 AS (SELECT vid, CASE WHEN vid % 10 = 0 "
        "THEN 1.0/(SELECT n FROM ns) ELSE 0.0 END AS p FROM verts)",
        "a0 AS (SELECT vid, 1.0/(SELECT n FROM nv) AS rank FROM verts)",
        "b0 AS (SELECT vid, p AS rank FROM p0)",
    ]
    for k in range(1, n_iters + 1):
        pa_, pb = f"a{k - 1}", f"b{k - 1}"
        parts.append(
            f"da{k} AS (SELECT COALESCE(sum(r.rank), 0.0) AS mass "
            f"FROM {pa_} r LEFT JOIN outdeg o ON r.vid = o.vid "
            f"WHERE o.vid IS NULL), "
            f"ma{k} AS (SELECT e.dst AS vid, sum(r.rank / o.od) AS s "
            f"FROM edges e JOIN {pa_} r ON e.src = r.vid "
            f"JOIN outdeg o ON o.vid = e.src GROUP BY e.dst), "
            f"a{k} AS (SELECT v.vid, (1.0 - {d})/(SELECT n FROM nv) + {d} * "
            f"(COALESCE(m.s, 0.0) + (SELECT mass FROM da{k})/(SELECT n FROM nv)) "
            f"AS rank FROM verts v LEFT JOIN ma{k} m ON v.vid = m.vid), "
            f"db{k} AS (SELECT COALESCE(sum(r.rank), 0.0) AS mass "
            f"FROM {pb} r LEFT JOIN outdeg o ON r.vid = o.vid "
            f"WHERE o.vid IS NULL), "
            f"mb{k} AS (SELECT e.dst AS vid, sum(r.rank / o.od) AS s "
            f"FROM edges e JOIN {pb} r ON e.src = r.vid "
            f"JOIN outdeg o ON o.vid = e.src GROUP BY e.dst), "
            f"b{k} AS (SELECT v.vid, (1.0 - {d}) * p0.p + {d} * "
            f"(COALESCE(m.s, 0.0) + (SELECT mass FROM db{k})/(SELECT n FROM nv)) "
            f"AS rank FROM verts v JOIN p0 ON p0.vid = v.vid "
            f"LEFT JOIN mb{k} m ON v.vid = m.vid)")
    body = ", ".join(parts)
    return _with_edges(
        f"{body}, fin AS (SELECT a.vid, "
        f"{sql_scale('a.rank', PR_SCALE)} AS pr_e8, "
        f"{sql_scale('b.rank', PR_SCALE)} AS tr_e8 "
        f"FROM a{n_iters} a JOIN b{n_iters} b ON a.vid = b.vid) "
        "SELECT vid, pr_e8, tr_e8, "
        "((pr_e8 - tr_e8) * 1000000) // pr_e8 AS sm_e6, "
        "CAST(CASE WHEN ((pr_e8 - tr_e8) * 1000000) // pr_e8 >= "
        f"{SPAM_MASS_THRESHOLD_E6} THEN 1 ELSE 0 END AS BIGINT) AS is_spam "
        "FROM fin ORDER BY vid")


def q_ktruss(sf_dir: str) -> pa.Table:
    """Truss number per edge of the thinned co-occurrence graph —
    rows-only (iterated peeling is not SQL-expressible, mirroring
    `kcore`); the kernel is pinned to a set-based peeling oracle in
    tests/test_kernels.py."""
    from igpm_pem_ray.graph import ktruss as ktruss_mod

    t = ktruss_mod.truss_numbers(thinned_edges(sf_dir))
    return t.sort_by([("src", "ascending"), ("dst", "ascending")])


def q_truss_shuffle(sf_dir: str):
    """FULL k-truss decomposition with the edge table Dataset-resident
    end to end (`ktruss.truss_decompose_shuffle` — the unbounded-E
    path the round-4 verdict asked for).  Identical (src, dst, truss)
    table to q_ktruss by construction; rows-only (iterated peeling is
    not SQL-expressible), pinned by
    tests/test_kernels.py::test_truss_decompose_shuffle_parity."""
    from igpm_pem_ray.graph.ktruss import truss_decompose_shuffle

    return truss_decompose_shuffle(thinned_edges(sf_dir)) \
        .sort(["src", "dst"])


TRUSS_PEEL_ROUNDS = 3


def q_truss_peel(sf_dir: str) -> pa.Table:
    """Bounded 3-truss peel (exactly <= TRUSS_PEEL_ROUNDS support-
    filter rounds) over the thinned graph — bounding the rounds makes
    the iterative edge deletion SQL-expressible (one unrolled
    common-neighbor-count CTE per round, the edge analog of
    sql_kcore_peel), giving the truss family an exact hash-checked
    driver entry alongside the rows-only full decomposition.  Ray
    side is the Dataset-resident `ktruss_membership` at the same
    round cap; past the fixpoint extra rounds are the identity, so
    converged-early and bounded runs agree by construction."""
    from igpm_pem_ray.graph.ktruss import ktruss_membership

    keep = ktruss_membership(thinned_edges(sf_dir), 3,
                             max_rounds=TRUSS_PEEL_ROUNDS)
    pdf = keep.to_pandas().sort_values(["src", "dst"])
    return pa.table({"src": pdf["src"].to_numpy().astype("int64"),
                     "dst": pdf["dst"].to_numpy().astype("int64")})


def sql_truss_peel(rounds: int = TRUSS_PEEL_ROUNDS) -> str:
    parts = [
        "e0 AS (SELECT DISTINCT src, dst FROM edges "
        "WHERE (src*31+dst*17)%9=0 AND src <> dst)",
    ]
    for i in range(1, rounds + 1):
        p = f"e{i - 1}"
        parts.append(
            f"u{i} AS (SELECT src AS a, dst AS b FROM {p} "
            f"UNION ALL SELECT dst, src FROM {p}), "
            f"t{i} AS (SELECT e.src, e.dst, count(*) AS sup FROM {p} e "
            f"JOIN u{i} x ON x.a = e.src "
            f"JOIN u{i} y ON y.a = e.dst AND y.b = x.b "
            "GROUP BY e.src, e.dst), "
            f"e{i} AS (SELECT e.src, e.dst FROM {p} e "
            f"JOIN t{i} t ON t.src = e.src AND t.dst = e.dst "
            "WHERE t.sup >= 1)")
    return _with_edges(
        ", ".join(parts) +
        f" SELECT src, dst FROM e{rounds} ORDER BY src, dst")


def q_ktruss_members(sf_dir: str) -> pa.Table:
    """Dataset-resident 3-truss membership (the unbounded-E alternate
    to q_ktruss, `ktruss.ktruss_membership`) — rows-only; pinned to
    truss_numbers-filtered-at-k parity in tests/test_kernels.py."""
    from igpm_pem_ray.graph import ktruss as ktruss_mod

    mem = ktruss_mod.ktruss_membership(thinned_edges(sf_dir), 3)
    pdf = mem.to_pandas()
    if len(pdf) == 0:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64())})
    pdf = pdf.sort_values(["src", "dst"]).reset_index(drop=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


# ---------- eccentricity + bow-tie ----------

def q_eccentricity(sf_dir: str) -> pa.Table:
    """Depth-capped eccentricity on the thinned undirected graph
    (same bit-parallel sweep as distance_hist/harmonic)."""
    from igpm_pem_ray.graph import distance as dist_mod

    t = dist_mod.eccentricity(thinned_edges(sf_dir),
                              max_depth=DIST_MAX_DEPTH)
    return t.sort_by([("vid", "ascending")])


def sql_eccentricity() -> str:
    return _with_edges(
        _THINNED_UE_SQL + " "
        "SELECT b AS vid, CAST(MAX(d) AS BIGINT) AS ecc FROM md "
        "GROUP BY b ORDER BY vid")


def q_bowtie(sf_dir: str) -> pa.Table:
    """Bow-tie decomposition (Broder WWW'00) of the parity-oriented
    co-occurrence digraph: CORE/IN/OUT/OTHER relative to the giant
    SCC (graph/bowtie.py — one SCC run + two indicator reachability
    fixpoints over the pinned partitions)."""
    from igpm_pem_ray.graph import bowtie as bt_mod

    t = bt_mod.bowtie(oriented_edges(sf_dir))
    return t.sort_by([("vid", "ascending")])


def sql_bowtie() -> str:
    return _with_edges(
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0), "
        "oriented AS (SELECT CASE WHEN (src+dst)%2=0 THEN src ELSE dst END "
        "AS src, CASE WHEN (src+dst)%2=0 THEN dst ELSE src END AS dst "
        "FROM kept), "
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM "
        "oriented UNION ALL SELECT dst AS vid FROM oriented) u), "
        "reach(a, b) AS (SELECT vid, vid FROM verts "
        "UNION SELECT r.a, e.dst FROM reach r JOIN oriented e "
        "ON r.b = e.src), "
        "mutual AS (SELECT r1.a AS v, r1.b AS u FROM reach r1 "
        "JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a), "
        "sccs AS (SELECT v AS vid, MIN(u) AS scc FROM mutual GROUP BY v), "
        "core AS (SELECT scc FROM (SELECT scc, count(*) AS c FROM sccs "
        "GROUP BY scc ORDER BY c DESC, scc ASC LIMIT 1)), "
        "members AS (SELECT vid FROM sccs WHERE scc = (SELECT scc "
        "FROM core)), "
        "ins AS (SELECT DISTINCT r.a AS vid FROM reach r "
        "JOIN members m ON r.b = m.vid), "
        "outs AS (SELECT DISTINCT r.b AS vid FROM reach r "
        "JOIN members m ON r.a = m.vid) "
        "SELECT s.vid, CAST(CASE WHEN s.scc = (SELECT scc FROM core) "
        "THEN 0 WHEN i.vid IS NOT NULL THEN 1 "
        "WHEN o.vid IS NOT NULL THEN 2 ELSE 3 END AS BIGINT) AS cls "
        "FROM sccs s LEFT JOIN ins i ON i.vid = s.vid "
        "LEFT JOIN outs o ON o.vid = s.vid ORDER BY s.vid")


# ---------- Katz centrality ----------

# alpha = 1/16: with a dyadic alpha the scaled recurrence
# z_k = A^T z_{k-1} + 16^k (z_0 = 1, x_k = z_k / 16^k) is PURE int64 —
# damped-walk counts, exact under ANY reduction order in any engine.
# A float alpha at e6/e8 fixed point flips half-up boundaries with
# ~1e-3 probability per row (observed: one vertex differed by 1
# between the dense and shuffle paths at e6).
KATZ_ALPHA_DEN = 16
KATZ_ITERS = 5


def q_katz(sf_dir: str) -> pa.Table:
    """Katz centrality (alpha = 1/16), KATZ_ITERS truncated
    iterations on the directed co-occurrence graph via the integer
    recurrence z <- A^T z + 16^k — one msg_pass(sum) per iteration on
    the dense substrate; ``katz_scaled`` = z_K = 16^K * x_K exact
    int64 (the caller divides by 16^K for the float score)."""
    from igpm_pem_ray.graph.dense import msg_pass as _mp

    edges = cooccurrence_edges(sf_dir)
    g = build_dense_graph(edges)
    z = np.ones(g.num_vertices, dtype=np.int64)
    for k in range(1, KATZ_ITERS + 1):
        z = _mp(g, z, reduce="sum", init=np.int64(0)) \
            + KATZ_ALPHA_DEN ** k
    return pa.table({"vid": g.vids, "katz_scaled": z})


def sql_katz(n_iters: int = KATZ_ITERS) -> str:
    parts = [
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM edges "
        "UNION ALL SELECT dst AS vid FROM edges) u)",
        "x0 AS (SELECT vid, CAST(1 AS BIGINT) AS x FROM verts)",
    ]
    for k in range(1, n_iters + 1):
        p = f"x{k - 1}"
        c = KATZ_ALPHA_DEN ** k
        parts.append(
            f"m{k} AS (SELECT e.dst AS vid, sum(r.x) AS s FROM edges e "
            f"JOIN {p} r ON e.src = r.vid GROUP BY e.dst), "
            f"x{k} AS (SELECT v.vid, CAST(COALESCE(m.s, 0) + {c} "
            f"AS BIGINT) AS x "
            f"FROM verts v LEFT JOIN m{k} m ON v.vid = m.vid)")
    body = ", ".join(parts)
    return _with_edges(
        f"{body} SELECT vid, x AS katz_scaled "
        f"FROM x{n_iters} ORDER BY vid")


def q_closeness(sf_dir: str) -> pa.Table:
    """Closeness sufficient statistics (n_reached, sum_d) within
    DIST_MAX_DEPTH on the thinned undirected graph — exact int64 from
    the same bit-parallel sweep."""
    from igpm_pem_ray.graph import distance as dist_mod

    t = dist_mod.closeness_stats(thinned_edges(sf_dir),
                                 max_depth=DIST_MAX_DEPTH)
    return t.sort_by([("vid", "ascending")])


def sql_closeness() -> str:
    return _with_edges(
        _THINNED_UE_SQL + " "
        "SELECT b AS vid, CAST(count(*) AS BIGINT) AS n_reached, "
        "CAST(SUM(d) AS BIGINT) AS sum_d FROM md "
        "GROUP BY b ORDER BY vid")


# ---------- partition-quality statistics ----------

PARTITION_P = 8


def q_partition_stats(sf_dir: str) -> pa.Table:
    """Quality metrics of the default hash partitioning (vid mod P)
    on the co-occurrence graph — the explicit-partitioning north-rule
    surface measured on itself: edge-cut count/ratio and per-
    partition load extremes.  Per-block vectorized partials, scalar
    merges."""
    from ray.data.aggregate import Sum as _Sum

    edges = cooccurrence_edges(sf_dir).materialize()
    P = PARTITION_P

    def partials(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        cut = int((s % P != d % P).sum())
        loads = np.bincount(s % P, minlength=P) \
            + np.bincount(d % P, minlength=P)
        return pa.table({"part": np.arange(P + 1, dtype=np.int64),
                         "load": np.r_[loads, 0].astype(np.int64),
                         "cut": np.r_[np.zeros(P, np.int64), cut]})

    agg = edges.map_batches(partials, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("part").aggregate(_Sum("load", alias_name="load"),
                                   _Sum("cut", alias_name="cut"))
    pdf = agg.to_pandas().sort_values("part")
    loads = pdf["load"].to_numpy()[:P].astype(np.int64)
    n_cut = int(pdf["cut"].to_numpy()[P])
    n_edges = int(loads.sum() // 2)
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_cut": pa.array([n_cut], pa.int64()),
        "cut_ratio_e6": pa.array(
            [int(np.floor(n_cut * 1e6 / max(n_edges, 1) + 0.5))],
            pa.int64()),
        "max_load": pa.array([int(loads.max())], pa.int64()),
        "min_load": pa.array([int(loads.min())], pa.int64())})


def sql_partition_stats() -> str:
    P = PARTITION_P
    return _with_edges(
        f"cut AS (SELECT count(*) AS n_edges, "
        f"sum(CASE WHEN src % {P} <> dst % {P} THEN 1 ELSE 0 END) "
        f"AS n_cut FROM edges), "
        f"ends AS (SELECT src % {P} AS p FROM edges "
        f"UNION ALL SELECT dst % {P} AS p FROM edges), "
        f"loads AS (SELECT p, count(*) AS c FROM ends GROUP BY p) "
        f"SELECT CAST(c.n_edges AS BIGINT) AS n_edges, "
        f"CAST(c.n_cut AS BIGINT) AS n_cut, "
        f"CAST(floor(c.n_cut*1e6/greatest(c.n_edges, 1)+0.5) AS BIGINT) "
        f"AS cut_ratio_e6, "
        f"CAST((SELECT max(cc) FROM (SELECT c AS cc FROM loads)) "
        f"AS BIGINT) AS max_load, "
        f"CAST((SELECT min(cc) FROM (SELECT c AS cc FROM loads)) "
        f"AS BIGINT) AS min_load FROM cut c")


# ---------- negative edge sampling (embedding-training prep) ----------

NEG_TRIES = 6
NEG_KEEP = 2


def q_negative_samples(sf_dir: str) -> pa.Table:
    """Deterministic negative sampling for link-prediction training:
    for every vertex of the thinned graph, NEG_TRIES affine-hash
    candidate partners (indexed into the sorted vertex array), real
    edges and self-pairs rejected, first NEG_KEEP survivors kept (in
    try order) — RNG-free, so the sample is reproducible across
    engines and epochs.  Vectorized: one broadcast vertex array +
    packed-edge membership searchsorted; per-vertex dedup of repeated
    candidates via a (v, cand) unique pass.  Scale shape: candidate
    generation fans out per vertex block against the broadcast arrays;
    the membership test is the scale constraint — at web scale swap
    the packed array for the Bloom-prefilter + hash-join verify
    (relational.q_bloom_semi_join's plan).  Here the thinned parity
    graph is small by construction, so the whole pass runs in one
    vectorized block."""
    edges = thinned_edges(sf_dir).materialize()
    pdf = edges.to_pandas()
    src = pdf["src"].to_numpy().astype(np.int64)
    dst = pdf["dst"].to_numpy().astype(np.int64)
    verts = np.unique(np.concatenate([src, dst]))
    V = len(verts)
    rank = {int(v): i for i, v in enumerate(verts)}
    # packed undirected edge set for membership tests
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    packed = np.sort((a.astype(np.int64) << 31) | b)

    rows_v, rows_c, rows_i = [], [], []
    ranks = np.arange(V, dtype=np.int64)
    for i in range(1, NEG_TRIES + 1):
        # rank pre-reduced mod 2^31-1: the raw product wraps int64
        # above ~3.5e9 vertices (DuckDB would raise); identical
        # expression in the SQL oracle below.
        cand_rank = ((ranks % 2147483647) * 2654435761
                     + i * 1000003) % V
        cand = verts[cand_rank]
        v = verts
        lo = np.minimum(v, cand)
        hi = np.maximum(v, cand)
        key = (lo.astype(np.int64) << 31) | hi
        pos = np.searchsorted(packed, key)
        pos = np.minimum(pos, len(packed) - 1)
        is_edge = packed[pos] == key
        ok = (cand != v) & ~is_edge
        rows_v.append(v[ok])
        rows_c.append(cand[ok])
        rows_i.append(np.full(int(ok.sum()), i, np.int64))
    vv = np.concatenate(rows_v)
    cc = np.concatenate(rows_c)
    ii = np.concatenate(rows_i)
    # keep first NEG_KEEP by try order per vertex (dedup repeated
    # candidates first, keeping the earliest try)
    order = np.lexsort((ii, cc, vv))
    vv, cc, ii = vv[order], cc[order], ii[order]
    first = np.r_[True, (vv[1:] != vv[:-1]) | (cc[1:] != cc[:-1])]
    vv, cc, ii = vv[first], cc[first], ii[first]
    order = np.lexsort((ii, vv))
    vv, cc, ii = vv[order], cc[order], ii[order]
    starts = np.r_[True, vv[1:] != vv[:-1]]
    grp = np.cumsum(starts) - 1
    pos_in_grp = np.arange(len(vv)) - np.repeat(
        np.flatnonzero(starts), np.diff(np.r_[np.flatnonzero(starts),
                                              len(vv)]))
    keep = pos_in_grp < NEG_KEEP
    return pa.table({"vid": vv[keep], "neg": cc[keep],
                     "try_no": ii[keep]}) \
        .sort_by([("vid", "ascending"), ("try_no", "ascending")])


def sql_negative_samples() -> str:
    return _with_edges(
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0), "
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM kept "
        "UNION ALL SELECT dst AS vid FROM kept) u), "
        "rk AS (SELECT vid, row_number() OVER (ORDER BY vid) - 1 AS r "
        "FROM verts), "
        "nv AS (SELECT count(*) AS n FROM verts), "
        f"tries AS (SELECT r.vid, t.i, "
        f"((r.r % 2147483647) * 2654435761 + t.i * 1000003) "
        f"% (SELECT n FROM nv) AS cr "
        f"FROM rk r CROSS JOIN (SELECT unnest(range(1, {NEG_TRIES + 1})) "
        f"AS i) t), "
        "cand AS (SELECT t.vid, c.vid AS neg, t.i FROM tries t "
        "JOIN rk c ON c.r = t.cr WHERE c.vid <> t.vid), "
        "nonedge AS (SELECT v.vid, v.neg, v.i FROM cand v "
        "WHERE NOT EXISTS (SELECT 1 FROM kept e WHERE "
        "(e.src = least(v.vid, v.neg) AND e.dst = greatest(v.vid, v.neg)"
        "))), "
        "dedup AS (SELECT vid, neg, min(i) AS i FROM nonedge "
        "GROUP BY vid, neg), "
        "rked AS (SELECT vid, neg, i, row_number() OVER ("
        "PARTITION BY vid ORDER BY i) AS rn FROM dedup) "
        f"SELECT vid, neg, CAST(i AS BIGINT) AS try_no FROM rked "
        f"WHERE rn <= {NEG_KEEP} ORDER BY vid, try_no")


def q_katz_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident Katz (the 10^12-V strategy) — hash-verified
    against the SAME unrolled-CTE oracle as the dense q_katz."""
    from igpm_pem_ray.graph.shuffle_kernels import katz_shuffle

    ds = katz_shuffle(cooccurrence_edges(sf_dir),
                      alpha_den=KATZ_ALPHA_DEN, n_iters=KATZ_ITERS)
    pdf = ds.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype("int64"),
                     "katz_scaled": pdf["x"].to_numpy().astype("int64")})


# ---------------- weighted SSSP (bounded-hop Bellman-Ford) ----------------

SSSP_ITERS = 8  # relaxation depth, shared by kernel / shuffle sibling / SQL


def q_sssp(sf_dir: str) -> pa.Table:
    """Weighted shortest paths from the smallest vid, undirected,
    deterministic integer weights w(u,v) = 1 + (u+v) % WEIGHT_MOD,
    paths capped at SSSP_ITERS hops (graph/sssp.py dense relaxation
    plan).  Exact int64 distances — the oracle matches bit for bit."""
    from igpm_pem_ray.graph import sssp as sssp_mod

    return sssp_mod.sssp(cooccurrence_edges(sf_dir),
                         n_iters=SSSP_ITERS).sort_by([("vid", "ascending")])


def q_sssp_shuffle(sf_dir: str) -> pa.Table:
    """Dataset-resident sibling (shuffle_kernels.sssp_shuffle: (vid,
    dist) state rows, one edges-state join + groupby(min) per round) —
    the 10^12-V alternate to q_sssp, bit-identical distances."""
    from igpm_pem_ray.graph.shuffle_kernels import sssp_shuffle

    t = sssp_shuffle(cooccurrence_edges(sf_dir), n_iters=SSSP_ITERS) \
        .sort("vid").to_pandas()
    return pa.Table.from_pandas(t, preserve_index=False)


def sql_sssp(n_iters: int = SSSP_ITERS) -> str:
    """Unrolled Bellman-Ford: d_k = min(d_{k-1}, min over in-edges of
    d_{k-1}(u) + w) — every level MATERIALIZED (each is referenced
    twice by the next; inlined, the chain would re-expand the lineitem
    self-join 2^k times, the sql_hits fd-exhaustion failure mode)."""
    from igpm_pem_ray.graph.sssp import WEIGHT_MOD

    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "ue AS MATERIALIZED (SELECT src AS x, dst AS y FROM edges "
        "UNION ALL SELECT dst AS x, src AS y FROM edges)",
        "d0 AS (SELECT (SELECT MIN(src) FROM edges) AS v, "
        "CAST(0 AS BIGINT) AS d)",
    ]
    for k in range(1, n_iters + 1):
        p = f"d{k - 1}"
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT v, MIN(d) AS d FROM ("
            f"SELECT v, d FROM {p} UNION ALL "
            f"SELECT e.y AS v, p.d + 1 + ((e.x + e.y) % {WEIGHT_MOD}) AS d "
            f"FROM {p} p JOIN ue e ON e.x = p.v) GROUP BY v)")
    return ("WITH " + ", ".join(parts) +
            f" SELECT v AS vid, d AS dist FROM d{n_iters} ORDER BY vid")


# ---------- minimum spanning forest (graph/msf.py) ----------

def q_msf_forest(sf_dir: str) -> pa.Table:
    """Unique minimum spanning forest of the co-occurrence graph under
    the shared strict edge key (w(u,v) = 1 + (u+v) mod 7, u, v) —
    distributed-Boruvka kernel, Kruskal-oracle-tested
    (tests/test_kernels.py::test_msf_matches_kruskal_oracle).
    Rows-only query: sequential union-find has no SQL form."""
    from igpm_pem_ray.graph import msf as msf_mod

    return msf_mod.msf(cooccurrence_edges(sf_dir))


def q_msf_shuffle(sf_dir: str):
    """The Dataset-resident Boruvka sibling over the thinned graph —
    identical forest to q_msf_forest restricted to the thinned edge
    set (unique MSF under the strict key); rows-only (sequential
    union-find has no SQL form; dense/shuffle parity is the oracle,
    tests/test_kernels.py::test_msf_shuffle_parity_and_resume)."""
    from igpm_pem_ray.graph.shuffle_kernels import msf_shuffle

    return msf_shuffle(thinned_edges(sf_dir)).sort(["w", "src", "dst"])


# ---------- quadrilateral (4-cycle) count ----------

def q_quad_count(sf_dir: str) -> pa.Table:
    """Exact 4-cycle count of the thinned undirected graph via the
    common-neighbor identity  C4 = (1/2) * sum over unordered vertex
    pairs {u,w} of C(cn(u,w), 2)  — every quadrilateral contributes
    exactly one pair of opposite corners twice.  Plan: one mid-keyed
    self-join of the distinct undirected edge list (fan-out sum of
    deg^2 over mids — hub-split at web scale, same note as q_two_hop),
    one (u,w) count groupby, then a one-row integer reduce.  All
    arithmetic exact int64."""
    from ray.data.aggregate import Count, Sum

    def sym(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"x": np.concatenate([s, d]),
                         "y": np.concatenate([d, s])})

    from ray.data.aggregate import Min

    ue = thinned_edges(sf_dir).map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["x", "y"]).aggregate(Min("y", alias_name="_m")) \
        .drop_columns(["_m"]).materialize()

    wedges = ue.rename_columns({"x": "u", "y": "mid"}) \
        .join(ue.rename_columns({"x": "mid2", "y": "w"}),
              join_type="inner", num_partitions=8,
              on=("mid",), right_on=("mid2",))

    def ordered(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        k = u < w
        return pa.table({"u": u[k], "w": w[k]})

    cn = wedges.map_batches(ordered, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(["u", "w"]).aggregate(Count(alias_name="c"))

    def choose2(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"p": c * (c - 1) // 2})

    total = int(cn.map_batches(choose2, batch_format="pyarrow").sum("p"))
    return pa.table({"n_quads": pa.array([total // 2], pa.int64())})


def sql_quad_count() -> str:
    return _with_edges(
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0), "
        "ue AS (SELECT DISTINCT x, y FROM (SELECT src AS x, dst AS y "
        "FROM kept UNION ALL SELECT dst AS x, src AS y FROM kept) b), "
        "cn AS (SELECT a.x AS u, b.x AS w, count(*) AS c "
        "FROM ue a JOIN ue b ON a.y = b.y AND a.x < b.x "
        "GROUP BY a.x, b.x) "
        "SELECT CAST(COALESCE(sum(c*(c-1)//2), 0)//2 AS BIGINT) "
        "AS n_quads FROM cn")


def q_coloring(sf_dir: str) -> pa.Table:
    """Deterministic Jones-Plassmann greedy coloring of the
    co-occurrence graph (graph/coloring.py) — rows-only (the
    sequential smallest-absent-color rule has no tractable SQL form;
    an independent pure-Python reference pins the kernel,
    tests/test_kernels.py::test_greedy_coloring_vs_reference_rule)."""
    from igpm_pem_ray.graph.coloring import greedy_coloring

    return greedy_coloring(cooccurrence_edges(sf_dir))


# ---------- SALSA hub/authority (integer fixed-point) ----------

SALSA_ITERS = 3


def q_salsa(sf_dir: str) -> pa.Table:
    """SALSA hub/authority scores (Lempel-Moran WWW'00) on the
    directed co-occurrence graph — the degree-normalized random-walk
    counterpart of HITS (graph/salsa.py).  int64 fixed-point with
    floor division BEFORE each sum, so both engines compute the exact
    same integers under any reduction order (no e-scale rounding of a
    float at all)."""
    from igpm_pem_ray.graph.salsa import salsa

    return salsa(cooccurrence_edges(sf_dir), n_iters=SALSA_ITERS)


def sql_salsa(n_iters: int = SALSA_ITERS) -> str:
    from igpm_pem_ray.graph.salsa import SALSA_SCALE

    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "verts AS MATERIALIZED (SELECT DISTINCT vid FROM "
        "(SELECT src AS vid FROM edges "
        "UNION ALL SELECT dst AS vid FROM edges) u)",
        "od AS MATERIALIZED (SELECT src AS vid, "
        "CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1)",
        "idg AS MATERIALIZED (SELECT dst AS vid, "
        "CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1)",
        f"h0 AS MATERIALIZED (SELECT vid, "
        f"CAST({SALSA_SCALE} AS BIGINT) AS h FROM verts)",
    ]
    for k in range(1, n_iters + 1):
        p = f"h{k - 1}"
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT e.dst AS vid, "
            f"CAST(sum(h.h // od.d) AS BIGINT) AS a "
            f"FROM edges e JOIN {p} h ON e.src = h.vid "
            f"JOIN od ON od.vid = e.src GROUP BY e.dst), "
            f"h{k} AS MATERIALIZED (SELECT e.src AS vid, "
            f"CAST(sum(a.a // idg.d) AS BIGINT) AS h "
            f"FROM edges e JOIN a{k} a ON e.dst = a.vid "
            f"JOIN idg ON idg.vid = e.dst GROUP BY e.src)"
        )
    body = ", ".join(parts)
    return (
        f"WITH {body} "
        f"SELECT v.vid, COALESCE(h.h, 0) AS hub_q, "
        f"COALESCE(a.a, 0) AS auth_q "
        f"FROM verts v LEFT JOIN h{n_iters} h ON v.vid = h.vid "
        f"LEFT JOIN a{n_iters} a ON v.vid = a.vid ORDER BY v.vid")


# ---------- DOULION sampled triangle estimate ----------

# keep each edge iff hash(src,dst) % DOULION_Q == 0  (p = 1/Q);
# estimate = sampled_count * Q^3 (Tsourakakis et al., KDD'09).
# Ids are pre-reduced mod 2^31-1 before the multiply (the MIS/walks
# overflow convention) so kernel and SQL agree at 63-bit vids.
DOULION_Q = 3
DOULION_A, DOULION_B = 2654435761, 97
DOULION_M = (1 << 31) - 1


def q_doulion_triangles(sf_dir: str) -> pa.Table:
    """Approximate triangle count by deterministic edge sampling
    (DOULION): hash-sample the edge table at p=1/DOULION_Q with an
    affine hash (RNG-free, identical expression in SQL), run the
    exact degree-oriented wedge-join triangle kernel on the sample,
    scale by Q^3.  The sampled count and the estimate are both exact
    integers — the sampling is the approximation, not the arithmetic.
    At web scale this is the one-pass cheap first answer before the
    exact kernel: the sample is Q× smaller and the wedge join
    (Σ deg²) shrinks ~Q²."""
    edges = cooccurrence_edges(sf_dir)

    def samp(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        h = ((s % DOULION_M) * DOULION_A + (d % DOULION_M) * 131
             + DOULION_B) % DOULION_M
        keep = (h % DOULION_Q) == 0
        return pa.table({"src": s[keep], "dst": d[keep]})

    sampled = edges.map_batches(samp, batch_format="pyarrow",
                                zero_copy_batch=True)
    n = tri_mod.triangle_count(sampled)
    return pa.table({
        "n_sampled": pa.array([n], type=pa.int64()),
        "est_triangles": pa.array([n * DOULION_Q**3], type=pa.int64())})


def sql_doulion_triangles() -> str:
    h = (f"(((src % {DOULION_M}) * {DOULION_A} + "
         f"(dst % {DOULION_M}) * 131 + {DOULION_B}) % {DOULION_M})")
    return _with_edges(
        f"samp AS (SELECT src, dst FROM edges "
        f"WHERE {h} % {DOULION_Q} = 0), "
        "t AS (SELECT 1 FROM samp e1 "
        "JOIN samp e2 ON e1.dst = e2.src "
        "JOIN samp e3 ON e3.src = e1.src AND e3.dst = e2.dst) "
        "SELECT CAST(count(*) AS BIGINT) AS n_sampled, "
        f"CAST(count(*) * {DOULION_Q**3} AS BIGINT) AS est_triangles "
        "FROM t")


# ---------- global transitivity (wedge-closure ratio) ----------

def q_transitivity(sf_dir: str) -> pa.Table:
    """Global transitivity 3·triangles / wedges of the co-occurrence
    graph — the corpus-level clustering summary next to the
    per-vertex `clustering_coeff`.  Wedges = Σ_v C(deg_v, 2) from one
    endpoint-explode degree groupby + per-block integer partials;
    closed wedges = 3 × the exact wedge-join triangle kernel.  All
    counts exact int64, the ratio one e6 fixed point."""
    from ray.data.aggregate import Count, Sum

    edges = cooccurrence_edges(sf_dir).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": np.concatenate([s, d])})

    deg = edges.map_batches(endpoints, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("vid").aggregate(Count(alias_name="d"))

    def choose2(b: pa.Table) -> pa.Table:
        d = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())],
                                       pa.int64())})

    wedges = int(deg.map_batches(choose2, batch_format="pyarrow").sum("w"))
    closed = 3 * tri_mod.triangle_count(edges)
    t_e6 = (2 * closed * 10**6 + wedges) // (2 * wedges) if wedges else 0
    return pa.table({
        "n_wedges": pa.array([wedges], pa.int64()),
        "n_closed": pa.array([closed], pa.int64()),
        "transitivity_e6": pa.array([t_e6], pa.int64())})


def sql_transitivity() -> str:
    return _with_edges(
        "deg AS (SELECT vid, count(*) AS d FROM "
        "(SELECT src AS vid FROM edges "
        "UNION ALL SELECT dst AS vid FROM edges) u GROUP BY 1), "
        "w AS (SELECT CAST(sum(d*(d-1)//2) AS BIGINT) AS n_wedges "
        "FROM deg), "
        "t AS (SELECT 3*CAST(count(*) AS BIGINT) AS n_closed FROM ("
        "SELECT 1 FROM edges e1 JOIN edges e2 ON e1.dst = e2.src "
        "JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst) q) "
        "SELECT w.n_wedges, t.n_closed, "
        "CAST((2*t.n_closed*1000000 + w.n_wedges) // (2*w.n_wedges) "
        "AS BIGINT) AS transitivity_e6 FROM w, t")


# ---------------- mirror detection (structural equivalence) ----------------

MIRROR_E6_MIN = 150_000


def q_mirror_suppliers(sf_dir: str):
    """Mirror detection on the supplier->part bipartite graph: supplier
    pairs whose distinct part catalogs have Jaccard >= 0.15 — the
    structural-equivalence kernel (graph/mirror.py) whose web-graph
    instance is mirror-HOST discovery (`link_mirror_hosts`); this
    bipartite instance gives it a DuckDB oracle.  Raw integers (c,
    n_a, n_b) ride along so the oracle comparison is exact."""
    from ray.data.aggregate import Count

    from igpm_pem_ray.graph.mirror import neighbor_jaccard_pairs
    from igpm_pem_ray.pipelines.common import read_table

    li = read_table(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])
    adj = li.rename_columns({"l_suppkey": "v", "l_partkey": "n"}) \
        .groupby(["v", "n"]).aggregate(Count(alias_name="_d")) \
        .drop_columns(["_d"])
    return neighbor_jaccard_pairs(adj, min_jaccard_e6=MIRROR_E6_MIN)


def sql_mirror_suppliers() -> str:
    jac = "floor(i.c*1e6/(sa.sz + sb.sz - i.c)+0.5)"
    return (
        "WITH adj AS (SELECT DISTINCT l_suppkey AS v, l_partkey AS n "
        "FROM lineitem), "
        "sz AS (SELECT v, count(*) AS sz FROM adj GROUP BY 1), "
        "i AS (SELECT a.v AS v_a, b.v AS v_b, count(*) AS c "
        "FROM adj a JOIN adj b ON a.n = b.n AND a.v < b.v GROUP BY 1, 2) "
        "SELECT v_a, v_b, CAST(i.c AS BIGINT) AS c, "
        "CAST(sa.sz AS BIGINT) AS n_a, CAST(sb.sz AS BIGINT) AS n_b, "
        f"CAST({jac} AS BIGINT) AS jaccard_e6 "
        "FROM i JOIN sz sa ON sa.v = i.v_a JOIN sz sb ON sb.v = i.v_b "
        f"WHERE CAST({jac} AS BIGINT) >= {MIRROR_E6_MIN}")


def q_densest_subgraph(sf_dir: str):
    """Charikar greedy densest subgraph of the co-occurrence graph —
    the spam-farm / link-exchange core detector (graph/densest.py).
    Rows-only: the greedy is an inherently sequential peel with an
    exact-rational argmax over prefixes (no SQL form); the planted-
    clique recovery and the 1/2-approximation bound vs subset
    enumeration are pytest-pinned (tests/test_kernels.py)."""
    from igpm_pem_ray.graph.densest import densest_subgraph

    return densest_subgraph(cooccurrence_edges(sf_dir))


def q_mirror_clusters(sf_dir: str):
    """Mirror CLUSTERS: the connected components of the mirror-pair
    graph — detection (`mirror_suppliers`) composed with the CC kernel
    to produce dedup groups, exactly how host-mirror pairs roll up to
    mirror SITES (and how `near_dup_groups` closes LSH pairs).
    (vid, component) with component = min member vid; vertices with no
    qualifying mirror pair don't appear (no self-rows)."""
    from igpm_pem_ray.graph.mirror import neighbor_jaccard_pairs
    from igpm_pem_ray.pipelines.common import read_table
    from ray.data.aggregate import Count

    li = read_table(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])
    adj = li.rename_columns({"l_suppkey": "v", "l_partkey": "n"}) \
        .groupby(["v", "n"]).aggregate(Count(alias_name="_d")) \
        .drop_columns(["_d"])
    pairs = neighbor_jaccard_pairs(adj, min_jaccard_e6=MIRROR_E6_MIN) \
        .map_batches(lambda b: pa.table({"src": b["v_a"],
                                         "dst": b["v_b"]}),
                     batch_format="pyarrow")
    return cc_mod.connected_components(pairs)


def sql_mirror_clusters() -> str:
    jac = "floor(i.c*1e6/(sa.sz + sb.sz - i.c)+0.5)"
    return (
        "WITH RECURSIVE adj AS (SELECT DISTINCT l_suppkey AS v, "
        "l_partkey AS n FROM lineitem), "
        "sz AS (SELECT v, count(*) AS sz FROM adj GROUP BY 1), "
        "i AS (SELECT a.v AS v_a, b.v AS v_b, count(*) AS c "
        "FROM adj a JOIN adj b ON a.n = b.n AND a.v < b.v GROUP BY 1, 2), "
        "mp AS (SELECT v_a AS src, v_b AS dst FROM i "
        "JOIN sz sa ON sa.v = i.v_a JOIN sz sb ON sb.v = i.v_b "
        f"WHERE CAST({jac} AS BIGINT) >= {MIRROR_E6_MIN}), "
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM mp "
        "UNION ALL SELECT dst AS src, src AS dst FROM mp) u), "
        "verts AS (SELECT src AS vid FROM ue GROUP BY src), "
        "reach(a, b) AS (SELECT vid, vid FROM verts "
        "UNION SELECT r.a, e.dst FROM reach r JOIN ue e ON r.b = e.src) "
        "SELECT a AS vid, MIN(b) AS component FROM reach GROUP BY a")


ATTACK_K = 20


def q_robustness_attack(sf_dir: str):
    """Targeted-attack robustness: remove the ATTACK_K highest-degree
    hubs (degree desc, vid asc tie-break) and report the surviving
    component sizes — the classic scale-free-network resilience
    experiment (Albert-Jeong-Barabasi, Nature 2000: hub removal
    shatters a power-law graph where random removal barely dents it),
    run as degrees -> tiny top-k -> broadcast filter -> the CC kernel
    -> one O(components) count.  Vertices surviving only as isolates
    (every incident edge removed) drop out, matching the oracle's
    edge-derived vertex set."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    edges = cooccurrence_edges(sf_dir).materialize()

    def both(b: pa.Table) -> pa.Table:
        return pa.table({"vid": pa.concat_arrays(
            [b["src"].combine_chunks(), b["dst"].combine_chunks()])})

    deg = edges.map_batches(both, batch_format="pyarrow") \
        .groupby("vid").aggregate(Count(alias_name="deg"))
    hubs = deg.sort(["deg", "vid"], descending=[True, False]) \
        .limit(ATTACK_K).to_pandas()["vid"].to_numpy()
    hubs = np.sort(hubs.astype(np.int64))

    def drop_hubs(b: pa.Table, _h=hubs) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = ~(np.isin(s, _h) | np.isin(d, _h))
        return pa.table({"src": s[keep], "dst": d[keep]})

    surv = edges.map_batches(drop_hubs, batch_format="pyarrow",
                             zero_copy_batch=True)
    comp = cc_mod.connected_components(surv)  # pyarrow Table (vid, comp)
    sizes = comp.group_by("component").aggregate([("vid", "count")])
    return pa.table({"component": sizes["component"],
                     "size": sizes["vid_count"].cast(pa.int64())})


def sql_robustness_attack() -> str:
    return _with_edges(
        "allv AS (SELECT src AS vid FROM edges "
        "UNION ALL SELECT dst FROM edges), "
        "deg AS (SELECT vid, count(*) AS d FROM allv GROUP BY 1), "
        "hubs AS (SELECT vid FROM deg "
        f"ORDER BY d DESC, vid LIMIT {ATTACK_K}), "
        "se AS (SELECT src, dst FROM edges WHERE src NOT IN "
        "(SELECT vid FROM hubs) AND dst NOT IN (SELECT vid FROM hubs)), "
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM se "
        "UNION ALL SELECT dst AS src, src AS dst FROM se) u), "
        "verts AS (SELECT src AS vid FROM ue GROUP BY src), "
        "reach(a, b) AS (SELECT vid, vid FROM verts "
        "UNION SELECT r.a, e.dst FROM reach r JOIN ue e ON r.b = e.src), "
        "comp AS (SELECT a AS vid, MIN(b) AS component FROM reach "
        "GROUP BY a) "
        "SELECT component, CAST(count(*) AS BIGINT) AS size FROM comp "
        "GROUP BY component")


def q_random_attack(sf_dir: str):
    """RANDOM-failure counterpart of `robustness_attack`: remove the
    same NUMBER of vertices chosen by a deterministic hash (lowest
    ATTACK_K of ``(vid*2654435761) mod 2^31-1``, the Knuth
    multiplicative hash reduced mod a Mersenne prime so the SQL BIGINT
    expression cannot overflow), then surviving component sizes.
    Contrast with the targeted attack demonstrates the scale-free
    resilience asymmetry (Albert-Jeong-Barabasi): random failures
    barely dent the giant component that hub removal shatters."""
    from ray.data.aggregate import Count

    edges = cooccurrence_edges(sf_dir).materialize()

    def both(b: pa.Table) -> pa.Table:
        return pa.table({"vid": pa.concat_arrays(
            [b["src"].combine_chunks(), b["dst"].combine_chunks()])})

    verts = edges.map_batches(both, batch_format="pyarrow") \
        .groupby("vid").aggregate(Count(alias_name="_d")) \
        .drop_columns(["_d"]).to_pandas()["vid"].to_numpy().astype(np.int64)
    h = ((verts % ((1 << 31) - 1)) * 2654435761) % ((1 << 31) - 1)
    order = np.lexsort((verts, h))[:ATTACK_K]
    removed = np.sort(verts[order])

    def drop_rand(b: pa.Table, _h=removed) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = ~(np.isin(s, _h) | np.isin(d, _h))
        return pa.table({"src": s[keep], "dst": d[keep]})

    surv = edges.map_batches(drop_rand, batch_format="pyarrow",
                             zero_copy_batch=True)
    comp = cc_mod.connected_components(surv)
    sizes = comp.group_by("component").aggregate([("vid", "count")])
    return pa.table({"component": sizes["component"],
                     "size": sizes["vid_count"].cast(pa.int64())})


def sql_random_attack() -> str:
    return _with_edges(
        "verts0 AS (SELECT DISTINCT vid FROM (SELECT src AS vid "
        "FROM edges UNION ALL SELECT dst FROM edges) u), "
        "rm AS (SELECT vid FROM verts0 "
        "ORDER BY ((vid % 2147483647) * 2654435761) % 2147483647, vid "
        f"LIMIT {ATTACK_K}), "
        "se AS (SELECT src, dst FROM edges WHERE src NOT IN "
        "(SELECT vid FROM rm) AND dst NOT IN (SELECT vid FROM rm)), "
        "ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM se "
        "UNION ALL SELECT dst AS src, src AS dst FROM se) u), "
        "verts AS (SELECT src AS vid FROM ue GROUP BY src), "
        "reach(a, b) AS (SELECT vid, vid FROM verts "
        "UNION SELECT r.a, e.dst FROM reach r JOIN ue e ON r.b = e.src), "
        "comp AS (SELECT a AS vid, MIN(b) AS component FROM reach "
        "GROUP BY a) "
        "SELECT component, CAST(count(*) AS BIGINT) AS size FROM comp "
        "GROUP BY component")


def q_degree_gini(sf_dir: str):
    """Gini coefficient of the degree distribution — the attention-
    inequality scalar of a link graph (a perfectly equal graph scores
    0; a hub-dominated web graph approaches 1).  Exact integers end to
    end: G = (2*Sigma(i*d_i) - (n+1)*Sigma(d_i)) / (n*Sigma(d_i)) over
    degrees sorted ascending (vid tie-break), reported as the exact
    rational (gini_num, gini_den) plus the e6 floor fixed point.
    Plan: one degree groupby, the stages/ranked.py sorted-block rank
    for i (no driver sort), one weighted-sum aggregate."""
    from ray.data.aggregate import Count, Sum
    from igpm_pem_ray.stages.ranked import rank_per_group

    edges = cooccurrence_edges(sf_dir)

    def both(b: pa.Table) -> pa.Table:
        return pa.table({"vid": pa.concat_arrays(
            [b["src"].combine_chunks(), b["dst"].combine_chunks()])})

    deg = edges.map_batches(both, batch_format="pyarrow") \
        .groupby("vid").aggregate(Count(alias_name="deg")) \
        .map_batches(lambda b: pa.table({
            "vid": b["vid"], "deg": b["deg"].cast(pa.int64()),
            "grp": np.zeros(b.num_rows, np.int64)}),
            batch_format="pyarrow")
    ranked = rank_per_group(deg, key="grp", order=["deg", "vid"],
                            descending=[False, False])

    def part(b: pa.Table) -> pa.Table:
        d = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = b["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k": np.zeros(len(d), np.int64),
                         "id": i * d, "d": d,
                         "one": np.ones(len(d), np.int64)})

    agg = ranked.map_batches(part, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("k").aggregate(Sum("id", alias_name="sid"),
                                Sum("d", alias_name="sd"),
                                Sum("one", alias_name="n")).take_all()[0]
    sid, sd, n = int(agg["sid"]), int(agg["sd"]), int(agg["n"])
    num = 2 * sid - (n + 1) * sd
    den = n * sd
    return pa.table({"gini_num": pa.array([num], pa.int64()),
                     "gini_den": pa.array([den], pa.int64()),
                     "gini_e6": pa.array([num * 1_000_000 // den if den
                                          else 0], pa.int64())})


def sql_degree_gini() -> str:
    return _with_edges(
        "allv AS (SELECT src AS vid FROM edges "
        "UNION ALL SELECT dst FROM edges), "
        "deg AS (SELECT vid, count(*) AS d FROM allv GROUP BY 1), "
        "r AS (SELECT d, row_number() OVER (ORDER BY d, vid) AS i "
        "FROM deg), "
        "s AS (SELECT CAST(sum(i*d) AS BIGINT) AS sid, "
        "CAST(sum(d) AS BIGINT) AS sd, "
        "CAST(count(*) AS BIGINT) AS n FROM r) "
        "SELECT CAST(2*sid - (n+1)*sd AS BIGINT) AS gini_num, "
        "CAST(n*sd AS BIGINT) AS gini_den, "
        "CAST((2*sid - (n+1)*sd) * 1000000 // (n*sd) AS BIGINT) "
        "AS gini_e6 FROM s")


# ---------------- temporal graph churn ----------------

CHURN_SPLIT = "1998-01-01"   # epoch A: orders before; epoch B: after


def q_graph_churn(sf_dir: str) -> pa.Table:
    """Edge-set evolution of the co-occurrence graph between two
    order-date epochs (the link-graph churn measurement: how much of
    the graph survives a recrawl): build the canonical distinct edge
    set from orders before / after CHURN_SPLIT, then report
    |A|, |B|, |A∩B| and the Jaccard survival ratio (e6 half-up).

    Plan: ONE lineitem⋈orders join tags every line with its epoch
    (the only date column lives on orders), then the usual pair
    self-join runs ONCE over the tagged lines with the epoch carried
    through — edges present in both epochs appear with both tags, so
    a single (src, dst) groupby with min/max-tag aggregates yields
    all three counts with no second join over the edge sets."""
    from ray.data.aggregate import Max as _Max, Min as _Min

    from igpm_pem_ray.pipelines.common import read_table

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    od = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def tag(b: pa.Table) -> pa.Table:
        ts = b["o_orderdate"].to_numpy(zero_copy_only=False)
        epoch = (ts >= np.datetime64(CHURN_SPLIT)).astype(np.int64)
        return pa.table({"k": b["o_orderkey"].to_numpy(
                             zero_copy_only=False).astype(np.int64),
                         "epoch": epoch})

    tagged = od.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    lines = li.rename_columns({"l_orderkey": "k2", "l_partkey": "part"}) \
        .join(tagged, join_type="inner", num_partitions=8,
              on=("k2",), right_on=("k",))

    left = lines.map_batches(
        lambda b: pa.table({"ka": b["k2"], "src": b["part"],
                            "epoch": b["epoch"]}),
        batch_format="pyarrow")
    right = lines.map_batches(
        lambda b: pa.table({"kb": b["k2"], "dst": b["part"]}),
        batch_format="pyarrow")
    j = left.join(right, join_type="inner", num_partitions=8,
                  on=("ka",), right_on=("kb",))

    def lt(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = s < d
        return pa.table({"src": s[keep], "dst": d[keep],
                         "epoch": b["epoch"].to_numpy(
                             zero_copy_only=False)[keep]})

    per_edge = j.map_batches(lt, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["src", "dst"]).aggregate(
            _Min("epoch", alias_name="emin"),
            _Max("epoch", alias_name="emax"))

    def partial(b: pa.Table) -> pa.Table:
        emin = b["emin"].to_numpy(zero_copy_only=False)
        emax = b["emax"].to_numpy(zero_copy_only=False)
        in_a = emin == 0
        in_b = emax == 1
        return pa.table({
            "n_a": pa.array([int(in_a.sum())], pa.int64()),
            "n_b": pa.array([int(in_b.sum())], pa.int64()),
            "n_common": pa.array([int((in_a & in_b).sum())], pa.int64())})

    from ray.data.aggregate import Sum as _Sum
    agg = per_edge.map_batches(partial, batch_format="pyarrow") \
        .aggregate(_Sum("n_a", alias_name="n_a"),
                   _Sum("n_b", alias_name="n_b"),
                   _Sum("n_common", alias_name="n_common"))
    n_a, n_b, n_c = int(agg["n_a"]), int(agg["n_b"]), int(agg["n_common"])
    union = n_a + n_b - n_c
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "n_common": pa.array([n_c], pa.int64()),
        "jaccard_e6": pa.array(
            [int(np.floor(n_c * 1e6 / max(union, 1) + 0.5))], pa.int64()),
    })


def sql_graph_churn() -> str:
    return (
        "WITH tagged AS (SELECT l.l_orderkey AS k, l.l_partkey AS part, "
        f"CASE WHEN o.o_orderdate >= DATE '{CHURN_SPLIT}' THEN 1 ELSE 0 "
        "END AS epoch FROM lineitem l JOIN orders o "
        "ON l.l_orderkey = o.o_orderkey), "
        "pairs AS (SELECT a.part AS src, b.part AS dst, a.epoch "
        "FROM tagged a JOIN tagged b ON a.k = b.k AND a.part < b.part), "
        "pe AS (SELECT src, dst, min(epoch) AS emin, max(epoch) AS emax "
        "FROM pairs GROUP BY src, dst), "
        "c AS (SELECT sum(CASE WHEN emin = 0 THEN 1 ELSE 0 END) AS n_a, "
        "sum(CASE WHEN emax = 1 THEN 1 ELSE 0 END) AS n_b, "
        "sum(CASE WHEN emin = 0 AND emax = 1 THEN 1 ELSE 0 END) "
        "AS n_common FROM pe) "
        "SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, "
        "CAST(n_common AS BIGINT) AS n_common, "
        "CAST(floor(n_common * 1e6 / greatest(n_a + n_b - n_common, 1) "
        "+ 0.5) AS BIGINT) AS jaccard_e6 FROM c")


# ---------------- bond-percolation curve ----------------

PERC_LEVELS = (200, 400, 600, 800, 1000)  # edge keep-permille levels
_PERC_M = (1 << 31) - 1


def _perc_hash(s: np.ndarray, d: np.ndarray) -> np.ndarray:
    return ((s % _PERC_M) * 7919 + (d % _PERC_M) * 104729) % 1000


def q_percolation_curve(sf_dir: str) -> pa.Table:
    """Bond-percolation curve of the thinned co-occurrence graph:
    keep each canonical edge iff its RNG-free hash lands under q
    permille, for q in PERC_LEVELS, and report surviving edges and
    the giant (largest) component size per level — the classic
    percolation-transition measurement (Callaway et al. PRL 2000),
    generalizing the single-point `random_attack` query to a curve.
    Levels are nested by construction (hash < 200 implies < 400 ...),
    so the curve is monotone.  One dense CC run per level; the driver
    holds only the O(levels) summary."""
    base = thinned_edges(sf_dir).materialize()
    out_q, out_e, out_g = [], [], []
    for q in PERC_LEVELS:
        def keep(b: pa.Table, q=q) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            k = _perc_hash(s, d) < q
            return pa.table({"src": s[k], "dst": d[k]})

        sub = base.map_batches(keep, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
        n_edges = sub.count()
        if n_edges == 0:
            giant = 0
        else:
            comp = cc_mod.connected_components(sub)
            _, counts = np.unique(np.asarray(comp["component"]),
                                  return_counts=True)
            giant = int(counts.max())
        out_q.append(q)
        out_e.append(n_edges)
        out_g.append(giant)
    return pa.table({"keep_permille": pa.array(out_q, pa.int64()),
                     "n_edges": pa.array(out_e, pa.int64()),
                     "giant_size": pa.array(out_g, pa.int64())})


def sql_percolation_curve() -> str:
    parts = [
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0)",
    ]
    selects = []
    for q in PERC_LEVELS:
        parts.append(
            f"k{q} AS (SELECT src, dst FROM kept WHERE "
            f"((src % {_PERC_M}) * 7919 + (dst % {_PERC_M}) * 104729) "
            f"% 1000 < {q}), "
            f"ue{q} AS (SELECT DISTINCT src, dst FROM (SELECT src, dst "
            f"FROM k{q} UNION ALL SELECT dst, src FROM k{q}) u), "
            f"verts{q} AS (SELECT src AS vid FROM ue{q} GROUP BY src), "
            f"reach{q}(a, b) AS (SELECT vid, vid FROM verts{q} "
            f"UNION SELECT r.a, e.dst FROM reach{q} r "
            f"JOIN ue{q} e ON r.b = e.src), "
            f"comp{q} AS (SELECT a, MIN(b) AS c FROM reach{q} GROUP BY a), "
            f"g{q} AS (SELECT COALESCE(max(n), 0) AS giant FROM "
            f"(SELECT count(*) AS n FROM comp{q} GROUP BY c))")
        selects.append(
            f"SELECT {q} AS keep_permille, "
            f"(SELECT count(*) FROM k{q}) AS n_edges, "
            f"(SELECT giant FROM g{q}) AS giant_size")
    return _with_edges(
        ", ".join(parts) + " " +
        "SELECT CAST(keep_permille AS BIGINT) AS keep_permille, "
        "CAST(n_edges AS BIGINT) AS n_edges, "
        "CAST(giant_size AS BIGINT) AS giant_size FROM (" +
        " UNION ALL ".join(selects) + ") ORDER BY keep_permille")


# ---------- Monte-Carlo personalized PageRank from the shared walks ----------

def q_ppr_mc(sf_dir: str):
    """Monte-Carlo PERSONALIZED PageRank (Fogaras-Racz fingerprint
    estimator): restrict the shared deterministic walk table to walks
    started at the seed set (walker % 13 == 0 — a hash-defined teleport
    set, expressed identically in SQL) and weight each visited position
    by the dyadic restart decay (1/2)^step, so w_e6(step) =
    1000000 >> step is integer-exact in any reduction order.  The
    result ranks vertices by proximity to the seed set — the
    topic-sensitive / TrustRank-personalization primitive, as a third
    strategy beside the dense power iteration (q_pagerank_topic) and
    the shuffle kernel.  One stateless weight map + one vid groupby."""
    from ray.data.aggregate import Sum

    from igpm_pem_ray.graph import walks as walks_mod

    ds = walks_mod.random_walks(thinned_edges(sf_dir), walk_len=WALK_LEN)

    def w(b: pa.Table) -> pa.Table:
        walker = b["walker"].to_numpy(zero_copy_only=False)
        keep = (walker % 13) == 0
        step = b["step"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "vid": b["vid"].to_numpy(zero_copy_only=False)[keep],
            "w": (1_000_000 >> step).astype(np.int64)})

    return (ds.map_batches(w, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("vid").aggregate(Sum(on="w", alias_name="score_e6"))
            .map_batches(lambda b: pa.table({
                "vid": b["vid"].cast(pa.int64()),
                "score_e6": b["score_e6"].cast(pa.int64())}),
                batch_format="pyarrow"))


def sql_ppr_mc() -> str:
    return (f"WITH RECURSIVE edges AS ({EDGES_SQL}), {_sql_walks_cte()} "
            "SELECT CAST(vid AS BIGINT) AS vid, "
            "CAST(sum(1000000 // (1 << step)) AS BIGINT) AS score_e6 "
            "FROM walks WHERE walker % 13 = 0 GROUP BY vid")


# ---------- bounded-round greedy maximal matching ----------

MATCH_ROUNDS = 2


def q_matching(sf_dir: str):
    """Two rounds of the deterministic edge-centric matching rule
    (graph/matching.py): an edge is matched iff it is the
    (hash-priority, src, dst) minimum at BOTH endpoints, then incident
    edges die — Israeli-Itai-style symmetry breaking, the scheduling /
    pairing primitive.  Fully Dataset-resident (incidence map +
    per-vertex rank + semi-joins + anti-join kill wave per round); the
    oracle unrolls the identical rounds in SQL."""
    from igpm_pem_ray.graph.matching import maximal_matching

    return maximal_matching(cooccurrence_edges(sf_dir),
                            rounds=MATCH_ROUNDS)


def sql_matching() -> str:
    A, B, C, M = 1_103_515_245, 69_069, 12_345, (1 << 31) - 1
    parts = ["live0 AS (SELECT src, dst FROM edges)"]
    for r in range(1, MATCH_ROUNDS + 1):
        parts += [
            f"p{r} AS (SELECT src, dst, ((src % {M}) * {A} + "
            f"(dst % {M}) * {B} + {r} * {C}) % {M} AS pri "
            f"FROM live{r - 1})",
            f"i{r} AS (SELECT src AS v, pri, src, dst FROM p{r} "
            f"UNION ALL SELECT dst AS v, pri, src, dst FROM p{r})",
            f"c{r} AS (SELECT v, src, dst FROM (SELECT v, src, dst, "
            "row_number() OVER (PARTITION BY v ORDER BY pri, src, dst) "
            f"AS rn FROM i{r}) WHERE rn = 1)",
            f"w{r} AS (SELECT p.src, p.dst FROM p{r} p "
            f"JOIN c{r} a ON a.v = p.src AND a.src = p.src "
            "AND a.dst = p.dst "
            f"JOIN c{r} b ON b.v = p.dst AND b.src = p.src "
            "AND b.dst = p.dst)",
            f"mv{r} AS (SELECT src AS v FROM w{r} "
            f"UNION SELECT dst AS v FROM w{r})",
            f"live{r} AS (SELECT src, dst FROM p{r} "
            f"WHERE src NOT IN (SELECT v FROM mv{r}) "
            f"AND dst NOT IN (SELECT v FROM mv{r}))",
        ]
    sel = " UNION ALL ".join(
        f"SELECT src, dst, {r} AS round FROM w{r}"
        for r in range(1, MATCH_ROUNDS + 1))
    return (f"WITH edges AS ({EDGES_SQL}), {', '.join(parts)} "
            "SELECT CAST(src AS BIGINT) AS src, "
            "CAST(dst AS BIGINT) AS dst, CAST(round AS BIGINT) AS round "
            f"FROM ({sel})")


# ---------- local bridges (edges spanning no triangle) ----------

def q_local_bridges(sf_dir: str):
    """Edges whose endpoints share NO common neighbor — local bridges
    in Granovetter's sense (span > 2): the weak ties whose removal
    lengthens the shortest path between their endpoints, the classic
    community-boundary / information-brokerage signal.  Plan: one
    edges-x-adjacency hash join enumerates (u, v, w) wedges anchored
    at existing edges, one canonical-pair semi-join marks wedges that
    close into a triangle, a (src, dst) groupby counts each edge's
    common neighbors, and one left-outer join flags the zero-support
    edges — the triangle plan's join shape, all Dataset-resident, and
    the per-edge output is never empty (schema-stable at every sf)."""
    from ray.data.aggregate import Count

    edges = cooccurrence_edges(sf_dir).materialize()
    np_ = 1 if edges.count() < 64 * 4 else 4

    def both(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"a": np.concatenate([s, d]),
                         "w": np.concatenate([d, s])})

    ue = edges.map_batches(both, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    half = edges.join(ue, join_type="inner", num_partitions=np_,
                      on=("src",), right_on=("a",))

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        keep = w != d
        s, d, w = s[keep], d[keep], w[keep]
        return pa.table({"src": s, "dst": d,
                         "lo": np.minimum(d, w), "hi": np.maximum(d, w)})

    wedges = half.map_batches(canon, batch_format="pyarrow",
                              zero_copy_batch=True)
    e2 = edges.map_batches(
        lambda b: pa.table({"lo2": b["src"], "hi2": b["dst"]}),
        batch_format="pyarrow").materialize()
    ncommon = wedges.join(e2, join_type="left_semi",
                          num_partitions=np_,
                          on=("lo", "hi"), right_on=("lo2", "hi2")) \
        .groupby(["src", "dst"]).aggregate(Count(alias_name="nc")) \
        .map_batches(lambda b: pa.table({
            "bs": b["src"], "bd": b["dst"],
            "nc": b["nc"].cast(pa.int64())}), batch_format="pyarrow") \
        .materialize()
    flagged = edges.join(ncommon, join_type="left_outer",
                         num_partitions=np_,
                         on=("src", "dst"), right_on=("bs", "bd"))

    def out(b: pa.Table) -> pa.Table:
        nc = pc.fill_null(b["nc"], 0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"src": b["src"].cast(pa.int64()),
                         "dst": b["dst"].cast(pa.int64()),
                         "n_common": nc,
                         "is_bridge": (nc == 0).astype(np.int64)})

    return flagged.map_batches(out, batch_format="pyarrow")


def sql_local_bridges() -> str:
    return (
        f"WITH edges AS ({EDGES_SQL}), "
        "ue AS (SELECT src AS a, dst AS w FROM edges "
        "UNION ALL SELECT dst AS a, src AS w FROM edges), "
        "cn AS (SELECT e.src, e.dst, count(*) AS nc FROM edges e "
        "JOIN ue x ON x.a = e.src JOIN ue y ON y.a = e.dst "
        "AND y.w = x.w GROUP BY e.src, e.dst) "
        "SELECT CAST(e.src AS BIGINT) AS src, "
        "CAST(e.dst AS BIGINT) AS dst, "
        "CAST(COALESCE(cn.nc, 0) AS BIGINT) AS n_common, "
        "CAST(CASE WHEN cn.nc IS NULL THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_bridge "
        "FROM edges e LEFT JOIN cn ON cn.src = e.src AND cn.dst = e.dst")


# ---------- walker return probability (mixing diagnostic) ----------

def q_walk_returns(sf_dir: str):
    """Fraction of walkers back at their start vertex at each step of
    the shared deterministic walk table — the return-probability /
    mixing-time diagnostic (high return mass = strong local clustering,
    slow mixing).  One stateless compare map + one step groupby;
    share_e6 under the repo's integer half-up convention with the
    walker count a driver scalar."""
    from ray.data.aggregate import Count, Sum

    from igpm_pem_ray.graph import walks as walks_mod

    ds = walks_mod.random_walks(thinned_edges(sf_dir),
                                walk_len=WALK_LEN).materialize()
    n_walkers = ds.map_batches(
        lambda b: pa.table({"w": b["walker"]}), batch_format="pyarrow") \
        .groupby("w").aggregate(Count(alias_name="_c")).count()

    def ret(b: pa.Table) -> pa.Table:
        w = b["walker"].to_numpy(zero_copy_only=False)
        v = b["vid"].to_numpy(zero_copy_only=False)
        return pa.table({"step": b["step"],
                         "r": (w == v).astype(np.int64)})

    agg = ds.map_batches(ret, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("step").aggregate(Sum("r", alias_name="n_returned")) \
        .to_pandas().sort_values("step")
    nr = agg["n_returned"].to_numpy(np.int64)
    return pa.table({
        "step": agg["step"].to_numpy(np.int64),
        "n_returned": nr,
        "share_e6": np.floor(nr * 1e6 / n_walkers + 0.5).astype(np.int64)})


def sql_walk_returns() -> str:
    return (f"WITH RECURSIVE edges AS ({EDGES_SQL}), {_sql_walks_cte()}, "
            "t AS (SELECT count(DISTINCT walker) AS nw FROM walks) "
            "SELECT CAST(step AS BIGINT) AS step, "
            "CAST(sum(CASE WHEN walker = vid THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_returned, "
            "CAST(floor(sum(CASE WHEN walker = vid THEN 1 ELSE 0 END) "
            "* 1e6 / t.nw + 0.5) AS BIGINT) AS share_e6 "
            "FROM walks, t GROUP BY step, t.nw")


# ---------- label homophily (attribute assortativity) ----------

def q_brand_homophily(sf_dir: str):
    """Brand homophily of the part co-occurrence graph: observed
    fraction of edges joining same-brand parts vs the degree-weighted
    expectation sum_l (endpoint-share_l)^2 — the categorical
    assortativity / homophily index (do pages link within their own
    community?).  Two hash joins attach endpoint brands (the part
    side stays a Dataset — no driver broadcast, scale-honest), one
    compare map, one label groupby for the expectation; HUGEINT-safe
    squares in the oracle.  Single-row (n_edges, n_same, same_e6,
    expected_e6)."""
    from ray.data.aggregate import Count, Sum

    from igpm_pem_ray.pipelines.common import read_table

    edges = cooccurrence_edges(sf_dir)
    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pa1 = parts.rename_columns({"p_partkey": "k1", "p_brand": "brand_a"})
    pa2 = parts.rename_columns({"p_partkey": "k2", "p_brand": "brand_b"})
    j = edges.join(pa1, join_type="inner", num_partitions=4,
                   on=("src",), right_on=("k1",)) \
        .join(pa2, join_type="inner", num_partitions=4,
              on=("dst",), right_on=("k2",)).materialize()

    def cmp(b: pa.Table) -> pa.Table:
        same = pc.equal(b["brand_a"], b["brand_b"])
        return pa.table({
            "one": np.ones(b.num_rows, dtype=np.int64),
            "same": same.to_numpy(zero_copy_only=False)
            .astype(np.int64)})

    agg = j.map_batches(cmp, batch_format="pyarrow") \
        .groupby("one").aggregate(Count(alias_name="n_edges"),
                                  Sum("same", alias_name="n_same")) \
        .to_pandas()
    n_edges = int(agg["n_edges"].iloc[0])
    n_same = int(agg["n_same"].iloc[0])

    def ends(b: pa.Table) -> pa.Table:
        return pa.table({"brand": pa.concat_arrays(
            [b["brand_a"].combine_chunks().cast(pa.string()),
             b["brand_b"].combine_chunks().cast(pa.string())])})

    lab = j.map_batches(ends, batch_format="pyarrow") \
        .groupby("brand").aggregate(Count(alias_name="c")).to_pandas()
    c = lab["c"].to_numpy(np.int64)
    tot = int(c.sum())               # = 2 * n_edges
    expected = float((c.astype(np.float64) ** 2).sum()) / (tot * tot)
    return pa.table({
        "n_edges": np.asarray([n_edges], dtype=np.int64),
        "n_same": np.asarray([n_same], dtype=np.int64),
        "same_e6": np.asarray(
            [int(np.floor(n_same * 1e6 / n_edges + 0.5))], dtype=np.int64),
        "expected_e6": np.asarray(
            [int(np.floor(expected * 1e6 + 0.5))], dtype=np.int64)})


def sql_brand_homophily() -> str:
    return (
        f"WITH edges AS ({EDGES_SQL}), "
        "j AS (SELECT a.p_brand AS ba, b.p_brand AS bb FROM edges e "
        "JOIN part a ON a.p_partkey = e.src "
        "JOIN part b ON b.p_partkey = e.dst), "
        "s AS (SELECT count(*) AS n_edges, "
        "sum(CASE WHEN ba = bb THEN 1 ELSE 0 END) AS n_same FROM j), "
        "ends AS (SELECT ba AS brand FROM j "
        "UNION ALL SELECT bb FROM j), "
        "lc AS (SELECT brand, count(*) AS c FROM ends GROUP BY brand), "
        "x AS (SELECT sum(CAST(c AS HUGEINT) * c) AS sq, sum(c) AS tot "
        "FROM lc) "
        "SELECT CAST(s.n_edges AS BIGINT) AS n_edges, "
        "CAST(s.n_same AS BIGINT) AS n_same, "
        "CAST(floor(s.n_same * 1e6 / s.n_edges + 0.5) AS BIGINT) "
        "AS same_e6, "
        "CAST(floor(CAST(x.sq AS DOUBLE) / (CAST(x.tot AS DOUBLE) * "
        "CAST(x.tot AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS expected_e6 "
        "FROM s, x")


# ---------- 2-level GNN-style feature propagation ----------

def q_gnn_features(sf_dir: str):
    """Two rounds of sum-aggregation message passing over the
    undirected co-occurrence graph — the GraphSAGE/GCN feature-
    propagation shape with the identity feature: h0 = deg(v),
    h1(v) = sum of neighbor h0, h2(v) = sum of neighbor h1.  Each
    round is one edges |x| state hash join + one dst groupby (the
    shuffle-kernel plan); integer end to end, so any reduction order
    is exact.  Output (vid, deg, h1, h2)."""
    from ray.data.aggregate import Count, Sum

    edges = cooccurrence_edges(sf_dir)

    def both(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"u": np.concatenate([s, d]),
                         "v": np.concatenate([d, s])})

    ue = edges.map_batches(both, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    deg = ue.groupby("u").aggregate(Count(alias_name="h0")) \
        .map_batches(lambda b: pa.table({
            "vid": b["u"].cast(pa.int64()),
            "h0": b["h0"].cast(pa.int64())}),
            batch_format="pyarrow").materialize()

    def one_round(state, col, out):
        msgs = ue.join(state.map_batches(
            lambda b, _c=col: pa.table({"nv": b["vid"],
                                        "x": b[_c]}),
            batch_format="pyarrow"), join_type="inner",
            num_partitions=4, on=("v",), right_on=("nv",))
        return msgs.groupby("u").aggregate(Sum("x", alias_name=out)) \
            .map_batches(lambda b, _o=out: pa.table({
                "vid": b["u"].cast(pa.int64()),
                _o: b[_o].cast(pa.int64())}),
                batch_format="pyarrow").materialize()

    h1 = one_round(deg, "h0", "h1")
    h2 = one_round(h1, "h1", "h2")
    out = deg.join(h1.rename_columns({"vid": "v1"}), join_type="inner",
                   num_partitions=4, on=("vid",), right_on=("v1",)) \
        .join(h2.rename_columns({"vid": "v2"}), join_type="inner",
              num_partitions=4, on=("vid",), right_on=("v2",))
    return out.map_batches(lambda b: pa.table({
        "vid": b["vid"].cast(pa.int64()),
        "deg": b["h0"].cast(pa.int64()),
        "h1": b["h1"].cast(pa.int64()),
        "h2": b["h2"].cast(pa.int64())}), batch_format="pyarrow")


def sql_gnn_features() -> str:
    return (
        f"WITH edges AS ({EDGES_SQL}), "
        "ue AS (SELECT src AS u, dst AS v FROM edges "
        "UNION ALL SELECT dst AS u, src AS v FROM edges), "
        "d AS (SELECT u AS vid, count(*) AS h0 FROM ue GROUP BY u), "
        "m1 AS (SELECT ue.u AS vid, sum(d.h0) AS h1 FROM ue "
        "JOIN d ON d.vid = ue.v GROUP BY ue.u), "
        "m2 AS (SELECT ue.u AS vid, sum(m1.h1) AS h2 FROM ue "
        "JOIN m1 ON m1.vid = ue.v GROUP BY ue.u) "
        "SELECT CAST(d.vid AS BIGINT) AS vid, "
        "CAST(d.h0 AS BIGINT) AS deg, CAST(m1.h1 AS BIGINT) AS h1, "
        "CAST(m2.h2 AS BIGINT) AS h2 "
        "FROM d JOIN m1 ON m1.vid = d.vid JOIN m2 ON m2.vid = d.vid")


# ---------- bipartite butterfly (K_{2,2}) counting ----------

def q_butterflies(sf_dir: str) -> pa.Table:
    """Butterfly (K_{2,2}) count of the order-part bipartite incidence
    graph — the bipartite analog of triangle counting (Sanei-Mehri et
    al., KDD 2018 formulation: butterflies = sum over part pairs of
    C(c, 2) where c = number of orders containing both parts).  Plan:
    distinct (order, part) incidence via one groupby, pair generation
    via the same bounded-fan-out order-key self-join as the
    co-occurrence graph, per-pair co-order counts via one groupby, then
    a single vectorized c*(c-1)/2 partial sum per block — no global
    sort, O(1) driver merge.  Also reports the wedge count (paths
    part-order-part) = sum C(order_degree, 2), from which the bipartite
    clustering coefficient 4*butterflies/wedges follows."""
    from ray.data.aggregate import Count
    from igpm_pem_ray.pipelines.common import read_table

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    inc = li.groupby(["l_orderkey", "l_partkey"]) \
        .aggregate(Count(alias_name="_n")).drop_columns(["_n"])
    inc = inc.map_batches(
        lambda b: pa.table({"k": b["l_orderkey"].cast(pa.int64()),
                            "p": b["l_partkey"].cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    right = inc.map_batches(
        lambda b: pa.table({"k2": b["k"], "p2": b["p"]}),
        batch_format="pyarrow")
    j = inc.join(right, join_type="inner", num_partitions=8,
                 on=("k",), right_on=("k2",))

    def lt(b: pa.Table) -> pa.Table:
        a = b["p"].to_numpy(zero_copy_only=False)
        c = b["p2"].to_numpy(zero_copy_only=False)
        m = a < c
        return pa.table({"pa_": a[m], "pb": c[m]})

    co = j.map_batches(lt, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["pa_", "pb"]).aggregate(Count(alias_name="c"))

    def bf_partial(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bf": pa.array([int((c * (c - 1) // 2).sum())],
                                        pa.int64())})

    n_butterflies = int(co.map_batches(bf_partial, batch_format="pyarrow",
                                       zero_copy_batch=True).sum("bf") or 0)

    deg = inc.groupby("k").aggregate(Count(alias_name="d"))

    def wedge_partial(b: pa.Table) -> pa.Table:
        d = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())],
                                       pa.int64())})

    n_wedges = int(deg.map_batches(wedge_partial, batch_format="pyarrow",
                                   zero_copy_batch=True).sum("w") or 0)
    return pa.table({"n_butterflies": pa.array([n_butterflies], pa.int64()),
                     "n_wedges": pa.array([n_wedges], pa.int64())})


def sql_butterflies() -> str:
    return (
        "WITH inc AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p "
        "FROM lineitem), "
        "co AS (SELECT a.p AS pa_, b.p AS pb, count(*) AS c "
        "FROM inc a JOIN inc b ON a.k = b.k AND a.p < b.p "
        "GROUP BY a.p, b.p), "
        "w AS (SELECT k, count(*) AS d FROM inc GROUP BY k) "
        "SELECT (SELECT CAST(coalesce(sum(c*(c-1)//2), 0) AS BIGINT) FROM co) "
        "AS n_butterflies, "
        "(SELECT CAST(coalesce(sum(d*(d-1)//2), 0) AS BIGINT) FROM w) "
        "AS n_wedges")


# ---------- temporal (time-respecting) reachability ----------

TEMPORAL_REACH_ROUNDS = 3
_DAY_US = 86_400_000_000


def q_temporal_reach(sf_dir: str) -> pa.Table:
    """Earliest-arrival time-respecting reachability (Wu et al., VLDB
    2014 single-pass semantics, here as bounded-round BSP): on the
    timestamped co-occurrence graph (edge (a, b) active on the day of
    the shared order), a walk may traverse an edge only at a time >=
    its arrival at the edge's tail; arrival(v) = earliest such day.
    Seed = min vid at the global min day.  Fixed
    TEMPORAL_REACH_ROUNDS rounds, each one edges-state hash join +
    t >= arr filter + groupby(min) — Dataset-resident state, the same
    shuffle shape as the 10^12-V kernels; exact int64 days so the
    unrolled SQL oracle hash-matches."""
    from ray.data.aggregate import Count, Min
    from igpm_pem_ray.pipelines.common import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda b: pa.table({
            "ok": b["o_orderkey"].cast(pa.int64()),
            "t": b["o_orderdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False) // _DAY_US}),
            batch_format="pyarrow", zero_copy_batch=True)
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    inc = li.groupby(["l_orderkey", "l_partkey"]) \
        .aggregate(Count(alias_name="_n")).drop_columns(["_n"]) \
        .map_batches(lambda b: pa.table({
            "k": b["l_orderkey"].cast(pa.int64()),
            "p": b["l_partkey"].cast(pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
    wd = inc.join(orders, join_type="inner", num_partitions=8,
                  on=("k",), right_on=("ok",)).materialize()
    right = wd.map_batches(
        lambda b: pa.table({"k2": b["k"], "p2": b["p"]}),
        batch_format="pyarrow")
    te = wd.join(right, join_type="inner", num_partitions=8,
                 on=("k",), right_on=("k2",)) \
        .map_batches(lambda b: (lambda s, d, t, m:
                                pa.table({"src": s[m], "dst": d[m],
                                          "t": t[m]}))(
            b["p"].to_numpy(zero_copy_only=False),
            b["p2"].to_numpy(zero_copy_only=False),
            b["t"].to_numpy(zero_copy_only=False),
            b["p"].to_numpy(zero_copy_only=False)
            < b["p2"].to_numpy(zero_copy_only=False)),
            batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["src", "dst", "t"]).aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"])
    ue = te.map_batches(
        lambda b: pa.table({
            "src": pa.concat_arrays([b["src"].combine_chunks(),
                                     b["dst"].combine_chunks()]),
            "dst": pa.concat_arrays([b["dst"].combine_chunks(),
                                     b["src"].combine_chunks()]),
            "t": pa.concat_arrays([b["t"].combine_chunks()] * 2)}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    seed = int(ue.min("src"))
    t0 = int(ue.min("t"))
    state = rd_from_table(pa.table({"vid": pa.array([seed], pa.int64()),
                                    "arr": pa.array([t0], pa.int64())}))
    for _ in range(TEMPORAL_REACH_ROUNDS):
        msgs = ue.join(state, join_type="inner", num_partitions=8,
                       on=("src",), right_on=("vid",)) \
            .map_batches(lambda b: (lambda d, t, a, m:
                                    pa.table({"vid": d[m], "arr": t[m]}))(
                b["dst"].to_numpy(zero_copy_only=False),
                b["t"].to_numpy(zero_copy_only=False),
                b["arr"].to_numpy(zero_copy_only=False),
                b["t"].to_numpy(zero_copy_only=False)
                >= b["arr"].to_numpy(zero_copy_only=False)),
                batch_format="pyarrow", zero_copy_batch=True)
        state = state.union(msgs).groupby("vid") \
            .aggregate(Min("arr", alias_name="arr")).materialize()
    pdf = state.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype(np.int64),
                     "arr_day": pdf["arr"].to_numpy().astype(np.int64)})


def rd_from_table(t: pa.Table):
    import ray.data as rd
    return rd.from_arrow(t)


def sql_temporal_reach() -> str:
    parts = [
        f"od AS (SELECT o_orderkey AS k, epoch_us(o_orderdate) // {_DAY_US} "
        "AS t FROM orders)",
        "inc AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p "
        "FROM lineitem)",
        "te AS (SELECT DISTINCT a.p AS src, b.p AS dst, od.t FROM inc a "
        "JOIN inc b ON a.k = b.k AND a.p < b.p JOIN od ON od.k = a.k)",
        "ue AS (SELECT src, dst, t FROM te "
        "UNION ALL SELECT dst, src, t FROM te)",
        "a0 AS (SELECT (SELECT min(src) FROM ue) AS vid, "
        "(SELECT min(t) FROM ue) AS arr)",
    ]
    prev = "a0"
    for k in range(1, TEMPORAL_REACH_ROUNDS + 1):
        parts.append(
            f"a{k} AS (SELECT vid, min(arr) AS arr FROM ("
            f"SELECT vid, arr FROM {prev} "
            f"UNION ALL SELECT e.dst, e.t FROM {prev} s "
            f"JOIN ue e ON e.src = s.vid AND e.t >= s.arr) GROUP BY vid)")
        prev = f"a{k}"
    return ("WITH " + ", ".join(parts) +
            f" SELECT CAST(vid AS BIGINT) AS vid, "
            f"CAST(arr AS BIGINT) AS arr_day FROM {prev} ORDER BY vid")


# ---------- DAG path counting (topological DP) ----------

DAG_PATH_ROUNDS = 4


def q_dag_paths(sf_dir: str) -> pa.Table:
    """Number of distinct source-rooted paths of length <= R ending at
    each vertex of the thinned canonical DAG (src < dst, hence acyclic)
    — the textbook topological-order DP, run as R rounds of
    edges-state join + groupby(sum).  Path counts are exact int64 under
    any reduction order; roots (in-degree 0) seed with count 1.  The
    same DP shape computes DAG reachability counts / #paths in
    provenance and scheduling graphs."""
    from ray.data.aggregate import Sum, Count
    import ray.data as rd

    edges = thinned_edges(sf_dir).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": np.concatenate([s, d]),
                         "indeg": np.concatenate([
                             np.zeros(len(s), np.int64),
                             np.ones(len(d), np.int64)])})

    verts = edges.map_batches(endpoints, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("vid").aggregate(Sum("indeg", alias_name="ind"))
    p = verts.map_batches(
        lambda b: (lambda v, i, m: pa.table({
            "vid": v[m], "c": np.ones(int(m.sum()), np.int64)}))(
            b["vid"].to_numpy(zero_copy_only=False),
            b["ind"].to_numpy(zero_copy_only=False),
            b["ind"].to_numpy(zero_copy_only=False) == 0),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    tot = p
    for _ in range(DAG_PATH_ROUNDS):
        p = edges.join(p, join_type="inner", num_partitions=8,
                       on=("src",), right_on=("vid",)) \
            .map_batches(lambda b: pa.table({"vid": b["dst"], "c": b["c"]}),
                         batch_format="pyarrow") \
            .groupby("vid").aggregate(Sum("c", alias_name="c")) \
            .materialize()
        tot = tot.union(p)
    pdf = tot.groupby("vid").aggregate(Sum("c", alias_name="n_paths")) \
        .to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype(np.int64),
                     "n_paths": pdf["n_paths"].to_numpy().astype(np.int64)})


def sql_dag_paths() -> str:
    parts = [
        "kept AS (SELECT src, dst FROM edges WHERE (src*31+dst*17)%9=0)",
        "verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM kept "
        "UNION ALL SELECT dst AS vid FROM kept) u)",
        "p0 AS (SELECT vid, CAST(1 AS BIGINT) AS c FROM verts "
        "WHERE vid NOT IN (SELECT dst FROM kept))",
    ]
    for k in range(1, DAG_PATH_ROUNDS + 1):
        parts.append(
            f"p{k} AS (SELECT e.dst AS vid, sum(p.c) AS c "
            f"FROM p{k-1} p JOIN kept e ON e.src = p.vid GROUP BY e.dst)")
    union = " UNION ALL ".join(
        f"SELECT vid, c FROM p{k}" for k in range(DAG_PATH_ROUNDS + 1))
    return _with_edges(
        ", ".join(parts) +
        f" SELECT vid, CAST(sum(c) AS BIGINT) AS n_paths FROM ({union}) "
        "GROUP BY vid ORDER BY vid")


# ---------- widest (bottleneck) path ----------

WIDEST_ITERS = 6
WIDEST_WMOD = 7
WIDEST_INF = np.int64(1) << 40  # seed capacity sentinel, shared with SQL


def q_widest_path(sf_dir: str) -> pa.Table:
    """Widest-path (maximum-bottleneck) capacities from the smallest
    vid, undirected, deterministic integer weights w(u, v) = 1 +
    (u + v) % WIDEST_WMOD, paths capped at WIDEST_ITERS hops — the
    max-min dual of the Bellman-Ford SSSP (q_sssp): width_k(v) =
    max(width_{k-1}(v), max over edges (u, v) of min(width_{k-1}(u),
    w)).  The (max, min) semiring is idempotent, so the bounded-round
    BSP state (one edges-state join + groupby(max) per round,
    Dataset-resident) is exact int64 and the unrolled oracle matches
    bit for bit.  Routing/QoS: bandwidth of the best path."""
    from ray.data.aggregate import Max
    import ray.data as rd

    edges = cooccurrence_edges(sf_dir)
    ue = edges.map_batches(
        lambda b: (lambda s, d: pa.table({
            "x": np.concatenate([s, d]), "y": np.concatenate([d, s]),
            "w": np.concatenate([1 + (s + d) % WIDEST_WMOD] * 2)}))(
            b["src"].to_numpy(zero_copy_only=False),
            b["dst"].to_numpy(zero_copy_only=False)),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    seed = int(ue.min("x"))
    state = rd.from_arrow(pa.table({
        "vid": pa.array([seed], pa.int64()),
        "wd": pa.array([int(WIDEST_INF)], pa.int64())}))
    for _ in range(WIDEST_ITERS):
        msgs = ue.join(state, join_type="inner", num_partitions=8,
                       on=("x",), right_on=("vid",)) \
            .map_batches(lambda b: pa.table({
                "vid": b["y"],
                "wd": np.minimum(
                    b["wd"].to_numpy(zero_copy_only=False),
                    b["w"].to_numpy(zero_copy_only=False))}),
                batch_format="pyarrow", zero_copy_batch=True)
        state = state.union(msgs).groupby("vid") \
            .aggregate(Max("wd", alias_name="wd")).materialize()
    pdf = state.to_pandas().sort_values("vid")
    return pa.table({"vid": pdf["vid"].to_numpy().astype(np.int64),
                     "width": pdf["wd"].to_numpy().astype(np.int64)})


def sql_widest_path(n_iters: int = WIDEST_ITERS) -> str:
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "ue AS MATERIALIZED (SELECT src AS x, dst AS y, "
        f"1 + (src + dst) % {WIDEST_WMOD} AS w FROM edges "
        "UNION ALL SELECT dst AS x, src AS y, "
        f"1 + (src + dst) % {WIDEST_WMOD} AS w FROM edges)",
        "w0 AS (SELECT (SELECT MIN(src) FROM edges) AS v, "
        f"CAST({int(WIDEST_INF)} AS BIGINT) AS wd)",
    ]
    for k in range(1, n_iters + 1):
        p = f"w{k - 1}"
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT v, MAX(wd) AS wd FROM ("
            f"SELECT v, wd FROM {p} UNION ALL "
            f"SELECT e.y AS v, least(p.wd, e.w) AS wd "
            f"FROM {p} p JOIN ue e ON e.x = p.v) GROUP BY v)")
    return ("WITH " + ", ".join(parts) +
            f" SELECT v AS vid, wd AS width FROM w{n_iters} ORDER BY vid")


# ---------- SSSP parent pointers (path reconstruction) ----------

def q_sssp_parents(sf_dir: str) -> pa.Table:
    """Shortest-path tree with parent pointers — the path-
    reconstruction companion to q_sssp: after the bounded-hop
    Bellman-Ford distances converge, parent(v) = the smallest
    neighbor u with d(u) + w(u, v) = d(v) (deterministic tie-break),
    seed's parent = -1.  One edges-distances join to form candidate
    (v, u) pairs, a d(v)-equality filter via a second hash join, one
    groupby(min) — all Dataset-resident, so reconstruction scales with
    the same shuffle shape as the relaxation itself."""
    from ray.data.aggregate import Min
    import ray.data as rd
    from igpm_pem_ray.graph import sssp as sssp_mod
    from igpm_pem_ray.graph.sssp import WEIGHT_MOD

    edges = cooccurrence_edges(sf_dir).materialize()
    dt = sssp_mod.sssp(edges, n_iters=SSSP_ITERS)
    dd = rd.from_arrow(dt).materialize()
    # q_temporal_pairs join-partition convention: 1 below 65k rows —
    # several concurrent hash joins each spawn num_partitions
    # aggregator actors and deadlock a small CPU pool
    npj = 1 if edges.count() < 65_536 else 8

    ue = edges.map_batches(
        lambda b: (lambda s, d: pa.table({
            "x": np.concatenate([s, d]), "y": np.concatenate([d, s]),
            "w": np.concatenate([1 + (s + d) % WEIGHT_MOD] * 2)}))(
            b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow", zero_copy_batch=True)

    cand = ue.join(dd, join_type="inner", num_partitions=npj,
                   on=("x",), right_on=("vid",)) \
        .map_batches(lambda b: pa.table({
            "yv": b["y"],
            "du": b["dist"].to_numpy(zero_copy_only=False)
            + b["w"].to_numpy(zero_copy_only=False),
            "u": b["x"]}), batch_format="pyarrow", zero_copy_batch=True)
    par = cand.join(dd, join_type="inner", num_partitions=npj,
                    on=("yv",), right_on=("vid",)) \
        .map_batches(lambda b: (lambda y, du, dv, u, m: pa.table({
            "vid": y[m], "parent": u[m]}))(
            b["yv"].to_numpy(zero_copy_only=False),
            b["du"].to_numpy(zero_copy_only=False),
            b["dist"].to_numpy(zero_copy_only=False),
            b["u"].to_numpy(zero_copy_only=False),
            b["du"].to_numpy(zero_copy_only=False)
            == b["dist"].to_numpy(zero_copy_only=False)),
            batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("vid").aggregate(Min("parent", alias_name="parent"))

    out = dd.join(par, join_type="left_outer", num_partitions=npj,
                  on=("vid",), right_on=("vid",))
    pdf = out.to_pandas().sort_values("vid")
    return pa.table({
        "vid": pdf["vid"].to_numpy().astype(np.int64),
        "dist": pdf["dist"].to_numpy().astype(np.int64),
        "parent": pdf["parent"].fillna(-1).to_numpy().astype(np.int64)})


def sql_sssp_parents(n_iters: int = SSSP_ITERS) -> str:
    from igpm_pem_ray.graph.sssp import WEIGHT_MOD

    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "ue AS MATERIALIZED (SELECT src AS x, dst AS y FROM edges "
        "UNION ALL SELECT dst AS x, src AS y FROM edges)",
        "d0 AS (SELECT (SELECT MIN(src) FROM edges) AS v, "
        "CAST(0 AS BIGINT) AS d)",
    ]
    for k in range(1, n_iters + 1):
        p = f"d{k - 1}"
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT v, MIN(d) AS d FROM ("
            f"SELECT v, d FROM {p} UNION ALL "
            f"SELECT e.y AS v, p.d + 1 + ((e.x + e.y) % {WEIGHT_MOD}) AS d "
            f"FROM {p} p JOIN ue e ON e.x = p.v) GROUP BY v)")
    fin = f"d{n_iters}"
    parts.append(
        "cand AS (SELECT e.y AS vid, MIN(a.v) AS parent "
        f"FROM {fin} a JOIN ue e ON e.x = a.v "
        f"JOIN {fin} b ON b.v = e.y "
        f"AND a.d + 1 + ((e.x + e.y) % {WEIGHT_MOD}) = b.d "
        "GROUP BY e.y)")
    return ("WITH " + ", ".join(parts) +
            f" SELECT b.v AS vid, b.d AS dist, "
            "CAST(coalesce(c.parent, -1) AS BIGINT) AS parent "
            f"FROM {fin} b LEFT JOIN cand c ON c.vid = b.v ORDER BY vid")


# ---------- triadic closure rate between time halves ----------

def q_closure_rate(sf_dir: str) -> pa.Table:
    """Triadic closure rate — the link-formation mechanism test: of
    the edges that FIRST appear in the second half of the time range,
    what fraction close a wedge (two-path) that already existed in the
    first half?  Edge birth day = min order day over the pair's shared
    orders, thinned by the shared keep-hash to bound the wedge join.
    Plan: one (pair -> min day) groupby, the epoch split from two
    scalar aggregates, a mid-keyed wedge self-join of the first-half
    edges (deg^2 fan-out — hub-split at web scale, same note as
    q_two_hop), one hash join against the new edges, one-row int64
    summary with a truncated-ratio rate."""
    from ray.data.aggregate import Count, Min as _Min
    from igpm_pem_ray.pipelines.common import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda b: pa.table({
            "ok": b["o_orderkey"].cast(pa.int64()),
            "t": b["o_orderdate"].cast(pa.timestamp("us"))
            .cast(pa.int64()).to_numpy(zero_copy_only=False) // _DAY_US}),
            batch_format="pyarrow", zero_copy_batch=True)
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    inc = li.groupby(["l_orderkey", "l_partkey"]) \
        .aggregate(Count(alias_name="_n")).drop_columns(["_n"]) \
        .map_batches(lambda b: pa.table({
            "k": b["l_orderkey"].cast(pa.int64()),
            "p": b["l_partkey"].cast(pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
    wd = inc.join(orders, join_type="inner", num_partitions=8,
                  on=("k",), right_on=("ok",)).materialize()
    right = wd.map_batches(
        lambda b: pa.table({"k2": b["k"], "p2": b["p"]}),
        batch_format="pyarrow")
    born = wd.join(right, join_type="inner", num_partitions=8,
                   on=("k",), right_on=("k2",)) \
        .map_batches(lambda b: (lambda s, d, t, m: pa.table({
            "src": s[m], "dst": d[m], "t": t[m]}))(
            b["p"].to_numpy(zero_copy_only=False),
            b["p2"].to_numpy(zero_copy_only=False),
            b["t"].to_numpy(zero_copy_only=False),
            (b["p"].to_numpy(zero_copy_only=False)
             < b["p2"].to_numpy(zero_copy_only=False))
            & ((b["p"].to_numpy(zero_copy_only=False) * 31
                + b["p2"].to_numpy(zero_copy_only=False) * 17) % 9 == 0)),
            batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["src", "dst"]).aggregate(_Min("t", alias_name="t0")) \
        .materialize()
    lo = int(born.min("t0"))
    hi = int(born.max("t0"))
    mid = (lo + hi) // 2

    e1 = born.map_batches(
        lambda b: (lambda s, d, t, m: pa.table({"src": s[m], "dst": d[m]}))(
            b["src"].to_numpy(zero_copy_only=False),
            b["dst"].to_numpy(zero_copy_only=False),
            b["t0"].to_numpy(zero_copy_only=False),
            b["t0"].to_numpy(zero_copy_only=False) <= mid),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    e2 = born.map_batches(
        lambda b: (lambda s, d, t, m: pa.table({"na": s[m], "nb": d[m]}))(
            b["src"].to_numpy(zero_copy_only=False),
            b["dst"].to_numpy(zero_copy_only=False),
            b["t0"].to_numpy(zero_copy_only=False),
            b["t0"].to_numpy(zero_copy_only=False) > mid),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    ue1 = e1.map_batches(
        lambda b: pa.table({
            "x": pa.concat_arrays([b["src"].combine_chunks(),
                                   b["dst"].combine_chunks()]),
            "y": pa.concat_arrays([b["dst"].combine_chunks(),
                                   b["src"].combine_chunks()])}),
        batch_format="pyarrow", zero_copy_batch=True)
    cand = ue1.join(ue1.rename_columns({"x": "x2", "y": "y2"}),
                    join_type="inner", num_partitions=8,
                    on=("x",), right_on=("x2",)) \
        .map_batches(lambda b: (lambda a, c, m: pa.table({
            "na": a[m], "nb": c[m]}))(
            b["y"].to_numpy(zero_copy_only=False),
            b["y2"].to_numpy(zero_copy_only=False),
            b["y"].to_numpy(zero_copy_only=False)
            < b["y2"].to_numpy(zero_copy_only=False)),
            batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["na", "nb"]).aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"])

    closing = e2.join(cand, join_type="inner", num_partitions=8,
                      on=("na", "nb"), right_on=("na", "nb"))
    n_new = e2.count()
    n_close = closing.count()
    return pa.table({
        "n_new_edges": pa.array([n_new], pa.int64()),
        "n_closing": pa.array([n_close], pa.int64()),
        "closure_rate_e6": pa.array(
            [1_000_000 * n_close // max(n_new, 1)], pa.int64())})


def sql_closure_rate() -> str:
    return (
        f"WITH od AS (SELECT o_orderkey AS k, epoch_us(o_orderdate) "
        f"// {_DAY_US} AS t FROM orders), "
        "inc AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p "
        "FROM lineitem), "
        "born AS (SELECT a.p AS src, b.p AS dst, min(od.t) AS t0 "
        "FROM inc a JOIN inc b ON a.k = b.k AND a.p < b.p "
        "JOIN od ON od.k = a.k "
        "WHERE (a.p*31 + b.p*17) % 9 = 0 GROUP BY a.p, b.p), "
        "r AS (SELECT (min(t0) + max(t0)) // 2 AS mid FROM born), "
        "e1 AS (SELECT src, dst FROM born, r WHERE t0 <= r.mid), "
        "e2 AS (SELECT src AS na, dst AS nb FROM born, r "
        "WHERE t0 > r.mid), "
        "ue1 AS (SELECT src AS x, dst AS y FROM e1 "
        "UNION ALL SELECT dst, src FROM e1), "
        "cand AS (SELECT DISTINCT a.y AS na, b.y AS nb FROM ue1 a "
        "JOIN ue1 b ON a.x = b.x AND a.y < b.y) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM e2) "
        "AS n_new_edges, "
        "(SELECT CAST(count(*) AS BIGINT) FROM e2 JOIN cand "
        "ON cand.na = e2.na AND cand.nb = e2.nb) AS n_closing, "
        "CAST(1000000 * (SELECT count(*) FROM e2 JOIN cand "
        "ON cand.na = e2.na AND cand.nb = e2.nb) "
        "// greatest((SELECT count(*) FROM e2), 1) AS BIGINT) "
        "AS closure_rate_e6")


# ---------- community conductance (per-brand cut quality) ----------

def q_conductance(sf_dir: str) -> pa.Table:
    """Conductance of each brand-induced vertex community on the
    co-occurrence graph — the standard cut-quality score phi(S) =
    cut(S) / min(vol(S), 2m - vol(S)), reported as exact integer
    (cut, vol) pairs plus phi scaled e6 by truncated division, so no
    float ever enters.  Plan: part->brand map broadcast once
    (ray.put), one pass tags each edge's endpoints, per-brand cut/vol
    from two tiny groupbys.  Communities here are labels, not
    detected — the metric that VALIDATES a community detector."""
    import ray as _ray
    from ray.data.aggregate import Sum as _Sum
    from igpm_pem_ray.pipelines.common import read_table

    parts = read_table(sf_dir, "part",
                       columns=["p_partkey", "p_brand"]).to_pandas()
    bmap = dict(zip(parts["p_partkey"].astype(np.int64),
                    parts["p_brand"]))
    brands = sorted(set(bmap.values()))
    bidx = {b: i for i, b in enumerate(brands)}
    arr = np.full(int(parts["p_partkey"].max()) + 1, -1, np.int64)
    for k, b in bmap.items():
        arr[k] = bidx[b]
    ref = _ray.put(arr)

    edges = cooccurrence_edges(sf_dir)

    def tag(b: pa.Table, _ref=ref) -> pa.Table:
        a = _ray.get(_ref)
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        bs, bd = a[s], a[d]
        cross = (bs != bd).astype(np.int64)
        return pa.table({
            "brand": np.concatenate([bs, bd]),
            "vol": np.ones(2 * len(s), np.int64),
            "cut": np.concatenate([cross, cross])})

    agg = edges.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("brand").aggregate(_Sum("vol", alias_name="vol"),
                                    _Sum("cut", alias_name="cut"))
    pdf = agg.to_pandas().sort_values("brand")
    vol = pdf["vol"].to_numpy().astype(np.int64)
    cut = pdf["cut"].to_numpy().astype(np.int64)
    two_m = int(vol.sum())
    den = np.minimum(vol, two_m - vol)
    phi = np.where(den > 0, 1_000_000 * cut // np.maximum(den, 1), 0)
    return pa.table({
        "brand": pa.array([brands[i] for i in pdf["brand"]], pa.string()),
        "vol": vol, "cut": cut, "phi_e6": phi})


def sql_conductance() -> str:
    return _with_edges(
        "lab AS (SELECT p_partkey AS k, p_brand AS b FROM part), "
        "te AS (SELECT ls.b AS bs, ld.b AS bd FROM edges e "
        "JOIN lab ls ON ls.k = e.src JOIN lab ld ON ld.k = e.dst), "
        "sides AS (SELECT bs AS brand, "
        "CASE WHEN bs != bd THEN 1 ELSE 0 END AS cut FROM te "
        "UNION ALL SELECT bd AS brand, "
        "CASE WHEN bs != bd THEN 1 ELSE 0 END AS cut FROM te), "
        "agg AS (SELECT brand, count(*) AS vol, sum(cut) AS cut "
        "FROM sides GROUP BY brand), "
        "m AS (SELECT sum(vol) AS two_m FROM agg) "
        "SELECT brand, CAST(vol AS BIGINT) AS vol, "
        "CAST(cut AS BIGINT) AS cut, "
        "CAST(CASE WHEN least(vol, m.two_m - vol) > 0 "
        "THEN 1000000 * cut // least(vol, m.two_m - vol) "
        "ELSE 0 END AS BIGINT) AS phi_e6 "
        "FROM agg, m")


# ---------- friendship paradox ----------

def q_friendship_paradox(sf_dir: str) -> pa.Table:
    """Friendship-paradox census: how many vertices have strictly
    fewer connections than the AVERAGE of their neighbors (Feld's
    classic 'your friends have more friends than you')?  Exact
    integer comparison deg(v) * n_nbrs(v) < sum of neighbor degrees —
    no division.  One degree groupby joined back across the edge list
    (degree vector broadcast via ray.put), one (vertex) sum groupby,
    one counting reduce; reports the paradox fraction e6."""
    import ray as _ray
    from ray.data.aggregate import Sum as _Sum

    edges = cooccurrence_edges(sf_dir).materialize()

    def both(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": np.concatenate([s, d])})

    from ray.data.aggregate import Count as _Count

    degp = edges.map_batches(both, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("vid").aggregate(_Count(alias_name="deg")).to_pandas()
    dv = np.zeros(int(degp["vid"].max()) + 1, np.int64)
    dv[degp["vid"].to_numpy()] = degp["deg"].to_numpy()
    ref = _ray.put(dv)

    def nbr(b: pa.Table, _ref=ref) -> pa.Table:
        d = _ray.get(_ref)
        s = b["src"].to_numpy(zero_copy_only=False)
        t = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": np.concatenate([s, t]),
                         "nd": np.concatenate([d[t], d[s]])})

    per_v = edges.map_batches(nbr, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("vid").aggregate(_Sum("nd", alias_name="snd"),
                                  _Count(alias_name="n_nbrs"))

    def partial(b: pa.Table, _ref=ref) -> pa.Table:
        d = _ray.get(_ref)
        v = b["vid"].to_numpy(zero_copy_only=False)
        snd = b["snd"].to_numpy(zero_copy_only=False)
        nn = b["n_nbrs"].to_numpy(zero_copy_only=False)
        par = d[v] * nn < snd
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "p": pa.array([int(par.sum())], pa.int64())})

    pr = per_v.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    n = int(pr.sum("n") or 0)
    p = int(pr.sum("p") or 0)
    return pa.table({
        "n_vertices": pa.array([n], pa.int64()),
        "n_paradox": pa.array([p], pa.int64()),
        "frac_e6": pa.array([1_000_000 * p // max(n, 1)], pa.int64())})


def sql_friendship_paradox() -> str:
    return _with_edges(
        "ue AS (SELECT src AS x, dst AS y FROM edges "
        "UNION ALL SELECT dst, src FROM edges), "
        "deg AS (SELECT x AS vid, count(*) AS d FROM ue GROUP BY x), "
        "nb AS (SELECT u.x AS vid, sum(dd.d) AS snd, count(*) AS nn "
        "FROM ue u JOIN deg dd ON dd.vid = u.y GROUP BY u.x), "
        "t AS (SELECT count(*) AS n, sum(CASE WHEN dv.d * nb.nn < nb.snd "
        "THEN 1 ELSE 0 END) AS p FROM nb JOIN deg dv "
        "ON dv.vid = nb.vid) "
        "SELECT CAST(n AS BIGINT) AS n_vertices, "
        "CAST(p AS BIGINT) AS n_paradox, "
        "CAST(1000000 * p // greatest(n, 1) AS BIGINT) AS frac_e6 "
        "FROM t")


# ---------- bipartiteness check (odd-cycle witness census) ----------

def q_bipartite_check(sf_dir: str) -> pa.Table:
    """Two-colorability test on the BFS-reached subgraph: color each
    vertex by BFS-level parity (graph/bfs.py levels, same cap as
    q_bfs_levels) and count monochromatic edges — each one witnesses
    an odd cycle, and zero of them on a fully-reached component
    proves it bipartite.  One levels join across the edge list (level
    table broadcast as a dense vector), per-block integer partials.
    Reports checked/odd-edge counts and the bipartite verdict for the
    reached subgraph."""
    import ray as _ray
    from igpm_pem_ray.graph import bfs as bfs_mod

    edges = cooccurrence_edges(sf_dir).materialize()
    t = bfs_mod.bfs_levels(edges, max_depth=BFS_MAX_DEPTH)
    vids = t["vid"].to_numpy()
    lvl = t["level"].to_numpy()
    arr = np.full(int(vids.max()) + 1, -1, np.int64)
    arr[vids] = lvl % 2
    ref = _ray.put(arr)

    def partial(b: pa.Table, _ref=ref) -> pa.Table:
        c = _ray.get(_ref)
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        in_reach = (s < len(c)) & (d < len(c))
        s, d = s[in_reach], d[in_reach]
        both = (c[s] >= 0) & (c[d] >= 0)
        odd = both & (c[s] == c[d])
        return pa.table({"n_checked": pa.array([int(both.sum())],
                                               pa.int64()),
                         "n_odd": pa.array([int(odd.sum())], pa.int64())})

    p = edges.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    checked = int(p.sum("n_checked") or 0)
    odd = int(p.sum("n_odd") or 0)
    return pa.table({
        "n_edges_checked": pa.array([checked], pa.int64()),
        "n_odd_edges": pa.array([odd], pa.int64()),
        "is_bipartite": pa.array([int(odd == 0)], pa.int64())})


def sql_bipartite_check() -> str:
    return _with_edges(
        "ue AS (SELECT src AS x, dst AS y FROM edges "
        "UNION ALL SELECT dst AS x, src AS y FROM edges), "
        "lv(v, d) AS (SELECT (SELECT MIN(src) FROM edges), 0 "
        "UNION SELECT e.y, lv.d + 1 FROM lv JOIN ue e ON e.x = lv.v "
        f"WHERE lv.d < {BFS_MAX_DEPTH}), "
        "col AS (SELECT v, MIN(d) % 2 AS c FROM lv GROUP BY v), "
        "t AS (SELECT count(*) AS checked, "
        "sum(CASE WHEN ca.c = cb.c THEN 1 ELSE 0 END) AS odd "
        "FROM edges e JOIN col ca ON ca.v = e.src "
        "JOIN col cb ON cb.v = e.dst) "
        "SELECT CAST(checked AS BIGINT) AS n_edges_checked, "
        "CAST(odd AS BIGINT) AS n_odd_edges, "
        "CAST(CASE WHEN odd = 0 THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_bipartite FROM t")


# ---------- greedy 2-approx vertex cover (matching endpoints) ----------

def q_vertex_cover(sf_dir: str) -> pa.Table:
    """Vertex cover from maximal-matching endpoints — the classic
    2-approximation (every cover must pick >= 1 endpoint of each
    matched edge, so |cover| = 2|M| <= 2 OPT): compose the bounded-
    round distributed matching (q_matching) and take both endpoints
    of every matched edge.  With bounded rounds a residue of live
    edges can remain; they are counted honestly as uncovered (the
    guarantee applies to the matched subgraph).  One distinct-
    endpoints pass + one broadcast coverage count."""
    import ray as _ray
    from igpm_pem_ray.graph.matching import maximal_matching

    edges = cooccurrence_edges(sf_dir).materialize()
    matched = maximal_matching(edges, rounds=MATCH_ROUNDS)
    mp = matched.to_pandas() if hasattr(matched, "to_pandas") else None
    if mp is None or not len(mp):
        cover = np.array([], np.int64)
    else:
        cover = np.unique(np.concatenate([
            mp["src"].to_numpy().astype(np.int64),
            mp["dst"].to_numpy().astype(np.int64)]))
    ref = _ray.put(cover)

    def partial(b: pa.Table, _ref=ref) -> pa.Table:
        cv = _ray.get(_ref)
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        unc = ~(np.isin(s, cv) | np.isin(d, cv))
        return pa.table({"n": pa.array([len(s)], pa.int64()),
                         "u": pa.array([int(unc.sum())], pa.int64())})

    p = edges.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    return pa.table({
        "n_cover": pa.array([len(cover)], pa.int64()),
        "n_edges": pa.array([int(p.sum("n") or 0)], pa.int64()),
        "n_uncovered": pa.array([int(p.sum("u") or 0)], pa.int64())})


def sql_vertex_cover() -> str:
    A, B, C, M = 1_103_515_245, 69_069, 12_345, (1 << 31) - 1
    parts = ["live0 AS (SELECT src, dst FROM edges)"]
    for r in range(1, MATCH_ROUNDS + 1):
        parts += [
            f"p{r} AS (SELECT src, dst, ((src % {M}) * {A} + "
            f"(dst % {M}) * {B} + {r} * {C}) % {M} AS pri "
            f"FROM live{r - 1})",
            f"i{r} AS (SELECT src AS v, pri, src, dst FROM p{r} "
            f"UNION ALL SELECT dst AS v, pri, src, dst FROM p{r})",
            f"c{r} AS (SELECT v, src, dst FROM (SELECT v, src, dst, "
            "row_number() OVER (PARTITION BY v ORDER BY pri, src, dst) "
            f"AS rn FROM i{r}) WHERE rn = 1)",
            f"w{r} AS (SELECT p.src, p.dst FROM p{r} p "
            f"JOIN c{r} a ON a.v = p.src AND a.src = p.src "
            "AND a.dst = p.dst "
            f"JOIN c{r} b ON b.v = p.dst AND b.src = p.src "
            "AND b.dst = p.dst)",
            f"mv{r} AS (SELECT src AS v FROM w{r} "
            f"UNION SELECT dst AS v FROM w{r})",
            f"live{r} AS (SELECT src, dst FROM p{r} "
            f"WHERE src NOT IN (SELECT v FROM mv{r}) "
            f"AND dst NOT IN (SELECT v FROM mv{r}))",
        ]
    mw = " UNION ALL ".join(
        f"SELECT src, dst FROM w{r}" for r in range(1, MATCH_ROUNDS + 1))
    return (
        f"WITH edges AS ({EDGES_SQL}), {', '.join(parts)}, "
        f"cov AS (SELECT DISTINCT v FROM (SELECT src AS v FROM ({mw}) "
        f"UNION ALL SELECT dst AS v FROM ({mw})) u) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM cov) AS n_cover, "
        "(SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges, "
        "(SELECT CAST(count(*) AS BIGINT) FROM edges e "
        "WHERE e.src NOT IN (SELECT v FROM cov) "
        "AND e.dst NOT IN (SELECT v FROM cov)) AS n_uncovered")


# -------- independent-cascade influence spread --------

IC_A1, IC_A2, IC_C, IC_M = 1_103_515_245, 69_069, 12_345, (1 << 31) - 1
IC_PCT = 30      # per-edge activation probability, percent
IC_SEEDS = 5     # top-degree seed set size
IC_TRIALS = 3    # deterministic cascade realizations
IC_ROUNDS = 4    # bounded diffusion rounds (SQL-unrollable)


def q_influence_spread(sf_dir: str) -> pa.Table:
    """Independent-cascade influence spread (Kempe-Kleinberg-Tardos
    KDD 2003) from the top-degree seed set: each undirected edge
    flips ONE deterministic hash coin per trial (the affine residue
    convention shared with q_vertex_cover, percent threshold IC_PCT),
    and activation BFS runs IC_ROUNDS bounded rounds on the kept
    subgraph — the spread estimator inside every influence-
    maximization loop, made reproducible by hash coins so the kernel
    and the unrolled SQL oracle agree row for row.

    Scale shape: seed selection is one endpoint-explode groupby
    (top-K merge is O(K)); each trial filters edges with a stateless
    vectorized map and runs the dense multi-source msg_pass(min)
    sweep (V < 2^31 asserted at build; the V-unbounded sibling is the
    msbfs_shuffle plan with seeds as one chunk).  Trials are
    independent — at fleet scale they fan out as separate jobs."""
    import ray as _ray
    from ray.data.aggregate import Count
    from igpm_pem_ray.graph.dense import msg_pass

    edges = cooccurrence_edges(sf_dir).materialize()

    ends = edges.map_batches(
        lambda b: pa.table({"v": pa.concat_arrays(
            [b["src"].cast(pa.int64()).combine_chunks(),
             b["dst"].cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow")
    topd = ends.groupby("v").aggregate(Count(alias_name="d")) \
        .sort(["d", "v"], descending=[True, False]).limit(IC_SEEDS) \
        .to_pandas()
    seeds = topd["v"].to_numpy().astype(np.int64)

    UNREACHED = np.int64(1) << 40
    rows = []
    for t in range(IC_TRIALS):
        def keep(b: pa.Table, _t=t) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            h = ((s % IC_M) * IC_A1 + (d % IC_M) * IC_A2
                 + _t * IC_C) % IC_M % 100
            m = h < IC_PCT
            return pa.table({"src": s[m], "dst": d[m]})

        kept = edges.map_batches(keep, batch_format="pyarrow",
                                 zero_copy_batch=True)
        n_kept = kept.count()
        if n_kept == 0:
            rows.append((t, len(seeds), 0))
            continue
        g = build_dense_graph(kept)
        dist = np.full(g.num_vertices, UNREACHED, np.int64)
        pos = np.searchsorted(g.vids, seeds)
        in_g = (pos < g.num_vertices)
        in_g[in_g] = g.vids[pos[in_g]] == seeds[in_g]
        dist[pos[in_g]] = 0
        directions = "out" if g.symmetric else "both"
        for _ in range(IC_ROUNDS):
            msgs = msg_pass(g, dist, reduce="min", init=UNREACHED,
                            directions=directions)
            new = np.minimum(dist, msgs + 1)
            if np.array_equal(new, dist):
                break
            dist = new
        n_act = int((dist < UNREACHED).sum()) + int((~in_g).sum())
        rows.append((t, n_act, n_kept))
    return pa.table({
        "trial": pa.array([r[0] for r in rows], pa.int64()),
        "n_activated": pa.array([r[1] for r in rows], pa.int64()),
        "n_kept_edges": pa.array([r[2] for r in rows], pa.int64())})


def sql_influence_spread() -> str:
    parts = [
        f"edges AS ({EDGES_SQL})",
        "deg AS (SELECT v, count(*) AS d FROM (SELECT src AS v "
        "FROM edges UNION ALL SELECT dst AS v FROM edges) GROUP BY v)",
        f"seeds AS (SELECT v FROM deg ORDER BY d DESC, v LIMIT {IC_SEEDS})",
        f"tr AS (SELECT unnest(range({IC_TRIALS})) AS t)",
        "keep AS (SELECT tr.t, e.src, e.dst FROM edges e, tr "
        f"WHERE ((e.src % {IC_M}) * {IC_A1} + (e.dst % {IC_M}) * {IC_A2} "
        f"+ tr.t * {IC_C}) % {IC_M} % 100 < {IC_PCT})",
        "r0 AS (SELECT tr.t, s.v FROM seeds s, tr)",
    ]
    for i in range(1, IC_ROUNDS + 1):
        parts.append(
            f"r{i} AS (SELECT DISTINCT t, v FROM ("
            f"SELECT p.t, k.dst AS v FROM r{i - 1} p "
            "JOIN keep k ON k.t = p.t AND k.src = p.v "
            f"UNION ALL SELECT p.t, k.src FROM r{i - 1} p "
            "JOIN keep k ON k.t = p.t AND k.dst = p.v "
            f"UNION ALL SELECT t, v FROM r{i - 1}))")
    return (
        f"WITH {', '.join(parts)} "
        "SELECT CAST(tr.t AS BIGINT) AS trial, "
        f"CAST((SELECT count(*) FROM r{IC_ROUNDS} r WHERE r.t = tr.t) "
        "AS BIGINT) AS n_activated, "
        "CAST((SELECT count(*) FROM keep k WHERE k.t = tr.t) "
        "AS BIGINT) AS n_kept_edges "
        "FROM tr ORDER BY tr.t")


# -------- exact 4-clique count --------

def q_clique4_count(sf_dir: str) -> pa.Table:
    """Exact K4 (4-clique) count — completes the graphlet census next
    to triangles (K3), 4-cycles (q_quad_count), butterflies (K2,2)
    and the triad census.  Identity: in a K4 {a<b<c<d} exactly one
    PAIR of triangles shares the two smallest vertices ((a,b,c),
    (a,b,d) on (a,b)), and the remaining pair (c,d) must close — so
    count = |triangle pairs sharing (u,v), w1<w2, with (w1,w2) an
    edge|, each K4 counted exactly once (no division).

    Plan: pure Dataset joins on the canonical src<dst edge table —
    wedge join (u,v)x(u,w) -> close (v,w) -> triangle table u<v<w;
    triangle self-join on (u,v); closing-edge semi-join.  Each join
    is an equi hash shuffle; skew rides on the codegree of (u,v)
    pairs, bounded by the co-occurrence group sizes (at web scale the
    wedge join is degree-oriented first, as in graph/triangles.py)."""
    edges = cooccurrence_edges(sf_dir).materialize()

    e_uv = edges.rename_columns({"src": "u", "dst": "v"})
    e_uw = edges.rename_columns({"src": "u2", "dst": "w"})
    n_e = edges.count()
    np_join = 1 if n_e < 65_536 else min(32, max(8, n_e // 200_000))
    wedge = e_uv.join(e_uw, join_type="inner", num_partitions=np_join,
                      on=("u",), right_on=("u2",))

    def vw(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        m = v < w
        return pa.table({"u": b["u"].to_numpy(zero_copy_only=False)[m],
                         "v": v[m], "w": w[m]})

    wedges = wedge.map_batches(vw, batch_format="pyarrow",
                               zero_copy_batch=True)
    e_close = edges.rename_columns({"src": "cv", "dst": "cw"})
    tri = wedges.join(e_close, join_type="inner", num_partitions=np_join,
                      on=("v", "w"), right_on=("cv", "cw")) \
        .select_columns(["u", "v", "w"]).materialize()

    t2 = tri.rename_columns({"u": "u2", "v": "v2", "w": "w2"})
    pairs = tri.join(t2, join_type="inner", num_partitions=np_join,
                     on=("u", "v"), right_on=("u2", "v2"))

    def ordered(b: pa.Table) -> pa.Table:
        w1 = b["w"].to_numpy(zero_copy_only=False)
        w2 = b["w2"].to_numpy(zero_copy_only=False)
        m = w1 < w2
        return pa.table({"w1": w1[m], "w2": w2[m]})

    cand = pairs.map_batches(ordered, batch_format="pyarrow",
                             zero_copy_batch=True)
    e_fin = edges.rename_columns({"src": "w1f", "dst": "w2f"})
    k4 = cand.join(e_fin, join_type="inner", num_partitions=np_join,
                   on=("w1", "w2"), right_on=("w1f", "w2f"))
    return pa.table({
        "n_triangles": pa.array([tri.count()], pa.int64()),
        "n_4cliques": pa.array([k4.count()], pa.int64())})


def sql_clique4_count() -> str:
    return (
        f"WITH edges AS ({EDGES_SQL}), "
        "tri AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w "
        "FROM edges e1 JOIN edges e2 ON e1.src = e2.src "
        "AND e1.dst < e2.dst "
        "JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst), "
        "k4 AS (SELECT t1.u, t1.v, t1.w AS w1, t2.w AS w2 "
        "FROM tri t1 JOIN tri t2 ON t1.u = t2.u AND t1.v = t2.v "
        "AND t1.w < t2.w "
        "JOIN edges e ON e.src = t1.w AND e.dst = t2.w) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM tri) "
        "AS n_triangles, "
        "(SELECT CAST(count(*) AS BIGINT) FROM k4) AS n_4cliques")


# -------- landmark distance oracle (ALT bounds) --------

LM_COUNT = 4    # top-degree landmarks
LM_DEPTH = 6    # bounded BFS depth (SQL-unrollable)
LM_TOPV = 12    # query pairs = all pairs of the top-LM_TOPV degree vertices


def q_landmark_distance(sf_dir: str) -> pa.Table:
    """ALT-style landmark distance oracle (Goldberg-Harrelson SODA
    2005): precompute BFS distances from LM_COUNT top-degree
    landmarks, then answer query pairs (u, v) with the triangle-
    inequality sandwich  max_l |d(l,u) - d(l,v)|  <=  d(u,v)  <=
    min_l d(l,u) + d(l,v)  — the distance-index class behind
    point-to-point routing and shortest-path pruning at scales where
    per-query BFS is unaffordable.  Landmarks that do not reach both
    endpoints within LM_DEPTH hops contribute no bound; pairs no
    landmark covers are omitted (both conventions shared with the
    SQL oracle's unrolled BFS).

    Scale shape: landmark selection is one endpoint-explode groupby;
    each landmark BFS is the dense msg_pass(min) sweep (the
    V-unbounded sibling is msbfs_shuffle with landmarks as one
    chunk, which also carries all L distance lanes in ONE pass);
    bound assembly touches only the O(TOPV^2) query pairs."""
    from ray.data.aggregate import Count
    from igpm_pem_ray.graph.bfs import bfs_levels_dense, _UNREACHED
    from igpm_pem_ray.graph.dense import build_dense_graph

    edges = cooccurrence_edges(sf_dir).materialize()
    ends = edges.map_batches(
        lambda b: pa.table({"v": pa.concat_arrays(
            [b["src"].cast(pa.int64()).combine_chunks(),
             b["dst"].cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow")
    topd = ends.groupby("v").aggregate(Count(alias_name="d")) \
        .sort(["d", "v"], descending=[True, False]).limit(LM_TOPV) \
        .to_pandas()
    topv = topd["v"].to_numpy().astype(np.int64)
    landmarks = topv[:LM_COUNT]

    g = build_dense_graph(edges)
    pos = np.searchsorted(g.vids, topv)
    ok = (pos < g.num_vertices)
    ok[ok] = g.vids[pos[ok]] == topv[ok]
    dmats = []   # per landmark: distances at the top vertices
    for lm in landmarks:
        dist = bfs_levels_dense(g, int(lm), max_depth=LM_DEPTH)
        dv = np.full(len(topv), np.int64(_UNREACHED))
        dv[ok] = dist[pos[ok]]
        dmats.append(dv)
    D = np.stack(dmats)          # (L, TOPV)

    us, vs, lbs, ubs = [], [], [], []
    for i in range(len(topv)):
        for j in range(i + 1, len(topv)):
            both = (D[:, i] < _UNREACHED) & (D[:, j] < _UNREACHED)
            if not both.any():
                continue
            di, dj = D[both, i], D[both, j]
            us.append(int(topv[i]) if topv[i] < topv[j]
                      else int(topv[j]))
            vs.append(int(topv[j]) if topv[i] < topv[j]
                      else int(topv[i]))
            lbs.append(int(np.abs(di - dj).max()))
            ubs.append(int((di + dj).min()))
    t = pa.table({"u": pa.array(us, pa.int64()),
                  "v": pa.array(vs, pa.int64()),
                  "dist_lb": pa.array(lbs, pa.int64()),
                  "dist_ub": pa.array(ubs, pa.int64())})
    return t


def sql_landmark_distance() -> str:
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "adj AS MATERIALIZED (SELECT src AS u, dst AS v FROM edges "
        "UNION ALL SELECT dst AS u, src AS v FROM edges)",
        "deg AS (SELECT v, count(*) AS d FROM (SELECT src AS v "
        "FROM edges UNION ALL SELECT dst AS v FROM edges) GROUP BY v)",
        f"topv AS (SELECT v FROM deg ORDER BY d DESC, v LIMIT {LM_TOPV})",
        "lms AS (SELECT v AS lm FROM (SELECT v, row_number() OVER "
        "(ORDER BY d DESC, v) AS rn FROM deg) "
        f"WHERE rn <= {LM_COUNT})",
        "n0 AS (SELECT lm, lm AS v, 0 AS lvl FROM lms)",
        "reach0 AS (SELECT lm, v FROM n0)",
    ]
    for i in range(1, LM_DEPTH + 1):
        parts += [
            f"f{i} AS MATERIALIZED (SELECT DISTINCT p.lm, x.v "
            f"FROM n{i - 1} p JOIN adj x ON x.u = p.v)",
            f"n{i} AS MATERIALIZED (SELECT f.lm, f.v, {i} AS lvl "
            f"FROM f{i} f "
            f"WHERE NOT EXISTS (SELECT 1 FROM reach{i - 1} r "
            "WHERE r.lm = f.lm AND r.v = f.v))",
            f"reach{i} AS MATERIALIZED (SELECT lm, v FROM reach{i - 1} "
            f"UNION ALL SELECT lm, v FROM n{i})",
        ]
    dist = " UNION ALL ".join(
        f"SELECT lm, v, lvl FROM n{i}" for i in range(LM_DEPTH + 1))
    parts.append(f"d AS ({dist})")
    return (
        f"WITH {', '.join(parts)}, "
        "q AS (SELECT a.v AS u, b.v AS v FROM topv a "
        "JOIN topv b ON a.v < b.v) "
        "SELECT CAST(q.u AS BIGINT) AS u, CAST(q.v AS BIGINT) AS v, "
        "CAST(max(abs(du.lvl - dv.lvl)) AS BIGINT) AS dist_lb, "
        "CAST(min(du.lvl + dv.lvl) AS BIGINT) AS dist_ub "
        "FROM q JOIN d du ON du.v = q.u "
        "JOIN d dv ON dv.v = q.v AND dv.lm = du.lm "
        "GROUP BY q.u, q.v")


# -------- pointer doubling (parallel path resolution) --------

PJ_ROUNDS = 6   # 2^6 = 64-hop resolution per vertex


def q_pointer_jump(sf_dir: str) -> pa.Table:
    """Pointer jumping / path doubling — the classic PRAM list-
    ranking primitive (Wyllie 1979) behind redirect-chain resolution,
    union-find halving and parallel tree rooting: every vertex
    follows succ(v) = min co-occurrence successor (src < dst, so the
    functional graph is acyclic and chains strictly increase), sinks
    self-loop, and PJ_ROUNDS doubling rounds resolve 2^PJ_ROUNDS
    hops — pointer AND hop distance both double per round
    (d' = d(v) + d(f(v)), f' = f(f(v))), so depth comes out exact.

    Scale shape: succ is ONE groupby-min; the state stays a
    Dataset-resident (v, nxt, d) table across rounds, each round ONE
    hash self-join on nxt = v — log(diameter) shuffles total, the
    doubling trick that turns O(chain-length) sequential chasing
    into 6 rounds.  No driver state beyond the loop counter."""
    from ray.data.aggregate import Min

    edges = cooccurrence_edges(sf_dir).materialize()
    succ = edges.groupby("src").aggregate(Min("dst", alias_name="nxt"))

    # sinks (vertices with no outgoing edge) self-loop with d = 0
    ends = edges.map_batches(
        lambda b: pa.table({"v": pa.concat_arrays(
            [b["src"].cast(pa.int64()).combine_chunks(),
             b["dst"].cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow")
    verts = ends.groupby("v").aggregate(Min("v", alias_name="vv")) \
        .select_columns(["v"])
    sm = succ.map_batches(
        lambda b: pa.table({"sv": b["src"].cast(pa.int64()),
                            "nxt": b["nxt"].cast(pa.int64())}),
        batch_format="pyarrow")
    npj = 1 if edges.count() < 65_536 else 8
    state = verts.join(sm, join_type="left_outer", num_partitions=npj,
                       on=("v",), right_on=("sv",))

    def init(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False)
        nxt = b["nxt"].to_numpy(zero_copy_only=False)
        has = ~pa.compute.is_null(b["nxt"]).to_numpy(zero_copy_only=False)
        nn = np.where(has, np.nan_to_num(nxt.astype(np.float64))
                      .astype(np.int64), v)
        return pa.table({"v": v.astype(np.int64), "nxt": nn,
                         "d": has.astype(np.int64)})

    st = state.map_batches(init, batch_format="pyarrow").materialize()
    for _ in range(PJ_ROUNDS):
        other = st.map_batches(
            lambda b: pa.table({"v2": b["v"], "nxt2": b["nxt"],
                                "d2": b["d"]}), batch_format="pyarrow")
        j = st.join(other, join_type="inner", num_partitions=npj,
                    on=("nxt",), right_on=("v2",))
        st = j.map_batches(
            lambda b: pa.table({
                "v": b["v"],
                "nxt": b["nxt2"],
                "d": pa.compute.add(b["d"], b["d2"])}),
            batch_format="pyarrow").materialize()
    return st.rename_columns({"nxt": "root", "d": "depth"}) \
        .sort("v")


def sql_pointer_jump() -> str:
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "verts AS (SELECT DISTINCT v FROM (SELECT src AS v FROM edges "
        "UNION ALL SELECT dst AS v FROM edges))",
        "succ AS (SELECT src AS v, min(dst) AS nxt FROM edges "
        "GROUP BY src)",
        "s0 AS MATERIALIZED (SELECT verts.v, "
        "COALESCE(succ.nxt, verts.v) AS nxt, "
        "CASE WHEN succ.nxt IS NULL THEN 0 ELSE 1 END AS d "
        "FROM verts LEFT JOIN succ ON succ.v = verts.v)",
    ]
    for i in range(1, PJ_ROUNDS + 1):
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT a.v, b.nxt, a.d + b.d AS d "
            f"FROM s{i - 1} a JOIN s{i - 1} b ON b.v = a.nxt)")
    return (
        f"WITH {', '.join(parts)} "
        "SELECT CAST(v AS BIGINT) AS v, CAST(nxt AS BIGINT) AS root, "
        f"CAST(d AS BIGINT) AS depth FROM s{PJ_ROUNDS} ORDER BY v")


# -------- bill-of-materials explosion (path-product DP) --------

BOM_DEPTH = 4    # bounded explosion depth (SQL-unrollable)
BOM_ROOTS = 3    # smallest vids with outgoing edges


def q_bom_explode(sf_dir: str) -> pa.Table:
    """Bill-of-materials requirements explosion: on the acyclic
    co-occurrence DAG (src < dst) with deterministic per-edge
    quantities q = 1 + (src + dst) mod 3, the total requirement of
    component t for root r is  sum over r->t paths of the PRODUCT of
    edge quantities — the (+, x) path semiring, the multiplicative
    sibling of q_dag_paths (counting, q=1) and q_widest_path
    ((max, min)).  Depth-bounded at BOM_DEPTH levels, roots = the
    BOM_ROOTS smallest vids with outgoing edges (both conventions
    shared with the unrolled SQL oracle).

    Scale shape: classic relational DP — each level is ONE hash join
    of the requirement frontier against the edge table on the
    expansion key plus a (root, part) groupby-sum; quantities and
    path products stay int64 (q <= 3, depth <= 4 => product <= 81,
    path counts bounded by the DAG fan-out)."""
    from ray.data.aggregate import Sum as _Sum, Min as _Min

    edges = cooccurrence_edges(sf_dir).materialize()

    def with_q(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": s, "dst": d, "q": (s + d) % 3 + 1})

    eq = edges.map_batches(with_q, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    roots = eq.groupby("src").aggregate(_Min("src", alias_name="r")) \
        .sort("src").limit(BOM_ROOTS).to_pandas()["src"] \
        .to_numpy().astype(np.int64)
    rset = set(int(x) for x in roots)

    def seed(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        m = np.isin(s, roots)
        return pa.table({"root": s[m],
                         "part": b["dst"].to_numpy(
                             zero_copy_only=False)[m],
                         "qty": b["q"].to_numpy(
                             zero_copy_only=False)[m]})

    frontier = eq.map_batches(seed, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    levels = [frontier]
    for _ in range(1, BOM_DEPTH):
        npj = 1 if eq.count() < 65_536 else 8
        nxt = frontier.join(
            eq.rename_columns({"src": "esrc", "dst": "edst",
                               "q": "eq_"}),
            join_type="inner", num_partitions=npj,
            on=("part",), right_on=("esrc",))
        frontier = nxt.map_batches(
            lambda b: pa.table({
                "root": b["root"],
                "part": b["edst"],
                "qty": pa.compute.multiply(b["qty"], b["eq_"])}),
            batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
        levels.append(frontier)
    allv = levels[0]
    for extra in levels[1:]:
        allv = allv.union(extra)
    return allv.groupby(["root", "part"]).aggregate(
        _Sum("qty", alias_name="total_qty"))


def sql_bom_explode() -> str:
    parts = [
        f"edges AS MATERIALIZED (SELECT src, dst, "
        f"(src + dst) % 3 + 1 AS q FROM ({EDGES_SQL}))",
        "roots AS (SELECT DISTINCT src AS r FROM edges "
        f"ORDER BY r LIMIT {BOM_ROOTS})",
        "l1 AS (SELECT e.src AS root, e.dst AS part, e.q AS qty "
        "FROM edges e JOIN roots ON roots.r = e.src)",
    ]
    for i in range(2, BOM_DEPTH + 1):
        parts.append(
            f"l{i} AS (SELECT p.root, e.dst AS part, p.qty * e.q AS qty "
            f"FROM l{i - 1} p JOIN edges e ON e.src = p.part)")
    un = " UNION ALL ".join(
        f"SELECT root, part, qty FROM l{i}"
        for i in range(1, BOM_DEPTH + 1))
    return (
        f"WITH {', '.join(parts)} "
        "SELECT CAST(root AS BIGINT) AS root, "
        "CAST(part AS BIGINT) AS part, "
        f"CAST(sum(qty) AS BIGINT) AS total_qty FROM ({un}) "
        "GROUP BY root, part")


# -------- local PPR push (Andersen-Chung-Lang) --------

PUSH_SCALE = 4 ** 10   # seed residual mass (dyadic, exact under //4)
PUSH_THETA = 16        # push threshold on the integer residual
PUSH_ROUNDS = 4        # synchronous rounds (SQL-unrollable)


def q_ppr_push(sf_dir: str) -> pa.Table:
    """Local personalized-PageRank push (Andersen-Chung-Lang FOCS
    2006) from the top-degree seed — the local-exploration primitive
    behind seed-set expansion and local community detection, which
    touches only the graph NEAR the seed instead of iterating
    globally like q_pagerank / q_ppr_mc.  Synchronous integer
    variant: every vertex with residual r >= PUSH_THETA pushes at
    once — p += r//4 (alpha = 1/4 dyadic), half the remainder stays
    lazily, the rest splits over neighbors by exact floor division
    (the sub-divisor remainder is deliberately dropped; deterministic
    and identical in the SQL oracle, which unrolls the rounds).

    Scale shape: each round is ONE msg_pass(sum) over the dense
    substrate (per-partition CSR gather + reduceat) with O(V) driver
    vectors — the locality means the active set stays tiny; the
    V-unbounded sibling is the pagerank_shuffle join plan restricted
    to the active frontier."""
    from ray.data.aggregate import Count as _Count
    from igpm_pem_ray.graph.dense import build_dense_graph, msg_pass

    edges = cooccurrence_edges(sf_dir).materialize()
    ends = edges.map_batches(
        lambda b: pa.table({"v": pa.concat_arrays(
            [b["src"].cast(pa.int64()).combine_chunks(),
             b["dst"].cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow")
    topd = ends.groupby("v").aggregate(_Count(alias_name="d")) \
        .sort(["d", "v"], descending=[True, False]).limit(1).to_pandas()
    seed = int(topd["v"].iloc[0])

    g = build_dense_graph(edges)
    directions = "out" if g.symmetric else "both"
    deg = msg_pass(g, np.ones(g.num_vertices, np.int64), reduce="sum",
                   init=0, directions=directions)
    p = np.zeros(g.num_vertices, np.int64)
    r = np.zeros(g.num_vertices, np.int64)
    spos = np.searchsorted(g.vids, seed)
    r[spos] = PUSH_SCALE
    for _ in range(PUSH_ROUNDS):
        mask = r >= PUSH_THETA
        if not mask.any():
            break
        a = np.where(mask, r // 4, 0)
        left = np.where(mask, r - r // 4, 0)
        stay = left // 2
        share = np.where(deg > 0, (left - stay) // np.maximum(deg, 1), 0)
        inc = msg_pass(g, share, reduce="sum", init=0,
                       directions=directions)
        p = p + a
        r = np.where(mask, stay, r) + inc
    keep = p > 0
    order = np.lexsort((g.vids[keep], -p[keep]))[:20]
    vs = g.vids[keep][order]
    return pa.table({"v": vs.astype(np.int64),
                     "p": p[keep][order].astype(np.int64),
                     "residual": r[keep][order].astype(np.int64)})


def sql_ppr_push() -> str:
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "adj AS MATERIALIZED (SELECT src AS u, dst AS v FROM edges "
        "UNION ALL SELECT dst AS u, src AS v FROM edges)",
        "deg AS MATERIALIZED (SELECT u, count(*) AS d FROM adj "
        "GROUP BY u)",
        "seed AS (SELECT u AS v FROM deg ORDER BY d DESC, u LIMIT 1)",
        f"r0 AS (SELECT v, {PUSH_SCALE} AS r FROM seed)",
    ]
    acc = []
    for i in range(1, PUSH_ROUNDS + 1):
        parts += [
            f"m{i} AS MATERIALIZED (SELECT v, r, r // 4 AS a, "
            "(r - r // 4) // 2 AS stay, "
            "(r - r // 4) - (r - r // 4) // 2 AS spread "
            f"FROM r{i - 1} WHERE r >= {PUSH_THETA})",
            f"k{i} AS (SELECT v, r FROM r{i - 1} WHERE r < {PUSH_THETA})",
            f"inc{i} AS (SELECT adj.v AS v, "
            f"sum(m.spread // d.d) AS r FROM m{i} m "
            "JOIN deg d ON d.u = m.v JOIN adj ON adj.u = m.v "
            "GROUP BY adj.v)",
            f"r{i} AS MATERIALIZED (SELECT v, sum(r) AS r FROM ("
            f"SELECT v, stay AS r FROM m{i} "
            f"UNION ALL SELECT v, r FROM k{i} "
            f"UNION ALL SELECT v, r FROM inc{i}) GROUP BY v)",
        ]
        acc.append(f"SELECT v, a FROM m{i}")
    pacc = " UNION ALL ".join(acc)
    return (
        f"WITH {', '.join(parts)}, "
        f"p AS (SELECT v, sum(a) AS p FROM ({pacc}) GROUP BY v) "
        "SELECT CAST(p.v AS BIGINT) AS v, CAST(p.p AS BIGINT) AS p, "
        f"CAST(COALESCE(r.r, 0) AS BIGINT) AS residual "
        f"FROM p LEFT JOIN r{PUSH_ROUNDS} r ON r.v = p.v "
        "WHERE p.p > 0 ORDER BY p.p DESC, p.v LIMIT 20")


# -------- transitive reduction (2-hop) --------

def q_transitive_reduce(sf_dir: str) -> pa.Table:
    """Depth-2 transitive reduction of the co-occurrence DAG: an edge
    (u, v) is REDUNDANT when some 2-hop path u -> w -> v also exists
    (reachability is unchanged by dropping it) — the DAG-minimization
    operator behind dependency-graph simplification and Hasse-diagram
    construction, depth-bounded the way the repo's other closure ops
    are (full reduction iterates this plan to fixpoint).

    Scale shape: ONE wedge self-join on the middle vertex (u,w)x(w,v)
    builds the 2-path set, one dedup groupby, one hash semi-join
    marks redundant edges; all equi shuffles on vertex keys."""
    from ray.data.aggregate import Count as _Count

    edges = cooccurrence_edges(sf_dir).materialize()
    e1 = edges.rename_columns({"src": "u", "dst": "w"})
    e2 = edges.rename_columns({"src": "w2", "dst": "v"})
    n_e = edges.count()
    np_join = 1 if n_e < 65_536 else min(32, max(8, n_e // 200_000))
    two = e1.join(e2, join_type="inner", num_partitions=np_join,
                  on=("w",), right_on=("w2",)) \
        .select_columns(["u", "v"]) \
        .groupby(["u", "v"]).aggregate(_Count(alias_name="npath"))
    red = edges.join(two.rename_columns({"u": "ru", "v": "rv"}),
                     join_type="inner", num_partitions=np_join,
                     on=("src", "dst"), right_on=("ru", "rv"))
    n_red = red.count()
    return pa.table({
        "n_edges": pa.array([n_e], pa.int64()),
        "n_redundant": pa.array([n_red], pa.int64()),
        "n_kept": pa.array([n_e - n_red], pa.int64())})


def sql_transitive_reduce() -> str:
    return (
        f"WITH edges AS MATERIALIZED ({EDGES_SQL}), "
        "two AS (SELECT DISTINCT a.src AS u, b.dst AS v FROM edges a "
        "JOIN edges b ON b.src = a.dst), "
        "red AS (SELECT e.src, e.dst FROM edges e "
        "JOIN two t ON t.u = e.src AND t.v = e.dst) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) "
        "AS n_edges, "
        "(SELECT CAST(count(*) AS BIGINT) FROM red) AS n_redundant, "
        "(SELECT CAST(count(*) AS BIGINT) FROM edges) - "
        "(SELECT CAST(count(*) AS BIGINT) FROM red) AS n_kept")


# -------- configuration-model triangle significance --------

def q_config_model(sf_dir: str) -> pa.Table:
    """Null-model significance audit for the triangle count: under
    the configuration model (random graph with the SAME degree
    sequence), E[triangles] ~= (1/6) * (sum d(d-1) / sum d)^3 — the
    motif-significance check (Milo et al. Science 2002) that says
    whether the observed clustering is structure or just degree
    skew.  Exact arithmetic: the expectation is the integer rational
    num = (sum d(d-1))^3, den = 6 * (sum d)^3 evaluated in Python
    ints (HUGEINT in the oracle — num passes 2^63 at graph scale),
    reported as the e6 floor-division fixed point next to the exact
    wedge-join triangle count.

    Scale shape: degree moments are one endpoint-explode groupby +
    tiny sums; the triangle count reuses graph/triangles.py's
    oriented wedge join."""
    from ray.data.aggregate import Count as _Count
    from igpm_pem_ray.graph.triangles import triangle_count

    edges = cooccurrence_edges(sf_dir).materialize()
    ends = edges.map_batches(
        lambda b: pa.table({"v": pa.concat_arrays(
            [b["src"].cast(pa.int64()).combine_chunks(),
             b["dst"].cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow")
    deg = ends.groupby("v").aggregate(_Count(alias_name="d"))
    mom = deg.map_batches(
        lambda b: (lambda d: pa.table({
            "s1": d, "s2": d * (d - 1)}))(
            b["d"].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow").sum(["s1", "s2"])
    s1, s2 = int(mom["sum(s1)"]), int(mom["sum(s2)"])
    tri = triangle_count(edges)
    num = s2 ** 3              # Python int: exact beyond 2^63
    den = 6 * s1 ** 3
    exp_e6 = num * 1_000_000 // den if den else 0
    return pa.table({
        "n_triangles": pa.array([tri], pa.int64()),
        "sum_d": pa.array([s1], pa.int64()),
        "sum_d2": pa.array([s2], pa.int64()),
        "expected_e6": pa.array([exp_e6], pa.int64())})


def sql_config_model() -> str:
    return (
        f"WITH edges AS MATERIALIZED ({EDGES_SQL}), "
        "deg AS (SELECT v, count(*) AS d FROM (SELECT src AS v "
        "FROM edges UNION ALL SELECT dst AS v FROM edges) GROUP BY v), "
        "m AS (SELECT CAST(sum(d) AS HUGEINT) AS s1, "
        "CAST(sum(d*(d-1)) AS HUGEINT) AS s2 FROM deg), "
        "tri AS (SELECT count(*) AS t FROM edges e1 "
        "JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst "
        "JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst) "
        "SELECT (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles, "
        "(SELECT CAST(s1 AS BIGINT) FROM m) AS sum_d, "
        "(SELECT CAST(s2 AS BIGINT) FROM m) AS sum_d2, "
        "(SELECT CAST(s2*s2*s2 * 1000000 // (6 * s1*s1*s1) AS BIGINT) "
        "FROM m) AS expected_e6")


# -------- parallel greedy dominating set --------

DS_ROUNDS = 3
_DS_A, _DS_C, _DS_M = 1_103_515_245, 12_345, (1 << 31) - 1


def q_dominating_set(sf_dir: str) -> pa.Table:
    """Luby-style parallel dominating set — the facility-placement /
    monitor-coverage primitive next to MIS and matching: in each of
    DS_ROUNDS rounds every still-undominated vertex whose per-round
    hash key (pri * 2^31 + (2^31-1-v), unique because vids are) beats
    ALL undominated neighbors joins the set; joiners dominate
    themselves and their neighborhood.  Isolated undominated
    vertices self-select — so each round is the symmetric-breaking
    local-max rule the MIS kernel uses, applied to the domination
    state.

    Scale shape: two dense msg_pass(max) exchanges per round (one
    for neighbor keys, one to spread the joiner wave) over the
    V-bounded substrate; the V-unbounded sibling is two
    groupby-max shuffles on the (vid, key) state, mis_shuffle-shaped.
    The SQL oracle unrolls the identical rounds."""
    from igpm_pem_ray.graph.dense import build_dense_graph, msg_pass

    edges = cooccurrence_edges(sf_dir).materialize()
    g = build_dense_graph(edges)
    V = g.num_vertices
    directions = "out" if g.symmetric else "both"
    vids = g.vids.astype(np.int64)
    dominated = np.zeros(V, bool)
    in_set = np.zeros(V, bool)
    for r in range(1, DS_ROUNDS + 1):
        und = ~dominated
        if not und.any():
            break
        pri = ((vids % _DS_M) * _DS_A + r * _DS_C) % _DS_M
        key = pri * (np.int64(1) << 31) + ((np.int64(1) << 31) - 1 - vids)
        kmask = np.where(und, key, np.int64(-1))
        nmax = msg_pass(g, kmask, reduce="max", init=-1,
                        directions=directions)
        join = und & (key > nmax)
        wave = msg_pass(g, join.astype(np.int64), reduce="max", init=0,
                        directions=directions) > 0
        in_set |= join
        dominated |= join | wave
    return pa.table({
        "n_set": pa.array([int(in_set.sum())], pa.int64()),
        "n_dominated": pa.array([int(dominated.sum())], pa.int64()),
        "n_vertices": pa.array([V], pa.int64())})


def sql_dominating_set() -> str:
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "adj AS MATERIALIZED (SELECT src AS u, dst AS v FROM edges "
        "UNION ALL SELECT dst AS u, src AS v FROM edges)",
        "verts AS (SELECT DISTINCT v FROM (SELECT src AS v FROM edges "
        "UNION ALL SELECT dst AS v FROM edges))",
        "dom0 AS (SELECT v FROM verts WHERE 1 = 0)",
        "set0 AS (SELECT v FROM verts WHERE 1 = 0)",
    ]
    for r in range(1, DS_ROUNDS + 1):
        parts += [
            f"u{r} AS MATERIALIZED (SELECT v FROM verts WHERE v NOT IN "
            f"(SELECT v FROM dom{r - 1}))",
            f"k{r} AS MATERIALIZED (SELECT v, "
            f"(((v % {_DS_M}) * {_DS_A} + {r} * {_DS_C}) % {_DS_M}) "
            f"* 2147483648 + (2147483647 - v) AS key FROM u{r})",
            f"nm{r} AS (SELECT a.u AS v, max(k.key) AS mk FROM adj a "
            f"JOIN k{r} k ON k.v = a.v WHERE a.u IN "
            f"(SELECT v FROM u{r}) GROUP BY a.u)",
            f"j{r} AS MATERIALIZED (SELECT k.v FROM k{r} k "
            f"LEFT JOIN nm{r} m ON m.v = k.v "
            "WHERE m.mk IS NULL OR k.key > m.mk)",
            f"w{r} AS (SELECT DISTINCT a.v FROM adj a "
            f"WHERE a.u IN (SELECT v FROM j{r}))",
            f"dom{r} AS MATERIALIZED (SELECT v FROM dom{r - 1} "
            f"UNION SELECT v FROM j{r} UNION SELECT v FROM w{r})",
            f"set{r} AS (SELECT v FROM set{r - 1} "
            f"UNION SELECT v FROM j{r})",
        ]
    return (
        f"WITH {', '.join(parts)} "
        f"SELECT (SELECT CAST(count(*) AS BIGINT) FROM set{DS_ROUNDS}) "
        "AS n_set, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM dom{DS_ROUNDS}) "
        "AS n_dominated, "
        "(SELECT CAST(count(*) AS BIGINT) FROM verts) AS n_vertices")


# -------- seeded (semi-supervised) label propagation --------

SLP_ROUNDS = 3
SLP_SEED_MOD = 5   # parts with partkey % MOD == 0 are clamped seeds


def q_seeded_labelprop(sf_dir: str) -> pa.Table:
    """Semi-supervised label propagation with CLAMPED seeds (Zhu-
    Ghahramani 2002) — node classification, distinct from the
    community-detection LP kernel (K3): every SLP_SEED_MOD-th part
    is clamped to its brand number, and each round every still-
    unlabeled vertex adopts the majority label among its LABELED
    neighbors (ties to the smaller label; no labeled neighbor =
    stay unlabeled).  Output is the label census after SLP_ROUNDS
    rounds with the still-unlabeled count as label -1.

    Scale shape: per round ONE adjacency-state hash join + ONE
    (v, label) counting groupby + ONE groupby-max of the packed
    (count, label) key (count * 2^20 + (2^20-1-label) — argmax-with-
    tie-break as a plain max, the q_ohlc_daily trick); labels stay a
    Dataset end to end.  The SQL oracle unrolls identical rounds."""
    from ray.data.aggregate import Count as _Count, Max as _Max

    from igpm_pem_ray.pipelines.common import read_table

    edges = cooccurrence_edges(sf_dir).materialize()
    npj = 1 if edges.count() < 65_536 else 8
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])

    # seeds must be GRAPH VERTICES (the oracle's `AND p_partkey IN
    # (SELECT v FROM verts)`) — a seeded part outside the graph would
    # inflate the census and deflate the -1 row.  The vertex set is
    # O(distinct parts) — broadcast once, np.isin per batch (at
    # 10^12 V this becomes a semi-join, J1 shape).
    import ray as _ray_mod
    vset = np.unique(np.concatenate([
        np.concatenate([b["src"].to_numpy(zero_copy_only=False)
                        .astype(np.int64),
                        b["dst"].to_numpy(zero_copy_only=False)
                        .astype(np.int64)])
        for b in edges.iter_batches(batch_format="pyarrow")]
        or [np.zeros(0, np.int64)]))
    vref = _ray_mod.put(vset)

    def seed(b: pa.Table, _vref=vref) -> pa.Table:
        pk = b["p_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = (pk % SLP_SEED_MOD == 0) & np.isin(pk, _ray_mod.get(_vref))
        br = np.asarray(
            [int(x.split("#", 1)[1]) for x in b["p_brand"].to_pylist()],
            np.int64)
        return pa.table({"v": pk[m], "lab": br[m]})

    labels = part.map_batches(seed, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    adj = edges.map_batches(
        lambda b: (lambda s, d: pa.table({
            "u": np.concatenate([s, d]),
            "w": np.concatenate([d, s])}))(
            b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    for _ in range(SLP_ROUNDS):
        lab_set = labels.to_pandas()  # O(labeled) driver set for the
        # unlabeled filter; at web scale this filter is an anti-join
        have = np.sort(lab_set["v"].to_numpy().astype(np.int64))
        import ray as _ray
        ref = _ray.put(have)
        cand = adj.join(
            labels.rename_columns({"v": "lv", "lab": "llab"}),
            join_type="inner", num_partitions=npj,
            on=("u",), right_on=("lv",))

        def unl(b: pa.Table, _ref=ref) -> pa.Table:
            hv = _ray.get(_ref)
            w = b["w"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(hv, w)
            pos = np.minimum(pos, max(len(hv) - 1, 0))
            m = ~(hv[pos] == w) if len(hv) else np.ones(len(w), bool)
            return pa.table({"v": w[m],
                             "lab": b["llab"].to_numpy(
                                 zero_copy_only=False)[m]})

        newl = cand.map_batches(unl, batch_format="pyarrow",
                                zero_copy_batch=True) \
            .groupby(["v", "lab"]).aggregate(_Count(alias_name="c")) \
            .map_batches(
                lambda b: pa.table({
                    "v": b["v"],
                    "pk": b["c"].to_numpy(zero_copy_only=False)
                    .astype(np.int64) * (1 << 20)
                    + ((1 << 20) - 1
                       - b["lab"].to_numpy(zero_copy_only=False)
                       .astype(np.int64))}),
                batch_format="pyarrow") \
            .groupby("v").aggregate(_Max("pk", alias_name="pk")) \
            .map_batches(
                lambda b: pa.table({
                    "v": b["v"].cast(pa.int64()),
                    "lab": (1 << 20) - 1
                    - (b["pk"].to_numpy(zero_copy_only=False)
                       & ((1 << 20) - 1))}),
                batch_format="pyarrow")
        labels = labels.union(newl).materialize()

    cens = labels.groupby("lab").aggregate(_Count(alias_name="n"))
    ends = edges.map_batches(
        lambda b: pa.table({"v": pa.concat_arrays(
            [b["src"].cast(pa.int64()).combine_chunks(),
             b["dst"].cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow")
    n_verts = ends.groupby("v").aggregate(
        _Count(alias_name="_d")).count()
    n_lab = labels.count()
    out = cens.to_pandas().sort_values("lab")
    labs = out["lab"].to_numpy().astype(np.int64).tolist() + [-1]
    ns = out["n"].to_numpy().astype(np.int64).tolist() \
        + [n_verts - n_lab]
    return pa.table({"label": pa.array(labs, pa.int64()),
                     "n_vertices": pa.array(ns, pa.int64())})


def sql_seeded_labelprop() -> str:
    parts = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "adj AS MATERIALIZED (SELECT src AS u, dst AS w FROM edges "
        "UNION ALL SELECT dst AS u, src AS w FROM edges)",
        "verts AS (SELECT DISTINCT u AS v FROM adj)",
        "lab0 AS (SELECT p_partkey AS v, "
        "CAST(substr(p_brand, 7) AS BIGINT) AS lab FROM part "
        f"WHERE p_partkey % {SLP_SEED_MOD} = 0 "
        "AND p_partkey IN (SELECT v FROM verts))",
    ]
    for r in range(1, SLP_ROUNDS + 1):
        parts += [
            f"cand{r} AS (SELECT a.w AS v, l.lab FROM adj a "
            f"JOIN lab{r - 1} l ON l.v = a.u "
            f"WHERE a.w NOT IN (SELECT v FROM lab{r - 1}))",
            f"cnt{r} AS (SELECT v, lab, count(*) AS c FROM cand{r} "
            "GROUP BY v, lab)",
            f"best{r} AS (SELECT v, (1 << 20) - 1 - "
            "(max(c * (1 << 20) + ((1 << 20) - 1 - lab)) "
            f"& ((1 << 20) - 1)) AS lab FROM cnt{r} GROUP BY v)",
            f"lab{r} AS MATERIALIZED (SELECT v, lab FROM lab{r - 1} "
            f"UNION ALL SELECT v, lab FROM best{r})",
        ]
    return (
        f"WITH {', '.join(parts)} "
        "SELECT CAST(lab AS BIGINT) AS label, "
        f"CAST(count(*) AS BIGINT) AS n_vertices FROM lab{SLP_ROUNDS} "
        "GROUP BY lab "
        "UNION ALL SELECT -1, "
        "(SELECT CAST(count(*) AS BIGINT) FROM verts) - "
        f"(SELECT CAST(count(*) AS BIGINT) FROM lab{SLP_ROUNDS})")


# -------- 2-hop ego-network sizes --------

EGO_TOPK = 50


def q_ego_2hop(sf_dir: str) -> pa.Table:
    """Exact 2-hop ego-network size per vertex — |{u : dist(v,u) <=
    2}| minus v itself — the feature behind friend-of-friend reach
    and GNN receptive-field sizing, and the per-vertex refinement of
    q_two_hop's global pair count.  Top-EGO_TOPK by (size desc, vid)
    keeps the output bounded.

    Scale shape: one adjacency self-join on the middle vertex emits
    2-paths; each block DEDUPES its pairs vectorized (np.unique on
    the packed (v << 32 | t) key — vids < 2^31 asserted) so the
    Sigma deg^2 fan-out collapses block-locally, and the partials
    finish in ONE vectorized reduce task (unique + bincount + top-k)
    — the measured pair-merge strategy (BASELINE.md: Ray's
    sort-based two-key groupby on multi-million-row partials is
    ~50x a single reduce task; above the single-task envelope the
    reduce shards by v-hash exactly like text/dedup's bucketed
    closure)."""
    import ray as _ray

    edges = cooccurrence_edges(sf_dir).materialize()
    npj = 1 if edges.count() < 65_536 else 8
    adj = edges.map_batches(
        lambda b: (lambda s, d: pa.table({
            "u": np.concatenate([s, d]),
            "w": np.concatenate([d, s])}))(
            b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    two = adj.join(adj.rename_columns({"u": "u2", "w": "w2"}),
                   join_type="inner", num_partitions=npj,
                   on=("w",), right_on=("u2",))

    def pack_unique(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        w2 = b["w2"].to_numpy(zero_copy_only=False)
        m = u != w2
        u, w2 = u[m], w2[m]
        assert (len(u) == 0
                or (u.max() < (1 << 31) and w2.max() < (1 << 31)))
        return pa.table({"pk": np.unique((u << 32) | w2)})

    partials = two.map_batches(pack_unique, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .union(adj.map_batches(
            lambda b: pa.table({"pk": np.unique(
                (b["u"].to_numpy(zero_copy_only=False) << 32)
                | b["w"].to_numpy(zero_copy_only=False))}),
            batch_format="pyarrow")).materialize()

    @_ray.remote
    def reduce_topk(*parts: pa.Table) -> pa.Table:
        pk = np.unique(np.concatenate(
            [p["pk"].to_numpy(zero_copy_only=False) for p in parts]))
        v = pk >> 32
        uniq, cnt = np.unique(v, return_counts=True)
        order = np.lexsort((uniq, -cnt))[:EGO_TOPK]
        return pa.table({"v": uniq[order].astype(np.int64),
                         "ego2": cnt[order].astype(np.int64)})

    t = _ray.get(reduce_topk.remote(*partials.to_arrow_refs()))
    return t
def sql_ego_2hop() -> str:
    return (
        f"WITH edges AS MATERIALIZED ({EDGES_SQL}), "
        "adj AS MATERIALIZED (SELECT src AS u, dst AS w FROM edges "
        "UNION ALL SELECT dst AS u, src AS w FROM edges), "
        "r AS (SELECT DISTINCT v, t FROM ("
        "SELECT a.u AS v, b.w AS t FROM adj a "
        "JOIN adj b ON b.u = a.w AND b.w <> a.u "
        "UNION ALL SELECT u AS v, w AS t FROM adj)) "
        "SELECT CAST(v AS BIGINT) AS v, "
        "CAST(count(*) AS BIGINT) AS ego2 FROM r GROUP BY v "
        f"ORDER BY ego2 DESC, v LIMIT {EGO_TOPK}")


# -------- per-vertex graphlet orbit counts --------

def q_orbit_counts(sf_dir: str) -> pa.Table:
    """Per-vertex graphlet degree vector for the 2-3-node graphlets
    (Przulj's orbits 0-3): degree (orbit 0), wedge-END count (orbit
    1, = sum over neighbors of (deg(u) - 1) minus 2*triangles — paths
    u-v-w through a NEIGHBOR as midpoint, triangle corrections keep
    it induced), wedge-CENTER count (orbit 2, = C(deg, 2) -
    triangles, induced), and triangle count (orbit 3) — the
    structural-role features under graphlet-kernel ML and network
    alignment, all exact integers.

    Scale shape: degree + per-vertex triangles come from the
    existing oriented wedge-join kernel (graph/triangles.py); the
    neighbor-degree sum is ONE adjacency-degree hash join + one
    groupby-sum.  Everything else is stateless arithmetic."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum
    from igpm_pem_ray.graph.triangles import per_vertex_triangles

    edges = cooccurrence_edges(sf_dir).materialize()
    npj = 1 if edges.count() < 65_536 else 8
    pvt = per_vertex_triangles(edges).materialize()

    adj = edges.map_batches(
        lambda b: (lambda s, d: pa.table({
            "u": np.concatenate([s, d]),
            "w": np.concatenate([d, s])}))(
            b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow", zero_copy_batch=True)
    degs = pvt.map_batches(
        lambda b: pa.table({"dv": b["vid"], "deg": b["degree"]}),
        batch_format="pyarrow")
    nd = adj.join(degs, join_type="inner", num_partitions=npj,
                  on=("w",), right_on=("dv",)) \
        .map_batches(
            lambda b: pa.table({
                "v": b["u"],
                "nm1": b["deg"].to_numpy(zero_copy_only=False)
                .astype(np.int64) - 1}),
            batch_format="pyarrow") \
        .groupby("v").aggregate(_Sum("nm1", alias_name="snm1")) \
        .rename_columns({"v": "nv"})

    full = pvt.join(nd, join_type="left_outer", num_partitions=npj,
                    on=("vid",), right_on=("nv",))

    def orbits(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b["n_triangles"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = pc.fill_null(b["snm1"], 0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "vid": b["vid"].cast(pa.int64()),
            "orbit0_deg": d,
            "orbit1_wedge_end": s - 2 * t,
            "orbit2_wedge_center": d * (d - 1) // 2 - t,
            "orbit3_triangle": t})

    return full.map_batches(orbits, batch_format="pyarrow")


def sql_orbit_counts() -> str:
    return (
        f"WITH edges AS MATERIALIZED ({EDGES_SQL}), "
        "adj AS MATERIALIZED (SELECT src AS u, dst AS w FROM edges "
        "UNION ALL SELECT dst AS u, src AS w FROM edges), "
        "deg AS MATERIALIZED (SELECT u AS v, count(*) AS d FROM adj "
        "GROUP BY u), "
        "tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c "
        "FROM edges e1 JOIN edges e2 ON e1.src = e2.src "
        "AND e1.dst < e2.dst "
        "JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst), "
        "tv AS (SELECT v, count(*) AS t FROM (SELECT a AS v FROM tri "
        "UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) "
        "GROUP BY v), "
        "nd AS (SELECT a.u AS v, sum(d.d - 1) AS snm1 FROM adj a "
        "JOIN deg d ON d.v = a.w GROUP BY a.u) "
        "SELECT CAST(deg.v AS BIGINT) AS vid, "
        "CAST(deg.d AS BIGINT) AS orbit0_deg, "
        "CAST(COALESCE(nd.snm1, 0) - 2 * COALESCE(tv.t, 0) AS BIGINT) "
        "AS orbit1_wedge_end, "
        "CAST(deg.d * (deg.d - 1) // 2 - COALESCE(tv.t, 0) AS BIGINT) "
        "AS orbit2_wedge_center, "
        "CAST(COALESCE(tv.t, 0) AS BIGINT) AS orbit3_triangle "
        "FROM deg LEFT JOIN nd ON nd.v = deg.v "
        "LEFT JOIN tv ON tv.v = deg.v")


# -------- critical path (longest weighted DAG path) --------

CP_ROUNDS = 5


def q_critical_path(sf_dir: str) -> pa.Table:
    """Critical-path lengths on the co-occurrence DAG — the (max, +)
    path semiring, completing the family next to q_dag_paths
    (count, (+, x) with q=1), q_bom_explode ((+, x)) and
    q_widest_path ((max, min)): longest weighted path ending at each
    vertex within CP_ROUNDS hops, deterministic integer weights
    w = 1 + (src + dst) mod 7 (the q_sssp convention).  The
    project-scheduling primitive (PERT/CPM) — on a dependency DAG
    this IS the schedule length.

    Scale shape: relational DP — per round ONE hash join of the
    frontier against the edge table + a groupby-max; src < dst makes
    termination structural (paths strictly increase), and the
    bounded unroll is shared with the SQL oracle.  Top-20 by
    (length desc, vid) bounds the output."""
    from ray.data.aggregate import Max as _Max

    edges = cooccurrence_edges(sf_dir).materialize()
    npj = 1 if edges.count() < 65_536 else 8

    def with_w(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": s, "dst": d, "w": (s + d) % 7 + 1})

    ew = edges.map_batches(with_w, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    # dist after 1 hop
    best = ew.map_batches(
        lambda b: pa.table({"v": b["dst"], "dist": b["w"]}),
        batch_format="pyarrow") \
        .groupby("v").aggregate(_Max("dist", alias_name="dist")) \
        .materialize()
    acc = best
    for _ in range(1, CP_ROUNDS):
        nxt = best.join(
            ew.rename_columns({"src": "esrc", "dst": "edst",
                               "w": "ew"}),
            join_type="inner", num_partitions=npj,
            on=("v",), right_on=("esrc",))
        if nxt.count() == 0:
            break
        best = nxt.map_batches(
            lambda b: pa.table({
                "v": b["edst"],
                "dist": pa.compute.add(b["dist"], b["ew"])}),
            batch_format="pyarrow") \
            .groupby("v").aggregate(_Max("dist", alias_name="dist")) \
            .materialize()
        acc = acc.union(best)
    final = acc.groupby("v").aggregate(_Max("dist", alias_name="dist"))
    top = final.sort(["dist", "v"], descending=[True, False]) \
        .limit(20).to_pandas()
    return pa.table({"v": top["v"].to_numpy().astype(np.int64),
                     "dist": top["dist"].to_numpy().astype(np.int64)})


def sql_critical_path() -> str:
    parts = [
        f"edges AS MATERIALIZED (SELECT src, dst, "
        f"(src + dst) % 7 + 1 AS w FROM ({EDGES_SQL}))",
        "d1 AS (SELECT dst AS v, max(w) AS dist FROM edges GROUP BY dst)",
    ]
    for i in range(2, CP_ROUNDS + 1):
        parts.append(
            f"d{i} AS (SELECT e.dst AS v, max(p.dist + e.w) AS dist "
            f"FROM d{i - 1} p JOIN edges e ON e.src = p.v "
            "GROUP BY e.dst)")
    un = " UNION ALL ".join(
        f"SELECT v, dist FROM d{i}" for i in range(1, CP_ROUNDS + 1))
    return (
        f"WITH {', '.join(parts)} "
        "SELECT CAST(v AS BIGINT) AS v, "
        f"CAST(max(dist) AS BIGINT) AS dist FROM ({un}) GROUP BY v "
        "ORDER BY dist DESC, v LIMIT 20")
