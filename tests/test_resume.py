"""Checkpoint/resume equivalence (FIXTURES.md section 6): kill at
iteration K, resume, final output identical to the uninterrupted run."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from igpm_pem_ray.graph.components import connected_components
from igpm_pem_ray.graph.pagerank import pagerank
from igpm_pem_ray.sources.pages import generate_pages
from igpm_pem_ray import ids


@pytest.fixture(scope="module")
def edges_ds():
    sp = generate_pages(200, seed=11)
    e = sp.expected_edges
    return rd.from_arrow(pa.table({
        "src": pa.array(ids.urls_to_vids(e["src_url"].to_pylist())),
        "dst": pa.array(ids.urls_to_vids(e["dst_url"].to_pylist())),
    }))


def test_pagerank_resume_equivalence(edges_ds, tmp_path):
    ck = str(tmp_path / "pr")
    full = pagerank(edges_ds, tol=1e-10)
    # "crash" after 7 iterations (checkpoint every 3 -> iters 3,6 committed)
    pagerank(edges_ds, tol=1e-10, max_iters=7, checkpoint_dir=ck, checkpoint_every=3)
    resumed = pagerank(edges_ds, tol=1e-10, checkpoint_dir=ck, checkpoint_every=3,
                       resume=True)
    a = np.asarray(full["rank"])
    b = np.asarray(resumed["rank"])
    assert np.abs(a - b).max() < 1e-9
    assert full["vid"].to_pylist() == resumed["vid"].to_pylist()


def test_pagerank_resume_rejects_stale_params(edges_ds, tmp_path):
    ck = str(tmp_path / "pr2")
    pagerank(edges_ds, tol=1e-8, max_iters=6, checkpoint_dir=ck, checkpoint_every=2)
    # different damping -> params fingerprint mismatch -> cold start (no crash)
    stats: dict = {}
    pagerank(edges_ds, damping=0.5, tol=1e-8, checkpoint_dir=ck, resume=True,
             stats=stats)
    assert stats["total_iterations"] == stats["iterations"]  # started from 0


def test_cc_resume_equivalence(edges_ds, tmp_path):
    ck = str(tmp_path / "cc")
    full = connected_components(edges_ds)
    connected_components(edges_ds, max_rounds=2, checkpoint_dir=ck)
    resumed = connected_components(edges_ds, checkpoint_dir=ck, resume=True)
    assert full.to_pydict() == resumed.to_pydict()


def test_manifest_commit_marker(edges_ds, tmp_path):
    """A checkpoint directory without manifest.json (simulated crash
    mid-write) is ignored on resume."""
    import json
    import os

    ck = str(tmp_path / "pr3")
    pagerank(edges_ds, tol=1e-8, max_iters=4, checkpoint_dir=ck, checkpoint_every=2)
    iters = sorted(d for d in os.listdir(ck) if d.startswith("iter="))
    victim = os.path.join(ck, iters[-1], "manifest.json")
    latest = json.load(open(victim))["iteration"]
    os.remove(victim)  # simulate crash before commit
    from igpm_pem_ray.state.checkpoint import latest_checkpoint

    found = latest_checkpoint(ck, json.load(open(os.path.join(ck, iters[0], "manifest.json")))["params"])
    assert found is not None and found[0] < latest


def test_pages_dist_parse_vs_compose(tmp_path):
    """The distributed generator obeys the same byte-identical
    invariant as the driver-side one."""
    from igpm_pem_ray.graph.build import pages_to_extracted
    from igpm_pem_ray.sources.pages_dist import write_pages_dist

    d = str(tmp_path / "pd")
    write_pages_dist(d, 300, links_per_page=5, body_tokens=80, concurrency=2)
    pages = rd.read_parquet(d)
    ext = pages_to_extracted(pages, concurrency=2, batch_size=64)
    got = {r["url"]: r["text"] for r in ext.select_columns(["url", "text"]).take_all()}
    exp = {r["url"]: r["text"] for r in pages.select_columns(["url", "text"]).take_all()}
    assert got == exp


def test_shuffle_kernels_resume_equivalence(edges_ds, tmp_path):
    """Dataset-resident kernels: kill-at-K / resume produces the same
    state as an uninterrupted run; state round-trips through streamed
    parquet checkpoints (save_state_ds, per-file lineage manifests)."""
    from igpm_pem_ray.graph.shuffle_kernels import (
        connected_components_shuffle, pagerank_shuffle)

    ck = str(tmp_path / "prs")
    full = pagerank_shuffle(edges_ds, tol=0.0, max_iters=5).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    pagerank_shuffle(edges_ds, tol=0.0, max_iters=2, checkpoint_dir=ck,
                     checkpoint_every=2)
    resumed = pagerank_shuffle(edges_ds, tol=0.0, max_iters=5,
                               checkpoint_dir=ck, checkpoint_every=2,
                               resume=True).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert full["vid"].tolist() == resumed["vid"].tolist()
    assert np.abs(full["rank"].to_numpy() - resumed["rank"].to_numpy()).max() < 1e-12

    ck2 = str(tmp_path / "ccs")
    want = connected_components_shuffle(edges_ds).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    connected_components_shuffle(edges_ds, max_rounds=2, checkpoint_dir=ck2,
                                 checkpoint_every=1)
    got = connected_components_shuffle(edges_ds, checkpoint_dir=ck2,
                                       checkpoint_every=1, resume=True) \
        .to_pandas().sort_values("vid").reset_index(drop=True)
    assert want.equals(got)


def test_lp_shuffle_resume_equivalence(edges_ds, tmp_path):
    """label_propagation_shuffle: interrupt-at-2 / resume equals the
    uninterrupted run (synchronous rounds -> exact), same save_state_ds
    protocol as its pagerank/cc siblings (round-2 verdict item #6)."""
    from igpm_pem_ray.graph.shuffle_kernels import label_propagation_shuffle

    ck = str(tmp_path / "lps")
    want = label_propagation_shuffle(edges_ds, max_rounds=5).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    label_propagation_shuffle(edges_ds, max_rounds=2, checkpoint_dir=ck,
                              checkpoint_every=1)
    stats: dict = {}
    got = label_propagation_shuffle(edges_ds, max_rounds=5,
                                    checkpoint_dir=ck, checkpoint_every=1,
                                    resume=True, stats=stats).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert want.equals(got)
    assert stats["rounds"] >= 2  # resumed past the interrupted round


def test_scc_shuffle_resume_equivalence(tmp_path):
    """scc_shuffle: interrupt after one outer round / resume equals the
    uninterrupted run (peeled SCCs frozen; decomposition unique), same
    save_state_ds protocol as the K1-K3 shuffle siblings."""
    import ray.data as rd

    from igpm_pem_ray.graph import scc as scc_mod

    # two 6-cycles bridged by a path + tendrils: >1 outer round of work
    src = list(range(6)) + [i + 10 for i in range(6)] + [5, 20, 21]
    dst = [(i + 1) % 6 for i in range(6)] \
        + [(i + 1) % 6 + 10 for i in range(6)] + [10, 21, 0]
    t = pa.table({"src": np.array(src, np.int64),
                  "dst": np.array(dst, np.int64)})
    want = scc_mod.strongly_connected_components_shuffle(
        rd.from_arrow(t)).to_pandas().sort_values("vid").reset_index(drop=True)
    ck = str(tmp_path / "sccs")
    scc_mod.strongly_connected_components_shuffle(
        rd.from_arrow(t), max_rounds=1, checkpoint_dir=ck)
    stats: dict = {}
    got = scc_mod.strongly_connected_components_shuffle(
        rd.from_arrow(t), checkpoint_dir=ck, resume=True, stats=stats) \
        .to_pandas().sort_values("vid").reset_index(drop=True)
    assert want.equals(got)


def test_distance_sweep_chunk_resume_equivalence(tmp_path):
    """Interrupt the bit-parallel sweep after its first chunk and
    resume: identical (hist, harmonic, ecc, nreach, sumd) to an
    uninterrupted run; params mismatch refuses the stale state."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from igpm_pem_ray.graph import distance as dist_mod

    rng = np.random.RandomState(5)
    V, E, MAXD = 200, 500, 4
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    keep = src != dst
    ds = rd.from_arrow(pa.table({"src": src[keep], "dst": dst[keep]}))

    full = dist_mod.distance_stats(ds, max_depth=MAXD, chunk_words=1)

    ck = str(tmp_path / "dist_ck")
    # simulate a crash: run only the machinery until chunk 1 by using
    # a fresh dir and cutting after the first chunk via a tiny V run —
    # instead run fully WITH checkpoints, then delete the last
    # manifests so only chunk 1 is committed, and resume
    dist_mod.distance_stats(ds, max_depth=MAXD, chunk_words=1,
                            checkpoint_dir=ck)
    import os
    import shutil

    iters = sorted(d for d in os.listdir(ck) if d.startswith("iter="))
    assert len(iters) >= 2, "need >= 2 chunks for the resume test"
    for d in iters[1:]:
        shutil.rmtree(os.path.join(ck, d))
    resumed = dist_mod.distance_stats(ds, max_depth=MAXD, chunk_words=1,
                                      checkpoint_dir=ck, resume=True)
    for a, b in zip(full, resumed):
        assert np.array_equal(a, b)

    # different params must NOT pick up the stale chunk state
    other = dist_mod.distance_stats(ds, max_depth=MAXD + 1, chunk_words=1,
                                    checkpoint_dir=ck, resume=True)
    ref = dist_mod.distance_stats(ds, max_depth=MAXD + 1, chunk_words=1)
    for a, b in zip(ref, other):
        assert np.array_equal(a, b)


def test_betweenness_chunk_resume_equivalence(tmp_path):
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from igpm_pem_ray.graph import betweenness as bc_mod

    rng = np.random.RandomState(9)
    V, E = 150, 400
    src = rng.randint(0, V, E).astype(np.int64)
    dst = rng.randint(0, V, E).astype(np.int64)
    keep = src != dst
    ds = rd.from_arrow(pa.table({"src": src[keep], "dst": dst[keep]}))

    full = bc_mod.betweenness(ds, chunk_size=48)
    ck = str(tmp_path / "bc_ck")
    bc_mod.betweenness(ds, chunk_size=48, checkpoint_dir=ck)
    iters = sorted(d for d in os.listdir(ck) if d.startswith("iter="))
    assert len(iters) >= 2
    for d in iters[1:]:
        shutil.rmtree(os.path.join(ck, d))
    resumed = bc_mod.betweenness(ds, chunk_size=48,
                                 checkpoint_dir=ck, resume=True)
    assert full["betweenness_e6"].to_numpy().tolist() \
        == resumed["betweenness_e6"].to_numpy().tolist()


def test_katz_shuffle_resume_equivalence(edges_ds, tmp_path):
    """katz_shuffle interrupt/resume == uninterrupted run (same
    save_state_ds protocol as its K1-K3 siblings)."""
    import numpy as np

    from igpm_pem_ray.graph.shuffle_kernels import katz_shuffle

    full = katz_shuffle(edges_ds, n_iters=4).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    ck = str(tmp_path / "katz_ck")
    katz_shuffle(edges_ds, n_iters=2, checkpoint_dir=ck,
                 checkpoint_every=2)
    resumed = katz_shuffle(edges_ds, n_iters=4,
                           checkpoint_dir=ck, resume=True).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert (full["vid"].to_numpy() == resumed["vid"].to_numpy()).all()
    assert (full["x"].to_numpy().astype("int64")
            == resumed["x"].to_numpy().astype("int64")).all()


def test_hyperball_shuffle_resume_equivalence(edges_ds, tmp_path):
    """hyperball_shuffle interrupt/resume == uninterrupted run: the
    manifest's ``extra`` carries the accumulated N(d) series + register
    sum, so the resumed run returns the IDENTICAL full series."""
    from igpm_pem_ray.graph.shuffle_kernels import hyperball_shuffle

    full = hyperball_shuffle(edges_ds, max_depth=16).to_pandas()
    ck = str(tmp_path / "hb_ck")
    # "crash" after 2 rounds (checkpoint_every=2 -> round 2 committed)
    hyperball_shuffle(edges_ds, max_depth=2, checkpoint_dir=ck,
                      checkpoint_every=2)
    resumed = hyperball_shuffle(edges_ds, max_depth=16,
                                checkpoint_dir=ck,
                                resume=True).to_pandas()
    assert full.equals(resumed)


def test_hyperball_shuffle_parity_vs_dense(edges_ds):
    """Register evolution is max-merge (associative/commutative), so
    the Dataset-resident rounds reproduce the dense HyperBall's N(d)
    series exactly (same registers bit for bit; only the float SUM
    order differs, absorbed by the integer rounding at this scale)."""
    from igpm_pem_ray.graph.distance import (effective_diameter,
                                             neighborhood_function_hll)
    from igpm_pem_ray.graph.shuffle_kernels import hyperball_shuffle

    dense = neighborhood_function_hll(edges_ds, max_depth=32).to_pandas()
    shuf = hyperball_shuffle(edges_ds, max_depth=32).to_pandas()
    assert len(dense) == len(shuf)
    assert (dense["d"].to_numpy() == shuf["d"].to_numpy()).all()
    dn = dense["approx_pairs"].to_numpy().astype(np.int64)
    sn = shuf["approx_pairs"].to_numpy().astype(np.int64)
    # identical up to 1-ulp float-sum rounding on the integer estimate
    assert np.max(np.abs(dn - sn)) <= 1
    ed_d = effective_diameter(edges_ds, strategy="hll")
    ed_s = effective_diameter(edges_ds, strategy="hll_shuffle")
    assert ed_d == ed_s


def test_msbfs_shuffle_resume_equivalence(edges_ds, tmp_path):
    """msbfs_shuffle's unit of restart is the source chunk: kill after
    chunk 1 (simulated by deleting the later chunk checkpoints), resume,
    final hist + accumulator Dataset identical to the uninterrupted
    run.  chunk_words=1 forces several chunks on the fixture graph."""
    import os
    import shutil

    from igpm_pem_ray.graph.shuffle_kernels import msbfs_shuffle

    full_hist, full_acc = msbfs_shuffle(edges_ds, max_depth=8,
                                        chunk_words=1)
    full = full_acc.sort("vid").to_pandas()

    ck = str(tmp_path / "msbfs_ck")
    msbfs_shuffle(edges_ds, max_depth=8, chunk_words=1,
                  checkpoint_dir=ck)
    iters = sorted(n for n in os.listdir(ck) if n.startswith("iter="))
    assert len(iters) >= 2  # several chunks committed
    for name in iters[1:]:  # crash after the first committed chunk
        shutil.rmtree(os.path.join(ck, name))

    stats: dict = {}
    res_hist, res_acc = msbfs_shuffle(edges_ds, max_depth=8,
                                      chunk_words=1, checkpoint_dir=ck,
                                      resume=True, stats=stats)
    assert full_hist.equals(res_hist)
    assert full.equals(res_acc.sort("vid").to_pandas())


def test_betweenness_shuffle_resume_equivalence(edges_ds, tmp_path):
    """betweenness_shuffle restarts at source-chunk granularity: kill
    after chunk 1 (delete later chunk checkpoints), resume, identical
    accumulator — same protocol as msbfs_shuffle."""
    import os
    import shutil

    from igpm_pem_ray.graph.shuffle_kernels import betweenness_shuffle

    full = betweenness_shuffle(edges_ds, max_depth=4, chunk_span=64) \
        .sort("vid").to_pandas()
    ck = str(tmp_path / "bc_ck")
    betweenness_shuffle(edges_ds, max_depth=4, chunk_span=64,
                        checkpoint_dir=ck)
    iters = sorted(n for n in os.listdir(ck) if n.startswith("iter="))
    assert len(iters) >= 2
    for name in iters[1:]:
        shutil.rmtree(os.path.join(ck, name))
    resumed = betweenness_shuffle(edges_ds, max_depth=4, chunk_span=64,
                                  checkpoint_dir=ck, resume=True) \
        .sort("vid").to_pandas()
    assert full.equals(resumed)


def test_sssp_shuffle_resume_equivalence(edges_ds, tmp_path):
    """sssp_shuffle interrupt/resume == uninterrupted run (same
    save_state_ds protocol as its K1-K3/Katz siblings); distances
    stay exact int64 through the parquet round-trip."""
    from igpm_pem_ray.graph.shuffle_kernels import sssp_shuffle

    full = sssp_shuffle(edges_ds, n_iters=6).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    ck = str(tmp_path / "sssp_ck")
    sssp_shuffle(edges_ds, n_iters=2, checkpoint_dir=ck,
                 checkpoint_every=2)
    resumed = sssp_shuffle(edges_ds, n_iters=6,
                           checkpoint_dir=ck, resume=True).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert (full["vid"].to_numpy() == resumed["vid"].to_numpy()).all()
    assert (full["dist"].to_numpy().astype("int64")
            == resumed["dist"].to_numpy().astype("int64")).all()

def test_kcore_hindex_resume_equivalence(edges_ds, tmp_path):
    """core_numbers_hindex: interrupt-at-2 / resume equals the
    uninterrupted run (synchronous h-index rounds -> exact), same
    save_state_ds protocol as the K1-K3 shuffle siblings."""
    from igpm_pem_ray.graph.kcore import core_numbers_hindex

    ck = str(tmp_path / "khx")
    want = core_numbers_hindex(edges_ds, num_partitions=2).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    core_numbers_hindex(edges_ds, num_partitions=2, max_rounds=2,
                        checkpoint_dir=ck, checkpoint_every=1)
    stats: dict = {}
    got = core_numbers_hindex(edges_ds, num_partitions=2,
                              checkpoint_dir=ck, checkpoint_every=1,
                              resume=True, stats=stats).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert want.equals(got)
    assert stats["rounds"] >= 2


def test_mis_shuffle_resume_equivalence(edges_ds, tmp_path):
    """mis_shuffle: interrupt-at-2 / resume equals the uninterrupted
    run (round-numbered priorities continue from the checkpointed
    round, so the trajectory is identical)."""
    from igpm_pem_ray.graph.shuffle_kernels import mis_shuffle

    ck = str(tmp_path / "miss")
    want = mis_shuffle(edges_ds, max_rounds=6).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    mis_shuffle(edges_ds, max_rounds=2, checkpoint_dir=ck,
                checkpoint_every=1)
    stats: dict = {}
    got = mis_shuffle(edges_ds, max_rounds=6, checkpoint_dir=ck,
                      checkpoint_every=1, resume=True,
                      stats=stats).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert want.equals(got)


def test_coloring_shuffle_resume_equivalence(edges_ds, tmp_path):
    """coloring_shuffle: interrupt / resume equals the uninterrupted
    run (static priorities; colored set is the full state)."""
    from igpm_pem_ray.graph.shuffle_kernels import coloring_shuffle

    ck = str(tmp_path / "cols")
    want = coloring_shuffle(edges_ds).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    coloring_shuffle(edges_ds, max_rounds=2, checkpoint_dir=ck,
                     checkpoint_every=1)
    got = coloring_shuffle(edges_ds, checkpoint_dir=ck,
                           checkpoint_every=1, resume=True).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert want.equals(got)


def test_truss_decompose_resume_equivalence(tmp_path):
    """truss_decompose_shuffle: interrupt after early levels / resume
    equals the uninterrupted decomposition (levels are sequential)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from igpm_pem_ray.graph.ktruss import truss_decompose_shuffle

    rng = np.random.RandomState(67)
    src = rng.randint(0, 30, size=200).astype(np.int64)
    dst = rng.randint(0, 30, size=200).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    ck = str(tmp_path / "truss")
    want = truss_decompose_shuffle(ds).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    # "crash" mid-decomposition: only allow a few peel rounds
    truss_decompose_shuffle(ds, max_rounds=2, checkpoint_dir=ck)
    stats: dict = {}
    got = truss_decompose_shuffle(ds, checkpoint_dir=ck, resume=True,
                                  stats=stats).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    assert want.equals(got)
