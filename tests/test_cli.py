"""The ``python -m igpm_pem_ray`` job entrypoint (ray-job-submit
launch path): subcommands compose extract -> pagerank -> components
over parquet directories, reuse an existing Ray session without
shutting it down, and print one JSON metrics line each."""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest
import ray

from igpm_pem_ray.__main__ import main
from igpm_pem_ray.sources.pages import write_pages_parquet


def test_cli_extract_pagerank_components(tmp_path, capsys):
    pages = str(tmp_path / "pages")
    edges = str(tmp_path / "edges")
    ranks = str(tmp_path / "ranks")
    comps = str(tmp_path / "comps")
    write_pages_parquet(pages, n_pages=300, seed=11, rows_per_file=128)

    out = main(["extract", "--pages", pages, "--out", edges,
                "--concurrency", "2", "--batch-size", "64"])
    assert out["num_edges"] > 0
    assert ray.is_initialized()           # reused, not torn down

    out = main(["pagerank", "--edges", edges, "--out", ranks,
                "--checkpoint", str(tmp_path / "ck")])
    assert out["iterations"] > 1
    t = pq.read_table(ranks)
    assert set(t.column_names) == {"vid", "rank"}
    assert abs(sum(t["rank"].to_pylist()) - 1.0) < 1e-9

    out = main(["components", "--edges", edges, "--out", comps,
                "--strategy", "shuffle"])
    assert out["num_vertices"] == t.num_rows
    # one JSON line per command on stdout
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 3 and all(json.loads(ln) for ln in lines)


def test_cli_query_and_unknown_name(tmp_path):
    out = main(["query", "--name", "group_agg",
                "--sf-dir", "/root/testdata/sf0.001",
                "--out", str(tmp_path / "q")])
    assert out["rows"] > 0
    with pytest.raises(SystemExit):
        main(["query", "--name", "no_such_query",
              "--out", str(tmp_path / "q2")])
