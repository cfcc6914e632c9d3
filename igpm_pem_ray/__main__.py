"""``python -m igpm_pem_ray`` — the job entrypoint the north rule's
``ray job submit`` launch path drives:

    ray job submit --working-dir . -- python -m igpm_pem_ray \
        extract --pages /data/pages --out /data/edges
    ray job submit ... -- python -m igpm_pem_ray \
        pagerank --edges /data/edges --out /data/ranks \
        --checkpoint /data/ck --resume

The CLI is the ONLY library-side owner of a Ray session (per the
driver contract, ``entry()``/``queries()`` never call ``ray.init``):
it initialises Ray only when no session exists — under ``ray job
submit`` the job server has already initialised one, standalone it
connects to ``$RAY_ADDRESS`` (default "local") — and shuts down only
what it started.  Every subcommand streams its result to partitioned
parquet (never one giant file) and prints ONE JSON line of metrics to
stdout, so jobs compose in shell pipelines and the job log carries
the lineage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _ray():
    import ray

    started = False
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
        started = True
    return ray, started


def _emit(d: dict) -> None:
    print(json.dumps(d), flush=True)


def cmd_extract(args) -> dict:
    import ray.data as rd

    from igpm_pem_ray.graph import build

    pages = rd.read_parquet(args.pages)
    edges = build.pages_to_edges(pages, concurrency=args.concurrency,
                                 batch_size=args.batch_size)
    edges.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    return {"command": "extract", "out": args.out, "num_edges": n}


def cmd_pagerank(args) -> dict:
    import ray.data as rd

    from igpm_pem_ray.graph.pagerank import pagerank

    stats: dict = {}
    t = pagerank(rd.read_parquet(args.edges), tol=args.tol,
                 max_iters=args.max_iters, stats=stats,
                 checkpoint_dir=args.checkpoint, resume=args.resume)
    rd.from_arrow(t).write_parquet(args.out)
    return {"command": "pagerank", "out": args.out,
            "num_vertices": t.num_rows,
            "iterations": stats.get("iterations"),
            "residual": stats.get("residual")}


def cmd_components(args) -> dict:
    import ray.data as rd

    stats: dict = {}
    if args.strategy == "shuffle":
        from igpm_pem_ray.graph.shuffle_kernels import (
            connected_components_shuffle)

        out = connected_components_shuffle(
            rd.read_parquet(args.edges), stats=stats,
            checkpoint_dir=args.checkpoint, resume=args.resume)
        out.write_parquet(args.out)
        n = rd.read_parquet(args.out).count()
    else:
        from igpm_pem_ray.graph.components import connected_components

        t = connected_components(rd.read_parquet(args.edges), stats=stats)
        rd.from_arrow(t).write_parquet(args.out)
        n = t.num_rows
    return {"command": "components", "out": args.out, "num_vertices": n,
            "rounds": stats.get("rounds"), "strategy": args.strategy}


def cmd_query(args) -> dict:
    import pyarrow as pa
    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if args.name not in qs:
        raise SystemExit(
            f"unknown query {args.name!r}; available: "
            + ", ".join(sorted(qs)))
    t0 = time.perf_counter()
    res = qs[args.name](args.sf_dir)
    if isinstance(res, pa.Table):
        ds = rd.from_arrow(res)
    elif hasattr(res, "write_parquet"):
        ds = res
    else:  # pandas
        ds = rd.from_pandas(res)
    ds.write_parquet(args.out)
    n = rd.read_parquet(args.out).count()
    return {"command": "query", "name": args.name, "out": args.out,
            "rows": n, "wall_sec": round(time.perf_counter() - t0, 3)}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m igpm_pem_ray")
    sub = p.add_subparsers(dest="command", required=True)

    e = sub.add_parser("extract", help="pages parquet -> edge parquet")
    e.add_argument("--pages", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--concurrency", type=int, default=4)
    e.add_argument("--batch-size", type=int, default=256)
    e.set_defaults(fn=cmd_extract)

    r = sub.add_parser("pagerank", help="edge parquet -> (vid, rank)")
    r.add_argument("--edges", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--tol", type=float, default=1e-6)
    r.add_argument("--max-iters", type=int, default=100)
    r.add_argument("--checkpoint", default=None)
    r.add_argument("--resume", action="store_true")
    r.set_defaults(fn=cmd_pagerank)

    c = sub.add_parser("components", help="edge parquet -> (vid, component)")
    c.add_argument("--edges", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--strategy", choices=["dense", "shuffle"],
                   default="dense")
    c.add_argument("--checkpoint", default=None)
    c.add_argument("--resume", action="store_true")
    c.set_defaults(fn=cmd_components)

    q = sub.add_parser("query", help="run a registered pipeline by name")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", required=True)
    q.set_defaults(fn=cmd_query)
    return p


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    ray, started = _ray()
    try:
        out = args.fn(args)
        _emit(out)
        return out
    finally:
        if started:
            ray.shutdown()


if __name__ == "__main__":
    main()
