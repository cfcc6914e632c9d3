"""igpm_pem_ray — a Ray-Data-native link-graph analytics engine.

Built from scratch (NOT a port) with the query / data-processing
capabilities of the reference repo hkanezashi/IGPM-PEM
(/root/reference; HiPC 2018, arXiv:1812.10321), re-expressed as
idiomatic Ray Data pipelines:

- ``sources``   : pages fixture generator, edge-list / node-link readers
                  (reference: load_edgelist*.py, query_call.py load_graph)
- ``stages``    : HTML -> text/href extraction actor pool, partitioning
- ``graph``     : edge-table build, PageRank, connected components,
                  label propagation, triangle count, degrees
                  (reference kernels: rwr.py, gray_incremental.py)
- ``state``     : per-iteration Parquet checkpoints + lineage manifests
- ``functions`` : condition-expression compiler, aggregator, group/order
                  (reference: query/ConditionParser.py, gray/aggregator.py)
- ``text``      : dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                  language id, quality scoring, token counting
- ``ann``       : brute-force + LSH-bucketed cosine top-k search
- ``pipelines`` : the queries() surface wired into __ray_entry__

Design rules (see SURVEY.md sections 4 and 7):
- every hot transform is ``map_batches`` over Arrow batches
  (``batch_format="pyarrow"`` / numpy), never per-row Python;
- stateful stages are callable classes -> actor pools;
- wide steps are explicit ``groupby``/``sort``/``join`` shuffles with
  documented keys; small sides are broadcast via ``ray.put``;
- iterative kernels keep cross-iteration state in checkpointed
  Datasets/arrays, never in actor memory, so any iteration resumes.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions
are owned by bench.py, CLI entry points and the test fixture.
"""

__version__ = "0.1.0"
