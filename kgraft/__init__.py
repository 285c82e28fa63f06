"""kgraft — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the semantics of the reference engine (forsummer/Gondar:
document corpus -> markup-to-text extraction -> per-section structured
extraction -> tabular materialization, see /root/repo/SURVEY.md) as a
streaming ``ray.data.Dataset`` DAG:

    read_parquet(pages) -> map_batches(html_to_text) -> flat_map(segments)
      -> actor-pool mention detection -> actor-pool triple extraction
      -> entity linking (broadcast alias dict + MinHash-LSH blocking)
      -> salted canonicalization groupby -> connected components
      -> node/edge Parquet tables + per-partition manifest (resumable).

No module in this package calls ``ray.init()`` / ``ray.shutdown()``;
sessions are owned by bench.py, CLI entry points, and the test fixture.
"""

__version__ = "0.1.0"
