"""coa_codesearch_mcp_spark — a PySpark-native full-text index + BM25 engine.

Brand-new engine with the query and data-processing capabilities of
anortham/coa-codesearch-mcp (C#/.NET, Lucene.NET 4.8), re-expressed
Spark-first over Parquet tables of Common-Crawl-style web pages:

- vectorized Arrow/pandas UDF analyzer chains (see ``analysis/``) that
  reproduce the reference's per-field tokenization invariant
  (reference: Services/Analysis/CodeAnalyzer.cs),
- an inverted-index build pipeline producing delta/varint-compressed,
  block-max-annotated posting lists partitioned by term bucket with
  explicit hot-term salting (``index/``),
- a BM25 (k1=1.2, b=0.75) top-k query engine with boolean / phrase /
  wildcard / fuzzy / regex operators and block-max WAND pruning
  executed as scatter-gather over index partitions (``query/``),
- the reference's multi-factor re-scoring layer (``scoring/``),
- large-scale training-data-pipeline operators: dedup (exact, MinHash
  LSH, SimHash, n-gram Jaccard), ANN similarity search, text quality
  analysis, multimodal column plumbing (``functions/``),
- incremental / streaming index maintenance (``streaming/``).

Everything is DataFrame-first: Catalyst owns filters, joins,
aggregations, column/partition pruning; custom logic lives in
vectorized pandas UDFs only where built-in operators cannot express
the semantics (tokenization, posting-block codec, WAND).
"""

__version__ = "0.1.0"
