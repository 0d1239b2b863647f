"""Benchmark harness — prints ONE JSON line.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Headline numbers:
  - index build (whitespace chain, pure built-ins) + docs/sec
  - index build (code-aware chain, Arrow UDF) + docs/sec
  - BM25 query latencies (term/and/or/phrase/wildcard/fuzzy/regex)
  - brute-force KNN top-k

Scaling evidence (north rule: two cluster sizes) is produced by
tools/scaling_bench.py which runs THIS job at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from pyspark.sql import functions as F

    from coa_codesearch_mcp_spark.index.build import build_logical_index
    from coa_codesearch_mcp_spark.query.executor import Searcher
    from coa_codesearch_mcp_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 4)
        return out

    # --- index build: whitespace chain (JVM built-ins only) ---
    def build_patterns():
        ix = build_logical_index(docs, field="content_patterns").cache()
        ix.postings.count()  # materialize
        return ix

    ix = timed("build_index_patterns", build_patterns)

    # --- index build: code-aware chain (Arrow-batched UDF) ---
    def build_content():
        ix2 = build_logical_index(
            docs, field="content", with_positions=False
        )
        ix2.postings.count()
        return ix2

    timed("build_index_content", build_content)

    # --- materialized store build + block-max WAND query path ---
    import shutil

    from coa_codesearch_mcp_spark.index.store import (
        IndexConfig,
        IndexReader,
        IndexWriter,
    )
    from coa_codesearch_mcp_spark.query.store_executor import StoreSearcher

    store_root = "/tmp/spark_graft_bench_ix"
    shutil.rmtree(store_root, ignore_errors=True)
    cfg = IndexConfig(
        field="content_patterns",
        n_buckets=16,
        range_size=max(n_docs // cpus, 256),
        chunk_size=max(n_docs // 4, 1024),
        chunks_per_wave=8,
        salt_threshold=max(n_docs // 4, 1000),
    )

    def build_store():
        IndexWriter(spark, store_root, cfg).build(docs)

    timed("build_store_index", build_store)
    ss = StoreSearcher(IndexReader(spark, store_root))
    timed("q1_term_wand", lambda: ss.search_term("spark", k=10).collect())
    timed("q3_or_wand", lambda: ss.search_or(["spark", "stream"], k=10).collect())
    timed("q2_and_wand", lambda: ss.search_and(["spark", "stream"], k=10).collect())

    s = Searcher(ix)
    timed("q1_term", lambda: s.search_term("spark", k=10).collect())
    timed("q2_and", lambda: s.search_and(["spark", "stream"], k=10).collect())
    timed("q3_or", lambda: s.search_or(["spark", "stream"], k=10).collect())
    timed("q5_phrase", lambda: s.search_phrase(["fast", "key"], k=10).collect())
    timed("q6_wildcard", lambda: s.search_wildcard("sp*", k=10).collect())
    timed("q7_fuzzy", lambda: s.search_fuzzy("sparkk", k=10).collect())
    timed("q8_regex", lambda: s.search_regexp("s.a.*", k=10).collect())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def knn():
        q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
        dot = F.aggregate(
            F.zip_with(
                "embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            emb.crossJoin(F.broadcast(q))
            .select("vec_id", dot.alias("dot"))
            .orderBy(F.desc("dot"))
            .limit(10)
            .collect()
        )

    timed("q16_knn", knn)

    # hashed-embedding generation throughput (model-free pandas UDF)
    from coa_codesearch_mcp_spark.functions.embeddings import embed_texts

    def embed_all():
        # aggregate over the embedding COLUMN — count(1) would let
        # Catalyst prune the UDF projection entirely and time a bare
        # row count (review finding, verified: zero UDF invocations)
        return embed_texts(docs, dim=64).agg(
            F.sum(F.size("embedding")).alias("total_components")
        ).collect()

    timed("embed_hash_corpus", embed_all)

    # --- incremental (NRT) tier: init + micro-batch MERGE + queries
    # through DeltaIndexManager (main + delta + tombstones + hidden-df
    # corrections). Establishes the baseline the decode-free/WAND live
    # tier must hold (round-3 VERDICT #4). ---
    import datetime

    from coa_codesearch_mcp_spark.streaming.incremental import (
        DeltaIndexManager,
        _url_doc_id,
    )

    inc_root = "/tmp/spark_graft_bench_inc"
    shutil.rmtree(inc_root, ignore_errors=True)
    inc_cfg = IndexConfig(
        field="content_patterns",
        n_buckets=16,
        range_size=1 << 58,      # hashed url ids: 16 scatter ranges
        chunk_size=1 << 58,
        chunks_per_wave=32,
        salt_threshold=max(n_docs // 4, 1000),
    )
    inc_docs = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
    ).withColumn("doc_id", _url_doc_id())
    mgr = DeltaIndexManager(spark, inc_root, inc_cfg)
    timed("inc_init_main", lambda: mgr.init_main(inc_docs))

    ts = datetime.datetime(2024, 4, 1)
    batch_rows = (
        [(f"doc://{i}", "upsert", f"updated copy number {i} spark stream", ts, ts)
         for i in range(0, 40)]
        + [(f"doc://{i}", "delete", None, None, ts) for i in range(40, 50)]
        + [(f"doc://new{i}", "upsert", f"fresh page {i} about fast key lookups", ts, ts)
           for i in range(10)]
    )
    batch = spark.createDataFrame(
        batch_rows,
        "url string, op string, text string, warc_ts timestamp, event_ts timestamp",
    )
    timed("inc_apply_batch", lambda: mgr.apply_batch(batch))
    timed("inc_q3_or", lambda: mgr.search_or(["spark", "stream"], k=10).collect())
    timed("inc_q2_and", lambda: mgr.search_and(["spark", "stream"], k=10).collect())
    timed(
        "inc_q5_phrase",
        lambda: mgr.search_phrase(["fast", "key"], k=10).collect(),
    )
    inc_hits, inc_stats = mgr.wand_stats(["spark", "stream"], k=10)

    # WAND pruning evidence (not a timing — decode counters over the
    # store index for a stopword-ish OR query, per doc range)
    from coa_codesearch_mcp_spark.query.wand import WandStats, wand_topk

    blocks, info = ss.reader.postings_blocks(["spark", "stream", "hash"])
    stats = WandStats()
    pdfb = blocks.toPandas()
    for _, grp in pdfb.groupby("range_id"):
        term_blocks = {
            t: (info[t]["idf"], g.sort_values("block_no").to_dict("records"))
            for t, g in grp.groupby("term")
            if t in info
        }
        wand_topk(term_blocks, ss.reader.avgdl, k=10, stats=stats)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_docs": n_docs,
                "cpus": cpus,
                "index_docs_per_sec_patterns": round(
                    n_docs / timings["build_index_patterns"], 2
                ),
                "index_docs_per_sec_content": round(
                    n_docs / timings["build_index_content"], 2
                ),
                "index_docs_per_sec_store": round(
                    n_docs / timings["build_store_index"], 2
                ),
                "wand_blocks_total": stats.blocks_total,
                "wand_blocks_decoded": stats.blocks_decoded,
                "wand_docs_scored": stats.docs_scored,
                "inc_wand_blocks_total": inc_stats.blocks_total,
                "inc_wand_blocks_decoded": inc_stats.blocks_decoded,
                "inc_wand_docs_scored": inc_stats.docs_scored,
            }
        )
    )


if __name__ == "__main__":
    main()
