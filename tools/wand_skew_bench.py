"""Block-max WAND pruning on a WEB-REALISTIC (skewed) corpus.

`tools/wand_stats.py` measures pruning over the oracle fixture, whose
51-word vocabulary makes every block's maximum near-identical — there
is nothing to prune there BY CONSTRUCTION. Real web corpora have
heavy-tailed dfs and tfs; this tool builds the same store index over
the generator's ``vocab_size``-extended corpus (tens of thousands of
terms, Zipf 1.3, log-normal doc lengths) and runs the same decode
counters, so the committed evidence covers the distribution the
north rule's target data actually has.

Every query shape also re-runs with pruning DISABLED (threshold held
at -inf) and asserts the top-k (doc_id, score) sets are identical —
the counters measure a safe optimization, not an approximation.

Usage: python tools/wand_skew_bench.py [n_docs] [vocab_size] [k]
Writes one JSON line (commit to BENCH/wand_skew_stats.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

OUT_ROOT = "/tmp/spark_graft_wandskew"


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    vocab_size = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from coa_codesearch_mcp_spark.fixtures.webgen import generate_webpages
    from coa_codesearch_mcp_spark.index.store import (
        IndexConfig,
        IndexReader,
        IndexWriter,
    )
    from coa_codesearch_mcp_spark.query.wand import (
        WandStats,
        exhaustive_topk_range,
        wand_topk,
    )
    from coa_codesearch_mcp_spark.session import get_spark

    spark = get_spark("wand_skew", master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.join(OUT_ROOT, f"ix_{n_docs}_{vocab_size}")
    if not os.path.exists(os.path.join(root, "manifest.json")):
        shutil.rmtree(root, ignore_errors=True)
        docs = generate_webpages(
            spark, n_docs, partitions=64, vocab_size=vocab_size
        ).withColumn("doc_id", F.monotonically_increasing_id())
        # same shape as the scaling index (tools/scaling_bench.py)
        cfg = IndexConfig(
            field="content", n_buckets=32, range_size=1 << 14,
            chunk_size=1 << 14, chunks_per_wave=64,
            salt_threshold=10_000, max_salts=64, with_positions=True,
        )
        IndexWriter(spark, root, cfg).build(docs)

    reader = IndexReader(spark, root)
    d = reader.dictionary().cache()
    top = [r["term"] for r in d.orderBy("df", ascending=False).limit(3).collect()]
    # selective: df within [n/400, n/100] — high idf, but df >> k so
    # the top-k is all selective-term docs and WAND can actually prune
    # the stopword's list (a term with df < k can NEVER allow pruning:
    # the top-k must then include stopword-only docs, pinning the
    # threshold at the stopword's own upper bound)
    sel = [
        r["term"]
        for r in (
            d.filter(
                (F.col("df") >= n_docs // 400) & (F.col("df") <= n_docs // 100)
            )
            .orderBy("df", ascending=False)
            .limit(2)
            .collect()
        )
    ]
    # rarer band: df ~ n/800..n/300. Decode fraction for stopword x
    # selective is governed by P(stopword block contains a selective
    # doc) ~ 1 - exp(-df_sel * BLOCK/range): at df ~ 1% most 128-doc
    # blocks hold one (skip bounded ~30%); at df ~ 0.2% whole runs of
    # stopword blocks are jumped — both shapes are committed evidence
    rare = [
        r["term"]
        for r in (
            d.filter(
                (F.col("df") >= n_docs // 800) & (F.col("df") <= n_docs // 300)
            )
            .orderBy("df")
            .limit(1)
            .collect()
        )
    ]

    def run(terms):
        blocks, info = reader.postings_blocks(terms)
        pdf = blocks.toPandas()
        dfs = {t: info[t]["df"] for t in terms if t in info}

        # the executor's global threshold bootstrap (StoreSearcher.
        # _bootstrap_theta): seed every range with the k-th best
        # single-term score of the rarest term
        rare = min(dfs, key=dfs.get)
        rare_scores = []
        for _, grp in pdf[pdf["term"] == rare].groupby("range_id"):
            rows = grp.sort_values("block_no").to_dict("records")
            rare_scores.extend(
                s
                for _, s in wand_topk(
                    {rare: (info[rare]["idf"], rows)}, reader.avgdl, k
                )
            )
        theta0 = (
            sorted(rare_scores, reverse=True)[k - 1]
            if len(rare_scores) >= k and len(dfs) > 1
            else 0.0
        )

        def scatter(threshold0):
            stats = WandStats()
            results, exhaustive, n_ranges = [], [], 0
            for _, grp in pdf.groupby("range_id"):
                term_blocks = {
                    t: (info[t]["idf"], g.sort_values("block_no").to_dict("records"))
                    for t, g in grp.groupby("term")
                    if t in info
                }
                results.extend(
                    (doc, round(score, 4))
                    for doc, score in wand_topk(
                        term_blocks,
                        reader.avgdl,
                        k=k,
                        threshold0=threshold0,
                        stats=stats,
                    )
                )
                exhaustive.extend(
                    (doc, round(score, 4))
                    for doc, score in exhaustive_topk_range(
                        term_blocks, reader.avgdl, k
                    )
                )
                n_ranges += 1
            topk = sorted(results, key=lambda r: (-r[1], r[0]))[:k]
            full = sorted(exhaustive, key=lambda r: (-r[1], r[0]))[:k]
            return stats, n_ranges, topk == full

        def counters(stats):
            return {
                "blocks_total": stats.blocks_total,
                "blocks_decoded": stats.blocks_decoded,
                "decode_fraction": round(
                    stats.blocks_decoded / max(stats.blocks_total, 1), 4
                ),
                "docs_scored": stats.docs_scored,
                "scored_fraction_of_corpus": round(
                    stats.docs_scored / max(reader.n_docs, 1), 4
                ),
            }

        cold_stats, n_ranges, cold_ok = scatter(0.0)
        boot_stats, _, boot_ok = scatter(theta0)
        return {
            "terms": terms,
            "df": dfs,
            "n_ranges": n_ranges,
            "unseeded": counters(cold_stats),
            "bootstrapped": {"theta0": round(theta0, 4), **counters(boot_stats)},
            "topk_equals_exhaustive": cold_ok and boot_ok,
        }

    out = {
        "metric": "wand_pruning_skewed_corpus",
        "corpus": {
            "n_docs": reader.n_docs,
            "vocab_size": vocab_size,
            "note": "generator's web-realistic mode: Zipf 1.3 over an "
            "extended vocabulary, log-normal doc lengths — the df/tf "
            "skew real web corpora have (fixtures/webgen.extended_vocab)",
        },
        "k": k,
        "all_stopwords": run(top),
        "stopword_x_selective": run(top[:1] + sel[:1]),
        "stopword_x_rare": run(top[:1] + rare[:1]) if rare else None,
        "selective_pair": run(sel),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
