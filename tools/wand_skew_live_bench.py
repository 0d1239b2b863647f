"""Block-max WAND pruning on the LIVE tier (main + delta + tombstones
+ hidden-df corrections) over the web-realistic skewed corpus.

`tools/wand_skew_bench.py` committed the store-path evidence
(BENCH/wand_skew_stats_960k.json: stopword x rare decodes 3.9% of
blocks); this tool answers round-4 VERDICT task #4 — does the live
tier hold comparable decode fractions AFTER a churn batch, when every
range carries multiple segments, tombstone visibility predicates and
correction-adjusted df? Flow:

  1. init_main over the Zipf-1.3 / log-normal skewed corpus
     (fixtures/webgen extended vocab, hashed url doc ids);
  2. one churn micro-batch: ~1% upserts (changed text), ~0.5%
     deletes, ~0.5% brand-new docs — delta segment + tombstones +
     hidden-df corrections all populated;
  3. the same query shapes as the store bench (all-stopwords,
     stopword x selective, stopword x rare, selective pair) through
     DeltaIndexManager.wand_stats, unseeded AND bootstrapped;
  4. ground truth: a fresh single-segment init_main over the LIVE
     corpus (post-churn) — live-tier top-k must equal the fresh
     index's top-k for every shape (the counters measure a safe
     optimization, not an approximation).

Usage: python tools/wand_skew_live_bench.py [n_docs] [vocab_size] [k]
Writes one JSON line (commit to BENCH/wand_skew_live_stats.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

OUT_ROOT = "/tmp/spark_graft_wandskew_live"


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    vocab_size = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from coa_codesearch_mcp_spark.fixtures.webgen import generate_webpages
    from coa_codesearch_mcp_spark.index.store import IndexConfig
    from coa_codesearch_mcp_spark.session import get_spark
    from coa_codesearch_mcp_spark.streaming.incremental import (
        DeltaIndexManager,
        _url_doc_id,
    )

    spark = get_spark("wand_skew_live", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    n_up = n_docs // 100          # ~1% changed text
    n_del = n_docs // 200         # ~0.5% deleted
    n_new = n_docs // 200         # ~0.5% brand new
    # hashed 62-bit url ids: 2^62 / 2^58 = 16 scatter ranges — the
    # same order as the store bench's dense-id ranges at this scale
    cfg = IndexConfig(
        field="content", n_buckets=32, range_size=1 << 58,
        chunk_size=1 << 58, chunks_per_wave=64,
        salt_threshold=10_000, max_salts=64, with_positions=False,
    )

    corpus = (
        generate_webpages(spark, n_docs, partitions=64, vocab_size=vocab_size)
        .select("url", "text")
        .withColumn("doc_id", _url_doc_id())
    )

    import datetime

    ts = datetime.datetime(2024, 4, 1)
    # deterministic churn sets: first n_up urls get new text (drawn
    # from the same skewed generator at a different seed so the df/tf
    # shape is preserved), the next n_del urls are deleted
    churn_urls = [
        r["url"]
        for r in corpus.select("url").orderBy("url").limit(n_up + n_del).collect()
    ]
    up_urls, del_urls = churn_urls[:n_up], churn_urls[n_up:]
    new_texts = [
        r["text"]
        for r in generate_webpages(
            spark, n_up + n_new, partitions=8, seed=1042, vocab_size=vocab_size
        )
        .select("text")
        .collect()
    ]
    batch_rows = (
        [(u, "upsert", t, ts, ts) for u, t in zip(up_urls, new_texts[:n_up])]
        + [(u, "delete", None, None, ts) for u in del_urls]
        + [
            (f"https://added.org/{i}.html", "upsert", t, ts, ts)
            for i, t in enumerate(new_texts[n_up:])
        ]
    )

    root = os.path.join(OUT_ROOT, f"ix_{n_docs}_{vocab_size}")
    if not os.path.exists(os.path.join(root, "main", "manifest.json")):
        shutil.rmtree(root, ignore_errors=True)
    mgr = DeltaIndexManager(spark, root, cfg)
    if not os.path.exists(os.path.join(root, "main", "manifest.json")):
        mgr.init_main(corpus)
    if not mgr._delta_ids():
        batch = spark.createDataFrame(
            batch_rows,
            "url string, op string, text string, warc_ts timestamp, "
            "event_ts timestamp",
        )
        mgr.apply_batch(batch)

    # the LIVE corpus the fresh ground-truth index is built over
    del_set = set(del_urls)
    up_map_df = spark.createDataFrame(
        [(u, t) for u, t in zip(up_urls, new_texts[:n_up])], "url string, new_text string"
    )
    live = (
        corpus.filter(~F.col("url").isin(list(del_set)))
        .join(up_map_df, "url", "left")
        .select(
            "url",
            F.coalesce("new_text", "text").alias("text"),
        )
        .unionByName(
            spark.createDataFrame(
                [
                    (f"https://added.org/{i}.html", t)
                    for i, t in enumerate(new_texts[n_up:])
                ],
                "url string, text string",
            )
        )
        .withColumn("doc_id", _url_doc_id())
    )
    fresh_root = os.path.join(OUT_ROOT, f"fresh_{n_docs}_{vocab_size}")
    if not os.path.exists(os.path.join(fresh_root, "main", "manifest.json")):
        shutil.rmtree(fresh_root, ignore_errors=True)
    fresh = DeltaIndexManager(spark, fresh_root, cfg)
    if not os.path.exists(os.path.join(fresh_root, "main", "manifest.json")):
        fresh.init_main(live)

    # term bands from the MAIN segment's dictionary (live df
    # corrections shift these by <=1% — band selection only)
    reader = mgr.segments()[0][1]
    d = reader.dictionary().cache()
    top = [r["term"] for r in d.orderBy("df", ascending=False).limit(3).collect()]
    sel = [
        r["term"]
        for r in d.filter(
            (F.col("df") >= n_docs // 400) & (F.col("df") <= n_docs // 100)
        )
        .orderBy("df", ascending=False)
        .limit(2)
        .collect()
    ]
    rare = [
        r["term"]
        for r in d.filter(
            (F.col("df") >= n_docs // 800) & (F.col("df") <= n_docs // 300)
        )
        .orderBy("df")
        .limit(1)
        .collect()
    ]
    n_live, _avgdl = mgr.combined_stats()

    def counters(stats):
        return {
            "blocks_total": stats.blocks_total,
            "blocks_decoded": stats.blocks_decoded,
            "decode_fraction": round(
                stats.blocks_decoded / max(stats.blocks_total, 1), 4
            ),
            "docs_scored": stats.docs_scored,
            "scored_fraction_of_corpus": round(
                stats.docs_scored / max(n_live, 1), 4
            ),
        }

    def run(terms):
        hits_cold, st_cold = mgr.wand_stats(terms, k=k, bootstrap=False)
        hits_boot, st_boot = mgr.wand_stats(terms, k=k, bootstrap=True)
        truth, _ = fresh.wand_stats(terms, k=k, bootstrap=False)
        return {
            "terms": terms,
            "n_segments": len(mgr.segments()),
            "unseeded": counters(st_cold),
            "bootstrapped": counters(st_boot),
            "topk_equals_unseeded": hits_boot == hits_cold,
            "topk_equals_fresh_rebuild": hits_boot == truth,
        }

    out = {
        "metric": "wand_pruning_live_tier_skewed_corpus",
        "corpus": {
            "n_docs_initial": n_docs,
            "n_docs_live": n_live,
            "vocab_size": vocab_size,
            "churn": {"upserts": n_up, "deletes": n_del, "new": n_new},
            "note": "webgen web-realistic mode (Zipf 1.3, log-normal dl) "
            "through DeltaIndexManager: main + 1 delta + tombstones + "
            "hidden-df corrections",
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
