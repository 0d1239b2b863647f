"""Block-max WAND pruning evidence at a scale where pruning shows.

The sf0.1 bench corpus (5k docs) fits in a handful of blocks, so the
decode counters there are trivially 100%. This tool runs the counters
over a REAL store index (default: the 480k-doc index the scaling bench
leaves at /tmp/spark_graft_scaling/ix_8_*) for a common-term OR query
and prints one JSON line: blocks decoded / total, docs scored / corpus.

Usage: python tools/wand_stats.py [index_root] [k]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    roots = sorted(glob.glob("/tmp/spark_graft_scaling/ix_*"))
    root = sys.argv[1] if len(sys.argv) > 1 else (roots[-1] if roots else None)
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if not root or not os.path.exists(os.path.join(root, "manifest.json")):
        print(json.dumps({"error": "no index found; run tools/scaling_bench.py first"}))
        return

    from coa_codesearch_mcp_spark.index.store import IndexReader
    from coa_codesearch_mcp_spark.query.wand import WandStats, wand_topk
    from coa_codesearch_mcp_spark.session import get_spark

    spark = get_spark("wand_stats", master="local[8]", shuffle_partitions=8)
    reader = IndexReader(spark, root)
    d = reader.dictionary()
    top = [r["term"] for r in d.orderBy("df", ascending=False).limit(3).collect()]
    # rarest terms in the dictionary (synthetic vocab is tiny and
    # dense, so "rare" is relative)
    rare = [r["term"] for r in d.orderBy("df").limit(2).collect()]

    def run(terms):
        blocks, info = reader.postings_blocks(terms)
        pdf = blocks.toPandas()
        dfs = {t: info[t]["df"] for t in terms if t in info}

        # the executor's global threshold bootstrap (StoreSearcher.
        # _bootstrap_theta): k-th best single-term score of the rarest
        # query term, seeded into every range
        rare = min(dfs, key=dfs.get) if dfs else None
        rare_scores = []
        if rare is not None and len(dfs) > 1:
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
            if len(rare_scores) >= k
            else 0.0
        )

        def scatter(threshold0):
            stats = WandStats()
            n_ranges = 0
            for _, grp in pdf.groupby("range_id"):
                term_blocks = {
                    t: (info[t]["idf"], g.sort_values("block_no").to_dict("records"))
                    for t, g in grp.groupby("term")
                    if t in info
                }
                wand_topk(
                    term_blocks, reader.avgdl, k=k,
                    threshold0=threshold0, stats=stats,
                )
                n_ranges += 1
            return stats, n_ranges

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

        cold, n_ranges = scatter(0.0)
        seeded, _ = scatter(theta0)
        return {
            "terms": terms,
            "df": dfs,
            "n_ranges": n_ranges,
            "unseeded": counters(cold),
            "bootstrapped": {"theta0": round(theta0, 4), **counters(seeded)},
        }

    print(
        json.dumps(
            {
                "metric": "wand_pruning",
                "index_root": root,
                "n_docs": reader.n_docs,
                "k": k,
                # worst case: all stopwords (uniform synthetic text ->
                # equal block maxima -> little to prune, by design)
                "all_stopwords": run(top),
                # the case BMW exists for: stopword x rare terms
                "stopword_x_rare": run(top[:1] + rare),
            }
        )
    )


if __name__ == "__main__":
    main()
