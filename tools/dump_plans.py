"""Dump .explain("formatted") for declared queries into plans/<tag>/.

Usage: python tools/dump_plans.py <out_dir> <suffix> [query ...]

Runs each selected queries() entry at sf0.01 and writes
<out_dir>/<name>_<suffix>.txt. Separate from bench.py (frozen) per the
optimization-round rules; used to produce the before/after plan
evidence in plans/r06/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

DEFAULT = [
    "q1_term_bm25",
    "q2_and_bm25",
    "q3_or_bm25",
    "q5_phrase_bm25",
    "a1_tf",
    "a3_corpus_stats",
    "q1_term_bm25_wand",
    "q2_and_bm25_wand",
    "q3_or_bm25_wand",
    "q5_phrase_bm25_wand",
    "q6_wildcard_bm25_wand",
    "incremental_upsert_search",
    "incremental_phrase_search",
    "text_hash_embeddings",
    "pipeline_quality_dedup_embed_knn",
]


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from coa_codesearch_mcp_spark.session import get_spark

    spark = get_spark("dump_plans", master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
