"""Shared flat-boolean composition (Lucene scoring semantics): a doc
matches every MUST clause and no MUST_NOT clause; its score sums the
matching MUST + SHOULD contributions.

One implementation serves BOTH executors — the logical Searcher and
the store-backed StoreSearcher differ only in how a single clause's
full (doc_id, contrib) relation is produced (DataFrame expressions vs
the WAND scatter), so the composition takes that as a callable.
Previously the two engines carried near-identical copies of this
block; a semantics fix applied to one would silently leave the other
diverging (round-4 review finding). Reference: Lucene BooleanQuery
scoring, mirrored from the planner's flat AST shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compose_bool(q, clause_relation) -> DataFrame | None:
    """``q``: a planner BoolQ. ``clause_relation``: callable mapping a
    clause AST node to its FULL (doc_id, contrib) relation. Returns
    the composed, UNORDERED (doc_id, score) relation (must_not already
    anti-joined), or None when the query has no positive clauses."""
    parts = []
    for i, clause in enumerate(q.must):
        parts.append(
            clause_relation(clause).select(
                "doc_id", "contrib", F.lit(i).alias("clause"),
                F.lit(True).alias("is_must"),
            )
        )
    for j, clause in enumerate(q.should):
        parts.append(
            clause_relation(clause).select(
                "doc_id", "contrib", F.lit(1000 + j).alias("clause"),
                F.lit(False).alias("is_must"),
            )
        )
    if not parts:
        return None
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    agg = allc.groupBy("doc_id").agg(
        F.sum("contrib").alias("score"),
        F.count_distinct(
            F.when(F.col("is_must"), F.col("clause"))
        ).alias("n_must"),
    )
    if q.must:
        agg = agg.filter(F.col("n_must") == len(q.must))
    out = agg.select("doc_id", "score")
    if q.must_not:
        banned = None
        for clause in q.must_not:
            b = clause_relation(clause).select("doc_id")
            banned = b if banned is None else banned.unionByName(b)
        out = out.join(banned.distinct(), "doc_id", "left_anti")
    return out
