"""Snippet highlighting + line-number resolution over the hit set
(reference: Services/SmartSnippetService.cs:33-96 — chevron «»
highlight markers, Lucene Highlighter with NullFragmenter ≈ whole
matched line; Services/LineAwareSearchService.cs:27-96 — first
matching line number per hit).

Runs over the top-k candidate set AFTER the broadcast join to the
docs table — never over the full corpus (same contract as the
multi-factor layer)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_snippets(
    hits: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    context_lines: int = 0,
) -> DataFrame:
    """Attach (line_number, snippet) per hit: the first line matching
    any query term, with terms wrapped in «» chevrons.

    line_number is 1-based (reference convention); -1 when no line
    matches (e.g. the hit matched on a camel-split synonym that does
    not literally occur)."""
    if not query_terms:
        return hits.withColumn("line_number", F.lit(-1)).withColumn(
            "snippet", F.lit(None).cast("string")
        )
    alt = "|".join(re.escape(t) for t in sorted(set(query_terms)) if t)
    find_pat = f"(?i)({alt})"

    lines = F.split(F.col(text_col), r"\n")
    # index of first matching line (1-based; 0 = none)
    first = F.array_position(
        F.transform(lines, lambda l: l.rlike(find_pat)), True
    )
    lo = F.greatest(first - context_lines, F.lit(1))
    span = F.lit(1 + 2 * context_lines)
    raw = F.concat_ws("\n", F.slice(lines, lo, span))
    highlighted = F.regexp_replace(raw, find_pat, "«$1»")
    return hits.withColumn(
        "line_number", F.when(first > 0, first).otherwise(F.lit(-1)).cast("int")
    ).withColumn(
        "snippet", F.when(first > 0, highlighted)
    )


def semantic_supplement(
    lexical_hits: DataFrame,
    embeddings: DataFrame,
    query_vec: list[float],
    min_hits: int = 5,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Q12 tier-3: when the lexical tier returns fewer than
    ``min_hits``, supplement with cosine-KNN hits, deduplicated
    against existing hits by id (reference: TextSearchTool.cs:345-415
    — semantic hits join the result list with a tier marker).

    Returns (doc_id, score, tier) where tier in {lexical, semantic};
    semantic scores are cosine similarities (the reference reports
    similarity = 1 - distance/2 for its vec0 metric — we report plain
    cosine, documented)."""
    from .similarity import knn_bruteforce

    lex = lexical_hits.select(
        F.col(id_col).alias("doc_id"), "score", F.lit("lexical").alias("tier")
    ).cache()
    n = lex.count()
    if n >= min_hits:
        return lex
    sem = knn_bruteforce(embeddings, query_vec, k=k, id_col=id_col).select(
        F.col(id_col).alias("doc_id"),
        F.col("cosine").alias("score"),
        F.lit("semantic").alias("tier"),
    )
    # J5: dedup semantic against existing lexical hits (anti-join)
    sem = sem.join(lex.select("doc_id"), "doc_id", "left_anti")
    return lex.unionByName(sem.limit(max(0, k - n)))
