"""Shared dictionary-expansion predicates (wildcard / regexp / fuzzy /
prefix -> OR of matching terms, capped at MAX_CLAUSE_COUNT).

One definition of each rewrite, used by BOTH the single-index
StoreSearcher and the incremental DeltaIndexManager — like
query/phrase.py, extracted so the two tiers cannot drift (reference
analog: Lucene MultiTermQuery rewrites with maxClauseCount)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .executor import MAX_CLAUSE_COUNT


def wildcard_predicate(pattern: str) -> Column:
    from ..functions.text import glob_to_regex

    return F.col("term").rlike(glob_to_regex(pattern))


def regexp_predicate(pattern: str) -> Column:
    return F.col("term").rlike(f"^(?:{pattern})$")


def fuzzy_predicate(term: str, max_edits: int = 2) -> Column:
    return (
        (F.length("term") >= len(term) - max_edits)
        & (F.length("term") <= len(term) + max_edits)
        & (F.levenshtein(F.col("term"), F.lit(term)) <= max_edits)
    )


def prefix_predicate(prefix: str) -> Column:
    return F.col("term").startswith(prefix)


def expand_terms(dictionary: DataFrame, predicate: Column) -> list[str]:
    """Matching terms, deterministic order, capped like Lucene's
    rewrite clause limit."""
    rows = (
        dictionary.select("term")
        .filter(predicate)
        .distinct()
        .orderBy("term")
        .limit(MAX_CLAUSE_COUNT)
        .collect()
    )
    return [r["term"] for r in rows]
