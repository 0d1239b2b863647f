"""TextSearch engine facade — the full query lifecycle of the
reference's flagship tool (SURVEY §3.1, Tools/TextSearchTool.cs):

    validate -> mode parse -> smart field routing -> query build
    (rewrites) -> execute on the routed field index -> tiered
    fallback (symbols -> content on zero hits) -> top-k.

Steps 1-4 are driver-side pure Python; execution crosses into Spark
exactly once per tier.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..analysis.chains import FIELD_CONTENT
from .planner import (
    QueryPlan,
    SearchMode,
    build_query,
    smart_process,
    validate_query,
)


def token_budget_k(max_tokens: int = 5000, response_mode: str = "adaptive",
                   has_context: bool = False) -> int:
    """O5 result-truncation ladder (TextSearchTool.cs:276-298):
    token budget -> k in {1..10}."""
    tokens_per_result = 200 if has_context else 100
    safety_budget = int(min(max_tokens * 0.4, 2000))
    budget_based_max = max(1, safety_budget // tokens_per_result)
    mode = (response_mode or "adaptive").lower()
    if mode == "full":
        return min(budget_based_max, 10)
    if mode == "summary":
        return min(budget_based_max, 2)
    return min(budget_based_max, 3)


@dataclass
class SearchResult:
    hits: DataFrame          # (doc_id, score)
    plan: QueryPlan | None
    search_type: str
    fallback_used: bool = False
    error: str | None = None


class TextSearchEngine:
    """Routes queries across per-field searchers (logical or store
    backed — both expose the same search_*/execute contract)."""

    def __init__(self, searchers: dict[str, object]):
        if FIELD_CONTENT not in searchers:
            raise ValueError("a 'content' searcher is required")
        self.searchers = searchers

    def search(
        self,
        query: str,
        mode: str = "auto",
        k: int = 10,
    ) -> SearchResult:
        try:
            m = SearchMode(mode.lower())
        except ValueError:
            m = SearchMode.AUTO

        content = self.searchers[FIELD_CONTENT]

        # explicit modes bypass smart routing (TextSearchTool.cs:192-212)
        if m == SearchMode.EXACT:
            ast = build_query(query, "literal", FIELD_CONTENT)
            return SearchResult(content.execute(ast, k), None, "literal")
        if m == SearchMode.FUZZY:
            ast = build_query(query, "fuzzy", FIELD_CONTENT)
            return SearchResult(content.execute(ast, k), None, "fuzzy")
        if m == SearchMode.REGEX:
            ast = build_query(query, "regex", FIELD_CONTENT)
            return SearchResult(content.execute(ast, k), None, "regex")

        # auto: smart routing + validation
        plan = smart_process(query, m)
        ok, err = validate_query(plan.processed_query)
        if not ok:
            return SearchResult(
                content._empty(), plan, "standard", error=err
            )
        field = plan.target_field if plan.target_field in self.searchers else FIELD_CONTENT
        searcher = self.searchers[field]
        ast = build_query(plan.processed_query, "standard", field)
        hits = searcher.execute(ast, k)

        # tiered fallback: routed field found nothing -> content
        # (TextSearchTool.cs:313-343)
        fallback = False
        if field != FIELD_CONTENT and len(hits.take(1)) == 0:
            ast2 = build_query(plan.processed_query, "standard", FIELD_CONTENT)
            hits = content.execute(ast2, k)
            fallback = True
        return SearchResult(hits, plan, "standard", fallback_used=fallback)

    def search_rescored(
        self,
        query: str,
        docs: DataFrame,
        mode: str = "auto",
        k: int = 10,
        candidate_multiplier: int = 10,
        id_col: str = "doc_id",
        reference_time=None,
    ) -> DataFrame:
        """Full pipeline with the multi-factor layer (SURVEY §2.4):
        BM25 candidates (k * multiplier) -> broadcast join to docs ->
        f1..f6 column expressions -> 0.6/0.4 blend -> top-k.

        Divergence from the reference (which re-scores EVERY candidate
        inside the Lucene collector): we re-rank an over-fetched
        candidate pool — the scalable form at 10^12 docs, where a
        per-doc regex over text for every match is not an option.
        """
        from pyspark.sql import functions as F

        from ..scoring.factors import add_multi_factor_score

        res = self.search(query, mode=mode, k=k * candidate_multiplier)
        if res.error:
            return res.hits
        # Broadcast the TINY top-k*multiplier hit set against the docs
        # table (SURVEY §2.7 J2) — never the docs table itself, which
        # at 10^12 docs would OOM the driver and every executor.
        joined = docs.join(
            F.broadcast(res.hits.withColumnRenamed("doc_id", id_col)), id_col
        )
        rescored = add_multi_factor_score(
            joined, query, reference_time=reference_time
        )
        return (
            rescored.select(
                F.col(id_col).alias("doc_id"),
                F.round(F.col("final_score"), 4).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
