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

from pyspark.sql import DataFrame, SparkSession

from ..analysis.chains import FIELD_CONTENT
from .cache import QueryCache, rows_to_local_df
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
    from_cache: bool = False


class TextSearchEngine:
    """Routes queries across per-field searchers (logical or store
    backed — both expose the same search_*/execute contract).

    Carries a driver-side result cache (reference parity:
    QueryCacheService.cs:41-103, probed in TextSearchTool.cs:147-162
    and populated at :432-440): a repeated query within the sliding
    TTL returns the stored top-k rows as a local relation — ZERO Spark
    jobs launched. Pass ``cache=None`` plus ``use_cache=False`` to
    disable (e.g. benchmarking cold paths)."""

    def __init__(
        self,
        searchers: dict[str, object],
        cache: QueryCache | None = None,
        use_cache: bool = True,
    ):
        if FIELD_CONTENT not in searchers:
            raise ValueError("a 'content' searcher is required")
        self.searchers = searchers
        self.cache = cache if cache is not None else (QueryCache() if use_cache else None)

    # ------------------------------------------------------- caching

    def _spark(self) -> SparkSession | None:
        s = SparkSession.getActiveSession()
        if s is not None:
            return s
        content = self.searchers[FIELD_CONTENT]
        reader = getattr(content, "reader", None)
        if reader is not None:
            return reader.spark
        ix = getattr(content, "ix", None)
        if ix is not None:
            return ix.postings.sparkSession
        return None

    def _snapshot_token(self, searcher) -> object:
        """Snapshot identity folded into cache keys: store-backed
        searchers expose manifest mtime (one stat, zero jobs), so an
        index commit invalidates hits for free instead of serving up
        to ttl_seconds of pre-rebuild answers; logical searchers wrap
        an immutable in-memory index, where None (no versioning) is
        exact."""
        fn = getattr(searcher, "snapshot_token", None)
        return fn() if fn is not None else None

    def _run_cached(self, key: tuple, run, state: dict | None = None) -> tuple[DataFrame, bool]:
        """run() -> lazy hits DataFrame. Returns (hits, from_cache).
        On a miss the result is materialized once (it is top-k small
        by contract), stored, and returned as a local relation.

        ``state`` (the auto path's fallback marker) is cached WITH the
        rows: a hit must report the same fallback_used the original
        execution did, not a hardcoded False."""
        spark = self._spark()
        if self.cache is None or spark is None:
            return run(), False
        cached = self.cache.get(key)
        if cached is not None:
            rows, fallback = cached
            if state is not None:
                state["fallback"] = fallback
            return rows_to_local_df(spark, rows), True
        df = run()
        collected = [(r["doc_id"], r["score"]) for r in df.collect()]
        self.cache.put(
            key, (collected, bool(state and state.get("fallback")))
        )
        return rows_to_local_df(spark, collected), False

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
        explicit = {
            SearchMode.EXACT: "literal",
            SearchMode.FUZZY: "fuzzy",
            SearchMode.REGEX: "regex",
        }
        if m in explicit:
            kind = explicit[m]
            key = (query, FIELD_CONTENT, kind, k, self._snapshot_token(content))
            hits, hit = self._run_cached(
                key,
                lambda: content.execute(build_query(query, kind, FIELD_CONTENT), k),
            )
            return SearchResult(hits, None, kind, from_cache=hit)

        # auto: smart routing + validation
        plan = smart_process(query, m)
        ok, err = validate_query(plan.processed_query)
        if not ok:
            return SearchResult(
                content._empty(), plan, "standard", error=err
            )
        field = plan.target_field if plan.target_field in self.searchers else FIELD_CONTENT
        # the key carries the routed field's snapshot AND content's:
        # a zero-hit routed query falls back to content, so cached
        # fallback rows must also be orphaned when the CONTENT index
        # commits (review finding: keying on the routed field alone
        # served pre-rebuild fallback hits for up to ttl_seconds)
        key = (
            plan.processed_query, field, "standard", k,
            self._snapshot_token(self.searchers[field]),
            self._snapshot_token(content) if field != FIELD_CONTENT else None,
        )
        state = {"fallback": False}

        def run() -> DataFrame:
            searcher = self.searchers[field]
            ast = build_query(plan.processed_query, "standard", field)
            hits = searcher.execute(ast, k)
            # tiered fallback: routed field found nothing -> content
            # (TextSearchTool.cs:313-343). The zero-hit probe COLLECTS
            # the routed top-k (bounded by k) instead of take(1):
            # take(1) launched the whole scatter once for the probe and
            # a second time for the caller's collect — doubling every
            # routed query (round-6; the collected rows come back as a
            # local relation, so downstream consumption is free).
            if field != FIELD_CONTENT:
                spark = self._spark()
                if spark is not None:
                    rows = [(r["doc_id"], r["score"]) for r in hits.collect()]
                    if rows:
                        return rows_to_local_df(spark, rows)
                elif len(hits.take(1)) > 0:
                    return hits
                ast2 = build_query(plan.processed_query, "standard", FIELD_CONTENT)
                hits = content.execute(ast2, k)
                state["fallback"] = True
            return hits

        hits, hit = self._run_cached(key, run, state)
        return SearchResult(
            hits, plan, "standard",
            fallback_used=state["fallback"], from_cache=hit,
        )

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
