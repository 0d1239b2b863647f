"""Query execution over a LogicalIndex — the relational core.

Operator map (SURVEY.md §2.3):
  Q1 TermQuery            -> postings filter + BM25 expression
  Q2 AND (MUST)           -> posting intersection (groupBy having n==n_terms)
  Q3 OR (SHOULD)          -> union of postings, scores sum per doc
  Q4 NOT (MUST_NOT)       -> left anti-join
  Q5 PhraseQuery          -> position-array intersection (built-ins for
                             slop=0; bounded-span check for slop>0)
  Q6 WildcardQuery        -> dictionary scan (glob->regex) -> OR expansion
  Q7 FuzzyQuery           -> dictionary scan (levenshtein<=2, length-pruned)
  Q8 RegexpQuery          -> dictionary scan (rlike) -> OR expansion
  Q9 MatchAllDocs         -> docs scan
  Q11/O1 top-k            -> orderBy(score desc, doc_id).limit(k); Spark
                             plans TakeOrderedAndProject = per-partition
                             heap + driver merge (scatter-gather)

Pinned spec decisions (documented divergences from Lucene 4.8):
- multi-term expansions (wildcard/fuzzy/regex) are scored as an OR of
  BM25 term queries (Lucene default is constant-score rewrite);
  expansion is capped at 1024 terms (Lucene maxClauseCount), smallest
  terms first (lexicographic) for determinism;
- fuzzy matching is classic Levenshtein (no transpositions), max 2
  edits, candidates pruned by |len(term)-len(q)| <= edits;
- sloppy phrase = ordered match with span <= (n-1) + slop;
- duplicate query terms are deduplicated.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import glob_to_regex
from ..index.build import LogicalIndex
from .bm25 import bm25_contrib

MAX_CLAUSE_COUNT = 1024


class Searcher:
    """BM25 top-k search over a LogicalIndex.

    Column contract of every search method: ``(doc_id: long,
    score: double)`` sorted by (score desc, doc_id asc), limited to k.
    """

    def __init__(self, index: LogicalIndex):
        self.ix = index

    # ---------------- candidate generation ----------------

    def _postings_for(self, terms: list[str]) -> DataFrame:
        """Postings rows for the given terms with df attached.

        The dictionary subset is tiny (<= MAX_CLAUSE_COUNT rows) and
        broadcast; the postings filter prunes on term before any join.
        """
        terms = sorted(set(terms))
        p = self.ix.postings.filter(F.col("term").isin(terms))
        d = self.ix.dictionary.filter(F.col("term").isin(terms))
        return p.join(F.broadcast(d), "term")

    def _scored(self, terms: list[str]) -> DataFrame:
        """(doc_id, term, contrib) — per-(term,doc) BM25 contribution."""
        p = self._postings_for(terms)
        return p.select(
            "doc_id",
            "term",
            bm25_contrib(
                F.col("tf"), F.col("df"), F.col("dl"), self.ix.n_docs, self.ix.avgdl
            ).alias("contrib"),
        )

    # ---------------- boolean / term queries ----------------

    def search_or(
        self, terms: list[str], k: int = 10, exclude: list[str] | None = None
    ) -> DataFrame:
        terms = sorted(set(terms))
        scored = self._scored(terms)
        # deterministic per-doc sum: aggregate in ascending term order
        agg = (
            scored.groupBy("doc_id")
            .agg(
                F.sum("contrib").alias("score"),
                F.count(F.lit(1)).alias("n_matched"),
            )
        )
        agg = self._apply_exclude(agg, exclude)
        return self._topk(agg.select("doc_id", "score"), k)

    def search_and(
        self, terms: list[str], k: int = 10, exclude: list[str] | None = None
    ) -> DataFrame:
        terms = sorted(set(terms))
        scored = self._scored(terms)
        agg = (
            scored.groupBy("doc_id")
            .agg(
                F.sum("contrib").alias("score"),
                F.count(F.lit(1)).alias("n_matched"),
            )
            .filter(F.col("n_matched") == len(terms))
        )
        agg = self._apply_exclude(agg, exclude)
        return self._topk(agg.select("doc_id", "score"), k)

    def search_term(self, term: str, k: int = 10) -> DataFrame:
        return self.search_or([term], k)

    def _apply_exclude(self, scored: DataFrame, exclude: list[str] | None) -> DataFrame:
        if not exclude:
            return scored
        neg = self._postings_for(sorted(set(exclude))).select("doc_id").distinct()
        return scored.join(neg, "doc_id", "left_anti")

    # ---------------- phrase ----------------

    def search_phrase(self, terms: list[str], k: int = 10, slop: int = 0) -> DataFrame:
        """Ordered phrase match; phrase tf = number of match start
        positions (slop=0) / distinct ordered in-span matches (slop>0,
        counted per start position)."""
        if not terms:
            raise ValueError("empty phrase")
        if len(terms) == 1:
            return self.search_term(terms[0], k)

        # gather per-doc position arrays for each phrase slot. Straight
        # off postings — NOT _postings_for: the phrase scorer never
        # reads term df (the phrase is scored as one pseudo-term), so
        # the dictionary broadcast join was dead weight in every
        # phrase plan (round-6).
        p = self.ix.postings.filter(
            F.col("term").isin(sorted(set(terms)))
        ).select("term", "doc_id", "dl", "positions")
        per_slot = None
        for i, t in enumerate(terms):
            slot = p.filter(F.col("term") == t).select(
                "doc_id",
                "dl",
                F.col("positions").alias(f"pos{i}"),
            )
            per_slot = slot if per_slot is None else per_slot.join(
                slot.drop("dl"), "doc_id"
            )

        if slop == 0:
            # fold: S = pos0; S = intersect(S+1, pos_i) — all built-ins.
            # The shift lambdas MUST be single-parameter: F.transform
            # passes the ELEMENT INDEX to a second parameter, so the
            # idiomatic late-binding fix `lambda x, i=i: x - i` silently
            # subtracted the array index instead of the slot offset —
            # 2-term phrases survived (only size(match) is used) but
            # every 3+-term slop=0 phrase returned empty (caught by the
            # round-3 store==logical property sweep). F.transform calls
            # the lambda eagerly inside this iteration, so plain `i` is
            # already bound correctly.
            match = F.col("pos0")
            for i in range(1, len(terms)):
                match = F.array_intersect(
                    F.transform(match, lambda x: x + i), F.col(f"pos{i}")
                )
                # positions of slot i matched; normalize back to starts
                match = F.transform(match, lambda x: x - i)
            cand = per_slot.withColumn("phrase_tf", F.size(match)).filter(
                F.col("phrase_tf") > 0
            )
        else:
            from pyspark.sql.pandas.functions import pandas_udf

            n = len(terms)
            max_span = (n - 1) + slop

            @pandas_udf("int")
            def count_sloppy(slots: pd.Series) -> pd.Series:
                def count_row(poslists):
                    count = 0
                    for start in poslists[0]:
                        prev = start
                        ok = True
                        for lst in poslists[1:]:
                            nxt = next(
                                (q for q in lst if q > prev and q - start <= max_span),
                                None,
                            )
                            if nxt is None:
                                ok = False
                                break
                            prev = nxt
                        if ok:
                            count += 1
                    return count

                return pd.Series([count_row(row) for row in slots], dtype="int32")

            cand = per_slot.withColumn(
                "phrase_tf",
                count_sloppy(F.array(*[F.col(f"pos{i}") for i in range(n)])),
            ).filter(F.col("phrase_tf") > 0)

        # score the phrase as one pseudo-term: df = number of docs with
        # a match, tf = phrase_tf (pinned spec). df is a 1-row
        # broadcast of a global count aggregate — partial counts per
        # partition, one row moved. The previous global window
        # (partitionBy(lit(1))) funneled the ENTIRE candidate relation
        # through one task: fine at sf0.1, a straggler/OOM for a
        # common phrase at 100 TB (round-2 VERDICT #2). No driver
        # collect between candidate generation and scoring.
        cand = cand.select("doc_id", "dl", "phrase_tf")
        total = cand.agg(
            F.greatest(F.count(F.lit(1)), F.lit(1)).alias("phrase_df")
        )
        cand = cand.crossJoin(F.broadcast(total))
        scored = cand.select(
            "doc_id",
            bm25_contrib(
                F.col("phrase_tf"),
                F.col("phrase_df"),
                F.col("dl"),
                self.ix.n_docs,
                self.ix.avgdl,
            ).alias("score"),
        )
        return self._topk(scored, k)

    # ---------------- multi-term expansions ----------------

    def expand_terms(self, predicate) -> list[str]:
        """Dictionary scan -> expansion term list (capped, sorted)."""
        rows = (
            self.ix.dictionary.filter(predicate)
            .select("term")
            .orderBy("term")
            .limit(MAX_CLAUSE_COUNT)
            .collect()
        )
        return [r["term"] for r in rows]

    def search_wildcard(self, pattern: str, k: int = 10) -> DataFrame:
        regex = glob_to_regex(pattern)
        terms = self.expand_terms(F.col("term").rlike(regex))
        return self.search_or(terms, k) if terms else self._empty()

    def search_regexp(self, pattern: str, k: int = 10) -> DataFrame:
        anchored = f"^(?:{pattern})$"
        terms = self.expand_terms(F.col("term").rlike(anchored))
        return self.search_or(terms, k) if terms else self._empty()

    def search_fuzzy(self, term: str, k: int = 10, max_edits: int = 2) -> DataFrame:
        cand = self.ix.dictionary.filter(
            (F.length("term") >= len(term) - max_edits)
            & (F.length("term") <= len(term) + max_edits)
        ).filter(F.levenshtein(F.col("term"), F.lit(term)) <= max_edits)
        terms = [
            r["term"]
            for r in cand.select("term").orderBy("term").limit(MAX_CLAUSE_COUNT).collect()
        ]
        return self.search_or(terms, k) if terms else self._empty()

    def search_prefix(self, prefix: str, k: int = 10) -> DataFrame:
        terms = self.expand_terms(F.col("term").startswith(prefix))
        return self.search_or(terms, k) if terms else self._empty()

    # ---------------- AST evaluation ----------------

    def execute(self, q, k: int = 10) -> DataFrame:
        """Evaluate a planner AST (query/ast.py) to top-k."""
        from .ast import BoolQ, FuzzyQ, MatchAllQ, PhraseQ, RegexpQ, TermQ, WildcardQ

        if isinstance(q, TermQ):
            return self.search_term(q.term, k)
        if isinstance(q, PhraseQ):
            return self.search_phrase(q.terms, k, slop=q.slop)
        if isinstance(q, WildcardQ):
            return self.search_wildcard(q.pattern, k)
        if isinstance(q, FuzzyQ):
            return self.search_fuzzy(q.term, k, q.max_edits)
        if isinstance(q, RegexpQ):
            return self.search_regexp(q.pattern, k)
        if isinstance(q, MatchAllQ):
            return self._topk(
                self.ix.doclens.select("doc_id", F.lit(1.0).alias("score")), k
            )
        if isinstance(q, BoolQ):
            return self._execute_bool(q, k)
        raise TypeError(f"unknown query node {type(q)}")

    def _clause_scores(self, q) -> DataFrame:
        """Full (doc_id, contrib) relation for one flat clause."""
        from .ast import BoolQ, FuzzyQ, PhraseQ, RegexpQ, TermQ, WildcardQ
        from ..functions.text import glob_to_regex

        if isinstance(q, TermQ):
            return self._scored([q.term]).select("doc_id", "contrib")
        if isinstance(q, BoolQ) and q.should and not q.must and not q.must_not:
            terms = [c.term for c in q.should if isinstance(c, TermQ)]
            return (
                self._scored(terms)
                .groupBy("doc_id")
                .agg(F.sum("contrib").alias("contrib"))
            )
        if isinstance(q, WildcardQ):
            terms = self.expand_terms(
                F.col("term").rlike(glob_to_regex(q.pattern))
            )
            return (
                self._scored(terms)
                .groupBy("doc_id")
                .agg(F.sum("contrib").alias("contrib"))
            )
        if isinstance(q, FuzzyQ):
            cand = self.ix.dictionary.filter(
                (F.length("term") >= len(q.term) - q.max_edits)
                & (F.length("term") <= len(q.term) + q.max_edits)
                & (F.levenshtein(F.col("term"), F.lit(q.term)) <= q.max_edits)
            )
            terms = [
                r["term"]
                for r in cand.select("term").orderBy("term")
                .limit(MAX_CLAUSE_COUNT).collect()
            ]
            return (
                self._scored(terms)
                .groupBy("doc_id")
                .agg(F.sum("contrib").alias("contrib"))
            )
        if isinstance(q, RegexpQ):
            terms = self.expand_terms(F.col("term").rlike(f"^(?:{q.pattern})$"))
            return (
                self._scored(terms)
                .groupBy("doc_id")
                .agg(F.sum("contrib").alias("contrib"))
            )
        if isinstance(q, PhraseQ):
            return self.search_phrase(q.terms, k=2_000_000_000, slop=q.slop).select(
                "doc_id", F.col("score").alias("contrib")
            )
        raise TypeError(f"unsupported clause {type(q)}")

    def _execute_bool(self, q, k: int) -> DataFrame:
        """Flat boolean: doc matches all MUST, no MUST_NOT; score sums
        matching MUST + SHOULD contributions (Lucene semantics).
        Composition is SHARED with StoreSearcher (query/boolops.py)."""
        from .boolops import compose_bool

        out = compose_bool(q, self._clause_scores)
        if out is None:
            return self._empty()
        return self._topk(out, k)

    # ---------------- helpers ----------------

    def _topk(self, scored: DataFrame, k: int) -> DataFrame:
        # rounded score pins cross-engine float stability; doc_id
        # tiebreak pins ordering. Spark plans this as
        # TakeOrderedAndProject (per-partition heap + driver merge).
        out = scored.select(
            "doc_id", F.round(F.col("score"), 4).alias("score")
        )
        return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _empty(self) -> DataFrame:
        spark = SparkSession.getActiveSession()
        return spark.createDataFrame([], "doc_id long, score double")
