"""Logical inverted index as DataFrames — the dataflow core.

Build pipeline (reference analog: FileIndexingService Phase 3 +
Lucene IndexWriter, Services/FileIndexingService.cs:236-339):

    docs --tokenize(field chain)--> (doc, term, pos)
         --groupBy(term, doc)-->    postings(term, doc_id, tf, positions)
         --groupBy(doc)-->          doclens(doc_id, dl)
         --groupBy(term)-->         dictionary(term, df)
         --agg-->                   stats(n_docs, avgdl)

Everything is built-in DataFrame ops: the groupBys are planned by
Catalyst as partial (map-side) + final hash aggregations, so the only
full shuffle is keyed on (term, doc_id) — the same "repartition by
term" shuffle the materialized layout salts explicitly for hot terms.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.chains import FIELD_PATTERNS
from ..analysis.udfs import tokens_col


def tokenize_docs(
    docs: DataFrame,
    field: str = FIELD_PATTERNS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, pos) — one row per emitted token."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(field, text_col)).alias("tok"),
        )
        .select("doc_id", F.col("tok.term").alias("term"), F.col("tok.pos").alias("pos"))
    )


@dataclass
class LogicalIndex:
    """The four relations every query path consumes."""

    postings: DataFrame  # term, doc_id, tf (long), positions array<int>
    doclens: DataFrame   # doc_id, dl (long)
    dictionary: DataFrame  # term, df (long)
    n_docs: int
    avgdl: float
    field: str

    def cache(self) -> "LogicalIndex":
        self.postings.cache()
        self.doclens.cache()
        self.dictionary.cache()
        return self


def build_logical_index(
    docs: DataFrame,
    field: str = FIELD_PATTERNS,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_positions: bool = True,
) -> LogicalIndex:
    toks = tokenize_docs(docs, field, id_col, text_col)

    agg = [F.count(F.lit(1)).alias("tf")]
    if with_positions:
        agg.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    postings = toks.groupBy("term", "doc_id").agg(*agg)

    # dl counts every emitted token (Lucene field length norm input);
    # docs with zero tokens still count toward N and avgdl.
    doclens = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")), "doc_id", "left")
        .fillna(0, subset=["dl"])
    )

    # denormalize dl into the postings (one build-time join keyed on
    # doc_id, so the query path never joins doclens — at 100 TB the
    # doclens join would shuffle per query otherwise)
    postings = postings.join(doclens, "doc_id")

    dictionary = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    stats = doclens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]

    return LogicalIndex(
        postings=postings,
        doclens=doclens,
        dictionary=dictionary,
        n_docs=int(stats["n"]),
        avgdl=float(stats["avgdl"] or 0.0),
        field=field,
    )
