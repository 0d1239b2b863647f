import pytest
from pyspark.sql import functions as F

from coa_codesearch_mcp_spark.functions.snippets import (
    add_snippets,
    semantic_supplement,
)


def test_add_snippets_highlights_first_match(spark):
    df = spark.createDataFrame(
        [
            (1, "no match\nthe Spark engine\nspark again"),
            (2, "nothing here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in add_snippets(df, ["spark"]).collect()}
    assert out[1]["line_number"] == 2
    assert out[1]["snippet"] == "the «Spark» engine"
    assert out[2]["line_number"] == -1
    assert out[2]["snippet"] is None


def test_add_snippets_context_lines(spark):
    df = spark.createDataFrame(
        [(1, "a\nb\ntarget word\nd\ne")], "doc_id long, text string"
    )
    r = add_snippets(df, ["target"], context_lines=1).collect()[0]
    assert r["snippet"] == "b\n«target» word\nd"


def test_semantic_supplement_fills_under_min(spark):
    lex = spark.createDataFrame([(1, 2.0)], "doc_id long, score double")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "doc_id long, embedding array<float>",
    )
    out = semantic_supplement(lex, emb, [1.0, 0.0], min_hits=5, k=3)
    rows = {r["doc_id"]: r["tier"] for r in out.collect()}
    assert rows[1] == "lexical"       # existing hit kept, not duplicated
    assert rows[2] == "semantic"      # supplement
    assert 1 in rows and len(rows) <= 3


def test_semantic_supplement_skips_when_enough(spark):
    lex = spark.createDataFrame(
        [(i, 1.0) for i in range(6)], "doc_id long, score double"
    )
    emb = spark.createDataFrame(
        [(9, [1.0, 0.0])], "doc_id long, embedding array<float>"
    )
    out = semantic_supplement(lex, emb, [1.0, 0.0], min_hits=5)
    assert {r["tier"] for r in out.collect()} == {"lexical"}
