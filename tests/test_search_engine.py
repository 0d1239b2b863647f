"""Rank-identity of the Spark engine vs the single-node pandas oracle
on the sf0.001 documents corpus (golden-master philosophy, SURVEY §5)."""

import pytest

from coa_codesearch_mcp_spark.index.build import build_logical_index
from coa_codesearch_mcp_spark.oracle import pandas_oracle as po
from coa_codesearch_mcp_spark.query.executor import Searcher


@pytest.fixture(scope="module")
def engine(documents):
    ix = build_logical_index(documents, field="content_patterns").cache()
    return Searcher(ix)


@pytest.fixture(scope="module")
def oracle(documents_rows):
    return po.build_oracle_index(documents_rows, analyzer="content_patterns")


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_corpus_stats_match(engine, oracle):
    assert engine.ix.n_docs == oracle.n_docs
    assert abs(engine.ix.avgdl - oracle.avgdl) < 1e-9


def test_term_query_rank_identical(engine, oracle):
    for term in ["spark", "hash", "merge", "window"]:
        got = rows(engine.search_term(term, k=10))
        want = po.search_or(oracle, [term], k=10)
        assert got == want, term


def test_or_query_rank_identical(engine, oracle):
    got = rows(engine.search_or(["spark", "stream"], k=10))
    want = po.search_or(oracle, ["spark", "stream"], k=10)
    assert got == want


def test_and_query_rank_identical(engine, oracle):
    got = rows(engine.search_and(["spark", "stream"], k=10))
    want = po.search_and(oracle, ["spark", "stream"], k=10)
    assert got == want


def test_not_query_rank_identical(engine, oracle):
    got = rows(engine.search_or(["spark"], k=10, exclude=["stream"]))
    want = po.search_not(oracle, ["spark"], ["stream"], k=10)
    assert got == want


def test_phrase_query_rank_identical(engine, oracle, documents_rows):
    # pick a real bigram from the corpus so the test is non-vacuous
    first_text = documents_rows[0][1].split()
    bigram = [first_text[0].lower(), first_text[1].lower()]
    got = rows(engine.search_phrase(bigram, k=10))
    want = po.search_phrase(oracle, bigram, k=10)
    assert len(want) > 0
    assert got == want


def test_sloppy_phrase_rank_identical(engine, oracle, documents_rows):
    first_text = documents_rows[0][1].split()
    bigram = [first_text[0].lower(), first_text[2].lower()]
    got = rows(engine.search_phrase(bigram, k=10, slop=2))
    want = po.search_phrase(oracle, bigram, k=10, slop=2)
    assert got == want


def test_wildcard_fuzzy_prefix_nonempty(engine):
    assert len(rows(engine.search_wildcard("sp*", k=5))) > 0
    assert len(rows(engine.search_fuzzy("sparkk", k=5))) > 0
    assert len(rows(engine.search_prefix("wi", k=5))) > 0
    assert len(rows(engine.search_regexp("s.a.*", k=5))) > 0
