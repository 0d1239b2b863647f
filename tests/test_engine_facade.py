"""End-to-end TextSearchEngine facade over multi-field logical indexes."""

import pytest

from coa_codesearch_mcp_spark.index.build import build_logical_index
from coa_codesearch_mcp_spark.query.engine import TextSearchEngine
from coa_codesearch_mcp_spark.query.executor import Searcher


@pytest.fixture(scope="module")
def engine3(documents):
    searchers = {
        f: Searcher(build_logical_index(documents, field=f).cache())
        for f in ("content", "content_patterns", "content_symbols")
    }
    return TextSearchEngine(searchers)


def test_auto_standard_query(engine3):
    res = engine3.search("fast key", k=5)
    assert res.plan.target_field == "content"
    rows = res.hits.collect()
    assert len(rows) == 5
    assert rows[0]["score"] >= rows[-1]["score"]


def test_auto_symbol_query_with_fallback(engine3):
    # corpus words hit the symbols field directly (single word routes
    # as symbol); check either direct hits or content fallback fires
    res = engine3.search("spark", k=5)
    assert res.plan.target_field == "content_symbols"
    assert len(res.hits.collect()) > 0


def test_symbol_zero_hits_falls_back_to_content(engine3):
    res = engine3.search("zzznotindex", k=5)
    assert res.plan.target_field == "content_symbols"
    assert res.fallback_used
    assert res.hits.collect() == []


def test_pattern_mode_query(engine3):
    res = engine3.search("fast && key", k=5)
    assert res.plan.target_field == "content_patterns"
    # '&&' tokenizes to a pattern term; AND semantics across chunks
    assert res.hits.count() >= 0


def test_exact_mode(engine3):
    res = engine3.search("fast key", mode="exact", k=5)
    assert res.search_type == "literal"
    assert len(res.hits.collect()) == 5


def test_fuzzy_mode(engine3):
    res = engine3.search("sparkk", mode="fuzzy", k=5)
    assert res.search_type == "fuzzy"
    assert len(res.hits.collect()) > 0


def test_regex_mode_with_rewrite(engine3):
    res = engine3.search("fast.*key", mode="regex", k=5)
    assert res.search_type == "regex"
    # slop-20 phrase rewrite produces hits on the corpus
    assert len(res.hits.collect()) > 0


def test_too_short_query_rejected(engine3):
    res = engine3.search("ab", k=5)
    assert res.error is not None
    assert res.hits.collect() == []
