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


# ------------------------------------------- facade over the STORE path

@pytest.fixture(scope="module")
def store_engine(spark, documents, tmp_path_factory):
    from coa_codesearch_mcp_spark.index.store import (
        IndexConfig,
        IndexReader,
        IndexWriter,
    )
    from coa_codesearch_mcp_spark.query.store_executor import StoreSearcher

    root = str(tmp_path_factory.mktemp("ix_facade_store"))
    cfg = IndexConfig(
        field="content", n_buckets=4, range_size=16, chunk_size=64,
        chunks_per_wave=4, salt_threshold=40, max_salts=4,
    )
    IndexWriter(spark, root, cfg).build(documents)
    return TextSearchEngine(
        {"content": StoreSearcher(IndexReader(spark, root))}, use_cache=False,
        cache=None,
    )


@pytest.mark.parametrize(
    "query,mode",
    [
        ("fast key", "auto"),       # BoolQ(must=[TermQ, TermQ]) -> AND
        ("spark", "auto"),          # TermQ (symbols field absent -> content)
        ("fast key", "exact"),      # literal build
        ("sparkk", "fuzzy"),
        ("fast.*key", "regex"),     # slop-20 phrase rewrite
        ("fast*", "auto"),          # wildcard
    ],
)
def test_store_facade_matches_logical_facade(engine3, store_engine, query, mode):
    """StoreSearcher.execute (round-4): the SAME planner AST through
    the WAND store path must rank-match the logical facade. The
    content-field logical engine is the arbiter; the store engine has
    no symbols/patterns fields so explicitly-routed queries land on
    content in both engines for these shapes."""
    from coa_codesearch_mcp_spark.query.engine import TextSearchEngine as TSE

    logical_content = TSE(
        {"content": engine3.searchers["content"]}, use_cache=False, cache=None
    )
    got = [(r["doc_id"], r["score"])
           for r in store_engine.search(query, mode=mode, k=8).hits.collect()]
    want = [(r["doc_id"], r["score"])
            for r in logical_content.search(query, mode=mode, k=8).hits.collect()]
    assert got == want, (query, mode)


def test_store_execute_accepts_mixed_should_group(engine3, store_engine):
    """The two execute() implementations must accept IDENTICAL ASTs:
    a should-group holding a non-TermQ child is answered (non-term
    children dropped, matching Searcher._clause_scores' behavior),
    never a TypeError (round-4 review finding)."""
    from coa_codesearch_mcp_spark.query.ast import BoolQ, PhraseQ, TermQ

    ast = BoolQ(must=[BoolQ(should=[TermQ("spark"), PhraseQ(["fast", "key"])])])
    got = [(r["doc_id"], r["score"])
           for r in store_engine.searchers["content"].execute(ast, 8).collect()]
    want = [(r["doc_id"], r["score"])
            for r in engine3.searchers["content"].execute(ast, 8).collect()]
    assert got == want and len(got) > 0
