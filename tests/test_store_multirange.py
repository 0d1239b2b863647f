"""Regression: store-path boolean queries across MULTIPLE doc ranges.

Round-1 judge reproduction (VERDICT.md "What's wrong" #1): a doc range
containing `alpha` blocks but no `beta` blocks answered
AND(alpha, beta) with its alpha-only docs, because per_range built
term_blocks only from terms present in the range and wand_topk's AND
check compared against len(term_blocks) — a tautology. The fix closes
over the full query-term count (n_required).

Corpus here forces the failure shape: 1,024 docs over range_size=128
(8 ranges); only docs 0-2 contain both terms. Every boolean variant is
cross-checked against the logical engine (oracle-verified in round 1).
"""

import pytest
from pyspark.sql import functions as F

from coa_codesearch_mcp_spark.index.build import build_logical_index
from coa_codesearch_mcp_spark.index.store import IndexConfig, IndexReader, IndexWriter
from coa_codesearch_mcp_spark.query.executor import Searcher
from coa_codesearch_mcp_spark.query.store_executor import StoreSearcher

N_DOCS = 1024

CFG = IndexConfig(
    field="content_patterns",
    n_buckets=4,
    range_size=128,      # 8 doc ranges — AND/NOT must hold across them
    chunk_size=256,
    chunks_per_wave=2,
    salt_threshold=200,
    max_salts=4,
)


def _mk_docs(spark):
    """alpha in every doc; beta only in docs 0-2; gamma in docs 0-2 and
    600-649 (a later range, to exercise exclude across ranges)."""
    rows = []
    for i in range(N_DOCS):
        words = ["alpha", f"filler{i % 97}", "common", "words", "here"]
        if i < 3:
            words += ["beta", "gamma"]
        if 600 <= i < 650:
            words += ["gamma"]
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _mk_docs(spark).cache()


@pytest.fixture(scope="module")
def store(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ix_multirange"))
    IndexWriter(spark, root, CFG).build(corpus)
    return StoreSearcher(IndexReader(spark, root))


@pytest.fixture(scope="module")
def logical(corpus):
    return Searcher(build_logical_index(corpus, field="content_patterns").cache())


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_multiple_ranges_exist(store):
    n_ranges = (
        store.reader.postings_blocks(["alpha"])[0]
        .select("range_id")
        .distinct()
        .count()
    )
    assert n_ranges >= 4, f"test must force >=4 ranges, got {n_ranges}"


def test_and_across_ranges_judge_repro(store):
    """The exact judge scenario: AND(alpha, beta) where beta lives only
    in the first range must return ONLY docs 0-2 — no alpha-only docs
    from beta-free ranges."""
    got = rows(store.search_and(["alpha", "beta"], k=10))
    assert sorted(d for d, _ in got) == [0, 1, 2], got


def test_and_matches_logical(store, logical):
    got = rows(store.search_and(["alpha", "beta"], k=10))
    want = rows(logical.search_and(["alpha", "beta"], k=10))
    assert got == want


def test_and_three_terms_matches_logical(store, logical):
    got = rows(store.search_and(["alpha", "beta", "gamma"], k=10))
    want = rows(logical.search_and(["alpha", "beta", "gamma"], k=10))
    assert got == want
    assert sorted(d for d, _ in got) == [0, 1, 2]


def test_and_absent_term_returns_empty(store):
    assert rows(store.search_and(["alpha", "zzz_not_a_term"], k=10)) == []


def test_not_across_ranges(store, logical):
    """Exclude path twin: OR(alpha) NOT gamma must drop docs 0-2 AND
    600-649 even though gamma's postings live in different ranges."""
    got = rows(store.search_or(["alpha"], k=20, exclude=["gamma"]))
    want = rows(logical.search_or(["alpha"], k=20, exclude=["gamma"]))
    assert got == want
    banned = {0, 1, 2} | set(range(600, 650))
    assert all(d not in banned for d, _ in got)


def test_or_across_ranges_matches_logical(store, logical):
    got = rows(store.search_or(["alpha", "gamma"], k=15))
    want = rows(logical.search_or(["alpha", "gamma"], k=15))
    assert got == want
