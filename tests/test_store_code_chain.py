"""Full-fidelity path: code-aware analyzer chain + positions through
the MATERIALIZED store over the synthetic webpage corpus, rank-
identical to both the logical engine and the single-node oracle."""

import pytest
from pyspark.sql import functions as F

from coa_codesearch_mcp_spark.fixtures.webgen import generate_webpages_pdf
from coa_codesearch_mcp_spark.index.build import build_logical_index
from coa_codesearch_mcp_spark.index.store import IndexConfig, IndexReader, IndexWriter
from coa_codesearch_mcp_spark.oracle import pandas_oracle as po
from coa_codesearch_mcp_spark.query.executor import Searcher
from coa_codesearch_mcp_spark.query.store_executor import StoreSearcher

N_DOCS = 150


@pytest.fixture(scope="module")
def webdocs(spark):
    pdf = generate_webpages_pdf(N_DOCS, seed=42)
    pdf = pdf[["text"]].assign(doc_id=range(N_DOCS))
    return spark.createDataFrame(pdf[["doc_id", "text"]]).cache()


@pytest.fixture(scope="module")
def store(spark, webdocs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("code_ix"))
    cfg = IndexConfig(
        field="content", n_buckets=4, range_size=32, chunk_size=64,
        chunks_per_wave=2, salt_threshold=60, max_salts=4,
    )
    IndexWriter(spark, root, cfg).build(webdocs)
    return StoreSearcher(IndexReader(spark, root))


@pytest.fixture(scope="module")
def logical(webdocs):
    return Searcher(build_logical_index(webdocs, field="content").cache())


@pytest.fixture(scope="module")
def oracle():
    pdf = generate_webpages_pdf(N_DOCS, seed=42)
    return po.build_oracle_index(
        list(enumerate(pdf["text"])), analyzer="content"
    )


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_code_chain_term_queries(store, logical, oracle):
    # camel-split synonym terms ('user', 'service') and operator
    # tokens ('=>') only exist via the code chain
    for term in ["userservice", "use", "=>", "[fact]", "@property"]:
        got = rows(store.search_term(term, k=10))
        want_logical = rows(logical.search_term(term, k=10))
        want_oracle = po.search_or(oracle, [term], k=10)
        assert got == want_logical == want_oracle, term
        assert len(got) > 0, f"term {term!r} should hit the corpus"


def test_code_chain_and_or(store, logical, oracle):
    terms = ["xml", "parser"]
    assert (
        rows(store.search_and(terms, k=10))
        == rows(logical.search_and(terms, k=10))
        == po.search_and(oracle, terms, k=10)
    )
    assert (
        rows(store.search_or(terms, k=10))
        == rows(logical.search_or(terms, k=10))
        == po.search_or(oracle, terms, k=10)
    )


def test_code_chain_phrase_with_overlap_positions(store, logical, oracle):
    # positions survive the posting blocks incl. synonym overlap
    terms = ["the", "quick"] if oracle.postings.get("quick") else ["fast", "key"]
    got = rows(store.search_phrase(terms, k=10))
    assert got == rows(logical.search_phrase(terms, k=10))
    assert got == po.search_phrase(oracle, terms, k=10)


def test_code_chain_salting_fired(store, spark):
    d = store.reader.dictionary()
    assert d.filter("n_salts > 1").count() > 0
