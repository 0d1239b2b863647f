"""Dense deterministic doc-id assignment (index/ids.py) and the
build's sparse-id guard.

Found via a real `spark-submit --py-files` run: the submit tool
originally assigned ``doc_id = xxhash64(url)``; a 20k-doc build then
planned ~20k chunk units (one per doc) and ran thousands of
driver-sequential jobs. Ids are an input contract: dense-ish, so that
``chunk_id = doc_id DIV chunk_size`` and ``range_id = doc_id DIV
range_size`` stay meaningful.
"""

import pytest
from pyspark.sql import functions as F

from coa_codesearch_mcp_spark.fixtures.webgen import generate_webpages
from coa_codesearch_mcp_spark.index.ids import assign_dense_doc_ids
from coa_codesearch_mcp_spark.index.store import IndexConfig, IndexWriter

N = 2_000


@pytest.fixture(scope="module")
def pages(spark):
    return generate_webpages(spark, N, partitions=8).cache()


def test_ids_are_dense_and_unique(spark, pages):
    got = assign_dense_doc_ids(pages, "url", partitions=32)
    ids = sorted(r["id"] for r in got.select(F.col("doc_id").alias("id")).collect())
    assert ids == list(range(N))


def test_ids_deterministic_across_partitionings(spark, pages):
    """Same input set => same url->id mapping, independent of how the
    input happens to be partitioned (the property resume needs)."""
    a = {
        r["url"]: r["doc_id"]
        for r in assign_dense_doc_ids(pages, "url", 32).collect()
    }
    shuffled = pages.repartition(13, "lang")
    b = {
        r["url"]: r["doc_id"]
        for r in assign_dense_doc_ids(shuffled, "url", 32).collect()
    }
    assert a == b


def test_ids_depend_on_partition_count(spark, pages):
    """partitions is part of the mapping — changing it mid-resume would
    remap urls, which is why the submit tool pins it."""
    a = {
        r["url"]: r["doc_id"]
        for r in assign_dense_doc_ids(pages.limit(200), "url", 8).collect()
    }
    b = {
        r["url"]: r["doc_id"]
        for r in assign_dense_doc_ids(pages.limit(200), "url", 16).collect()
    }
    assert set(a.values()) == set(b.values()) == set(range(200))
    assert a != b  # 8-bucket and 16-bucket prefix sums interleave differently


def test_build_refuses_hash_sparse_ids(spark, pages, tmp_path):
    sparse = pages.limit(300).withColumn(
        "doc_id", F.xxhash64("url").bitwiseAND(F.lit((1 << 62) - 1))
    )
    cfg = IndexConfig(
        field="content", n_buckets=4, range_size=1 << 14, chunk_size=1 << 14
    )
    with pytest.raises(ValueError, match="pathologically sparse"):
        IndexWriter(spark, str(tmp_path / "ix_sparse"), cfg).build(sparse)


def test_build_accepts_dense_assigned_ids(spark, pages, tmp_path):
    docs = assign_dense_doc_ids(pages.limit(300), "url", 16)
    cfg = IndexConfig(
        field="content", n_buckets=4, range_size=1 << 14, chunk_size=1 << 14
    )
    manifest = IndexWriter(spark, str(tmp_path / "ix_dense"), cfg).build(docs)
    assert manifest.get_stats("corpus")["n_docs"] == 300
