"""Incremental layer: upsert/delete visibility, last-event-wins,
exact scoring vs a from-scratch rebuild, streaming ingestion."""

import datetime

import pytest
from pyspark.sql import functions as F

from coa_codesearch_mcp_spark.fixtures.webgen import generate_webpages_pdf
from coa_codesearch_mcp_spark.index.store import IndexConfig
from coa_codesearch_mcp_spark.streaming.incremental import (
    DeltaIndexManager,
    attach_stream,
)

CFG = IndexConfig(
    field="content_patterns",
    n_buckets=4,
    # doc ids are sparse 62-bit hashes: 1<<58 yields <=16 chunks/ranges
    range_size=1 << 58,
    chunk_size=1 << 58,
    chunks_per_wave=32,
    salt_threshold=10_000,
)

TS = datetime.datetime(2024, 4, 1)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "url string, op string, text string, warc_ts timestamp, event_ts timestamp"
    )


@pytest.fixture()
def mgr(spark, tmp_path):
    from coa_codesearch_mcp_spark.streaming.incremental import _url_doc_id

    pdf = generate_webpages_pdf(40, seed=42)
    docs = spark.createDataFrame(pdf[["url", "warc_ts", "text"]]).withColumn(
        "doc_id", _url_doc_id()
    )
    m = DeltaIndexManager(spark, str(tmp_path / "inc"), CFG)
    m.init_main(docs)
    return m


def hits(m, terms, k=10):
    return {r["doc_id"]: r["score"] for r in m.search_or(terms, k).collect()}


def test_upsert_new_doc_visible(spark, mgr):
    before = hits(mgr, ["zebraword"])
    assert before == {}
    mgr.apply_batch(
        _changes(
            spark,
            [("https://new.org/x.html", "upsert", "zebraword appears here", TS, TS)],
        )
    )
    after = hits(mgr, ["zebraword"])
    assert len(after) == 1


def test_update_replaces_old_version(spark, mgr):
    url = "https://example.org/en/00000000.html"
    old = hits(mgr, ["updatedmarker"])
    assert old == {}
    mgr.apply_batch(
        _changes(spark, [(url, "upsert", "updatedmarker only text", TS, TS)])
    )
    got = hits(mgr, ["updatedmarker"])
    assert len(got) == 1
    # the old copy of this url must be hidden: its original terms no
    # longer hit this doc_id
    doc_id = next(iter(got))
    original_first_word = generate_webpages_pdf(1, seed=42)["text"][0].split()[0]
    assert doc_id not in hits(mgr, [original_first_word.lower()], k=40)


def test_delete_hides_doc(spark, mgr):
    url = "https://example.org/en/00000000.html"
    word = generate_webpages_pdf(1, seed=42)["text"][0].split()[0].lower()
    from coa_codesearch_mcp_spark.streaming.incremental import _url_doc_id

    doc_id = [r["doc_id"] for r in
              spark.createDataFrame([(url,)], "url string")
              .select(_url_doc_id().alias("doc_id")).collect()][0]
    assert doc_id in hits(mgr, [word], k=40)
    mgr.apply_batch(_changes(spark, [(url, "delete", None, None, TS)]))
    assert doc_id not in hits(mgr, [word], k=40)


def test_last_event_wins_in_batch(spark, mgr):
    url = "https://new.org/y.html"
    t0, t1 = TS, TS + datetime.timedelta(seconds=1)
    # create then delete inside one batch -> net effect: absent
    mgr.apply_batch(
        _changes(
            spark,
            [
                (url, "upsert", "flashword content", None, t0),
                (url, "delete", None, None, t1),
            ],
        )
    )
    assert hits(mgr, ["flashword"]) == {}


def test_incremental_matches_full_rebuild(spark, mgr, tmp_path):
    """North-star check: after a mix of changes, scores equal a
    from-scratch index over the equivalent live corpus."""
    url0 = "https://example.org/en/00000000.html"
    changes = [
        (url0, "upsert", "replacement text for doc zero", TS, TS),
        ("https://example.org/es/00000001.html", "delete", None, None, TS),
        ("https://new.org/a.html", "upsert", "fresh spark window content", TS, TS),
    ]
    mgr.apply_batch(_changes(spark, changes))

    # equivalent live corpus
    pdf = generate_webpages_pdf(40, seed=42)
    pdf = pdf[~pdf["url"].isin([url0, "https://example.org/es/00000001.html"])]
    live = spark.createDataFrame(pdf[["url", "warc_ts", "text"]])
    extra = spark.createDataFrame(
        [
            (url0, TS, "replacement text for doc zero"),
            ("https://new.org/a.html", TS, "fresh spark window content"),
        ],
        "url string, warc_ts timestamp, text string",
    )
    from coa_codesearch_mcp_spark.streaming.incremental import _url_doc_id

    live = live.unionByName(extra).withColumn("doc_id", _url_doc_id())

    fresh = DeltaIndexManager(spark, str(tmp_path / "fresh"), CFG)
    fresh.init_main(live)

    for terms in [["spark"], ["window", "content"], ["replacement"]]:
        assert hits(mgr, terms) == hits(fresh, terms), terms

    # compaction preserves results
    mgr.rebuild(live)
    for terms in [["spark"], ["replacement"]]:
        assert hits(mgr, terms) == hits(fresh, terms), terms


def test_streaming_ingestion(spark, mgr, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    _changes(
        spark,
        [("https://stream.org/1.html", "upsert", "streamedword alpha", TS, TS)],
    ).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(
        "url string, op string, text string, warc_ts timestamp, event_ts timestamp"
    ).parquet(str(src))
    q = attach_stream(mgr, stream, str(tmp_path / "ckpt")).start()
    q.awaitTermination(120)
    assert len(hits(mgr, ["streamedword"])) == 1
