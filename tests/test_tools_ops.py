"""Tool-shaped operators: file/line/recent search, BFS, validation."""

import datetime

import pytest
from pyspark.sql import functions as F

from coa_codesearch_mcp_spark.functions.tools_ops import (
    call_path_bfs,
    extract_symbols,
    file_match_score,
    file_search,
    line_search,
    path_components,
    recent_files,
    workspace_hash,
)


@pytest.fixture(scope="module")
def web(spark):
    from coa_codesearch_mcp_spark.fixtures.webgen import generate_webpages

    return generate_webpages(spark, 60, partitions=4).cache()


def test_file_search_glob_and_ladder(web):
    rows = file_search(web, "000000*.html", k=10).collect()
    assert len(rows) == 10
    assert all(r["filename"].startswith("000000") for r in rows)
    assert rows[0]["match_score"] >= rows[-1]["match_score"]


def test_file_match_score_ladder(spark):
    df = spark.createDataFrame(
        [("exact.html",), ("exactx.html",), ("yexact.html",), ("nomatch.txt",)],
        "fn string",
    )
    scores = {
        r["fn"]: r["s"]
        for r in df.select(
            "fn", file_match_score(F.col("fn"), "exact*").alias("s")
        ).collect()
    }
    assert scores["exact.html"] == 0.95   # exact stem match
    assert scores["exactx.html"] == 0.85  # starts-with
    assert scores["yexact.html"] == 0.65  # contains
    assert scores["nomatch.txt"] == 0.3


def test_line_search_caps_and_counts(spark):
    text = "\n".join(
        ["needle one", "hay", "needle two", "needle three", "hay"]
    )
    df = spark.createDataFrame([("u1", text), ("u2", "no match here")],
                               "url string, text string")
    out = line_search(df, "needle", max_per_file=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_matches"] == 3
    assert len(r["lines"]) == 2  # capped
    assert r["lines"][0]["line_no"] == 0


def test_recent_files_timeframe(web):
    rows = recent_files(web, "30d", k=100).collect()
    assert 0 < len(rows) <= 100
    max_ts = max(r["warc_ts"] for r in rows)
    min_ts = min(r["warc_ts"] for r in rows)
    assert (max_ts - min_ts) <= datetime.timedelta(days=30)


def test_call_path_bfs_down_and_up(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5), (9, 1)], "src long, dst long"
    )
    down = {r["node"]: r["depth"] for r in call_path_bfs(edges, [1], 2).collect()}
    assert down == {1: 0, 2: 1, 3: 2, 5: 2}
    up = {r["node"]: r["depth"] for r in call_path_bfs(edges, [4], 3, "up").collect()}
    assert up == {4: 0, 3: 1, 2: 2, 1: 3}


def test_bfs_cycle_terminates(spark):
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = call_path_bfs(edges, [1], 5).collect()
    assert {r["node"] for r in out} == {1, 2}


def test_extract_symbols(spark):
    df = spark.createDataFrame(
        [("class Foo and def bar and struct Baz plus class Foo",)], "text string"
    )
    syms = extract_symbols(df).collect()[0]["symbols"]
    assert sorted(syms) == ["Bar", "Baz", "Foo"] or sorted(syms) == ["Baz", "Foo", "bar"]


def test_path_components_and_hash(web):
    comps = path_components(web.limit(4))
    rows = comps.collect()
    assert all(r["component"] for r in rows)
    h = web.limit(2).select(workspace_hash().alias("h")).collect()
    assert all(len(r["h"]) == 16 for r in h)


def test_validate_index(spark, tmp_path, web):
    from coa_codesearch_mcp_spark.index.store import (
        IndexConfig,
        IndexReader,
        IndexWriter,
    )
    from coa_codesearch_mcp_spark.functions.tools_ops import validate_index

    docs = web.withColumn("doc_id", F.xxhash64("url").bitwiseAND(F.lit((1 << 62) - 1)))
    root = str(tmp_path / "vix")
    cfg = IndexConfig(field="content_patterns", n_buckets=4,
                      range_size=1 << 58, chunk_size=1 << 58, chunks_per_wave=32)
    IndexWriter(spark, root, cfg).build(docs)
    report = validate_index(IndexReader(spark, root))
    assert report["ok"], report


def test_clear_index_standalone(spark, documents, tmp_path):
    """S11: drops every table + manifest; reader then refuses."""
    import pytest as _pytest

    from coa_codesearch_mcp_spark.functions.tools_ops import clear_index
    from coa_codesearch_mcp_spark.index.store import (
        IndexConfig, IndexReader, IndexWriter,
    )

    root = str(tmp_path / "ix_clear")
    cfg = IndexConfig(field="content_patterns", n_buckets=4, range_size=256,
                      chunk_size=256, salt_threshold=10_000)
    IndexWriter(spark, root, cfg).build(documents.limit(50))
    assert IndexReader(spark, root).n_docs == 50
    clear_index(root)
    import os
    assert not os.path.exists(os.path.join(root, "postings"))
    with _pytest.raises(ValueError):
        IndexReader(spark, root)


def test_repair_index_fixes_lost_bucket(spark, documents, tmp_path):
    """S10 Fix path: delete one postings bucket partition -> validate
    fails -> repair re-encodes ONLY that bucket (tokens untouched) ->
    validate passes and search works."""
    import glob
    import os
    import shutil

    from coa_codesearch_mcp_spark.functions.tools_ops import repair_index, validate_index
    from coa_codesearch_mcp_spark.index.store import (
        IndexConfig, IndexReader, IndexWriter,
    )
    from coa_codesearch_mcp_spark.query.store_executor import StoreSearcher

    root = str(tmp_path / "ix_repair")
    cfg = IndexConfig(field="content_patterns", n_buckets=4, range_size=256,
                      chunk_size=256, salt_threshold=10_000)
    IndexWriter(spark, root, cfg).build(documents.limit(100))
    tokens_before = sorted(glob.glob(f"{root}/tokens/**/*.parquet", recursive=True))

    victims = sorted(glob.glob(os.path.join(root, "postings", "bucket=*")))
    shutil.rmtree(victims[0])
    assert not validate_index(IndexReader(spark, root))["ok"]

    out = repair_index(spark, root)
    assert out["repaired"] is True
    assert out["report"]["ok"] is True
    assert int(victims[0].rsplit("=", 1)[1]) in out["buckets"]
    # no re-tokenization
    assert tokens_before == sorted(
        glob.glob(f"{root}/tokens/**/*.parquet", recursive=True)
    )
    hits = StoreSearcher(IndexReader(spark, root)).search_term("spark", k=5)
    assert len(hits.collect()) > 0


def test_index_stats_summary(spark, documents, tmp_path):
    """A3/A6: corpus totals + per-wave batch metrics from manifest."""
    from coa_codesearch_mcp_spark.functions.tools_ops import index_stats
    from coa_codesearch_mcp_spark.index.store import (
        IndexConfig, IndexReader, IndexWriter,
    )

    root = str(tmp_path / "ix_stats")
    cfg = IndexConfig(field="content_patterns", n_buckets=4, range_size=128,
                      chunk_size=128, chunks_per_wave=2, salt_threshold=10_000)
    IndexWriter(spark, root, cfg).build(documents.limit(100))
    st = index_stats(IndexReader(spark, root))
    assert st["n_docs"] == 100
    assert st["n_terms"] > 0 and st["total_tokens"] > 0
    assert st["n_chunks"] >= 1 and len(st["waves"]) >= 1
    assert sum(w["docs"] for w in st["waves"]) == 100
    assert all(w["docs_per_sec"] is None or w["docs_per_sec"] > 0 for w in st["waves"])


def test_indexing_progress_snapshot(spark):
    """A5 live metrics: idle snapshot is empty; during a running job
    the snapshot shows a job with per-stage task progress."""
    import threading
    import time

    from coa_codesearch_mcp_spark.functions.tools_ops import indexing_progress

    assert indexing_progress(spark) == {"active_jobs": []}

    def slow_part(it):
        time.sleep(3)
        yield from it

    done = {}

    def run():
        done["n"] = (
            spark.range(8).repartition(4).rdd.mapPartitions(slow_part).count()
        )

    t = threading.Thread(target=run)
    t.start()
    seen = None
    for _ in range(60):
        snap = indexing_progress(spark)
        if snap["active_jobs"]:
            seen = snap
            break
        time.sleep(0.1)
    t.join()
    assert done["n"] == 8
    assert seen is not None, "never observed the running job"
    job = seen["active_jobs"][0]
    assert job["stages"] and all("tasks" in s for s in job["stages"])
