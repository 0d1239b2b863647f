"""Multi-factor scoring: per-factor expectations hand-derived from the
reference's rules, plus the 0.6/0.4 blend end-to-end."""

import math
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from coa_codesearch_mcp_spark.scoring.factors import (
    WEIGHTS,
    add_multi_factor_score,
)

REF_TIME = datetime(2024, 4, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def cand(spark):
    rows = [
        # production source file, query term present twice
        (1, 1.0, "https://x.org/src/services/UserService.cs",
         datetime(2024, 3, 31, 12, 0), "class UserService does service work service"),
        # test file — should be heavily path-penalized
        (2, 1.0, "https://x.org/tests/UserServiceTests.cs",
         datetime(2024, 3, 31, 12, 0), "test of service"),
        # deprioritized dir
        (3, 1.0, "https://x.org/node_modules/pkg/service.js",
         datetime(2024, 1, 1, 0, 0), "service service"),
        # doc file, old
        (4, 1.0, "https://x.org/docs/readme.md",
         datetime(2024, 1, 1, 0, 0), "documentation about service"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, score double, url string, warc_ts timestamp, text string"
    )


@pytest.fixture(scope="module")
def scored(cand):
    df = add_multi_factor_score(cand, "service", reference_time=REF_TIME)
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_exact_match_boost(scored):
    # doc1: 2 word-boundary 'service' matches ('UserService' has no
    # boundary before 'Service') -> log10(3); filename 'UserService.cs'
    # likewise has no \bservice\b match, so no +0.3
    assert scored[1]["f_exact_match"] == pytest.approx(
        min(1.0, math.log10(2 + 1)), abs=1e-6
    )
    # doc3: filename 'service.js' matches -> +0.3
    assert scored[3]["f_exact_match"] == pytest.approx(
        min(1.0, math.log10(2 + 1) + 0.3), abs=1e-6
    )


def test_path_relevance_production_vs_test(scored):
    # src/services -> weight 1.0, production boost 1.2, depth 3 dirs+file
    assert scored[1]["f_path_relevance"] > 0.8
    # tests dir + filename 'test' and query without 'test' -> 0.15 penalty
    assert scored[2]["f_path_relevance"] < 0.15
    # node_modules -> flat 0.1
    assert scored[3]["f_path_relevance"] == pytest.approx(0.1, abs=1e-6)


def test_filename_relevance(scored):
    # stem 'service' == query -> exact 1.0
    assert scored[3]["f_filename"] == pytest.approx(1.0)
    # 'UserService' contains 'service' -> all terms 0.8, no prefix
    assert scored[1]["f_filename"] == pytest.approx(0.8)


def test_file_type_relevance(scored):
    assert scored[1]["f_file_type"] == pytest.approx(1.0)   # .cs
    assert scored[4]["f_file_type"] == pytest.approx(0.4)   # .md
    assert scored[3]["f_file_type"] == pytest.approx(0.95)  # .js


def test_recency_boost(scored):
    # doc1 modified 0.5 days ago -> <24h: e^(-λ*0.5)*1.2 capped at 1
    lam = math.log(2) / 7
    expect = min(1.0, math.exp(-lam * 0.5) * 1.2)
    assert scored[1]["f_recency"] == pytest.approx(expect, rel=1e-3)
    # doc4: 91 days old, .md is a stable type -> slower decay
    base = math.exp(-lam * 91)
    expect4 = max(0.1, base + (1 - base) * 0.3)
    assert scored[4]["f_recency"] == pytest.approx(expect4, rel=1e-2)


def test_interface_impl_neutral_for_non_interface_query(scored):
    for d in scored.values():
        assert d["f_interface_impl"] == pytest.approx(0.5)


def test_final_blend(scored):
    d = scored[1]
    total_w = sum(WEIGHTS.values())
    weighted = (
        d["f_exact_match"] * WEIGHTS["exact_match"]
        + d["f_path_relevance"] * WEIGHTS["path_relevance"]
        + d["f_filename"] * WEIGHTS["filename"]
        + d["f_file_type"] * WEIGHTS["file_type"]
        + d["f_recency"] * WEIGHTS["recency"]
        + d["f_interface_impl"] * WEIGHTS["interface_impl"]
    ) / total_w
    assert d["final_score"] == pytest.approx(0.6 * 1.0 + 0.4 * weighted, abs=1e-9)


def test_interface_search_scores(spark):
    rows = [
        (1, 1.0, "https://x.org/src/services/ToolService.cs",
         datetime(2024, 3, 31), "class ToolService : ITool implementation"),
        (2, 1.0, "https://x.org/tests/MockTool.cs",
         datetime(2024, 3, 31), "class MockTool : ITool"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, score double, url string, warc_ts timestamp, text string"
    )
    out = {
        r["doc_id"]: r["f_interface_impl"]
        for r in add_multi_factor_score(df, "ITool", reference_time=REF_TIME).collect()
    }
    assert out[2] == pytest.approx(0.2)   # mock penalty
    assert out[1] in (0.8, 1.0)           # implementation boost
