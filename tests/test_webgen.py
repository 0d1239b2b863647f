"""Synthetic webpage fixture: determinism + extractor invariant."""

from coa_codesearch_mcp_spark.fixtures.webgen import (
    generate_webpages,
    generate_webpages_pdf,
)
from coa_codesearch_mcp_spark.functions.text import extract_text_from_html


def test_generation_deterministic():
    a = generate_webpages_pdf(50, seed=42)
    b = generate_webpages_pdf(50, seed=42)
    assert a.equals(b)
    c = generate_webpages_pdf(50, seed=43)
    assert not a["text"].equals(c["text"])


def test_schema_and_shapes():
    pdf = generate_webpages_pdf(100, seed=42)
    assert list(pdf.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert pdf["url"].is_unique
    assert pdf["lang"].isin(["en", "es", "de", "fr"]).all()
    assert (pdf["text"].str.len() > 0).all()


def test_extractor_byte_identical_per_url():
    """The per-row invariant from input_hint: extracting html yields
    exactly the original text, byte-for-byte."""
    pdf = generate_webpages_pdf(100, seed=42)
    for _, row in pdf.iterrows():
        extracted = extract_text_from_html(bytes(row["html"]))
        assert extracted.encode("utf-8") == row["text"].encode("utf-8"), row["url"]


def test_distributed_matches_driver_side(spark):
    sdf = generate_webpages(spark, 64, seed=42, partitions=4)
    got = {r["url"]: r["text"] for r in sdf.collect()}
    want = generate_webpages_pdf(64, seed=42)
    assert got == dict(zip(want["url"], want["text"]))


def test_hot_docs_exist():
    pdf = generate_webpages_pdf(500, seed=42)
    assert pdf["text"].str.contains("hothot").sum() > 0
