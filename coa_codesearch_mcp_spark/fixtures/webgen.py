"""Deterministic Common-Crawl-style webpage table generator.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Properties (FIXTURES.md §1):
- seeded (default 42), fully deterministic — same args, same bytes;
- Zipfian vocabulary mixing prose words with code-ish tokens
  (CamelCase, snake_case, generics, [attributes], ::qualified,
  ->members, operators) so every CodeAnalyzer branch is exercised;
- log-normal doc lengths; ~1% of docs stuffed with hot terms to
  exercise skew salting;
- ``html`` is a trivial deterministic wrapper of ``text`` so the
  extractor invariant (byte-identical text per url) is testable.

Generation is distributed: the driver plans (n_docs, seed), executors
synthesize rows via mapInPandas — no driver-side materialization, so
the fixture scales to any size the cluster can hold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WEB_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

LANGS = ["en", "es", "de", "fr"]

_PROSE = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "data", "search", "index", "query", "merge", "sort", "scan",
    "table", "stream", "batch", "window", "hash", "join", "filter",
    "shard", "block", "term", "score", "rank", "page", "crawl",
]
_CODE = [
    "UserService", "XMLParser", "OAuth2Provider", "snake_case_name",
    "kebab-case-name", "List<string>", "Dictionary<int,string>",
    "[Fact]", "@property", "std::cout", "->member", ": ITool",
    "IRepository<T>", "=>", "??", "+=", "!=", "getInstance",
    "parseHTML", "API_KEY", "config.yaml", "handler.test.js",
]
_HOT = ["hothot", "stopword"]  # ~1% docs stuffed with these

VOCAB = _PROSE + _CODE


def extended_vocab(vocab_size: int) -> list[str]:
    """VOCAB padded with generated terms to ``vocab_size`` entries.

    The default 51-word vocabulary wraps the Zipf tail back onto the
    head (``% len(VOCAB)``), which flattens per-block score variance —
    fine for correctness oracles, useless for demonstrating block-max
    pruning. A web-realistic vocabulary (tens of thousands of terms,
    heavy-tailed df) restores the skew BMW exists for; used only by
    evidence tools, never by the oracle fixtures."""
    extra = vocab_size - len(VOCAB)
    if extra <= 0:
        return VOCAB

    def b26(i: int) -> str:
        # letters-only so the code tokenizer keeps each term as ONE
        # token (digits would split on the letter->digit boundary)
        s = ""
        for _ in range(4):
            s += chr(ord("a") + i % 26)
            i //= 26
        return s

    return VOCAB + [f"v{b26(i)}x" for i in range(extra)]


def _make_text(
    rng: np.random.RandomState, hot: bool, vocab: list[str] | None = None
) -> str:
    vocab = vocab if vocab is not None else VOCAB
    n = int(np.clip(rng.lognormal(4.0, 0.8), 20, 2000))
    # Zipfian-ish sampling over the vocabulary
    ranks = rng.zipf(1.3, size=n)
    words = [vocab[(r - 1) % len(vocab)] for r in ranks]
    if hot:
        stuff = rng.randint(20, 60)
        words += [_HOT[i % len(_HOT)] for i in range(stuff)]
    return " ".join(words)


def _wrap_html(text: str, url: str) -> bytes:
    # entity-escape so code-ish tokens like List<string> survive the
    # extractor's tag stripping byte-for-byte
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    # url rides in an attribute (stripped with the tag), not in text
    return (
        f'<html><head data-url="{url}"></head><body><p>{esc}</p></body></html>'
    ).encode("utf-8")


def _make_row(i: int, seed: int, vocab: list[str] | None = None) -> dict:
    rng = np.random.RandomState(seed + i)  # per-row determinism
    lang = LANGS[i % len(LANGS)]
    hot = rng.rand() < 0.01
    text = _make_text(rng, hot, vocab)
    url = f"https://example.org/{lang}/{i:08d}.html"
    ts = pd.Timestamp("2024-01-01", tz="UTC") + pd.Timedelta(
        seconds=int(rng.randint(0, 90 * 86400))
    )
    return {
        "url": url,
        "warc_ts": ts.tz_localize(None),
        "html": _wrap_html(text, url),
        "text": text,
        "lang": lang,
    }


def generate_webpages_pdf(n_docs: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    """Driver-side (pandas) generation for tests/oracles."""
    return pd.DataFrame([_make_row(i, seed) for i in range(start, start + n_docs)])


def generate_webpages(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    partitions: int | None = None,
    vocab_size: int | None = None,
) -> DataFrame:
    """Distributed generation: plan rows on executors via mapInPandas.

    ``vocab_size`` (optional) pads the vocabulary with generated terms
    for web-realistic df skew — see :func:`extended_vocab`. Default
    output is byte-identical to previous rounds (oracles depend on it).
    """
    partitions = partitions or spark.sparkContext.defaultParallelism
    bounds = spark.range(0, n_docs, 1, partitions)
    vocab = extended_vocab(vocab_size) if vocab_size else None

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            if not ids:
                continue
            yield pd.DataFrame([_make_row(int(i), seed, vocab) for i in ids])

    return bounds.mapInPandas(gen, WEB_SCHEMA)
