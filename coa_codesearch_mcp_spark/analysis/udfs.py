"""Vectorized (Arrow-batched) tokenizer UDFs.

The analyzer chain is inherently a per-string state machine, so the
Python loop lives INSIDE the pandas UDF over Arrow batches — never a
row-at-a-time Python UDF. Output is ``array<struct<term,pos>>`` so the
downstream posting build is pure DataFrame ops (explode + groupBy),
which Catalyst plans as partial/final hash aggregation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from .chains import (
    FIELD_CONTENT,
    FIELD_PATTERNS,
    FIELD_SYMBOLS,
    analyze,
    analyze_positions,
)

TOKEN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("pos", T.IntegerType(), False),
        ]
    )
)

# per-doc PRE-AGGREGATED postings: tf and sorted positions computed
# inside the UDF (a doc's tokens are row-local, so the (term, doc)
# aggregation needs NO shuffle — the classic map-side combine, done
# one level earlier)
GROUPED_TOKEN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.IntegerType(), False),
            T.StructField("positions", T.ArrayType(T.IntegerType()), False),
        ]
    )
)


def _make_tokenizer_udf(field: str):
    @pandas_udf(TOKEN_SCHEMA)
    def tok(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: [
                {"term": term, "pos": pos}
                for term, pos in analyze_positions(field, t)
            ]
            if t is not None
            else []
        )

    return tok


def make_grouped_tokenizer_udf(field: str):
    @pandas_udf(GROUPED_TOKEN_SCHEMA)
    def tok(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return []
            groups: dict[str, list[int]] = {}
            for term, pos in analyze_positions(field, t):
                groups.setdefault(term, []).append(pos)
            return [
                {"term": term, "tf": len(ps), "positions": ps}
                for term, ps in groups.items()
            ]

        return texts.map(one)

    return tok


# positions-free variant of GROUPED_TOKEN_SCHEMA for consumers that
# never read positions (with_positions=False index builds): building
# and Arrow-shipping the per-term position lists is pure overhead
# there (guide §4.1 — pass only the columns the consumer needs)
TF_TOKEN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.IntegerType(), False),
        ]
    )
)


def make_tf_tokenizer_udf(field: str):
    @pandas_udf(TF_TOKEN_SCHEMA)
    def tok(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return []
            counts: dict[str, int] = {}
            for term in analyze(field, t):
                counts[term] = counts.get(term, 0) + 1
            return [{"term": term, "tf": n} for term, n in counts.items()]

        return texts.map(one)

    return tok


tokenize_content = _make_tokenizer_udf(FIELD_CONTENT)
tokenize_patterns = _make_tokenizer_udf(FIELD_PATTERNS)
tokenize_symbols = _make_tokenizer_udf(FIELD_SYMBOLS)

TOKENIZERS = {
    FIELD_CONTENT: tokenize_content,
    FIELD_PATTERNS: tokenize_patterns,
    FIELD_SYMBOLS: tokenize_symbols,
}


# Python str.split()'s whitespace set (CPython Py_UNICODE_ISSPACE:
# 09-0D, 1C-1F, 20, 85, A0, 1680, 2000-200A, 2028, 2029, 202F, 205F,
# 3000) as a JVM regex class. Java's plain \s is ASCII-only, so the
# built-in FIELD_PATTERNS path must use THIS to tokenize byte-identically
# to the Python chains (store index and query analyzer) on non-ASCII
# whitespace — the store==logical rank-identity contract.
PY_WHITESPACE_RE = (
    "[\\t-\\r\\x1c-\\x1f \\x85\\xa0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000]+"
)


def tokens_col(field: str, text_col: str = "text"):
    """Column expression: analyzed (term,pos) array for ``field``.

    For the ``content_patterns`` chain (whitespace + lowercase) this is
    expressed with BUILT-IN functions only — it stays inside
    whole-stage codegen, no Python at all. The code-aware chains need
    the pandas UDF.
    """
    if field == FIELD_PATTERNS:
        toks = F.split(F.lower(F.col(text_col)), PY_WHITESPACE_RE)
        toks = F.filter(toks, lambda x: x != F.lit(""))
        return F.transform(
            toks,
            lambda t, i: F.struct(
                t.alias("term"), i.cast("int").alias("pos")
            ),
        )
    return TOKENIZERS[field](F.col(text_col))
