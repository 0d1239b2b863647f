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


GROUPED_TOKENS_ARROW_SCHEMA = (
    "doc_id long, "
    "tokens array<struct<term:string,tf:int,positions:array<int>>>, "
    "dl long"
)


def grouped_tokens_arrow(
    df,
    field: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_positions: bool = True,
):
    """mapInArrow twin of make_grouped_tokenizer_udf: same per-doc
    grouped output (doc_id, tokens array<struct<term,tf,positions>>,
    dl), but the nested Arrow arrays are built DIRECTLY from flat
    buffers + offset arrays (guide §4.2) instead of pandas lists of
    dicts — the dict-per-token construction and pandas->Arrow nested
    conversion dominated the tokenize profile, not the analyzer chain
    itself. with_positions=False emits empty position lists without
    collecting positions at all."""
    import pyarrow as pa

    from pyspark.sql import functions as F

    from .chains import analyze, analyze_positions

    def fn(batches):
        for b in batches:
            ids = b.column(0)
            texts = b.column(1).to_pylist()
            tok_offsets = [0]
            terms: list[str] = []
            tfs: list[int] = []
            pos_flat: list[int] = []
            pos_offsets = [0]
            dls: list[int] = []
            for t in texts:
                dl = 0
                if t is not None:
                    if with_positions:
                        groups: dict[str, list[int]] = {}
                        for term, pos in analyze_positions(field, t):
                            groups.setdefault(term, []).append(pos)
                        for term, ps in groups.items():
                            terms.append(term)
                            tfs.append(len(ps))
                            dl += len(ps)
                            pos_flat.extend(ps)
                            pos_offsets.append(len(pos_flat))
                    else:
                        counts: dict[str, int] = {}
                        for term in analyze(field, t):
                            counts[term] = counts.get(term, 0) + 1
                        for term, n in counts.items():
                            terms.append(term)
                            tfs.append(n)
                            dl += n
                            pos_offsets.append(len(pos_flat))
                tok_offsets.append(len(terms))
                dls.append(dl)
            positions = pa.ListArray.from_arrays(
                pa.array(pos_offsets, pa.int32()),
                pa.array(pos_flat, pa.int32()),
            )
            struct = pa.StructArray.from_arrays(
                [pa.array(terms, pa.string()), pa.array(tfs, pa.int32()), positions],
                names=["term", "tf", "positions"],
            )
            tokens = pa.ListArray.from_arrays(
                pa.array(tok_offsets, pa.int32()), struct
            )
            yield pa.RecordBatch.from_arrays(
                [ids, tokens, pa.array(dls, pa.int64())],
                ["doc_id", "tokens", "dl"],
            )

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return src.mapInArrow(fn, GROUPED_TOKENS_ARROW_SCHEMA)


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
