"""Text -> dense vector embedding, model-free: signed feature hashing.

The reference embeds with an ONNX bge-small model
(Services/Embeddings/EmbeddingService.cs) — no model or ONNX runtime
ships in this environment, so that exact behavior stays a documented
divergence. What CAN be built for real, from public literature, is
the hashing-trick embedding (Weinberger et al. 2009, "Feature Hashing
for Large Scale Multitask Learning"; sign trick per Section 3):

    for each token t:  bucket = md5(t)[:8] mod dim
                       sign   = +1/-1 from the 9th md5 nibble's parity
    v[bucket] += sign, then L2-normalize.

Properties that make it the right stand-in at 10^12 docs:
- model-free, deterministic, embarrassingly parallel (one Arrow-batch
  pandas UDF — no model weights to broadcast, no GPU);
- inner products approximate token-multiset similarity unbiasedly
  (the hashing-trick guarantee), so cosine/KNN/ANN pipelines behave
  like they would over real embeddings;
- md5 is available in DuckDB too, so the WHOLE embedding is
  oracle-checkable value-for-value — something a neural model could
  never offer the driver's correctness gate.

The output column contract matches the pre-supplied
``embeddings.parquet`` (``array<float>``-compatible dense vectors),
so AnnIndex / knn / embedding-dedup consume these unchanged.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# tokenizer whitespace class pinned EXPLICITLY: Python str.split,
# Java regex \s and RE2 \s disagree on \x0b and Unicode whitespace
# (review finding) — the embedding spec uses exactly this ASCII set
# so the Spark UDF and the DuckDB twin can never diverge on exotic
# corpora
_WS = __import__("re").compile(r"[ \t\n\f\r]+")

# case folding pinned to ASCII A-Z only (round-4 ADVICE): Python
# str.lower() applies full Unicode case mapping (İ -> i̇, Σ -> σ with
# final-sigma rules) while DuckDB lower() follows ICU — they disagree
# on exotic corpora and a single flipped token changes the bucket
# sums. The embedding SPEC is therefore ASCII folding, implemented as
# translate() on both engines.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _round_half_away(vec: np.ndarray, round_to: int) -> np.ndarray:
    """Half-away-from-zero rounding — what DuckDB's round() does.
    Python's round() is banker's (half-to-even): on an exact 6dp tie
    like 1/128 = 0.0078125 the two disagree (0.007812 vs 0.007813)
    and the value-for-value oracle would hash-mismatch (review
    finding; latent on the current corpora, which have no ties)."""
    scale = 10.0 ** round_to
    return np.sign(vec) * np.floor(np.abs(vec) * scale + 0.5) / scale


# token -> (md5 32-bit prefix, sign): a pure-function memo of the md5
# digest math (the per-token md5 dominated the round-5 profile). The
# value is dim-independent (bucket = prefix % dim at use). Bounded and
# deterministic — this caches arithmetic on the token string itself,
# never any corpus-derived result, and survives across Arrow batches
# on a reused Python worker (guide §4.5 heavyweight-state pattern).
_MD5_MEMO: dict[str, tuple[int, float]] = {}
_MD5_MEMO_MAX = 1 << 20


def _token_feature(tok: str) -> tuple[int, float]:
    v = _MD5_MEMO.get(tok)
    if v is None:
        h = hashlib.md5(tok.encode("utf-8")).hexdigest()
        v = (int(h[:8], 16), 1.0 if int(h[8], 16) % 2 == 0 else -1.0)
        if len(_MD5_MEMO) < _MD5_MEMO_MAX:
            _MD5_MEMO[tok] = v
    return v


def _embed_series(texts: pd.Series, dim: int, round_to: int) -> pd.Series:
    from collections import Counter

    out = []
    for text in texts:
        vec = np.zeros(dim, dtype=np.float64)
        # count duplicate tokens first so each distinct token hashes
        # once; vec[bucket] += sign * count is exact (integer sums)
        # and equals the one-increment-per-occurrence loop bit-for-bit
        counts = Counter(_WS.split((text or "").translate(_ASCII_LOWER)))
        counts.pop("", None)
        for tok, cnt in counts.items():
            prefix, sign = _token_feature(tok)
            vec[prefix % dim] += sign * cnt
        # pre-normalization components are INTEGER counts (sums of
        # ±1), so every square and partial sum is exactly
        # representable below 2^53: the norm is the same bit-exact
        # double under ANY summation order, on numpy and on DuckDB's
        # sum() alike. math.fsum makes that independence explicit
        # (round-4 ADVICE flagged pairwise-vs-sequential divergence at
        # the 6dp rounding boundary; exact inputs close it outright).
        norm = math.sqrt(math.fsum(float(x) * float(x) for x in vec))
        if norm > 0:
            vec = vec / norm
        out.append(_round_half_away(vec, round_to).tolist())
    return pd.Series(out)


def hashed_embedding_udf(dim: int = 64, round_to: int = 6):
    """Arrow-batched Series->Series UDF producing the hashed vector."""

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def embed(texts: pd.Series) -> pd.Series:
        return _embed_series(texts, dim, round_to)

    return embed


def embed_texts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """(id, embedding array<double>) — whitespace-lowercase tokens
    through the signed hashing trick, L2-normalized. Rounding pins the
    values for cross-engine comparison (and keeps parquet output
    stable); 6 decimals ≫ the float32 precision a model would give."""
    from ..index.build import spread_input

    # unsplittable-input guard (guide §2.5): a single-row-group corpus
    # would run the embedding UDF on 1-2 cores; no-op at real scale
    src = spread_input(df.select(F.col(id_col), F.col(text_col)))
    return src.select(
        F.col(id_col),
        hashed_embedding_udf(dim, round_to)(F.col(text_col)).alias("embedding"),
    )
