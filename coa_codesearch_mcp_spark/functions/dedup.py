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


_SPLITMIX_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain, Steele et al.,
    'Fast splittable pseudorandom number generators', OOPSLA 2014).
    uint64 arithmetic wraps — exactly the mixing we want."""
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def minhash_signature_udf(num_hashes: int = 64, seed: int = 1, ngram: int = 3):
    """Vectorized minhash over shingle arrays — no Python-level loops
    in the hot path:

    - shingle -> uint64 via pandas' C siphash (``pd.util.hash_array``,
      fixed key => deterministic across executors/runs);
    - k 'permutations' via splitmix64 mixing of (hash + i*GOLDEN),
      all in wrapping uint64 numpy ops (the round-1 version did
      np.object_ big-int modular math plus a per-shingle Python FNV
      loop — ~10x slower on the build side).
    """
    idx = (np.arange(1, num_hashes + 1, dtype=np.uint64) + np.uint64(seed)) * _SPLITMIX_GOLDEN

    @pandas_udf("array<long>")
    def sig(shingles: pd.Series) -> pd.Series:
        out = []
        for sh in shingles:
            if sh is None or len(sh) == 0:
                out.append([0] * num_hashes)
                continue
            xs = pd.util.hash_array(np.asarray(sh, dtype=object))  # uint64
            # (num_hashes, n_shingles): mix then min over shingles
            m = _splitmix64(xs[None, :] + idx[:, None]).min(axis=1)
            out.append(m.astype(np.int64).tolist())
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

    max_bucket (ENFORCED): buckets holding more than this many docs —
    boilerplate-heavy web content: cookie banners, parked domains —
    are dropped from the self-join instead of going quadratic; a pair
    only needs ONE surviving shared band-bucket to stay a candidate,
    so the cost is bounded recall loss on boilerplate, not corruption.
    ``minhash_bucket_overflow`` returns the dropped buckets + sizes so
    a pipeline can count/inspect what the cap skipped.
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

    # hot-bucket cap: one aggregation on the same (band, bucket) keys
    # as the self-join shuffle; oversized buckets are excluded BEFORE
    # the join so no reducer ever owns a quadratic cross-product
    sizes = bands_df.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("_bsize")
    )
    bands_df = (
        bands_df.join(sizes, ["band", "bucket"])
        .filter(F.col("_bsize") <= max_bucket)
        .drop("_bsize")
    )

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


def minhash_bucket_overflow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Audit twin of minhash_lsh_candidates: the (band, bucket, n_docs)
    rows the cap EXCLUDED from the self-join — surface these as
    pipeline metrics rather than silently widening the skip."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature_udf(num_hashes, ngram=ngram)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        shingles_col(text_col, ngram).alias("shingles"),
    ).withColumn("sig", sig(F.col("shingles")))
    bands_df = base.select(
        "doc_id",
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
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return (
        bands_df.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket)
    )


# ----------------------------------------------------------- simhash


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc as PURE column expressions — no UDF, the
    whole computation stays inside whole-stage codegen (the round-1
    version ran per-token, per-bit Python loops in a pandas UDF).

    Pinned engine-portable spec (the DuckDB oracle in
    __spark_entry__.py recomputes it bit-identically):
    - tokens: lowercase, whitespace-split, non-empty; weight = tf
    - token hash: md5 hex; bits 63..32 = first 8 hex digits, bits
      31..0 = next 8 (md5 is available in any engine, unlike
      xxhash64 whose seed/variant differs per engine)
    - fp bit i = 1 iff sum(tf * (2*bit_i(token)-1)) > 0
    - stored signed int64; docs with no tokens -> fp = 0
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
        ).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    md5c = F.md5(F.col("tok"))
    hi = F.conv(F.substring(md5c, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(md5c, 9, 8), 16, 10).cast("long")

    def bit(i: int):
        src, sh = (lo, i) if i < 32 else (hi, i - 32)
        return F.shiftrightunsigned(src, sh).bitwiseAND(F.lit(1))

    sums = tf.groupBy("doc_id").agg(
        *[
            F.sum(F.col("cnt") * (bit(i) * 2 - 1)).alias(f"s{i}")
            for i in range(64)
        ]
    )
    fp = None
    for i in range(64):
        # bit 63 of a signed long is the sign bit: adding MIN_LONG sets
        # it without overflow
        piece = F.when(
            F.col(f"s{i}") > 0,
            F.lit(-(1 << 63)) if i == 63 else F.lit(1 << i),
        ).otherwise(F.lit(0))
        fp = piece if fp is None else fp + piece
    sums = sums.select("doc_id", fp.cast("long").alias("fp"))
    # docs whose text tokenizes to nothing get fp = 0
    return df.select(F.col(id_col).alias("doc_id")).join(
        sums, "doc_id", "left"
    ).select("doc_id", F.coalesce("fp", F.lit(0)).alias("fp"))


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
    bucket, never all-pairs. EXACT result set: equals brute-force
    all-pairs Hamming <= k (the pigeonhole guarantee is lossless),
    which is what the DuckDB oracle checks.
    """
    nblocks = max_hamming + 1
    width = 64 // nblocks
    base = simhash_fingerprints(df, text_col, id_col)

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
