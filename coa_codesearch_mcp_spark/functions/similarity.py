"""Similarity search over embedding columns (reference analog: the
vec0 KNN tier, SQLiteSymbolService.cs:1437-1479 — cosine top-k).

Two paths:
- ``knn_bruteforce``: exact cosine top-k — all built-in expressions
  (zip_with dot product), Catalyst plans TakeOrderedAndProject;
  the 100 TB baseline when no index exists.
- ``knn_lsh``: random-hyperplane bucketed search with multi-probe —
  scans only the probed buckets (partition-prunable if the table is
  written partitioned by bucket); the scale path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(c: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_cols(vec_col: str, qvec: list[float]) -> Column:
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))


def knn_bruteforce(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k; similarity = 1 - d/2 convention is left to
    callers (the reference reports cosine distance)."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_cols(vec_col, qvec), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_bucket(vec_col: str, planes: np.ndarray) -> Column:
    bits = [
        F.when(
            _dot(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in planes[i]]),
            )
            > 0,
            "1",
        ).otherwise("0")
        for i in range(len(planes))
    ]
    return F.concat_ws("", *bits)


def make_planes(dim: int, n_planes: int = 8, seed: int = 11) -> np.ndarray:
    return np.random.RandomState(seed).randn(n_planes, dim)


def knn_lsh(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: np.ndarray | None = None,
    n_probes: int = 4,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: probe the query's bucket plus the
    ``n_probes-1`` buckets whose single flipped bit had the smallest
    |margin| (multi-probe LSH) — recall/sketch tradeoff documented."""
    if planes is None:
        planes = make_planes(len(qvec), seed=seed)
    q = np.asarray(qvec, dtype=np.float64)
    margins = planes @ q
    qbits = (margins > 0).astype(int)

    def bits_to_str(bits) -> str:
        return "".join("1" if b else "0" for b in bits)

    buckets = [bits_to_str(qbits)]
    for i in np.argsort(np.abs(margins))[: max(0, n_probes - 1)]:
        flipped = qbits.copy()
        flipped[i] ^= 1
        buckets.append(bits_to_str(flipped))

    bucketed = df.withColumn("_bucket", hyperplane_bucket(vec_col, planes))
    cand = bucketed.filter(F.col("_bucket").isin(buckets))
    return knn_bruteforce(cand, qvec, k, vec_col, id_col)
