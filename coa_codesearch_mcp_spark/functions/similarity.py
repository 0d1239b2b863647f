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


def make_planes(dim: int, n_planes: int = 8, seed: int = 11) -> np.ndarray:
    return np.random.RandomState(seed).randn(n_planes, dim)


def probe_buckets(qvec: list[float], planes: np.ndarray, n_probes: int) -> list[int]:
    """Multi-probe sequence (Lv et al., 'Multi-Probe LSH', VLDB 2007):
    the query's own bucket, then buckets reached by flipping 1..3 of
    the lowest-|margin| hyperplane bits (combination order over bits
    sorted by |margin| ascending). Bucket id = little-endian bit int."""
    import itertools

    q = np.asarray(qvec, dtype=np.float64)
    margins = planes @ q
    qbits = (margins > 0).astype(int)
    flips = np.argsort(np.abs(margins)).tolist()

    def to_int(bits) -> int:
        return int(sum(int(b) << i for i, b in enumerate(bits)))

    out = [to_int(qbits)]
    for r in (1, 2, 3):
        for combo in itertools.combinations(flips, r):
            b = qbits.copy()
            for i in combo:
                b[i] ^= 1
            out.append(to_int(b))
            if len(out) >= n_probes:
                return out[:n_probes]
    return out[:n_probes]


def hyperplane_bucket_int(vec_col: str, planes: np.ndarray) -> Column:
    """Bucket id as an int (little-endian sign bits) — usable as a
    parquet partition column."""
    acc = F.lit(0)
    for i in range(len(planes)):
        bit = F.when(
            _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in planes[i]])) > 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        acc = acc + bit
    return acc


class AnnIndex:
    """Materialized ANN table: vectors written ONCE, partitioned by
    hyperplane bucket, planes persisted beside the data. A query reads
    ONLY the probed bucket directories (partition pruning at the scan —
    the round-1 knn_lsh recomputed every vector's bucket per query, so
    nothing was actually pruned).

    At 10^12 vectors this is the IVF-style layout: bucket dirs are the
    inverted lists, multi-probe picks the lists, and the per-list scan
    is an exact re-rank of candidates only.
    """

    def __init__(self, spark, root: str):
        import json
        import os

        self.spark = spark
        self.root = root
        with open(os.path.join(root, "planes.json")) as f:
            meta = json.load(f)
        self.planes = np.asarray(meta["planes"], dtype=np.float64)
        self.vec_col = meta["vec_col"]
        self.id_col = meta["id_col"]

    @staticmethod
    def build(
        spark,
        df: DataFrame,
        root: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        n_planes: int = 4,
        seed: int = 11,
        dim: int | None = None,
    ) -> "AnnIndex":
        import json
        import os

        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        planes = make_planes(dim, n_planes=n_planes, seed=seed)
        bucketed = df.withColumn("bucket", hyperplane_bucket_int(vec_col, planes))
        (
            bucketed.repartition("bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(os.path.join(root, "vectors"))
        )
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, "planes.json"), "w") as f:
            json.dump(
                {"planes": planes.tolist(), "vec_col": vec_col, "id_col": id_col},
                f,
            )
        return AnnIndex(spark, root)

    def vectors(self) -> DataFrame:
        import os

        return self.spark.read.parquet(os.path.join(self.root, "vectors"))

    def query(self, qvec: list[float], k: int = 10, n_probes: int = 4) -> DataFrame:
        buckets = probe_buckets(qvec, self.planes, n_probes)
        cand = self.vectors().filter(F.col("bucket").isin(buckets))
        return knn_bruteforce(cand, qvec, k, self.vec_col, self.id_col)


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
    """Ad-hoc (no materialized index) variant: same probe sequence,
    but buckets are computed inline over the input — use AnnIndex for
    repeated queries so the scan actually prunes."""
    if planes is None:
        planes = make_planes(len(qvec), seed=seed)
    buckets = probe_buckets(qvec, planes, n_probes)
    bucketed = df.withColumn("_bucket", hyperplane_bucket_int(vec_col, planes))
    cand = bucketed.filter(F.col("_bucket").isin(buckets))
    return knn_bruteforce(cand, qvec, k, vec_col, id_col)
