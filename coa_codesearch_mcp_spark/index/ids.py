"""Deterministic dense doc-id assignment for web-scale inputs.

The index derives its resume chunks (``chunk_id = doc_id DIV
chunk_size``) and WAND scatter ranges (``range_id = doc_id DIV
range_size``) from doc ids, so ids must be DENSE-ish: hashing urls
into a 62-bit space gives every doc its own chunk (a 20k-doc build
plans 20k chunk units -> thousands of driver-sequential waves) and
fragments posting blocks to one doc per range, killing both delta
compression and skip pointers. `IndexWriter.tokenize_stage` fails
fast on that shape and points here.

`assign_dense_doc_ids` produces ids 0..n-1 that are DETERMINISTIC for
a given input set regardless of cluster size or input partitioning —
the property resume needs (re-running a crashed build must map every
url to the same id):

  1. bucket = pmod(murmur3(url), P)    — pure column expr, no physical
                                          partition dependence;
  2. count docs per bucket, prefix-sum on the driver (P rows);
  3. per bucket, sort by url and assign offset[bucket] + local rank
     (one applyInPandas pass; each bucket holds ~n/P docs).

Two passes over the input, but pass 1 reads only the key column
(column pruning), and P is fixed by the CALLER, not the cluster, so
the same job on N or 4N executors yields identical ids.

Reference context: Lucene assigns dense segment-local docIDs on write
(cited behavior, not code: segments_N lineage); the distributed
equivalent of "dense ids per segment" is this bucketed prefix-sum.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_dense_doc_ids(
    docs: DataFrame, key_col: str = "url", partitions: int = 256
) -> DataFrame:
    """Return ``docs`` plus a dense deterministic ``doc_id`` column.

    ``partitions`` fixes the bucket count — part of the id mapping, so
    use the same value when re-running a resumable build. ``key_col``
    values must be unique (they identify docs)."""
    bucket = F.pmod(F.hash(F.col(key_col)), F.lit(partitions)).alias("__bucket")
    counts = {
        r["__bucket"]: r["cnt"]
        for r in docs.select(bucket).groupBy("__bucket").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    offsets, acc = {}, 0
    for b in range(partitions):
        offsets[b] = acc
        acc += counts.get(b, 0)

    schema = T.StructType(
        list(docs.schema.fields) + [T.StructField("doc_id", T.LongType(), False)]
    )
    sc = docs.sparkSession.sparkContext
    b_offsets = sc.broadcast(offsets)

    def assign(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort").reset_index(drop=True)
        off = b_offsets.value[int(key[0])]
        out = pdf.drop(columns=["__bucket"])
        out["doc_id"] = range(off, off + len(pdf))
        return out

    return (
        docs.withColumn("__bucket", bucket)
        .groupBy("__bucket")
        .applyInPandas(assign, schema)
    )
