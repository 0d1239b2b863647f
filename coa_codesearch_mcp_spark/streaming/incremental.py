"""Incremental index maintenance — the reference's watcher/NRT layer
re-expressed as delta segments + scoped tombstones (SURVEY §2.10).

Reference behaviors mapped:
- W2 atomic-write coalescing + W6 last-event-wins upsert: per-key
  dedup keeping the newest event in each micro-batch (delete+create
  within one batch collapses to the final state);
- S6 upsert / S7 delete: segments are immutable (Lucene-style,
  LuceneIndexService.cs:259-312) — an upserted or deleted url writes
  a tombstone (doc_id, upto_seg) that hides the doc in every segment
  OLDER than the replacing delta; the new copy in the delta itself
  stays visible. Deletes use upto_seg = +inf.
- W5 NRT refresh: readers resolve the manifest snapshot at query
  time; a committed delta is immediately visible;
- S9 merge/optimize: ``rebuild()`` folds deltas + tombstones back
  into the main index (Iceberg rewrite_data_files at production).

Scoring stays EXACT across segments: corpus stats (N, avgdl) are
combined over live docs; df combines per-segment dictionaries (like
Lucene, deleted docs still count toward df until compaction —
documented divergence from a fully-live df).

Key assignment: streamed docs get ``doc_id = xxhash64(url)`` —
deterministic without coordination (collision odds documented in
store.py; production would reserve an id-mapping table).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..index.manifest import Manifest


def _url_doc_id():
    """Deterministic positive doc id from url (codec gaps require
    non-negative ids; mask to 62 bits)."""
    return F.xxhash64("url").bitwiseAND(F.lit((1 << 62) - 1))

from ..index.store import IndexConfig, IndexReader, IndexWriter

_FOREVER = 1 << 62
MAIN_SEG = 0


class DeltaIndexManager:
    """Manages a main index (seg 0) + ordered delta segments + scoped
    tombstones under ``root/``: main/, deltas/NNNNNN/, tombstones/."""

    def __init__(self, spark: SparkSession, root: str, config: IndexConfig | None = None):
        self.spark = spark
        self.root = root
        self.cfg = config or IndexConfig()
        self.manifest = Manifest.load_or_create(root)

    # ------------------------------------------------------- layout

    def _delta_ids(self) -> list[int]:
        return sorted(int(u) for u in self.manifest.completed_units("deltas"))

    def _delta_root(self, delta_id: int) -> str:
        return os.path.join(self.root, "deltas", f"{delta_id:06d}")

    def _tombstone_path(self) -> str:
        return os.path.join(self.root, "tombstones")

    def tombstones(self) -> DataFrame:
        """(doc_id, upto_seg) — doc hidden in segments < upto_seg.

        Resolved LAST-WRITER-WINS by the issuing delta id, NOT by
        max(upto_seg): a delete (upto_seg=+inf) must be superseded by
        a later re-upsert of the same url, whose tombstone only hides
        copies older than its own delta. (Round-2 fix; max() made a
        delete permanent even after re-creation.)"""
        path = self._tombstone_path()
        if not os.path.exists(path):
            return self.spark.createDataFrame([], "doc_id long, upto_seg long")
        raw = self.spark.read.parquet(path)
        latest = (
            raw.withColumn(
                "_rn",
                F.row_number().over(
                    W.partitionBy("doc_id").orderBy(F.desc("issued_delta"))
                ),
            )
            .filter(F.col("_rn") == 1)
            .select("doc_id", "upto_seg")
        )
        return latest

    def segments(self) -> list[tuple[int, IndexReader]]:
        out = []
        main = os.path.join(self.root, "main")
        if os.path.exists(os.path.join(main, "manifest.json")):
            out.append((MAIN_SEG, IndexReader(self.spark, main)))
        for d in self._delta_ids():
            r = self._delta_root(d)
            if os.path.exists(os.path.join(r, "manifest.json")):
                out.append((d, IndexReader(self.spark, r)))
        return out

    # ------------------------------------------------------ mutation

    def init_main(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> None:
        IndexWriter(self.spark, os.path.join(self.root, "main"), self.cfg).build(
            docs, id_col=id_col, text_col=text_col
        )
        self.manifest.record_unit("segments", "main", {"kind": "main"})
        self.manifest.commit()

    def apply_batch(self, changes: DataFrame) -> dict:
        """MERGE one micro-batch of change events.

        ``changes``: (url string, op string in {upsert, delete},
        text string nullable, warc_ts timestamp nullable,
        event_ts timestamp). Last-event-wins per url inside the batch.
        """
        latest = (
            changes.withColumn(
                "_rn",
                F.row_number().over(
                    W.partitionBy("url").orderBy(F.desc("event_ts"))
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("doc_id", _url_doc_id())
            .cache()
        )
        n_events = latest.count()
        if n_events == 0:
            return {"events": 0}

        delta_id = (self._delta_ids()[-1] + 1) if self._delta_ids() else MAIN_SEG + 1

        # upserts hide older copies only; deletes hide everywhere —
        # until a later delta's tombstone supersedes (issued_delta is
        # the LWW resolution key in tombstones())
        tomb = latest.select(
            "doc_id",
            F.when(F.col("op") == "delete", F.lit(_FOREVER))
            .otherwise(F.lit(delta_id))
            .alias("upto_seg"),
            F.lit(delta_id).alias("issued_delta"),
        )
        tomb.write.mode("append").parquet(self._tombstone_path())

        upserts = latest.filter(F.col("op") == "upsert").select(
            "doc_id", "url", "text", "warc_ts"
        )
        n_upserts = upserts.count()
        if n_upserts > 0:
            IndexWriter(self.spark, self._delta_root(delta_id), self.cfg).build(
                upserts, id_col="doc_id", text_col="text"
            )
        self.manifest.record_unit(
            "deltas", str(delta_id), {"events": n_events, "upserts": n_upserts}
        )
        self.manifest.commit()
        latest.unpersist()
        return {"events": n_events, "upserts": n_upserts, "delta_id": delta_id}

    # -------------------------------------------------------- query

    def combined_stats(self) -> tuple[int, float]:
        """Global (N, avgdl) over live docs."""
        tomb = self.tombstones()
        n, total = 0, 0.0
        for seg_id, r in self.segments():
            dl = self.spark.read.parquet(os.path.join(r.root, "doclens"))
            live = (
                dl.join(
                    tomb.filter(F.col("upto_seg") > seg_id), "doc_id", "left_anti"
                )
                .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
                .first()
            )
            n += live["n"] or 0
            total += float(live["s"] or 0.0)
        return n, (total / n if n else 0.0)

    def search_or(self, terms: list[str], k: int = 10) -> DataFrame:
        """BM25 OR top-k across all live segments (exact global stats,
        tombstone-scoped visibility)."""
        from ..index.codec import decode_blocks, varint_decode
        from ..query.bm25 import B, K1, idf_py

        terms = sorted(set(terms))
        n_docs, avgdl = self.combined_stats()
        segs = self.segments()
        if not segs or n_docs == 0:
            return self.spark.createDataFrame([], "doc_id long, score double")

        df_by_term: dict[str, int] = {t: 0 for t in terms}
        all_blocks = None
        for seg_id, r in segs:
            blocks, info = r.postings_blocks(terms)
            for t, meta in info.items():
                df_by_term[t] += meta["df"]
            tagged = blocks.withColumn("seg_id", F.lit(seg_id))
            all_blocks = tagged if all_blocks is None else all_blocks.unionByName(tagged)

        idfs = {t: idf_py(df_by_term[t], n_docs) for t in terms if df_by_term[t]}
        if not idfs:
            return self.spark.createDataFrame([], "doc_id long, score double")
        # Tombstones are DISTRIBUTED to the range that owns each doc id
        # via cogroup on range_id — no driver collect, no pickled dict
        # in the UDF closure: after heavy churn the tombstone set is
        # unbounded, but each range only ever sees its own slice.
        tomb_by_range = self.tombstones().withColumn(
            "range_id",
            F.expr(f"CAST(doc_id DIV {self.cfg.range_size} AS LONG)"),
        )
        kk = k

        def per_range(pdf: pd.DataFrame, tomb_pdf: pd.DataFrame) -> pd.DataFrame:
            tomb_map = dict(
                zip(
                    tomb_pdf["doc_id"].astype("int64").tolist(),
                    tomb_pdf["upto_seg"].astype("int64").tolist(),
                )
            )
            doc_scores: dict[int, float] = {}
            for (term, seg_id), grp in pdf.groupby(["term", "seg_id"], sort=True):
                if term not in idfs:
                    continue
                rows = grp.sort_values("block_no").to_dict("records")
                doc_ids, tfs = decode_blocks(rows)
                dls = np.concatenate(
                    [varint_decode(r["dls"], r["n"]) for r in rows]
                ).astype(np.float64)
                tfsf = tfs.astype(np.float64)
                contribs = (
                    idfs[term]
                    * tfsf
                    * (K1 + 1.0)
                    / (tfsf + K1 * (1.0 - B + B * dls / avgdl))
                )
                for d, c in zip(doc_ids.tolist(), contribs.tolist()):
                    upto = tomb_map.get(d)
                    if upto is not None and seg_id < upto:
                        continue  # hidden in this segment
                    doc_scores[d] = doc_scores.get(d, 0.0) + c
            ranked = sorted(
                doc_scores.items(), key=lambda kv: (-round(kv[1], 4), kv[0])
            )[:kk]
            return pd.DataFrame(ranked, columns=["doc_id", "score"])

        local = (
            all_blocks.groupby("range_id")
            .cogroup(tomb_by_range.groupby("range_id"))
            .applyInPandas(
                lambda left, right: per_range(left, right),
                "doc_id long, score double",
            )
        )
        return (
            local.select("doc_id", F.round("score", 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    # --------------------------------------------------- compaction

    def live_tokens(self) -> DataFrame:
        """Union of every segment's stored token rows with tombstone
        visibility applied — the input to a token-level segment merge.
        No text, no re-tokenization: (doc_id, tokens, dl)."""
        tomb = self.tombstones()
        out = None
        for seg_id, r in self.segments():
            toks = self.spark.read.parquet(os.path.join(r.root, "tokens")).select(
                "doc_id", "tokens", "dl"
            )
            live = toks.join(
                tomb.filter(F.col("upto_seg") > seg_id), "doc_id", "left_anti"
            )
            out = live if out is None else out.unionByName(live)
        if out is None:
            return self.spark.createDataFrame(
                [], "doc_id long, tokens array<struct<term:string,tf:int,positions:array<int>>>, dl long"
            )
        return out

    def merge_deltas(self) -> None:
        """S9 tiered merge: fold all delta segments + tombstones into a
        new main WITHOUT re-tokenizing — the merged token stores feed
        dictionary + postings directly (IndexWriter.build_from_tokens).
        Atomic flip via os.replace, then deltas/tombstones dropped.
        Reference: LuceneIndexService.cs:142-151 (size-tiered segment
        merge policy)."""
        import shutil

        new_main = os.path.join(self.root, "main_next")
        shutil.rmtree(new_main, ignore_errors=True)
        IndexWriter(self.spark, new_main, self.cfg).build_from_tokens(
            self.live_tokens()
        )
        old_main = os.path.join(self.root, "main")
        shutil.rmtree(old_main, ignore_errors=True)
        os.replace(new_main, old_main)
        shutil.rmtree(os.path.join(self.root, "deltas"), ignore_errors=True)
        shutil.rmtree(self._tombstone_path(), ignore_errors=True)
        self.manifest.data["stages"].pop("deltas", None)
        self.manifest.commit()

    def maybe_compact(
        self, delta_ratio: float = 0.25, max_deltas: int = 8
    ) -> bool:
        """Size-tiered trigger: merge when the delta tier outgrows the
        main segment (sum of delta docs > delta_ratio * main docs) or
        too many small segments accumulate (> max_deltas). Returns True
        if a merge ran."""
        segs = self.segments()
        main_docs = next((r.n_docs for sid, r in segs if sid == MAIN_SEG), 0)
        delta_docs = sum(r.n_docs for sid, r in segs if sid != MAIN_SEG)
        n_deltas = sum(1 for sid, _ in segs if sid != MAIN_SEG)
        if n_deltas == 0:
            return False
        if n_deltas > max_deltas or delta_docs > delta_ratio * max(main_docs, 1):
            self.merge_deltas()
            return True
        return False

    def rebuild(self, live_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> None:
        """S9 compaction: reindex live docs into a new main, drop
        deltas + tombstones, single atomic manifest flip."""
        import shutil

        new_main = os.path.join(self.root, "main_next")
        shutil.rmtree(new_main, ignore_errors=True)
        IndexWriter(self.spark, new_main, self.cfg).build(
            live_docs, id_col=id_col, text_col=text_col
        )
        old_main = os.path.join(self.root, "main")
        shutil.rmtree(old_main, ignore_errors=True)
        os.replace(new_main, old_main)
        shutil.rmtree(os.path.join(self.root, "deltas"), ignore_errors=True)
        shutil.rmtree(self._tombstone_path(), ignore_errors=True)
        self.manifest.data["stages"].pop("deltas", None)
        self.manifest.commit()


def retry_parked(manager: DeltaIndexManager) -> int:
    """W4 redelivery: re-apply micro-batches parked by attach_stream
    after a failure (reference analog: the indexing retry queue,
    FileIndexingService's failed-file requeue). Returns the number of
    batches redelivered. Idempotent — a batch that fails again stays
    parked."""
    import glob
    import shutil

    done = 0
    for d in sorted(glob.glob(os.path.join(manager.root, "retry", "batch_*"))):
        batch = manager.spark.read.parquet(d)
        manager.apply_batch(batch)
        shutil.rmtree(d, ignore_errors=True)
        done += 1
    return done


def attach_stream(
    manager: DeltaIndexManager,
    changes_stream: DataFrame,
    checkpoint_dir: str,
    auto_compact: bool = False,
    park_failures: bool = False,
):
    """W1: Structured Streaming ingestion — the micro-batch is the
    debounce window; each batch MERGEs via apply_batch (last-event-
    wins inside the batch absorbs rapid change storms per url).
    auto_compact: run the size-tiered merge policy after each batch.
    park_failures (W4): a batch whose MERGE throws is parked under
    root/retry/ for explicit redelivery (retry_parked) instead of
    failing the stream — Spark's own task retry handles transient
    executor errors below this; the park path is for poison batches."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        try:
            manager.apply_batch(batch_df)
        except Exception:
            if not park_failures:
                raise
            batch_df.write.mode("overwrite").parquet(
                os.path.join(manager.root, "retry", f"batch_{batch_id:09d}")
            )
            return
        if auto_compact:
            manager.maybe_compact()

    return (
        changes_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
