"""Search-tool-shaped operators (SURVEY §2: Q9/Q17, A4, O3, F9, S10,
T7/T8/T10).

Each is a standalone DataFrame transform mirroring one reference tool:

- ``file_search``     — glob over url/path + the match-quality score
                        ladder (Tools/FileSearchTool.cs:213-240,410-448)
- ``line_search``     — per-line grep with per-file caps + counts
                        (Tools/LineSearchTool.cs:131-245)
- ``recent_files``    — timeframe cutoff + order by ts desc
                        (Tools/RecentFilesTool.cs:95-101,229-253)
- ``call_path_bfs``   — iterative BFS over an edges table, the
                        recursive-CTE equivalent
                        (Services/CallPathTracerService.cs:407-471)
- ``extract_symbols`` — definition-site regex extraction
                        (Services/FileIndexingService.cs:81-105)
- ``path_components`` — T8 split+explode (FileIndexingService.cs:871-875)
- ``workspace_hash``  — T10 (PathResolutionService.cs:119-131)
- ``validate_index``  — S10 manifest-vs-data recount
                        (LuceneIndexService.cs:985-1066)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import glob_to_regex


# --------------------------------------------------------- Q9/J6/F9

def file_match_score(filename, pattern: str):
    """F9 ladder (FileSearchTool.cs:410-448): exact 1.0 / exact-stem
    0.95 / starts-with 0.85 / ends-with 0.75 / contains 0.65 /
    glob-match 0.5 / fallback 0.3."""
    p = pattern.lower().strip("*?")
    fn = F.lower(filename)
    stem = F.regexp_replace(fn, r"\.[^.]*$", "")
    glob_re = glob_to_regex(pattern.lower())
    return (
        F.when(fn == pattern.lower(), F.lit(1.0))
        .when(stem == p, F.lit(0.95))
        .when(fn.startswith(p), F.lit(0.85))
        .when(fn.endswith(p), F.lit(0.75))
        .when(fn.contains(p), F.lit(0.65))
        .when(fn.rlike(glob_re), F.lit(0.5))
        .otherwise(F.lit(0.3))
    )


def file_search(
    docs: DataFrame, pattern: str, url_col: str = "url", k: int = 50
) -> DataFrame:
    """Glob file search over urls: filter by translated regex on the
    filename, rank by the F9 ladder."""
    filename = F.element_at(F.split(F.col(url_col), "/"), -1)
    regex = glob_to_regex(pattern.lower())
    return (
        docs.withColumn("filename", filename)
        .filter(F.lower(F.col("filename")).rlike(regex))
        .withColumn("match_score", file_match_score(F.col("filename"), pattern))
        .select(url_col, "filename", "match_score")
        .orderBy(F.desc("match_score"), F.asc(url_col))
        .limit(k)
    )


# --------------------------------------------------------------- A4

def line_search(
    docs: DataFrame,
    pattern: str,
    url_col: str = "url",
    text_col: str = "text",
    max_per_file: int = 10,
    case_sensitive: bool = False,
) -> DataFrame:
    """Per-line regex search: explode lines, filter, cap per file,
    return per-file counts + capped line lists + global total.

    Plan shape: explode -> filter (pushed next to the scan) ->
    window rank for the per-file cap -> groupBy — all built-ins.
    """
    from pyspark.sql import Window as W

    pat = pattern if case_sensitive else f"(?i){pattern}"
    lines = docs.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("line_no", "line"),
    ).filter(F.col("line").rlike(pat))
    w = W.partitionBy("url").orderBy("line_no")
    capped = lines.withColumn("_rn", F.row_number().over(w))
    return (
        capped.groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("_rn") <= max_per_file,
                        F.struct("line_no", "line"),
                    )
                )
            ).alias("lines"),
        )
        .withColumn("lines", F.slice("lines", 1, max_per_file))
        .orderBy("url")
    )


# --------------------------------------------------------------- O3

def recent_files(
    docs: DataFrame,
    timeframe: str = "2d",
    ts_col: str = "warc_ts",
    url_col: str = "url",
    k: int = 20,
    now=None,
) -> DataFrame:
    """T11 timeframe parse + O3 order-by-recency."""
    import datetime

    from .text import parse_timeframe_seconds

    secs = parse_timeframe_seconds(timeframe)
    if now is None:
        now = docs.agg(F.max(ts_col)).first()[0]
    cutoff = now - datetime.timedelta(seconds=secs)
    return (
        docs.filter(F.col(ts_col) >= F.lit(cutoff))
        .select(url_col, ts_col)
        .orderBy(F.desc(ts_col), F.asc(url_col))
        .limit(k)
    )


# -------------------------------------------------------------- Q17

def call_path_bfs(
    edges: DataFrame,
    start_ids: list,
    max_depth: int = 3,
    direction: str = "down",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """BFS over a directed edges table — the reference's recursive CTE
    (CallPathTracerService.cs:407-471) as an iterative frontier join.

    'down' follows src->dst (callees); 'up' follows dst->src
    (callers). Returns (node, depth, first_parent) with the minimum
    depth per node; the frontier is broadcast each level (it is small
    relative to the edges table — J4 in SURVEY §2.7).
    """
    if direction == "up":
        edges = edges.select(
            F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
        )
    else:
        edges = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))

    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [(x,) for x in start_ids], "node long"
    ).withColumn("depth", F.lit(0)).withColumn("parent", F.lit(None).cast("long"))
    visited = frontier
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(
                F.broadcast(frontier.select(F.col("node").alias("src"))), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.lit(depth).alias("depth"),
                F.col("src").alias("parent"),
            )
            .join(visited.select("node"), "node", "left_anti")
            .groupBy("node")
            .agg(F.min("depth").alias("depth"), F.min("parent").alias("parent"))
        ).cache()
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.orderBy("depth", "node")


# ------------------------------------------------------ T7/T8/T10

SYMBOL_DEF_RE = (
    r"\b(?:class|interface|struct|enum|function|def|func|fn)\s+(\w+)"
)


def extract_symbols(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """T7 definition-site extraction (distinct symbol names per doc)."""
    return docs.select(
        "*",
        F.array_distinct(
            F.regexp_extract_all(F.col(text_col), F.lit(SYMBOL_DEF_RE), 1)
        ).alias("symbols"),
    )


def path_components(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """T8: one row per (url, component)."""
    path = F.regexp_replace(F.col(url_col), r"^[a-z]+://[^/]*/", "")
    return docs.select(
        F.col(url_col),
        F.explode(F.filter(F.split(path, "/"), lambda x: x != F.lit(""))).alias(
            "component"
        ),
    )


def workspace_hash(url_col: str = "url"):
    """T10: SHA-256 of the normalized (lowercased) path, first 16 hex
    chars (PathResolutionService.cs:119-131 uses an 8-byte prefix)."""
    return F.substring(F.sha2(F.lower(F.col(url_col)), 256), 1, 16)


# -------------------------------------------------------------- A3/A6

def indexing_progress(spark) -> dict:
    """A5 LIVE metrics (reference: Services/IndexingMetricsService.cs —
    live per-batch progress and docs/sec while an index build runs).

    Spark-native form: a snapshot of the driver statusTracker's active
    jobs with per-stage task progress. Poll from a monitoring thread
    while IndexWriter.build runs; combine with index_stats(reader) for
    completed-wave docs/sec (manifest lineage). statusTracker is the
    supported driver-side API — registering a JVM SparkListener from
    PySpark would need a py4j callback server, which headless jobs
    (spark-submit --py-files) cannot rely on."""
    st = spark.sparkContext.statusTracker()
    jobs = []
    for jid in st.getActiveJobsIds():
        ji = st.getJobInfo(jid)
        if ji is None:
            continue
        stages = []
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is None:
                continue
            stages.append(
                {
                    "stage_id": sid,
                    "name": si.name,
                    "tasks": si.numTasks,
                    "active": si.numActiveTasks,
                    "completed": si.numCompletedTasks,
                    "failed": si.numFailedTasks,
                }
            )
        jobs.append({"job_id": jid, "status": ji.status, "stages": stages})
    return {"active_jobs": jobs}


def index_stats(reader) -> dict:
    """A3 index stats + A6 per-batch stats from manifest lineage
    (reference analog: IndexWorkspaceTool's summary + the per-batch
    metrics FileIndexingService logs): corpus totals plus per-wave
    docs / tokens / seconds / docs-per-sec."""
    corpus = reader.manifest.get_stats("corpus") or {}
    units = reader.manifest.stage("tokens")["units"]
    waves: dict[tuple, dict] = {}
    for unit in units.values():
        # group by the explicit wave_id the writer records per wave;
        # the metric-value triple is only a fallback for manifests
        # written before wave_id existed (it can collapse two waves
        # with coincidentally equal metrics — round-2 ADVICE)
        key = unit.get("wave_id") or (
            unit.get("wave_secs", 0.0),
            unit.get("wave_docs", 0),
            unit.get("wave_tokens", 0),
        )
        waves.setdefault(
            key,
            {
                "docs": unit.get("wave_docs", 0),
                "tokens": unit.get("wave_tokens", 0),
                "secs": unit.get("wave_secs", 0.0),
            },
        )
    for w in waves.values():
        w["docs_per_sec"] = round(w["docs"] / w["secs"], 2) if w["secs"] else None
    return {
        "n_docs": corpus.get("n_docs"),
        "n_terms": corpus.get("n_terms"),
        "total_tokens": corpus.get("total_tokens"),
        "avgdl": corpus.get("avgdl"),
        "n_chunks": len(units),
        "waves": list(waves.values()),
    }


# -------------------------------------------------------------- S11

def clear_index(root: str) -> None:
    """S11 standalone: drop every index table + the manifest (the
    reference's index-clear op, LuceneIndexService.cs ClearIndex path).
    Idempotent — a partially-cleared root clears the rest."""
    import os
    import shutil

    for d in ("tokens", "doclens", "dictionary", "postings"):
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    mf = os.path.join(root, "manifest.json")
    if os.path.exists(mf):
        os.remove(mf)


# -------------------------------------------------------------- S10

def repair_index(spark, root: str, cfg=None) -> dict:
    """S10 Fix path (reference: LuceneIndexService.cs:985-1066 —
    CheckIndex then rewrite broken segments): validate, and when the
    postings tier disagrees with the dictionary (missing/corrupt
    bucket partitions), drop ONLY the affected bucket partitions +
    their manifest units and re-run the postings stage over them.
    Tokens are never re-tokenized. Returns the post-repair report."""
    import os
    import shutil

    from ..index.store import IndexConfig, IndexReader, IndexWriter

    reader = IndexReader(spark, root)
    report = validate_index(reader)
    if report["ok"]:
        return {"repaired": False, "report": report}

    from pyspark.sql import functions as F2

    dictionary = spark.read.parquet(os.path.join(root, "dictionary"))
    postings_path = os.path.join(root, "postings")
    postings = spark.read.parquet(postings_path)
    bad_buckets = sorted(
        r["bucket"]
        for r in (
            postings.groupBy("term", "bucket")
            .agg(F2.sum("n").alias("df_blocks"))
            .join(dictionary.select("term", "df"), "term", "full")
            .filter(
                F2.coalesce(F2.col("df_blocks"), F2.lit(-1))
                != F2.coalesce(F2.col("df"), F2.lit(-2))
            )
            .select(
                F2.coalesce(
                    F2.col("bucket"),
                    F2.pmod(
                        F2.xxhash64("term"), F2.lit(reader.n_buckets)
                    ).cast("int"),
                ).alias("bucket")
            )
            .distinct()
            .collect()
        )
    )
    if cfg is None:
        saved = reader.manifest.get_stats("config")
        cfg = IndexConfig(**saved) if saved else IndexConfig(field=reader.field)
    w = IndexWriter(spark, root, cfg)
    for b in bad_buckets:
        shutil.rmtree(os.path.join(postings_path, f"bucket={b}"), ignore_errors=True)
        w.manifest.stage("postings")["units"].pop(str(b), None)
    w.manifest.commit()
    w.postings_stage()
    return {
        "repaired": True,
        "buckets": bad_buckets,
        "report": validate_index(IndexReader(spark, root)),
    }


def validate_index(reader) -> dict:
    """S10 CheckIndex analog: recount docs/terms/postings from data
    files and compare against manifest metrics. Returns a report dict
    with ok flag + any mismatches."""
    import os

    spark = reader.spark
    corpus = reader.manifest.get_stats("corpus")
    report = {"ok": True, "checks": {}}

    doclens = spark.read.parquet(os.path.join(reader.root, "doclens"))
    n_docs = doclens.count()
    report["checks"]["n_docs"] = {"manifest": corpus["n_docs"], "actual": n_docs}
    if n_docs != corpus["n_docs"]:
        report["ok"] = False

    dictionary = spark.read.parquet(os.path.join(reader.root, "dictionary"))
    n_terms = dictionary.count()
    report["checks"]["n_terms"] = {"manifest": corpus["n_terms"], "actual": n_terms}
    if n_terms != corpus["n_terms"]:
        report["ok"] = False

    postings = spark.read.parquet(os.path.join(reader.root, "postings"))
    # per-term df from blocks must equal the dictionary
    df_from_blocks = postings.groupBy("term").agg(F.sum("n").alias("df_blocks"))
    mismatches = (
        df_from_blocks.join(dictionary.select("term", "df"), "term", "full")
        .filter(
            F.coalesce(F.col("df_blocks"), F.lit(-1))
            != F.coalesce(F.col("df"), F.lit(-2))
        )
        .count()
    )
    report["checks"]["df_consistency"] = {"mismatched_terms": mismatches}
    if mismatches:
        report["ok"] = False

    # token conservation: sum(tf) over blocks == sum(dl) over docs
    total_dl = doclens.agg(F.sum("dl")).first()[0] or 0
    report["checks"]["total_tokens"] = {
        "manifest": corpus["total_tokens"],
        "doclens": int(total_dl),
    }
    if int(total_dl) != corpus["total_tokens"]:
        report["ok"] = False
    return report
