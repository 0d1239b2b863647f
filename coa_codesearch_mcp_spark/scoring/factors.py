"""Multi-factor re-scoring — ports of the reference's IScoringFactor
plug-ins (Scoring/*.cs), expressed as JVM-side Spark column
expressions over the candidate set (no Python in the scoring path).

Composition (MultiFactorScoreQuery.GetScore, Scoring/
MultiFactorScoreQuery.cs:187-224 — the GetScore blend, not the
divergent Explain blend):

    final = 0.6 * base + 0.4 * (sum(w_i * f_i) / sum(w_i))

Input-domain mapping (web pages instead of files): ``url`` supplies
relativePath (the path after the host), filename (last segment) and
extension; ``warc_ts`` supplies the modification time (our spec FIXES
the reference's RecencyBoost field-name bug where ``lastModified`` is
read but never written — documented divergence, SURVEY §4.3).

All scores are computed over the top-k candidate set only (a few
rows), after the broadcast join that materializes url/text — never
over the full corpus.
"""

from __future__ import annotations

import math
import re
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# factor weights (each factor's Weight property)
WEIGHTS = {
    "exact_match": 1.0,     # ExactMatchBoostFactor.cs:16
    "path_relevance": 0.7,  # PathRelevanceFactor.cs:18
    "filename": 0.8,        # FilenameRelevanceFactor.cs:13
    "file_type": 0.4,       # FileTypeRelevanceFactor.cs:15
    "recency": 0.3,         # RecencyBoostFactor.cs:15
    "interface_impl": 0.3,  # InterfaceImplementationFactor.cs:15
}

_DIRECTORY_WEIGHTS = {
    "src": 1.0, "source": 1.0, "lib": 0.9, "core": 0.9, "main": 0.9,
    "app": 0.8, "services": 0.8, "models": 0.8, "controllers": 0.8,
    "views": 0.7, "utilities": 0.7, "helpers": 0.7,
    "test": 0.4, "tests": 0.4, "spec": 0.4, "specs": 0.4,
    "examples": 0.3, "samples": 0.3, "demo": 0.3,
    "docs": 0.2, "documentation": 0.2,
    "node_modules": 0.1, "packages": 0.1, "bin": 0.1, "obj": 0.1,
    "debug": 0.1, "release": 0.1, "temp": 0.1, "tmp": 0.1,
    "cache": 0.1, "backup": 0.1,
}
_PREFERRED = {
    "services", "models", "controllers", "core", "domain",
    "infrastructure", "application", "business", "logic", "handlers",
    "managers",
}
_DEPRIORITIZED = {
    ".git", ".vs", ".vscode", ".idea", "node_modules", "packages",
    "bin", "obj", "dist", "build", "out", "target",
}

_EXT_WEIGHTS = {
    ".cs": 1.0, ".ts": 1.0, ".js": 0.95, ".tsx": 0.95, ".jsx": 0.95,
    ".py": 1.0, ".java": 1.0, ".cpp": 1.0, ".c": 0.95, ".go": 1.0,
    ".rs": 1.0, ".kt": 1.0, ".swift": 1.0,
    ".html": 0.7, ".css": 0.7, ".scss": 0.7, ".vue": 0.85,
    ".razor": 0.9, ".cshtml": 0.85,
    ".json": 0.6, ".xml": 0.6, ".yaml": 0.6, ".yml": 0.6,
    ".config": 0.6, ".ini": 0.5, ".env": 0.5,
    ".csproj": 0.7, ".sln": 0.6, ".proj": 0.6, ".props": 0.6,
    ".targets": 0.6,
    ".md": 0.4, ".txt": 0.3, ".rst": 0.4, ".adoc": 0.4,
    ".sh": 0.7, ".ps1": 0.7, ".bat": 0.6, ".cmd": 0.6,
    ".sql": 0.8,
    ".dll": 0.1, ".exe": 0.1, ".pdb": 0.1, ".obj": 0.1, ".cache": 0.1,
}
_CONTEXT_EXTS = {
    "config": {".json", ".xml", ".yaml", ".yml", ".config", ".ini", ".env"},
    "configuration": {".json", ".xml", ".yaml", ".yml", ".config", ".ini", ".env"},
    "settings": {".json", ".xml", ".yaml", ".yml", ".config", ".ini", ".env"},
    "style": {".css", ".scss", ".sass", ".less"},
    "styles": {".css", ".scss", ".sass", ".less"},
    "css": {".css", ".scss", ".sass", ".less"},
    "view": {".html", ".cshtml", ".razor", ".vue", ".jsx", ".tsx"},
    "views": {".html", ".cshtml", ".razor", ".vue", ".jsx", ".tsx"},
    "ui": {".html", ".cshtml", ".razor", ".vue", ".jsx", ".tsx", ".xaml"},
    "test": {".cs", ".ts", ".js", ".py", ".java"},
    "tests": {".cs", ".ts", ".js", ".py", ".java"},
    "spec": {".cs", ".ts", ".js", ".py", ".java"},
    "sql": {".sql"},
    "database": {".sql"},
    "query": {".sql"},
    "script": {".sh", ".ps1", ".bat", ".cmd", ".py", ".js"},
    "scripts": {".sh", ".ps1", ".bat", ".cmd", ".py", ".js"},
    "doc": {".md", ".txt", ".rst", ".adoc"},
    "docs": {".md", ".txt", ".rst", ".adoc"},
    "documentation": {".md", ".txt", ".rst", ".adoc"},
    "readme": {".md", ".txt", ".rst"},
}

_STABLE_EXTS = {".md", ".json", ".xml", ".config", ".yaml", ".yml"}
_ARTIFACT_EXTS = {".dll", ".exe", ".pdb", ".obj"}


# ------------------------------------------------ derived url columns

def path_cols(url_col: str = "url") -> dict[str, Column]:
    """relativePath / filename / stem / extension derived from url."""
    path = F.regexp_replace(F.col(url_col), r"^[a-z]+://[^/]*/", "")
    filename = F.element_at(F.split(path, "/"), -1)
    stem = F.regexp_replace(filename, r"\.[^.]*$", "")
    ext = F.lower(
        F.when(
            filename.rlike(r"\.[^.]+$"),
            F.regexp_extract(filename, r"(\.[^.]+)$", 1),
        ).otherwise(F.lit(""))
    )
    return {"rel_path": path, "filename": filename, "stem": stem, "extension": ext}


# ------------------------------------------------------------ factors

def _clean_query_for_exact(query_text: str) -> str | None:
    q = query_text.strip()
    for op in ("AND", "OR", "NOT"):
        if op in q:
            parts = [p for p in re.split(r"AND|OR|NOT", q) if p.strip()]
            q = parts[0].strip() if parts else ""
            break
    q = q.strip("\"'").replace("*", "").replace("?", "").rstrip("~")
    return q if q.strip() else None


def exact_match_boost(query_text: str, text_col: str = "text",
                      filename_col: Column | None = None) -> Column:
    """F1 (ExactMatchBoostFactor.cs:24-103): min(1, log10(1+matches))
    of word-boundary matches, +0.3 if the filename matches."""
    clean = _clean_query_for_exact(query_text)
    if clean is None:
        return F.lit(0.0)
    pat = r"(?i)\b" + re.escape(clean) + r"\b"
    matches = F.regexp_count(F.col(text_col), F.lit(pat))
    score = F.least(
        F.lit(1.0), F.log10(matches.cast("double") + 1.0)
    )
    score = F.when(matches == 0, F.lit(0.0)).otherwise(score)
    if filename_col is not None:
        fmatch = F.regexp_count(filename_col, F.lit(pat)) > 0
        score = F.when(
            (matches > 0) & fmatch, F.least(F.lit(1.0), score + 0.3)
        ).otherwise(score)
    return score


def path_relevance(query_text: str, rel_path: Column, filename: Column) -> Column:
    """F2 (PathRelevanceFactor.cs:76-211)."""
    parts = F.filter(F.split(rel_path, r"[/\\]"), lambda p: p != F.lit(""))
    lower_parts = F.transform(parts, F.lower)
    dirs = F.slice(lower_parts, 1, F.greatest(F.size(lower_parts) - 1, F.lit(0)))

    depri = F.exists(lower_parts, lambda p: p.isin(*[F.lit(x) for x in _DEPRIORITIZED]))

    fn = F.lower(filename)
    is_test_file = (
        fn.contains("test") | fn.contains("spec")
    )
    has_test_dir = F.exists(
        lower_parts, lambda p: p.contains("test") | p.contains("spec")
    )
    is_test_related = is_test_file | has_test_dir

    query_has_test = "test" in query_text.lower()
    base_score = F.when(
        is_test_related & F.lit(not query_has_test), F.lit(0.15)
    ).otherwise(F.lit(1.0))

    wmap = F.create_map(
        *[x for kv in _DIRECTORY_WEIGHTS.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    path_score = F.aggregate(
        dirs,
        F.lit(1.0),
        lambda acc, p: F.when(
            wmap[p].isNotNull() & (wmap[p] < 0.5), acc * wmap[p]
        )
        .when(wmap[p].isNotNull(), F.greatest(acc, wmap[p]))
        .when(
            p.isin(*[F.lit(x) for x in _PREFERRED]), F.greatest(acc, F.lit(0.9))
        )
        .otherwise(acc),
    )

    lower_path = F.lower(rel_path)
    prod_pattern = (
        lower_path.contains("/services/")
        | lower_path.contains("/controllers/")
        | lower_path.contains("/models/")
        | lower_path.contains("/core/")
        | lower_path.contains("/domain/")
        | lower_path.contains("/infrastructure/")
        | (fn.endswith("service.cs") & ~fn.contains("mock") & ~fn.contains("test"))
        | (fn.endswith("controller.cs") & ~fn.contains("mock") & ~fn.contains("test"))
        | (fn.endswith("repository.cs") & ~fn.contains("mock") & ~fn.contains("test"))
    )
    path_score = F.when(prod_pattern, path_score * 1.2).otherwise(path_score)

    depth = F.size(lower_parts)
    depth_factor = F.when(
        is_test_related,
        F.greatest(F.lit(0.5), 1.0 - (depth - 2) * 0.1),
    ).otherwise(F.greatest(F.lit(0.8), 1.0 - (depth - 2) * 0.05))

    final = base_score * path_score * depth_factor
    final = F.least(F.lit(1.0), F.greatest(F.lit(0.05), final))
    final = F.when(depri, F.lit(0.1)).otherwise(final)
    return F.when(rel_path.isNull() | (rel_path == ""), F.lit(0.5)).otherwise(final)


def _extract_terms(query_text: str) -> list[str]:
    q = query_text.lower()
    for op in (" and ", " or ", " not "):
        q = q.replace(op, " ")
    for c in "*?~\"'":
        q = q.replace(c, "")
    terms = [t for t in re.split(r"[ \-_]+", q.strip()) if len(t) > 1]
    return list(dict.fromkeys(terms))


def filename_relevance(query_text: str, filename: Column, stem: Column) -> Column:
    """F3 (FilenameRelevanceFactor.cs:13-100)."""
    terms = _extract_terms(query_text)
    if not terms:
        return F.lit(0.0)
    clean_q = query_text.lower()
    for c in "*?~\"'":
        clean_q = clean_q.replace(c, "")
    clean_q = clean_q.strip()
    st = F.lower(stem)
    fn = F.lower(filename)

    all_match = F.lit(True)
    n_match = F.lit(0)
    any_prefix = F.lit(False)
    for t in terms:
        c = st.contains(t)
        all_match = all_match & c
        n_match = n_match + F.when(c, 1).otherwise(0)
        any_prefix = any_prefix | st.startswith(t)

    score = F.when(all_match, F.lit(0.8)).otherwise(
        n_match.cast("double") / len(terms) * 0.6
    )
    score = F.when(any_prefix, F.least(F.lit(1.0), score + 0.2)).otherwise(score)
    if "test" in terms:
        score = F.when(
            fn.contains("test") | fn.contains("spec"),
            F.least(F.lit(1.0), score + 0.3),
        ).otherwise(score)
    if "interface" in terms:
        is_iface = filename.rlike(r"^I[A-Z]")
        score = F.when(is_iface, F.least(F.lit(1.0), score + 0.3)).otherwise(score)
    return F.when(st == clean_q, F.lit(1.0)).otherwise(score)


def file_type_relevance(query_text: str, extension: Column) -> Column:
    """F4 (FileTypeRelevanceFactor.cs:15-200)."""
    q = query_text.lower()
    wmap = F.create_map(
        *[x for kv in _EXT_WEIGHTS.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    default = F.when(extension == "", F.lit(0.5)).when(
        wmap[extension].isNotNull(), wmap[extension]
    ).otherwise(F.lit(0.5))

    # contextual override: the reference iterates contexts in insertion
    # order; the FIRST query-matching context returns 0.9 (ext in set)
    # or base*0.5 (ext has a weight); otherwise later matching contexts
    # can still claim the ext via their sets.
    matching = [c for c in _CONTEXT_EXTS if c in q]
    if not matching:
        return default
    expr = F.when(
        extension.isin(*[F.lit(e) for e in _CONTEXT_EXTS[matching[0]]]),
        F.lit(0.9),
    ).when(wmap[extension].isNotNull(), wmap[extension] * 0.5)
    for ctx in matching[1:]:
        expr = expr.when(
            extension.isin(*[F.lit(e) for e in _CONTEXT_EXTS[ctx]]), F.lit(0.9)
        )
    return F.coalesce(expr, default)


def recency_boost(
    warc_ts: Column,
    extension: Column,
    reference_time: datetime | None = None,
    half_life_days: float = 7.0,
) -> Column:
    """F5 (RecencyBoostFactor.cs:15-93) over ``warc_ts`` (our spec
    fixes the reference's dead ``lastModified`` field read)."""
    ref = reference_time or datetime.now(timezone.utc)
    age_days = (
        F.lit(ref.timestamp()) - F.unix_timestamp(warc_ts).cast("double")
    ) / 86400.0
    lam = math.log(2) / half_life_days
    score = F.exp(-F.lit(lam) * age_days)
    score = F.when(
        extension.isin(*[F.lit(e) for e in _STABLE_EXTS]),
        score + (1.0 - score) * 0.3,
    ).when(
        extension.isin(*[F.lit(e) for e in _ARTIFACT_EXTS]), score * 0.5
    ).otherwise(
        F.when(age_days < 1.0, F.least(F.lit(1.0), score * 1.2)).otherwise(score)
    )
    score = F.greatest(F.lit(0.1), F.least(F.lit(1.0), score))
    return F.when(warc_ts.isNull(), F.lit(0.5)).when(
        age_days < 0, F.lit(0.5)
    ).otherwise(score)


def interface_implementation(
    query_text: str, filename: Column, rel_path: Column, text_col: str = "text"
) -> Column:
    """F6 (InterfaceImplementationFactor.cs:15-190). Neutral 0.5 unless
    the query looks like an interface name (I + uppercase, one term).
    NOTE: the reference's IsJustReference contains a self-contradictory
    condition and can never fire — kept faithful (never 0.4)."""
    q = query_text.strip()
    is_iface_search = (
        len(q) > 1 and q[0] == "I" and q[1].isupper() and " " not in q
    )
    if not is_iface_search:
        return F.lit(0.5)
    impl = q[1:]
    impl_lower = impl.lower()
    fn = F.lower(filename)
    path = F.lower(rel_path)
    content = F.lower(F.col(text_col))

    is_mock = (
        fn.contains("mock") | fn.contains("test") | fn.contains("fake")
        | fn.contains("stub") | path.contains("test") | path.contains("mock")
        | path.contains("spec") | content.contains("class mock")
        | content.contains("class test") | content.contains("class fake")
        | content.contains("[test") | content.contains("[fact")
    )
    filename_matches = fn.contains(impl_lower) & ~fn.contains("mock") & ~fn.contains("test")
    in_prod = (
        path.contains("services") | path.contains("domain") | path.contains("core")
        | path.contains("infrastructure") | path.contains("implementation")
        | (~path.contains("test") & ~path.contains("mock") & ~path.contains("spec"))
    )
    has_impl_pattern = (
        content.contains(f"class {impl.lower()}")
        | content.contains(f": {q.lower()}")
        | (content.contains("class ") & content.contains(q.lower()))
    )
    is_actual = filename_matches & in_prod & has_impl_pattern
    likely_fn = (
        fn.endswith("service.cs") | fn.endswith("repository.cs")
        | fn.endswith("manager.cs") | fn.endswith("handler.cs")
        | fn.endswith("provider.cs")
    )
    likely_prod = (
        path.contains("services") | path.contains("domain") | path.contains("core")
        | path.contains("infrastructure")
        | (~path.contains("test") & ~path.contains("mock"))
    )
    is_likely = likely_prod & likely_fn
    return (
        F.when(is_mock, F.lit(0.2))
        .when(is_actual, F.lit(1.0))
        .when(is_likely, F.lit(0.8))
        .otherwise(F.lit(0.5))
    )


# ----------------------------------------------------------- composer

def add_multi_factor_score(
    candidates: DataFrame,
    query_text: str,
    base_score_col: str = "score",
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str = "warc_ts",
    reference_time: datetime | None = None,
) -> DataFrame:
    """Attach f1..f6 and ``final_score = 0.6*base + 0.4*weighted_avg``.

    ``candidates`` must carry (base score, url, text, warc_ts) — i.e.
    the top-k hit set AFTER the broadcast join to the docs table.
    """
    pc = path_cols(url_col)
    df = (
        candidates.withColumn("rel_path", pc["rel_path"])
        .withColumn("filename", pc["filename"])
        .withColumn("stem", pc["stem"])
        .withColumn("extension", pc["extension"])
    )
    df = (
        df.withColumn(
            "f_exact_match",
            exact_match_boost(query_text, text_col, F.col("filename")),
        )
        .withColumn(
            "f_path_relevance",
            path_relevance(query_text, F.col("rel_path"), F.col("filename")),
        )
        .withColumn(
            "f_filename",
            filename_relevance(query_text, F.col("filename"), F.col("stem")),
        )
        .withColumn(
            "f_file_type", file_type_relevance(query_text, F.col("extension"))
        )
        .withColumn(
            "f_recency",
            recency_boost(F.col(ts_col), F.col("extension"), reference_time),
        )
        .withColumn(
            "f_interface_impl",
            interface_implementation(
                query_text, F.col("filename"), F.col("rel_path"), text_col
            ),
        )
    )
    total_w = sum(WEIGHTS.values())
    weighted = (
        F.col("f_exact_match") * WEIGHTS["exact_match"]
        + F.col("f_path_relevance") * WEIGHTS["path_relevance"]
        + F.col("f_filename") * WEIGHTS["filename"]
        + F.col("f_file_type") * WEIGHTS["file_type"]
        + F.col("f_recency") * WEIGHTS["recency"]
        + F.col("f_interface_impl") * WEIGHTS["interface_impl"]
    ) / total_w
    return df.withColumn(
        "final_score", F.col(base_score_col) * 0.6 + weighted * 0.4
    )
