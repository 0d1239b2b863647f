"""Symbol tier: symbols table + tiered symbol search, find-references,
goto-definition, and the F8 confidence ladder.

Reference analogs:
- symbols table + Tier-1 exact lookup: SQLiteSymbolService.cs:293-296
  (``WHERE name = @name COLLATE NOCASE``) behind
  SymbolSearchTool.cs:112-176's tiered facade;
- Tier-2/3 fallback: SymbolSearchTool.cs:176-336 (Lucene content_
  symbols + parallel semantic) — re-expressed as a BM25 search over
  the symbol corpus with the semantic supplement left to the engine
  facade (query/engine.py);
- find_references: FindReferencesTool.cs:353-374 (12-pattern OR
  query), :376-398 (strict mode MUST content / MUST_NOT type_names),
  :448-480 (DetermineReferenceType ladder);
- goto_definition: GoToDefinitionTool.cs (definition-site lookup over
  extracted symbols, exact-case preferred);
- confidence: ConfidenceCalculatorService.cs:42-77 (base ladder),
  :85-116 (context bonus), :118-145 (filename bonus).

Everything is column expressions over a lines table
(doc_id, path, line_no, line) — no UDFs, no driver loops; each
operator is one filter+project (+ at most one aggregation), so the
plan at 10^12 lines is scan -> pushed filter -> top-k.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# kind + name in one pass; kinds mirror tools_ops.SYMBOL_DEF_RE
SYMBOL_KIND_NAME_RE = (
    r"\b(class|interface|struct|enum|function|def|func|fn)\s+(\w+)"
)


def build_symbols_table(lines: DataFrame) -> DataFrame:
    """(doc_id, path, line_no, line) -> one row per definition site:
    (doc_id, path, line_no, line, kind, name). Extraction is the T7
    regex with the kind keyword captured alongside the name."""
    kinds = F.regexp_extract_all(F.col("line"), F.lit(SYMBOL_KIND_NAME_RE), 1)
    names = F.regexp_extract_all(F.col("line"), F.lit(SYMBOL_KIND_NAME_RE), 2)
    return (
        lines.withColumn("kn", F.arrays_zip(kinds.alias("kind"), names.alias("name")))
        .withColumn("kn", F.explode("kn"))
        .select(
            "doc_id",
            "path",
            "line_no",
            "line",
            F.col("kn.kind").alias("kind"),
            F.col("kn.name").alias("name"),
        )
    )


# ------------------------------------------------------------- F8


def confidence_col(
    line: Column,
    query: str,
    file_name: Column | None = None,
    symbol_type: str | None = None,
) -> Column:
    """ConfidenceCalculatorService.cs:42-77 as one expression ladder.

    base: 0.90 definition line / 0.75 word-boundary match / 0.50
    contains / 0.25 first-3-chars partial / 0.10 floor; bonuses:
    comment -0.20, usage-pattern +0.10 (when symbol_type given),
    not-in-string-literal +0.05; filename: equal-stem +0.15 /
    contains +0.10 / query-contains-stem +0.05. min(1.0), round 2.
    """
    q = re.escape(query)
    clean = F.trim(line)
    is_def = clean.rlike(
        rf"(?i)\b(class|interface|struct|enum|function|def|func|fn)\s+{q}\b"
    )
    word = clean.rlike(rf"(?i)\b{q}\b")
    contains = F.contains(F.lower(clean), F.lit(query.lower()))
    partial = F.contains(F.lower(clean), F.lit(query[:3].lower()))
    base = (
        F.when(is_def, F.lit(0.90))
        .when(word, F.lit(0.75))
        .when(contains, F.lit(0.50))
        .when(partial, F.lit(0.25))
        .otherwise(F.lit(0.10))
    )

    is_comment = clean.rlike(r"^(//|/\*|\*|///)")
    bonus = F.when(is_comment, F.lit(-0.20)).otherwise(F.lit(0.0))
    if symbol_type:
        usage = {
            "instantiation": rf"(?i)\bnew\s+{q}\s*\(",
            "variable": rf"(?i)\b\w+\s+{q}\s*[=;]",
            "method_call": rf"(?i)\w+\.{q}\s*\(",
            "inheritance": rf"(?i):\s*{q}",
        }.get(symbol_type.lower())
        if usage:
            bonus = bonus + F.when(clean.rlike(usage), F.lit(0.10)).otherwise(
                F.lit(0.0)
            )
    # not inside a string literal: odd quote count before is the
    # reference's heuristic; per-line parity = odd total quote count
    dq = F.length(clean) - F.length(F.regexp_replace(clean, '"', ""))
    bonus = bonus + F.when(dq % 2 == 0, F.lit(0.05)).otherwise(F.lit(0.0))

    fname_bonus = F.lit(0.0)
    if file_name is not None:
        stem = F.regexp_replace(
            F.element_at(F.split(file_name, "/"), -1), r"\.[^.]*$", ""
        )
        fname_bonus = (
            F.when(F.lower(stem) == query.lower(), F.lit(0.15))
            .when(F.contains(F.lower(stem), F.lit(query.lower())), F.lit(0.10))
            .when(
                F.lit(query.lower()).contains(F.lower(stem)) & (F.length(stem) > 0),
                F.lit(0.05),
            )
            .otherwise(F.lit(0.0))
        )
    return F.round(F.least(base + bonus + fname_bonus, F.lit(1.0)), 2)


# -------------------------------------------------- tiered search


def symbol_search(
    lines: DataFrame,
    name: str,
    k: int = 10,
    symbols: DataFrame | None = None,
) -> DataFrame:
    """Tiered facade (SymbolSearchTool.cs:112-176): Tier 1 exact
    case-insensitive lookup against the symbols table; on miss, Tier 2
    word-boundary scan over the content ranked by the confidence
    ladder (the Lucene-fuzzy stand-in — same field routing the engine
    facade uses for real BM25 when an index exists).

    Returns (doc_id, path, line_no, kind, name, confidence)."""
    if symbols is None:
        symbols = build_symbols_table(lines)
    tier1 = symbols.filter(F.lower(F.col("name")) == name.lower()).select(
        "doc_id",
        "path",
        "line_no",
        "kind",
        "name",
        confidence_col(F.col("line"), name, file_name=F.col("path")).alias(
            "confidence"
        ),
    )
    if len(tier1.take(1)) > 0:
        return tier1.orderBy(
            F.desc("confidence"), "path", "line_no", "name"
        ).limit(k)
    q = re.escape(name)
    tier2 = (
        lines.filter(F.col("line").rlike(rf"(?i)\b{q}\b"))
        .select(
            "doc_id",
            "path",
            "line_no",
            F.lit("reference").alias("kind"),
            F.lit(name).alias("name"),
            confidence_col(F.col("line"), name, file_name=F.col("path")).alias(
                "confidence"
            ),
        )
    )
    return tier2.orderBy(F.desc("confidence"), "path", "line_no").limit(k)


# ---------------------------------------------- find references


# BuildReferenceQueryString's 12 usage patterns
# (FindReferencesTool.cs:353-374); {s} is the symbol
REFERENCE_PATTERNS = [
    "{s}", "new {s}", ": {s}", "extends {s}", "implements {s}",
    "{s}.", "<{s}>", "{s}[]", "typeof {s}", "is {s}", "as {s}", "({s})",
]

# DetermineReferenceType ladder (FindReferencesTool.cs:448-480) in
# declaration order — FIRST match wins
_CLASSIFY = [
    ("instantiation", r"new\s+{q}"),
    ("inheritance", r":\s*{q}"),
    ("inheritance", r"extends\s+{q}"),
    ("implementation", r"implements\s+{q}"),
    ("static-access", r"{q}\."),
    ("generic-type", r"<{q}>"),
    ("import", r"import.*{q}"),
    ("using", r"using.*{q}"),
]


def classify_reference_col(line: Column, symbol: str) -> Column:
    q = re.escape(symbol)
    expr = F.lit("usage")
    for ref_type, pat in reversed(_CLASSIFY):
        expr = F.when(
            line.rlike("(?i)" + pat.format(q=q)), F.lit(ref_type)
        ).otherwise(expr)
    return expr


def find_references(
    lines: DataFrame,
    symbol: str,
    strict: bool = False,
    symbols: DataFrame | None = None,
    k: int = 100,
) -> DataFrame:
    """Usage sites of ``symbol`` with per-hit reference-type
    classification.

    Non-strict: any line matching the symbol at a word boundary (the
    12-pattern OR query's union — pattern 1, the bare symbol phrase,
    subsumes the other 11 at token level; they survive as the
    classification ladder). Strict: additionally MUST_NOT come from a
    doc whose type_names (extracted symbols) contain the symbol —
    definition files are excluded entirely
    (FindReferencesTool.cs:376-398)."""
    q = re.escape(symbol)
    hits = lines.filter(F.col("line").rlike(rf"(?i)\b{q}\b"))
    if strict:
        if symbols is None:
            symbols = build_symbols_table(lines)
        def_docs = symbols.filter(
            F.lower(F.col("name")) == symbol.lower()
        ).select("doc_id").distinct()
        hits = hits.join(def_docs, "doc_id", "left_anti")
    return (
        hits.select(
            "doc_id",
            "path",
            "line_no",
            "line",
            classify_reference_col(F.col("line"), symbol).alias("ref_type"),
        )
        .orderBy("doc_id", "line_no")
        .limit(k)
    )


# ---------------------------------------------- goto definition


def goto_definition(
    lines: DataFrame,
    name: str,
    symbols: DataFrame | None = None,
    k: int = 5,
) -> DataFrame:
    """Definition sites for ``name``: exact-case matches rank above
    case-insensitive ones, then by path/line (GoToDefinitionTool.cs —
    first exact definition wins)."""
    if symbols is None:
        symbols = build_symbols_table(lines)
    return (
        symbols.filter(F.lower(F.col("name")) == name.lower())
        .select(
            "doc_id",
            "path",
            "line_no",
            "kind",
            "name",
            (F.col("name") == name).cast("int").alias("case_exact"),
        )
        .orderBy(F.desc("case_exact"), "path", "line_no")
        .limit(k)
    )
