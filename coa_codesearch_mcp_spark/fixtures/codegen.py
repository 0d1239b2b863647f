"""Deterministic synthetic code corpus for the symbol tier.

The driver's webtext corpus contains no definition sites, so the
symbol-search / find-references / goto-definition operators (reference:
SymbolSearchTool.cs, FindReferencesTool.cs, GoToDefinitionTool.cs)
are exercised over this generated mini-codebase instead. The SAME
rows feed both the Spark DataFrame and the DuckDB oracle (as a VALUES
CTE), so correctness is still checked end-to-end by the driver.

Everything is seeded and pure-python — no I/O, no randomness at query
time beyond random.Random(seed).
"""

from __future__ import annotations

import random

_CLASS_NAMES = [
    "UserService", "OrderController", "CacheManager", "IndexWriter",
    "QueryPlanner", "TokenFilter", "BatchScheduler", "MetricsSink",
    "ConfigLoader", "SessionStore",
]
_IFACE_NAMES = ["ISearchable", "IDisposable", "IRenderer", "IVisitor"]
_FUNC_NAMES = [
    "parse_config", "load_index", "merge_segments", "score_hits",
    "flush_cache", "resolve_path",
]
_VAR_WORDS = ["result", "items", "buffer", "options", "payload", "ctx"]


def generate_code_lines(n_docs: int = 40, seed: int = 13) -> list[tuple]:
    """Rows of (doc_id, path, line_no, line) for a deterministic
    mini-codebase mixing definition sites and usage sites."""
    rng = random.Random(seed)
    rows: list[tuple] = []
    for d in range(n_docs):
        cls = rng.choice(_CLASS_NAMES)
        iface = rng.choice(_IFACE_NAMES)
        fn = rng.choice(_FUNC_NAMES)
        other = rng.choice([c for c in _CLASS_NAMES if c != cls])
        var = rng.choice(_VAR_WORDS)
        ext = rng.choice(["cs", "ts", "py", "java"])
        path = f"src/{cls.lower()}/{fn}_{d:03d}.{ext}"
        lines = [f"import {other}"]
        if ext == "py":
            lines += [
                f"class {cls}:",
                f"    def {fn}(self, {var}):",
                f"        {var} = {other}.lookup({var})",
                f"        return new_{var}",
            ]
        elif ext == "ts":
            lines += [
                f"export class {cls} extends {other} implements {iface} {{",
                f"  {fn}({var}: {other}): {iface} {{",
                f"    const x = new {other}();",
                f"    return {other}.wrap(x) as {iface};",
                "  }",
                "}",
            ]
        else:
            lines += [
                f"public class {cls} : {iface} {{",
                f"  public {other} {fn}(int {var}) {{",
                f"    var x = new {other}();",
                f"    if (x is {iface}) return ({other})x;",
                f"    return {other}.Default;",
                "  }",
                "}",
            ]
        if rng.random() < 0.5:
            lines.append(f"// see {cls} for details")
        if rng.random() < 0.4:
            lines.append(f"interface {iface} {{ }}")
        if d % 7 == 0:
            # TWO definition sites on one line: pins the
            # all-matches-per-line extraction path (regexp_extract_all
            # + explode vs a first-match-only regexp_extract) on both
            # the Spark side and the DuckDB oracle
            lines.append(
                f"interface {iface}Inline {{}} "
                f"class {cls}Inline implements {iface}Inline {{}}"
            )
        for i, line in enumerate(lines):
            rows.append((d, path, i, line))
    return rows


def code_lines_sql_values(rows: list[tuple] | None = None) -> str:
    """The same rows as a DuckDB CTE body:
    ``code_lines(doc_id, path, line_no, line) AS (VALUES ...)``."""
    if rows is None:
        rows = generate_code_lines()
    vals = ",\n".join(
        "({}, '{}', {}, '{}')".format(
            d, p.replace("'", "''"), n, l.replace("'", "''")
        )
        for d, p, n, l in rows
    )
    return (
        "code_lines(doc_id, path, line_no, line) AS (\n  SELECT * FROM (VALUES\n"
        + vals
        + "\n  )\n)"
    )
