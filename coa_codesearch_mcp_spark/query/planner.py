"""Driver-side query planner — ports of the reference's preprocessors.

Three cooperating pieces (all pure Python, no Spark):

1. ``WildcardValidator`` — invalid-wildcard detection + sanitization
   (Services/Utils/WildcardValidator.cs).
2. ``smart_process`` — field routing + mode detection + safe escaping
   (Services/SmartQueryPreprocessor.cs:168-381): special chars ->
   content_patterns, code patterns / identifiers -> content_symbols,
   else content; symbol noise-word stripping; bracket escaping only
   when not valid range syntax.
3. ``build_query`` — query construction + rewrites
   (Services/QueryPreprocessor.cs:41-204): wildcard/fuzzy/phrase
   modes, regex ``.*``/``.+`` -> slop-20 phrase rewrite, inheritance
   ``A : B`` -> AND(A, B), bracket queries -> phrase, query validation
   (min 3 chars except allowed 2-char operators).

Pinned parser spec (documented divergence): an unquoted chunk whose
analysis yields multiple tokens becomes an OR group of those tokens;
chunks combine with the default operator AND. (Lucene's classic
parser builds per-position synonym queries; our flat OR keeps the
same candidate set.)
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum

from ..analysis.chains import (
    FIELD_CONTENT,
    FIELD_PATTERNS,
    FIELD_SYMBOLS,
    analyze,
)
from .ast import BoolQ, FuzzyQ, PhraseQ, Query, RegexpQ, TermQ, WildcardQ


class SearchMode(str, Enum):
    AUTO = "auto"
    STANDARD = "standard"
    SYMBOL = "symbol"
    PATTERN = "pattern"
    FUZZY = "fuzzy"
    EXACT = "exact"
    REGEX = "regex"
    WILDCARD = "wildcard"
    SEMANTIC = "semantic"


# ---------------------------------------------------------------------
# WildcardValidator port
# ---------------------------------------------------------------------

class WildcardValidator:
    @staticmethod
    def is_invalid(query: str) -> bool:
        if not query or not query.strip():
            return False
        q = query.strip()
        if q.startswith("*") or q.startswith("?"):
            return True
        if not q.replace("*", "").replace("?", "").strip():
            return True
        return False

    @staticmethod
    def sanitize(query: str) -> str | None:
        if not query or not query.strip():
            return query
        q = query.strip()
        while q.startswith("*") or q.startswith("?"):
            q = q[1:].strip()
        if not q or not q.replace("*", "").replace("?", "").strip():
            return None
        return q


# ---------------------------------------------------------------------
# SmartQueryPreprocessor port (field routing)
# ---------------------------------------------------------------------

_SPECIAL_CHARS = re.compile(r"[{}()\[\]<>\"':;,\.!@#$%^&*+=|\\~`]")
_CODE_PATTERN = re.compile(
    r"\b(class|interface|struct|enum|function|def|func|fn|method|var|let|const)\b"
    r"|\w+\.\w+|\w+::\w+",
    re.IGNORECASE,
)
_SYMBOL = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_CAMEL = re.compile(r"[A-Z][a-z]+|[a-z]+[A-Z]")
_RANGE_SYNTAX = re.compile(r"[\[\{][^\[\]{}]*\s+TO\s+[^\[\]{}]*[\]\}]", re.IGNORECASE)
_NOISE_WORDS = ("class", "interface", "method", "function", "def", "var", "let", "const")


@dataclass
class QueryPlan:
    processed_query: str
    target_field: str
    detected_mode: SearchMode
    reason: str


# Q15: the reference's full Lucene special-char escape sets
# (QueryPreprocessor.cs:20-22, EscapeQueryText :206-221 and the
# wildcard/fuzzy variants :223-246). Brackets are deliberately NOT
# escaped by EscapeQueryText (the reference skips them; they go
# through _process_pattern_query's balanced-bracket handling instead).
LUCENE_SPECIAL_CHARS = list("+-=&|!(){}[]^\"~*?:\\/<>")
_ESCAPE_SKIP_ALWAYS = {"[", "]"}


def escape_query_text(query: str, keep: set[str] | None = None) -> str:
    """Escape every Lucene special character except brackets (and any
    in ``keep``). keep={'*','?'} is the wildcard variant, keep={'~'}
    the fuzzy variant (QueryPreprocessor.cs:206-246)."""
    keep = (keep or set()) | _ESCAPE_SKIP_ALWAYS
    out = query
    for c in LUCENE_SPECIAL_CHARS:
        if c in keep:
            continue
        out = out.replace(c, "\\" + c)
    return out


def escape_for_wildcard(query: str) -> str:
    return escape_query_text(query, keep={"*", "?"})


def escape_for_fuzzy(query: str) -> str:
    return escape_query_text(query, keep={"~"})


def _is_valid_bracket_syntax(query: str) -> bool:
    if _RANGE_SYNTAX.search(query):
        return True
    opens = sum(1 for c in query if c in "[{")
    closes = sum(1 for c in query if c in "]}")
    return opens == closes and opens == 0


def _process_pattern_query(query: str) -> str:
    processed = query.strip()
    if "[" in processed and not _is_valid_bracket_syntax(processed):
        processed = processed.replace("[", "\\[")
    if "]" in processed and not _is_valid_bracket_syntax(processed):
        processed = processed.replace("]", "\\]")
    return processed


def _process_symbol_query(query: str) -> str:
    processed = query.strip()
    for noise in _NOISE_WORDS:
        processed = re.sub(rf"\b{noise}\s+", "", processed, flags=re.IGNORECASE)
    return processed.strip()


def smart_process(user_query: str, mode: SearchMode = SearchMode.AUTO) -> QueryPlan:
    """Field routing (SmartQueryPreprocessor.Process)."""
    if not user_query or not user_query.strip():
        return QueryPlan(
            user_query or "", FIELD_CONTENT, SearchMode.STANDARD,
            "Empty query defaults to standard search",
        )
    if WildcardValidator.is_invalid(user_query):
        sanitized = WildcardValidator.sanitize(user_query)
        if sanitized is None:
            return QueryPlan(
                user_query, FIELD_CONTENT, SearchMode.STANDARD,
                "Invalid wildcard pattern (pure wildcards cannot be processed)",
            )
        user_query = sanitized

    detected = _detect_mode(user_query) if mode == SearchMode.AUTO else mode
    if detected == SearchMode.PATTERN:
        return QueryPlan(
            _process_pattern_query(user_query), FIELD_PATTERNS, SearchMode.PATTERN,
            "Special characters detected - using pattern-preserving search with safe escaping",
        )
    if detected == SearchMode.SYMBOL:
        return QueryPlan(
            _process_symbol_query(user_query), FIELD_SYMBOLS, SearchMode.SYMBOL,
            "Symbol pattern detected - searching symbol-only field",
        )
    if detected == SearchMode.FUZZY:
        return QueryPlan(
            user_query.strip(), FIELD_CONTENT, SearchMode.STANDARD,
            "Fuzzy search not implemented - falling back to standard",
        )
    return QueryPlan(
        user_query.strip(), FIELD_CONTENT, SearchMode.STANDARD,
        "Standard search with current CodeAnalyzer",
    )


def _detect_mode(query: str) -> SearchMode:
    if _SPECIAL_CHARS.search(query):
        return SearchMode.PATTERN
    if _CODE_PATTERN.search(query) or _is_simple_symbol(query):
        return SearchMode.SYMBOL
    return SearchMode.STANDARD


def _is_simple_symbol(query: str) -> bool:
    return bool(
        _SYMBOL.match(query) or (_CAMEL.search(query) and " " not in query)
    )


# ---------------------------------------------------------------------
# QueryPreprocessor port (query building + rewrites + validation)
# ---------------------------------------------------------------------

ALLOWED_TWO_CHAR_OPERATORS = {
    "=>", "??", "?.", "::", "->", "+=", "-=", "*=", "/=",
    "==", "!=", ">=", "<=", "&&", "||", "<<", ">>",
}

_CODE_SYNTAX_MARKERS = (
    "[", "]", "{", "}", ":", "=>", "??", "&&", "||", "++", "--",
    "!=", "==", ">=", "<=",
)


def validate_query(query: str) -> tuple[bool, str | None]:
    """Q14 — min 3 chars except allowed 2-char operators
    (QueryPreprocessor.IsValidQuery)."""
    trimmed = query.strip()
    if len(trimmed) < 3:
        if len(trimmed) == 2 and trimmed in ALLOWED_TWO_CHAR_OPERATORS:
            return True, None
        return False, (
            "Query too short. Minimum 3 characters required "
            "(except for specific operators)."
        )
    return True, None


def _contains_code_syntax(query: str) -> bool:
    return any(m in query for m in _CODE_SYNTAX_MARKERS)


def _parse_default_and(query: str, field: str) -> Query:
    """Pinned mini-parser: whitespace chunks AND'ed; a chunk that
    analyzes to multiple tokens becomes an OR group; quoted spans
    become phrase queries."""
    must: list[Query] = []
    for chunk in _split_respecting_quotes(query):
        if chunk.startswith('"') and chunk.endswith('"') and len(chunk) >= 2:
            terms = analyze(field, chunk[1:-1])
            if terms:
                must.append(PhraseQ(terms))
            continue
        if "*" in chunk or "?" in chunk:
            # Lucene's parser (AllowLeadingWildcard) treats */? chunks
            # as wildcard queries over lowercased terms
            must.append(WildcardQ(chunk.replace("\\", "").lower()))
            continue
        terms = analyze(field, chunk.replace("\\", ""))
        if not terms:
            continue
        uniq = list(dict.fromkeys(terms))
        if len(uniq) == 1:
            must.append(TermQ(uniq[0]))
        else:
            must.append(BoolQ(should=[TermQ(t) for t in uniq]))
    if len(must) == 1:
        return must[0]
    return BoolQ(must=must)


def _split_respecting_quotes(query: str) -> list[str]:
    out, cur, in_q = [], [], False
    for ch in query:
        if ch == '"':
            in_q = not in_q
            cur.append(ch)
        elif ch.isspace() and not in_q:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def build_query(query_text: str, search_type: str, field: str = FIELD_CONTENT) -> Query:
    """QueryPreprocessor.BuildQuery port — search_type in
    {wildcard, fuzzy, phrase, regex, literal, code, standard}."""
    st = search_type.lower()
    if st == "wildcard":
        return WildcardQ(query_text.lower())
    if st == "fuzzy":
        return FuzzyQ(query_text.lower())
    if st == "phrase":
        terms = analyze(field, query_text)
        return PhraseQ(terms) if terms else BoolQ()
    if st == "regex":
        try:
            re.compile(query_text)
        except re.error:
            return _build_code_query(query_text, field)
        # ".*"/".+" patterns rewritten to slop-20 phrase
        # (QueryPreprocessor.cs:94-107) — rank-relevant, replicated
        if ".*" in query_text or ".+" in query_text:
            parts = re.split(r"\.\*|\.\+", query_text)
            if len(parts) == 2 and parts[0].strip() and parts[1].strip():
                return PhraseQ(
                    [parts[0].lower(), parts[1].lower()], slop=20
                )
        return RegexpQ(query_text.lower())
    if st in ("literal", "code"):
        return _build_code_query(query_text, field)
    return _parse_default_and(query_text, field)


def _build_code_query(query_text: str, field: str) -> Query:
    if _contains_code_syntax(query_text):
        # inheritance syntax "A : B" -> AND(A, B)
        if ":" in query_text and "::" not in query_text:
            parts = query_text.split(":")
            if len(parts) == 2:
                return BoolQ(
                    must=[
                        TermQ(parts[0].strip().lower()),
                        TermQ(parts[1].strip().lower()),
                    ]
                )
        # bracket/brace queries -> phrase over analyzed tokens
        if any(c in query_text for c in "[]{}"):
            terms = analyze(field, query_text)
            if terms:
                return PhraseQ(terms)
            return TermQ(query_text.lower())
        if query_text in ALLOWED_TWO_CHAR_OPERATORS:
            return TermQ(query_text.lower())
    return _parse_default_and(query_text, field)
