"""Per-field analyzer chains (CodeAnalyzer.cs:30-105) and their
position-resolved output.

``analyze(field, text)`` returns the ordered list of emitted terms
(every emitted token counts toward tf, like Lucene); ``analyze_positions``
returns ``[(term, position), ...]`` with Lucene position semantics
(cumulative position increments starting at -1, synonym overlap at the
same position).
"""

from __future__ import annotations

from .code_tokenizer import (
    OP_IDENT,
    code_tokenize,
    standard_tokenize,
    whitespace_tokenize,
)
from .filters import apply_camel_case_filter, apply_length_filter

FIELD_CONTENT = "content"
FIELD_PATTERNS = "content_patterns"
FIELD_SYMBOLS = "content_symbols"

ANALYZERS = (FIELD_CONTENT, FIELD_PATTERNS, FIELD_SYMBOLS)


def _content_stream(text: str) -> list[tuple[str, str, int]]:
    # CodeTokenizer -> CamelCaseFilter -> LowerCase -> LengthFilter(1)
    stream = [(t, ty, 1) for t, ty in code_tokenize(text)]
    stream = apply_camel_case_filter(stream)
    stream = [(t.lower(), ty, incr) for t, ty, incr in stream]
    return apply_length_filter(stream, 1)


def _patterns_stream(text: str) -> list[tuple[str, str, int]]:
    # WhitespaceTokenizer -> LowerCase (no length filter)
    return [(t.lower(), OP_IDENT, 1) for t in whitespace_tokenize(text)]


def _symbols_stream(text: str) -> list[tuple[str, str, int]]:
    # StandardTokenizer -> CamelCaseFilter -> LowerCase -> LengthFilter(2)
    stream = [(t, OP_IDENT, 1) for t in standard_tokenize(text)]
    stream = apply_camel_case_filter(stream)
    stream = [(t.lower(), ty, incr) for t, ty, incr in stream]
    return apply_length_filter(stream, 2)


_CHAINS = {
    FIELD_CONTENT: _content_stream,
    FIELD_PATTERNS: _patterns_stream,
    FIELD_SYMBOLS: _symbols_stream,
}


def analyze(field: str, text: str) -> list[str]:
    """Terms emitted by the chain for ``field`` (tf = multiplicity)."""
    chain = _CHAINS.get(field, _content_stream)
    return [t for t, _, _ in chain(text)]


def analyze_positions(field: str, text: str) -> list[tuple[str, int]]:
    """(term, position) with Lucene cumulative-increment positions."""
    chain = _CHAINS.get(field, _content_stream)
    out: list[tuple[str, int]] = []
    pos = -1
    for term, _, incr in chain(text):
        pos += incr
        out.append((term, pos))
    return out
