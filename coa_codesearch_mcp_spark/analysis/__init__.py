"""Analyzer chains — the per-row tokenization invariant.

Reference behavior: Services/Analysis/CodeAnalyzer.cs (Lucene.NET 4.8
custom analyzer). Three per-field chains:

- ``content``          : CodeTokenizer -> CamelCaseFilter -> LowerCase -> CodeLengthFilter(min=1)
- ``content_patterns`` : WhitespaceTokenizer -> LowerCase
- ``content_symbols``  : StandardTokenizer -> CamelCaseFilter -> LowerCase -> CodeLengthFilter(min=2)

(CodeAnalyzer.cs:30-39 field switch; chains at :41-105.)
"""

from .chains import ANALYZERS, analyze, analyze_positions
from .code_tokenizer import code_tokenize
from .filters import camel_case_split, split_camel_pattern

__all__ = [
    "ANALYZERS",
    "analyze",
    "analyze_positions",
    "code_tokenize",
    "camel_case_split",
    "split_camel_pattern",
]
