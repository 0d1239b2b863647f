"""Query AST — the planner's intermediate representation (IR #2 in the
reference's lifecycle, SURVEY §3.1: the Lucene Query tree built by
QueryPreprocessor.BuildQuery / QueryParser.Parse)."""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    pass


@dataclass
class TermQ(Query):
    term: str


@dataclass
class PhraseQ(Query):
    terms: list[str]
    slop: int = 0


@dataclass
class WildcardQ(Query):
    pattern: str


@dataclass
class FuzzyQ(Query):
    term: str
    max_edits: int = 2


@dataclass
class RegexpQ(Query):
    pattern: str


@dataclass
class MatchAllQ(Query):
    pass


@dataclass
class BoolQ(Query):
    """Flat boolean of term-level clauses (MUST / SHOULD / MUST_NOT).

    Scoring contract (Lucene-compatible): a doc matches iff it matches
    every MUST clause and no MUST_NOT clause; score = sum of BM25
    contributions of all matching MUST and SHOULD clauses.
    """

    must: list[Query] = field(default_factory=list)
    should: list[Query] = field(default_factory=list)
    must_not: list[Query] = field(default_factory=list)
