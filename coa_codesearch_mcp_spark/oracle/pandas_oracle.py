"""Single-node oracle: pure-Python inverted index + BM25 implementing
the SAME pinned spec as the Spark engine (SURVEY.md §5 — golden-file
philosophy of the reference's Tests/Integration golden-master suite).

Used by pytest to assert rank-identity of the distributed engine.
No Spark imports here.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass, field

from ..analysis.chains import FIELD_PATTERNS, analyze_positions
from ..query.bm25 import contrib_py


@dataclass
class OracleIndex:
    postings: dict = field(default_factory=dict)   # term -> {doc_id: tf}
    positions: dict = field(default_factory=dict)  # term -> {doc_id: [pos]}
    doclens: dict = field(default_factory=dict)    # doc_id -> dl
    n_docs: int = 0
    avgdl: float = 0.0


def build_oracle_index(
    docs: list[tuple[int, str]], analyzer: str = FIELD_PATTERNS
) -> OracleIndex:
    ix = OracleIndex()
    postings: dict[str, dict[int, int]] = defaultdict(dict)
    positions: dict[str, dict[int, list[int]]] = defaultdict(dict)
    for doc_id, text in docs:
        toks = analyze_positions(analyzer, text or "")
        ix.doclens[doc_id] = len(toks)
        counts = Counter(t for t, _ in toks)
        for term, tf in counts.items():
            postings[term][doc_id] = tf
            positions[term][doc_id] = sorted(
                p for t, p in toks if t == term
            )
    ix.postings = dict(postings)
    ix.positions = dict(positions)
    ix.n_docs = len(ix.doclens)
    ix.avgdl = (
        sum(ix.doclens.values()) / ix.n_docs if ix.n_docs else 0.0
    )
    return ix


def _score_docs(ix: OracleIndex, terms: list[str]) -> dict[int, float]:
    """Per-doc summed contributions, ascending term order (determinism)."""
    scores: dict[int, float] = defaultdict(float)
    for term in sorted(set(terms)):
        docs = ix.postings.get(term, {})
        df = len(docs)
        for doc_id, tf in docs.items():
            scores[doc_id] += contrib_py(
                tf, df, ix.doclens[doc_id], ix.n_docs, ix.avgdl
            )
    return scores


def topk(scores: dict[int, float], k: int) -> list[tuple[int, float]]:
    ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))
    return [(d, round(s, 4)) for d, s in ranked[:k]]


def search_or(ix: OracleIndex, terms: list[str], k: int = 10):
    return topk(_score_docs(ix, terms), k)


def search_and(ix: OracleIndex, terms: list[str], k: int = 10):
    terms = sorted(set(terms))
    scores = _score_docs(ix, terms)
    keep = {
        d: s
        for d, s in scores.items()
        if all(d in ix.postings.get(t, {}) for t in terms)
    }
    return topk(keep, k)


def search_not(ix: OracleIndex, terms: list[str], exclude: list[str], k: int = 10):
    scores = _score_docs(ix, terms)
    banned = set()
    for t in set(exclude):
        banned |= set(ix.postings.get(t, {}))
    return topk({d: s for d, s in scores.items() if d not in banned}, k)


def search_phrase(ix: OracleIndex, terms: list[str], k: int = 10, slop: int = 0):
    """Same pinned sloppy-phrase spec as the engine."""
    n = len(terms)
    cand: dict[int, int] = {}
    first = ix.positions.get(terms[0], {})
    max_span = (n - 1) + slop
    for doc_id, starts in first.items():
        if not all(doc_id in ix.positions.get(t, {}) for t in terms[1:]):
            continue
        count = 0
        for start in starts:
            prev = start
            ok = True
            for t in terms[1:]:
                lst = ix.positions[t][doc_id]
                nxt = next(
                    (q for q in lst if q > prev and q - start <= max_span), None
                )
                if nxt is None:
                    ok = False
                    break
                prev = nxt
            if ok:
                count += 1
        if count:
            cand[doc_id] = count
    phrase_df = len(cand) or 1
    scores = {
        d: contrib_py(tf, phrase_df, ix.doclens[d], ix.n_docs, ix.avgdl)
        for d, tf in cand.items()
    }
    return topk(scores, k)
