"""Property-based tests for the analyzer chains (hypothesis).

Invariants that must hold for ANY input (the reference's state
machines maintain them by construction):
- tokenization never crashes and always terminates;
- every emitted term is non-empty;
- positions are non-decreasing and start >= 0;
- the patterns chain reproduces str.split() lowercased exactly;
- camel split parts (beyond the original) concatenate to a
  subsequence-preserving decomposition for plain alnum tokens;
- tf computed by the grouped UDF path equals the stream multiset.
"""

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from coa_codesearch_mcp_spark.analysis import (
    analyze_positions,
    camel_case_split,
    code_tokenize,
)

text_strategy = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)
    ),
    max_size=400,
)
code_text = st.text(
    alphabet=" \tabcXYZ01_<>:[]@->{}()=&|.,?!\n",
    max_size=300,
)


@settings(max_examples=300, deadline=None)
@given(code_text)
def test_code_tokenize_terminates_nonempty(text):
    toks = code_tokenize(text)
    assert all(t for t, _ in toks)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_code_tokenize_arbitrary_unicode(text):
    toks = code_tokenize(text)
    assert all(t for t, _ in toks)


@settings(max_examples=200, deadline=None)
@given(code_text)
def test_positions_monotone(text):
    for field in ("content", "content_patterns", "content_symbols"):
        out = analyze_positions(field, text)
        poss = [p for _, p in out]
        assert all(p >= 0 for p in poss)
        assert poss == sorted(poss)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_patterns_chain_equals_split_lower(text):
    got = [t for t, _ in analyze_positions("content_patterns", text)]
    assert got == [w.lower() for w in text.split()]


@settings(max_examples=200, deadline=None)
@given(st.from_regex(r"[A-Za-z0-9_]{1,30}", fullmatch=True))
def test_camel_split_original_first(token):
    parts = camel_case_split(token)
    assert parts[0] == token
    # split parts of a snake-less alnum token rebuild the original
    if "_" not in token and len(parts) > 1:
        assert "".join(parts[1:]) == token


@settings(max_examples=100, deadline=None)
@given(code_text)
def test_grouped_tf_equals_stream_multiset(text):
    stream = [t for t, _ in analyze_positions("content", text)]
    grouped: dict[str, list[int]] = {}
    for term, pos in analyze_positions("content", text):
        grouped.setdefault(term, []).append(pos)
    assert {t: len(ps) for t, ps in grouped.items()} == dict(Counter(stream))
