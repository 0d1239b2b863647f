"""Planner ports: routing, sanitization, rewrites, validation —
expectations transcribed from the reference's behavior
(SmartQueryPreprocessorTests.cs patterns, QueryPreprocessor.cs rules)."""

from coa_codesearch_mcp_spark.query.ast import BoolQ, PhraseQ, RegexpQ, TermQ, WildcardQ
from coa_codesearch_mcp_spark.query.engine import token_budget_k
from coa_codesearch_mcp_spark.query.planner import (
    SearchMode,
    WildcardValidator,
    build_query,
    smart_process,
    validate_query,
)


# ---------------- field routing (Q13) ----------------

def test_symbol_query_routes_to_symbols():
    plan = smart_process("UserService")
    assert plan.target_field == "content_symbols"
    assert plan.detected_mode == SearchMode.SYMBOL


def test_special_chars_route_to_patterns():
    for q in ["IRepository<T>", ": ITool", "[Fact]", "a && b", "x=>y"]:
        plan = smart_process(q)
        assert plan.target_field == "content_patterns", q
        assert plan.detected_mode == SearchMode.PATTERN


def test_natural_language_routes_to_content():
    plan = smart_process("find all the errors")
    assert plan.target_field == "content"
    assert plan.detected_mode == SearchMode.STANDARD


def test_code_keyword_routes_to_symbols_with_noise_strip():
    plan = smart_process("class UserService")
    assert plan.target_field == "content_symbols"
    assert plan.processed_query == "UserService"


def test_bracket_escaping_only_when_invalid():
    # incomplete bracket -> escaped; valid range syntax untouched
    assert smart_process("[Ignore").processed_query == "\\[Ignore"
    assert smart_process("[a TO z]").processed_query == "[a TO z]"


# ---------------- wildcard sanitization ----------------

def test_wildcard_validator():
    assert WildcardValidator.is_invalid("*foo")
    assert WildcardValidator.is_invalid("*")
    assert WildcardValidator.is_invalid("?* *")
    assert not WildcardValidator.is_invalid("foo*")
    assert WildcardValidator.sanitize("*foo") == "foo"
    assert WildcardValidator.sanitize("**") is None


def test_leading_wildcard_sanitized_in_routing():
    plan = smart_process("*UserService")
    assert plan.processed_query == "UserService"


def test_pure_wildcard_rejected():
    plan = smart_process("***")
    assert "Invalid wildcard" in plan.reason


# ---------------- query building rewrites (§4.1) ----------------

def test_regex_dotstar_rewrites_to_slop20_phrase():
    q = build_query("async.*Task", "regex")
    assert isinstance(q, PhraseQ)
    assert q.slop == 20
    assert q.terms == ["async", "task"]


def test_regex_plain_stays_regexp():
    q = build_query("s[0-9]+k", "regex")
    assert isinstance(q, RegexpQ)


def test_invalid_regex_falls_back_to_code_query():
    q = build_query("[unclosed", "regex")
    assert not isinstance(q, RegexpQ)


def test_inheritance_syntax_rewrites_to_and():
    q = build_query("MyClass : IInterface", "code")
    assert isinstance(q, BoolQ)
    assert [c.term for c in q.must] == ["myclass", "iinterface"]


def test_two_char_operator_becomes_term():
    q = build_query("=>", "code")
    assert isinstance(q, TermQ)
    assert q.term == "=>"


def test_standard_query_default_and():
    q = build_query("fast key", "standard", "content_patterns")
    assert isinstance(q, BoolQ)
    assert [c.term for c in q.must] == ["fast", "key"]


def test_quoted_phrase_in_standard_query():
    q = build_query('"fast key"', "standard", "content_patterns")
    assert isinstance(q, PhraseQ)
    assert q.terms == ["fast", "key"]


def test_wildcard_chunk_in_standard_query():
    q = build_query("sp*", "standard", "content_patterns")
    assert isinstance(q, WildcardQ)
    assert q.pattern == "sp*"


# ---------------- validation (Q14) + budget ladder (O5) ----------------

def test_validation_min_three_chars():
    ok, err = validate_query("ab")
    assert not ok and "too short" in err.lower()
    assert validate_query("=>")[0]          # allowed 2-char operator
    assert validate_query("abc")[0]


def test_token_budget_ladder():
    assert token_budget_k(5000, "full") == 10
    assert token_budget_k(5000, "summary") == 2
    assert token_budget_k(5000, "adaptive") == 3
    assert token_budget_k(150, "full") == 1  # budget-capped
