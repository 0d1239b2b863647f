"""Golden tests for the analyzer chains.

Expected streams transcribed from the reference's rules
(CodeAnalyzer.cs) by hand-tracing the tokenizer/filter state machines
— these encode ACTUAL observable behavior, including quirks:
- the camel splitter's acronym branch peels the last char of a
  lowercase run ("UserService" -> Use + rService) — kept;
- ':' lookahead appends whitespace to the token even on no-match;
- dropped short tokens lose their position increments.
"""

from coa_codesearch_mcp_spark.analysis import (
    analyze_positions,
    camel_case_split,
    code_tokenize,
    split_camel_pattern,
)


def test_code_tokenize_basic_identifiers():
    assert code_tokenize("UserService implements ITool") == [
        ("UserService", "IDENTIFIER"),
        ("implements", "IDENTIFIER"),
        ("ITool", "IDENTIFIER"),
    ]


def test_code_tokenize_qualified_and_pointer():
    assert code_tokenize("std::cout ->member") == [
        ("std::cout", "QUALIFIED_NAME"),
        ("->member", "IDENTIFIER"),
    ]


def test_code_tokenize_type_annotation_with_generics():
    assert code_tokenize("class Foo : IRepository<T>") == [
        ("class", "IDENTIFIER"),
        ("Foo", "IDENTIFIER"),
        (": IRepository<T>", "GENERIC_TYPE"),
    ]


def test_code_tokenize_attribute_decorator():
    assert code_tokenize("[Fact] @property") == [
        ("[Fact]", "ANNOTATION"),
        ("@property", "ANNOTATION"),
    ]


def test_code_tokenize_operators_greedy():
    assert code_tokenize("a += b; c != d ...rest") == [
        ("a", "IDENTIFIER"),
        ("+=", "OPERATOR"),
        ("b", "IDENTIFIER"),
        (";", "OPERATOR"),
        ("c", "IDENTIFIER"),
        ("!=", "OPERATOR"),
        ("d", "IDENTIFIER"),
        ("...", "OPERATOR"),
        ("rest", "IDENTIFIER"),
    ]


def test_code_tokenize_nested_generics_balanced():
    toks = code_tokenize("Dictionary<int, List<string>> x")
    assert toks[0] == ("Dictionary<int, List<string>>", "GENERIC_TYPE")
    assert toks[1] == ("x", "IDENTIFIER")


def test_code_tokenize_colon_nomatch_keeps_whitespace():
    # ':' followed by whitespace then a non-token char: the lookahead
    # whitespace stays inside the token (reference quirk).
    toks = code_tokenize(": +x")
    assert toks[0] == (": ", "TYPE_ANNOTATION")


def test_split_camel_pattern_actual_behavior():
    # the acronym branch peels the last char of the preceding run
    assert split_camel_pattern("UserService") == ["Use", "rService"]
    # uppercase runs split per-letter until a lower follows
    assert split_camel_pattern("XMLParser") == ["X", "M", "L", "Parser"]
    assert split_camel_pattern("OAuth2Provider") == ["O", "Auth", "2", "Provider"]
    assert split_camel_pattern("user") == ["user"]


def test_camel_case_split_snake_kebab():
    assert camel_case_split("snake_case") == ["snake_case", "snake", "case"]
    assert camel_case_split("kebab-case") == ["kebab-case", "kebab", "case"]
    # snake split parts are NOT camel-split further (reference branch order)
    assert camel_case_split("user_Service") == ["user_Service", "user", "Service"]


def test_camel_case_split_generics():
    # the generic param is added, then its (identical) camel parts are
    # added again — duplicate kept, counts toward tf (reference quirk)
    assert camel_case_split("List<string>") == [
        "List<string>",
        "List",
        "string",
        "string",
    ]


def test_content_chain_positions_overlap():
    # split parts overlap the original's position (posIncr=0)
    out = analyze_positions("content", "UserService x")
    assert out == [
        ("userservice", 0),
        ("use", 0),
        ("rservice", 0),
        ("x", 1),
    ]


def test_patterns_chain():
    assert analyze_positions("content_patterns", "Foo<T>  Bar baz") == [
        ("foo<t>", 0),
        ("bar", 1),
        ("baz", 2),
    ]


def test_symbols_chain_min_length_two():
    # standard tokenizer keeps underscores; min length 2 drops 'o'
    # NOTE: dropped tokens ('o', '2', 'x') lose their position
    # increments (non-accumulating filter, reference quirk), so 'yz'
    # lands at position 1, not 2.
    out = analyze_positions("content_symbols", "OAuth2 x yz")
    assert out == [("oauth2", 0), ("auth", 0), ("yz", 1)]


def test_operators_never_split_or_length_filtered():
    # '->x' is typed IDENTIFIER so the kebab branch splits it into
    # '->x' + '>x' (reference quirk); '[A]' is ANNOTATION, unsplit.
    out = analyze_positions("content", "- ->x [A]")
    assert out == [("-", 0), ("->x", 1), (">x", 1), ("[a]", 2)]


def test_patterns_builtin_path_matches_python_on_unicode_ws(spark):
    """ADVICE round-2: the JVM built-in FIELD_PATTERNS tokenizer must
    split on the SAME whitespace set as the Python chain (str.split),
    including U+00A0, U+2028, U+205F - else the logical index and the
    store index/query analyzer tokenize differently."""
    from coa_codesearch_mcp_spark.analysis.chains import FIELD_PATTERNS, analyze_positions
    from coa_codesearch_mcp_spark.analysis.udfs import tokens_col

    texts = [
        "plain ascii words",
        "non\u00a0breaking\u00a0space",
        "line\u2028sep and\u2029para",
        "math\u205fspace\u3000ideographic",
        "mixed Case\tTabs\r\nCRLF",
        "ctrl\x1cseps\x1ftoo",
        "en\u2002quad\u200athin",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        [(x["term"], x["pos"]) for x in r["toks"]]
        for r in df.select(tokens_col(FIELD_PATTERNS).alias("toks")).collect()
    ]
    want = [analyze_positions(FIELD_PATTERNS, t) for t in texts]
    assert got == want


def test_grouped_tokens_arrow_matches_pandas_twin(spark, documents):
    """Differential oracle for the round-6 Arrow-native tokenizer
    boundary: grouped_tokens_arrow (flat-buffer ListArray/StructArray
    construction) must emit exactly the per-doc grouped rows of the
    original pandas grouped UDF — same terms, tfs, positions and dl,
    on both the whitespace and the code chain."""
    from pyspark.sql import functions as F

    from coa_codesearch_mcp_spark.analysis.udfs import (
        grouped_tokens_arrow,
        make_grouped_tokenizer_udf,
    )

    docs = documents.limit(60).select("doc_id", "text")
    for field in ("content_patterns", "content"):
        arrow = grouped_tokens_arrow(docs, field)
        gu = make_grouped_tokenizer_udf(field)
        pandas_twin = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            gu(F.col("text")).alias("tokens"),
        ).withColumn(
            "dl",
            F.aggregate(
                "tokens", F.lit(0), lambda acc, x: acc + x["tf"]
            ).cast("long"),
        )

        def norm(df):
            rows = df.select(
                "doc_id", "dl", F.explode_outer("tokens").alias("tok")
            ).collect()
            return sorted(
                (
                    r["doc_id"],
                    r["dl"],
                    None if r["tok"] is None else r["tok"]["term"],
                    None if r["tok"] is None else r["tok"]["tf"],
                    None if r["tok"] is None else tuple(r["tok"]["positions"]),
                )
                for r in rows
            )

        assert norm(arrow) == norm(pandas_twin), field
