"""Property-style rank-identity sweep on the CODE chain (round-3
VERDICT Missing #3 / Next #5): the 41 driver oracles only exercise
corpora where the code chain tokenizes identically to whitespace, so
camel-splitting, operator tokens, generics and synonym-overlap
positions had no store==logical==independent-oracle coverage beyond
hand-picked goldens. This sweep runs ~40 seeded random queries (term /
AND / OR / NOT / phrase) over a code-text corpus — built from the same
deterministic fixture the symbol-tier DuckDB oracles consume — through
THREE independent implementations:

  store   : materialized index + block-max WAND scatter
  logical : DataFrame-only engine
  oracle  : single-node pandas/python BM25 (oracle/pandas_oracle.py),
            whose tokenizer chain is itself golden-tested

asserting row-for-row equality. The corpus is replicated with marker
variations so dfs spread across bands, forced into ~8 doc ranges, and
the '('/')'/'.' operator tokens exceed salt_threshold so the salted
hot-term path runs on code-chain postings too.
"""

import random

import pytest

from coa_codesearch_mcp_spark.analysis.chains import analyze
from coa_codesearch_mcp_spark.fixtures.codegen import generate_code_lines
from coa_codesearch_mcp_spark.index.build import build_logical_index
from coa_codesearch_mcp_spark.index.store import IndexConfig, IndexReader, IndexWriter
from coa_codesearch_mcp_spark.oracle import pandas_oracle as po
from coa_codesearch_mcp_spark.query.executor import Searcher
from coa_codesearch_mcp_spark.query.store_executor import StoreSearcher

N_COPIES = 12

CFG = IndexConfig(
    field="content",
    n_buckets=4,
    range_size=64,       # 480 docs -> ~8 ranges
    chunk_size=128,
    chunks_per_wave=2,
    salt_threshold=300,  # '(' / ')' / '.' df ~480 -> salted
    max_salts=4,
)


def _doc_texts() -> list[tuple[int, str]]:
    by_doc: dict[int, list[str]] = {}
    for doc_id, _path, _ln, line in generate_code_lines():
        by_doc.setdefault(doc_id, []).append(line)
    base = {d: "\n".join(lines) for d, lines in by_doc.items()}
    out = []
    for copy in range(N_COPIES):
        for d, text in base.items():
            doc_id = copy * len(base) + d
            # vary tf/dl per copy so scores are not degenerate
            out.append((doc_id, text + f"\nvariant{copy} marker{d % 7}"))
    return out


def _vocab_and_phrases():
    """Query vocabulary drawn from the ACTUAL code-chain token stream,
    banded by df (hot operators / identifiers / camel fragments /
    rare), plus absent terms; phrases from real consecutive positions
    so slop matching exercises synonym-overlap streams."""
    texts = _doc_texts()
    df: dict[str, int] = {}
    for _, text in texts:
        for t in set(analyze("content", text)):
            df[t] = df.get(t, 0) + 1
    bands = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
    hot = [t for t, d in bands[:6]]
    mid = [t for t, d in bands if len(texts) // 8 <= d <= len(texts) // 2][:12]
    rare = [t for t, d in bands if d <= 24][:12]
    vocab = hot + mid + rare + ["nothere", "zzqq"]

    from coa_codesearch_mcp_spark.analysis.chains import analyze_positions

    stream = analyze_positions("content", texts[0][1])
    by_pos: dict[int, str] = {}
    for term, pos in stream:
        by_pos.setdefault(pos, term)  # first token at each position
    poss = sorted(by_pos)
    phrases = []
    for i in range(0, len(poss) - 2, 7):
        p = poss[i]
        if p + 1 in by_pos:
            phrases.append([by_pos[p], by_pos[p + 1]])
        if p + 1 in by_pos and p + 2 in by_pos:
            phrases.append([by_pos[p], by_pos[p + 1], by_pos[p + 2]])
    return vocab, phrases[:10]


VOCAB, PHRASES = _vocab_and_phrases()


def gen_queries(n=36, seed=23):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        kind = rng.choice(["term", "and", "or", "not", "phrase"])
        if kind == "term":
            out.append(("or", (rng.choice(VOCAB),), {}))
        elif kind == "and":
            out.append(("and", tuple(rng.sample(VOCAB, rng.randint(2, 3))), {}))
        elif kind == "or":
            out.append(("or", tuple(rng.sample(VOCAB, rng.randint(2, 3))), {}))
        elif kind == "not":
            out.append(
                ("not", tuple(rng.sample(VOCAB, 2)), {"exclude": rng.sample(VOCAB, 1)})
            )
        else:
            out.append(
                ("phrase", tuple(rng.choice(PHRASES)), {"slop": rng.choice([0, 0, 1])})
            )
    # pinned shapes: camel fragments ('CacheManager' -> 'cach' +
    # 'emanager' per the golden-tested CamelCase split) + operator
    # tokens through all three engines regardless of what the RNG draws
    out += [
        ("or", ("cachemanager",), {}),
        ("and", ("cach", "emanager"), {}),
        ("or", ("(", "implements"), {}),
        ("not", ("class", "cachemanager"), {"exclude": ["implements"]}),
        ("phrase", ("new", "cachemanager"), {"slop": 0}),
    ]
    return out


QUERIES = gen_queries()


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_doc_texts(), "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def store(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ix_code_sweep"))
    IndexWriter(spark, root, CFG).build(corpus)
    return StoreSearcher(IndexReader(spark, root))


@pytest.fixture(scope="module")
def logical(corpus):
    return Searcher(build_logical_index(corpus, field="content").cache())


@pytest.fixture(scope="module")
def oracle():
    return po.build_oracle_index(_doc_texts(), analyzer="content")


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_corpus_exercises_code_chain(store):
    # the corpus MUST contain text where code chain != whitespace:
    # camel fragments and operator tokens exist as dictionary terms
    info = store.reader.lookup_terms(["cachemanager", "cach", "emanager", "("])
    assert set(info) == {"cachemanager", "cach", "emanager", "("}
    # and at least one hot term is salted + the corpus spans >= 6 ranges
    hot_info = store.reader.lookup_terms(["("])
    assert hot_info["("]["n_salts"] > 1
    blocks = store.reader.postings_blocks(["("])[0]
    assert blocks.select("range_id").distinct().count() >= 6


@pytest.mark.parametrize(
    "kind,terms,kwargs",
    QUERIES,
    ids=[f"{k}-{'_'.join(t)[:40]}-{kw or ''}" for k, t, kw in QUERIES],
)
def test_store_equals_logical_equals_oracle(store, logical, oracle, kind, terms, kwargs):
    terms = list(terms)
    if kind == "or":
        got = rows(store.search_or(terms, k=10))
        want = rows(logical.search_or(terms, k=10))
        want_o = po.search_or(oracle, terms, k=10)
    elif kind == "and":
        got = rows(store.search_and(terms, k=10))
        want = rows(logical.search_and(terms, k=10))
        want_o = po.search_and(oracle, terms, k=10)
    elif kind == "not":
        ex = kwargs["exclude"]
        got = rows(store.search_or(terms, k=10, exclude=ex))
        want = rows(logical.search_or(terms, k=10, exclude=ex))
        want_o = po.search_not(oracle, terms, ex, k=10)
    else:
        slop = kwargs.get("slop", 0)
        got = rows(store.search_phrase(terms, k=10, slop=slop))
        want = rows(logical.search_phrase(terms, k=10, slop=slop))
        want_o = po.search_phrase(oracle, terms, k=10, slop=slop)
    assert got == want == want_o, (kind, terms, kwargs)
