"""Property-style rank-identity sweep: ~50 seeded random queries
(term / AND / OR / NOT / phrase / wildcard / prefix / fuzzy) over a
corpus forced into 8 doc ranges with salted hot terms, asserting the
store path equals the logical path row-for-row (round-2 VERDICT #6).

The round-1 AND bug (a range owning only one of the AND terms answered
with its partial docs) lived exactly in the gap this net covers; the
sweep makes that class of regression impossible to reintroduce
silently. Term pools deliberately include range-clustered terms
(zoneN appears ONLY in range N), hot salted terms, rare terms, and
absent terms, so random combinations keep producing the
missing-in-range shapes."""

import random

import pytest

from coa_codesearch_mcp_spark.index.build import build_logical_index
from coa_codesearch_mcp_spark.index.store import IndexConfig, IndexReader, IndexWriter
from coa_codesearch_mcp_spark.query.executor import Searcher
from coa_codesearch_mcp_spark.query.store_executor import StoreSearcher

N_DOCS = 1024

CFG = IndexConfig(
    field="content_patterns",
    n_buckets=4,
    range_size=128,      # 8 doc ranges
    chunk_size=256,
    chunks_per_wave=2,
    salt_threshold=200,  # hot terms (df ~900) split into ~5 salts
    max_salts=8,
)


def _mk_docs(spark):
    rows = []
    for i in range(N_DOCS):
        w = []
        if i % 10:
            w.append("hot")                       # ~90% of docs, salted
        w.append(f"zone{i // 128}")               # lives in ONE range only
        w += [f"warm{i % 13}", f"mid{i % 29}"]
        if i % 31 == 0:
            w.append(f"rare{i}")
        if i % 7 == 0:
            w += ["quick", "brown", "fox"]
        if i % 11 == 0:
            w += ["lazy", "dog", "sleeps"]
        if i % 5 == 0:
            w += ["brown", "fox"]                 # partial-phrase noise
        w.append(f"filler{(i * 3) % 53}")
        rows.append((i, " ".join(w)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def gen_queries(n=50, seed=11):
    rng = random.Random(seed)
    zones = [f"zone{z}" for z in range(8)]
    warms = [f"warm{j}" for j in range(13)]
    mids = [f"mid{j}" for j in range(29)]
    rares = [f"rare{31 * j}" for j in range(0, 33)]  # tail is absent
    vocab = (
        ["hot"] + zones + warms + mids + rares
        + ["quick", "brown", "fox", "lazy", "dog", "sleeps", "nothere"]
    )
    phrases = [
        ["quick", "brown"], ["quick", "brown", "fox"], ["brown", "fox"],
        ["lazy", "dog"], ["lazy", "dog", "sleeps"], ["dog", "sleeps"],
        ["fox", "dog"],
    ]
    out = []
    for _ in range(n):
        kind = rng.choice(
            ["term", "and", "or", "not", "phrase", "wildcard", "prefix", "fuzzy"]
        )
        if kind == "term":
            spec = ("search_term", (rng.choice(vocab),), {})
        elif kind == "and":
            spec = ("search_and", (rng.sample(vocab, rng.randint(2, 3)),), {})
        elif kind == "or":
            spec = ("search_or", (rng.sample(vocab, rng.randint(2, 3)),), {})
        elif kind == "not":
            spec = (
                "search_or",
                (rng.sample(vocab, 2),),
                {"exclude": rng.sample(vocab, 1)},
            )
        elif kind == "phrase":
            spec = (
                "search_phrase",
                (rng.choice(phrases),),
                {"slop": rng.choice([0, 0, 1, 2])},
            )
        elif kind == "wildcard":
            spec = (
                "search_wildcard",
                (rng.choice(["warm*", "zone*", "ra*e1*", "m?d1", "quick*"]),),
                {},
            )
        elif kind == "prefix":
            spec = ("search_prefix", (rng.choice(["wa", "zo", "ra", "q"]),), {})
        else:
            spec = (
                "search_fuzzy",
                (rng.choice(["hoot", "zonee3", "warn1", "foxx"]),),
                {},
            )
        out.append(spec)
    # pinned round-3 shapes: OR with >=8x df skew and rare-df >= 4k —
    # the global threshold bootstrap FIRES (hot df~922 vs warm df~79);
    # the seed-independent guarantee that the sweep covers the seeded
    # scatter path, not just when the RNG happens to draw it
    out += [
        ("search_or", (["hot", "warm1"],), {}),
        ("search_or", (["hot", "warm7", "zone3"],), {}),
        ("search_or", (["hot", "warm2", "warm9"],), {}),
    ]
    return out


QUERIES = gen_queries()


@pytest.fixture(scope="module")
def corpus(spark):
    return _mk_docs(spark).cache()


@pytest.fixture(scope="module")
def store(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ix_sweep"))
    IndexWriter(spark, root, CFG).build(corpus)
    return StoreSearcher(IndexReader(spark, root))


@pytest.fixture(scope="module")
def logical(corpus):
    return Searcher(build_logical_index(corpus, field="content_patterns").cache())


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_corpus_shape(store):
    blocks = store.reader.postings_blocks(["hot"])[0]
    assert blocks.select("range_id").distinct().count() >= 8
    assert store.reader.lookup_terms(["hot"])["hot"]["n_salts"] > 1


@pytest.mark.parametrize(
    "method,args,kwargs",
    QUERIES,
    ids=[f"{m}-{a}-{kw or ''}" for m, a, kw in QUERIES],
)
def test_store_equals_logical(store, logical, method, args, kwargs):
    got = rows(getattr(store, method)(*args, k=10, **kwargs))
    want = rows(getattr(logical, method)(*args, k=10, **kwargs))
    assert got == want, (method, args, kwargs)
