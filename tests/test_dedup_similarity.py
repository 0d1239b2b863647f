"""Dedup + similarity + multimodal plumbing tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from coa_codesearch_mcp_spark.functions.dedup import (
    dedup_exact_keep_first,
    embedding_near_dups,
    exact_dup_groups,
    minhash_lsh_candidates,
    ngram_jaccard,
    shingles_col,
    simhash_near_dups,
)
from coa_codesearch_mcp_spark.functions.similarity import (
    knn_bruteforce,
    knn_lsh,
    make_planes,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different content about spark inverted index engines"
    rows = [
        (1, base), (2, base),            # exact dups
        (3, near),                       # near dup of 1/2
        (4, far), (5, far + " extra"),   # near dups of each other
        (6, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(dup_docs):
    groups = exact_dup_groups(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2]
    kept = dedup_exact_keep_first(dup_docs)
    assert kept.count() == 5
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 4, 5, 6}


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(
        [("a b c d e", "a b c d x")], "t1 string, t2 string"
    )
    j = df.select(
        ngram_jaccard(
            shingles_col("t1", 2), shingles_col("t2", 2)
        ).alias("j")
    ).collect()[0]["j"]
    # bigrams: {a b, b c, c d, d e} vs {a b, b c, c d, d x}: 3/5
    assert j == pytest.approx(0.6)


def test_minhash_lsh_finds_near_dups(dup_docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_candidates(dup_docs, ngram=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup found
    # verified jaccard is exact
    if (1, 3) in pairs:
        assert 0.5 < pairs[(1, 3)] < 1.0


def test_simhash_near_dups(dup_docs):
    # short docs flip ~1 bit per 6 changed term-bits; one added token
    # on a 9-token doc lands around hamming 11 — threshold accordingly
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dups(dup_docs, max_hamming=16).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text, identical fingerprint
    assert (4, 5) in pairs     # small edit -> small hamming distance
    assert (1, 4) not in pairs and (2, 4) not in pairs  # unrelated docs apart


def test_embedding_near_dups(spark):
    rng = np.random.RandomState(0)
    v1 = rng.randn(16)
    v2 = v1 + rng.randn(16) * 0.01   # near dup
    v3 = rng.randn(16)               # unrelated
    df = spark.createDataFrame(
        [(1, [float(x) for x in v1]), (2, [float(x) for x in v2]),
         (3, [float(x) for x in v3])],
        "vec_id long, embedding array<float>",
    )
    pairs = embedding_near_dups(df, threshold=0.99, dim=16).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_knn_lsh_approximates_bruteforce(spark):
    rng = np.random.RandomState(1)
    vecs = rng.randn(200, 16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]
    exact = [r["vec_id"] for r in knn_bruteforce(df, q, k=5).collect()]
    planes = make_planes(16, n_planes=6, seed=3)
    approx = [
        r["vec_id"]
        for r in knn_lsh(df, q, k=5, planes=planes, n_probes=8).collect()
    ]
    assert exact[0] == 0 and approx[0] == 0      # self is always found
    assert len(set(exact) & set(approx)) >= 2    # decent recall on probes


def test_multimodal_plumbing(spark):
    from coa_codesearch_mcp_spark.fixtures.webgen import generate_webpages
    from coa_codesearch_mcp_spark.functions.multimodal import (
        decode_image,
        image_features,
    )

    docs = generate_webpages(spark, 20, partitions=2)
    feats = image_features(docs, blob_col="html", fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["feature"]) == 16 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # determinism: same blob -> same phash
    again = {r["url"]: r["phash"] for r in image_features(docs, blob_col="html", fake=True).collect()}
    assert all(again[r["url"]] == r["phash"] for r in rows)
    # formats that need codec libraries stay explicit stubs
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")


def test_hashed_embeddings_feed_knn_and_ann(spark, tmp_path):
    """Generated embeddings honor the embeddings.parquet contract:
    brute-force KNN and the materialized AnnIndex consume them
    unchanged, and a doc is its own nearest neighbor (cosine 1.0).
    Determinism: two runs produce identical vectors."""
    from coa_codesearch_mcp_spark.functions.embeddings import embed_texts
    from coa_codesearch_mcp_spark.functions.similarity import (
        AnnIndex,
        knn_bruteforce,
    )

    docs = spark.createDataFrame(
        [(i, f"token{i} shared words appear here plus token{i % 3}")
         for i in range(20)],
        "doc_id long, text string",
    )
    emb = embed_texts(docs, dim=32).withColumnRenamed("doc_id", "vec_id")
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    again = {r["vec_id"]: r["embedding"] for r in
             embed_texts(docs, dim=32).withColumnRenamed("doc_id", "vec_id").collect()}
    assert rows == again
    # unit norm up to the 6dp per-component rounding applied AFTER
    # normalization (error bound ~ dim * 1e-6 in the squared sum)
    assert all(abs(sum(x * x for x in v) - 1.0) < 1e-4 for v in rows.values())

    q = [float(x) for x in rows[7]]
    top = knn_bruteforce(emb, q, k=3).collect()
    assert top[0]["vec_id"] == 7 and abs(top[0]["cosine"] - 1.0) < 1e-6

    root = str(tmp_path / "ann_hashed")
    AnnIndex.build(spark, emb, root, n_planes=3)
    got = AnnIndex(spark, root).query(q, k=3, n_probes=8).collect()
    assert got[0]["vec_id"] == 7
