import numpy as np

from coa_codesearch_mcp_spark.index.codec import (
    decode_block,
    decode_blocks,
    encode_blocks,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip():
    rng = np.random.RandomState(42)
    vals = rng.randint(0, 1 << 40, size=1000).astype(np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals), 1000), vals)


def test_varint_edge_values():
    vals = np.array([0, 1, 127, 128, 255, 1 << 35], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals), len(vals)), vals)


def test_block_roundtrip_multi_block():
    rng = np.random.RandomState(7)
    n = 300  # spans 3 blocks of 128
    doc_ids = np.sort(rng.choice(10_000, size=n, replace=False)).astype(np.int64)
    tfs = rng.randint(1, 50, size=n).astype(np.int64)
    dls = rng.randint(10, 500, size=n).astype(np.float64)
    blocks = encode_blocks(doc_ids, tfs, dls, avgdl=100.0)
    assert len(blocks) == 3
    assert blocks[0]["n"] == 128 and blocks[2]["n"] == 44
    got_docs, got_tfs = decode_blocks(blocks)
    assert np.array_equal(got_docs, doc_ids)
    assert np.array_equal(got_tfs, tfs)
    # skip pointers
    assert blocks[1]["first_doc"] == int(doc_ids[128])
    assert blocks[1]["last_doc"] == int(doc_ids[255])
    # block-max ub bounds every tf-normalization in the block
    # (idf-free: the query side multiplies by idf, wand.py TermCursor)
    from coa_codesearch_mcp_spark.query.bm25 import B, K1

    for bi, blk in enumerate(blocks):
        t = tfs[bi * 128 : (bi + 1) * 128].astype(float)
        d = dls[bi * 128 : (bi + 1) * 128]
        tfn = t * (K1 + 1) / (t + K1 * (1 - B + B * d / 100.0))
        assert blk["ub"] >= tfn.max() - 1e-12


def test_single_block_decode_standalone():
    doc_ids = np.array([5, 9, 100], dtype=np.int64)
    tfs = np.array([1, 2, 3], dtype=np.int64)
    dls = np.array([10.0, 20.0, 30.0])
    blocks = encode_blocks(doc_ids, tfs, dls, avgdl=20.0)
    d, t = decode_block(blocks[0]["doc_gaps"], blocks[0]["tfs"], 3, -1)
    assert list(d) == [5, 9, 100]
    assert list(t) == [1, 2, 3]


def test_driver_side_xxh64_matches_spark(spark):
    """hashing.py must be bit-identical to F.xxhash64 (seed 42) so
    term->bucket routing never launches a job (store.lookup_terms)."""
    import random
    import string

    from pyspark.sql import functions as F

    from coa_codesearch_mcp_spark.index.hashing import term_bucket, xxh64_signed

    rng = random.Random(5)
    pool = string.ascii_letters + string.digits + "_-./:~ \u00e4\u00fc\u6f22"
    words = ["", "a", "spark", "x" * 31, "y" * 32, "z" * 33] + [
        "".join(rng.choices(pool, k=rng.randint(1, 80))) for _ in range(300)
    ]
    df = spark.createDataFrame([(w,) for w in words], "term string").select(
        "term",
        F.xxhash64("term").alias("h"),
        F.pmod(F.xxhash64("term"), F.lit(16)).cast("int").alias("b"),
    )
    for r in df.collect():
        enc = r["term"].encode("utf-8")
        assert xxh64_signed(enc) == r["h"], repr(r["term"])
        assert term_bucket(r["term"], 16) == r["b"]


def test_wand_prunes_on_skewed_postings():
    """Block-max WAND must SKIP whole blocks (Ding & Suel 2011): the
    classic stopword-x-rare-term query decodes a small fraction of the
    stopword's blocks — the rare terms' pivots leap over them and the
    shallow block-max check rejects the rest on metadata alone — while
    returning EXACTLY the decode-everything scorer's top-k. (On the
    uniform synthetic bench corpus all block maxima are equal, so
    pruning legitimately shows ~1.0 there; this is the distribution
    the algorithm exists for.)"""
    import numpy as np

    from coa_codesearch_mcp_spark.index.codec import (
        BLOCK_SIZE,
        encode_blocks,
        varint_encode,
    )
    from coa_codesearch_mcp_spark.query.wand import (
        WandStats,
        exhaustive_topk_range,
        wand_topk,
    )

    rng = np.random.RandomState(3)
    N_IDS, avgdl = 500_000, 120.0

    def make_list(n, idf):
        docs = np.sort(rng.choice(N_IDS, size=n, replace=False)).astype(np.int64)
        tfs = rng.zipf(1.7, size=n).clip(1, 100).astype(np.int64)
        dls = (
            np.exp(rng.normal(np.log(avgdl), 0.7, size=n)).clip(10, 3000)
        ).astype(np.int64)
        blocks = encode_blocks(docs, tfs, dls.astype(np.float64), avgdl=avgdl)
        # attach per-block dl blobs exactly as the store build does
        for bi, blk in enumerate(blocks):
            blk["dls"] = varint_encode(
                dls.astype(np.uint64)[bi * BLOCK_SIZE : (bi + 1) * BLOCK_SIZE]
            )
        return (idf, blocks)

    term_blocks = {
        "the": make_list(400_000, 0.2),    # stopword: dense, low idf
        "zebra": make_list(600, 6.0),      # rare, high idf
        "quark": make_list(900, 5.2),
    }
    stats = WandStats()
    hits = wand_topk(term_blocks, avgdl, k=10, stats=stats)
    assert len(hits) == 10
    frac = stats.blocks_decoded / stats.blocks_total
    assert frac < 0.5, f"expected real block skipping, got {frac:.3f}"
    # evaluation count is a tiny fraction of total postings
    assert stats.docs_scored < 5_000

    # and the pruned result is EXACT: equals the decode-everything scorer
    want = [(d, round(sc, 4)) for d, sc in exhaustive_topk_range(term_blocks, avgdl, 10)]
    got = [(d, round(sc, 4)) for d, sc in hits]
    assert got == want
