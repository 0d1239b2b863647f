"""Posting-list block codec: delta-encoded docID gaps + term
frequencies, varint (LEB128) compressed in blocks of 128 with skip
pointers and block-max metadata.

Reference analog: Lucene 4.8 segment postings (FOR/PForDelta blocks of
128 with skip lists and, in modern Lucene, block-max impacts). This is
a from-scratch implementation; layout is our own:

    one encoded block = up to 128 (doc_id, tf) pairs
      doc_gaps : varint(delta(doc_ids))      (first gap = doc_id - prev_last)
      tfs      : varint(tf)
      first_doc/last_doc : skip pointers (block skipped when the
                           WAND pivot exceeds last_doc)
      max_tf, ub : block-max metadata; ub = max BM25 contribution of
                   any doc in the block given its true dl (block-max
                   WAND upper bound)

numpy vectorized encode/decode (no per-row Python in the hot path).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


# 7-bit group boundaries: values below _LEN_THRESHOLDS[i] need i+1 bytes
_LEN_THRESHOLDS = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array — fully vectorized (<=10 numpy
    passes regardless of length; hot-term posting lists can hold
    hundreds of thousands of entries per salt)."""
    v = values.astype(np.uint64, copy=True)
    if len(v) == 0:
        return b""
    lengths = np.digitize(v, _LEN_THRESHOLDS) + 1
    offs = np.cumsum(lengths) - lengths
    buf = np.zeros(int(lengths.sum()), dtype=np.uint8)
    cur = v.copy()
    for i in range(10):
        mask = lengths > i
        if not mask.any():
            break
        idx = offs[mask] + i
        byte = (cur[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (lengths[mask] - 1 > i).astype(np.uint8)
        buf[idx] = byte | (cont << 7)
        cur = cur >> np.uint64(7)
    return buf.tobytes()


def varint_decode(data: bytes, n: int) -> np.ndarray:
    """Decode ``n`` LEB128 values — vectorized inverse of
    :func:`varint_encode`."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    # value index of each byte
    vidx = np.zeros(len(b), dtype=np.int64)
    vidx[1:] = np.cumsum(is_last)[:-1]
    # byte position within its value
    starts = np.empty(len(b), dtype=bool)
    starts[0] = True
    starts[1:] = is_last[:-1]
    start_idx = np.maximum.accumulate(
        np.where(starts, np.arange(len(b)), -1)
    )
    pos = (np.arange(len(b)) - start_idx).astype(np.uint64)
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(
        vals, vidx[: len(b)], (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos)
    )
    return vals


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[dict]:
    """Split a term's (sorted) postings into encoded blocks.

    Returns dicts ready to become DataFrame rows:
    {block_no, first_doc, last_doc, n, doc_gaps, tfs, max_tf, ub}
    ``ub`` is the exact block-max TF-NORMALIZATION bound (tfn with
    each doc's true dl, NO idf): the build stage therefore never needs
    per-term df — at web scale the term dictionary is itself a big
    table, and joining/broadcasting it into the encode shuffle was the
    one build-side step that could not scale. The query side multiplies
    by idf (which it already looks up per term) to recover the exact
    idf*tfn block-max bound — same pruning power, zero extra state.
    """
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order].astype(np.int64)
    tfs = tfs[order].astype(np.int64)
    dls = dls[order].astype(np.float64)

    blocks = []
    prev_last = -1
    for bno, start in enumerate(range(0, len(doc_ids), BLOCK_SIZE)):
        d = doc_ids[start : start + BLOCK_SIZE]
        t = tfs[start : start + BLOCK_SIZE]
        dl = dls[start : start + BLOCK_SIZE]
        gaps = np.empty(len(d), dtype=np.uint64)
        gaps[0] = d[0] - prev_last
        gaps[1:] = np.diff(d).astype(np.uint64)
        tfn = t * (k1 + 1.0) / (t + k1 * (1.0 - b + b * dl / avgdl))
        blocks.append(
            {
                "block_no": bno,
                "first_doc": int(d[0]),
                "last_doc": int(d[-1]),
                "n": int(len(d)),
                "doc_gaps": varint_encode(gaps),
                "tfs": varint_encode(t.astype(np.uint64)),
                "max_tf": int(t.max()),
                "ub": float(tfn.max()),
            }
        )
        prev_last = int(d[-1])
    return blocks


def decode_block(
    doc_gaps: bytes, tfs: bytes, n: int, prev_last: int
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_blocks for one block."""
    gaps = varint_decode(doc_gaps, n).astype(np.int64)
    doc_ids = np.cumsum(gaps) + prev_last
    tf = varint_decode(tfs, n).astype(np.int64)
    return doc_ids, tf


def decode_blocks(rows: list[dict]) -> tuple[np.ndarray, np.ndarray]:
    """Decode consecutive blocks of one (term, salt) posting list.

    Rows must be sorted by block_no; gap chaining uses each block's
    predecessor's last_doc (first block chains from -1).
    """
    all_docs = []
    all_tfs = []
    prev_last = -1
    for r in rows:
        d, t = decode_block(r["doc_gaps"], r["tfs"], r["n"], prev_last)
        prev_last = int(r["last_doc"])
        all_docs.append(d)
        all_tfs.append(t)
    if not all_docs:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(all_docs), np.concatenate(all_tfs)
