"""Shared positional phrase matcher over encoded posting blocks.

One implementation of the pinned slop spec (SURVEY §2.3 Q5: in-order
matches, each subsequent term strictly after the previous one, whole
match within (n-1)+slop of the start), used by BOTH the single-index
StoreSearcher and the incremental DeltaIndexManager — segment
visibility is the only difference, injected as a predicate so the
matching semantics cannot drift between tiers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CAND_SCHEMA = "doc_id long, phrase_tf long, dl long"


def phrase_candidates(
    pdf: pd.DataFrame,
    seq: list[str],
    max_span: int,
    visible=None,
) -> pd.DataFrame:
    """(doc_id, phrase_tf, dl) for docs in ONE doc range matching the
    phrase ``seq`` within ``max_span``.

    ``pdf``: posting block rows for the phrase's terms in this range
    (columns term/block_no/doc_gaps/tfs/dls/pos_blob/n, plus seg_id
    when multi-segment). ``visible(doc_id, seg_id)`` filters hidden
    copies; a visible doc has exactly one live copy, so mappings never
    collide across segments."""
    from ..index.codec import decode_blocks, varint_decode

    has_seg = "seg_id" in pdf.columns
    group_cols = ["term", "seg_id"] if has_seg else ["term"]

    per_term_pos: dict[str, dict[int, list[int]]] = {}
    per_doc_dl: dict[int, int] = {}
    for gkey, grp in pdf.groupby(group_cols, sort=True):
        term = gkey[0] if has_seg else (gkey if isinstance(gkey, str) else gkey[0])
        seg_id = int(gkey[1]) if has_seg else None
        rows = grp.sort_values("block_no").to_dict("records")
        doc_ids, tfs = decode_blocks(rows)
        dls = np.concatenate(
            [varint_decode(r["dls"], r["n"]) for r in rows]
        ).astype(np.int64)
        pos_all = np.concatenate(
            [
                varint_decode(r["pos_blob"], int(tfs_sum))
                for r, tfs_sum in zip(
                    rows,
                    [varint_decode(r["tfs"], r["n"]).sum() for r in rows],
                )
            ]
        ).astype(np.int64) if len(rows) else np.empty(0, np.int64)
        mapping = per_term_pos.setdefault(term, {})
        off = 0
        for d, tf, dl in zip(doc_ids, tfs, dls):
            deltas = pos_all[off : off + tf]
            off += tf
            if visible is not None and not visible(int(d), seg_id):
                continue
            pos = np.cumsum(deltas) - 1
            mapping[int(d)] = pos.tolist()
            per_doc_dl[int(d)] = int(dl)

    if any(t not in per_term_pos for t in seq):
        return pd.DataFrame(columns=["doc_id", "phrase_tf", "dl"])
    cand = set(per_term_pos[seq[0]])
    for t in seq[1:]:
        cand &= set(per_term_pos[t])
    out = []
    for d in sorted(cand):
        count = 0
        for start in per_term_pos[seq[0]][d]:
            prev = start
            ok = True
            for t in seq[1:]:
                nxt = next(
                    (
                        q
                        for q in per_term_pos[t][d]
                        if q > prev and q - start <= max_span
                    ),
                    None,
                )
                if nxt is None:
                    ok = False
                    break
                prev = nxt
            if ok:
                count += 1
        if count:
            out.append((d, count, per_doc_dl[d]))
    return pd.DataFrame(out, columns=["doc_id", "phrase_tf", "dl"])
