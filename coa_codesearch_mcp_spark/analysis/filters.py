"""Token filters: CamelCase splitter + length filter.

Matches the observable behavior of the reference's ``CamelCaseFilter``
(CodeAnalyzer.cs:487-707) and ``CodeLengthFilter`` (:712-752).

The CamelCase filter is synonym-style: the original token is emitted
first with position increment 1, then each split part at the SAME
position (increment 0). Lucene counts every emitted token toward term
frequency, and overlapping positions matter for phrase queries — both
are reproduced downstream.
"""

from __future__ import annotations

from .code_tokenizer import OP_ANNOTATION, OP_OPERATOR


def split_camel_pattern(token: str) -> list[str]:
    """CamelCase/digit-boundary split (CodeAnalyzer.cs:649-706).

    "UserService" -> ["User", "Service"]; acronym handling
    "XMLParser" -> ["XML", "Parser"]; digit boundaries
    "OAuth2Provider" -> ["OAuth", "2", "Provider"].
    """
    parts: list[str] = []
    current: list[str] = []
    for i, c in enumerate(token):
        if i > 0 and c.isupper():
            if current:
                nxt = token[i + 1] if i + 1 < len(token) else ""
                if nxt.islower() and len(current) > 1:
                    # acronym boundary: peel the last char of the
                    # uppercase run onto the new word
                    last = current.pop()
                    if current:
                        parts.append("".join(current))
                    current = [last]
                else:
                    parts.append("".join(current))
                    current = []
        elif c.isdigit() and current and not current[-1].isdigit():
            parts.append("".join(current))
            current = []
        elif not c.isdigit() and current and current[-1].isdigit():
            parts.append("".join(current))
            current = []
        current.append(c)
    if current:
        parts.append("".join(current))
    return parts


def camel_case_split(token: str) -> list[str]:
    """Full splitter (CodeAnalyzer.cs:572-646): returns the list of
    emitted terms for one input token, original first.

    Branch order: generics > snake/kebab > camel. Split parts equal to
    the original token are dropped; duplicates among parts are kept
    (except the base-type-name containment check in the generics
    branch — reference quirk kept).
    """
    if not token:
        return []
    parts = [token]
    split_tokens: list[str] = []

    if "<" in token and ">" in token:
        angle = token.index("<")
        closing = token.rindex(">")
        if angle > 0 and closing > angle:
            base = token[:angle]
            split_tokens.extend(split_camel_pattern(base))
            if base not in split_tokens:
                split_tokens.append(base)
            generic_part = token[angle + 1 : closing]
            for param in generic_part.split(","):
                clean = param.strip()
                if clean:
                    split_tokens.append(clean)
                    split_tokens.extend(split_camel_pattern(clean))
    elif "_" in token or "-" in token:
        split_tokens.extend(
            p for p in token.replace("-", "_").split("_") if p
        )
    else:
        split_tokens = split_camel_pattern(token)

    for st in split_tokens:
        if st and st != token:
            parts.append(st)
    return parts


def apply_camel_case_filter(
    stream: list[tuple[str, str, int]],
) -> list[tuple[str, str, int]]:
    """(term, type, pos_incr) stream -> expanded stream.

    OPERATOR/ANNOTATION tokens pass through unsplit
    (CodeAnalyzer.cs:531-535). Split parts share the original's type
    and carry pos_incr 0 (:551-570).
    """
    out: list[tuple[str, str, int]] = []
    for term, ttype, incr in stream:
        if ttype in (OP_OPERATOR, OP_ANNOTATION):
            out.append((term, ttype, incr))
            continue
        parts = camel_case_split(term)
        if len(parts) <= 1:
            out.append((term, ttype, incr))
        else:
            out.append((parts[0], ttype, incr))
            out.extend((p, ttype, 0) for p in parts[1:])
    return out


def apply_length_filter(
    stream: list[tuple[str, str, int]], min_length: int
) -> list[tuple[str, str, int]]:
    """Drop tokens shorter than ``min_length`` unless OPERATOR or
    ANNOTATION (CodeAnalyzer.cs:727-751).

    Like the reference (a non-accumulating filter), the dropped
    token's position increment is discarded, so surviving pos_incr=0
    split parts can land on the previous kept token's position —
    quirk reproduced.
    """
    return [
        t
        for t in stream
        if t[1] in (OP_OPERATOR, OP_ANNOTATION) or len(t[0]) >= min_length
    ]
