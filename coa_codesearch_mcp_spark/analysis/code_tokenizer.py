"""Code-aware tokenizer — a from-scratch Python state machine matching
the observable token stream of the reference's ``CodeTokenizer``
(Services/Analysis/CodeAnalyzer.cs:112-481).

Spec notes (our pinned semantics, documented divergences):

- The reference reads through a 4096-char buffer; lookaheads do not
  cross buffer refills, so tokens near multiples of 4096 chars can in
  rare cases split differently there. Our spec treats the document as
  one contiguous buffer (whole-string semantics).
- ``is_token_char`` is ``c.isalnum() or c == '_'`` (reference:
  ``char.IsLetterOrDigit(c) || c == '_'``, CodeAnalyzer.cs:382-385).
  Identical on ASCII; Python ``isalnum`` is slightly broader on exotic
  Unicode numerics — pinned as our spec.
- Whitespace is Python ``str.isspace`` (reference: ``char.IsWhiteSpace``).

Token emission rules (CodeAnalyzer.cs:154-379):

1. skip whitespace;
2. ``:`` first char: lookahead over whitespace — if an identifier char
   follows, emit ``": ident"`` (whitespace preserved inside the token)
   plus balanced trailing ``<...>`` generics; if the next char is ``:``
   emit ``"::ident"``; otherwise the colon token keeps any whitespace
   the lookahead already appended;
3. ``->`` first chars: emit ``"->ident"``;
4. ``[`` first char: capture through the closing ``]`` (any chars);
5. ``@`` first char: capture ``@ident``;
6. identifier char: run of token chars, then either balanced trailing
   ``<...>`` generics or a single ``::ident`` continuation;
7. operator char: greedily extend while the prefix stays a known
   operator (table at CodeAnalyzer.cs:396-457);
8. anything else: single-character token.

Token types (CodeAnalyzer.cs:459-472): OPERATOR, ANNOTATION
(``@...`` or ``[...]``), QUALIFIED_NAME (contains ``::`` or ``.``),
GENERIC_TYPE (contains ``<`` and ``>``), TYPE_ANNOTATION (starts with
``:``), else IDENTIFIER.
"""

from __future__ import annotations

# Multi-char operators the greedy operator loop may extend into, plus
# the single-char operator set (CodeAnalyzer.cs:396-457). Membership in
# this set also decides the OPERATOR token type.
KNOWN_OPERATORS = frozenset(
    {
        "::", "->", "=>", "...", "..", "?.", "??", "<-", "|>", ":=",
        ">=", "<=", "==", "!=", "&&", "||", "++", "--", "+=", "-=",
        "*=", "/=", "<<", ">>", "<<<", ">>>",
        "(", ")", "{", "}", "[", "]", ";", ",", ".", ":", "!", "~",
        "@", "#", "$", "%", "^", "&", "*", "-", "+", "=", "|", "\\",
        "/", "?", "<", ">",
    }
)

# First characters that enter the greedy-operator branch
# (CodeAnalyzer.cs:387-394). NOTE: deliberately differs from the
# single-char entries of KNOWN_OPERATORS (e.g. ';' and ',' are known
# operators but not operator *start* chars) — reference quirk kept.
_OPERATOR_CHARS = frozenset(":->=.?<|[]@#(){}*&!~+/\\^%")

OP_OPERATOR = "OPERATOR"
OP_ANNOTATION = "ANNOTATION"
OP_QUALIFIED = "QUALIFIED_NAME"
OP_GENERIC = "GENERIC_TYPE"
OP_TYPE_ANN = "TYPE_ANNOTATION"
OP_IDENT = "IDENTIFIER"


def _is_token_char(c: str) -> bool:
    return c.isalnum() or c == "_"


def token_type(token: str) -> str:
    """Classify a raw token (CodeAnalyzer.cs:459-472)."""
    if token in KNOWN_OPERATORS:
        return OP_OPERATOR
    if token.startswith("@") or (token.startswith("[") and token.endswith("]")):
        return OP_ANNOTATION
    if "::" in token or "." in token:
        return OP_QUALIFIED
    if "<" in token and ">" in token:
        return OP_GENERIC
    if token.startswith(":"):
        return OP_TYPE_ANN
    return OP_IDENT


def code_tokenize(text: str) -> list[tuple[str, str]]:
    """Tokenize ``text`` into ``[(token, type), ...]``.

    Pure function; called per row from inside Arrow-batched UDFs.
    """
    out: list[tuple[str, str]] = []
    n = len(text)
    i = 0
    while i < n:
        # skip whitespace
        while i < n and text[i].isspace():
            i += 1
        if i >= n:
            break

        first = text[i]
        parts: list[str] = [first]
        i += 1

        if first == ":" and i < n:
            # ": Type" lookahead — whitespace chars are appended to the
            # token during lookahead whether or not the match succeeds
            # (reference quirk, CodeAnalyzer.cs:196-241).
            la = i
            while la < n and text[la].isspace():
                parts.append(text[la])
                la += 1
            if la < n and la > i and _is_token_char(text[la]):
                i = la
                while i < n and _is_token_char(text[i]):
                    parts.append(text[i])
                    i += 1
                if i < n and text[i] == "<":
                    parts.append("<")
                    i += 1
                    depth = 1
                    while i < n and depth > 0:
                        c = text[i]
                        parts.append(c)
                        i += 1
                        if c == "<":
                            depth += 1
                        elif c == ">":
                            depth -= 1
            elif i < n and text[i] == ":":
                parts.append(":")
                i += 1
                while i < n and _is_token_char(text[i]):
                    parts.append(text[i])
                    i += 1
        elif first == "-" and i < n and text[i] == ">":
            parts.append(">")
            i += 1
            while i < n and _is_token_char(text[i]):
                parts.append(text[i])
                i += 1
        elif first == "[" and i < n:
            while i < n and text[i] != "]":
                parts.append(text[i])
                i += 1
            if i < n and text[i] == "]":
                parts.append("]")
                i += 1
        elif first == "@" and i < n:
            while i < n and _is_token_char(text[i]):
                parts.append(text[i])
                i += 1
        elif _is_token_char(first):
            while i < n and _is_token_char(text[i]):
                parts.append(text[i])
                i += 1
            if i < n and text[i] == "<":
                parts.append("<")
                i += 1
                depth = 1
                while i < n and depth > 0:
                    c = text[i]
                    parts.append(c)
                    i += 1
                    if c == "<":
                        depth += 1
                    elif c == ">":
                        depth -= 1
            elif i + 1 < n and text[i] == ":" and text[i + 1] == ":":
                parts.append("::")
                i += 2
                while i < n and _is_token_char(text[i]):
                    parts.append(text[i])
                    i += 1
        elif first in _OPERATOR_CHARS:
            cur = first
            while i < n:
                candidate = cur + text[i]
                if candidate in KNOWN_OPERATORS:
                    parts.append(text[i])
                    cur = candidate
                    i += 1
                else:
                    break
        # else: single non-token, non-operator char stands alone

        token = "".join(parts)
        out.append((token, token_type(token)))
    return out


def whitespace_tokenize(text: str) -> list[str]:
    """Lucene WhitespaceTokenizer equivalent: split on whitespace runs."""
    return text.split()


import re as _re

_STANDARD_RE = _re.compile(r"\w+", _re.UNICODE)


def standard_tokenize(text: str) -> list[str]:
    """Pinned approximation of Lucene StandardTokenizer (UAX#29 word
    break) for the ``content_symbols`` chain: maximal ``\\w+`` runs.

    Divergence from UAX#29 documented: numeric tokens with interior
    ``.,`` separators ("1,000") split here; underscore joins (same as
    UAX#29 ExtendNumLet). Golden files are generated from THIS spec.
    """
    return _STANDARD_RE.findall(text)
