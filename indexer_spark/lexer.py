"""Tokenizer with the reference engine's exact lexing semantics.

Pipeline per document (mirrors /root/reference — see SURVEY.md §2.2):
  1. lowercase the WHOLE text (parsers.rs:66,111,158,212,254; lib.rs:93)
  2. scan left to right (lexer.rs:66-84):
       - skip whitespace
       - leading numeric char  -> chop the maximal numeric-only run
       - leading alphabetic char -> chop the maximal ALPHANUMERIC run,
         then Snowball-English stem it (lexer.rs:77-81, 93-96)
       - anything else -> emit the single character as a token
         (punctuation IS indexed — quirk Q4)
  3. remove stop words AFTER stemming, using the unstemmed NLTK English
     list (lexer.rs:107-128; quirk Q5)

Unicode note: the Rust lexer classifies with `char::is_numeric`
(categories Nd|Nl|No), `char::is_alphabetic` (Alphabetic) and
`char::is_whitespace` (White_Space). Python's `str.isnumeric` /
`str.isalpha` / `str.isspace` match these on all characters exercised by
the fixtures (ASCII + accented letters + non-ASCII digits); the known edge
differences (Other_Alphabetic combining marks, a few isspace controls) are
outside the synthesized corpus and documented here rather than chased.

The ASCII fast path is a single compiled regex over the lowercased text —
on ASCII input it is exactly equivalent to the scanner above.
"""

from __future__ import annotations

import re
from collections import Counter

from .porter2 import stem_cached
from .stopwords import STOP_SET

# numeric run | alphabetic-initial alphanumeric run | any single non-space.
# ASCII-only: on lowercased ASCII text the classes {0-9}, {a-z} coincide
# with Rust's is_numeric / is_alphabetic, and ASCII ∩ White_Space is
# exactly [ \t\n\r\x0b\x0c].
_ASCII_TOKEN_RE = re.compile(r"[0-9]+|[a-z][a-z0-9]*|[^ \t\n\r\x0b\x0c]")


def _lex_unicode_raw(s: str) -> list[str]:
    """Slow path mirroring the Rust char-class scanner for non-ASCII
    text. Emits RAW tokens; stemming/stop-filtering happen in
    ``_final`` (keyed on the raw token, so it runs once per unique
    token, not once per occurrence)."""
    toks: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        if c.isnumeric():
            j = i + 1
            while j < n and s[j].isnumeric():
                j += 1
            toks.append(s[i:j])
            i = j
        elif c.isalpha():
            j = i + 1
            while j < n and s[j].isalnum():
                j += 1
            toks.append(s[i:j])
            i = j
        else:
            toks.append(c)
            i += 1
    return toks


# raw token -> final term (stemmed iff alphabetic-initial, exactly the
# scanner's stem condition) or None if stop-filtered. Bounded like a
# worker-local dictionary cache: Zipf means the hot head covers almost
# all occurrences; clearing on overflow only costs re-derivation.
_FINAL: dict[str, str | None] = {}
_FINAL_MAX = 2_000_000
_MISS = object()


def _final(raw: str):
    f = _FINAL.get(raw, _MISS)
    if f is _MISS:
        f = stem_cached(raw) if raw[0].isalpha() else raw
        if f in STOP_SET:
            f = None
        if len(_FINAL) >= _FINAL_MAX:
            _FINAL.clear()
        _FINAL[raw] = f
    return f


def _raw_tokens(text: str | None) -> list[str]:
    if not text:
        return []
    s = text.lower()
    if s.isascii():
        return _ASCII_TOKEN_RE.findall(s)
    return _lex_unicode_raw(s)


def tokenize(text: str | None) -> list[str]:
    """Full reference-parity tokenization of one document or query."""
    out = []
    append = out.append
    final = _final
    for t in _raw_tokens(text):
        f = final(t)
        if f is not None:
            append(f)
    return out


def term_char_spans(text: str | None) -> list[tuple[str, int, int]]:
    """(final_term, start, end) character spans in the ORIGINAL text for
    every indexed (non-stop) token occurrence, in stream order — the
    display-side complement of term_occurrences, used for highlighting.

    Spans index the text as given: the ASCII fast path scans the
    lowercased copy (same length by construction); the unicode path
    scans the original with the same char classes and lowercases per
    token, which matches the indexing tokenization except for exotic
    case-fold edge cases (e.g. İ) where lower() changes string length —
    a display feature tolerates that, the index never sees it."""
    if not text:
        return []
    out: list[tuple[str, int, int]] = []
    final = _final
    if text.isascii():
        for m in _ASCII_TOKEN_RE.finditer(text.lower()):
            f = final(m.group())
            if f is not None:
                out.append((f, m.start(), m.end()))
        return out
    s = text
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        if c.isnumeric():
            j = i + 1
            while j < n and s[j].isnumeric():
                j += 1
        elif c.isalpha():
            j = i + 1
            while j < n and s[j].isalnum():
                j += 1
        else:
            j = i + 1
        f = final(s[i:j].lower())
        if f is not None:
            out.append((f, i, j))
        i = j
    return out


def term_occurrences(text: str | None) -> dict[str, list[int]]:
    """term -> token positions for one document or query.

    Positions index the RAW post-lex token stream: stop-word slots keep
    their index but are never emitted, so a phrase query like "state of
    the art" matches documents across the dropped "of the" gap exactly.
    len(positions) == term_counts(text)[term] for every term (two raw
    tokens that stem to the same final term merge their position lists,
    in stream order)."""
    raw = _raw_tokens(text)
    occ: dict[str, list[int]] = {}
    final = _final
    for i, t in enumerate(raw):
        f = final(t)
        if f is not None:
            lst = occ.get(f)
            if lst is None:
                occ[f] = [i]
            else:
                lst.append(i)
    return occ


def term_counts(text: str | None) -> dict[str, int]:
    """term -> tf for one document (reference add_doc, tree.rs:146-160).

    Counts RAW tokens first (collections.Counter's C loop), then
    stems/stop-filters once per UNIQUE raw token — the per-occurrence
    Python work that dominated the build's tokenize stage collapses to
    a per-unique lookup."""
    raw = _raw_tokens(text)
    if not raw:
        return {}
    counts: dict[str, int] = {}
    final = _final
    for t, c in Counter(raw).items():
        f = final(t)
        if f is not None:
            counts[f] = counts.get(f, 0) + c
    return counts
