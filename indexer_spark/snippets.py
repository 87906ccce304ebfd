"""Snippet + highlight generation for serving results.

The index stores no raw text (the docstore maps doc_id -> (conv_id,
turn_idx); the source-of-truth transcripts table keeps the text), so
snippets are rendered driver-side over the k RESULT texts only — a pure
string problem, no Spark. Given a hit's text and the query's positive
terms, pick the window that shows the best evidence of the match:
maximal distinct query terms, then maximal total matches, within a
character budget; expand the remainder of the budget around it to word
boundaries and report match spans relative to the snippet so a caller
can bold them. No reference analog (the reference prints file paths,
server.rs:90-101) — this is the standard serving nicety on top.
"""

from __future__ import annotations

from .lexer import term_char_spans

ELLIPSIS = "…"


def match_spans(text: str | None,
                terms: set[str]) -> list[tuple[str, int, int]]:
    """(term, start, end) char spans of every occurrence of ``terms``
    in ``text``, via the same lexer the index used (stemming included:
    querying 'running' highlights 'runs')."""
    return [(t, s, e) for (t, s, e) in term_char_spans(text) if t in terms]


def _best_window(spans, max_chars: int) -> tuple[int, int]:
    """Two-pointer over match spans: the [i, j] index window whose char
    extent fits max_chars with the most distinct terms, then the most
    matches, then leftmost. Returns (i, j) inclusive."""
    counts: dict[str, int] = {}
    best = (0, 0)
    best_key = (-1, -1)
    i = 0
    for j, (t, _s, e) in enumerate(spans):
        counts[t] = counts.get(t, 0) + 1
        # i < j: a single span longer than the budget IS its own window
        # (the match must be shown regardless); without the bound the
        # shrink walks past j and indexes off the end
        while i < j and e - spans[i][1] > max_chars:
            ti = spans[i][0]
            counts[ti] -= 1
            if not counts[ti]:
                del counts[ti]
            i += 1
        key = (len(counts), j - i + 1)
        if key > best_key:
            best_key = key
            best = (i, j)
    return best


def make_snippet(text: str | None, terms: set[str],
                 max_chars: int = 160) -> dict:
    """-> {"snippet": str, "matches": [[term, start, end], ...]} with
    match offsets RELATIVE to the snippet string. A text with no match
    (or an empty term set) returns its head. Ellipses mark truncation
    on either side; cuts snap outward-to-inward on whitespace so words
    are never split."""
    if not text:
        return {"snippet": "", "matches": []}
    spans = match_spans(text, terms) if terms else []
    if not spans:
        if len(text) <= max_chars:
            return {"snippet": text, "matches": []}
        cut = text.rfind(" ", 0, max_chars)
        cut = cut if cut > 0 else max_chars
        return {"snippet": text[:cut] + ELLIPSIS, "matches": []}
    i, j = _best_window(spans, max_chars)
    lo, hi = spans[i][1], spans[j][2]
    # spend the remaining budget symmetrically around the evidence
    pad = max(0, max_chars - (hi - lo)) // 2
    start, end = max(0, lo - pad), min(len(text), hi + pad)
    # snap to word boundaries (inward: never grow past the budget)
    if start > 0:
        nxt = text.find(" ", start, lo)
        start = (nxt + 1) if nxt >= 0 else start
    if end < len(text):
        prv = text.rfind(" ", hi, end)
        end = prv if prv >= 0 else end
    snippet = text[start:end]
    prefix = ELLIPSIS if start > 0 else ""
    suffix = ELLIPSIS if end < len(text) else ""
    off = len(prefix) - start
    matches = [
        [t, s + off, e + off]
        for (t, s, e) in spans
        if s >= start and e <= end
    ]
    return {"snippet": prefix + snippet + suffix, "matches": matches}
