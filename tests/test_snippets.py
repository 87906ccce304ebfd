"""Snippet/highlight generation (snippets.py + lexer.term_char_spans).

No reference analog (the reference prints file paths, server.rs:90-101);
this is the serving-side "show why it matched" layer over the same
lexer the index uses — so stemming and stop-word semantics agree with
scoring by construction.
"""

import pytest

from indexer_spark.lexer import term_char_spans, term_occurrences, tokenize
from indexer_spark.snippets import ELLIPSIS, make_snippet, match_spans


def test_term_char_spans_mirror_tokenization():
    texts = [
        "The quick brown Foxes were running fast; a fox RAN past!",
        "café au lait, café crème ٣٤٥",
        "state of the art 2024 designs",
        "", None,
    ]
    for t in texts:
        spans = term_char_spans(t)
        # same term stream as tokenize (order and multiplicity)
        assert [x[0] for x in spans] == tokenize(t)
        # spans index the original text and lex back to their term
        for term, s, e in spans:
            assert 0 <= s < e <= len(t)
            assert tokenize(t[s:e]) == [term]
        # count parity with term_occurrences
        occ = term_occurrences(t)
        counts = {}
        for term, _s, _e in spans:
            counts[term] = counts.get(term, 0) + 1
        assert counts == {k: len(v) for k, v in occ.items()}


def test_match_spans_stemming_and_stopwords():
    txt = "Running the runner runs; stop the stopped runs"
    got = match_spans(txt, {"run"})
    assert [txt[s:e] for _, s, e in got] == ["Running", "runs", "runs"]
    assert match_spans(txt, {"the"}) == []  # stop words never match


def test_make_snippet_picks_best_window_and_offsets():
    txt = ("alpha filler filler filler beta gamma filler alpha beta gamma "
           "delta filler filler epsilon")
    out = make_snippet(txt, {"alpha", "beta", "gamma", "delta"},
                       max_chars=30)
    snip = out["snippet"]
    # the window with the most distinct terms is the second cluster
    assert "alpha beta gamma delta" in snip
    marked = {snip[s:e] for _, s, e in out["matches"]}
    assert {"alpha", "beta", "gamma", "delta"} <= marked
    # every reported span renders its term
    for term, s, e in out["matches"]:
        assert tokenize(snip[s:e]) == [term]


def test_make_snippet_edges():
    # no match: head of text, word-snapped, ellipsis only when truncated
    long = "word " * 50
    out = make_snippet(long, {"zz"}, max_chars=23)
    assert out["matches"] == [] and out["snippet"].endswith(ELLIPSIS)
    assert " wor" not in out["snippet"][-5:]  # no split word before …
    short = "tiny text"
    assert make_snippet(short, {"zz"}) == {"snippet": short, "matches": []}
    assert make_snippet("", {"x"}) == {"snippet": "", "matches": []}
    assert make_snippet(None, set()) == {"snippet": "", "matches": []}
    # whole text fits: no ellipses, absolute offsets
    txt = "green tea with lemon"
    out = make_snippet(txt, {"lemon"}, max_chars=200)
    assert out["snippet"] == txt
    assert [txt[s:e] for _, s, e in out["matches"]] == ["lemon"]


def test_make_snippet_oversized_single_span():
    """A matched token longer than the whole budget must render as its
    own window, never crash (was an IndexError reachable from the
    server's &snippets=N)."""
    assert make_snippet("hello world", {"hello"}, max_chars=2)[
        "matches"] == [["hello", 0, 5]]
    long_tok = "a" * 300
    out = make_snippet(f"x {long_tok} y", {tokenize(long_tok)[0]},
                       max_chars=160)
    assert out["matches"] and long_tok in out["snippet"]


def test_make_snippet_budget_respected():
    import numpy as np

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "pad", "fill", "x", "yy"]
    for _ in range(50):
        txt = " ".join(rng.choice(vocab, size=int(rng.integers(5, 80))))
        out = make_snippet(txt, {"alpha", "beta"}, max_chars=40)
        core = out["snippet"].strip(ELLIPSIS)
        # budget holds unless a single span alone exceeds it (none here)
        assert len(core) <= 40 + max(len(w) for w in vocab) * 2
        for term, s, e in out["matches"]:
            assert tokenize(out["snippet"][s:e]) == [term]


def test_positive_terms_modes(spark, pos_index):
    from indexer_spark.query import IndexReader

    index_dir, _ = pos_index
    r = IndexReader(spark, index_dir)
    try:
        assert r.positive_terms("Running fast") == {"run", "fast"}
        assert r.positive_terms("xx NOT yy", mode="bool") == {"xx"}
        assert r.positive_terms('("green tea" OR x) NOT y',
                                mode="bool") == {"green", "tea", "x"}
        # prefix atoms expand against the real dictionary
        exp = r.positive_terms("qa* NOT x", mode="bool")
        assert exp == set(r.expand_prefix("qa"))
    finally:
        r.close()
