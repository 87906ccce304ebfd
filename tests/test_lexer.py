"""Lexer parity tests — reference semantics from /root/reference/src/lexer.rs.

These pin the exact behaviors listed in SURVEY.md §2.2 (P1-P4) and the
quirks Q4/Q5 that the whole rank-identity chain depends on.
"""

from hypothesis import given, strategies as st

from indexer_spark.lexer import _final, _lex_unicode_raw, term_counts, tokenize
from indexer_spark.porter2 import stem
from indexer_spark.stopwords import STOP_SET


def test_basic_tokens():
    # "running" stems to "run"; "the" is a stop word
    assert tokenize("the running dog") == ["run", "dog"]


def test_punctuation_single_char_tokens():
    # Q4: punctuation IS emitted as tokens (lexer.rs:82-83)
    # note: "y" is itself an NLTK stop word, so it is filtered
    assert tokenize("x.y") == ["x", "."]
    assert tokenize("x.z") == ["x", ".", "z"]
    assert tokenize("don't") == ["'"]  # don(stop) ' t(stop) -> only "'" survives
    assert tokenize("(nested)") == ["(", "nest", ")"]


def test_numeric_runs():
    # numeric-initial chops numeric-only run: "3.14" -> 3 . 14
    assert tokenize("3.14") == ["3", ".", "14"]
    assert tokenize("2026 12 05") == ["2026", "12", "05"]


def test_mixed_alnum():
    # alpha-initial chops ALPHANUMERIC run (stemmed); digit-initial stops at alpha
    assert tokenize("abc123") == ["abc123"]
    assert tokenize("123abc") == ["123", "abc"]


def test_lowercasing_applies_to_whole_text():
    assert tokenize("Running DOGS") == tokenize("running dogs")


def test_stopwords_filtered_after_stemming():
    # Q5: "was" survives stemming as "was" (in list -> dropped);
    # "running" stems to "run" which is NOT in the list -> kept
    assert tokenize("was running") == ["run"]
    # "doing" -> stem "do" -> in list -> dropped
    assert tokenize("doing it") == []


def test_empty_and_whitespace():
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("   \t\n ") == []


def test_unicode_paths_agree_with_ascii_fastpath():
    # same ASCII text via both code paths must agree
    for text in ["hello world 42!", "a.b,c 123abc don't", "x  y\tz"]:
        fast = tokenize(text)
        slow = [f for f in map(_final, _lex_unicode_raw(text.lower())) if f is not None]
        assert fast == slow, text


def test_unicode_classes():
    # accented letters are alphabetic; arabic-indic digits are numeric;
    # Ⅻ (Roman numeral, category Nl) is numeric-first like Rust is_numeric
    assert tokenize("café") == [stem("café")]
    assert tokenize("٣٤٥") == ["٣٤٥"]
    assert tokenize("Ⅻ") == ["ⅻ"]  # lowercased by P1, then numeric run
    assert tokenize("x²") == ["x²"]  # ² is numeric => alnum run continues? no:
    # NOTE: '²' is numeric (No) and alphanumeric, so the alpha-initial run
    # "x²" consumes it (is_alphanumeric includes numeric categories).


def test_term_counts():
    assert term_counts("dog dog cat") == {"dog": 2, "cat": 1}


@given(st.text(max_size=200))
def test_tokenize_total_and_stable(text):
    a = tokenize(text)
    b = tokenize(text)
    assert a == b
    for t in a:
        assert t  # no empty tokens
        assert t not in STOP_SET


@given(st.text(alphabet="ab c.3é٣ \t", max_size=80))
def test_fastpath_equals_slowpath_on_mixed(text):
    # force comparison: run the unicode scanner on any text and compare
    # with tokenize() (which picks the path itself)
    expected = [f for f in map(_final, _lex_unicode_raw(text.lower())) if f is not None]
    assert tokenize(text) == expected
