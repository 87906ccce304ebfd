"""Proximity (NEAR) search over positional postings.

mode='near': docs whose distinct query terms co-occur within a
``window``-token span of the raw post-lex token stream (unordered
min-cover, stop-word slots counted). No reference analog (the
reference is OR-only, SURVEY §2.7); the oracle twin re-derives
positions from raw text per doc (oracle.near_match), independently of
the index payload, so agreement checks the whole positional chain
under the relaxed (windowed) predicate too.
"""

import numpy as np
import pandas as pd
import pytest

from indexer_spark.build import BuildConfig, build_index
from indexer_spark.oracle import OracleIndex
from indexer_spark.query import IndexReader


def test_near_match_oracle_semantics():
    """The naive twin itself behaves as specified on handcrafted docs."""
    o = OracleIndex([])
    txt = "alpha beta gamma delta epsilon zeta alpha"
    # adjacent terms: span 1
    assert o.near_match(txt, "alpha beta", 1)
    assert not o.near_match(txt, "alpha gamma", 1)
    assert o.near_match(txt, "alpha gamma", 2)
    # unordered: order in the query must not matter
    assert o.near_match(txt, "gamma alpha", 2)
    # min-cover picks the CLOSEST occurrence pair (second 'alpha' is
    # adjacent to 'zeta')
    assert o.near_match(txt, "zeta alpha", 1)
    # three terms: need all within the span
    assert o.near_match(txt, "alpha beta gamma", 2)
    assert not o.near_match(txt, "alpha beta delta", 2)
    assert o.near_match(txt, "alpha beta delta", 3)
    # stop-word slots widen gaps but are not themselves terms
    gap = "red of the blue"
    assert o.near_match(gap, "red blue", 3)
    assert not o.near_match(gap, "red blue", 2)
    # absent term / empty query
    assert not o.near_match(txt, "alpha zzzz", 99)
    assert not o.near_match(txt, "", 99)
    # single present term: span 0
    assert o.near_match(txt, "delta", 0)


def _near_queries_from_corpus(corpus_pdf, n=12, seed=11):
    """(query, window) pairs sliced from real documents: nearby word
    pairs/triples with windows straddling their actual span."""
    rng = np.random.default_rng(seed)
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    out = []
    for i in rng.choice(len(pdf), size=n * 4, replace=False):
        words = str(pdf["text"].iloc[int(i)] or "").split()
        if len(words) < 8:
            continue
        s = int(rng.integers(0, len(words) - 6))
        span = int(rng.integers(2, 6))
        w1, w2 = words[s], words[s + span]
        if w1 == w2:
            continue
        # one window likely-tight, one likely-loose around the span
        out.append((f"{w1} {w2}", max(1, span - 2)))
        out.append((f"{w2} {w1}", span + 1))
        if len(words) > s + 8:
            out.append((f"{w1} {words[s + 3]} {words[s + 7]}", 7))
        if len(out) >= n:
            break
    return out


def test_near_rank_identity_vs_oracle(spark, pos_index, corpus_pdf,
                                      oracle_index):
    """Both execution paths — driver fast path and the distributed plan
    (fast paths disabled) — are rank-identical to the naive oracle on
    corpus-sliced proximity queries at tight and loose windows."""
    index_dir, _ = pos_index
    queries = _near_queries_from_corpus(corpus_pdf)
    assert len(queries) >= 10
    r_fast = IndexReader(spark, index_dir)
    r_dist = IndexReader(spark, index_dir, fast_path_bytes=0)
    n_nonempty = 0
    try:
        for q, w in queries:
            want = oracle_index.search_bm25_near(q, window=w, k=10)
            want_r = [(d, round(s, 9)) for d, s in want]
            got_f = r_fast.search(q, k=10, mode="near", window=w)
            assert r_fast.last_path == "fast_near", (q, w)
            got_d = r_dist.search(q, k=10, mode="near", window=w)
            assert r_dist.last_path == "distributed", (q, w)
            assert [(d, round(s, 9)) for d, s in got_f] == want_r, (q, w)
            assert [(d, round(s, 9)) for d, s in got_d] == want_r, (q, w)
            n_nonempty += bool(got_f)
    finally:
        r_fast.close()
        r_dist.close()
    assert n_nonempty >= len(queries) // 2  # sliced from real docs


def test_near_degenerates_to_and_at_huge_window(spark, pos_index,
                                                corpus_pdf, oracle_index):
    index_dir, _ = pos_index
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[9]).split()
    q = f"{words[0]} {words[-1]}"
    r = IndexReader(spark, index_dir)
    try:
        got = r.search(q, k=50, mode="near", window=1 << 30)
        want = oracle_index.search_bm25_and(q, k=50)
        assert [(d, pytest.approx(s)) for d, s in want] == got
        # and the tight window returns a subset of the loose one
        tight = {d for d, _ in r.search(q, k=1000, mode="near", window=2)}
        loose = {d for d, _ in r.search(q, k=1000, mode="near", window=1 << 30)}
        assert tight <= loose
    finally:
        r.close()


def test_near_edge_cases(spark, pos_index, oracle_index, corpus_pdf):
    index_dir, _ = pos_index
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[5]).split()
    r = IndexReader(spark, index_dir)
    try:
        # single-word query: always within any window => equals AND
        got = r.search(words[0], k=10, mode="near", window=0)
        assert got == [
            (d, pytest.approx(s)) for d, s in
            oracle_index.search_bm25_and(words[0], k=10)
        ]
        # window=0 across distinct terms can never match
        assert r.search(f"{words[0]} {words[1]}", k=10, mode="near",
                        window=0) == []
        # stop-word-only and empty queries
        assert r.search("the of and is", k=10, mode="near", window=5) == []
        assert r.search("", k=10, mode="near", window=5) == []
        # absent term empties the conjunction
        assert r.search(words[0] + " zzqqxxyyzz", k=10, mode="near",
                        window=99) == []
        # repeated query term == its distinct form (multiplicity ignored)
        a, b = words[0], words[1]
        assert r.search(f"{a} {b} {a}", k=10, mode="near", window=4) == \
            r.search(f"{a} {b}", k=10, mode="near", window=4)
    finally:
        r.close()


def test_near_requires_positional_index(spark, built_index):
    index_dir, _ = built_index
    r = IndexReader(spark, index_dir)
    try:
        with pytest.raises(ValueError, match="positions=True"):
            r.search("hello world", k=10, mode="near", window=3)
        with pytest.raises(ValueError, match="positions=True"):
            r.search_df("hello world", k=10, mode="near", window=3)
    finally:
        r.close()


def test_near_stopword_gap_counts_in_window(spark, tmp_path):
    """Dropped stop-words still occupy offsets: 'red of the blue' needs
    window >= 3 for red~blue even though only 2 terms are indexed."""
    index_dir = str(tmp_path / "nidx")
    base = pd.DataFrame({
        "conv_id": ["a", "b"],
        "turn_idx": [0, 0],
        "role": ["user"] * 2,
        "text": ["red of the blue paint", "red blue paint"],
    })
    build_index(spark, spark.createDataFrame(base), index_dir,
                BuildConfig(shard_docs=8, positions=True))
    r = IndexReader(spark, index_dir)
    try:
        assert {d for d, _ in r.search("red blue", k=10, mode="near",
                                       window=1)} == {1}
        assert {d for d, _ in r.search("red blue", k=10, mode="near",
                                       window=3)} == {0, 1}
    finally:
        r.close()
