"""Boolean query language: AND / OR / NOT, parens, quoted phrases.

No reference analog (the reference is OR-only, SURVEY §2.7). The oracle
twin shares only the parser; its evaluation is an independent per-doc
recursive check over term presence + raw-text phrase_match, so
agreement exercises the whole engine chain (postings decode, shard-
local set algebra, positional verify, BM25 scoring of positives).
"""

import numpy as np
import pytest

from indexer_spark.boolquery import And, Or, Phrase, Term, parse
from indexer_spark.query import IndexReader


# -- parser ---------------------------------------------------------------

def test_parse_shapes():
    assert parse("alpha").root == Term("alpha")
    # implicit AND between adjacent atoms
    r = parse("alpha beta").root
    assert isinstance(r, And) and set(r.pos) == {Term("alpha"), Term("beta")}
    assert r.neg == ()
    # explicit AND is the same tree
    assert parse("alpha AND beta").root == r
    # OR binds looser than AND
    r = parse("alpha beta OR gamma").root
    assert isinstance(r, Or) and len(r.children) == 2
    # NOT folds into its AND group's negative side
    r = parse("alpha NOT beta").root
    assert isinstance(r, And) and r.pos == (Term("alpha"),)
    assert r.neg == (Term("beta"),)
    # parens override precedence
    r = parse("alpha AND (beta OR gamma)").root
    assert isinstance(r, And) and any(isinstance(c, Or) for c in r.pos)
    # double negation cancels
    assert parse("alpha NOT NOT beta").root == parse("alpha beta").root
    # operators are case-insensitive
    assert parse("alpha and beta").root == parse("alpha AND beta").root
    # quoted phrase atom
    r = parse('"green tea" NOT lemon').root
    assert isinstance(r, And) and isinstance(r.pos[0], Phrase)
    assert r.pos[0].raw == "green tea"
    # stop-word atoms vanish without affecting their group
    assert parse("the alpha of beta").root == parse("alpha beta").root
    # stemming happens at parse: query terms are index terms
    assert parse("Running").root == Term("run")


def test_parse_collects_terms():
    pq = parse('(alpha OR "green tea") NOT beta')
    assert pq.pos_terms == sorted({"alpha", "green", "tea"})
    assert pq.neg_terms == ["beta"]
    assert pq.has_phrase
    pq2 = parse("alpha beta")
    assert not pq2.has_phrase and pq2.neg_terms == []


def test_parse_collapse_and_errors():
    # collapses to nothing: matches no docs, no error
    assert parse("").root is None
    assert parse("the of is").root is None
    assert parse('"the of"').root is None
    # pure-negative queries are rejected
    for bad in ("NOT alpha", "NOT alpha NOT beta", "alpha OR NOT beta",
                "the NOT alpha"):
        with pytest.raises(ValueError):
            parse(bad)
    # syntax errors
    for bad in ("(alpha", "alpha)", "alpha AND", "AND alpha",
                "alpha OR", "alpha (OR) beta"):
        with pytest.raises(ValueError):
            parse(bad)
    # NOT of a parenthesized group is De-Morgan-correct via setdiff of
    # the whole group (kept opaque)
    r = parse("alpha NOT (beta OR gamma)").root
    assert isinstance(r, And) and isinstance(r.neg[0], Or)


# -- engine vs oracle -----------------------------------------------------

def _bool_queries_from_corpus(corpus_pdf, n=14, seed=23):
    rng = np.random.default_rng(seed)
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    out = []
    texts = pdf["text"].tolist()
    while len(out) < n:
        i = int(rng.integers(0, len(texts)))
        words = str(texts[i] or "").split()
        if len(words) < 8:
            continue
        a, b, c, d = (words[int(x)] for x in rng.integers(0, len(words), 4))
        j = int(rng.integers(0, len(words) - 2))
        ph = f'"{words[j]} {words[j + 1]}"'
        out.extend([
            f"{a} AND {b}",
            f"{a} OR {b}",
            f"{a} NOT {b}",
            f"({a} OR {b}) AND {c}",
            f"({a} OR {b}) NOT {c}",
            f"{a} {b} OR {c} {d}",
            f"{ph} OR {c}",
            f"{ph} NOT {a}",
            f"{a} NOT ({b} OR {c})",
        ])
    return out[:n * 2]


def test_bool_rank_identity_vs_oracle(spark, pos_index, corpus_pdf,
                                      oracle_index):
    """Driver fast path and distributed plan are rank-identical to the
    independent per-doc oracle across a battery of corpus-derived
    boolean queries (AND / OR / NOT / parens / phrases)."""
    index_dir, _ = pos_index
    queries = _bool_queries_from_corpus(corpus_pdf)
    r_fast = IndexReader(spark, index_dir)
    r_dist = IndexReader(spark, index_dir, fast_path_bytes=0)
    n_nonempty = 0
    try:
        for q in queries:
            want = [(d, round(s, 9))
                    for d, s in oracle_index.search_bm25_bool(q, k=10)]
            got_f = r_fast.search_bool(q, k=10)
            assert r_fast.last_path == "fast_bool", q
            got_d = r_dist.search_bool(q, k=10)
            assert r_dist.last_path == "distributed", q
            assert [(d, round(s, 9)) for d, s in got_f] == want, q
            assert [(d, round(s, 9)) for d, s in got_d] == want, q
            n_nonempty += bool(got_f)
    finally:
        r_fast.close()
        r_dist.close()
    assert n_nonempty >= len(queries) // 2


def test_bool_consistency_with_dedicated_modes(spark, pos_index, corpus_pdf):
    """The boolean language reproduces the dedicated modes exactly:
    'a AND b' == mode='and', '\"a b\"' == mode='phrase', and a pure OR
    of all-present single terms matches mode='exhaustive' doc sets."""
    index_dir, _ = pos_index
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[17]).split()
    a, b = words[0], words[1]
    r = IndexReader(spark, index_dir)
    try:
        assert r.search_bool(f"{a} AND {b}", k=25) == \
            r.search(f"{a} {b}", k=25, mode="and")
        assert r.search_bool(f'"{a} {b}"', k=25) == \
            r.search(f"{a} {b}", k=25, mode="phrase")
        # OR matches the disjunctive doc set (scores identical too:
        # same positive-term BM25 sum)
        got = r.search_bool(f"{a} OR {b}", k=25)
        want = r.search(f"{a} {b}", k=25, mode="exhaustive")
        assert got == want
        # mode='bool' delegates
        assert r.search(f"{a} AND {b}", k=25, mode="bool") == \
            r.search_bool(f"{a} AND {b}", k=25)
    finally:
        r.close()


def test_bool_not_excludes_and_never_scores(spark, pos_index, corpus_pdf,
                                            oracle_index):
    index_dir, _ = pos_index
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[2]).split()
    a, b = words[0], words[3]
    r = IndexReader(spark, index_dir)
    try:
        base = r.search_bool(a, k=None or 10_000)
        excl = r.search_bool(f"{a} NOT {b}", k=10_000)
        has_b = {d for d, _ in oracle_index.search_bm25_and(b, k=None)}
        want = [(d, s) for d, s in base if d not in has_b]
        assert excl == want  # scores unchanged: b never contributed
    finally:
        r.close()


def test_parse_prefix_atoms():
    from indexer_spark.boolquery import Prefix

    assert parse("sca*").root == Prefix("sca")
    assert parse("SCA*").root == Prefix("sca")  # lowercased, NOT stemmed
    r = parse("sca* NOT merge").root
    assert isinstance(r, And) and r.pos == (Prefix("sca"),)
    pq = parse("sca* OR hash")
    assert pq.has_prefix and pq.pos_terms == ["hash"]  # prefix unexpanded
    # exactly ONE trailing star, nothing else: the documented form
    for bad in ("*", "a*b*", "ab**", "**"):
        with pytest.raises(ValueError):
            parse(bad)


def test_prefix_expansion_cap_is_shared(spark, pos_index, oracle_index):
    """Engine dictionary expansion == oracle dictionary expansion, both
    uncapped and under a tight cap (same (-df, term) keep rule)."""
    from indexer_spark.boolquery import cap_expansions

    index_dir, _ = pos_index
    r = IndexReader(spark, index_dir)
    try:
        for prefix in ("a", "qa", "zz"):
            want_pairs = [
                (t, len(ps)) for t, ps in oracle_index.postings.items()
                if t.startswith(prefix)
            ]
            assert r.expand_prefix(prefix) == cap_expansions(want_pairs)
            assert r.expand_prefix(prefix, cap=3) == \
                cap_expansions(want_pairs, 3)
    finally:
        r.close()


def test_prefix_rank_identity_vs_oracle(spark, pos_index, corpus_pdf,
                                        oracle_index):
    index_dir, _ = pos_index
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[11]).split()
    a, b = words[0], words[2]
    queries = [
        f"{a[:2]}*",
        f"{a[:3]}* AND {b}",
        f"{b} NOT {a[:3]}*",
        f'({a[:2]}* OR {b}) NOT {words[4]}',
        f"zzqq* OR {b}",      # dead prefix in OR: other branch survives
        f"zzqq* AND {b}",     # dead prefix in AND: empties the group
    ]
    r_fast = IndexReader(spark, index_dir)
    r_dist = IndexReader(spark, index_dir, fast_path_bytes=0)
    try:
        for q in queries:
            for cap in (None, 2):
                want = [(d, round(s, 9)) for d, s in
                        oracle_index.search_bm25_bool(q, k=10,
                                                      max_expansions=cap)]
                got_f = r_fast.search_bool(q, k=10, max_expansions=cap)
                got_d = r_dist.search_bool(q, k=10, max_expansions=cap)
                assert [(d, round(s, 9)) for d, s in got_f] == want, (q, cap)
                assert [(d, round(s, 9)) for d, s in got_d] == want, (q, cap)
        assert r_fast.search_bool(f"zzqq* AND {b}", k=10) == []
        assert r_fast.search_bool("zzqq*", k=10) == []
    finally:
        r_fast.close()
        r_dist.close()


def test_bool_edge_cases(spark, pos_index, built_index, corpus_pdf):
    index_dir, _ = pos_index
    plain_dir, _ = built_index
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[5]).split()
    a, b = words[0], words[1]
    r = IndexReader(spark, index_dir)
    rp = IndexReader(spark, plain_dir)
    try:
        # collapsed / absent-positive queries return []
        assert r.search_bool("") == []
        assert r.search_bool("the of is") == []
        assert r.search_bool("zzqqxxyyzz") == []
        assert r.search_bool(f"zzqqxxyyzz OR {a}") == r.search_bool(a)
        # absent negated term is a no-op
        assert r.search_bool(f"{a} NOT zzqqxxyyzz") == r.search_bool(a)
        # pure-negative raises on the reader too
        with pytest.raises(ValueError):
            r.search_bool(f"NOT {a}")
        # boolean works on a non-positional index, until a phrase appears
        assert rp.search_bool(f"{a} NOT {b}", k=5) == \
            r.search_bool(f"{a} NOT {b}", k=5)
        with pytest.raises(ValueError, match="positions=True"):
            rp.search_bool(f'"{a} {b}"')
    finally:
        r.close()
        rp.close()
