"""Oracle semantics tests (the oracle is the correctness standard —
the reference repo ships zero tests, SURVEY.md §5)."""

import math

from indexer_spark.oracle import BM25_B, BM25_K1, OracleIndex
from indexer_spark.synth import gen_queries, gen_transcripts


def make_index(docs):
    return OracleIndex(list(enumerate(docs)))


def test_n_counts_empty_docs_q1():
    idx = make_index(["dog cat", "", "the of and"])  # doc1 empty, doc2 all-stop
    assert idx.n_docs == 3
    assert idx.doc_len == {0: 2, 1: 0, 2: 0}


def test_postings_sorted_by_doc_id():
    idx = make_index(["dog", "dog dog", "cat dog"])
    assert idx.postings["dog"] == [(0, 1), (1, 2), (2, 1)]
    assert idx.df("dog") == 3
    assert idx.df("missing") == 0


def test_tfidf_reference_scoring():
    idx = make_index(["dog cat", "dog", "fish"])
    # df(dog)=2, N=3 -> idf = |ln(3/2)|
    res = dict(idx.search_tfidf("dog"))
    idf = abs(math.log(3 / 2))
    assert math.isclose(res[0], idf) and math.isclose(res[1], idf)
    assert 2 not in res


def test_tfidf_idf_zero_docs_dropped_q3():
    # term in every doc -> idf = ln(1) = 0 -> score 0 -> dropped (P8)
    idx = make_index(["dog", "dog", "dog"])
    assert idx.search_tfidf("dog") == []


def test_tfidf_repeated_query_term_q9():
    # query "dog dog": m=2 -> df'=2*df, idf=|ln(N/2df)|, contribution 4*tf*idf
    idx = make_index(["dog cat", "dog", "fish", "cat", "bird"])
    df = 2
    n = 5
    single = dict(idx.search_tfidf("dog"))
    double = dict(idx.search_tfidf("dog dog"))
    idf1 = abs(math.log(n / df))
    idf2 = abs(math.log(n / (2 * df)))
    assert math.isclose(single[1], idf1)
    assert math.isclose(double[1], 4 * idf2)


def test_bm25_scoring_and_order():
    idx = make_index(["dog cat bird", "dog dog", "fish", "dog"])
    res = idx.search_bm25("dog")
    assert [d for d, _ in res][:1] == [1]  # tf=2, shortish doc wins
    n, df = 4, 3
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    dl, avgdl = 2, idx.avgdl
    expected = idf * 2 * (BM25_K1 + 1) / (2 + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
    assert math.isclose(res[0][1], expected, rel_tol=1e-12)


def test_bm25_dedups_query_terms():
    idx = make_index(["dog cat", "dog", "fish"])
    assert idx.search_bm25("dog dog") == idx.search_bm25("dog")


def test_tie_break_doc_id_asc():
    idx = make_index(["dog", "dog", "fish"])
    res = idx.search_tfidf("dog")
    assert [d for d, _ in res] == [0, 1]
    res = idx.search_bm25("dog")
    assert [d for d, _ in res] == [0, 1]


def test_absent_and_empty_queries():
    idx = make_index(["dog cat"])
    assert idx.search_tfidf("zzz") == []
    assert idx.search_bm25("") == []
    assert idx.search_bm25("the and of") == []  # stop-words only


def test_synth_determinism_and_shape():
    a = gen_transcripts(500, seed=42)
    b = gen_transcripts(500, seed=42)
    assert a.equals(b)
    assert len(a) == 500
    assert list(a.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # (conv_id, turn_idx) unique, dense per conversation
    assert not a.duplicated(["conv_id", "turn_idx"]).any()
    assert (a.groupby("conv_id")["turn_idx"].agg(["min"])["min"] == 0).all()
    # some empty turns exist
    assert (a["text"] == "").sum() >= 1


def test_synth_queries_hit_corpus():
    pdf = gen_transcripts(2000, seed=42)
    idx = OracleIndex(list(enumerate(pdf["text"].tolist())))
    queries = gen_queries()
    nonempty = 0
    for _qid, q, k in queries:
        res = idx.search_bm25(q, k)
        nonempty += bool(res)
    assert nonempty >= 15  # most queries match something
    # stop-word-only and empty and absent queries return nothing
    assert idx.search_bm25("the and of") == []
    assert idx.search_bm25("zzzzqqqqxxxx") == []
