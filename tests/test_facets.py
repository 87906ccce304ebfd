"""Facet counts over query matches (IndexReader.facet_counts):
per-value matched-doc counts for a docstore column, driver point-read
path and distributed join path both checked against a naive pandas
count over the oracle's full match list.
"""

import pytest

from indexer_spark.query import IndexReader


def _naive_facet(corpus_pdf, oracle_hits, by, k):
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    counts: dict = {}
    for d, _s in oracle_hits:
        v = pdf[by].iloc[int(d)]
        v = int(v) if by == "turn_idx" else v
        counts[v] = counts.get(v, 0) + 1
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_facet_counts_both_paths(spark, pos_index, corpus_pdf, oracle_index):
    index_dir, _ = pos_index
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[13]).split()
    q = words[0]
    want_role = _naive_facet(
        corpus_pdf, oracle_index.search_bm25(q, k=None), "role", 5)
    want_conv = _naive_facet(
        corpus_pdf, oracle_index.search_bm25(q, k=None), "conv_id", 7)
    r_fast = IndexReader(spark, index_dir)
    r_dist = IndexReader(spark, index_dir, fast_path_bytes=0)
    try:
        assert r_fast.facet_counts(q, by="role", k=5) == want_role
        assert r_dist.facet_counts(q, by="role", k=5) == want_role
        assert r_fast.facet_counts(q, by="conv_id", k=7) == want_conv
        assert r_dist.facet_counts(q, by="conv_id", k=7) == want_conv
    finally:
        r_fast.close()
        r_dist.close()


def test_export_matches(spark, pos_index, corpus_pdf, oracle_index,
                        tmp_path):
    """export_matches materializes the FULL match set (scores included)
    — row-for-row equal to the oracle's unbounded result list."""
    index_dir, _ = pos_index
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[13]).split()
    a, b = words[0], words[1]
    r = IndexReader(spark, index_dir)
    out = str(tmp_path / "export")
    try:
        n = r.export_matches(f"{a} NOT {b}", out, mode="bool")
        want = oracle_index.search_bm25_bool(f"{a} NOT {b}", k=None)
        assert n == len(want)
        got = {
            (row["doc_id"], round(row["score"], 9))
            for row in spark.read.parquet(out).collect()
        }
        assert got == {(d, round(s, 9)) for d, s in want}
        # doc identity columns resolve correctly
        row = spark.read.parquet(out).orderBy("doc_id").first()
        d0 = min(d for d, _ in want)
        assert row["doc_id"] == d0
        assert row["conv_id"] == pdf["conv_id"].iloc[d0]
        assert int(row["turn_idx"]) == int(pdf["turn_idx"].iloc[d0])
        # empty query -> empty dataset with the contract schema
        n0 = r.export_matches("zzqqxxyyzz", out)
        assert n0 == 0
        assert spark.read.parquet(out).columns == \
            ["conv_id", "turn_idx", "doc_id", "score"]
    finally:
        r.close()


def _naive_where(corpus_pdf, oracle_hits, where, k):
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    allow = {c: set(v) if isinstance(v, (list, tuple, set)) else {v}
             for c, v in where.items()}
    out = []
    for d, s in oracle_hits:  # oracle lists arrive (score desc, id asc)
        row = pdf.iloc[int(d)]
        vals = {c: (int(row[c]) if c == "turn_idx" else row[c])
                for c in allow}
        if all(vals[c] in allow[c] for c in allow):
            out.append((int(d), round(s, 9)))
            if len(out) >= k:
                break
    return out


def test_search_where_both_paths(spark, pos_index, corpus_pdf,
                                 oracle_index):
    index_dir, _ = pos_index
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[13]).split()
    q = words[0]
    cases = [
        {"role": "assistant"},
        {"role": ["user", "tool"]},
        {"role": "assistant", "turn_idx": list(range(0, 8))},
    ]
    r_fast = IndexReader(spark, index_dir)
    r_dist = IndexReader(spark, index_dir, fast_path_bytes=0)
    try:
        for where in cases:
            want = _naive_where(
                corpus_pdf, oracle_index.search_bm25(q, k=None), where, 10)
            got_f = [(d, round(s, 9))
                     for d, s in r_fast.search_where(q, where, k=10)]
            got_d = [(d, round(s, 9))
                     for d, s in r_dist.search_where(q, where, k=10)]
            assert got_f == want, where
            assert got_d == want, where
        # boolean mode + filter
        wantb = _naive_where(
            corpus_pdf,
            oracle_index.search_bm25_bool(f"{q} NOT {words[1]}", k=None),
            {"role": "user"}, 10)
        assert [(d, round(s, 9)) for d, s in r_fast.search_where(
            f"{q} NOT {words[1]}", {"role": "user"}, k=10, mode="bool",
        )] == wantb
        # scores are the unfiltered scores (filter narrows, not re-weights)
        unfiltered = dict(oracle_index.search_bm25(q, k=None))
        for d, s in r_fast.search_where(q, {"role": "assistant"}, k=10):
            assert s == pytest.approx(unfiltered[d])
        # empty / error cases
        assert r_fast.search_where("zzqqxxyyzz", {"role": "user"}) == []
        assert r_fast.search_where(q, {"role": "no_such_role"}) == []
        with pytest.raises(ValueError, match="filter column"):
            r_fast.search_where(q, {"text": "x"})
    finally:
        r_fast.close()
        r_dist.close()


def test_facet_counts_modes_and_errors(spark, pos_index, corpus_pdf,
                                       oracle_index):
    index_dir, _ = pos_index
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[13]).split()
    a, b = words[0], words[1]
    r = IndexReader(spark, index_dir)
    try:
        # AND-mode facets == naive over conjunctive matches
        want = _naive_facet(
            corpus_pdf, oracle_index.search_bm25_and(f"{a} {b}", k=None),
            "role", 5)
        assert r.facet_counts(f"{a} {b}", by="role", k=5, mode="and") == want
        # boolean facets == naive over the boolean match list
        wantb = _naive_facet(
            corpus_pdf, oracle_index.search_bm25_bool(f"{a} NOT {b}", k=None),
            "role", 5)
        assert r.facet_counts(f"{a} NOT {b}", by="role", k=5,
                              mode="bool") == wantb
        # facet totals == match count
        n_matches = len(oracle_index.search_bm25(a, k=None))
        got = r.facet_counts(a, by="role", k=100)
        assert sum(c for _v, c in got) == n_matches
        # empty / absent queries
        assert r.facet_counts("zzqqxxyyzz", by="role") == []
        assert r.facet_counts("the of", by="role") == []
        with pytest.raises(ValueError, match="facet column"):
            r.facet_counts(a, by="text")
    finally:
        r.close()


def test_positional_facets_need_positions(spark, built_index, corpus_pdf):
    """facet_counts/search_where surface the positions=True requirement
    even for queries that would be empty by construction (same contract
    as search_df)."""
    index_dir, _ = built_index
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    w = str(pdf["text"].iloc[3]).split()[0]
    r = IndexReader(spark, index_dir)
    try:
        for fn in (
            lambda: r.facet_counts(f"{w} zzqqxxyyzz", mode="phrase"),
            lambda: r.facet_counts(w, mode="near"),
            lambda: r.search_where(f"{w} zzqqxxyyzz", {"role": "user"},
                                   mode="near"),
        ):
            with pytest.raises(ValueError, match="positions=True"):
                fn()
    finally:
        r.close()
