"""Hybrid retrieval: BM25 candidates -> embedding cosine rerank
(IndexReader.search_rerank). No reference analog; the oracle twin is a
naive numpy rerank of the OracleIndex's own BM25 list over the same
vectors parquet — independent of the engine's candidate machinery and
pyarrow point-read path.
"""

import numpy as np
import pytest

from indexer_spark.query import IndexReader


@pytest.fixture(scope="module")
def vectors(corpus_pdf, tmp_path_factory):
    """Deterministic random embeddings keyed by doc_id, with a few ids
    deliberately MISSING (engine must drop unrankable candidates)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(corpus_pdf)
    rng = np.random.default_rng(99)
    vecs = rng.normal(size=(n, 16)).astype(np.float32)
    ids = [i for i in range(n) if i % 97 != 3]  # ~1% missing
    path = str(tmp_path_factory.mktemp("vecs") / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([vecs[i].tolist() for i in ids],
                              type=pa.list_(pa.float32())),
    }), path)
    return path, vecs, set(ids)


def _naive_rerank(oracle_index, vecs, present, q, qvec, k, n_cand,
                  alpha=0.0):
    hits = oracle_index.search_bm25(q, k=n_cand)
    qd = np.asarray(qvec, dtype=np.float64)
    out = []
    for d, bm25 in hits:
        if d not in present:
            continue
        v = vecs[d].astype(np.float64)
        cos = float(v @ qd) / (float(np.sqrt(v @ v)) *
                               float(np.sqrt(qd @ qd)))
        out.append((d, alpha * bm25 + (1 - alpha) * cos, bm25))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def test_search_rerank_matches_naive(spark, built_index, corpus_pdf,
                                     oracle_index, vectors):
    index_dir, _ = built_index
    path, vecs, present = vectors
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[21]).split()
    q = f"{words[0]} {words[1]}"
    qvec = vecs[0]
    r = IndexReader(spark, index_dir)
    try:
        for alpha in (0.0, 0.35, 1.0):
            got = r.search_rerank(q, path, k=10, n_candidates=60,
                                  alpha=alpha, query_vec=qvec)
            want = _naive_rerank(oracle_index, vecs, present, q, qvec,
                                 10, 60, alpha)
            assert [(d, round(b, 9), round(s, 9)) for d, b, s in got] == \
                [(d, round(b, 9), round(s, 9)) for d, b, s in want], alpha
        # by-id query vector == passing the same vector (id 0 present)
        by_id = r.search_rerank(q, path, k=10, n_candidates=60,
                                query_vec_id=0)
        by_vec = r.search_rerank(q, path, k=10, n_candidates=60,
                                 query_vec=vecs[0])
        assert by_id == by_vec
        # alpha=1.0 preserves BM25 order over rankable candidates
        a1 = r.search_rerank(q, path, k=10, n_candidates=60, alpha=1.0,
                             query_vec=qvec)
        bm = [d for d, _ in oracle_index.search_bm25(q, k=60)
              if d in present][:10]
        assert [d for d, _, _ in a1] == bm
    finally:
        r.close()


def test_search_rerank_modes_and_errors(spark, pos_index, corpus_pdf,
                                        vectors):
    index_dir, _ = pos_index
    path, vecs, _present = vectors
    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    words = str(pdf["text"].iloc[21]).split()
    a, b = words[0], words[1]
    r = IndexReader(spark, index_dir)
    try:
        # boolean candidates: every reranked doc satisfies the query
        got = r.search_rerank(f"{a} NOT {b}", path, k=10,
                              n_candidates=50, mode="bool", query_vec=vecs[1])
        base = {d for d, _ in r.search_bool(f"{a} NOT {b}", k=50)}
        assert got and {d for d, _, _ in got} <= base
        # bm25 column carries the stage-1 score
        stage1 = dict(r.search_bool(f"{a} NOT {b}", k=50))
        for d, _s, bm25 in got:
            assert bm25 == pytest.approx(stage1[d])
        # empty stage 1 -> empty
        assert r.search_rerank("zzqqxxyyzz", path, query_vec=vecs[0]) == []
        with pytest.raises(ValueError, match="exactly one"):
            r.search_rerank(a, path)
        with pytest.raises(ValueError, match="exactly one"):
            r.search_rerank(a, path, query_vec=vecs[0], query_vec_id=1)
        with pytest.raises(ValueError, match="not in"):
            r.search_rerank(a, path, query_vec_id=3)  # id 3 is missing
    finally:
        r.close()
