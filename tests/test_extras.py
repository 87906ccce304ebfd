"""Tests for the training-data pipeline extras (dedup, similarity,
text stats, multimodal plumbing)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from indexer_spark.extras import dedup, multimodal, simsearch, textstats


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),       # exact dup of 0
        (2, "the quick brown fox jumped over the lazy dog"),      # near dup
        (3, "completely different content about spark engines"),
        (4, "spark engines process completely different content"),  # same tokens as 3
        (5, "unrelated short text"),
        (6, ""),
        (7, "zebra xylophone quantum jazz"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs_df):
    out = dedup.exact_duplicates(docs_df).collect()
    assert len(out) == 1
    assert out[0]["n_dups"] == 2 and out[0]["keeper"] == 0


def test_minhash_near_duplicates(docs_df):
    out = dedup.minhash_near_duplicates(
        docs_df, num_hashes=32, bands=16, threshold=0.7
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 1) in pairs            # identical
    assert (3, 4) in pairs            # same token set, order differs
    assert (5, 7) not in pairs
    for a, b in pairs:
        assert a < b


def test_verify_jaccard_threshold(docs_df, spark):
    pairs = spark.createDataFrame([(0, 2), (0, 5)], "doc_a long, doc_b long")
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup.verify_jaccard(docs_df, pairs, threshold=0.0).collect()}
    assert out[(0, 2)] > 0.7  # one word changed
    assert out[(0, 5)] == 0.0


def test_simhash_portable(docs_df):
    # the oracle-checkable md5/60-bit variant behaves like simhash64:
    # identical text -> identical hash, and values are non-negative longs
    sh = {r["doc_id"]: r["simhash"]
          for r in dedup.simhash_portable(docs_df).collect()}
    assert sh[0] == sh[1]
    assert all(v >= 0 for v in sh.values())
    assert sh[0] != sh[3]


def test_language_id_expr_matches_udf(spark):
    rows = [
        (0, "the cat sat on the mat and it is happy"),
        (1, "le chat est sur la table et il est très content"),
        (2, "der hund ist nicht glücklich und die katze auch nicht"),
        (3, "el perro y la gata es una historia que pasa por madrid"),
        (4, "这是一个中文句子"),
        (5, ""),
        (6, "de que la"),          # fr/es tie -> first profile (fr) wins
        (7, "9182 7364 !!"),       # nothing scores -> und
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = {r["doc_id"]: r["lang_pred"]
            for r in textstats.language_id(df).collect()}
    udf = {r["doc_id"]: r["lang_pred"]
           for r in textstats.language_id_udf(df).collect()}
    assert expr == udf


def test_simhash_near_duplicates(docs_df):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs_df).collect()}
    assert sh[0] == sh[1]  # identical text -> identical simhash
    out = dedup.simhash_near_duplicates(docs_df, max_hamming=10)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 1) in pairs


def test_char_shingles(spark):
    df = spark.createDataFrame([(0, "abcdef")], "doc_id long, text string")
    out = [r["term"] for r in dedup.char_shingles(df, n=3).collect()]
    assert out == ["abc", "bcd", "cde", "def"]


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 8)).astype(np.float32)
    base[1] = base[0] + 0.001 * rng.standard_normal(8).astype(np.float32)  # near-dup
    pdf = pd.DataFrame(
        {"vec_id": range(40), "embedding": [v.tolist() for v in base]}
    )
    return spark.createDataFrame(pdf)


def test_embedding_near_duplicates(emb_df):
    out = dedup.embedding_near_duplicates(emb_df, n_planes=8, threshold=0.99)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) in pairs


def test_brute_force_topk_matches_numpy(emb_df):
    pdf = emb_df.toPandas()
    mat = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
    q = mat[0]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))[:5]
    want = [int(pdf["vec_id"].iloc[i]) for i in order]
    got = [r["vec_id"] for r in
           simsearch.brute_force_topk(emb_df, q.tolist(), k=5).collect()]
    assert got == want


def test_ivf_recall_and_pruning(spark, emb_df, tmp_path):
    pdf = emb_df.toPandas()
    mat = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
    q = mat[3]
    idx = simsearch.IvfIndex.build(
        spark, emb_df, str(tmp_path / "ivf"), n_centroids=4, sample=40
    )
    exact = [r["vec_id"] for r in
             simsearch.brute_force_topk(emb_df, q.tolist(), k=5).collect()]
    # full probe == exact
    full = [r["vec_id"] for r in idx.search(q.tolist(), k=5, nprobe=4).collect()]
    assert full == exact
    # pruned probe returns a subset ranked consistently and hits the top-1
    pruned = [r["vec_id"] for r in idx.search(q.tolist(), k=5, nprobe=1).collect()]
    assert pruned[0] == exact[0] == 3


def test_language_id(spark):
    rows = [
        (0, "the cat sat on the mat and it is happy"),
        (1, "le chat est sur la table et il est très content"),
        (2, "der hund ist nicht glücklich und die katze auch nicht"),
        (3, "el perro y la gata es una historia que pasa por madrid"),
        (4, "这是一个中文句子"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["lang_pred"]
           for r in textstats.language_id(df).collect()}
    assert out == {0: "en", 1: "fr", 2: "de", 3: "es", 4: "zh", 5: "und"}


def test_quality_scores(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and keeps running"),
        (1, "a a a a a a a a a a"),
        (2, "!!! ??? ;;; ###"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.quality_scores(df).collect()}
    assert out[0]["quality"] > out[1]["quality"]  # repetition penalized
    assert out[0]["quality"] > out[2]["quality"]  # punctuation penalized
    assert out[1]["rep_ratio"] == pytest.approx(0.1)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "Hello world 3.14 don't"), (1, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textstats.token_counts(df).collect()}
    assert out[0]["n_ws_tokens"] == 4
    # hello, world, 3, ., 14, don, ', t  -> 8 lexer-class pieces
    assert out[0]["n_lex_tokens"] == 8
    assert out[1]["n_ws_tokens"] == 0


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(0, "same   text here"), (1, "same text  here"), (2, "other text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fingerprint"]
           for r in textstats.fingerprints(df).collect()}
    assert out[0] == out[1]  # whitespace-normalized equality
    assert out[0] != out[2]


def test_multimodal_features(spark):
    pdf = multimodal.synth_assets(30, seed=9)
    df = spark.createDataFrame(pdf, schema=multimodal.ASSET_SCHEMA)
    feats = multimodal.extract_features(df).collect()
    assert len(feats) == 30
    by_id = {r["asset_id"]: r for r in feats}
    for r in feats:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert r["n_bytes"] > 0
    # deterministic: same payload -> same feature
    again = {r["asset_id"]: r["feature"]
             for r in multimodal.extract_features(df).collect()}
    assert all(again[i] == by_id[i]["feature"] for i in by_id)


def test_multimodal_strict_decoder_raises(spark):
    pdf = multimodal.synth_assets(3, seed=9)
    df = spark.createDataFrame(pdf, schema=multimodal.ASSET_SCHEMA)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        multimodal.extract_features(df, decoder=multimodal.strict_decoder).collect()


def test_frame_sample(spark):
    pdf = multimodal.synth_assets(40, seed=9)
    df = spark.createDataFrame(pdf, schema=multimodal.ASSET_SCHEMA)
    out = multimodal.frame_sample(df, every_n=30).toPandas()
    vids = pdf[pdf["kind"] == "video"]
    expect = sum((int(nf) + 29) // 30 for nf in vids["n_frames"])
    assert len(out) == expect
    assert (out["frame_idx"] % 30 == 0).all()
