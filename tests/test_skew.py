"""Hot-term skew tests (quirk Q4: punctuation terms appear in nearly
every doc). The doc-partitioned layout makes skew structural: a term
present in ALL docs spreads evenly across shards, so no reducer or group
ever sees more than one shard's postings for it."""

import math

import numpy as np
import pandas as pd

from indexer_spark.build import BuildConfig, build_index, read_manifest
from indexer_spark.oracle import OracleIndex
from indexer_spark.query import IndexReader


def _skewed_corpus(n=3000, seed=5):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(n):
        body = " ".join(rng.choice(words, size=10))
        # '.' in EVERY doc (ubiquitous punctuation term) + hot word
        rows.append((f"c{i:06d}", 0, "user", body + " . everywhere", None))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool"]
    ).assign(ts=pd.Timestamp("2026-01-01"))


def test_ubiquitous_term_build_balance_and_parity(spark, tmp_path):
    pdf = _skewed_corpus()
    sdf = spark.createDataFrame(pdf)
    d = str(tmp_path / "skew")
    build_index(spark, sdf, d, BuildConfig(block_size=64, id_partitions=6))

    # every shard carries its fair slice of the hot terms: per-shard
    # postings counts are near-uniform (no reducer hot spot)
    post = [r for r in read_manifest(d) if r["stage"] == "postings"]
    counts = [r["n_postings"] for r in post if r["n_postings"] > 0]
    assert max(counts) / min(counts) < 1.5

    reader = IndexReader(spark, d)
    oracle = OracleIndex(
        list(enumerate(
            pdf.sort_values(["conv_id", "turn_idx"])["text"].tolist()
        ))
    )
    # df('.') == N and df(everywhere) == N
    dfs = reader.global_dfs([".", "everywher"])  # 'everywhere' stems
    assert dfs["."] == 3000 and dfs["everywher"] == 3000

    # reference TF-IDF hides ubiquitous terms (idf=0, quirk Q3)
    assert reader.search_tfidf(".", 10) == [] == oracle.search_tfidf(".", 10)

    # BM25 still ranks them (idf > 0), identical to oracle
    for q in [". everywhere", "alpha beta", "everywhere"]:
        want = oracle.search_bm25(q, 10)
        got = reader.search(q, 10)
        assert [x[0] for x in got] == [x[0] for x in want], q
        for g, w in zip(got, want):
            assert math.isclose(g[1], w[1], rel_tol=1e-9)


def test_warm_cache_cap_restored_on_close(spark, built_index):
    """warm_hot_terms raises the process-global decoded-cache cap;
    close() must undo the raise so one reader's warm budget isn't a
    sticky mutation on every later reader in the process."""
    import indexer_spark.query as Q
    from indexer_spark.query import _DECODED_CACHE

    index_dir, _ = built_index
    orig = _DECODED_CACHE.max_bytes
    orig_refs, orig_orig = Q._CACHE_CAP_REFS, Q._CACHE_CAP_ORIG
    # hermetic module state: an earlier test's reader that warmed without
    # closing legitimately still holds a refcount share (the cap SHOULD
    # stay raised for it); this test is about the only-holder case
    Q._CACHE_CAP_REFS, Q._CACHE_CAP_ORIG = 0, None
    _DECODED_CACHE.max_bytes = prior = 128 << 20
    r = IndexReader(spark, index_dir)
    try:
        warmed = r.warm_hot_terms(4)
        assert warmed > 0
        assert _DECODED_CACHE.max_bytes > prior
        # warmed queries still work, results match a fresh reader
        r2 = IndexReader(spark, index_dir)
        for q in ["run dog", "don't"]:
            assert r.search(q, 10) == r2.search(q, 10)
        r2.close()
        r.close()
        assert _DECODED_CACHE.max_bytes == prior
    finally:
        _DECODED_CACHE.max_bytes = orig
        Q._CACHE_CAP_REFS, Q._CACHE_CAP_ORIG = orig_refs, orig_orig


def test_cached_terms_bookkeeping_bounded(spark, built_index):
    """_cached_terms evicts past its cap instead of growing per distinct
    query term forever on a long-lived server; evicted terms just take
    the reading path again with identical results."""
    index_dir, _ = built_index
    r = IndexReader(spark, index_dir)
    try:
        r._cached_terms_max = 2
        want = r.search("run dog fox lazy", 10)
        assert len(r._cached_terms) <= 2
        # repeat query after bookkeeping eviction: identical results
        assert r.search("run dog fox lazy", 10) == want
    finally:
        r.close()


def test_warm_cache_cap_interleaved_readers(spark, built_index):
    """Interleaved reader lifecycles: A warms, B warms higher, A closes
    (must be a no-op while B still holds a share), B closes -> the cap
    returns to the TRUE pre-warm value, never an intermediate raise."""
    import indexer_spark.query as Q

    index_dir, _ = built_index
    orig_cap = Q._DECODED_CACHE.max_bytes
    orig_refs, orig_orig = Q._CACHE_CAP_REFS, Q._CACHE_CAP_ORIG
    Q._CACHE_CAP_REFS, Q._CACHE_CAP_ORIG = 0, None
    Q._DECODED_CACHE.max_bytes = prior = 64 << 20
    try:
        a = IndexReader(spark, index_dir)
        b = IndexReader(spark, index_dir)
        a.warm_hot_terms(2, budget_bytes=1 << 20)
        cap_after_a = Q._DECODED_CACHE.max_bytes
        assert cap_after_a > prior
        b.warm_hot_terms(4, budget_bytes=64 << 20)
        cap_after_b = Q._DECODED_CACHE.max_bytes
        assert cap_after_b >= cap_after_a
        a.close()
        # B still holds a share: A's close must not shrink the cap
        assert Q._DECODED_CACHE.max_bytes == cap_after_b
        b.close()
        assert Q._DECODED_CACHE.max_bytes == prior
    finally:
        Q._DECODED_CACHE.max_bytes = orig_cap
        Q._CACHE_CAP_REFS, Q._CACHE_CAP_ORIG = orig_refs, orig_orig


def test_warm_worker_caches_scale_gate(spark, built_index):
    """warm_worker_caches auto-skips on big indexes (its cost approaches
    a full extra scan per worker at hundreds of shards — measured 389 s
    at 306 shards); force=True overrides for deployments that want it."""
    index_dir, _ = built_index
    r = IndexReader(spark, index_dir)
    try:
        calls = []
        orig_top = r._top_terms

        def spy(n):
            calls.append(n)
            return orig_top(n)

        r._top_terms = spy
        r.stats = dict(r.stats, n_shards=r.WARM_WORKERS_MAX_SHARDS)
        assert r.warm_worker_caches(2) == 0
        assert not calls  # gate short-circuited before any work
        assert r.warm_worker_caches(2, force=True) >= 0
        assert calls  # force ran the warm for real
    finally:
        r.close()
