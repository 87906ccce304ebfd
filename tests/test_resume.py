"""Checkpoint/resume tests (SURVEY.md §5 test 6): kill after P of N
shards; re-run completes; results identical to a clean build; manifest
metrics complete."""

import os

import pytest
from pyspark.sql import functions as F

from indexer_spark.build import (
    BuildConfig,
    build_index,
    read_manifest,
    read_stats,
)
from indexer_spark.query import IndexReader
from indexer_spark.synth import gen_transcripts

CFG = dict(shard_docs=256, block_size=32, id_partitions=4)


@pytest.fixture(scope="module")
def small_corpus(spark):
    pdf = gen_transcripts(1000, seed=11)
    return spark.createDataFrame(pdf)


def _postings_signature(spark, index_dir):
    from indexer_spark.build import _postings_path

    rows = (
        spark.read.parquet(_postings_path(index_dir))
        .select("shard", "term", "df", F.md5(F.hex("docs")).alias("h"))
        .collect()
    )
    return sorted((r["shard"], r["term"], r["df"], r["h"]) for r in rows)


def test_partial_then_resume_equals_fresh(spark, small_corpus, tmp_path):
    fresh_dir = str(tmp_path / "fresh")
    part_dir = str(tmp_path / "partial")
    cfg = BuildConfig(**CFG)

    stats = build_index(spark, small_corpus, fresh_dir, cfg)
    assert stats["n_shards"] == 4

    # simulate a crash after one shard
    build_index(spark, small_corpus, part_dir, cfg, _only_shards=[0])
    m = read_manifest(part_dir)
    done = {r["shard"] for r in m if r["stage"] == "postings"}
    assert done == {0}

    # resume completes the remaining shards only. epoch is a monotonic
    # commit counter (like a txid): a crash+resume history has more
    # commits than a fresh build, so it is excluded from the equality.
    stats2 = build_index(spark, small_corpus, part_dir, cfg, resume=True)
    drop_epoch = lambda d: {k: v for k, v in d.items() if k != "epoch"}  # noqa: E731
    assert drop_epoch(stats2) == drop_epoch(stats)
    m2 = read_manifest(part_dir)
    assert {r["shard"] for r in m2 if r["stage"] == "postings"} == {0, 1, 2, 3}
    # the ids stage ran once (manifest has a single ids row)
    assert sum(1 for r in m2 if r["stage"] == "ids") == 1

    # byte-identical postings content (per-term compressed streams)
    assert _postings_signature(spark, part_dir) == _postings_signature(
        spark, fresh_dir
    )


def test_resume_is_idempotent_when_complete(spark, small_corpus, tmp_path):
    d = str(tmp_path / "idx")
    cfg = BuildConfig(**CFG)
    build_index(spark, small_corpus, d, cfg)
    before = read_manifest(d)
    build_index(spark, small_corpus, d, cfg, resume=True)
    after = read_manifest(d)
    assert before == after  # nothing re-ran, nothing appended


def test_resumed_index_serves_identical_results(spark, small_corpus, tmp_path):
    fresh_dir = str(tmp_path / "f2")
    part_dir = str(tmp_path / "p2")
    cfg = BuildConfig(**CFG)
    build_index(spark, small_corpus, fresh_dir, cfg)
    build_index(spark, small_corpus, part_dir, cfg, _only_shards=[1, 3])
    build_index(spark, small_corpus, part_dir, cfg, resume=True)
    r1 = IndexReader(spark, fresh_dir)
    r2 = IndexReader(spark, part_dir)
    for q in ["run dog", "don't", "3.14"]:
        assert r1.search(q, 10) == r2.search(q, 10)


def test_manifest_lineage_and_metrics(spark, small_corpus, tmp_path):
    d = str(tmp_path / "idx3")
    cfg = BuildConfig(extra_lineage={"snapshot": "test-snap-1"}, **CFG)
    build_index(spark, small_corpus, d, cfg)
    m = read_manifest(d)
    for r in m:
        assert "test-snap-1" in r["lineage"]
        assert r["finished_at"].endswith("Z")
    post = [r for r in m if r["stage"] == "postings"]
    assert sum(r["n_postings"] for r in post) > 0
    assert all(r["n_bytes"] > 0 for r in post)
    assert read_stats(d)["n_docs"] == 1000
