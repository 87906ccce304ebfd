import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from indexer_spark.session import get_spark

    s = get_spark(cores=8, shuffle_partitions=8, driver_memory="6g",
                  app_name="indexer_spark_tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    """Shared deterministic test corpus (pandas)."""
    from indexer_spark.synth import gen_transcripts

    return gen_transcripts(4000, seed=42)


@pytest.fixture(scope="session")
def oracle_index(corpus_pdf):
    """Oracle over the corpus with doc_id = rank over (conv_id, turn_idx).

    The synth generator emits rows already sorted by (conv_id, turn_idx),
    so enumerate order == the engine's deterministic doc_id order."""
    from indexer_spark.oracle import OracleIndex

    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return OracleIndex(list(enumerate(pdf["text"].tolist())))


@pytest.fixture(scope="session")
def pos_index(spark, corpus_pdf, tmp_path_factory):
    """Positional index over the SAME shared corpus as built_index
    (small shards force multi-shard verify). Shared by the phrase and
    near test modules."""
    from indexer_spark.build import BuildConfig, build_index

    index_dir = str(tmp_path_factory.mktemp("pos_index"))
    sdf = spark.createDataFrame(corpus_pdf)
    stats = build_index(
        spark, sdf, index_dir,
        BuildConfig(shard_docs=512, block_size=64, id_partitions=6,
                    positions=True),
    )
    return index_dir, stats


@pytest.fixture(scope="session")
def built_index(spark, corpus_pdf, tmp_path_factory):
    """Spark-built index over the same corpus (small shards to force
    multi-shard code paths)."""
    from indexer_spark.build import BuildConfig, build_index

    index_dir = str(tmp_path_factory.mktemp("index"))
    sdf = spark.createDataFrame(corpus_pdf)
    cfg = BuildConfig(shard_docs=512, block_size=64,
                      id_partitions=6)
    stats = build_index(spark, sdf, index_dir, cfg)
    return index_dir, stats
