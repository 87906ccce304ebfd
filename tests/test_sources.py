"""Input-source abstraction (sources.py): parquet path works, the
iceberg branch is gated with an actionable error when the runtime jar
is absent (this sandbox), and snapshot options are iceberg-only."""

import pytest

from indexer_spark.sources import read_source


def test_parquet_roundtrip(spark, tmp_path):
    p = str(tmp_path / "src")
    spark.range(10).write.parquet(p)
    assert read_source(spark, p, "parquet").count() == 10


def test_snapshot_requires_iceberg(spark, tmp_path):
    p = str(tmp_path / "src2")
    spark.range(1).write.parquet(p)
    with pytest.raises(ValueError, match="iceberg"):
        read_source(spark, p, "parquet", snapshot_id=3)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown source format"):
        read_source(spark, "/nonexistent", "orc")


def test_iceberg_gated_without_runtime_jar(spark):
    from indexer_spark.sources import _has_iceberg

    if _has_iceberg(spark):
        pytest.skip("iceberg runtime present; gate not exercised")
    with pytest.raises(RuntimeError, match="Iceberg runtime jar"):
        read_source(spark, "catalog.db.transcripts", "iceberg")
