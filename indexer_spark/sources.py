"""Input-source abstraction: the transcripts corpus as parquet or Iceberg.

The engine itself is source-agnostic (build_index/append_index take a
DataFrame); this module is where the north-rule deployment shape — "an
Iceberg table of multi-turn transcripts" — plugs in. Iceberg is a table
format + catalog configuration, not engine code: on a real cluster the
session carries

    spark.jars.packages = org.apache.iceberg:iceberg-spark-runtime-<v>
    spark.sql.extensions = org.apache.iceberg.spark.extensions
                           .IcebergSparkSessionExtensions
    spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog

and reads become `spark.read.format("iceberg")` (catalog pruning,
snapshot isolation, incremental scans between snapshots for
append_index). This sandbox ships no Iceberg runtime jar, so the
iceberg branch is gated with a clear error instead of a py4j stack
trace; everything else (and every test) runs on parquet, which shares
the same columnar scan + pushdown behavior the build relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SUPPORTED = ("parquet", "iceberg")


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_source(
    spark: SparkSession,
    location: str,
    fmt: str = "parquet",
    snapshot_id: int | None = None,
    as_of_timestamp: int | None = None,
) -> DataFrame:
    """Read the transcripts corpus.

    ``location`` is a path (parquet) or a catalog table name (iceberg).
    ``snapshot_id`` / ``as_of_timestamp`` select an Iceberg snapshot —
    the lineage anchor append_index records so incremental batches are
    reproducible (reference freshness analog, lib.rs:210-224).
    """
    if fmt == "parquet":
        if snapshot_id is not None or as_of_timestamp is not None:
            raise ValueError("snapshot selection requires fmt='iceberg'")
        return spark.read.parquet(location)
    if fmt == "iceberg":
        if not _has_iceberg(spark):
            raise RuntimeError(
                "Iceberg runtime jar not on the classpath. Start the "
                "session with spark.jars.packages="
                "org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver> "
                "and a spark.sql.catalog.<name> config, then pass the "
                "catalog table name as --input."
            )
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp))
        return reader.load(location)
    raise ValueError(f"unknown source format {fmt!r}; supported: {SUPPORTED}")
