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

from pyspark.sql import DataFrame, SparkSession, functions as F

SUPPORTED = ("parquet", "iceberg", "csv")


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
    if fmt == "csv":
        if snapshot_id is not None or as_of_timestamp is not None:
            raise ValueError("snapshot selection requires fmt='iceberg'")
        return read_csv_transcripts(spark, location)
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


def read_csv_transcripts(
    spark: SparkSession,
    location: str,
    text_cols: list[str] | None = None,
    delimiter: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV ingestion -> transcripts shape (the S6 analog of the
    reference's CSV extractor, /root/reference/src/parsers.rs: every
    record's fields are joined with single spaces into one text blob).

    Mapping quirks, documented:
    - one CSV ROW = one turn (the reference indexes one FILE as one doc;
      a row is the natural turn-granular unit for this engine — join
      granularity, not semantics, is the deviation);
    - text = space-joined ``text_cols`` (default: all columns), nulls as
      empty strings. DELIBERATE deviation: the reference concatenates
      fields with NO separator (parsers.rs:28-70 `fields.push_str(field)`
      — tokens can fuse across fields, same class of quirk as Q7); we do
      not replicate that bug, same policy as Q7;
    - conv_id = source file path, turn_idx = row position within the
      file. Row positions are derived from monotonically_increasing_id
      within each file partition — stable as long as each CSV file is
      read as a single split (Spark never splits small files across
      tasks; for huge CSVs raise maxPartitionBytes or pre-split the
      file per conversation).
    """
    from pyspark.sql.window import Window

    df = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .csv(location)
    )
    cols = text_cols or df.columns
    text = F.concat_ws(
        " ", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    )
    w = Window.partitionBy("conv_id").orderBy(F.monotonically_increasing_id())
    return (
        df.withColumn("conv_id", F.input_file_name())
        .withColumn("text", text)
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumn("role", F.lit("row"))
        .withColumn("tool", F.lit(None).cast("string"))
        .withColumn("ts", F.lit(None).cast("timestamp"))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
