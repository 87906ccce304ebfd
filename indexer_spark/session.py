"""SparkSession factory with the engine's standard local-mode config."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str = 8,
    shuffle_partitions: int | None = None,
    app_name: str = "indexer_spark",
    driver_memory: str = "16g",
    extra_conf: dict | None = None,
    ship_package: bool = True,
) -> SparkSession:
    """Create (or fetch) a local SparkSession.

    ``cores`` may be an int or "*". Shuffle partitions default to the core
    count — at cluster scale this becomes executor-count-aware config (AQE
    coalescing handles the rest). ``ship_package`` adds a zip of
    indexer_spark via addPyFile so executor workers can always unpickle
    our UDFs (equivalent of `spark-submit --py-files`).
    """
    if shuffle_partitions is None:
        shuffle_partitions = int(os.cpu_count() or 8) if cores == "*" else int(cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if ship_package:
        from .packaging import make_pyfiles_zip

        spark.sparkContext.addPyFile(make_pyfiles_zip())
    return spark
