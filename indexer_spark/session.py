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
        # postings/tok files are a few MB each; smaller scan partitions
        # keep term-filtered postings scans parallel instead of packing
        # the whole table into one task
        .config("spark.sql.files.maxPartitionBytes", str(32 << 20))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if ship_package:
        from .packaging import make_pyfiles_zip

        spark.sparkContext.addPyFile(make_pyfiles_zip())
    return spark


_WARMED: set[str] = set()


def warm_workers(spark: SparkSession) -> None:
    """One tiny mapInPandas job that touches every Python worker: imports
    numpy/pandas + our UDF modules and exercises the Arrow path, so the
    first real stage doesn't pay ~10s+ of per-worker import/JIT tax.
    Idempotent per session; irrelevant at cluster scale but a large
    relative win for short local runs."""
    app_id = spark.sparkContext.applicationId
    if app_id in _WARMED:
        return
    _WARMED.add(app_id)
    cores = spark.sparkContext.defaultParallelism

    def warm(batches):
        import numpy as np  # noqa: F401
        import pandas as pd_

        from . import compress, lexer  # noqa: F401

        lexer.tokenize("warming up the stemmer cache")
        for pdf in batches:
            yield pd_.DataFrame({"x": pdf["id"][:1]})

    spark.range(0, cores * 2, 1, cores * 2).mapInPandas(warm, "x long").count()
