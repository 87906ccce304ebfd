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
    """Session warmup: one representative mini-pipeline (parquet scan ->
    mapInPandas -> parquet write) sized to touch every Python worker.

    Absorbs, once per session instead of inside the first real stage:
    - per-worker import of numpy/pandas + our UDF modules (~10s cold),
    - JVM JIT of the parquet->Arrow->Python and write paths (the first
      heavy scan+UDF job otherwise runs interpreted/C1 for several
      seconds),
    - worker heap growth for builder-scale allocations (multi-MB numpy
      temporaries + object-string factorize — page-faulted once here, so
      real tasks reuse the grown arenas).

    Idempotent per session. A long-lived cluster pays this once per
    executor at startup; for short local runs it is the difference
    between measuring the engine and measuring the JIT."""
    app_id = spark.sparkContext.applicationId
    if app_id in _WARMED:
        return
    _WARMED.add(app_id)
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    cores = spark.sparkContext.defaultParallelism
    local_master = spark.sparkContext.master.startswith("local")

    def warm_src():
        return spark.range(0, cores * 20_000, 1, cores).select(
            "id", F.md5(F.col("id").cast("string")).alias("s")
        )

    if not local_master:
        # multi-node cluster: a driver-local tempfile path isn't visible to
        # executors, so skip the parquet round-trip — the in-memory
        # mapInPandas pass still warms worker imports/JIT on every executor
        # (a real deployment would point the round-trip at shared scratch)
        def warm_mem(batches):
            import numpy as np  # noqa: F401
            import pandas as pd_

            from . import compress, lexer  # noqa: F401

            lexer.tokenize("warming up the stemmer cache")
            for pdf in batches:
                yield pd_.DataFrame({"x": pdf["id"][:1]})

        warm_src().mapInPandas(warm_mem, "x long").count()
        return

    tmp = tempfile.mkdtemp(prefix="indexer_spark_warm_")
    try:
        warm_src().write.mode("overwrite").parquet(os.path.join(tmp, "in"))

        def warm(batches):
            import numpy as np
            import pandas as pd_

            from . import compress, lexer  # noqa: F401

            lexer.tokenize("warming up the stemmer cache")
            first = True
            for pdf in batches:
                if first:
                    first = False
                    # builder-scale allocations: big int temporaries, an
                    # object-string factorize, a varint encode
                    big = np.arange(4_000_000, dtype=np.int64)
                    np.argsort(big % 997, kind="stable")
                    words = pd_.Series(
                        np.array([f"w{i % 5000}" for i in range(300_000)],
                                 dtype=object)
                    )
                    pd_.factorize(words, sort=True)
                    compress.varint_encode(big[:1_000_000])
                    del big, words
                yield pd_.DataFrame(
                    {"x": pdf["id"][:1], "b": [b"\x00" * 64]}
                )

        (
            spark.read.parquet(os.path.join(tmp, "in"))
            .mapInPandas(warm, "x long, b binary")
            .write.mode("overwrite").parquet(os.path.join(tmp, "out"))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
