"""Similarity search over embedding columns (array<float>).

- `brute_force_topk`: exact cosine top-k — the correctness baseline.
  JVM-side zip_with/aggregate expressions; distributed
  TakeOrderedAndProject for the top-k (no driver-side sort of the corpus).
- `IvfIndex`: the scale path — IVF (inverted-file) partitioning: k-means
  centroids fitted on a seeded sample (driver-side numpy; centroid count
  is tiny), every vector assigned to its nearest centroid, the table
  written partitioned by centroid id. A query probes only the `nprobe`
  nearest centroids => scan cost drops by ~n_centroids/nprobe, and the
  partition column prunes files at the source (same pushdown discipline
  as the postings table).
"""

# NOTE: no `from __future__ import annotations` - pandas_udf needs real hints

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("v", F.transform(vec_col, lambda x: x.cast("double")))


def _cosine_expr(vcol, qlit):
    dot = F.aggregate(F.zip_with(vcol, qlit, lambda a, b: a * b),
                      F.lit(0.0), lambda s, x: s + x)
    sq = lambda c: F.aggregate(F.transform(c, lambda x: x * x),  # noqa: E731
                               F.lit(0.0), lambda s, x: s + x)
    return dot / F.sqrt(sq(vcol) * sq(qlit))


def brute_force_topk(
    emb: DataFrame, query_vec, k: int = 10,
    vec_col="embedding", id_col="vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    d = _as_double(emb, vec_col)
    return (
        d.select(id_col, _cosine_expr(F.col("v"), qlit).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _kmeans_fit(sample: np.ndarray, n_centroids: int, iters: int, seed: int):
    """Tiny deterministic k-means (numpy, driver-side, sample-sized)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


class IvfIndex:
    """IVF index handle: centroids + a parquet table partitioned by list id."""

    def __init__(self, spark, path: str, centroids: np.ndarray,
                 vec_col: str, id_col: str):
        self.spark = spark
        self.path = path
        self.centroids = centroids
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def build(
        cls, spark, emb: DataFrame, path: str,
        n_centroids: int = 16, sample: int = 2000, iters: int = 8,
        vec_col="embedding", id_col="vec_id", seed: int = 42,
    ) -> "IvfIndex":
        pdf = emb.select(vec_col).limit(sample).toPandas()
        mat = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
        cent = _kmeans_fit(mat, n_centroids, iters, seed)
        centb = spark.sparkContext.broadcast(cent)

        @F.pandas_udf(IntegerType())
        def assign_udf(vs: pd.Series) -> pd.Series:
            m = np.stack(vs.map(np.asarray).to_numpy()).astype(np.float64)
            c = centb.value
            d2 = (m * m).sum(1)[:, None] - 2 * m @ c.T + (c * c).sum(1)[None, :]
            return pd.Series(d2.argmin(axis=1).astype(np.int32))

        (
            emb.withColumn("list_id", assign_udf(F.col(vec_col)))
            .write.partitionBy("list_id").mode("overwrite").parquet(path)
        )
        return cls(spark, path, cent, vec_col, id_col)

    def search(self, query_vec, k: int = 10, nprobe: int = 4) -> DataFrame:
        """Probe the nprobe nearest centroid partitions only (partition
        pruning via the list_id filter), exact cosine within them."""
        q = np.asarray(query_vec, dtype=np.float64)
        d2 = ((self.centroids - q) ** 2).sum(axis=1)
        probe = [int(i) for i in np.argsort(d2)[:nprobe]]
        qlit = F.array(*[F.lit(float(x)) for x in q])
        scan = (
            self.spark.read.parquet(self.path)
            .filter(F.col("list_id").isin(probe))
        )
        d = _as_double(scan, self.vec_col)
        return (
            d.select(self.id_col, _cosine_expr(F.col("v"), qlit).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(self.id_col))
            .limit(k)
        )
