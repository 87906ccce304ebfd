"""Distributed inverted-index build — the Spark-native reshape of the
reference pipeline (SURVEY.md §3.1).

Reference dataflow: files -> parse -> tokenize -> per-doc TF -> per-term
postings -> flush 100-doc segments behind a global RwLock
(/root/reference/src/lib.rs:292-342, src/tree.rs:186-247). Here the same
computation is expressed with no lock and no driver bottleneck:

  stage "ids"      repartitionByRange(conv_id, turn_idx) + per-partition
                   offsets -> dense deterministic doc_id (replaces the
                   AtomicU64 counter, tree.rs:63-82) without a single
                   global window; tokenization runs in the same pass
                   (Arrow-batched mapInPandas) and the forward index
                   ("tok": doc row + [(term, tf)] + doc_len) is written
                   partitioned by shard = doc_id // shard_docs.
                   A shard is the scale-out analog of the reference's
                   100-doc segment (tree.rs:269).

  stage "postings" per pending shard: explode terms, group by
                   (shard, term_bucket) — term_bucket = hash(term) mod B
                   bounds group memory AND defeats hot-term skew (quirk
                   Q4: punctuation terms are massive; a hot term's group
                   is still capped at shard_docs postings) — then
                   vectorized delta+varint encode (compress.py) into one
                   row per (shard, term). Written with dynamic partition
                   overwrite so re-runs are idempotent per shard.

  stage "stats"    global df per term (partial per shard -> final sum,
                   exactly the tree.rs:212/413 partial/final split) +
                   corpus stats (N, avgdl — N includes zero-token docs,
                   quirk Q1).

Every stage is resumable: the manifest (manifest.jsonl) records, per
shard, status + lineage + metrics (terms, postings, bytes, wall ms);
`build_index(resume=True)` skips completed shards.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .lexer import term_counts

TOK_SCHEMA = (
    "doc_id long, shard int, conv_id string, turn_idx int, role string, "
    "doc_len int, terms array<struct<term: string, tf: int>>"
)

POSTINGS_SCHEMA = (
    "shard int, term string, df long, docs binary, tfs binary, dls binary, "
    "blocks array<struct<last_doc_id: long, max_tf: int, max_norm: double, "
    "doc_off: long, tf_off: long, dl_off: long>>"
)


@dataclass
class BuildConfig:
    shard_docs: int = 1 << 16      # docs per shard (segment analog)
    block_size: int = 128          # postings per WAND block
    term_buckets: int = 8          # sub-groups per shard for the agg
    k1: float = 1.2
    b: float = 0.75
    id_partitions: int | None = None
    extra_lineage: dict = field(default_factory=dict)


def _tok_path(d): return os.path.join(d, "tok")
def _postings_path(d): return os.path.join(d, "postings")
def _term_stats_path(d): return os.path.join(d, "term_stats")
def _stats_path(d): return os.path.join(d, "stats.json")
def _manifest_path(d): return os.path.join(d, "manifest.jsonl")


def read_manifest(index_dir: str) -> list[dict]:
    p = _manifest_path(index_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def _append_manifest(index_dir: str, rows: list[dict]) -> None:
    existing = read_manifest(index_dir)
    tmp = _manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        for r in existing + rows:
            f.write(json.dumps(r) + "\n")
    os.replace(tmp, _manifest_path(index_dir))


def read_stats(index_dir: str) -> dict:
    with open(_stats_path(index_dir)) as f:
        return json.load(f)


def _write_stats(index_dir: str, stats: dict) -> None:
    tmp = _stats_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1)
    os.replace(tmp, _stats_path(index_dir))


# --------------------------------------------------------------------------
# stage "ids": deterministic dense doc ids + tokenize -> forward index
# --------------------------------------------------------------------------

def _make_tokenizer(offsets: dict[int, int], shard_docs: int):
    """mapInPandas fn: assign doc_ids from partition offsets + tokenize.

    Runs once per partition (iterator of Arrow batches); the partition's
    rows arrive in (conv_id, turn_idx) order, so
    doc_id = partition_offset + running_local_index is globally dense and
    ordered — the scalable replacement for a global row_number window.
    """

    def fn(batches):
        base = None
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["pid"].iloc[0])]
            n = len(pdf)
            doc_ids = base + local + np.arange(n, dtype=np.int64)
            local += n
            terms_col, dls = [], np.zeros(n, dtype=np.int32)
            texts = pdf["text"].tolist()
            for i, text in enumerate(texts):
                counts = term_counts(text)
                dls[i] = sum(counts.values())
                terms_col.append(
                    [{"term": t, "tf": c} for t, c in counts.items()]
                )
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "shard": (doc_ids // shard_docs).astype(np.int32),
                    "conv_id": pdf["conv_id"].values,
                    "turn_idx": pdf["turn_idx"].values,
                    "role": pdf["role"].values,
                    "doc_len": dls,
                    "terms": terms_col,
                }
            )

    return fn


def _stage_ids(spark, df, index_dir, cfg: BuildConfig, lineage: str) -> dict:
    t0 = time.time()
    p = cfg.id_partitions or max(spark.sparkContext.defaultParallelism, 4)
    parted = (
        df.repartitionByRange(p, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("pid", F.spark_partition_id())
    )
    parted.persist()
    try:
        counts = {r["pid"]: r["count"] for r in parted.groupBy("pid").count().collect()}
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        tok = parted.mapInPandas(
            _make_tokenizer(offsets, cfg.shard_docs), schema=TOK_SCHEMA
        )
        tok.write.partitionBy("shard").mode("overwrite").parquet(_tok_path(index_dir))
    finally:
        parted.unpersist()

    agg = (
        spark.read.parquet(_tok_path(index_dir))
        .agg(
            F.count("*").alias("n"),
            F.sum("doc_len").alias("total_len"),
            F.countDistinct("doc_id").alias("n_ids"),
        )
        .collect()[0]
    )
    n_docs = agg["n"]
    assert n_docs == acc and agg["n_ids"] == n_docs, "doc_id assignment not dense/unique"
    avgdl = (agg["total_len"] or 0) / n_docs if n_docs else 0.0
    stats = {
        "n_docs": int(n_docs),
        "avgdl": float(avgdl),
        "shard_docs": cfg.shard_docs,
        "block_size": cfg.block_size,
        "k1": cfg.k1,
        "b": cfg.b,
        "n_shards": int(math.ceil(n_docs / cfg.shard_docs)) if n_docs else 0,
    }
    _write_stats(index_dir, stats)
    _append_manifest(
        index_dir,
        [{
            "stage": "ids", "shard": -1, "status": "done",
            "n_terms": 0, "n_postings": 0, "n_bytes": 0,
            "lineage": lineage, "wall_ms": int((time.time() - t0) * 1000),
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }],
    )
    return stats


# --------------------------------------------------------------------------
# stage "postings": per-shard sorted, delta+varint-compressed posting lists
# --------------------------------------------------------------------------

def _make_postings_builder(avgdl: float, k1: float, b: float, block_size: int):
    from .compress import encode_postings

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=["shard", "term", "df", "docs", "tfs", "dls", "blocks"]
            )
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["term", "doc_id"], kind="stable")
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["doc_len"].to_numpy(dtype=np.int64)
        uniq, starts = np.unique(terms, return_index=True)
        starts = np.append(starts, len(terms))
        out = {"shard": [], "term": [], "df": [], "docs": [], "tfs": [],
               "dls": [], "blocks": []}
        for i, term in enumerate(uniq):
            s, e = starts[i], starts[i + 1]
            d_b, t_b, l_b, blocks = encode_postings(
                doc_ids[s:e], tfs[s:e], dls[s:e], avgdl,
                k1=k1, b=b, block_size=block_size,
            )
            out["shard"].append(shard)
            out["term"].append(term)
            out["df"].append(e - s)
            out["docs"].append(d_b)
            out["tfs"].append(t_b)
            out["dls"].append(l_b)
            out["blocks"].append(blocks)
        return pd.DataFrame(out)

    return fn


def _stage_postings(
    spark, index_dir, cfg: BuildConfig, stats: dict, pending: list[int],
    lineage: str,
) -> None:
    if not pending:
        return
    t0 = time.time()
    src = spark.read.parquet(_tok_path(index_dir)).filter(
        F.col("shard").isin([int(s) for s in pending])
    )
    flat = (
        src.select("shard", "doc_id", "doc_len", F.explode("terms").alias("t"))
        .select("shard", "doc_id", "doc_len",
                F.col("t.term").alias("term"), F.col("t.tf").alias("tf"))
        .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(cfg.term_buckets)))
    )
    built = flat.groupBy("shard", "tb").applyInPandas(
        _make_postings_builder(stats["avgdl"], cfg.k1, cfg.b, cfg.block_size),
        schema=POSTINGS_SCHEMA,
    )
    (
        built.repartition("shard")
        .sortWithinPartitions("shard", "term")
        .write.partitionBy("shard")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(_postings_path(index_dir))
    )
    wall = int((time.time() - t0) * 1000)

    # per-shard metrics from the committed files (cheap: metadata + two cols)
    m = (
        spark.read.parquet(_postings_path(index_dir))
        .filter(F.col("shard").isin([int(s) for s in pending]))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("df").alias("n_postings"),
            F.sum(
                F.length("docs") + F.length("tfs") + F.length("dls")
            ).alias("n_bytes"),
        )
    )
    metrics = {r["shard"]: r for r in m.collect()}
    now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    rows = []
    for s in pending:
        r = metrics.get(s)
        rows.append({
            "stage": "postings", "shard": int(s), "status": "done",
            "n_terms": int(r["n_terms"]) if r else 0,
            "n_postings": int(r["n_postings"]) if r else 0,
            "n_bytes": int(r["n_bytes"]) if r else 0,
            "lineage": lineage, "wall_ms": wall, "finished_at": now,
        })
    _append_manifest(index_dir, rows)


def _stage_term_stats(spark, index_dir) -> None:
    post = spark.read.parquet(_postings_path(index_dir))
    ts = post.groupBy("term").agg(F.sum("df").alias("df"))
    np_parts = max(2, int(spark.conf.get("spark.sql.shuffle.partitions")) // 8)
    (
        ts.repartitionByRange(np_parts, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(_term_stats_path(index_dir))
    )


# --------------------------------------------------------------------------

def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    cfg: BuildConfig | None = None,
    resume: bool = False,
    _only_shards: list[int] | None = None,  # test hook: partial build
) -> dict:
    """Build (or resume building) the index at ``index_dir``.

    Returns the corpus stats dict. With ``resume=True``, completed stages
    and shards (per manifest.jsonl) are skipped; interrupted shard writes
    are safely redone via dynamic partition overwrite.
    """
    cfg = cfg or BuildConfig()
    os.makedirs(index_dir, exist_ok=True)
    lineage = json.dumps(
        {"source": "transcripts", **cfg.extra_lineage}, sort_keys=True
    )

    manifest = read_manifest(index_dir) if resume else []
    if not resume:
        # fresh build: drop stale manifest so metrics reflect this build
        if os.path.exists(_manifest_path(index_dir)):
            os.remove(_manifest_path(index_dir))

    ids_done = any(r["stage"] == "ids" and r["status"] == "done" for r in manifest)
    if ids_done:
        stats = read_stats(index_dir)
    else:
        stats = _stage_ids(spark, transcripts, index_dir, cfg, lineage)

    n_shards = stats["n_shards"]
    done = {
        r["shard"] for r in read_manifest(index_dir)
        if r["stage"] == "postings" and r["status"] == "done"
    }
    pending = [s for s in range(n_shards) if s not in done]
    if _only_shards is not None:
        pending = [s for s in pending if s in set(_only_shards)]
    _stage_postings(spark, index_dir, cfg, stats, pending, lineage)
    _stage_term_stats(spark, index_dir)
    return stats


def docstore(spark: SparkSession, index_dir: str) -> DataFrame:
    """Docstore view (tree.rs:21-31 analog): the forward index minus the
    terms column — parquet column pruning makes this a cheap projection."""
    return spark.read.parquet(_tok_path(index_dir)).select(
        "doc_id", "shard", "conv_id", "turn_idx", "role", "doc_len"
    )
