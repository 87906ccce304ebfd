"""Structured Streaming index maintenance.

The reference's incremental story is a per-file mtime freshness check
(lib.rs:210-224). The Spark-native version is an append-only stream of
turns driving `append_index` through foreachBatch: each micro-batch lands
in new immutable shards, exactly like a segment flush, with global stats
and term_stats refreshed per batch. Old shards are never rewritten, so a
query concurrent with maintenance sees a consistent (slightly stale)
index; the pruned scorer stays exact across batches via the per-shard
avgdl_build upper-bound rescale (see build.append_index).

Exactly-once: foreachBatch can replay a batch after failure. append_index
with ``dedupe_batch=True`` write-ahead-logs an ``append_intent`` manifest
row (pinning the id/shard bases) before mutating anything and appends an
``append_commit`` row only after postings + stats + term_stats are all on
disk — so a replay after a crash ANYWHERE in the window recomputes
identical state from the pinned bases, and a replay of a fully committed
batch is skipped on the commit row. The batch-id guard below keys on
commit rows only (an intent row without its commit row means the batch
must be re-run, not skipped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .build import BuildConfig, append_index, read_manifest


def _last_batch_id(index_dir: str) -> int:
    """Highest fully COMMITTED stream batch id (append_commit rows only:
    an ids/intent row for a batch whose postings+stats never committed
    must not mask a replay — that was a silent-batch-loss crash window)."""
    last = -1
    for r in read_manifest(index_dir):
        if r.get("stage") != "append_commit":
            continue
        b = r.get("batch", "")
        if b.startswith("stream-"):
            try:
                last = max(last, int(b.split("stream-", 1)[1]))
            except ValueError:
                pass
    return last


def stream_index(
    spark: SparkSession,
    stream_df: DataFrame,
    index_dir: str,
    cfg: BuildConfig | None = None,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
):
    """Attach a streaming writer that appends every micro-batch of turns
    to the index. Returns the StreamingQuery (caller awaits/stops)."""

    def handle(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        if batch_id <= _last_batch_id(index_dir):
            return  # replayed batch already committed
        append_index(
            spark, batch_df, index_dir, cfg,
            batch_label=f"stream-{batch_id}", dedupe_batch=True,
        )

    writer = stream_df.writeStream.foreachBatch(handle).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
