"""spark-submit entrypoints: build / append / query / synth.

Usage (north_rule deployment shape — the package zip travels via
--py-files, so executors can unpickle every UDF):

  python -m indexer_spark.packaging            # -> /tmp/indexer_spark_pyfiles.zip
  spark-submit --py-files /tmp/indexer_spark_pyfiles.zip \\
      cli.py build  --input <parquet/iceberg path> --index <dir> [--shard-docs N]
  spark-submit ... cli.py append --input <path> --index <dir>
  spark-submit ... cli.py query  --index <dir> --query "..." [--k 10] [--mode pruned]
  spark-submit ... cli.py synth  --turns 1000000 --out <dir>

Under spark-submit the session already exists; `get_session()` picks it
up (and still addPyFiles when running plain `python -m indexer_spark.cli`
for local smoke).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def get_session(args):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from .session import get_spark

    return get_spark(cores=args.cores, app_name="indexer_spark_cli")


def cmd_build(args):
    from .build import BuildConfig, build_index
    from .sources import read_source

    spark = get_session(args)
    src = read_source(spark, args.input, args.format)
    cfg = BuildConfig(
        shard_docs=args.shard_docs,
        block_size=args.block_size,
        positions=args.positions,
        extra_lineage={"input": args.input, "format": args.format},
    )
    t0 = time.time()
    stats = build_index(spark, src, args.index, cfg, resume=args.resume)
    print(json.dumps({"ok": True, "wall_sec": round(time.time() - t0, 2), **stats}))


def cmd_append(args):
    from .build import BuildConfig, append_index
    from .sources import read_source

    spark = get_session(args)
    src = read_source(spark, args.input, args.format,
                      snapshot_id=args.snapshot_id)
    cfg = BuildConfig(shard_docs=args.shard_docs, block_size=args.block_size,
                      extra_lineage={"input": args.input,
                                     "format": args.format,
                                     "snapshot_id": args.snapshot_id})
    t0 = time.time()
    stats = append_index(spark, src, args.index, cfg)
    print(json.dumps({"ok": True, "wall_sec": round(time.time() - t0, 2), **stats}))


def cmd_compact(args):
    from .build import BuildConfig, compact_index, read_stats

    spark = get_session(args)
    cfg = None
    if args.shard_docs or args.drop_positions:
        st = read_stats(args.index)
        cfg = BuildConfig(
            shard_docs=args.shard_docs or (1 << 16),
            block_size=int(st["block_size"]),
            k1=float(st["k1"]), b=float(st["b"]),
            positions=bool(st.get("positions")) and not args.drop_positions,
        )
    t0 = time.time()
    stats = compact_index(spark, args.index, args.out, cfg)
    print(json.dumps({"ok": True, "wall_sec": round(time.time() - t0, 2),
                      "n_shards": stats["n_shards"],
                      "n_docs": stats["n_docs"]}))


def cmd_query(args):
    from .query import IndexReader

    spark = get_session(args)
    reader = IndexReader(spark, args.index)
    t0 = time.time()
    if args.tfidf:
        hits = reader.search_tfidf(args.query, args.k)
    else:
        hits = reader.search(args.query, args.k, mode=args.mode,
                             window=args.window)
    wall = round(time.time() - t0, 3)
    resolved = reader.resolve(hits).collect() if hits else []
    out = json.dumps({
        "query": args.query, "k": args.k, "wall_sec": wall,
        "hits": [
            {"conv_id": r["conv_id"], "turn_idx": r["turn_idx"],
             "doc_id": r["doc_id"], "score": r["score"]}
            for r in resolved
        ],
    })
    print(out)
    if args.output:
        # results-to-file sink (reference --output, main.rs:200-212)
        with open(args.output, "w") as f:
            f.write(out + "\n")


def cmd_serve(args):
    # long-lived query service (reference `indexer serve`, main.rs:214-225)
    from .server import serve_forever

    spark = get_session(args)
    serve_forever(spark, args.index, host=args.host, port=args.port,
                  source_path=args.source)


def cmd_synth(args):
    from .synth import transcripts_spark

    spark = get_session(args)
    t0 = time.time()
    transcripts_spark(spark, args.turns, seed=args.seed).write.mode(
        "overwrite"
    ).parquet(args.out)
    print(json.dumps({"ok": True, "turns": args.turns,
                      "wall_sec": round(time.time() - t0, 2), "out": args.out}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="indexer_spark")
    p.add_argument("--cores", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--shard-docs", type=int, default=1 << 16)
    b.add_argument("--block-size", type=int, default=128)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--positions", action="store_true",
                   help="record term positions (enables --mode phrase)")
    b.add_argument("--format", choices=["parquet", "iceberg", "csv"],
                   default="parquet")
    b.set_defaults(fn=cmd_build)

    a = sub.add_parser("append")
    a.add_argument("--input", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--shard-docs", type=int, default=1 << 16)
    a.add_argument("--block-size", type=int, default=128)
    a.add_argument("--format", choices=["parquet", "iceberg"],
                   default="parquet")
    a.add_argument("--snapshot-id", type=int, default=None)
    a.set_defaults(fn=cmd_append)

    c = sub.add_parser("compact")
    c.add_argument("--index", required=True,
                   help="source index (left untouched)")
    c.add_argument("--out", required=True,
                   help="new immutable compacted index dir")
    c.add_argument("--shard-docs", type=int, default=None)
    c.add_argument("--drop-positions", action="store_true",
                   help="strip the positions payload during compaction")
    c.set_defaults(fn=cmd_compact)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode",
                   choices=["pruned", "exhaustive", "and", "phrase",
                            "near", "bool"],
                   default="pruned")
    q.add_argument("--window", type=int, default=8,
                   help="token window for --mode near")
    q.add_argument("--tfidf", action="store_true")
    q.add_argument("--output", default=None,
                   help="also write the JSON result to this file")
    q.set_defaults(fn=cmd_query)

    sv = sub.add_parser("serve")
    sv.add_argument("--index", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8765)
    sv.add_argument("--source", default=None,
                    help="transcripts parquet the index was built from; "
                         "enables &snippets=1 highlighting")
    sv.set_defaults(fn=cmd_serve)

    s = sub.add_parser("synth")
    s.add_argument("--turns", type=int, required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--seed", type=int, default=42)
    s.set_defaults(fn=cmd_synth)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
