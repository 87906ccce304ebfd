"""Compaction cost/benefit at engine scale.

Simulates the real fragmentation path — a base build plus a stream of
appends — then measures, in ONE session (in-run controls):

  - distributed BM25 / AND walls on the FRAGMENTED index,
  - compact_index wall (the one-off maintenance price; no retokenize),
  - the same query walls on the COMPACTED index,
  - shard counts + total postings files before/after,

with rank-identity asserted between fragmented and compacted results
(resolved identity — doc ids legitimately change). Writes one JSON line
to stdout and the next free BENCH/raw/compact_bench_{turns}_rep{N}.json.

Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_TURNS (total, default
2_000_000), SPARK_GRAFT_APPENDS (default 15).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _count_files(root: str) -> int:
    total = 0
    for _dirpath, _dirs, files in os.walk(root):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total


def main():
    from bench import _calibrate
    from indexer_spark.build import (
        BuildConfig, append_index, build_index, compact_index, read_stats,
    )
    from indexer_spark.lexer import tokenize
    from indexer_spark.query import IndexReader
    from indexer_spark.session import get_spark, warm_workers
    from indexer_spark.synth import transcripts_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", str(2_000_000)))
    n_appends = int(os.environ.get("SPARK_GRAFT_APPENDS", "15"))
    out: dict = {"metric": "compact_probe", "turns": n_turns, "cpus": cpus,
                 "n_appends": n_appends, "calib_gops": _calibrate(cpus)}

    spark = get_spark(cores=cpus, shuffle_partitions=cpus,
                      driver_memory="48g",
                      app_name="indexer_spark_compactbench")
    frag = tempfile.mkdtemp(prefix="compactbench_frag_")
    comp = tempfile.mkdtemp(prefix="compactbench_comp_")
    try:
        warm_workers(spark)
        base_n = n_turns // 4
        chunk = (n_turns - base_n) // n_appends
        t0 = time.time()
        base = transcripts_spark(spark, base_n, seed=42)
        build_index(spark, base, frag, BuildConfig(block_size=128))
        from pyspark.sql import functions as F

        for i in range(n_appends):
            batch = transcripts_spark(spark, chunk, seed=100 + i).withColumn(
                "conv_id", F.concat(F.lit(f"ap{i}_"), F.col("conv_id"))
            )
            append_index(spark, batch, frag, batch_label=f"b{i}")
        out["build_plus_appends_sec"] = round(time.time() - t0, 1)
        st = read_stats(frag)
        out["frag_shards"] = int(st["n_shards"])
        out["frag_postings_files"] = _count_files(
            os.path.join(frag, "postings"))

        # harvest query terms
        rows = transcripts_spark(spark, 200, seed=42).collect()
        terms = []
        for r in rows:
            for w in str(r["text"] or "").split():
                if tokenize(w) and w not in terms:
                    terms.append(w)
            if len(terms) >= 3:
                break
        a, b, c = terms[:3]
        out["terms"] = [a, b, c]

        def timed_queries(reader):
            res = {}
            for name, fn in {
                "bm25": lambda: reader.search(f"{a} {b} {c}", k=10),
                "and": lambda: reader.search(f"{a} {b}", k=10, mode="and"),
            }.items():
                walls, hits = [], None
                for _ in range(3):
                    t = time.time()
                    hits = fn()
                    walls.append(round(time.time() - t, 3))
                res[name] = {"walls_sec": walls, "n_hits": len(hits)}
            return res

        r_frag = IndexReader(spark, frag, fast_path_bytes=0)
        out["frag_queries"] = timed_queries(r_frag)
        frag_ids = {
            name: sorted(
                (h["conv_id"], h["turn_idx"], round(h["score"], 9))
                for h in r_frag.resolve_local(
                    r_frag.search(f"{a} {b}", k=50, mode="and"))
            )
            for name in ("check",)
        }
        r_frag.close()

        t0 = time.time()
        stats = compact_index(spark, frag, comp,
                              BuildConfig(block_size=128))
        out["compact_sec"] = round(time.time() - t0, 1)
        out["comp_shards"] = int(stats["n_shards"])
        out["comp_postings_files"] = _count_files(
            os.path.join(comp, "postings"))

        r_comp = IndexReader(spark, comp, fast_path_bytes=0)
        out["comp_queries"] = timed_queries(r_comp)
        comp_ids = sorted(
            (h["conv_id"], h["turn_idx"], round(h["score"], 9))
            for h in r_comp.resolve_local(
                r_comp.search(f"{a} {b}", k=50, mode="and"))
        )
        assert comp_ids == frag_ids["check"], \
            "compacted results diverge from fragmented"
        r_comp.close()

        print(json.dumps(out))
        raw_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "BENCH", "raw")
        rep = 0
        while os.path.exists(os.path.join(
                raw_dir, f"compact_bench_{n_turns}_rep{rep}.json")):
            rep += 1
        with open(os.path.join(
                raw_dir, f"compact_bench_{n_turns}_rep{rep}.json"), "w") as f:
            f.write(json.dumps(out) + "\n")
    finally:
        shutil.rmtree(frag, ignore_errors=True)
        shutil.rmtree(comp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
