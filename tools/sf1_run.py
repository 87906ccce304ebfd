"""sf1 scale-up run (VERDICT r3 item 4): build a 20,000,000-turn index at
local[32] — one order of magnitude above the largest previous run (8M) —
and run the full query set against it.

Differences from bench.py, on purpose:
- shard_docs-driven shard count (~306 shards at 64Ki docs/shard — the
  same per-shard volume as the sf0.1 bench plan, scaled out the way a
  cluster build would, instead of packing 10x the data into 32 shards);
- shard_map_json_max lowered to 128 so the shard map takes its
  cluster-scale parquet-graduation path at this shard count (the
  mechanism under test; the default threshold is 4096);
- peak-memory accounting: VmHWM of the driver python, the Spark JVM and
  every pyspark worker, read from /proc after the build.

Writes one JSON line to stdout and BENCH/raw/sf1_local32.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _peak_mem() -> dict:
    """VmHWM (peak RSS) per process class, from /proc. Driver = this
    python; jvm = any java child; workers = pyspark.daemon processes."""
    out = {"driver_gb": 0.0, "jvm_gb": 0.0, "workers_gb": 0.0, "n_workers": 0}

    def hwm_kb(pid):
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        return int(line.split()[1])
        except OSError:
            return 0
        return 0

    out["driver_gb"] = round(hwm_kb(os.getpid()) / 1e6, 2)
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace")
        except OSError:
            continue
        if "java" in cmd and "indexer_spark_sf1" in cmd:
            out["jvm_gb"] = round(max(out["jvm_gb"] * 1e6, hwm_kb(pid)) / 1e6, 2)
        elif "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
            out["workers_gb"] = round(out["workers_gb"] + hwm_kb(pid) / 1e6, 2)
            out["n_workers"] += 1
    return out


def main():
    from bench import _calibrate
    from indexer_spark.build import BuildConfig, build_index, read_stats
    from indexer_spark.query import IndexReader
    from indexer_spark.session import get_spark, warm_workers
    from indexer_spark.synth import gen_queries, transcripts_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", str(20_000_000)))
    t: dict = {"turns": n_turns, "cpus": cpus}
    t["calib_gops"] = _calibrate(cpus)
    print(f"calib: {t['calib_gops']}", file=sys.stderr, flush=True)

    spark = get_spark(cores=cpus, shuffle_partitions=cpus,
                      driver_memory="48g", app_name="indexer_spark_sf1")
    corpus = tempfile.mkdtemp(prefix="sf1_corpus_")
    # fixed index path: a crashed/re-run session reuses the built index
    # instead of paying the ~6 min build again (SPARK_GRAFT_SF1_FRESH=1
    # forces a rebuild); the dir is kept on exit for the same reason
    index_dir = os.environ.get("SPARK_GRAFT_SF1_INDEX",
                               "/tmp/sf1_index_r05")
    reuse = False
    if os.environ.get("SPARK_GRAFT_SF1_FRESH") == "1":
        shutil.rmtree(index_dir, ignore_errors=True)
    try:
        stats = read_stats(index_dir)
        reuse = stats.get("n_docs") == n_turns
    except Exception:
        pass
    try:
        if not reuse:
            t0 = time.time()
            transcripts_spark(spark, n_turns, seed=42).write.mode(
                "overwrite").parquet(corpus)
            t["synth_sec"] = round(time.time() - t0, 1)
            print(f"synth: {t['synth_sec']}s", file=sys.stderr, flush=True)
            warm_workers(spark)
            sdf = spark.read.parquet(corpus)

            cfg = BuildConfig(block_size=128, shard_docs=1 << 16,
                              shard_map_json_max=128)
            t0 = time.time()
            stats = build_index(spark, sdf, index_dir, cfg)
            t["build_sec"] = round(time.time() - t0, 1)
            t["turns_per_sec"] = round(n_turns / t["build_sec"], 1)
        else:
            print("reusing existing sf1 index", file=sys.stderr, flush=True)
            t["build_sec"] = None
            t["reused_index"] = True
        t["n_shards"] = stats["n_shards"]
        with open(os.path.join(index_dir, "stats.json")) as f:
            t["shard_map_mode"] = json.load(f).get("shard_map", "json")
        t["peak_mem"] = _peak_mem()
        print(f"build: {t['build_sec']}s, shards={t['n_shards']}, "
              f"shard_map={t['shard_map_mode']}, mem={t['peak_mem']}",
              file=sys.stderr, flush=True)
        assert read_stats(index_dir)["n_docs"] == n_turns

        reader = IndexReader(spark, index_dir)
        queries = [q for _, q, _ in gen_queries() if q.strip()]
        t0 = time.time()
        reader.search(queries[0], 10)
        t["bm25_cold_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        t["warm_hot_terms"] = reader.warm_hot_terms(16)
        t["warm_hot_sec"] = round(time.time() - t0, 3)
        t["warm_cap_mb"] = os.environ.get("INDEXER_SPARK_WARM_CAP_MB")
        t0 = time.time()
        # gated by default at this shard count (306 >= 128): records the
        # new scale-safe posture — lazy per-worker LRU fill, no 389 s
        # pre-scan (round-4 measured cost at 306 shards)
        t["warm_workers_blocks"] = reader.warm_worker_caches(8)
        t["warm_workers_sec"] = round(time.time() - t0, 3)
        for label in ("warm", "steady"):
            lat = []
            fast = 0
            for q in queries:
                t0 = time.time()
                reader.search(q, 10)
                lat.append(time.time() - t0)
                fast += reader.last_path == "fast"
            lat.sort()
            t[f"bm25_{label}_p50"] = round(lat[len(lat) // 2], 3)
            t[f"bm25_{label}_p95"] = round(
                lat[min(len(lat) - 1, int(0.95 * len(lat)))], 3)
            t[f"bm25_{label}_fast_paths"] = f"{fast}/{len(lat)}"
        t0 = time.time()
        reader.search_tfidf(queries[2], 10)
        t["tfidf_sec"] = round(time.time() - t0, 3)
        # tfidf fast-path validation at 20M (round 5): raw=True warming
        # stores the raw decoded tuples the tfidf hybrid/all-cached
        # paths serve from; warm + steady sweeps mirror the bm25 ones
        t0 = time.time()
        t["warm_raw_terms"] = reader.warm_hot_terms(16, raw=True)
        t["warm_raw_sec"] = round(time.time() - t0, 3)
        for label in ("warm", "steady"):
            lat = []
            fast = 0
            for q in queries:
                t0 = time.time()
                reader.search_tfidf(q, 10)
                lat.append(time.time() - t0)
                fast += reader.last_path == "fast"
            lat.sort()
            t[f"tfidf_{label}_p50"] = round(lat[len(lat) // 2], 3)
            t[f"tfidf_{label}_p95"] = round(
                lat[min(len(lat) - 1, int(0.95 * len(lat)))], 3)
            t[f"tfidf_{label}_fast_paths"] = f"{fast}/{len(lat)}"
        # AND mode at scale
        t0 = time.time()
        reader.search(queries[2], 10, mode="and")
        t["bm25_and_sec"] = round(time.time() - t0, 3)
        t["peak_mem_after_queries"] = _peak_mem()

        out = {"metric": "sf1_build_plus_queryset", "sf": 1.0, **t}
        line = json.dumps(out)
        print(line, flush=True)
        raw = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "BENCH",
            "raw", os.environ.get("SPARK_GRAFT_SF1_OUT", "sf1_local32.json"),
        )
        os.makedirs(os.path.dirname(raw), exist_ok=True)
        with open(raw, "w") as f:
            f.write(line + "\n")
    finally:
        # index_dir is kept for re-runs (see above); corpus is not
        shutil.rmtree(corpus, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
