"""Concurrent serving throughput (VERDICT r4 item 5).

server.py claims thread-safe serving off the shared reader/LRU but QPS
had never been measured. This tool builds (or reuses) an sf0.1-shape
index, starts QueryServer warmed, then drives the mixed hot/mid-term
reference query set from N concurrent HTTP clients for a fixed number
of requests each, recording p50/p95 latency and aggregate QPS at each
concurrency level — plus a rank-identity assertion: every response
under concurrency must equal the single-threaded warm answer for the
same query (no cross-request corruption).

Writes one JSON line to stdout (calib-stamped); committed as
BENCH/raw/server_bench_sf0.1.json.

Usage: python tools/server_bench.py [n_turns]
Env: SPARK_GRAFT_CPUS (default 32)
"""

import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


REQUESTS_PER_CLIENT = 50


def _client(port: int, queries: list, out: list, want: dict, idx: int):
    """One client thread: round-robin the query set, record latencies,
    and verify every response against the single-threaded answer."""
    lat = []
    mismatches = 0
    for i in range(REQUESTS_PER_CLIENT):
        q = queries[(idx + i) % len(queries)]
        url = (f"http://127.0.0.1:{port}/search?q="
               + urllib.request.quote(q) + "&k=10")
        t0 = time.perf_counter()
        with urllib.request.urlopen(url, timeout=120) as r:
            body = json.loads(r.read())
        lat.append(time.perf_counter() - t0)
        got = [(x["conv_id"], x["turn_idx"], round(x["score"], 9))
               for x in body["hits"]]
        if got != want[q]:
            mismatches += 1
    out[idx] = (lat, mismatches)


def main():
    from bench import _calibrate

    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    calib = _calibrate(cpus)
    log(f"calibration: {calib}")

    from indexer_spark.build import BuildConfig, build_index, read_stats
    from indexer_spark.server import QueryServer
    from indexer_spark.session import get_spark
    from indexer_spark.synth import gen_queries, transcripts_spark

    spark = get_spark(cores=cpus, shuffle_partitions=cpus,
                      driver_memory="48g", app_name="server_bench")
    # fixed index path: reused across re-runs (same rationale as sf1_run)
    index_dir = "/tmp/server_bench_index"
    t: dict = {}
    try:
        reuse = False
        try:
            reuse = read_stats(index_dir).get("n_docs") == n_turns
        except Exception:
            pass
        if not reuse:
            corpus = tempfile.mkdtemp(prefix="server_bench_corpus_")
            t0 = time.time()
            transcripts_spark(spark, n_turns, seed=42).write.mode(
                "overwrite").parquet(corpus)
            sdf = spark.read.parquet(corpus)
            build_index(spark, sdf, index_dir,
                        BuildConfig(block_size=128, shard_docs=1 << 16))
            t["build_sec"] = round(time.time() - t0, 1)
            import shutil

            shutil.rmtree(corpus, ignore_errors=True)
        else:
            log("reusing index")

        srv = QueryServer(spark, index_dir, warm_hot_terms=32)
        port = srv.start()
        queries = [q for _, q, _ in gen_queries() if q.strip()]

        # single-threaded ground truth (also finishes the warm: each
        # query's uncovered terms get cached by the hybrid path)
        want = {}
        for q in queries:
            url = (f"http://127.0.0.1:{port}/search?q="
                   + urllib.request.quote(q) + "&k=10")
            with urllib.request.urlopen(url, timeout=120) as r:
                body = json.loads(r.read())
            want[q] = [(x["conv_id"], x["turn_idx"], round(x["score"], 9))
                       for x in body["hits"]]

        levels = {}
        total_mismatch = 0
        for n_clients in (1, 8, 16, 32):
            out = [None] * n_clients
            threads = [
                threading.Thread(target=_client,
                                 args=(port, queries, out, want, i))
                for i in range(n_clients)
            ]
            t0 = time.perf_counter()
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            wall = time.perf_counter() - t0
            lats = sorted(x for o in out for x in o[0])
            mism = sum(o[1] for o in out)
            total_mismatch += mism
            n_req = n_clients * REQUESTS_PER_CLIENT
            levels[str(n_clients)] = {
                "qps": round(n_req / wall, 1),
                "p50_ms": round(1000 * lats[len(lats) // 2], 2),
                "p95_ms": round(1000 * lats[int(0.95 * len(lats))], 2),
                "p99_ms": round(1000 * lats[int(0.99 * len(lats))], 2),
                "mismatches": mism,
            }
            log(f"{n_clients} clients: {levels[str(n_clients)]}")
        srv.stop()

        out = {
            "metric": "server_concurrent_qps",
            "unit": "qps",
            "n_turns": n_turns,
            "cpus": cpus,
            "requests_per_client": REQUESTS_PER_CLIENT,
            "n_queries": len(queries),
            "levels": levels,
            "rank_identity_violations": total_mismatch,
            "build_sec": t.get("build_sec"),
            "calib_gops": calib,
        }
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
