"""Serving scale-out probe: K replicated server processes over ONE
immutable index.

server_bench.py showed a single QueryServer process is GIL-bound:
aggregate QPS stays ~flat (~31/s at 2M turns) from 1 to 32 concurrent
clients — the driver fast path is Python/numpy and the Python slices
serialize. The deployment posture for that is replication, not threads:
the index is immutable parquet, so N server processes (on one box or
many) share the OS page cache and need no coordination; a fronting load
balancer round-robins. This tool evidences the posture: it forks K
child server processes (each its own SparkSession + warmed reader over
the SAME index dir), drives the same mixed hot/mid query set through a
fixed client pool round-robined across processes, and reports per-level
aggregate QPS — plus the same rank-identity assertion as server_bench
(every response equals the single-threaded ground truth).

Writes one JSON line to stdout; committed as
BENCH/raw/server_scaleout_sf0.1.json.

Usage:
  python tools/server_scaleout.py [n_turns] [n_procs]     # parent
  python tools/server_scaleout.py --serve-one <index_dir> # child (internal)
"""

import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


REQUESTS_PER_CLIENT = 50
INDEX_DIR = "/tmp/server_bench_index"


def serve_one(index_dir: str):
    """Child: start one warmed QueryServer, print the port, serve until
    killed. Modest driver memory — serving is driver-side after warm."""
    from indexer_spark.server import QueryServer
    from indexer_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, driver_memory="8g",
                      app_name=f"server_scaleout_{os.getpid()}")
    srv = QueryServer(spark, index_dir, warm_hot_terms=32)
    port = srv.start()
    print(json.dumps({"port": port}), flush=True)
    threading.Event().wait()  # serve forever; parent kills us


def _client(ports: list, queries: list, out: list, want: dict, idx: int):
    lat = []
    mismatches = 0
    for i in range(REQUESTS_PER_CLIENT):
        q = queries[(idx + i) % len(queries)]
        port = ports[(idx + i) % len(ports)]  # round-robin the replicas
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
    if len(sys.argv) > 1 and sys.argv[1] == "--serve-one":
        serve_one(sys.argv[2])
        return

    from bench import _calibrate

    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_procs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    calib = _calibrate(cpus)
    log(f"calibration: {calib}")

    from indexer_spark.build import read_stats
    from indexer_spark.synth import gen_queries

    assert read_stats(INDEX_DIR).get("n_docs") == n_turns, (
        f"run tools/server_bench.py {n_turns} first to build {INDEX_DIR}")

    procs = []
    ports = []
    try:
        for i in range(n_procs):
            p = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--serve-one",
                 INDEX_DIR],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True, start_new_session=True,
            )
            procs.append(p)
        t0 = time.time()
        for p in procs:
            # skip any banner/noise lines the Spark startup may emit on
            # stdout; the child's own line is {"port": N}
            while True:
                line = p.stdout.readline()  # blocks until warmed + bound
                if not line:
                    raise RuntimeError("replica died before binding")
                try:
                    ports.append(json.loads(line)["port"])
                    break
                except (json.JSONDecodeError, KeyError):
                    continue
        warm_wall = round(time.time() - t0, 1)
        log(f"{n_procs} replicas up in {warm_wall}s on ports {ports}")

        queries = [q for _, q, _ in gen_queries() if q.strip()]
        # ground truth from replica 0, single-threaded (deterministic
        # scoring -> identical across replicas; asserted below)
        want = {}
        for q in queries:
            url = (f"http://127.0.0.1:{ports[0]}/search?q="
                   + urllib.request.quote(q) + "&k=10")
            with urllib.request.urlopen(url, timeout=120) as r:
                body = json.loads(r.read())
            want[q] = [(x["conv_id"], x["turn_idx"], round(x["score"], 9))
                       for x in body["hits"]]

        # untimed warm pass: hit EVERY query on EVERY replica so each
        # replica's driver LRU covers the set (warm_hot_terms covers the
        # hot terms; the mid-frequency remainder caches on first touch
        # via the hybrid path). Without this, the timed levels charge
        # replicas 1..K-1 their cold decodes and understate steady QPS.
        for port in ports:
            for q in queries:
                url = (f"http://127.0.0.1:{port}/search?q="
                       + urllib.request.quote(q) + "&k=10")
                with urllib.request.urlopen(url, timeout=120) as r:
                    r.read()

        levels = {}
        total_mismatch = 0
        for n_clients in (n_procs, 4 * n_procs, 8 * n_procs):
            out = [None] * n_clients
            threads = [
                threading.Thread(target=_client,
                                 args=(ports, queries, out, want, i))
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
                "mismatches": mism,
            }
            log(f"{n_clients} clients over {n_procs} procs: "
                f"{levels[str(n_clients)]}")

        print(json.dumps({
            "metric": "server_scaleout_qps",
            "unit": "qps",
            "n_turns": n_turns,
            "n_procs": n_procs,
            "cpus": cpus,
            "requests_per_client": REQUESTS_PER_CLIENT,
            "warm_wall_sec": warm_wall,
            "levels": levels,
            "rank_identity_violations": total_mismatch,
            "calib_gops": calib,
        }))
    finally:
        import signal

        for p in procs:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass


if __name__ == "__main__":
    main()
