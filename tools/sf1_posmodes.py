"""sf1 scale-up of the round-5 query layer: build a 20,000,000-turn
POSITIONAL index at local[32] (same shard plan as tools/sf1_run.py:
64Ki docs/shard -> ~306 shards, parquet shard-map graduation forced)
and measure phrase / near / boolean / prefix / facet / export at one
order of magnitude above their 2M benches.

Guards at full result size: positional containment (phrase ⊆ near(2) ⊆
near(8) ⊆ and), NOT disjointness, facet totals == match count. Writes
one JSON line to stdout and BENCH/raw/sf1_posmodes_r06.json.

Env: SPARK_GRAFT_CPUS (32), SPARK_GRAFT_TURNS (20M),
SPARK_GRAFT_SF1POS_INDEX (default /tmp/sf1_pos_index_r06; reused if
present, SPARK_GRAFT_SF1_FRESH=1 rebuilds).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_TOOLS, ".."))
sys.path.insert(0, _TOOLS)


def main():
    from bench import _calibrate
    from sf1_run import _peak_mem

    from indexer_spark.build import BuildConfig, build_index, read_stats
    from indexer_spark.lexer import tokenize
    from indexer_spark.query import IndexReader
    from indexer_spark.session import get_spark, warm_workers
    from indexer_spark.synth import transcripts_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", str(20_000_000)))
    out: dict = {"metric": "sf1_posmodes", "turns": n_turns, "cpus": cpus,
                 "calib_gops": _calibrate(cpus)}
    print(f"calib: {out['calib_gops']}", file=sys.stderr, flush=True)

    spark = get_spark(cores=cpus, shuffle_partitions=cpus,
                      driver_memory="48g",
                      app_name="indexer_spark_sf1pos")
    index_dir = os.environ.get("SPARK_GRAFT_SF1POS_INDEX",
                               "/tmp/sf1_pos_index_r06")
    if os.environ.get("SPARK_GRAFT_SF1_FRESH") == "1":
        shutil.rmtree(index_dir, ignore_errors=True)
    corpus = tempfile.mkdtemp(prefix="sf1pos_corpus_")
    try:
        warm_workers(spark)
        if os.path.exists(os.path.join(index_dir, "stats.json")):
            out["build_sec"] = None  # reused from a prior session
        else:
            src = transcripts_spark(spark, n_turns, seed=42)
            src.write.mode("overwrite").parquet(corpus)
            sdf = spark.read.parquet(corpus)
            t0 = time.time()
            build_index(
                spark, sdf, index_dir,
                BuildConfig(block_size=128, positions=True,
                            shard_map_json_max=128),
            )
            out["build_sec"] = round(time.time() - t0, 1)
            out["turns_per_sec"] = round(n_turns / out["build_sec"], 0)
        st = read_stats(index_dir)
        out["n_shards"] = int(st["n_shards"])
        out["peak_mem"] = _peak_mem()

        rows = transcripts_spark(spark, 100, seed=42).collect()
        bigram = third = None
        for r in rows:
            words = str(r["text"] or "").split()
            for s in range(0, max(0, len(words) - 4)):
                cand2 = words[s:s + 2]
                if len(set(tokenize(" ".join(cand2)))) == 2:
                    bigram = cand2
                    rest = [w for w in words[s + 2:]
                            if tokenize(w) and w not in cand2]
                    third = rest[0] if rest else None
                    break
            if bigram and third:
                break
        assert bigram and third
        a, b = bigram
        out["terms"] = {"a": a, "b": b, "c": third}
        q2 = f"{a} {b}"

        def timed(fn, reps=3):
            walls, res = [], None
            for _ in range(reps):
                t0 = time.time()
                res = fn()
                walls.append(round(time.time() - t0, 3))
            return walls, res

        r_dist = IndexReader(spark, index_dir, fast_path_bytes=0)
        # one untimed pass per column family first: the r05 run showed
        # the FIRST mode absorbing the whole cold page-cache cost of the
        # hot terms' payloads (and: 9.5 s cold vs ~3 s warm re-timed) —
        # time modes on a warm cache so the table compares scorers, not
        # IO order
        r_dist.search(q2, k=10, mode="and")
        r_dist.search(q2, k=10, mode="phrase")
        out["dist"] = {}
        for name, fn in {
            "and": lambda: r_dist.search(q2, k=10, mode="and"),
            "phrase": lambda: r_dist.search(q2, k=10, mode="phrase"),
            "near_w8": lambda: r_dist.search(q2, k=10, mode="near",
                                             window=8),
            "bool_not": lambda: r_dist.search_bool(f"{a} NOT {b}", k=10),
            "prefix3": lambda: r_dist.search_bool(f"{a[:3]}*", k=10),
        }.items():
            walls, hits = timed(fn)
            out["dist"][name] = {"walls_sec": walls, "n_hits": len(hits)}
        big = {
            name: {d for d, _ in r_dist.search(q2, k=1 << 30, mode=m,
                                               window=w)}
            for name, (m, w) in {
                "and": ("and", 8), "phrase": ("phrase", 8),
                "near_w2": ("near", 2), "near_w8": ("near", 8),
            }.items()
        }
        assert big["phrase"] <= big["near_w2"] <= big["near_w8"] \
            <= big["and"], "containment violated at sf1"
        out["n_docs_modes"] = {k: len(v) for k, v in big.items()}
        not_docs = {d for d, _ in
                    r_dist.search_bool(f"{a} NOT {b}", k=1 << 30)}
        b_docs = {d for d, _ in r_dist.search(b, k=1 << 30, mode="and")}
        assert not (not_docs & b_docs), "NOT leaked at sf1"

        # facets (distributed: matched set is sf1-sized) + export
        t0 = time.time()
        fc = r_dist.facet_counts(a, by="role", k=10)
        out["facet_wall_sec"] = round(time.time() - t0, 1)
        out["facet_total"] = int(sum(c for _v, c in fc))
        exp_dir = tempfile.mkdtemp(prefix="sf1pos_export_")
        try:
            t0 = time.time()
            n = r_dist.export_matches(f"{a} NOT {b}", exp_dir, mode="bool")
            out["export_wall_sec"] = round(time.time() - t0, 1)
            out["export_rows"] = int(n)
            assert n == len(not_docs)
        finally:
            shutil.rmtree(exp_dir, ignore_errors=True)
        r_dist.close()

        # serving shapes on a default reader (driver paths where gated)
        r2 = IndexReader(spark, index_dir)
        out["serving"] = {}
        for name, fn in {
            "phrase": lambda: r2.search(q2, k=10, mode="phrase"),
            "near_w8": lambda: r2.search(q2, k=10, mode="near", window=8),
            "bool_not": lambda: r2.search_bool(f"{a} NOT {b}", k=10),
            "prefix3": lambda: r2.search_bool(f"{a[:3]}*", k=10),
        }.items():
            walls, _h = timed(fn)
            out["serving"][name] = {"walls_sec": walls,
                                    "path": r2.last_path}
        r2.close()

        print(json.dumps(out))
        with open(os.path.join(_TOOLS, "..", "BENCH", "raw",
                               "sf1_posmodes_r06.json"), "w") as f:
            f.write(json.dumps(out) + "\n")
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
