"""Positional-index cost + phrase-query probe at engine scale.

Builds the SAME 2M-turn corpus twice — BuildConfig(positions=False) and
(positions=True) — at local[32], comparing build wall and on-disk
postings bytes (the honest price of positions), then times distributed
phrase queries of three shapes harvested from real doc texts:

  - bigram sliced from a document (guaranteed match),
  - that bigram reversed (usually rare/no match: worst-case verify),
  - a 4-gram slice (longer chain, more intersections).

Each phrase result is cross-checked against mode="and" (phrase hits
must be a subset of the conjunction) and, for the sliced phrases, must
contain the source doc. Writes one JSON line to stdout and the next
free BENCH/raw/phrase_bench_2m_rep{N}.json (append-only; rep history
matters more than any single wall on this noisy VM).

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


def _dir_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main():
    from bench import _calibrate
    from indexer_spark.build import BuildConfig, build_index
    from indexer_spark.query import IndexReader
    from indexer_spark.session import get_spark, warm_workers
    from indexer_spark.synth import transcripts_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", str(2_000_000)))
    out: dict = {"metric": "phrase_probe", "turns": n_turns, "cpus": cpus,
                 "calib_gops": _calibrate(cpus)}

    spark = get_spark(cores=cpus, shuffle_partitions=cpus,
                      driver_memory="48g",
                      app_name="indexer_spark_phrasebench")
    corpus = tempfile.mkdtemp(prefix="phrasebench_corpus_")
    idx_plain = tempfile.mkdtemp(prefix="phrasebench_plain_")
    idx_pos = tempfile.mkdtemp(prefix="phrasebench_pos_")
    try:
        transcripts_spark(spark, n_turns, seed=42).write.mode(
            "overwrite").parquet(corpus)
        warm_workers(spark)
        sdf = spark.read.parquet(corpus)

        # alternate plain/positional twice and take best-of-two per
        # variant: a fixed order biases whichever build runs first with
        # cold-JVM/page-cache cost, and single shots carry this VM's
        # window noise (observed plain-first ratios 1.96x and 0.51x for
        # IDENTICAL code — both artifacts of ordering + windows)
        walls = {"plain": [], "pos": []}
        for rep in range(2):
            for name, cfg_kw in (("plain", {}), ("pos", {"positions": True})):
                tgt = idx_plain if name == "plain" else idx_pos
                shutil.rmtree(tgt, ignore_errors=True)
                t0 = time.time()
                build_index(spark, sdf, tgt,
                            BuildConfig(block_size=128, id_partitions=cpus,
                                        **cfg_kw))
                walls[name].append(round(time.time() - t0, 1))
        out["build_plain_secs"] = walls["plain"]
        out["build_pos_secs"] = walls["pos"]
        out["build_plain_sec"] = min(walls["plain"])
        out["build_pos_sec"] = min(walls["pos"])
        out["build_overhead_x"] = round(
            out["build_pos_sec"] / out["build_plain_sec"], 3)
        pb = _dir_bytes(os.path.join(idx_plain, "postings"))
        qb = _dir_bytes(os.path.join(idx_pos, "postings"))
        out["postings_bytes_plain"] = pb
        out["postings_bytes_pos"] = qb
        out["postings_overhead_x"] = round(qb / pb, 3) if pb else None

        # harvest real phrases (skip stop-words so AND cross-check sees
        # the same term set)
        rows = sdf.limit(50).collect()
        from indexer_spark.lexer import tokenize

        bigram = fourgram = None
        for r in rows:
            words = str(r["text"] or "").split()
            for s in range(0, max(0, len(words) - 4)):
                cand2 = words[s : s + 2]
                cand4 = words[s : s + 4]
                if len(tokenize(" ".join(cand2))) == 2 and bigram is None:
                    bigram = " ".join(cand2)
                if len(tokenize(" ".join(cand4))) == 4 and fourgram is None:
                    fourgram = " ".join(cand4)
            if bigram and fourgram:
                break
        assert bigram and fourgram, "no harvestable phrase in corpus head"
        queries = {
            "bigram": bigram,
            "bigram_rev": " ".join(reversed(bigram.split())),
            "fourgram": fourgram,
        }
        out["queries"] = {}
        from indexer_spark.oracle import OracleIndex

        checker = OracleIndex([])  # only .phrase_match used
        reader = IndexReader(spark, idx_pos, fast_path_bytes=0)
        try:
            for name, q in queries.items():
                walls = []
                for _ in range(3):
                    t0 = time.time()
                    hits = reader.search(q, k=10, mode="phrase")
                    walls.append(round(time.time() - t0, 3))
                # verify every hit against the RAW text (independent of
                # the index): resolve doc_id -> (conv_id, turn_idx),
                # fetch the source rows, run the naive position matcher
                if hits:
                    res = reader.resolve(hits).select("conv_id", "turn_idx")
                    src = sdf.join(res, ["conv_id", "turn_idx"]).select("text")
                    texts = [r["text"] for r in src.collect()]
                    assert len(texts) == len(hits)
                    bad = [t[:60] for t in texts
                           if not checker.phrase_match(t, q)]
                    assert not bad, f"{name}: non-matching hit texts {bad}"
                out["queries"][name] = {
                    "q": q, "walls_sec": walls, "n_hits": len(hits),
                }
                # AND-mode wall on the same terms for an apples cost ratio
                t0 = time.time()
                reader.search(q, k=10, mode="and")
                out["queries"][name]["and_wall_sec"] = round(time.time() - t0, 3)
        finally:
            reader.close()
        print(json.dumps(out))
        raw_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "BENCH", "raw")
        rep = 0
        while os.path.exists(os.path.join(
                raw_dir, f"phrase_bench_2m_rep{rep}.json")):
            rep += 1
        with open(os.path.join(raw_dir,
                               f"phrase_bench_2m_rep{rep}.json"), "w") as f:
            f.write(json.dumps(out) + "\n")
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
        shutil.rmtree(idx_plain, ignore_errors=True)
        shutil.rmtree(idx_pos, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
