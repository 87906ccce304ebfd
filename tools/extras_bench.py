"""Engine-scale walls for the LLM-pipeline extras (VERDICT r4 item 4).

The dedup / similarity subsystems are oracle-green at sf0.01 (500 docs)
but had no committed performance evidence. Two corpora are used, because
they answer different questions:

1. PLANTED corpus (default 2,000,000 docs): ~30 unique tokens/doc drawn
   from a 200k-token space, with 10% of even/odd id pairs planted as
   near-duplicates (2 of 30 tokens mutated -> Jaccard ~0.875). Ground
   truth is known (n/20 pairs), so the end-to-end MinHash+LSH walls come
   with measured recall AND a linear-growth check (candidates at n/10 vs
   n: with near-dup density linear in docs, candidates must grow ~10x,
   not ~100x).
2. ZIPF corpus (the engine's transcripts synth: 40-token turns over a
   2k-word Zipf vocabulary). Here TRUE near-pair density is quadratic in
   docs — random doc pairs genuinely overlap — so end-to-end pair
   materialization is the wrong benchmark shape; what matters at scale
   is that the bucket/block CAPS engage. We band the signatures and
   measure bucket-size distribution + the analytic candidate mass
   sum(C(size,2)) with and without the cap (no pair join run), observing
   cap engagement under Zipf directly (VERDICT r4 item 4's open check).

Also: SimHash end-to-end on the planted corpus (chunk-block cap default
engaged), and IVF build + query-vs-brute-force walls + recall@10 on
deterministic clustered embeddings.

Output: one JSON line (calib-stamped like bench.py), committed as
BENCH/raw/extras_bench_<n>.json.

Usage: python tools/extras_bench.py [n_docs] [n_vec]
Env: SPARK_GRAFT_CPUS (default 32)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


DIM = 64
K_CLUSTERS = 64
DOC_TOKENS = 30
TOKEN_SPACE = 200_000
C1 = np.uint64(0x9E3779B97F4A7C15)
C2 = np.uint64(0xBF58476D1CE4E5B9)
C3 = np.uint64(0x94D049BB133111EB)


def _planted_docs(spark, n: int, cpus: int):
    """Deterministic corpus with planted near-duplicates: doc text is a
    pure function of the row id (identical at any parallelism). Even ids
    2k get unique text; the odd partner 2k+1 is a near-dup (last 2 of 30
    tokens mutated, Jaccard ~0.875) when k % 10 == 0, else unique.
    Ground truth: n/20 planted pairs (for n a multiple of 20)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def text_of(ids: pd.Series) -> pd.Series:
        a = ids.to_numpy().astype(np.uint64)
        base = a & ~np.uint64(1)
        planted = (base >> np.uint64(1)) % np.uint64(10) == 0
        odd = (a & np.uint64(1)).astype(bool)
        # non-planted odd docs get their OWN text; planted odd docs
        # share the even partner's base text
        src = np.where(odd & ~planted, a, base)
        pos = np.arange(DOC_TOKENS, dtype=np.uint64)
        h = src[:, None] * C1 + (pos[None, :] + np.uint64(1)) * C2
        h = (h ^ (h >> np.uint64(31))) * C3
        tok = (h % np.uint64(TOKEN_SPACE)).astype(np.int64)
        # mutate the last 2 tokens of planted odd docs
        mut = odd & planted
        if mut.any():
            hm = a[mut, None] * C3 + (pos[None, -2:] + np.uint64(17)) * C1
            hm = (hm ^ (hm >> np.uint64(29))) * C2
            tok[mut, -2:] = (hm % np.uint64(TOKEN_SPACE)).astype(np.int64)
        return pd.Series(
            [" ".join("w%d" % v for v in row) for row in tok]
        )

    return spark.range(0, n, 1, cpus).select(
        F.col("id").alias("doc_id"), text_of("id").alias("text")
    )


def _bucket_stats(sigs, bands: int, rows_per_band: int, cap: int):
    """Band the signatures and return bucket-size distribution facts plus
    the ANALYTIC candidate mass sum(C(size,2)) with/without the cap —
    observes cap engagement without materializing a quadratic join."""
    from pyspark.sql import functions as F

    frames = []
    for bnd in range(bands):
        cols = [F.col(f"mh{bnd * rows_per_band + r}")
                for r in range(rows_per_band)]
        frames.append(sigs.select(
            F.lit(bnd).alias("band"), F.xxhash64(*cols).alias("bucket")))
    allb = frames[0]
    for x in frames[1:]:
        allb = allb.unionByName(x)
    sizes = allb.groupBy("band", "bucket").count()
    agg = sizes.agg(
        F.max("count").alias("max_bucket"),
        F.sum(F.when(F.col("count") > cap, 1).otherwise(0)).alias("over_cap"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("mass_all"),
        F.sum(
            F.when(F.col("count") <= cap,
                   F.col("count") * (F.col("count") - 1) / 2).otherwise(0)
        ).alias("mass_capped"),
        F.count("*").alias("n_buckets"),
    ).first()
    return {
        "max_bucket": int(agg["max_bucket"]),
        "buckets_over_cap": int(agg["over_cap"]),
        "n_buckets": int(agg["n_buckets"]),
        "candidate_mass_uncapped": int(agg["mass_all"]),
        "candidate_mass_capped": int(agg["mass_capped"]),
    }


def _synth_embeddings(spark, n: int, cpus: int):
    """Deterministic clustered embeddings: center[id % K] + hashed noise.
    Pure function of the row id, identical at any parallelism."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((K_CLUSTERS, DIM))
    bc = spark.sparkContext.broadcast(centers)

    @F.pandas_udf(ArrayType(FloatType()))
    def vec_of(ids: pd.Series) -> pd.Series:
        a = ids.to_numpy().astype(np.uint64)
        d = np.arange(DIM, dtype=np.uint64)
        h = a[:, None] * C1 + (d[None, :] + np.uint64(1)) * C2
        h = (h ^ (h >> np.uint64(31))) * C3
        noise = (h >> np.uint64(11)).astype(np.float64) / 2**53 - 0.5
        v = bc.value[(a % np.uint64(K_CLUSTERS)).astype(np.int64)] + 0.3 * noise
        return pd.Series(list(v.astype(np.float32)))

    return spark.range(0, n, 1, cpus).select(
        F.col("id").alias("vec_id"), vec_of("id").alias("embedding")
    ), centers


def main():
    from bench import _calibrate

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_vec = int(sys.argv[2]) if len(sys.argv) > 2 else n_docs
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    calib = _calibrate(cpus)
    log(f"calibration: {calib}")

    from pyspark.sql import functions as F

    from indexer_spark.extras import dedup, simsearch
    from indexer_spark.session import get_spark
    from indexer_spark.synth import transcripts_spark

    spark = get_spark(cores=cpus, shuffle_partitions=cpus,
                      driver_memory="48g", app_name="extras_bench")
    t: dict = {}
    counts: dict = {}
    import tempfile

    work = tempfile.mkdtemp(prefix="extras_bench_")
    try:
        # ---- planted corpus (materialized: stages read a real table) --
        t0 = time.time()
        docs_path = os.path.join(work, "docs")
        _planted_docs(spark, n_docs, cpus).write.mode("overwrite").parquet(
            docs_path)
        docs = spark.read.parquet(docs_path)
        t["synth_docs"] = round(time.time() - t0, 3)
        planted_truth = n_docs // 20
        log(f"planted docs synth {t['synth_docs']}s (truth {planted_truth} pairs)")

        # ---- MinHash + LSH end-to-end (engine defaults) --------------
        t0 = time.time()
        sigs = dedup.minhash_signatures(docs, num_hashes=32)
        pairs = dedup.lsh_candidate_pairs(sigs, bands=8, rows_per_band=4)
        n_cand = pairs.count()
        t["minhash_lsh_candidates"] = round(time.time() - t0, 3)
        t0 = time.time()
        verified = dedup.verify_jaccard(docs, pairs, threshold=0.8)
        n_verified = verified.count()
        t["jaccard_verify"] = round(time.time() - t0, 3)
        t["minhash_total"] = round(
            t["minhash_lsh_candidates"] + t["jaccard_verify"], 3)
        recall = round(n_verified / planted_truth, 4)
        log(f"minhash: cand={n_cand} verified={n_verified} "
            f"recall={recall} walls {t['minhash_lsh_candidates']}"
            f"/{t['jaccard_verify']}s")

        # ---- candidate growth: n/10 control --------------------------
        # keep blocks of 20 CONSECUTIVE ids: each block holds 10 id
        # pairs of which exactly 1 is planted, so the sample preserves
        # the full corpus's near-dup DENSITY (1/20 of docs in a planted
        # pair), not just its pairs — a %20<2 filter would keep every
        # planted pair and no fillers, making growth look flat
        small = docs.filter(F.col("doc_id") % 200 < 20)
        n_small = small.count()
        t0 = time.time()
        n_cand_small = dedup.lsh_candidate_pairs(
            dedup.minhash_signatures(small, num_hashes=32),
            bands=8, rows_per_band=4).count()
        t["minhash_lsh_small"] = round(time.time() - t0, 3)
        growth = (n_cand / max(n_cand_small, 1)) / (n_docs / max(n_small, 1))
        log(f"growth: {n_cand_small}@{n_small} -> {n_cand}@{n_docs} "
            f"(normalized {growth:.2f}; ~1 = linear)")

        # ---- SimHash end-to-end (planted) ----------------------------
        t0 = time.time()
        n_simhash = dedup.simhash_near_duplicates(docs).count()
        t["simhash_total"] = round(time.time() - t0, 3)
        log(f"simhash: pairs={n_simhash} wall {t['simhash_total']}s")

        # ---- Zipf corpus: bucket-cap engagement (analytic) -----------
        # the transcripts synth (40-token turns, 2k-word Zipf vocab) has
        # QUADRATIC true near-pair density, so we observe the caps, not
        # a pair join
        t0 = time.time()
        zdocs_path = os.path.join(work, "zdocs")
        (transcripts_spark(spark, n_docs, seed=42)
         .select(F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text")
         .write.mode("overwrite").parquet(zdocs_path))
        zdocs = spark.read.parquet(zdocs_path)
        zsigs = dedup.minhash_signatures(zdocs, num_hashes=32)
        zstats = _bucket_stats(zsigs, bands=8, rows_per_band=4, cap=1000)
        t["zipf_bucket_stats"] = round(time.time() - t0, 3)
        counts["zipf_lsh"] = zstats
        log(f"zipf bucket stats {zstats} wall {t['zipf_bucket_stats']}s")

        # ---- IVF -----------------------------------------------------
        emb_path = os.path.join(work, "emb")
        ivf_path = os.path.join(work, "ivf")
        t0 = time.time()
        emb_df, centers = _synth_embeddings(spark, n_vec, cpus)
        emb_df.write.mode("overwrite").parquet(emb_path)
        emb = spark.read.parquet(emb_path)
        t["synth_vec"] = round(time.time() - t0, 3)
        t0 = time.time()
        idx = simsearch.IvfIndex.build(
            spark, emb, ivf_path, n_centroids=K_CLUSTERS, iters=8)
        t["ivf_build"] = round(time.time() - t0, 3)
        log(f"ivf build {t['ivf_build']}s")

        rng = np.random.default_rng(99)
        queries = [centers[i] + 0.05 * rng.standard_normal(DIM)
                   for i in (3, 17, 41, 60)]
        brute_walls, ivf_walls, recalls = [], [], []
        for q in queries:
            t0 = time.time()
            want = [r["vec_id"]
                    for r in simsearch.brute_force_topk(emb, q, 10).collect()]
            brute_walls.append(time.time() - t0)
            t0 = time.time()
            got = [r["vec_id"] for r in idx.search(q, 10, nprobe=4).collect()]
            ivf_walls.append(time.time() - t0)
            recalls.append(len(set(got) & set(want)) / 10.0)
        t["brute_query_p50"] = round(float(np.median(brute_walls)), 3)
        t["ivf_query_p50"] = round(float(np.median(ivf_walls)), 3)
        ivf_recall = round(float(np.mean(recalls)), 3)
        log(f"query p50: brute {t['brute_query_p50']}s ivf "
            f"{t['ivf_query_p50']}s recall@10 {ivf_recall}")

        counts.update({
            "lsh_candidates": n_cand,
            "jaccard_verified": n_verified,
            "planted_truth": planted_truth,
            "minhash_recall": recall,
            "lsh_candidates_small": n_cand_small,
            "n_docs_small": n_small,
            "candidate_growth_normalized": round(growth, 3),
            "simhash_pairs": n_simhash,
        })
        out = {
            "metric": "extras_dedup_simsearch_walls",
            "unit": "sec",
            "n_docs": n_docs,
            "n_vec": n_vec,
            "cpus": cpus,
            "walls": t,
            "counts": counts,
            "ivf_recall_at_10": ivf_recall,
            "calib_gops": calib,
        }
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
