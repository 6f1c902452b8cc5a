"""spark-submit job: full corpus-preparation funnel, staged + resumable.

Usage:

    python scripts/make_zip.py                       # -> dist/terraspark.zip
    spark-submit --master local[32] \\
        --py-files dist/terraspark.zip \\
        jobs/corpus.py --docs /path/to/documents.parquet \\
        --out /tmp/corpus_out [--eval /path/to/eval_docs.parquet] \\
        [--threshold 0.95] [--mixture-rate 0.5]

Pipeline (each stage is a library operator the driver's correctness gate
verifies independently; this job only composes them):

    1. quality gate       textstats.quality_score + lang_id agreement
                          (dp_quality / dp_lang_id / dp_corpus_filter)
    2. exact dedup        fingerprint first-wins (dp_dedup_exact rule)
    3. near-dup dedup     MinHash -> LSH -> Jaccard verify -> CC canonical
                          (dp_dedup_clusters)
    4. decontamination    8-gram overlap vs the eval set, drop any hit
                          (dp_decontaminate); skipped when --eval absent
    5. mixture sampling   sqrt-temperature per-source rate, deterministic
                          MINSTD per-doc draw (dp_mixture_sample rule)

Each stage writes its survivors to <out>/stage-N-*.parquet; a rerun
SKIPS stages whose _SUCCESS marker exists (crash-resume at stage
granularity -- same checkpoint idea as jobs/correct.py, at coarser
grain because every stage is a full shuffle boundary anyway).  Final:
<out>/keep.parquet + ONE JSON funnel line.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--eval", default=None,
                    help="benchmark/eval docs parquet for decontamination")
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--mixture-rate", type=float, default=0.5)
    ap.add_argument("--min-quality", type=float, default=0.5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = SparkSession.builder.appName("terraspark-corpus").getOrCreate()

    from terraspark.datapipe import dedup, mixture, textstats

    docs = spark.read.parquet(args.docs)
    t0 = time.time()
    n_in = docs.count()
    funnel = {"n_input": n_in}

    # ---- stage 1: quality + language agreement -------------------------
    s1 = os.path.join(args.out, "stage-1-filtered.parquet")
    if not _done(s1):
        q = textstats.quality_score(docs)
        l = textstats.lang_id(docs)
        kept = (docs.join(q, "doc_id").join(l, "doc_id")
                .where((F.col("quality") >= args.min_quality)
                       & (F.col("pred_lang") == F.col("lang")))
                .select(*docs.columns))
        kept.write.mode("overwrite").parquet(s1)
    stage1 = spark.read.parquet(s1)
    funnel["n_after_quality"] = stage1.count()

    # ---- stage 2: exact dedup (fingerprint first-wins) -----------------
    s2 = os.path.join(args.out, "stage-2-exact.parquet")
    if not _done(s2):
        from pyspark.sql import Window
        f = stage1.withColumn(
            "fp", F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))))
        w = Window.partitionBy("fp")
        kept = (f.withColumn("_first",
                             F.col("doc_id") == F.min("doc_id").over(w))
                .where(F.col("_first")).select(*stage1.columns))
        kept.write.mode("overwrite").parquet(s2)
    stage2 = spark.read.parquet(s2)
    funnel["n_after_exact"] = stage2.count()

    # ---- stage 3: near-dup clusters, keep canonical ---------------------
    s3 = os.path.join(args.out, "stage-3-neardup.parquet")
    if not _done(s3):
        slim = stage2.select("doc_id", "text")
        cand = dedup.candidate_pairs(
            dedup.lsh_buckets(dedup.minhash_signature(slim)))
        verified = (dedup.jaccard_pairs(slim, cand)
                    .where(F.col("jaccard") >= args.threshold)
                    .select("doc_a", "doc_b"))
        clusters = dedup.dedup_clusters(verified)
        drop = clusters.where(~F.col("keep")).select("doc_id")
        stage2.join(drop, "doc_id", "left_anti") \
            .write.mode("overwrite").parquet(s3)
    stage3 = spark.read.parquet(s3)
    funnel["n_after_neardup"] = stage3.count()

    # ---- stage 4: decontamination (optional) ----------------------------
    s4 = os.path.join(args.out, "stage-4-decontaminated.parquet")
    if args.eval:
        if not _done(s4):
            ev = spark.read.parquet(args.eval).select("doc_id", "text")
            hits = dedup.decontaminate(stage3.select("doc_id", "text"), ev)
            stage3.join(hits.select("doc_id"), "doc_id", "left_anti") \
                .write.mode("overwrite").parquet(s4)
        stage4 = spark.read.parquet(s4)
    else:
        stage4 = stage3
    funnel["n_after_decontaminate"] = stage4.count()

    # ---- stage 5: mixture sampling --------------------------------------
    keep_path = os.path.join(args.out, "keep.parquet")
    if not _done(keep_path):
        kept = mixture.sample_docs(stage4, rate=args.mixture_rate)
        kept.write.mode("overwrite").parquet(keep_path)
    keep = spark.read.parquet(keep_path)
    funnel["n_kept"] = keep.count()

    wall = time.time() - t0
    funnel.update({"wall_sec": round(wall, 2),
                   "docs_per_sec": round(n_in / wall, 1),
                   "eval_used": bool(args.eval),
                   "threshold": args.threshold})
    print(json.dumps(funnel))
    spark.stop()


if __name__ == "__main__":
    main()
