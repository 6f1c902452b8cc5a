"""spark-submit job: end-to-end corpus near-dup pipeline.

Usage (north rule: ship the package with --py-files):

    python scripts/make_zip.py                       # -> dist/terraspark.zip
    spark-submit --master local[32] \\
        --py-files dist/terraspark.zip \\
        jobs/dedup.py --docs /path/to/documents.parquet \\
        --out /tmp/dedup_out --threshold 0.95

Pipeline: exact-dup stats -> MinHash signatures -> LSH candidate pairs
(bucket skew cap) -> unigram-Jaccard verify at --threshold -> distributed
connected components -> canonical-doc selection.  Writes:

    <out>/clusters.parquet   (doc_id, cluster, n_members, keep)
    <out>/keep.parquet       doc_ids that survive dedup (canonical
                             cluster members; singletons are implicitly
                             kept and not listed -- apply as an anti-join
                             of ~keep rows against the corpus)

and prints one JSON summary line.  Every stage is the library operator
the driver's correctness gate verifies (dp_dedup_exact, dp_lsh_pairs,
dp_dedup_clusters); this job only composes them.
"""
from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--max-bucket", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = SparkSession.builder.appName("terraspark-dedup").getOrCreate()

    from terraspark.datapipe import dedup

    docs = spark.read.parquet(args.docs).select("doc_id", "text")
    t0 = time.time()

    stats = dedup.exact_stats(docs).collect()[0].asDict()

    buckets = dedup.lsh_buckets(dedup.minhash_signature(docs))
    max_bucket = dedup.DEFAULT_MAX_BUCKET \
        if args.max_bucket is None else args.max_bucket
    n_capped = dedup.bucket_audit(buckets, max_bucket).count()
    cand = dedup.candidate_pairs(buckets, max_bucket)
    verified = dedup.jaccard_pairs(docs, cand) \
        .where(F.col("jaccard") >= args.threshold) \
        .select("doc_a", "doc_b")

    clusters = dedup.dedup_clusters(verified)
    clusters.write.mode("overwrite").parquet(f"{args.out}/clusters.parquet")
    clusters_r = spark.read.parquet(f"{args.out}/clusters.parquet")
    clusters_r.where(F.col("keep")).select("doc_id") \
        .write.mode("overwrite").parquet(f"{args.out}/keep.parquet")

    n_clustered = clusters_r.count()
    n_drop = clusters_r.where(~F.col("keep")).count()
    wall = time.time() - t0
    print(json.dumps({
        "n_docs": stats["n_docs"], "n_exact_unique": stats["n_unique"],
        "n_clustered_docs": n_clustered, "n_dropped": n_drop,
        "n_oversize_buckets": n_capped,
        "threshold": args.threshold, "wall_sec": round(wall, 2),
        "docs_per_sec": round(stats["n_docs"] / wall, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
